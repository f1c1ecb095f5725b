"""Finetuning: optax train steps for the native model families.

Beyond the reference's scope (it is inference-only), but a framework that
owns native params pytrees should be able to adapt them: this module turns
any family's ``apply(params, x_nhwc) -> {"out": NCHW logits, ...}`` into a
jitted optax train step and a small training loop with checkpointing.
Under a (data, model) mesh with NamedSharding'd params/batch (see
infur_tpu.parallel), the same step runs data-parallel: XLA inserts the
gradient psum over ``data``.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

log = logging.getLogger(__name__)

ApplyFn = Callable[[Any, jax.Array], dict[str, jax.Array]]


def segmentation_ce(apply_fn: ApplyFn, params: Any, x_nhwc: jax.Array,
                    labels_nhw: jax.Array, aux_weight: float = 0.4) -> jax.Array:
    """Pixel cross-entropy on "out" (+ aux_weight * aux, torchvision recipe).

    Label -1 marks ignored pixels (void class in VOC-style datasets).
    """
    logits = apply_fn(params, x_nhwc)

    def ce(nchw: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(nchw.astype(jnp.float32), axis=1)
        valid = labels_nhw >= 0
        safe = jnp.maximum(labels_nhw, 0)
        picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)

    loss = ce(logits["out"])
    if "aux" in logits:
        loss = loss + aux_weight * ce(logits["aux"])
    return loss


def moe_segmentation_loss(params: Any, x_nhwc: jax.Array,
                          labels_nhw: jax.Array,
                          moe_aux_weight: float = 0.01) -> jax.Array:
    """SegFormer-MoE training loss: pixel CE + the Switch load-balancing
    auxiliary term (without it the router collapses onto one expert).
    Pass as ``loss_fn`` to :func:`make_train_step` / :func:`finetune`."""
    from infur_tpu.models.segformer_moe import segformer_moe_forward
    logits, aux = segformer_moe_forward(params, x_nhwc)
    ce = segmentation_ce(lambda p, x: logits, params, x_nhwc, labels_nhw)
    return ce + moe_aux_weight * aux


def segmentation_metrics(logits_nchw: jax.Array, labels_nhw: jax.Array,
                         num_classes: int | None = None
                         ) -> dict[str, jax.Array]:
    """Pixel accuracy and mean IoU for a batch (label -1 = void, ignored).

    Returns {"pixel_acc", "miou", "iou": (K,)}; classes absent from both
    prediction and label are excluded from the mean (NaN-safe).  Jittable
    (fixed shapes via one-hot confusion accumulation).
    """
    k = num_classes or logits_nchw.shape[1]
    pred = jnp.argmax(logits_nchw, axis=1)
    valid = labels_nhw >= 0
    safe = jnp.maximum(labels_nhw, 0)
    # confusion matrix via one-hot outer accumulation
    idx = (safe * k + pred).reshape(-1)
    conf = jnp.zeros((k * k,), jnp.float32).at[idx].add(
        valid.reshape(-1).astype(jnp.float32)).reshape(k, k)
    tp = jnp.diag(conf)
    union = conf.sum(0) + conf.sum(1) - tp
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1), jnp.nan)
    present = union > 0
    miou = jnp.where(present.any(),
                     jnp.nansum(jnp.where(present, iou, 0.0))
                     / jnp.maximum(present.sum(), 1), jnp.nan)
    acc = (tp.sum() / jnp.maximum(conf.sum(), 1))
    return {"pixel_acc": acc, "miou": miou, "iou": iou}


def evaluate(apply_fn: ApplyFn, params: Any,
             data: Iterable[tuple[jax.Array, jax.Array]],
             num_classes: int | None = None) -> dict[str, float]:
    """mIoU/accuracy over an iterable of (x_nhwc, labels_nhw) batches,
    accumulating one confusion matrix across the set."""
    total_conf = None
    k = num_classes
    fwd = jax.jit(lambda p, x: apply_fn(p, x)["out"])
    for x, y in data:
        logits = fwd(params, x)
        if k is not None and logits.shape[1] != k:
            raise ValueError(
                f"num_classes={k} but the model emits {logits.shape[1]} "
                "channels — evaluate over the model's own class count")
        k = k or logits.shape[1]
        pred = np.asarray(jnp.argmax(logits, axis=1))
        yv = np.asarray(y)
        valid = yv >= 0
        idx = yv[valid] * k + pred[valid]
        conf = np.bincount(idx.reshape(-1), minlength=k * k) \
            .reshape(k, k).astype(np.float64)
        total_conf = conf if total_conf is None else total_conf + conf
    if total_conf is None:
        raise ValueError("evaluate: no batches in data")
    tp = np.diag(total_conf)
    union = total_conf.sum(0) + total_conf.sum(1) - tp
    present = union > 0
    iou = np.where(present, tp / np.maximum(union, 1), np.nan)
    return {
        "pixel_acc": float(tp.sum() / max(total_conf.sum(), 1)),
        "miou": float(np.nanmean(iou)) if present.any() else float("nan"),
    }


def poly_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0,
                  power: float = 0.9, end_lr: float = 0.0):
    """The segmentation-standard "poly" LR schedule (linear warmup then
    ``(1 - t/T)^power`` decay — the schedule both the SegFormer paper and
    torchvision's segmentation reference training use)."""
    decay = optax.polynomial_schedule(
        init_value=base_lr, end_value=end_lr, power=power,
        transition_steps=max(total_steps - warmup_steps, 1))
    if not warmup_steps:
        return decay
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_train_step(apply_fn: ApplyFn, tx: optax.GradientTransformation,
                    aux_weight: float = 0.4, loss_fn=None):
    """A jitted (params, opt_state, x, y) -> (params, opt_state, loss).
    ``loss_fn(params, x, y)`` overrides the default segmentation CE (e.g.
    :func:`moe_segmentation_loss` for routed families)."""

    @jax.jit
    def step(params, opt_state, x_nhwc, labels_nhw):
        loss, grads = jax.value_and_grad(
            (lambda p: loss_fn(p, x_nhwc, labels_nhw)) if loss_fn is not None
            else lambda p: segmentation_ce(apply_fn, p, x_nhwc, labels_nhw,
                                           aux_weight))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def finetune(apply_fn: ApplyFn, params: Any,
             data: Iterable[tuple[jax.Array, jax.Array]],
             steps: int, learning_rate: float = 1e-3,
             weight_decay: float = 1e-4,
             checkpoint_path: str | None = None,
             checkpoint_every: int = 100,
             log_every: int = 10, loss_fn=None,
             lr_schedule: str = "constant",
             warmup_steps: int = 0,
             state_path: str | None = None,
             resume: bool = False) -> tuple[Any, list[float]]:
    """Run ``steps`` optimizer steps over ``data`` (an iterable of
    (x_nhwc f32, labels_nhw i32) batches); returns (params, loss history).

    ``lr_schedule="poly"`` uses :func:`poly_schedule` over ``steps``.
    ``checkpoint_path`` saves params-only (loadable via ``family@ckpt``).
    ``state_path`` saves the FULL train state (params + optimizer state +
    step) at the same cadence; with ``resume=True`` an existing state file
    is loaded and training continues from its step up to ``steps`` total —
    the schedule, Adam moments and counts all pick up where they left off.
    """
    if lr_schedule == "poly":
        lr = poly_schedule(learning_rate, steps, warmup_steps)
    elif lr_schedule == "constant":
        lr = learning_rate
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    tx = optax.adamw(lr, weight_decay=weight_decay)
    start = 0
    if resume:
        if not state_path:
            raise ValueError("resume=True needs state_path")
        import os
        if os.path.exists(state_path):
            from infur_tpu.runtime.checkpoint import load_train_state
            params, opt_state, start = load_train_state(state_path, tx)
            log.info("resumed from %s at step %d", state_path, start)
        else:
            opt_state = tx.init(params)
    else:
        opt_state = tx.init(params)
    step = make_train_step(apply_fn, tx, loss_fn=loss_fn)
    losses: list[float] = []
    it = iter(data)

    def save_ckpts(i: int) -> None:
        from infur_tpu.runtime.checkpoint import save_params, save_train_state
        if checkpoint_path:
            save_params(checkpoint_path, jax.device_get(params))
        if state_path:
            save_train_state(state_path, jax.device_get(params),
                             jax.device_get(opt_state), step=i)

    t0 = time.perf_counter()
    for i in range(start, steps):
        x, y = next(it)
        params, opt_state, loss = step(params, opt_state, x, y)
        if (i + 1) % log_every == 0 or i == steps - 1:
            lv = float(loss)
            losses.append(lv)
            log.info("step %d/%d loss %.4f (%.2f s)", i + 1, steps, lv,
                     time.perf_counter() - t0)
        if (i + 1) % checkpoint_every == 0:
            save_ckpts(i + 1)
    if checkpoint_path or state_path:
        save_ckpts(steps)
    return params, losses
