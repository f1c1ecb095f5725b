"""Mesh + sharding rules for the flagship model, and a sharded train step.

Design (scaling-book recipe): pick a mesh, annotate shardings on params and
batch, let XLA GSPMD insert the collectives, profile, iterate.

Axes:

* ``data`` — batch/data parallelism: the multi-stream serving config (N
  video streams -> one batched forward per tick) and the training batch.
  Gradients psum over ``data``.
* ``model`` — tensor parallelism: convolution *output channels* are sharded
  (HWIO weights on their last axis); activations stay channel-sharded
  through elementwise chains, XLA all-gathers at channel-mixing boundaries.
  Residual-stage widths (256..2048) divide cleanly by typical axis sizes.
* ``spatial`` — spatial partitioning, the CNN analog of sequence
  parallelism: activations shard along image H (NHWC dim 1) while params
  replicate over the axis; GSPMD inserts the conv halo exchanges
  (ppermute of kernel-overlap rows between H-neighbors) automatically.
  This is how single very-large frames scale past one chip's HBM.

BatchNorm statistics are per-channel, so they shard with the channels and
need no cross-device reduction at inference.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1,
              spatial_axis: int = 1, devices: Any = None) -> Mesh:
    """A (data, model, spatial) mesh over the first ``n_devices`` devices.
    Size-1 axes are free; the default is pure data parallelism."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % (model_axis * spatial_axis):
        raise ValueError(f"{n} devices not divisible by "
                         f"model_axis*spatial_axis={model_axis * spatial_axis}")
    arr = np.asarray(devs).reshape(
        n // (model_axis * spatial_axis), model_axis, spatial_axis)
    return Mesh(arr, ("data", "model", "spatial"))


def _leaf_spec(path: str, leaf: jnp.ndarray, model_size: int) -> P:
    """Sharding rule for one param leaf (path is /-joined).

    Architecture-agnostic over the native families: conv HWIO kernels and
    dense (in, out) kernels shard their output channels over ``model``;
    1-D per-channel vectors (BN stats, biases, LN scales) follow.  Channel
    dims that don't divide the model axis (e.g. the 21-class head)
    replicate — GSPMD handles the mixed layout.
    """
    if leaf.ndim == 4 and leaf.shape[3] % model_size == 0:
        return P(None, None, None, "model")  # conv HWIO: shard out-channels
    if leaf.ndim == 2 and leaf.shape[1] % model_size == 0:
        return P(None, "model")  # dense (in, out): shard out features
    if leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
        return P("model")  # BN stats / bias / LN follow the channel shard
    return P()


def _tree_paths(tree: Any, prefix: str = "") -> Any:
    if isinstance(tree, dict):
        return {k: _tree_paths(v, f"{prefix}{k}/") for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_paths(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
    return prefix[:-1]


def shard_params(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a native-family param tree on ``mesh`` —
    conv/dense output channels over ``model``, everything else replicated
    (see :func:`_leaf_spec`).  Works for every native family (FCN,
    DeepLabV3, LRASPP convs; SegFormer's dense attention/FFN weights)."""
    paths = _tree_paths(params)
    model_size = mesh.shape["model"]
    return jax.tree.map(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, model_size)),
        paths, params)


#: historical name (round-1 API); the rule was always channel-generic
shard_fcn_params = shard_params


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard over ``data`` (dim 0) and image rows over
    ``spatial`` (dim 1) — works for NHWC inputs and NHW label maps."""
    return NamedSharding(mesh, P("data", "spatial"))


def segmentation_loss(params: Any, x_nhwc: jax.Array, labels_nhw: jax.Array,
                      aux_weight: float = 0.4) -> jax.Array:
    """Pixel cross-entropy on out (+ aux); delegates to the shared
    implementation so the f32 matmul-precision pin and void-label masking
    match the finetune path exactly."""
    from infur_tpu.models import fcn_resnet50_apply
    from infur_tpu.train import segmentation_ce
    return segmentation_ce(lambda p, x: fcn_resnet50_apply(p, x),
                           params, x_nhwc, labels_nhw, aux_weight)


@partial(jax.jit, static_argnames=("lr",), donate_argnums=(0,))
def train_step(params: Any, x_nhwc: jax.Array, labels_nhw: jax.Array,
               lr: float = 0.01) -> tuple[Any, jax.Array]:
    """One SGD step.  Under a mesh with sharded params/batch, XLA inserts
    the gradient psum over ``data`` and channel collectives over ``model``."""
    loss, grads = jax.value_and_grad(segmentation_loss)(params, x_nhwc, labels_nhw)
    new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                              params, grads)
    return new_params, loss
