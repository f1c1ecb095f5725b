"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference's only parallelism is a 3-thread host pipeline with bounded
channel backpressure (SURVEY §2.8/§5.8; reference infur/src/main.rs:85-97).
The TPU-native analog of *stage* pipelining is microbatched pipeline
parallelism over a device mesh axis: each device owns one pipeline stage's
weights, activations flow stage-to-stage over ICI via ``lax.ppermute``, and
M microbatches keep S stages busy (GPipe schedule, T = M + S - 1 ticks;
bubble fraction = (S-1)/T, shrinking as M grows).

Mechanics (idiomatic JAX — ``shard_map`` for explicit collectives, not a
translation of anything in the reference):

* stage weights are **stacked** along a leading axis of shape (S, k, ...)
  — S pipeline stages of k sequential blocks each — and sharded over the
  mesh's ``pipe`` axis, so each device materializes only its own stage;
* inside ``shard_map``, a ``lax.scan`` over ticks applies the local stage
  (an inner scan over its k blocks) and collective-permutes the activation
  to the next stage; stage 0 feeds microbatch t+1 each tick;
* the last stage's outputs are masked and ``psum``-broadcast back so every
  device returns the full (M, mb, ...) result (one extra collective; the
  alternative — leaving outputs on the last stage — complicates callers).

The combinator is generic over any homogeneous block stack: ResNet
bottlenecks (used by :func:`fcn_resnet50_apply_pp`), SegFormer encoder
blocks within a stage, etc.  Heterogeneous-depth models pipeline their
deepest homogeneous region — for FCN-ResNet50 that is layer3's interior
(5 identical 1024-channel bottlenecks, the bulk of the dilated backbone's
depth); when S does not divide the block count the stack is padded with
**exact-identity blocks** (all-zero convs ⇒ the residual branch is 0 and
``relu(x + 0) = x`` on post-ReLU activations), keeping the pipelined
forward bit-identical to the sequential one.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

BlockFn = Callable[[Any, jax.Array], jax.Array]


def stack_blocks(blocks: list[Any]) -> Any:
    """Stack a list of identically-shaped param pytrees along a new leading
    axis (the stage axis to shard over ``pipe``)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)


def pipeline_apply(stage_params: Any, x_micro: jax.Array, block_fn: BlockFn,
                   mesh: Mesh, axis: str = "pipe",
                   micro_spec: P | None = None) -> jax.Array:
    """Run ``x_micro`` through S pipeline stages of k blocks each.

    Args:
      stage_params: pytree whose leaves have leading dims ``(S, k, ...)`` —
        S = ``mesh.shape[axis]`` pipeline stages, k sequential blocks per
        stage.  Sharded over ``axis`` on dim 0 by the shard_map spec.
      x_micro: ``(M, mb, ...)`` microbatches (M = number of microbatches).
      block_fn: ``(one_block_params, x) -> y`` with ``y.shape == x.shape``.
      mesh: the device mesh; ``axis`` must be one of its axis names.
      micro_spec: optional PartitionSpec for the trailing dims of
        ``x_micro`` (e.g. ``P(None, "data")`` to keep the microbatch dim
        data-parallel).  Defaults to fully replicated.

    Returns:
      ``(M, mb, ...)`` outputs, microbatch i = stage chain applied to
      ``x_micro[i]`` — bit-identical to the sequential loop.
    """
    S = mesh.shape[axis]
    lead = jax.tree.leaves(stage_params)[0].shape[0]
    if lead != S:
        raise ValueError(f"stage stack has {lead} stages, mesh axis "
                         f"'{axis}' has {S} devices")
    M = x_micro.shape[0]
    x_spec = micro_spec if micro_spec is not None else P()

    def run(local_params: Any, x: jax.Array) -> jax.Array:
        # local leading dims (1, k, ...): this device's stage
        my_blocks = jax.tree.map(lambda a: a[0], local_params)
        stage = lax.axis_index(axis)

        def stage_fn(inp: jax.Array) -> jax.Array:
            def body(c, p):
                return block_fn(p, c), None
            y, _ = lax.scan(body, inp, my_blocks)
            return y

        # pad the feed so stage 0 can index x[t+1] at every tick
        pad = jnp.zeros((S,) + x.shape[1:], x.dtype)
        x_pad = jnp.concatenate([x, pad], axis=0)

        def tick(state: jax.Array, t: jax.Array):
            y = stage_fn(state)
            # forward shift: stage i -> i+1 (stage S-1's y leaves the pipe)
            y_prev = lax.ppermute(y, axis, [(i, i + 1) for i in range(S - 1)])
            nxt = jnp.where(stage == 0,
                            lax.dynamic_index_in_dim(x_pad, t + 1, 0, False),
                            y_prev)
            out = jnp.where(stage == S - 1, y, jnp.zeros_like(y))
            return nxt, out

        state0 = jnp.where(stage == 0, x[0], jnp.zeros_like(x[0]))
        _, outs = lax.scan(tick, state0, jnp.arange(M + S - 1))
        # last stage emitted microbatch i at tick i + S - 1; everyone else
        # contributed zeros -> psum broadcasts the result to all stages
        return lax.psum(outs[S - 1:], axis)

    in_specs = (jax.tree.map(lambda _: P(axis), stage_params), x_spec)
    return shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
                     check_vma=False)(stage_params, x_micro)


# ---------------------------------------------------------------------------
# FCN-ResNet50 with a pipelined layer3
# ---------------------------------------------------------------------------

def _zero_bottleneck_like(p: dict[str, Any]) -> dict[str, Any]:
    """An exact-identity bottleneck: all-zero convs make the residual
    branch 0 (BN with mean=0/bias=0 maps 0 -> 0), so relu(x + 0) == x on
    the post-ReLU activations flowing between blocks."""
    return jax.tree.map(jnp.zeros_like, p)


def fcn_pipeline_params(params: dict[str, Any], n_stages: int) -> Any:
    """Stack layer3's interior blocks (identical 1024-ch bottlenecks,
    stride 1 / dilation 2) into an (S, k, ...) stage stack, padding with
    exact-identity blocks when S does not divide the count."""
    blocks = list(params["layer3"][1:])
    k = -(-len(blocks) // n_stages)  # ceil
    while len(blocks) < n_stages * k:
        blocks.append(_zero_bottleneck_like(blocks[0]))
    stacked = stack_blocks(blocks)
    return jax.tree.map(
        lambda a: a.reshape((n_stages, k) + a.shape[1:]), stacked)


def fcn_resnet50_apply_pp(params: dict[str, Any], x_nhwc: jax.Array,
                          mesh: Mesh, n_micro: int = 2,
                          compute_dtype: str = "float32",
                          stage_params: Any = None) -> dict[str, jax.Array]:
    """FCN-ResNet50 forward with layer3's interior pipelined over the
    mesh's ``pipe`` axis.  The pipelined region is bit-identical to the
    sequential block chain (tested); end-to-end output agrees with
    :func:`fcn_resnet50_apply` to ordinary f32 conv tolerance — XLA's
    conv accumulation order varies with batch shape, and the microbatch
    split changes the batch shape of every layer.

    ``stage_params`` may be passed pre-stacked (and pre-sharded with
    :func:`shard_fcn_pp_params`) to avoid re-stacking under jit.
    """
    from infur_tpu.models.fcn_resnet50 import (
        _bottleneck, _bn, _conv, _fcn_heads_from_feats, _maxpool_3x3s2,
    )

    S = mesh.shape["pipe"]
    if stage_params is None:
        stage_params = fcn_pipeline_params(params, S)

    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        x = x_nhwc.astype(compute_dtype)
        x = jax.nn.relu(_bn(_conv(x, params["stem_conv"], stride=2),
                            params["stem_bn"]))
        x = _maxpool_3x3s2(x)
        stage_cfg = ((1, 1), (2, 1), (1, 2))
        for si, (stride, dilation) in enumerate(stage_cfg):
            d_first = max(dilation // 2, 1) if stride == 1 and dilation > 1 else 1
            blocks = params[f"layer{si + 1}"]
            n_interior = 0 if si == 2 else None  # layer3: only block 0 here
            for bi, bp in enumerate(blocks if n_interior is None else blocks[:1]):
                x = _bottleneck(x, bp, stride if bi == 0 else 1,
                                (d_first if bi == 0 else dilation))

        # pipelined region: layer3 blocks 1.. (stride 1, dilation 2)
        n, h, w, c = x.shape
        if n % n_micro:
            raise ValueError(f"batch {n} not divisible by n_micro={n_micro}")
        micro = x.reshape((n_micro, n // n_micro, h, w, c))
        block = lambda p, xx: _bottleneck(xx, p, 1, 2)  # noqa: E731
        micro = pipeline_apply(stage_params, micro, block, mesh, "pipe")
        x = micro.reshape((n, h, w, c))
        feats = {"layer3": x}

        # layer4 (stride 1, dilation 4; first block dilation 2)
        for bi, bp in enumerate(params["layer4"]):
            x = _bottleneck(x, bp, 1, 2 if bi == 0 else 4)
        feats["layer4"] = x
        return _fcn_heads_from_feats(params, feats, x_nhwc.shape)


def shard_fcn_pp_params(stage_params: Any, mesh: Mesh) -> Any:
    """NamedShardings placing each pipeline stage's blocks on its device."""
    from jax.sharding import NamedSharding
    return jax.tree.map(
        lambda a: NamedSharding(mesh, P("pipe")), stage_params)
