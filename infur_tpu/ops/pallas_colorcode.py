"""Pallas TPU kernel: fused class-argmax / confidence decode.

The postprocess hot op (the reference does it per-pixel on the host,
decode_predict.rs:67-78): over K class-score maps, find per-pixel argmax
and max.  One pass over the scores resident in VMEM; the K loop is
unrolled (K is a small static constant), each step a VPU-vectorized
compare/select over an (8n, 128)-aligned pixel tile.

Layout: scores (K, H, W) f32 are viewed as (K, P/128, 128) — pixels tiled
128 to the lane dimension, TILE_ROWS sublane rows per grid step.  The
palette gather + composite stays in XLA where it fuses with the display
path.  Off-TPU callers use interpret mode (tests) or the jnp fallback in
ops.colorcode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 64  # (64, 128) f32 tile = 32 KB per class plane slice


def _argmax_kernel(scores_ref, mask_ref, conf_ref):
    """scores (K, TILE_ROWS, LANES) f32 -> mask i32 / conf f32 tiles."""
    k = scores_ref.shape[0]
    best = scores_ref[0]
    best_idx = jnp.zeros(best.shape, jnp.int32)
    for i in range(1, k):  # unrolled; K is static (21 for VOC)
        row = scores_ref[i]
        take = row > best
        best = jnp.where(take, row, best)
        best_idx = jnp.where(take, jnp.int32(i), best_idx)
    mask_ref[...] = best_idx
    conf_ref[...] = best


@partial(jax.jit, static_argnames=("interpret",))
def argmax_conf_pallas(scores_khw: jax.Array,
                       interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """(K, H, W) f32 -> (mask (H, W) i32, conf (H, W) f32)."""
    k, h, w = scores_khw.shape
    n = h * w
    block = TILE_ROWS * LANES
    pad = (-n) % block
    flat = scores_khw.reshape(k, n)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    rows = flat.shape[1] // LANES
    cube = flat.reshape(k, rows, LANES)
    grid = rows // TILE_ROWS

    mask, conf = pl.pallas_call(
        _argmax_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((k, TILE_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(cube)
    mask = mask.reshape(-1)[:n].reshape(h, w)
    conf = conf.reshape(-1)[:n].reshape(h, w)
    return mask, conf


def color_code_pallas(scores_khw: jax.Array, palette: jax.Array,
                      apply_softmax: bool = False,
                      interpret: bool = False) -> jax.Array:
    """Drop-in for ops.colorcode.color_code built on the Pallas argmax."""
    if apply_softmax:
        scores_khw = jax.nn.softmax(scores_khw, axis=0)
    mask, conf = argmax_conf_pallas(scores_khw, interpret=interpret)
    rgb = jnp.take(palette, mask % palette.shape[0], axis=0).astype(jnp.uint8)
    alpha = jnp.clip(conf * 255.0, 0.0, 255.0).astype(jnp.uint8)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
