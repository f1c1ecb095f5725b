"""Pallas TPU kernel: fully-fused mask overlay (argmax + palette + blend).

One VMEM pass produces the display-ready composite from raw class scores:
argmax/max over K classes (unrolled compare/select), palette lookup
expressed as K' unrolled selects against an in-register color table (no
dynamic gather — 20 entries), and alpha blend over the video frame.

Data layout is planar and lane-aligned: pixels tile 128 to the lane dim,
frame channels and output RGBA channels are separate planes, so every
ref the kernel touches is an (rows, 128) tile of a (C, rows, 128) cube.
The HWC<->planar transposes live in XLA where they fuse with the
neighboring ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infur_tpu.ops.colorcode import _DEFAULT_PALETTE

LANES = 128
TILE_ROWS = 64


def _make_overlay_kernel(k: int, palette: np.ndarray):
    pal = palette.astype(np.float32)  # (P, 3) baked into the kernel

    def kernel(scores_ref, frame_ref, out_ref):
        # scores (K, T, L) f32; frame (3, T, L) u8 BGR; out (4, T, L) u8 RGBA
        best = scores_ref[0]
        best_idx = jnp.zeros(best.shape, jnp.int32)
        for i in range(1, k):
            row = scores_ref[i]
            take = row > best
            best = jnp.where(take, row, best)
            best_idx = jnp.where(take, jnp.int32(i), best_idx)
        conf = jnp.clip(best, 0.0, 1.0)

        # palette "gather" as unrolled selects over the small color table
        r = jnp.zeros(best.shape, jnp.float32)
        g = jnp.zeros(best.shape, jnp.float32)
        b = jnp.zeros(best.shape, jnp.float32)
        for i in range(pal.shape[0]):
            sel = best_idx % pal.shape[0] == i
            r = jnp.where(sel, pal[i, 0], r)
            g = jnp.where(sel, pal[i, 1], g)
            b = jnp.where(sel, pal[i, 2], b)

        inv = 1.0 - conf
        # frame planes are BGR; output is RGBA.  Mosaic has no direct
        # u8<->f32 casts — bounce through int32.
        def u8_to_f32(t):
            return t.astype(jnp.int32).astype(jnp.float32)

        def f32_to_u8(t):
            return jnp.clip(jnp.round(t), 0, 255).astype(jnp.int32).astype(jnp.uint8)

        out_ref[0] = f32_to_u8(u8_to_f32(frame_ref[2]) * inv + r * conf)
        out_ref[1] = f32_to_u8(u8_to_f32(frame_ref[1]) * inv + g * conf)
        out_ref[2] = f32_to_u8(u8_to_f32(frame_ref[0]) * inv + b * conf)
        out_ref[3] = jnp.full(best.shape, 255, jnp.uint8)

    return kernel


@partial(jax.jit, static_argnames=("apply_softmax", "interpret"))
def overlay_pallas(frame_bgr_hwc: jax.Array, scores_khw: jax.Array,
                   apply_softmax: bool = False,
                   interpret: bool = False) -> jax.Array:
    """Composite scores over the frame -> (H, W, 4) RGBA u8, fused on TPU.

    Scores are nearest-upsampled to frame size in XLA first if needed (a
    static gather that fuses into the kernel's input stream).
    """
    if apply_softmax:
        scores_khw = jax.nn.softmax(scores_khw, axis=0)
    h, w = frame_bgr_hwc.shape[:2]
    k, kh, kw = scores_khw.shape
    if (kh, kw) != (h, w):
        from infur_tpu.ops.preprocess import _nearest_indices
        ys = jnp.asarray(_nearest_indices(h, kh))
        xs = jnp.asarray(_nearest_indices(w, kw))
        scores_khw = scores_khw[:, ys[:, None], xs[None, :]]

    n = h * w
    block = TILE_ROWS * LANES
    pad = (-n) % block
    s = scores_khw.reshape(k, n)
    f = jnp.transpose(frame_bgr_hwc.reshape(n, 3), (1, 0))  # planar BGR
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)))
        f = jnp.pad(f, ((0, 0), (0, pad)))
    rows = s.shape[1] // LANES
    s = s.reshape(k, rows, LANES)
    f = f.reshape(3, rows, LANES)
    grid = rows // TILE_ROWS

    out = pl.pallas_call(
        _make_overlay_kernel(k, _DEFAULT_PALETTE),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, TILE_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, rows, LANES), jnp.uint8),
        interpret=interpret,
    )(s, f)
    rgba = jnp.transpose(out.reshape(4, rows * LANES)[:, :n], (1, 0))
    return rgba.reshape(h, w, 4)
