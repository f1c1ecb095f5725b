"""Pallas TPU kernel: fused decode-native ingest (YUV420 -> normalized RGB).

The preprocess hot op for planar streams: BT.601 color conversion and
torchvision normalization collapse into ONE per-channel affine over the
Y/U/V planes —

    out_c = ky_c*Y + ku_c*U + kv_c*V + bias_c

with all twelve coefficients folded at trace time from the color matrix,
the 1/255 scale and the mean/std stats.  The kernel runs the affine on
lane-aligned (rows, 128) pixel tiles of the three planes and emits planar
normalized output in the compute dtype; XLA folds the final
planar->NHWC transpose into the consumer (the stem conv's input read).

Chroma 2x upsampling stays in XLA (a repeat that fuses into the kernel's
input stream); the wire format over the host link remains compact I420.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infur_tpu.ops.preprocess import IMAGENET_MEAN_RGB, IMAGENET_STD_RGB

LANES = 128
TILE_ROWS = 64

# BT.601 full-range: [R G B] from [Y, U-128, V-128]
_YUV2RGB = np.asarray([
    [1.0, 0.0, 1.403],
    [1.0, -0.344, -0.714],
    [1.0, 1.773, 0.0],
], np.float32)


def _affine_coeffs(mean, std) -> np.ndarray:
    """(3, 6) rows: (ky, ku, kv, rgb_bias, scale, shift) per channel —
    rgb = clip(ky*Y + ku*U + kv*V + rgb_bias, 0, 255) stays in gamut, then
    out = rgb*scale + shift applies the 1/255 + mean/std normalization."""
    out = np.zeros((3, 6), np.float32)
    for c in range(3):
        ky, ku, kv = _YUV2RGB[c]
        out[c, 0:3] = ky, ku, kv
        out[c, 3] = -128.0 * (ku + kv)
        out[c, 4] = 1.0 / (255.0 * std[c])
        out[c, 5] = -mean[c] / std[c]
    return out


def _make_kernel(coeffs: np.ndarray, out_dtype):
    k = coeffs  # (3, 6) literals baked into the program

    def kernel(y_ref, u_ref, v_ref, out_ref):
        y = y_ref[...].astype(jnp.int32).astype(jnp.float32)
        u = u_ref[...].astype(jnp.int32).astype(jnp.float32)
        v = v_ref[...].astype(jnp.int32).astype(jnp.float32)
        for c in range(3):
            rgb = jnp.clip(y * k[c, 0] + u * k[c, 1] + v * k[c, 2] + k[c, 3],
                           0.0, 255.0)
            out_ref[c] = (rgb * k[c, 4] + k[c, 5]).astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("h", "w", "mean", "std", "compute_dtype",
                                   "interpret"))
def i420_to_normalized_pallas(flat: jax.Array, h: int, w: int,
                              mean: tuple = IMAGENET_MEAN_RGB,
                              std: tuple = IMAGENET_STD_RGB,
                              compute_dtype: str = "float32",
                              interpret: bool = False) -> jax.Array:
    """flat I420 u8 -> (H, W, 3) normalized RGB in ``compute_dtype``."""
    n = h * w
    q = n // 4
    y = flat[:n]
    u = jnp.repeat(jnp.repeat(flat[n:n + q].reshape(h // 2, w // 2),
                              2, axis=0), 2, axis=1).reshape(-1)
    v = jnp.repeat(jnp.repeat(flat[n + q:].reshape(h // 2, w // 2),
                              2, axis=0), 2, axis=1).reshape(-1)

    block = TILE_ROWS * LANES
    pad = (-n) % block
    if pad:
        y = jnp.pad(y, (0, pad))
        u = jnp.pad(u, (0, pad))
        v = jnp.pad(v, (0, pad))
    rows = y.shape[0] // LANES
    grid = rows // TILE_ROWS
    tile = lambda a: a.reshape(rows, LANES)

    dtype = jnp.dtype(compute_dtype)
    out = pl.pallas_call(
        _make_kernel(_affine_coeffs(mean, std), dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((3, TILE_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows, LANES), dtype),
        interpret=interpret,
    )(tile(y), tile(u), tile(v))
    planar = out.reshape(3, -1)[:, :n].reshape(3, h, w)
    return jnp.transpose(planar, (1, 2, 0))
