"""YUV420 <-> RGB conversion: decode-native ingest for the device path.

Video decoders produce planar YUV420 natively; converting to packed BGR on
the host (what the reference asks ffmpeg to do, decoder.rs:32-37) costs
host CPU AND doubles the host->device bytes (3 B/px vs 1.5 B/px).  The
TPU-native design ships the decoder's own format and fuses the color
conversion into the device preprocess — halving H2D traffic, which is the
scarce resource both on PCIe hosts at high stream counts and (acutely) on
this environment's relay (BENCH_NOTES.md).

Full-range BT.601 matrices; the host-side encoder is the exact companion
of the device decoder, so round-trips only lose to 4:2:0 chroma
subsampling and u8 rounding.

I420 frame layout (flat u8, length w*h*3//2):
    [0, w*h)              Y plane, row-major
    [w*h, w*h*5//4)       U plane, (h//2, w//2)
    [w*h*5//4, w*h*3//2)  V plane, (h//2, w//2)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def i420_nbytes(h: int, w: int) -> int:
    return w * h * 3 // 2


def bgr_to_i420(img_bgr: np.ndarray) -> np.ndarray:
    """Host-side encoder (fixture generation): (H,W,3) BGR u8 -> flat I420."""
    h, w = img_bgr.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, "I420 needs even dimensions"
    b, g, r = (img_bgr[..., i].astype(np.float32) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 + (b - y) * 0.564
    v = 128.0 + (r - y) * 0.713
    # 4:2:0 chroma: average each 2x2 block
    u2 = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v2 = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    out = np.empty(i420_nbytes(h, w), np.uint8)
    out[: w * h] = np.clip(np.rint(y), 0, 255).astype(np.uint8).ravel()
    q = w * h // 4
    out[w * h: w * h + q] = np.clip(np.rint(u2), 0, 255).astype(np.uint8).ravel()
    out[w * h + q:] = np.clip(np.rint(v2), 0, 255).astype(np.uint8).ravel()
    return out


def scale_i420(flat: np.ndarray, h: int, w: int,
               oh: int, ow: int) -> np.ndarray:
    """Host-side nearest resize of a flat I420 frame (per-plane gather) —
    the host Scale stage for decode-native frames.  oh/ow must be even."""
    assert oh % 2 == 0 and ow % 2 == 0

    def nn(plane, th, tw):
        ph, pw = plane.shape
        ys = np.minimum(((np.arange(th) + 0.5) * ph / th).astype(np.int64), ph - 1)
        xs = np.minimum(((np.arange(tw) + 0.5) * pw / tw).astype(np.int64), pw - 1)
        return plane[ys[:, None], xs[None, :]]

    q = w * h // 4
    y = nn(flat[: w * h].reshape(h, w), oh, ow)
    u = nn(flat[w * h: w * h + q].reshape(h // 2, w // 2), oh // 2, ow // 2)
    v = nn(flat[w * h + q:].reshape(h // 2, w // 2), oh // 2, ow // 2)
    return np.concatenate([y.ravel(), u.ravel(), v.ravel()])


def i420_to_bgr_np(flat: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side twin of :func:`i420_to_bgr` (numpy; for host batch paths)."""
    y = flat[: w * h].reshape(h, w).astype(np.float32)
    q = w * h // 4
    u = flat[w * h: w * h + q].reshape(h // 2, w // 2).astype(np.float32)
    v = flat[w * h + q:].reshape(h // 2, w // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1) - 128.0
    v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1) - 128.0
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    return np.clip(np.rint(np.stack([b, g, r], axis=-1)), 0, 255).astype(np.uint8)


@partial(jax.jit, static_argnames=("h", "w"))
def i420_to_bgr(flat: jax.Array, h: int, w: int) -> jax.Array:
    """Device-side decoder: flat I420 u8 -> (H, W, 3) BGR u8."""
    y = flat[: w * h].reshape(h, w).astype(jnp.float32)
    q = w * h // 4
    u = flat[w * h: w * h + q].reshape(h // 2, w // 2).astype(jnp.float32)
    v = flat[w * h + q:].reshape(h // 2, w // 2).astype(jnp.float32)
    # nearest 2x chroma upsample
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1) - 128.0
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("h", "w"))
def i420_to_rgbf(flat: jax.Array, h: int, w: int) -> jax.Array:
    """flat I420 u8 -> (H, W, 3) RGB float32 in [0, 1] (preprocess entry:
    skips the u8 quantize/dequantize of going through BGR)."""
    y = flat[: w * h].reshape(h, w).astype(jnp.float32)
    q = w * h // 4
    u = flat[w * h: w * h + q].reshape(h // 2, w // 2).astype(jnp.float32)
    v = flat[w * h + q:].reshape(h // 2, w // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1) - 128.0
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) * (1.0 / 255.0)
