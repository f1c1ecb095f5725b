"""Device-side mask decode + overlay compositing.

The reference decodes class confidences on the host — per-pixel argmax over
K classes, a 20-color palette lookup, alpha = max confidence — and then the
GUI blends mask under frame on the CPU (reference
infur/src/decode_predict.rs:39-84, infur/src/gui.rs:317-331, and the
BGR->RGBA map at app.rs:132-144).  Here the whole chain runs on device and
only the final composited RGBA u8 image is copied back.

Improvements over the reference (its own README todos, README.md:76):

* optional softmax so logit-output models get meaningful alpha;
* real alpha compositing of mask over frame (the reference draws the mask
  *under* the frame texture and calls blending a todo).
"""

from __future__ import annotations

import colorsys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PALETTE_SIZE = 20  # same cardinality as the reference palette (decode_predict.rs:9-30)


def make_palette(n: int = PALETTE_SIZE) -> np.ndarray:
    """(n, 3) u8 RGB palette of maximally-spread hues.

    Procedurally generated (golden-angle hue walk, alternating value/sat
    rows) rather than copied from the reference's hand-picked table — the
    contract is only "n high-contrast colors, indexed k % n".
    """
    colors = []
    for k in range(n):
        hue = (k * 0.618033988749895) % 1.0
        sat = 0.95 if k % 2 == 0 else 0.65
        val = 0.95 if k % 3 != 2 else 0.6
        r, g, b = colorsys.hsv_to_rgb(hue, sat, val)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))
    return np.asarray(colors, np.uint8)


_DEFAULT_PALETTE = make_palette()

#: PASCAL VOC class names — the label set of the reference's flagship
#: fcn-resnet50-12 model and every native family's default head.  Class
#: captions are a reference README todo (README.md:77) done here.
VOC_LABELS = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
    "tvmonitor",
)


def class_labels(k: int) -> tuple[str, ...]:
    """Caption strings for a K-class head: VOC names when K matches,
    generic ``class N`` otherwise."""
    if k == len(VOC_LABELS):
        return VOC_LABELS
    return tuple(f"class {i}" for i in range(k))


@jax.jit
def class_histogram(scores_khw: jax.Array) -> jax.Array:
    """(K, H, W) scores -> (K,) int32 pixel counts of the argmax mask —
    the device-side stat behind frontend class captions."""
    k = scores_khw.shape[0]
    mask = jnp.argmax(scores_khw, axis=0).reshape(-1)
    return jnp.zeros((k,), jnp.int32).at[mask].add(1)


@partial(jax.jit, static_argnames=("apply_softmax",))
def color_code(scores_khw: jax.Array, palette: jax.Array | None = None,
               apply_softmax: bool = False) -> jax.Array:
    """(K, H, W) class scores -> (H, W, 4) RGBA u8 mask.

    Per pixel: color = palette[argmax_k % n], alpha = max_k confidence * 255
    (un-premultiplied, clamped) — the reference's contract
    (decode_predict.rs:32-36, 67-78).  ``apply_softmax`` turns raw logits
    into probabilities first.
    """
    if palette is None:
        palette = jnp.asarray(_DEFAULT_PALETTE)
    if apply_softmax:
        scores_khw = jax.nn.softmax(scores_khw, axis=0)
    k = jnp.argmax(scores_khw, axis=0)                      # (H, W) int
    conf = jnp.max(scores_khw, axis=0)                      # (H, W)
    rgb = jnp.take(palette, k % palette.shape[0], axis=0)   # (H, W, 3) u8
    alpha = jnp.clip(conf * 255.0, 0.0, 255.0).astype(jnp.uint8)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


@partial(jax.jit, static_argnames=("apply_softmax",))
def overlay(frame_bgr_hwc: jax.Array, scores_khw: jax.Array,
            palette: jax.Array | None = None,
            apply_softmax: bool = False) -> jax.Array:
    """Composite the color-coded mask over the frame, on device.

    frame (H, W, 3) u8 BGR + scores (K, h, w) -> (H, W, 4) RGBA u8.
    Scores are nearest-upsampled to the frame size if needed (the model may
    have run at a reduced scale).  Output alpha is 255 (opaque composite).
    """
    if palette is None:
        palette = jnp.asarray(_DEFAULT_PALETTE)
    if apply_softmax:
        scores_khw = jax.nn.softmax(scores_khw, axis=0)
    h, w = frame_bgr_hwc.shape[:2]
    kh, kw = scores_khw.shape[1:]
    k = jnp.argmax(scores_khw, axis=0)
    conf = jnp.clip(jnp.max(scores_khw, axis=0), 0.0, 1.0)
    if (kh, kw) != (h, w):
        from infur_tpu.ops.preprocess import _nearest_indices
        ys = jnp.asarray(_nearest_indices(h, kh))
        xs = jnp.asarray(_nearest_indices(w, kw))
        k = k[ys[:, None], xs[None, :]]
        conf = conf[ys[:, None], xs[None, :]]
    mask_rgb = jnp.take(palette, k % palette.shape[0], axis=0).astype(jnp.float32)
    frame_rgb = frame_bgr_hwc[..., ::-1].astype(jnp.float32)
    a = conf[..., None]
    out = frame_rgb * (1.0 - a) + mask_rgb * a
    rgba = jnp.concatenate(
        [jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8),
         jnp.full((h, w, 1), 255, jnp.uint8)], axis=-1)
    return rgba
