"""Fused device preprocess: raw decoder frame -> model input tensor.

One jitted fusion replaces four host stages of the reference pipeline
(Scale resize: infur/src/processing.rs:232-281; BGR->RGB + NHWC->NCHW +
u8->f32 normalize: infur/src/predict_onnx.rs:97-142):

    u8 BGR HWC frame --resize(scale)--> --channel swap--> --dtype/norm-->
    --layout--> f32/bf16 model input

Everything happens after a single small H2D transfer of the packed u8
frame; XLA fuses the gather + elementwise chain into one pass over HBM.

Resize sampling matches the host :func:`infur_tpu.processing.resize_nearest`
exactly (pixel-center nearest: ``src = floor((dst+0.5)*in/out)`` clipped),
so device and host paths agree bit-for-bit on u8 — the parity contract the
tests pin down.  Bilinear is also provided (the reference lists it as a
todo, README.md:74 — here it is a first-class mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# torchvision ImageNet normalization, the reference's default
# (reference infur/src/predict_onnx.rs:175-180).
IMAGENET_MEAN_RGB = (0.485, 0.456, 0.406)
IMAGENET_STD_RGB = (0.229, 0.224, 0.225)


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    """Pixel-center nearest-neighbor source indices (host-side, static)."""
    return np.minimum(
        ((np.arange(out_size) + 0.5) * in_size / out_size).astype(np.int32),
        in_size - 1)


def _linear_weights(out_size: int, in_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Half-pixel bilinear lo-index / hi-index / hi-weight (static)."""
    coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    lo = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int32)
    hi = np.clip(lo + 1, 0, in_size - 1).astype(np.int32)
    t = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
    return lo, hi, t


@dataclass(frozen=True)
class PreProc:
    """Static preprocess configuration (hashable -> usable as a jit static).

    Mirrors the reference's ``ImgPreProc`` (infur/src/predict_onnx.rs:65-95)
    plus the resize that the reference keeps in a separate host stage.

    ``layout``: "NCHW" | "NHWC" (model input layout)
    ``dtype``: "f32" (normalized float) | "u8" (raw bytes, quantized models)
    ``channel_order``: "rgb" | "bgr" — frames arrive BGR; float models
      conventionally want RGB, u8 models BGR (predict_onnx.rs:296-301).
    ``mean``/``std``: normalization in *channel_order* (auto-flipped by
      :meth:`imagenet`), ignored for dtype="u8".
    ``interp``: "nearest" | "bilinear"
    ``out_hw``: static model input size (H, W); bucketing the scale slider
      to a finite set of sizes keeps the jit cache small.
    """

    out_hw: tuple[int, int]
    layout: str = "NCHW"
    dtype: str = "f32"
    channel_order: str = "rgb"
    mean: tuple[float, float, float] = IMAGENET_MEAN_RGB
    std: tuple[float, float, float] = IMAGENET_STD_RGB
    interp: str = "nearest"
    compute_dtype: str = "float32"  # "float32" | "bfloat16" output for f32 models

    @classmethod
    def imagenet(cls, out_hw: tuple[int, int], layout: str = "NCHW",
                 channel_order: str = "rgb", **kw) -> "PreProc":
        mean, std = IMAGENET_MEAN_RGB, IMAGENET_STD_RGB
        if channel_order == "bgr":  # flip stats to match (predict_onnx.rs:182-188)
            mean, std = mean[::-1], std[::-1]
        return cls(out_hw=out_hw, layout=layout, channel_order=channel_order,
                   mean=mean, std=std, **kw)


@partial(jax.jit, static_argnames=("cfg",))
def preprocess(frame_bgr_hwc: jax.Array, cfg: PreProc) -> jax.Array:
    """u8 BGR HWC frame (H, W, 3) -> model input (1, ...) per ``cfg``.

    Accepts the frame already on device (preferred: transfer once, early) or
    a host array (jit will transfer).  Returns a batched tensor of shape
    (1, 3, H', W') or (1, H', W', 3).
    """
    h, w = frame_bgr_hwc.shape[:2]
    oh, ow = cfg.out_hw
    x = frame_bgr_hwc

    # --- resize (static gather indices; no-op short-circuit at unit size) ---
    if (oh, ow) != (h, w):
        if cfg.interp == "nearest":
            ys = jnp.asarray(_nearest_indices(oh, h))
            xs = jnp.asarray(_nearest_indices(ow, w))
            x = x[ys[:, None], xs[None, :]]
        elif cfg.interp == "bilinear":
            ylo, yhi, yt = _linear_weights(oh, h)
            xlo, xhi, xt = _linear_weights(ow, w)
            xf = x.astype(jnp.float32)
            top = xf[jnp.asarray(ylo)]
            bot = xf[jnp.asarray(yhi)]
            yt_b = jnp.asarray(yt)[:, None, None]
            rows = top * (1.0 - yt_b) + bot * yt_b
            left = rows[:, jnp.asarray(xlo)]
            right = rows[:, jnp.asarray(xhi)]
            xt_b = jnp.asarray(xt)[None, :, None]
            x = left * (1.0 - xt_b) + right * xt_b
        else:
            raise ValueError(f"unknown interp {cfg.interp!r}")

    # --- channel order (frames are BGR) ---
    if cfg.channel_order == "rgb":
        x = x[..., ::-1]

    # --- dtype / normalize ---
    if cfg.dtype == "u8":
        x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8) \
            if x.dtype != jnp.uint8 else x
    else:
        x = x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        mean = jnp.asarray(cfg.mean, jnp.float32)
        inv_std = jnp.asarray([1.0 / s for s in cfg.std], jnp.float32)
        x = (x - mean) * inv_std
        if cfg.compute_dtype != "float32":
            x = x.astype(cfg.compute_dtype)

    # --- layout + batch axis ---
    if cfg.layout == "NCHW":
        x = jnp.transpose(x, (2, 0, 1))
    elif cfg.layout != "NHWC":
        raise ValueError(f"unknown layout {cfg.layout!r}")
    return x[None]


def scale_to_hw(scale: float, h: int, w: int) -> tuple[int, int]:
    """The host Scale stage's output-size rule (processing.py out_dims)."""
    return max(int(round(h * scale)), 0), max(int(round(w * scale)), 0)
