"""Device-side ops: the fused pre/post-processing kernels.

The reference spends five full-frame CPU copies per frame on scale,
layout/dtype conversion, mask argmax and RGBA conversion (reference
infur/src/app.rs:107-153, infur/src/predict_onnx.rs:97-142,
infur/src/decode_predict.rs:53-79).  Here the frame is device-resident from
the first touch and those stages are two fused device ops:

* :func:`infur_tpu.ops.preprocess.preprocess` — u8 BGR HWC frame ->
  resized, normalized f32/bf16 model input (NCHW or NHWC) in one fusion.
* :func:`infur_tpu.ops.colorcode.color_code` /
  :func:`infur_tpu.ops.colorcode.overlay` — class confidences -> palette
  mask -> alpha-composited RGBA overlay, all on device; only the final
  RGBA u8 image crosses back to the host.

Each op has a reference jnp implementation (XLA already fuses these well)
and, where profiling justifies it, a Pallas kernel (infur_tpu.ops.pallas_*).
"""

from infur_tpu.ops.preprocess import PreProc, preprocess  # noqa: F401
from infur_tpu.ops.colorcode import color_code, make_palette, overlay  # noqa: F401


def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the axon plugin) —
    the condition for dispatching to the Pallas kernels."""
    import jax
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False
