"""Shared integer-resize geometry for the quantized linear Resize.

``QLinearResize`` (domain ``infur``) keeps u8 Resize inside the integer
domain: per-axis linear interpolation with 16-bit fixed-point weights and
round-half-up, applied separably with per-axis rounding back to u8.  Both
executors (NumPy oracle, JAX importer) derive their gather indices and
weights from THIS module, so the op is platform-exact by construction —
the f32 Resize is not (each backend's FMA/reassociation differs), and a
requantized f32 island flips ints at rounding boundaries (the round-1
int8 mask divergence, BENCH_NOTES.md).

Semantics note: per-axis u8 rounding loses at most 1 lsb vs a fused
bilinear; the quantization error of the surrounding u8 activations is
already +-0.5 lsb, so this is in-family.  Weights are exact multiples of
1/65536; half-up rounding is ``(acc + 32768) >> 16`` on non-negative
accumulators (u8 inputs keep acc >= 0).
"""

from __future__ import annotations

import numpy as np

W_BITS = 16
W_ONE = 1 << W_BITS          # weight denominator
W_HALF = 1 << (W_BITS - 1)   # round-half-up addend


def linear_axis_plan(out_size: int, in_size: int, scale: float,
                     ct_mode: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo_idx, hi_idx, w_hi) for one axis of a linear Resize.

    ``w_hi`` is the 16-bit fixed-point weight of the ``hi`` sample
    (0..65536); the ``lo`` weight is ``65536 - w_hi``.  Coordinate
    transform evaluated in float64 on the host — both executors call this
    same function, so the plan (and therefore the op) is bit-identical.
    """
    from infur_tpu.onnx.oracle import _resize_coords
    coords = _resize_coords(out_size, in_size, scale, ct_mode)
    lo = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int64)
    hi = np.clip(lo + 1, 0, in_size - 1)
    t = np.clip(coords - lo, 0.0, 1.0)
    w_hi = np.rint(t * W_ONE).astype(np.int64)
    return lo, hi, w_hi


def qresize_axis_ref(x: np.ndarray, axis: int, lo: np.ndarray,
                     hi: np.ndarray, w_hi: np.ndarray) -> np.ndarray:
    """NumPy reference for one integer-lerp axis (u8 in, u8 out)."""
    a = np.take(x, lo, axis=axis).astype(np.int64)
    b = np.take(x, hi, axis=axis).astype(np.int64)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = w_hi.reshape(shape)
    acc = a * (W_ONE - w) + b * w
    return ((acc + W_HALF) >> W_BITS).astype(x.dtype)
