"""Integer-only requantization for the QLinear op lowerings.

The int8 inference path quantizes an int32 accumulator back to 8 bits:
``y = saturate(round(acc * M) + y_zp)`` where ``M = x_scale*w_scale/y_scale``.
Computing ``acc * M`` in float32 is platform-dependent at ties (the TPU's
f32 multiply/round can land on the other side of .5 than NumPy's for a
handful of accumulators, and one flipped quantized int early in a conv
stack cascades — measured ~0.25 % of mask pixels on the imported int8
FCN-ResNet50, BENCH_NOTES.md round 1).

This module replaces the f32 multiplier with a **fixed-point multiplier +
rounding right-shift**, the gemmlowp/TFLite recipe: ``M ≈ q / 2**shift``
with ``q`` a 31-bit integer significand.  Then

    round(acc * M)  :=  sign(acc) * ((|acc| * q + 2**(shift-1)) >> shift)

(round-half-away-from-zero on the magnitude) — pure integer arithmetic,
bit-identical on every backend.  The reference's fidelity bar is the
onnxruntime golden outputs (/root/reference/infur/src/predict_onnx.rs:371-381);
ours is oracle == TPU **bit-for-bit**, which only integer math delivers.

JAX runs without x64 (and TPUs have no native f64), so the device side
cannot form the 62-bit product directly: :func:`requant_jnp` emulates the
64-bit multiply with 16-bit limbs in uint32 — the standard mulhi
decomposition.  :func:`requant_ref` is the NumPy twin using int64; the two
are proven equal on randomized + adversarial accumulators in
tests/test_requant.py.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decompose_multiplier",
    "decompose_add_rescale",
    "add_rescale_ref",
    "add_rescale_jnp",
    "fixed_round_ref",
    "fixed_round_jnp",
    "requant_ref",
    "requant_jnp",
    "ADD_GRID_BITS",
]

# Magnitudes are saturated here before the sign is applied: far above any
# 8-bit output range (callers clip afterwards) yet low enough that the
# int32 reinterpret and a following +zero_point can never overflow.
_MAG_SAT = 1 << 30

# Multipliers must satisfy 1 <= shift <= 62 for the integer path; real
# models sit around shift 33..45.  Out-of-range multipliers (absurd scale
# ratios) make decompose_multiplier raise, and callers fall back to the
# f32 path.
_MAX_SHIFT = 62


def decompose_multiplier(m) -> tuple[np.ndarray, np.ndarray]:
    """Decompose positive multiplier(s) ``m`` into ``(q, shift)`` with
    ``m ≈ q / 2**shift``, ``q`` in ``[2**30, 2**31)`` (31-bit significand).

    Vectorized over arrays (per-channel requant).  Raises ``ValueError``
    when any multiplier can't be represented with ``1 <= shift <= 62``.
    """
    m64 = np.asarray(m, np.float64)
    if m64.size == 0 or np.any(~np.isfinite(m64)) or np.any(m64 <= 0.0):
        raise ValueError("requant multiplier must be finite and > 0")
    mant, exp = np.frexp(m64)  # m = mant * 2**exp, mant in [0.5, 1)
    q = np.rint(mant * (1 << 31)).astype(np.int64)
    # mant ~ 1.0 can round up to 2**31: renormalize to keep q < 2**31.
    hi = q == (1 << 31)
    q = np.where(hi, q >> 1, q)
    exp = np.where(hi, exp + 1, exp)
    shift = (31 - exp).astype(np.int64)
    if np.any(shift < 1) or np.any(shift > _MAX_SHIFT):
        raise ValueError(f"requant shift out of [1, {_MAX_SHIFT}]")
    return q.astype(np.int64), shift


# --------------------------------------------------------------------------
# QLinearAdd rescale: single-int32-multiply fast path
#
# The residual-add chain runs per element of every skip connection in the
# quantized CNNs and was the int8 forward's top cost center even after the
# shl20 specialization (BENCH_NOTES.md round 5).  Its input is tiny —
# ``v = a8 - a_zp8`` has |v| <= 255 — so a 22-bit significand keeps the
# whole product inside int32: ``|v * q22| < 2**9 * 2**22 = 2**31``.  Each
# term becomes ONE 32-bit multiply + rounding add + arithmetic shift (vs
# the shl20 chain's two multiplies + limb bookkeeping), landing on a
# 2**14-step output grid:
#
#     ta = (v * q22 + 2**(e-1)) >> e          (round-half-up, floor shift)
#     y  = ((ta + tb + 2**13) >> 14) + y_zp   (same rounding)
#
# Accuracy: q22 carries a 2**-22 relative error, so each term is within
# ``0.5 + |v|*m*2**14*2**-22`` of the exact grid value — for |v| <= 255,
# m <= 64 that is < 5 grid units = 3e-4 of ONE output step.  onnxruntime
# itself computes QLinearAdd in f32, so any fixed-point scheme deviates
# from it only at sub-ulp ties; the contract here (like the shl20 chain's)
# is that oracle, importer and NHWC executor compute IDENTICAL integers.
# Round-half-up (not half-away) everywhere: one add + one arithmetic
# shift, no sign dance; NumPy's ``>>`` on negative int64 and XLA's
# ``shift_right_arithmetic`` are both floor shifts, so the twins agree.
# --------------------------------------------------------------------------

ADD_GRID_BITS = 14  # sub-step precision of the add's fixed-point grid


def decompose_add_rescale(m) -> tuple[int, int] | None:
    """Decompose a positive scalar multiplier ``m`` as ``q22 / 2**e``
    targeting the ``2**ADD_GRID_BITS`` grid: returns ``(q22, e)`` with
    ``q22`` in ``[2**21, 2**22)`` and ``ta = round(v * m * 2**14)``
    computed as ``(v*q22 + 2**(e-1)) >> e``.  None when ``e`` falls
    outside [1, 31] (absurd scale ratios) — callers use the general
    shl20 path instead.  Host-side, deterministic: every executor makes
    the same choice.
    """
    m64 = float(np.asarray(m).reshape(()))
    if not np.isfinite(m64) or m64 <= 0.0:
        return None
    mant, exp = np.frexp(np.float64(m64))  # m = mant * 2**exp
    q22 = int(np.rint(mant * (1 << 22)))
    e = 22 - exp - ADD_GRID_BITS  # q22/2**e == m * 2**14  (approx)
    if q22 == (1 << 22):
        q22 >>= 1
        e -= 1
    if not (1 <= e <= 31):
        return None
    return q22, int(e)


def add_rescale_ref(v: np.ndarray, q22: int, e: int) -> np.ndarray:
    """NumPy twin: ``(v * q22 + 2**(e-1)) >> e`` in int64 (values fit
    int32 by construction; int64 only avoids NumPy overflow warnings)."""
    v = np.asarray(v, np.int64)
    return (v * np.int64(q22) + (np.int64(1) << (e - 1))) >> np.int64(e)


def add_rescale_jnp(v, q22: int, e: int):
    """JAX twin of :func:`add_rescale_ref` in pure int32 ops: |v| <= 255
    and q22 < 2**22 keep ``v*q22 + 2**(e-1)`` inside int32; ``>>`` on a
    signed int32 lowers to shift_right_arithmetic (floor), matching the
    NumPy twin bit-for-bit (tests/test_requant.py pins the full domain).
    """
    import jax.numpy as jnp

    v = jnp.asarray(v, jnp.int32)
    return (v * jnp.int32(q22) + jnp.int32(1 << (e - 1))) >> jnp.int32(e)


def fixed_round_ref(acc: np.ndarray, q, shift) -> np.ndarray:
    """NumPy core: ``sign(acc) * min((|acc|*q + 2**(shift-1)) >> shift,
    2**30)`` with int64 intermediates — round-half-away-from-zero of
    ``acc * q / 2**shift``.

    ``acc`` is taken mod 2**32 (int32 accumulator semantics, matching the
    device's ``preferred_element_type=int32`` wraparound).
    """
    acc32 = np.asarray(acc).astype(np.int64).astype(np.int32)
    a = acc32.astype(np.int64)
    mag = np.abs(a)  # |int32 min| = 2**31 fits int64
    q = np.asarray(q, np.int64)
    shift = np.asarray(shift, np.int64)
    rounded = (mag * q + (np.int64(1) << (shift - 1))) >> shift
    rounded = np.minimum(rounded, _MAG_SAT)  # match the uint32-limb twin
    return np.where(a < 0, -rounded, rounded)


def requant_ref(acc: np.ndarray, q: np.ndarray, shift: np.ndarray,
                y_zp, out_dtype) -> np.ndarray:
    """NumPy reference: ``saturate(fixed_round(acc) + y_zp)``."""
    y = fixed_round_ref(acc, q, shift) + np.asarray(y_zp, np.int64)
    info = np.iinfo(out_dtype)
    return np.clip(y, info.min, info.max).astype(out_dtype)


def fixed_round_jnp(acc, q: np.ndarray, shift: np.ndarray):
    """JAX twin of :func:`fixed_round_ref` without int64: 16-bit-limb mulhi
    in uint32.  ``q``/``shift`` are host constants from
    :func:`decompose_multiplier` (broadcastable against ``acc``).

    Works on any backend; on TPU everything stays in 32-bit vector ops.
    ``shift`` is a host constant, so when every value is >= 33 (the
    common case — real conv requant multipliers sit around 33..45) the
    low product word drops out statically: the rounding bit lands in the
    high word (``2**(shift-1) = 2**(shift-33) * 2**32``) and
    ``floor(floor(x/2**32)/2**(shift-32)) == floor(x/2**shift)`` (nested
    floors), so the result is ``(hi + 2**(shift-33)) >> (shift-32)`` —
    about half the vector ops of the general dual-branch path.  Same
    integers, just fewer of them (pinned vs the NumPy twin in
    tests/test_requant.py).
    """
    import jax.numpy as jnp

    acc = jnp.asarray(acc, jnp.int32)
    a_u = acc.astype(jnp.uint32)
    neg = acc < 0
    # magnitude in uint32 two's complement: 0 - 0x80000000 == 0x80000000 == 2**31
    mag = jnp.where(neg, jnp.uint32(0) - a_u, a_u)

    q_u = jnp.asarray(np.asarray(q, np.uint32))
    b0 = q_u & jnp.uint32(0xFFFF)
    b1 = q_u >> 16                      # < 2**15
    a0 = mag & jnp.uint32(0xFFFF)
    a1 = mag >> 16                      # <= 2**15

    lo_lo = a0 * b0                     # < 2**32
    mid1 = a1 * b0                      # < 2**31
    mid2 = a0 * b1                      # < 2**31
    carry = ((lo_lo >> 16) + (mid1 & jnp.uint32(0xFFFF))
             + (mid2 & jnp.uint32(0xFFFF))) >> 16
    hi = a1 * b1 + (mid1 >> 16) + (mid2 >> 16) + carry   # < 2**31

    lo = lo_lo + ((mid1 + mid2) << 16)                   # mod 2**32
    res = _shift_round_u32(hi, lo, shift)
    return jnp.where(neg, -res, res)


def fixed_round_shl20_jnp(v, q: np.ndarray, shift: np.ndarray):
    """Exactly ``fixed_round_jnp(v << 20, q, shift)`` for small ``v``
    (``|v| <= 2**11`` — QLinearAdd's rescale terms feed ``a8 - zp8``).

    ``v << 20`` has statically-zero low 16 bits, so half the general
    mulhi chain drops out: ``a0 = 0`` kills ``lo_lo``/``mid2``/``carry``
    and the high word is just ``a1*b1 + (a1*b0 >> 16)`` with
    ``a1 = |v| << 4``.  Same integers, half the vector ops — this chain
    runs per element of every residual Add in the quantized CNNs and was
    the int8 forward's top cost center (BENCH_NOTES.md round 5).

    NOTE: a 256-entry LUT is mathematically cleaner but gathers do NOT
    vectorize on the TPU — a table-gather variant measured 200x SLOWER
    end-to-end (2.5 s/frame) and faulted the TPU worker under lax.scan.
    """
    import jax.numpy as jnp

    v = jnp.asarray(v, jnp.int32)
    neg = v < 0
    mag = jnp.where(neg, -v, v).astype(jnp.uint32)   # <= 2**11
    q_u = jnp.asarray(np.asarray(q, np.uint32))
    b0 = q_u & jnp.uint32(0xFFFF)
    b1 = q_u >> 16                                    # < 2**15
    a1 = mag << 4                                     # (v<<20) >> 16
    mid1 = a1 * b0                                    # < 2**31
    hi = a1 * b1 + (mid1 >> 16)                       # < 2**31
    lo = mid1 << 16
    res = _shift_round_u32(hi, lo, shift)
    return jnp.where(neg, -res, res)


def fixed_round_lanes_jnp(acc, q_u32, sh_i32):
    """Traced-operand twin of :func:`fixed_round_jnp` for kernels whose
    per-channel ``q``/``shift`` arrive as lane vectors (Pallas refs)
    rather than host constants.  Requires every shift >= 33 — the caller
    checks that on the host at build time (real conv requant shifts sit
    at 33..45) and falls back to the host-constant path otherwise.  Same
    integers as the NumPy reference (pinned in tests/test_requant.py).
    """
    import jax.numpy as jnp

    acc = jnp.asarray(acc, jnp.int32)
    a_u = acc.astype(jnp.uint32)
    neg = acc < 0
    mag = jnp.where(neg, jnp.uint32(0) - a_u, a_u)
    q_u = jnp.asarray(q_u32, jnp.uint32)
    b0 = q_u & jnp.uint32(0xFFFF)
    b1 = q_u >> 16
    a0 = mag & jnp.uint32(0xFFFF)
    a1 = mag >> 16
    lo_lo = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    carry = ((lo_lo >> 16) + (mid1 & jnp.uint32(0xFFFF))
             + (mid2 & jnp.uint32(0xFFFF))) >> 16
    hi = a1 * b1 + (mid1 >> 16) + (mid2 >> 16) + carry
    sh = jnp.asarray(sh_i32, jnp.int32)
    r_hi = jnp.uint32(1) << (sh - 33).astype(jnp.uint32)
    res = (hi + r_hi) >> (sh - 32).astype(jnp.uint32)
    # saturate via SIGNED min: Mosaic has no unsigned min (arith.minui
    # fails to legalize on TPU), and res < 2**31 always (hi < 2**30,
    # r_hi <= 2**30, then >> >= 1), so the int32 reinterpret is nonneg
    # and signed/unsigned min agree bit-for-bit.
    res = jnp.minimum(res.astype(jnp.int32), jnp.int32(_MAG_SAT))
    return jnp.where(neg, -res, res)


def _shift_round_u32(hi, lo, shift):
    """Shared rounding-shift tail of the uint32-limb mulhi: magnitude
    ``min(((hi*2**32 + lo) + 2**(shift-1)) >> shift, 2**30)``.  ``shift``
    is a host constant; all-``>=33`` shifts drop the low word statically
    (see :func:`fixed_round_jnp`)."""
    import os

    import jax.numpy as jnp

    sh_np = np.asarray(shift, np.int64)
    shift = jnp.asarray(np.asarray(shift, np.int32))
    if np.all(sh_np >= 33) \
            and os.environ.get("INFUR_REQUANT_GE33", "1") != "0":
        r_hi = jnp.asarray(
            (np.int64(1) << (sh_np - 33)).astype(np.uint32))
        res = (hi + r_hi) >> (shift - 32).astype(jnp.uint32)
        return jnp.minimum(res, jnp.uint32(_MAG_SAT)).astype(jnp.int32)

    # full = hi * 2**32 + lo  (< 2**62);  result = (full + 2**(shift-1)) >> shift
    # Split on shift <=/>= 32 (shift is data here — per-channel arrays —
    # so both branches are computed and selected; they're cheap).
    sh = shift
    # --- shift >= 32 branch: add the rounding bit into (hi, lo) then take
    # hi >> (shift - 32).  R = 2**(shift-1): hi-part 2**(shift-33) for
    # shift >= 33; for shift == 32, R = 2**31 lives in lo.
    r_lo32 = jnp.where(sh == 32, jnp.uint32(1) << 31, jnp.uint32(0))
    r_hi32 = jnp.where(sh >= 33,
                       jnp.uint32(1) << jnp.clip(sh - 33, 0, 31).astype(jnp.uint32),
                       jnp.uint32(0))
    lo32p = lo + r_lo32
    carry32 = (lo32p < lo).astype(jnp.uint32)
    hi32p = hi + r_hi32 + carry32
    res_ge32 = hi32p >> jnp.clip(sh - 32, 0, 31).astype(jnp.uint32)
    # --- shift < 32 branch: R fits in lo.
    r_lo = jnp.uint32(1) << jnp.clip(sh - 1, 0, 31).astype(jnp.uint32)
    lop = lo + r_lo
    carrylt = (lop < lo).astype(jnp.uint32)
    hip = hi + carrylt
    shl = jnp.clip(sh, 1, 31).astype(jnp.uint32)
    res_lt32 = (lop >> shl) | (hip << (jnp.uint32(32) - shl))
    # saturate when the true result >= 2**32 (hi' >= 2**shift)
    res_lt32 = jnp.where(hip >> shl > 0, jnp.uint32(0xFFFFFFFF), res_lt32)

    res = jnp.where(sh >= 32, res_ge32, res_lt32)
    return jnp.minimum(res, jnp.uint32(_MAG_SAT)).astype(jnp.int32)


def requant_jnp(acc, q: np.ndarray, shift: np.ndarray, y_zp, out_dtype):
    """JAX twin of :func:`requant_ref`: ``saturate(fixed_round(acc)+y_zp)``."""
    import jax.numpy as jnp

    y = fixed_round_jnp(acc, q, shift) + jnp.asarray(y_zp, jnp.int32)
    info = np.iinfo(out_dtype)
    return jnp.clip(y, info.min, info.max).astype(out_dtype)
