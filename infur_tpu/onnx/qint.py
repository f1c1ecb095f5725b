"""Integer-only LayerNorm and Softmax for fully-integer transformer graphs.

Round-2 measured why mixed-precision int8 transformers can't be
platform-exact: the f32 LayerNorm/Softmax islands between QLinear regions
are recomputed with FMA/reassociation differences across backends, and
their outputs feed QuantizeLinear boundaries where one ulp flips a
quantized int that cascades (mask agreement 0.945 at 96x96, PARITY.md).
The fix is the I-BERT direction — run the islands in integer arithmetic —
implemented here so that the NumPy oracle and the JAX importer execute
*bit-identical* programs:

* ``QLayerNorm``: the normalized value (x-mean)/std is scale/zero-point
  free (both cancel in the ratio), so it is computed directly on the u8
  codes: per-row exact centered values ``c = d*x - sum(x)`` (int32), a
  variance proxy from magnitude-shifted squares (the static pre-square
  shift keeps every sum inside int32 — no 64-bit emulation anywhere), an
  integer Newton-free bit-by-bit sqrt, one magnitude division, and a
  per-channel fixed-point affine (gamma/std baked with the output scale).
* ``QSoftmax``: ``softmax`` depends only on logit *differences*, and the
  u8 difference to the row max is an integer in [0, 255] — so ``exp`` is
  a 256-entry integer table baked at quantize time, the denominator is an
  exact int32 sum, and each probability is one rounded integer division.
  Output is u8 at the fixed scale 1/255 (zero point 0).

Every operation used (int32 mul/add/sub/abs/shift, magnitude division,
the 16-iteration isqrt loop) is exactly defined — no floats — so
TPU == CPU == oracle bit-for-bit at every input size, which restores the
fully-integer parity bar (requant.py) for transformer graphs.
"""

from __future__ import annotations

import numpy as np

F_NORM = 6          #: fractional bits of the normalized value n = (x-mu)/sigma
SOFTMAX_E = 15      #: fractional bits of the exp table
SOFTMAX_MAX_L = (1 << 30) // (1 << SOFTMAX_E)  #: max softmax length (denominator fits i31)


def layernorm_consts(d: int, gamma: np.ndarray, beta: np.ndarray,
                     y_scale: float, y_zp: int
                     ) -> tuple[int, int, int, np.ndarray, np.ndarray]:
    """Host-side constants for QLayerNorm: (s, sqd_fp, T, gmul, boff).

    ``s``: pre-square magnitude shift so the variance sum fits int32;
    ``sqd_fp`` = round(sqrt(d) * 2^F_NORM);
    ``gmul``/``boff``: per-channel fixed-point affine onto the output
    grid, with T fractional bits chosen so n_fp * gmul stays in int32.
    Raises ValueError when no valid T exists (absurd scale ratios).
    """
    s = 0
    while d * ((255 * d) >> s) ** 2 >= (1 << 31):
        s += 1
    sqd_fp = int(round(np.sqrt(d) * (1 << F_NORM)))
    g = np.asarray(gamma, np.float64).reshape(-1)
    b = np.asarray(beta, np.float64).reshape(-1)
    if g.size != d or b.size != d:
        raise ValueError(f"gamma/beta size {g.size}/{b.size} != d={d}")
    ratio = g / float(y_scale)
    # n_fp magnitude is bounded by sqd_fp (|n| <= sqrt(d)); keep the
    # product under 2^30
    T = 20
    nmax = 2 * sqd_fp
    while T > 0 and np.abs(ratio).max() * (1 << T) * nmax >= (1 << 30):
        T -= 1
    if T < 4:
        raise ValueError("layernorm gamma/y_scale ratio too large")
    gmul = np.rint(ratio * (1 << T)).astype(np.int64)
    if np.abs(gmul).max() >= (1 << 31):
        raise ValueError("layernorm multiplier overflow")
    boff = (np.rint(b / float(y_scale)) + int(y_zp)).astype(np.int64)
    if np.abs(boff).max() >= (1 << 31):
        raise ValueError("layernorm offset overflow")
    return s, sqd_fp, T, gmul.astype(np.int32), boff.astype(np.int32)


def softmax_exp_table(x_scale: float) -> np.ndarray:
    """exp table for QSoftmax: t[j] = round(exp(-j * x_scale) * 2^E)."""
    j = np.arange(256, dtype=np.float64)
    return np.rint(np.exp(-j * float(x_scale)) * (1 << SOFTMAX_E)) \
        .astype(np.int32)


# ---------------------------------------------------------------------------
# NumPy reference implementations (the oracle side)


def isqrt32_ref(v: np.ndarray) -> np.ndarray:
    """Vectorized floor(sqrt(v)) for int32 v >= 0, by restoring bit-by-bit
    square root — 16 fixed iterations of int32 compare/subtract, the same
    op sequence as the JAX twin."""
    v = np.asarray(v, np.int64)  # headroom for the k=15 trial (~2^31.5)
    rem = v.copy()
    root = np.zeros_like(v)
    for k in range(15, -1, -1):
        # accept bit k iff rem >= (root + 2^k)^2 - root^2
        #                       = root*2^(k+1) + 2^(2k)
        trial = (root << (k + 1)) + (np.int64(1) << (2 * k))
        take = rem >= trial
        rem = np.where(take, rem - trial, rem)
        root = np.where(take, root | (np.int64(1) << k), root)
    return root.astype(np.int32)


def qlayernorm_ref(x_u8: np.ndarray, gmul: np.ndarray, boff: np.ndarray,
                   s: int, sqd_fp: int, t: int) -> np.ndarray:
    """Integer LayerNorm over the last axis (see module docstring)."""
    x = np.asarray(x_u8).astype(np.int32)
    d = x.shape[-1]
    ssum = x.sum(axis=-1, keepdims=True, dtype=np.int32)
    c = np.int32(d) * x - ssum                       # d*(x - mean), exact
    a = np.abs(c)
    av = a >> s
    v = (av * av).sum(axis=-1, keepdims=True, dtype=np.int32)
    r = isqrt32_ref(v)
    denom = np.maximum(r.astype(np.int32) << s, 1)
    nmag = np.minimum((a * np.int32(sqd_fp)) // denom, np.int32(2 * sqd_fp))
    n_fp = np.where(c < 0, -nmag, nmag)
    prod = n_fp * np.asarray(gmul, np.int32)
    y = ((prod + (np.int32(1) << (F_NORM + t - 1))) >> (F_NORM + t)) \
        + np.asarray(boff, np.int32)
    return np.clip(y, 0, 255).astype(np.uint8)


def qsoftmax_ref(x_u8: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Integer softmax over the last axis (see module docstring)."""
    x = np.asarray(x_u8).astype(np.int32)
    if x.shape[-1] > SOFTMAX_MAX_L:
        raise ValueError(f"QSoftmax length {x.shape[-1]} > {SOFTMAX_MAX_L}")
    j = x.max(axis=-1, keepdims=True) - x            # [0, 255]
    e = np.asarray(table, np.int32)[j]
    denom = e.sum(axis=-1, keepdims=True, dtype=np.int32)
    y = (e * np.int32(510) + denom) // (2 * denom)   # round(e*255/denom)
    return np.clip(y, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# JAX twins (the importer side) — identical op sequences in int32


def isqrt32_jnp(v):
    import jax.numpy as jnp

    # uint32: max trial is root<<16 + 2^30 < 2^32 (root < 2^15.5)
    rem = jnp.asarray(v, jnp.uint32)
    root = jnp.zeros_like(rem)
    for k in range(15, -1, -1):
        trial = (root << (k + 1)) + (jnp.uint32(1) << (2 * k))
        take = rem >= trial
        rem = jnp.where(take, rem - trial, rem)
        root = jnp.where(take, root | (jnp.uint32(1) << k), root)
    return root.astype(jnp.int32)


def qlayernorm_jnp(x_u8, gmul: np.ndarray, boff: np.ndarray,
                   s: int, sqd_fp: int, t: int):
    import jax.numpy as jnp

    x = jnp.asarray(x_u8).astype(jnp.int32)
    d = x.shape[-1]
    ssum = x.sum(axis=-1, keepdims=True)
    c = jnp.int32(d) * x - ssum
    a = jnp.abs(c)
    av = a >> s
    v = (av * av).sum(axis=-1, keepdims=True)
    r = isqrt32_jnp(v)
    denom = jnp.maximum(r << s, 1)
    nmag = jnp.minimum((a * jnp.int32(sqd_fp)) // denom,
                       jnp.int32(2 * sqd_fp))
    n_fp = jnp.where(c < 0, -nmag, nmag)
    prod = n_fp * jnp.asarray(np.asarray(gmul, np.int32))
    y = ((prod + (jnp.int32(1) << (F_NORM + t - 1))) >> (F_NORM + t)) \
        + jnp.asarray(np.asarray(boff, np.int32))
    return jnp.clip(y, 0, 255).astype(jnp.uint8)


def qsoftmax_jnp(x_u8, table: np.ndarray):
    import jax.numpy as jnp

    x = jnp.asarray(x_u8).astype(jnp.int32)
    if x.shape[-1] > SOFTMAX_MAX_L:
        raise ValueError(f"QSoftmax length {x.shape[-1]} > {SOFTMAX_MAX_L}")
    j = x.max(axis=-1, keepdims=True) - x
    e = jnp.take(jnp.asarray(np.asarray(table, np.int32)), j)
    denom = e.sum(axis=-1, keepdims=True)
    y = (e * jnp.int32(510) + denom) // (2 * denom)
    return jnp.clip(y, 0, 255).astype(jnp.uint8)
