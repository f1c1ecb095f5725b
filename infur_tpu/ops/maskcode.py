"""Run-boundary (RLE) coding of class-id masks for compact transport.

Segmentation masks are spatially coherent: the bench masks measure a mean
of ~20 runs per 960-px row (tools/mask_stats.py), so coding each row as
its run boundaries is ~15x smaller than even 6-bit-packed ids.  The
reference ships full mask textures host-side (infur/src/gui.rs:317-331 —
fine over PCIe); on this TPU the D2H link is the binding constraint
(BENCH_NOTES.md), so masks travel as runs.

Encoding (static-shape, XLA-friendly):
  * one u16 word per run: ``col << 6 | class`` (10-bit start column,
    6-bit class id) — requires ``w <= 1024`` and ``class < 64``;
  * a fixed ``cap`` of run slots per row; rows scatter their boundary
    words into the slot given by the run-index cumsum, non-boundary
    pixels target slot ``cap`` and are dropped (``mode='drop'``);
  * the TRUE per-row run count ships alongside, so a consumer detects
    cap overflow (``counts > cap``) and falls back to a dense plane —
    the scheme is lossless for arbitrary content, compact for real masks.

The decoder is host-side NumPy: one vectorized ``np.repeat`` expands all
rows of a batch at once.
"""

from __future__ import annotations

import numpy as np


def encode_runs(mask, cap: int):
    """Device-side row-RLE encode.

    Args:
      mask: ``(b, h, w)`` uint8 class ids (``w <= 1024``, ids ``< 64``).
      cap:  run slots per row (static).

    Returns:
      ``(counts, words)``: TRUE run counts ``(b, h)`` uint16 and run
      words ``(b, h, cap)`` uint16 (``col << 6 | class``); slots past a
      row's count (and all slots of an overflowing row beyond ``cap``)
      are unspecified.
    """
    import jax.numpy as jnp

    b, h, w = mask.shape
    if w > 1024:
        raise ValueError(f"encode_runs needs w <= 1024 (10-bit col), got {w}")
    is_start = jnp.concatenate(
        [jnp.ones((b, h, 1), bool), mask[:, :, 1:] != mask[:, :, :-1]],
        axis=2)
    ridx = jnp.cumsum(is_start.astype(jnp.int32), axis=2) - 1
    counts = (ridx[:, :, -1] + 1).astype(jnp.uint16)
    word = ((jnp.arange(w, dtype=jnp.uint16) << 6)[None, None, :]
            | mask.astype(jnp.uint16))
    tgt = jnp.where(is_start, ridx, cap)
    bi = jnp.arange(b)[:, None, None]
    ri = jnp.arange(h)[None, :, None]
    words = jnp.zeros((b, h, cap), jnp.uint16)
    return counts, words.at[bi, ri, tgt].set(word, mode="drop")


def decode_runs(counts: np.ndarray, words: np.ndarray, w: int) -> np.ndarray:
    """Host-side inverse of :func:`encode_runs` (NumPy, vectorized).

    Valid only where every row's ``counts <= words.shape[-1]`` — check
    :func:`overflowed` first and use the dense fallback plane otherwise.
    """
    b, h, cap = words.shape
    pos = (words >> 6).astype(np.int32)
    cls = (words & 63).astype(np.uint8)
    j = np.arange(cap)[None, None, :]
    cnt = counts.astype(np.int32)[:, :, None]
    lengths = np.where(j == cnt - 1, w - pos,
                       np.roll(pos, -1, axis=-1) - pos)
    lengths = np.where(j < cnt, lengths, 0)
    return np.repeat(cls.ravel(), lengths.ravel()).reshape(b, h, w)


def overflowed(counts: np.ndarray, cap: int) -> bool:
    """True when any row exceeded the run cap (decode would be lossy)."""
    return bool(np.asarray(counts, np.int32).max() > cap)
