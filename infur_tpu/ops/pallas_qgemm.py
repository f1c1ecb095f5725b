"""Fused int8 GEMM + requant epilogue — the 1x1 QLinearConv fast path.

Most of a ResNet bottleneck's convolutions are 1x1 (two per block, plus
every downsample projection): channel-mixing matmuls in disguise.  The
NHWC executor (onnx/qexec.py) lowers them to `lax.conv` + a separate
requant fusion, which on TPU materializes the int32 accumulator tensor to
HBM between the conv and the epilogue — 4 B written + 4 B read + 1 B
written per element where the fused form writes 1 B once.  This kernel
does the whole layer in one VMEM round trip:

    s8 (M, K) @ s8 (K, O) -> i32 acc in VMEM            (MXU, int8 path)
    acc += base[o]                                       (bias + zp terms)
    y    = requant(acc, q[o], shift[o]) + y_zp           (onnx/requant.py)
    out  = clip(y, -128, 127) -> s8 (M, O)               (one 1-byte write)

Exactness: integer adds/multiplies are associative bit-for-bit, so any
MXU tiling of the contraction produces the identical int32 accumulator,
and the epilogue is the same fixed-point chain the oracle runs
(requant_jnp works unchanged inside Pallas — uint32 vector ops).
tests/test_pallas_ops.py pins kernel == lax-conv path == NumPy oracle.

Geometry: M = N*H*W is padded to the 256-row tile; K (= C_in) and O
(= C_out) are padded to the 128-lane tile.  FCN/LRASPP channel counts
are multiples of 64, so padding costs at most 2x on the first layer-1
convs (K=64) and nothing elsewhere.  Zero-padding is exact: padded K
contributes 0 to the accumulator, padded M/O rows are sliced away.

The grid runs over M only: the whole (K, O) weight plus its requant
lanes stay VMEM-resident across the run (the largest FCN 1x1 weight is
2048x1024 s8 = 2 MB), so weight HBM traffic is K*O bytes total instead
of (M/M_TILE)*K*O — on the big-K layer-4 projections the per-step
weight refetch would otherwise roughly double the layer's HBM time.

Reference analog: the reference's only conv backend is onnxruntime's
CPU int8 kernels (/root/reference/infur/src/predict_onnx.rs:288-293);
this is the TPU-native equivalent of MLAS's fused requant epilogue.

HONEST OUTCOME (on-chip A/B, 2026-08-19, BENCH_NOTES.md): XLA's own
int8 lax.conv + fused requant beats this kernel decisively on the whole
FCN (5.9 vs 14.5 ms/frame) — Mosaic's s8 dot_general does not reach the
MXU int8 rate (~24% of int8 peak standalone, vs XLA conv's ~60-100%).
The kernel is kept as a tested experimental opt behind
INFUR_QEXEC_PALLAS/_PALLAS3 (default off); the production fusion fix
that actually landed is the zero-point-pad + VALID conv in qexec.py,
which removes the fusion-blocking edge corrections at the XLA level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infur_tpu.onnx.requant import fixed_round_lanes_jnp

M_TILE = 256
LANE = 128
# largest K carried as ONE VMEM block; beyond this the grid adds a K axis
# with an int32 scratch accumulator (the FCN head's im2col K = 9*2048
# would otherwise need a 9.4 MB weight block + 4.7 MB x block, past the
# double-buffered VMEM budget).
K_BLOCK_MAX = 4608


def _qgemm_kernel(x_ref, w_ref, base_ref, q_ref, sh_ref, out_ref, *,
                  y_zp8: int):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + base_ref[:]          # (1, O_tile) broadcast over rows
    y = fixed_round_lanes_jnp(acc, q_ref[:], sh_ref[:]) + jnp.int32(y_zp8)
    out_ref[:] = jnp.clip(y, -128, 127).astype(jnp.int8)


def _qgemm_kernel_ksplit(x_ref, w_ref, base_ref, q_ref, sh_ref, out_ref,
                         acc_ref, *, y_zp8: int, k_steps: int):
    """K-tiled variant: partial products accumulate in an int32 VMEM
    scratch across the (innermost) K grid axis; the requant epilogue runs
    on the last K step.  Integer adds are associative, so the split is
    bit-exact vs the single-block kernel."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == k_steps - 1)
    def _epilogue():
        acc = acc_ref[:] + base_ref[:]
        y = (fixed_round_lanes_jnp(acc, q_ref[:], sh_ref[:])
             + jnp.int32(y_zp8))
        out_ref[:] = jnp.clip(y, -128, 127).astype(jnp.int8)


@partial(jax.jit, static_argnames=("y_zp8", "interpret"))
def qgemm_requant(x8: jax.Array, w8: jax.Array, base: jax.Array,
                  q: jax.Array, shift: jax.Array, y_zp8: int,
                  interpret: bool = False) -> jax.Array:
    """``requant(x8 @ w8 + base) + y_zp8`` -> s8, fused in VMEM.

    x8: (M, K) int8; w8: (K, O) int8; base: (O,) int32 (bias plus the
    host-folded zero-point terms); q/shift: per-channel (O,) or scalar
    requant constants from ``decompose_multiplier``.
    """
    m, k = x8.shape
    k2, o = w8.shape
    assert k == k2, (x8.shape, w8.shape)
    mp = -(-m // M_TILE) * M_TILE
    kp = -(-k // LANE) * LANE
    op = -(-o // LANE) * LANE
    x8 = jnp.pad(x8, ((0, mp - m), (0, kp - k)))
    w8 = jnp.pad(w8, ((0, kp - k), (0, op - o)))
    base = jnp.pad(jnp.asarray(base, jnp.int32).reshape(1, -1),
                   ((0, 0), (0, op - o)))
    qv = jnp.broadcast_to(jnp.asarray(q, jnp.int32).reshape(1, -1), (1, o))
    sv = jnp.broadcast_to(jnp.asarray(shift, jnp.int32).reshape(1, -1),
                          (1, o))
    qv = jnp.pad(qv, ((0, 0), (0, op - o)), constant_values=1 << 30)
    sv = jnp.pad(sv, ((0, 0), (0, op - o)), constant_values=33)

    if kp <= K_BLOCK_MAX:
        out = pl.pallas_call(
            partial(_qgemm_kernel, y_zp8=int(y_zp8)),
            grid=(mp // M_TILE,),
            in_specs=[
                pl.BlockSpec((M_TILE, kp), lambda i: (i, 0)),
                pl.BlockSpec((kp, op), lambda i: (0, 0)),
                pl.BlockSpec((1, op), lambda i: (0, 0)),
                pl.BlockSpec((1, op), lambda i: (0, 0)),
                pl.BlockSpec((1, op), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M_TILE, op), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((mp, op), jnp.int8),
            interpret=interpret,
        )(x8, w8, base, qv, sv)
        return out[:m, :o]

    # K-tiled path (huge contractions, e.g. im2col'd 3x3 over 2048 ch):
    # innermost grid axis walks K blocks, scratch accumulator in VMEM.
    k_tile = K_BLOCK_MAX // 2
    ks = -(-kp // k_tile)
    kp2 = ks * k_tile
    if kp2 != kp:
        x8 = jnp.pad(x8, ((0, 0), (0, kp2 - kp)))
        w8 = jnp.pad(w8, ((0, kp2 - kp), (0, 0)))
    out = pl.pallas_call(
        partial(_qgemm_kernel_ksplit, y_zp8=int(y_zp8), k_steps=ks),
        grid=(mp // M_TILE, ks),
        in_specs=[
            pl.BlockSpec((M_TILE, k_tile), lambda i, k: (i, k)),
            pl.BlockSpec((k_tile, op), lambda i, k: (k, 0)),
            pl.BlockSpec((1, op), lambda i, k: (0, 0)),
            pl.BlockSpec((1, op), lambda i, k: (0, 0)),
            pl.BlockSpec((1, op), lambda i, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M_TILE, op), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, op), jnp.int8),
        scratch_shapes=[pltpu.VMEM((M_TILE, op), jnp.int32)],
        interpret=interpret,
    )(x8, w8, base, qv, sv)
    return out[:m, :o]
