"""Channels-last (NHWC) executor for QOperator-form int8 CNN graphs — the
TPU serving fast path for quantized models.

The generic importer (onnx/importer.py) runs quantized graphs faithfully
but pays for the ONNX layout contract: NCHW convolutions XLA must
re-layout around the MXU, a u8->s8 rebase pass per conv, and a per-layer
zero-point correction *convolution* over a ones map.  Measured on the
TPU v5e that path was 3x SLOWER than the bf16 native model (13.6 vs
4.5 ms/frame at 540x960, BENCH_NOTES.md) — backwards for hardware whose
int8 MXU peak is ~2x its bf16 peak, and the reference's one and only
model IS an int8 artifact (/root/reference/infur-test-gen/build.rs:88-93,
/root/reference/infur/src/predict_onnx.rs:357-381): int8 is its
production path.

This module compiles the same graphs to a TPU-native form with identical
integer semantics (bit-exact vs the NumPy oracle):

* **NHWC everywhere.**  Activations flow channels-last; conv kernels are
  transposed OIHW -> HWIO once at build time.  XLA's TPU conv emitter
  gets its preferred layout and never inserts transposes.
* **s8 activation domain.**  ONNX QLinear activations are u8 with a
  zero-point; the MXU contracts s8 x s8.  Instead of rebasing u8 -> s8
  before every conv (an extra elementwise pass per layer), every
  inter-layer tensor here IS the rebased code ``a8 = a_u8 - 128`` and all
  zero-points shift by 128.  The mapping is a monotone bijection, so
  every op's integer math is unchanged (proofs per op below).
* **Requant in the conv epilogue.**  The int32 accumulator goes through
  the same fixed-point multiplier + rounding-shift core as the oracle
  (onnx/requant.py) as a fused elementwise epilogue — no
  dequantize->f32->requantize round trip, no separate passes.
* **Zero-point border correction as constants.**  ONNX pads with the
  input zero-point; ``lax.conv`` pads the s8 codes with 0.  The exact
  correction ``-zp8 * k(y, x)`` (``k`` = per-position sum of kernel taps
  that land in-bounds) is *uniform in the interior* and differs only on
  edge strips, so it folds into the bias for the interior plus four tiny
  edge-strip constant adds — computed on the host at trace time, no
  correction conv at all.
* **Weights are baked constants by default.**  Quantized weights are
  inference artifacts; baking them lets XLA constant-fold and pick
  layouts freely.  Data-parallel serving still works: shard the batch
  input, constants replicate.  ``weights="args"`` (or
  ``INFUR_QEXEC_WEIGHTS=args``) instead routes every large conv array
  (s8 kernel + folded int32 bias) through the ``params`` argument —
  exactly how the native bf16 models pass their weights — shrinking the
  compiled program from ~25 MB of embedded constants to a handle list.
  Bit-identical either way (same arrays, same ops); the A/B exists
  because a constant-heavy executable can pay program-swap/eviction
  costs on the serving path that per-execution probes can't see
  (BENCH_NOTES.md round 5).

``compile_qexec`` raises :class:`QExecUnsupported` for any graph outside
its op set (transformers, f32 islands, exotic ops); callers fall back to
the generic importer, which runs everything.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infur_tpu.onnx import oracle
from infur_tpu.onnx.proto import (
    GraphProto, ModelProto, ValueInfoProto, load_model, tensor_to_numpy,
)
from infur_tpu.onnx.requant import decompose_multiplier, requant_jnp


class QExecUnsupported(Exception):
    """Graph is outside the NHWC executor's op set; use the importer."""


# logical NCHW axis -> physical NHWC axis
_TO_PHYS = {0: 0, 1: 3, 2: 1, 3: 2}


def _pallas_1x1_mode() -> str:
    """INFUR_QEXEC_PALLAS: '0' (default) keeps 1x1 QLinearConvs on
    lax.conv; '1' routes them through the fused Pallas GEMM
    (ops/pallas_qgemm.py, interpret mode off-TPU).  Default is OFF after
    the 2026-08-19 on-chip A/B: XLA's int8 conv + fused requant epilogue
    beat the Pallas kernel 5.9 vs 14.5 ms/frame on the whole FCN —
    Mosaic's s8 dot does not reach the MXU int8 rate (the kernel
    measured ~24% of int8 peak standalone).  The kernel stays as a
    tested experimental opt (BENCH_NOTES.md, round 5)."""
    import os
    return os.environ.get("INFUR_QEXEC_PALLAS", "0")

# Host ops evaluated with the NumPy oracle at trace time (shape machinery:
# Shape-driven Resize sizes etc.).  Their inputs must be host values.
_HOST_OPS = {
    "Shape", "Constant", "ConstantOfShape", "Gather", "Slice", "Concat",
    "Unsqueeze", "Squeeze", "Cast", "Add", "Sub", "Mul", "Div", "Range",
    "Reshape", "Identity", "Floor", "Ceil", "ReduceProd", "Expand",
}


def _s(v: Any, default: str = "") -> str:
    if isinstance(v, bytes):
        return v.decode()
    return v if isinstance(v, str) else default


def _init_only(inits: dict, name: str, what: str) -> np.ndarray:
    if name not in inits:
        raise QExecUnsupported(f"{what} must be a graph initializer: {name!r}")
    return inits[name]


def _scalar(v: np.ndarray, what: str) -> float:
    if np.size(v) != 1:
        raise QExecUnsupported(f"{what} must be per-tensor (scalar)")
    return float(np.asarray(v).reshape(()))


def _row_valid(n_out: int, n_in: int, stride: int, pad_begin: int,
               dil: int, k: int) -> np.ndarray:
    """(n_out, k) 0/1 matrix: does tap ``t`` of output position ``y`` land
    inside the unpadded input?  (ONNX pads with the zero-point; lax pads
    the rebased codes with 0 — out-of-bounds taps need correction.)"""
    y = np.arange(n_out)[:, None] * stride - pad_begin \
        + np.arange(k)[None, :] * dil
    return ((y >= 0) & (y < n_in)).astype(np.int64)


def _edge_runs(valid: np.ndarray) -> tuple[int, int]:
    """(prefix, suffix) lengths of positions with any out-of-bounds tap.
    For positive strides the clipped positions are exactly a prefix and a
    suffix of the output axis."""
    bad = ~valid.all(axis=1)
    idx = np.where(bad)[0]
    if idx.size == 0:
        return 0, 0
    n = valid.shape[0]
    pre = 0
    while pre < n and bad[pre]:
        pre += 1
    suf = 0
    while suf < n and bad[n - 1 - suf]:
        suf += 1
    if pre + suf < idx.size or pre + suf > n:
        return -1, -1  # not a clean prefix+suffix (shouldn't happen)
    return pre, suf


def _apply_zp_correction(acc, wk: np.ndarray, x_zp8: int,
                         strides, pads, dils, in_hw) -> Any:
    """Add the exact zero-point padding correction to an NHWC int32
    accumulator.

    True accumulator: ``conv(x - x_zp)`` with the *padded* taps
    contributing 0 (ONNX pads with ``x_zp``).  ``acc`` here is
    ``conv(a8 zero-padded) + (bias - zp8*K0)`` — correct in the interior;
    edge positions are short by ``zp8 * kdef(y, x)`` where ``kdef`` is
    the input-channel-summed kernel mass of the out-of-bounds taps.
    ``kdef`` factors over rows/cols, so it is applied as 2 row strips
    (which include the corners) + 2 col strips on the middle rows — tiny
    host-computed constants, fused adds, no correction conv.
    """
    if x_zp8 == 0 or all(p == (0, 0) for p in pads):
        return acc
    o, kh, kw = wk.shape
    ho, wo = int(acc.shape[1]), int(acc.shape[2])
    hin, win = in_hw
    rv = _row_valid(ho, hin, strides[0], pads[0][0], dils[0], kh)
    cv = _row_valid(wo, win, strides[1], pads[1][0], dils[1], kw)
    t, b = _edge_runs(rv)
    l, r = _edge_runs(cv)
    if (t, b) == (0, 0) and (l, r) == (0, 0):
        return acc
    k0 = wk.sum(axis=(1, 2))  # (O,) all-tap mass
    if t < 0 or l < 0 or t + b >= ho or l + r >= wo:
        # degenerate (tiny activation: every position clips) — full map
        k = np.einsum("okl,yk,xl->yxo", wk, rv, cv)
        delta = (x_zp8 * (k0[None, None, :] - k)).astype(np.int32)
        return acc + jnp.asarray(delta[None])

    def _row_strip(rows: np.ndarray) -> np.ndarray:
        # (len(rows), Wo, O): full kdef on these rows (corners included)
        k = np.einsum("okl,yk,xl->yxo", wk, rv[rows], cv)
        return (x_zp8 * (k0[None, None, :] - k)).astype(np.int32)

    colw = wk.sum(axis=1)           # (O, KW)
    cdef = 1 - cv                   # (Wo, KW) out-of-bounds col taps
    if t:
        acc = acc.at[:, :t].add(jnp.asarray(_row_strip(np.arange(t))[None]))
    if b:
        acc = acc.at[:, ho - b:].add(
            jnp.asarray(_row_strip(np.arange(ho - b, ho))[None]))
    mid = slice(t, ho - b)
    if l:
        d = (x_zp8 * np.einsum("ol,xl->xo", colw, cdef[:l])).astype(np.int32)
        acc = acc.at[:, mid, :l].add(jnp.asarray(d[None, None]))
    if r:
        d = (x_zp8 * np.einsum("ol,xl->xo", colw,
                               cdef[wo - r:])).astype(np.int32)
        acc = acc.at[:, mid, wo - r:].add(jnp.asarray(d[None, None]))
    return acc


@dataclass
class QExecModel:
    """A quantized graph compiled for NHWC serving.

    Mirrors :class:`~infur_tpu.onnx.importer.ImportedModel`'s surface:
    ``fn(params, feeds) -> dict`` (params is empty — weights are baked),
    ``jitted``, ``input_info``, ``output_names``.  Feeds/outputs keep the
    graph's NCHW f32 contract unless ``input_layout="NHWC"`` was chosen,
    in which case feeds are NHWC and the entry transpose disappears
    (outputs stay NCHW).
    """

    fn: Callable[[dict, dict], dict]
    params: dict[str, np.ndarray]
    input_info: list[ValueInfoProto]
    output_names: list[str]
    graph: GraphProto
    metadata: dict[str, str] = field(default_factory=dict)
    input_layout: str = "NCHW"
    jitted: Callable = field(init=False)

    def __post_init__(self):
        self.jitted = jax.jit(self.fn)
        if self.params:
            # weights="args": resident on device once, passed by handle
            # every call (the bf16 params pattern)
            self.params = jax.device_put(self.params)

    @property
    def input_names(self) -> list[str]:
        return [vi.name for vi in self.input_info]

    def __call__(self, feeds: dict[str, Any]) -> dict[str, jax.Array]:
        return self.jitted(self.params, feeds)


def compile_qexec(model_or_path: ModelProto | str | bytes, *,
                  input_layout: str = "NCHW",
                  weights: str | None = None) -> QExecModel:
    """Compile a QOperator-form int8 CNN graph for NHWC TPU serving.

    ``weights``: ``"baked"`` embeds conv weights as HLO constants (the
    default), ``"args"`` routes them through the ``params`` argument
    (see module docstring); ``None`` reads ``INFUR_QEXEC_WEIGHTS``.
    Callers embedding ``.fn`` in an outer jit must pass ``model.params``
    (empty in baked mode, so always safe) as the first argument.

    Raises :class:`QExecUnsupported` when the graph uses ops or quant
    layouts outside this executor's set — fall back to
    :func:`~infur_tpu.onnx.importer.import_model` (same results, slower).
    """
    if input_layout not in ("NCHW", "NHWC"):
        raise ValueError(f"input_layout must be NCHW|NHWC, got {input_layout!r}")
    wmode = weights or os.environ.get("INFUR_QEXEC_WEIGHTS", "baked")
    if wmode not in ("baked", "args"):
        raise ValueError(f"weights must be baked|args, got {wmode!r}")
    model = (model_or_path if isinstance(model_or_path, ModelProto)
             else load_model(model_or_path))
    if model.graph is None:
        raise QExecUnsupported("model has no graph")
    graph = model.graph
    inits = {t.name: tensor_to_numpy(t) for t in graph.initializer}
    input_info = [vi for vi in graph.input if vi.name not in inits]

    steps: list[tuple[Any, Callable]] = []  # (node, run(env) -> None)

    # weights="args" registry: build-time arrays rerouted through the
    # params argument.  _reg returns get(env) -> jnp value; small arrays
    # (< 1 KiB) stay baked either way — handle-count overhead would
    # exceed their constant cost.
    params_np: dict[str, np.ndarray] = {}

    def _reg(key: str, arr: np.ndarray) -> Callable[[dict], Any]:
        if wmode != "args" or arr.nbytes < 1024:
            return lambda env, a=arr: jnp.asarray(a)
        k, i = key, 0
        while k in params_np:
            i += 1
            k = f"{key}#{i}"
        params_np[k] = arr
        return lambda env, k=k: env["__params__"][k]

    def _prep(node):
        op = node.op_type
        attrs = node.attrs()
        ins = list(node.input)
        outs = list(node.output)

        if op == "QuantizeLinear":
            scale = _init_only(inits, ins[1], "QuantizeLinear scale")
            zp = inits.get(ins[2]) if len(ins) > 2 and ins[2] else \
                np.zeros((), np.uint8)
            if np.asarray(zp).dtype != np.uint8:
                raise QExecUnsupported("QuantizeLinear zp must be u8")
            rs = np.float32(1.0) / np.float32(_scalar(scale, "q scale"))
            zp8 = int(_scalar(zp, "q zp")) - 128

            def run(env, ins=ins, outs=outs, rs=rs, zp8=zp8):
                x = env[ins[0]]
                q = jnp.round(x * rs) + jnp.int32(zp8)
                env[outs[0]] = jnp.clip(q, -128, 127).astype(jnp.int8)
            return run

        if op == "DequantizeLinear":
            scale = _init_only(inits, ins[1], "DequantizeLinear scale")
            zp = inits.get(ins[2]) if len(ins) > 2 and ins[2] else \
                np.zeros((), np.uint8)
            s = np.float32(_scalar(scale, "dq scale"))
            zp8 = int(_scalar(np.asarray(zp), "dq zp")) - 128

            def run(env, ins=ins, outs=outs, s=s, zp8=zp8):
                a8 = env[ins[0]]
                env[outs[0]] = ((a8.astype(jnp.int32) - zp8)
                                .astype(jnp.float32) * s)
            return run

        if op == "QLinearConv":
            x_zp = _init_only(inits, ins[2], "x_zp")
            w = _init_only(inits, ins[3], "QLinearConv weight")
            w_zp = _init_only(inits, ins[5], "w_zp")
            if w.dtype != np.int8 or np.any(np.asarray(w_zp) != 0):
                raise QExecUnsupported("need s8 symmetric weights (w_zp=0)")
            if np.asarray(x_zp).dtype != np.uint8:
                raise QExecUnsupported("activation zp must be u8")
            xs = _scalar(inits[ins[1]], "x_scale")
            ws = np.asarray(_init_only(inits, ins[4], "w_scale"), np.float32)
            ys = _scalar(inits[ins[6]], "y_scale")
            y_zp8 = int(_scalar(inits[ins[7]], "y_zp")) - 128
            x_zp8 = int(_scalar(x_zp, "x_zp")) - 128
            bias = (inits.get(ins[8]) if len(ins) > 8 and ins[8] else None)
            if bias is not None and bias.dtype != np.int32:
                raise QExecUnsupported("bias must be int32")
            m = np.float32(xs) * ws / np.float32(ys)
            try:
                q, shift = decompose_multiplier(m)
            except ValueError as e:
                raise QExecUnsupported(f"requant multiplier: {e}") from e
            groups = int(attrs.get("group", 1))
            o, ig, kh, kw = w.shape
            wt = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # HWIO
            wk = w.astype(np.int64).sum(axis=1)                 # (O, KH, KW)
            base = (-np.int64(x_zp8) * wk.sum(axis=(1, 2)))
            if bias is not None:
                base = base + bias.astype(np.int64)
            base = base.astype(np.int32)
            strides = tuple(attrs.get("strides") or (1, 1))
            dils = tuple(attrs.get("dilations") or (1, 1))
            kernel = (kh, kw)
            q4 = q.reshape(1, 1, 1, -1) if q.size > 1 else q
            sh4 = shift.reshape(1, 1, 1, -1) if shift.size > 1 else shift

            # 1x1 channel-mixing convs (most of a ResNet bottleneck) fuse
            # conv + requant in one VMEM round trip (ops/pallas_qgemm.py):
            # no int32 accumulator tensor ever reaches HBM.  1x1 kernels
            # have zero pads under every auto_pad mode, so the zp border
            # correction vanishes and bit-exactness is purely the
            # associativity of integer adds.
            mode = _pallas_1x1_mode()
            if (kernel == (1, 1) and groups == 1 and dils == (1, 1)
                    and bool(np.all(np.asarray(shift) >= 33))
                    and mode != "0"
                    and (mode == "1" or jax.default_backend() != "cpu")):
                from infur_tpu.ops.pallas_qgemm import qgemm_requant
                w2d = np.ascontiguousarray(wt.reshape(ig, o))
                interp = jax.default_backend() == "cpu"

                def run(env, ins=ins, outs=outs, w2d=w2d, base=base,
                        q=q, shift=shift, y_zp8=y_zp8, strides=strides,
                        interp=interp):
                    x8 = env[ins[0]]
                    if strides != (1, 1):
                        x8 = x8[:, ::strides[0], ::strides[1], :]
                    n, hh, ww, c = (int(s) for s in x8.shape)
                    y = qgemm_requant(
                        x8.reshape(n * hh * ww, c), jnp.asarray(w2d),
                        base, q, shift, y_zp8, interpret=interp)
                    env[outs[0]] = y.reshape(n, hh, ww, w2d.shape[1])
                return run

            # KxK convs (K>1, groups=1) as im2col + the same fused Pallas
            # GEMM (gated: INFUR_QEXEC_PALLAS3=1/auto).  Padding the input
            # with x_zp8 makes the folded `base = -x_zp*sum(w) + bias`
            # term exact at EVERY output position (padded pixels carry
            # exactly the zero-point, so their (x - zp) contribution is
            # zero) — no border correction needed; bit-exactness is again
            # integer-add associativity.  C_in >= 64 skips the 7x7 stem
            # (its im2col M blow-up at /2 resolution costs more HBM than
            # the conv is worth).
            mode3 = os.environ.get("INFUR_QEXEC_PALLAS3", "0")
            if (kernel != (1, 1) and groups == 1 and ig >= 64
                    and bool(np.all(np.asarray(shift) >= 33))
                    and mode3 != "0"
                    and (mode3 == "1" or jax.default_backend() != "cpu")):
                from infur_tpu.ops.pallas_qgemm import qgemm_requant
                w2d = np.ascontiguousarray(wt.reshape(kh * kw * ig, o))
                interp = jax.default_backend() == "cpu"

                def run(env, ins=ins, outs=outs, w2d=w2d, base=base,
                        q=q, shift=shift, y_zp8=y_zp8, x_zp8=x_zp8,
                        strides=strides, dils=dils, kernel=kernel,
                        attrs=attrs, interp=interp):
                    x8 = env[ins[0]]
                    n, hh, ww, c = (int(s) for s in x8.shape)
                    kh, kw = kernel
                    pads = oracle.resolve_pads(
                        attrs, (hh, ww), kernel, strides, dils)
                    xp = jnp.pad(
                        x8, ((0, 0), pads[0], pads[1], (0, 0)),
                        constant_values=np.int8(x_zp8))
                    ho = ((hh + pads[0][0] + pads[0][1]
                           - (kh - 1) * dils[0] - 1) // strides[0] + 1)
                    wo = ((ww + pads[1][0] + pads[1][1]
                           - (kw - 1) * dils[1] - 1) // strides[1] + 1)
                    taps = [
                        lax.slice(
                            xp,
                            (0, ky * dils[0], kx * dils[1], 0),
                            (n, ky * dils[0] + (ho - 1) * strides[0] + 1,
                             kx * dils[1] + (wo - 1) * strides[1] + 1, c),
                            (1, strides[0], strides[1], 1))
                        for ky in range(kh) for kx in range(kw)]
                    # concat order [ky][kx][c] matches wt(KH,KW,I,O) flat
                    xcol = jnp.concatenate(taps, axis=-1)
                    y = qgemm_requant(
                        xcol.reshape(n * ho * wo, kh * kw * c),
                        jnp.asarray(w2d), base, q, shift, y_zp8,
                        interpret=interp)
                    env[outs[0]] = y.reshape(n, ho, wo, w2d.shape[1])
                return run

            get_wt = _reg(f"{outs[0]}.w", wt)
            get_base = _reg(f"{outs[0]}.b", base)

            def run(env, ins=ins, outs=outs, wt=wt, wk=wk,
                    get_wt=get_wt, get_base=get_base,
                    q4=q4, sh4=sh4, y_zp8=y_zp8, x_zp8=x_zp8,
                    strides=strides, dils=dils, kernel=kernel,
                    groups=groups, attrs=attrs):
                x8 = env[ins[0]]
                pads = oracle.resolve_pads(
                    attrs, (int(x8.shape[1]), int(x8.shape[2])),
                    kernel, strides, dils)
                if x_zp8 != 0 and any(p != (0, 0) for p in pads):
                    # Pad the input with the zero-point and conv VALID:
                    # padded taps then contribute exactly (zp - zp) = 0,
                    # so the host-folded `base = bias - zp*K0` is correct
                    # at EVERY output position.  The alternative — edge
                    # `.at[].add` corrections on the accumulator — puts
                    # dynamic-update-slices between the conv and its
                    # requant epilogue, which blocks XLA's output fusion
                    # and forces the full int32 accumulator through HBM
                    # (measured ~1.9x on the whole int8 FCN, BENCH_NOTES
                    # 2026-08-19).  One s8 pad copy is ~100x cheaper.
                    x8 = jnp.pad(
                        x8, ((0, 0), pads[0], pads[1], (0, 0)),
                        constant_values=np.int8(x_zp8))
                    pads = [(0, 0), (0, 0)]
                dn = lax.conv_dimension_numbers(
                    x8.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
                acc = lax.conv_general_dilated(
                    x8, get_wt(env), window_strides=strides,
                    padding=pads, rhs_dilation=dils, dimension_numbers=dn,
                    feature_group_count=groups,
                    preferred_element_type=jnp.int32)
                acc = acc + get_base(env)
                # no-op after the zp-pad branch (pads are now all zero);
                # kept for the x_zp8 == 0 fast path's documentation value
                acc = _apply_zp_correction(
                    acc, wk, x_zp8, strides, pads, dils,
                    (int(x8.shape[1]), int(x8.shape[2])))
                env[outs[0]] = requant_jnp(acc, q4, sh4, y_zp8, np.int8)
            return run

        if op == "QLinearAdd":
            a_s = _scalar(inits[ins[1]], "a_scale")
            a_zp8 = int(_scalar(inits[ins[2]], "a_zp")) - 128
            b_s = _scalar(inits[ins[4]], "b_scale")
            b_zp8 = int(_scalar(inits[ins[5]], "b_zp")) - 128
            y_s = _scalar(inits[ins[6]], "y_scale")
            y_zp8 = int(_scalar(inits[ins[7]], "y_zp")) - 128
            ma = np.float32(a_s) / np.float32(y_s)
            mb = np.float32(b_s) / np.float32(y_s)
            from infur_tpu.onnx.requant import (
                ADD_GRID_BITS, add_rescale_jnp, decompose_add_rescale,
            )
            da, db = decompose_add_rescale(ma), decompose_add_rescale(mb)
            if da is not None and db is not None:
                # single-int32-multiply rescale on the 2**14 grid — one
                # multiply + shift per term (requant.py); the oracle and
                # importer take this branch under the same condition.
                # s8 rebase invariance: a8 - a_zp8 == a_u8 - a_zp.
                G = ADD_GRID_BITS

                def run(env, ins=ins, outs=outs, da=da, db=db,
                        a_zp8=a_zp8, b_zp8=b_zp8, y_zp8=y_zp8):
                    ta = jnp.clip(add_rescale_jnp(
                        env[ins[0]].astype(jnp.int32) - a_zp8, *da),
                        -(1 << 29), 1 << 29)
                    tb = jnp.clip(add_rescale_jnp(
                        env[ins[3]].astype(jnp.int32) - b_zp8, *db),
                        -(1 << 29), 1 << 29)
                    y = ((ta + tb + jnp.int32(1 << (G - 1))) >> G) \
                        + jnp.int32(y_zp8)
                    env[outs[0]] = jnp.clip(y, -128, 127).astype(jnp.int8)
                return run
            try:
                qa, sha = decompose_multiplier(ma)
                qb, shb = decompose_multiplier(mb)
            except ValueError as e:
                raise QExecUnsupported(f"QLinearAdd multiplier: {e}") from e
            # Oracle twin (_qlinear_add_int) with two exact
            # specializations: the rescale terms run the shl20 chain
            # (the ``<< 20`` input's low 16 bits are statically zero —
            # half the general mulhi ops, onnx/requant.py), and the
            # closing ``fixed_round(ta+tb, 2**30, 30+L)`` is exactly
            # ``sign(s) * ((|s| + 2**(L-1)) >> L)`` (divide numerator
            # and denominator by 2**30; |s| <= 2**30 keeps the
            # saturation from binding).  The per-term clip at 2**29
            # matches the oracle's int32-safety clamp.
            from infur_tpu.onnx.oracle import _QADD_SHIFT
            from infur_tpu.onnx.requant import fixed_round_shl20_jnp
            L = _QADD_SHIFT

            def run(env, ins=ins, outs=outs, qa=qa, sha=sha, qb=qb,
                    shb=shb, a_zp8=a_zp8, b_zp8=b_zp8, y_zp8=y_zp8):
                ta = jnp.clip(fixed_round_shl20_jnp(
                    env[ins[0]].astype(jnp.int32) - a_zp8, qa, sha),
                    -(1 << 29), 1 << 29)
                tb = jnp.clip(fixed_round_shl20_jnp(
                    env[ins[3]].astype(jnp.int32) - b_zp8, qb, shb),
                    -(1 << 29), 1 << 29)
                s = ta + tb
                r = (jnp.abs(s) + jnp.int32(1 << (L - 1))) >> L
                y = jnp.where(s < 0, -r, r) + jnp.int32(y_zp8)
                env[outs[0]] = jnp.clip(y, -128, 127).astype(jnp.int8)
            return run

        if op == "QLinearMul":
            a_s = _scalar(inits[ins[1]], "a_scale")
            a_zp8 = int(_scalar(inits[ins[2]], "a_zp")) - 128
            b_s = _scalar(inits[ins[4]], "b_scale")
            b_zp8 = int(_scalar(inits[ins[5]], "b_zp")) - 128
            y_s = _scalar(inits[ins[6]], "y_scale")
            y_zp8 = int(_scalar(inits[ins[7]], "y_zp")) - 128
            try:
                q, shift = decompose_multiplier(
                    np.float32(a_s) * np.float32(b_s) / np.float32(y_s))
            except ValueError as e:
                raise QExecUnsupported(f"QLinearMul multiplier: {e}") from e

            def run(env, ins=ins, outs=outs, q=q, shift=shift,
                    a_zp8=a_zp8, b_zp8=b_zp8, y_zp8=y_zp8):
                acc = ((env[ins[0]].astype(jnp.int32) - a_zp8)
                       * (env[ins[3]].astype(jnp.int32) - b_zp8))
                env[outs[0]] = requant_jnp(acc, q, shift, y_zp8, np.int8)
            return run

        if op == "QLinearGlobalAveragePool":
            x_s = _scalar(inits[ins[1]], "x_scale")
            x_zp8 = int(_scalar(inits[ins[2]], "x_zp")) - 128
            y_s = _scalar(inits[ins[3]], "y_scale")
            y_zp8 = int(_scalar(inits[ins[4]], "y_zp")) - 128

            def run(env, ins=ins, outs=outs, x_s=x_s, x_zp8=x_zp8,
                    y_s=y_s, y_zp8=y_zp8):
                a8 = env[ins[0]]
                n = int(a8.shape[1]) * int(a8.shape[2])
                acc = (a8.astype(jnp.int32) - x_zp8).sum(
                    axis=(1, 2), keepdims=True)
                m = np.float32(x_s) / (np.float32(y_s) * np.float32(n))
                try:
                    q, shift = decompose_multiplier(m)
                except ValueError:
                    raise QExecUnsupported("QLinearGAP multiplier")
                env[outs[0]] = requant_jnp(acc, q, shift, y_zp8, np.int8)
            return run

        if op == "QLookupTable":
            table = _init_only(inits, ins[1], "QLookupTable table")
            # s8-domain twin: index by a8+128, values shifted down by 128
            t8 = (np.asarray(table, np.int16) - 128).astype(np.int8)

            def run(env, ins=ins, outs=outs, t8=t8):
                a8 = env[ins[0]]
                env[outs[0]] = jnp.take(jnp.asarray(t8),
                                        a8.astype(jnp.int32) + 128)
            return run

        if op == "MaxPool":
            if attrs.get("storage_order", 0):
                raise QExecUnsupported("MaxPool storage_order")
            kernel = tuple(attrs["kernel_shape"])
            if len(kernel) != 2:
                raise QExecUnsupported("MaxPool must be 2-D")
            strides = tuple(attrs.get("strides") or (1,) * 2)
            dils = tuple(attrs.get("dilations") or (1,) * 2)
            ceil_mode = int(attrs.get("ceil_mode", 0))

            def run(env, ins=ins, outs=outs, kernel=kernel, strides=strides,
                    dils=dils, ceil_mode=ceil_mode, attrs=attrs):
                x8 = env[ins[0]]
                hw = (int(x8.shape[1]), int(x8.shape[2]))
                pads = oracle.resolve_pads(attrs, hw, kernel, strides, dils)
                if ceil_mode:
                    import math
                    new = []
                    for i in range(2):
                        eff = (kernel[i] - 1) * dils[i] + 1
                        padded = hw[i] + pads[i][0] + pads[i][1]
                        od = math.ceil((padded - eff) / strides[i]) + 1
                        if (od - 1) * strides[i] >= hw[i] + pads[i][0]:
                            od -= 1
                        need = (od - 1) * strides[i] + eff - padded
                        new.append((pads[i][0], pads[i][1] + max(need, 0)))
                    pads = new
                env[outs[0]] = lax.reduce_window(
                    x8, jnp.int8(-128), lax.max,
                    window_dimensions=(1,) + kernel + (1,),
                    window_strides=(1,) + strides + (1,),
                    window_dilation=(1,) + dils + (1,),
                    padding=[(0, 0)] + list(pads) + [(0, 0)])
            return run

        if op == "QLinearResize":
            mode = _s(attrs.get("mode", "linear"), "linear")
            ct = _s(attrs.get("coordinate_transformation_mode", "half_pixel"),
                    "half_pixel")
            if mode != "linear":
                raise QExecUnsupported(f"QLinearResize mode {mode!r}")
            from infur_tpu.onnx.qresize import (
                W_BITS, W_HALF, W_ONE, linear_axis_plan,
            )

            def run(env, ins=ins, outs=outs, ct=ct):
                x8 = env[ins[0]]
                scales = env.get(ins[2]) if len(ins) > 2 and ins[2] else None
                sizes = env.get(ins[3]) if len(ins) > 3 and ins[3] else None
                # logical NCHW geometry of the NHWC tensor
                lshape = np.asarray([x8.shape[0], x8.shape[3],
                                     x8.shape[1], x8.shape[2]], np.float64)
                if sizes is not None and np.asarray(sizes).size:
                    if not isinstance(sizes, (np.ndarray, np.generic)):
                        raise QExecUnsupported("Resize sizes must be static")
                    out_shape = np.asarray(sizes, np.int64).ravel()
                    scale_arr = out_shape / lshape
                else:
                    if not isinstance(scales, (np.ndarray, np.generic)):
                        raise QExecUnsupported("Resize scales must be static")
                    scale_arr = np.asarray(scales, np.float64).ravel()
                    out_shape = np.floor(lshape * scale_arr).astype(np.int64)
                out = x8
                for la in range(4):  # logical NCHW axis order
                    pa = _TO_PHYS[la]
                    if out_shape[la] == out.shape[pa] \
                            and scale_arr[la] == 1.0:
                        continue
                    lo, hi, w_hi = linear_axis_plan(
                        int(out_shape[la]), int(out.shape[pa]),
                        float(scale_arr[la]), ct)
                    a = jnp.take(out, jnp.asarray(lo.astype(np.int32)),
                                 axis=pa).astype(jnp.int32)
                    b = jnp.take(out, jnp.asarray(hi.astype(np.int32)),
                                 axis=pa).astype(jnp.int32)
                    shp = [1] * 4
                    shp[pa] = -1
                    w = jnp.asarray(w_hi.astype(np.int32).reshape(shp))
                    acc = a * (W_ONE - w) + b * w
                    # arithmetic >> : exact s8 twin of the u8 half-up
                    # rounding (the -128*W_ONE rebase is a multiple of
                    # 2**W_BITS, so it commutes with the shift)
                    out = ((acc + W_HALF) >> W_BITS).astype(jnp.int8)
                env[outs[0]] = out
            return run

        if op == "Concat":
            axis = int(attrs["axis"])

            def run(env, ins=ins, outs=outs, axis=axis, attrs=attrs):
                args = [env[n] for n in ins]
                if all(isinstance(a, (np.ndarray, np.generic)) for a in args):
                    env[outs[0]] = np.concatenate(
                        [np.asarray(a) for a in args], axis=axis)
                    return
                if any(a.ndim != 4 for a in args):
                    raise QExecUnsupported("Concat on non-4D activations")
                env[outs[0]] = jnp.concatenate(args,
                                               axis=_TO_PHYS[axis % 4])
            return run

        if op == "Identity":
            def run(env, ins=ins, outs=outs):
                env[outs[0]] = env[ins[0]]
            return run

        if op in _HOST_OPS:
            if op not in oracle.OPS:
                raise QExecUnsupported(f"host op {op} missing in oracle")

            def run(env, node=node, attrs=attrs):
                args = []
                for n in node.input:
                    if not n:
                        args.append(None)
                        continue
                    v = env[n]
                    if not isinstance(v, (np.ndarray, np.generic)):
                        raise QExecUnsupported(
                            f"{node.op_type} needs host inputs, got traced "
                            f"{n!r}")
                    args.append(v)
                result = oracle.OPS[node.op_type](attrs, *args)
                outs_v = result if isinstance(result, tuple) else (result,)
                for n, v in zip(node.output, outs_v):
                    if n:
                        env[n] = np.asarray(v)
            return run

        raise QExecUnsupported(f"op {op} outside the NHWC executor set")

    for node in graph.node:
        steps.append((node, _prep(node)))

    output_names = [o.name for o in graph.output]
    if not input_info:
        raise QExecUnsupported("graph has no runtime inputs")

    def fn(params: dict, feeds: dict) -> dict:
        env: dict[str, Any] = dict(inits)
        if params_np:
            missing = [k for k in params_np if k not in params]
            if missing:
                raise KeyError(
                    f"weights='args' model called without its params "
                    f"(missing {missing[:3]}...): pass model.params")
            env["__params__"] = params
        for vi in input_info:
            if vi.name not in feeds:
                raise KeyError(f"missing model input {vi.name!r}")
            x = jnp.asarray(feeds[vi.name])
            if x.ndim != 4:
                raise QExecUnsupported(
                    f"input {vi.name!r} must be 4-D, got {x.shape}")
            if input_layout == "NCHW":
                x = jnp.transpose(x, (0, 2, 3, 1))
            env[vi.name] = x
        for node, run in steps:
            # a traced tensor flowing into a Shape is the one spot where
            # the NHWC invariant must be translated back to NCHW
            if node.op_type == "Shape":
                v = env.get(node.input[0])
                if v is not None and not isinstance(
                        v, (np.ndarray, np.generic)):
                    if v.ndim != 4:
                        raise QExecUnsupported("Shape of non-4D activation")
                    dims = (int(v.shape[0]), int(v.shape[3]),
                            int(v.shape[1]), int(v.shape[2]))
                    start = node.attrs().get("start", 0) or 0
                    end = node.attrs().get("end")
                    sl = dims[start:end] if end is not None else dims[start:]
                    env[node.output[0]] = np.asarray(sl, np.int64)
                    continue
            run(env)
        out: dict[str, Any] = {}
        for name in output_names:
            v = env[name]
            if not isinstance(v, (np.ndarray, np.generic)) and v.ndim == 4:
                v = jnp.transpose(v, (0, 3, 1, 2))  # back to the NCHW contract
            out[name] = v
        return out

    return QExecModel(fn=fn, params=params_np, input_info=input_info,
                      output_names=output_names, graph=graph,
                      metadata=model.metadata(), input_layout=input_layout)
