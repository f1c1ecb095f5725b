"""Static int8 quantization: f32 ONNX graph -> QLinear (QOperator) graph.

The reference's flagship model is onnxruntime's static quantization of
FCN-ResNet50 (``fcn-resnet50-12-int8``, downloaded at
infur-test-gen/build.rs:88-93).  This module is the native equivalent of
that toolchain so the framework can *produce* such models, not just run
them:

1. **Calibrate** — run the f32 graph (NumPy oracle) on calibration feeds,
   recording min/max of every activation tensor.
2. **Quantize** — rewrite the graph in QOperator form: activations u8
   asymmetric per-tensor, weights s8 symmetric per-channel, bias i32 at
   scale s_x*s_w; Conv -> QLinearConv, Add -> QLinearAdd, MaxPool stays u8
   (order-preserving), Relu folds into the producer's output range, and
   everything else gets DequantizeLinear'd inputs and stays f32.

The graph keeps f32 inputs/outputs (QuantizeLinear at entry, Dequantize at
the boundary), exactly like the zoo model.  Run ``fold_batchnorm`` first.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from infur_tpu.onnx.proto import (
    GraphProto, ModelProto, make_model, make_node, numpy_to_tensor,
    tensor_to_numpy,
)

# ops that run in the integer domain
_Q_PASSTHROUGH = {"MaxPool"}  # same scale/zp in as out

# unary activations rewritten to a baked 256-entry u8 lookup table
# (QLookupTable, infur domain): both executors reduce them to the same
# gather, so the op is platform-exact — an f32 activation island between
# quantized ops is not (ulp differences flip ints at the requant boundary)
_LUT_OPS = {"Sigmoid", "HardSigmoid", "HardSwish", "Tanh", "LeakyRelu",
            "Gelu", "Erf"}


def _unary_f64(op: str, attrs: dict, f: np.ndarray) -> np.ndarray:
    """Float64 host evaluation of a LUT-able activation."""
    if op == "Sigmoid":
        return 1.0 / (1.0 + np.exp(-f))
    if op == "Gelu":
        approx = attrs.get("approximate", b"none")
        if isinstance(approx, bytes):
            approx = approx.decode()
        if approx == "tanh":
            return 0.5 * f * (1.0 + np.tanh(
                np.sqrt(2.0 / np.pi) * (f + 0.044715 * f ** 3)))
        import math
        erf = np.vectorize(math.erf)
        return 0.5 * f * (1.0 + erf(f / np.sqrt(2.0)))
    if op == "Erf":
        import math
        return np.vectorize(math.erf)(f)
    if op == "Tanh":
        return np.tanh(f)
    if op == "HardSigmoid":
        a = float(attrs.get("alpha", 0.2))
        b = float(attrs.get("beta", 0.5))
        return np.clip(a * f + b, 0.0, 1.0)
    if op == "HardSwish":
        return f * np.clip(f / 6.0 + 0.5, 0.0, 1.0)
    if op == "LeakyRelu":
        a = float(attrs.get("alpha", 0.01))
        return np.where(f >= 0, f, a * f)
    raise ValueError(f"not a LUT-able op: {op}")


@dataclass
class QParam:
    scale: float
    zero_point: int


def _qparam(lo: float, hi: float) -> QParam:
    """u8 asymmetric range including zero (ort's default calibration)."""
    lo, hi = min(float(lo), 0.0), max(float(hi), 0.0)
    scale = (hi - lo) / 255.0
    if scale <= 0.0:
        return QParam(1.0, 0)
    zp = int(np.clip(round(-lo / scale), 0, 255))
    return QParam(scale, zp)


def _smooth_dist(d: np.ndarray, eps: float = 1e-4) -> np.ndarray | None:
    """Move a little mass onto zero bins so KL stays finite (the standard
    smoothing from the MXNet/TensorRT entropy calibraters)."""
    d = d.astype(np.float64)
    zero = d == 0.0
    n_zero = int(zero.sum())
    n_nonzero = d.size - n_zero
    if n_nonzero == 0:
        return None
    take = eps * n_zero / n_nonzero
    if (d[~zero] <= take).any():
        take = 0.5 * float(d[~zero].min())
    out = d.copy()
    out[zero] = eps
    out[~zero] -= take
    return out


def _kl_after_quant(pool: np.ndarray, edges: np.ndarray, p: np.ndarray,
                    lo: float, hi: float, nlevels: int) -> float:
    """KL(p || q) where ``p`` is the pool's empirical distribution over a
    FIXED set of equal-mass reference bins (``edges``, computed once from
    the pool) and ``q`` is the distribution — over the SAME bins — of the
    pool after a saturating affine ``nlevels``-code quantizer with range
    [lo, hi] (clip, round to code, dequantize).

    Fixing the reference binning is what makes candidates comparable: a
    per-candidate rebinned histogram has a noise floor that depends on the
    candidate (few wide bins look artificially clean), which biases the
    argmin.  Here only ``q`` moves.  A too-wide range under-resolves the
    bulk (many bins' mass collapses onto one code -> neighbours go empty);
    over-clipping piles real mass onto the edge codes (bins past the cut
    go empty while the cut bin over-fills).  The argmin is the entropy
    calibration of TensorRT / ort's EntropyCalibrater, generalized to
    two-sided asymmetric ranges."""
    if hi <= lo:
        return np.inf
    scale = (hi - lo) / (nlevels - 1)
    deq = np.round((np.clip(pool, lo, hi) - lo) / scale) * scale + lo
    q, _ = np.histogram(deq, bins=edges)
    p = _smooth_dist(p.astype(np.float64))
    q = _smooth_dist(q.astype(np.float64))
    if p is None or q is None:
        return np.inf
    p /= p.sum()
    q /= q.sum()
    return float(np.sum(p * np.log(p / q)))


def _entropy_range(pool: np.ndarray, nlevels: int = 256,
                   ncand: int = 16, max_clip: float = 0.02,
                   ) -> tuple[float, float]:
    """Two-sided KL-optimal clipping range over pooled activation samples:
    candidate lo/hi cuts clip geometrically-spaced tail-mass fractions
    (1e-4 .. ``max_clip`` per side — so a cut just below a rare spike is
    always in the grid); two coordinate sweeps pick the (lo, hi)
    minimizing ``_kl_after_quant`` against equal-mass reference bins.

    The reference bin count adapts to the pool (~32 samples/bin, at most
    ``nlevels``/2 bins so a well-placed grid can resolve every bin).  A
    pool too sparse for at least 64 shape bins keeps exact min/max — the
    honest fallback, not a noisy guess."""
    pool = pool[np.isfinite(pool)]
    if pool.size == 0:
        return 0.0, 0.0
    lo0, hi0 = float(pool.min()), float(pool.max())
    if hi0 <= lo0:
        return lo0, hi0
    nbins = int(min(pool.size // 32, nlevels // 2))
    if nbins < 64:
        return lo0, hi0  # too sparse for shape-based calibration
    edges = np.unique(np.quantile(pool, np.linspace(0.0, 1.0, nbins + 1)))
    if edges.size < 3:
        return lo0, hi0
    p, _ = np.histogram(pool, bins=edges)
    frac = np.concatenate([[0.0], np.geomspace(1e-4, max_clip, ncand - 1)])
    lcand = np.quantile(pool, frac)
    rcand = np.quantile(pool, 1.0 - frac)
    lo, hi = lo0, hi0
    best = _kl_after_quant(pool, edges, p, lo, hi, nlevels)
    for _ in range(2):  # coordinate descent: lo sweep, then hi sweep
        for cand in lcand:
            d = _kl_after_quant(pool, edges, p, float(cand), hi, nlevels)
            if d < best:
                best, lo = d, float(cand)
        for cand in rcand:
            d = _kl_after_quant(pool, edges, p, lo, float(cand), nlevels)
            if d < best:
                best, hi = d, float(cand)
    return lo, hi


def calibrate(model: ModelProto, feeds_list: list[dict[str, np.ndarray]],
              percentile: float | None = None,
              entropy: bool = False,
              sample_cap: int = 8192,
              ) -> dict[str, tuple[float, float]]:
    """Activation ranges of every tensor over the calibration feeds.

    Default: exact streaming min/max (ort's MinMax calibration).

    ``percentile`` (e.g. 99.9): two-sided percentile ranges instead —
    lo/hi are the (100-p)/2 and 100-(100-p)/2 quantiles of the observed
    values, so a handful of outlier activations (transformer residuals
    are the classic case) no longer stretch the u8 grid and crush the
    resolution where the mass of the distribution lives.  Values are
    deterministically strided-subsampled to ``sample_cap`` per tensor per
    feed to bound memory; the quantile is computed over the pooled
    samples at the end.

    ``entropy``: KL-divergence-optimal ranges (ort's Entropy calibrater
    is the reference analog): per tensor, pick the clipping range whose
    saturating 256-level quantizer loses the least information about the
    observed distribution (``_kl_after_quant``).  Unlike ``percentile``
    it needs no hand-picked tail mass — heavy-tailed tensors clip hard.
    Like every entropy calibrater it trades tail accuracy for bulk
    resolution, so on compact tail-FREE activations exact min/max scores
    better fidelity (measured: tools/calib_fidelity.py) — which is why
    min/max stays the default and entropy is an opt-in for real-weight
    activation tails.  Mutually exclusive with ``percentile``.
    """
    from infur_tpu.onnx.oracle import run_graph

    if percentile is not None and entropy:
        raise ValueError("percentile= and entropy= are mutually exclusive")
    if percentile is not None and not 50.0 < percentile <= 100.0:
        raise ValueError(f"percentile must be in (50, 100], got {percentile}")
    g = model.graph
    init_names = {t.name for t in g.initializer}
    acts = [vi.name for vi in g.input if vi.name not in init_names]
    for n in g.node:
        acts.extend(o for o in n.output if o)
    ranges: dict[str, tuple[float, float]] = {}
    samples: dict[str, list[np.ndarray]] = {}
    for feeds in feeds_list:
        vals = run_graph(g, feeds, outputs=acts)
        for name, v in vals.items():
            if not np.issubdtype(v.dtype, np.floating):
                continue
            if percentile is not None or entropy:
                flat = np.asarray(v, np.float32).ravel()
                stride = max(1, flat.size // sample_cap)
                samples.setdefault(name, []).append(flat[::stride][:sample_cap])
                continue
            lo, hi = float(v.min()), float(v.max())
            if name in ranges:
                plo, phi = ranges[name]
                ranges[name] = (min(plo, lo), max(phi, hi))
            else:
                ranges[name] = (lo, hi)
    if percentile is not None:
        tail = (100.0 - percentile) / 2.0
        for name, chunks in samples.items():
            pool = np.concatenate(chunks)
            lo, hi = np.percentile(pool, [tail, 100.0 - tail])
            ranges[name] = (float(lo), float(hi))
    elif entropy:
        for name, chunks in samples.items():
            ranges[name] = _entropy_range(np.concatenate(chunks))
    return ranges


def quantize_static(model: ModelProto,
                    feeds_list: list[dict[str, np.ndarray]],
                    opset: int = 13,
                    transformer_int: bool = True,
                    ranges: dict[str, tuple[float, float]] | None = None,
                    percentile: float | None = None,
                    entropy: bool = False,
                    ) -> ModelProto:
    """Produce the QOperator-format int8 model (see module docstring).

    ``transformer_int`` enables the fully-integer transformer rules
    (integer LayerNorm/Softmax, act@act QLinearMatMul, u8 data movement,
    scalar-affine LUTs — onnx/qint.py): the whole graph becomes integer,
    so TPU == oracle bit-exact at every size.  False restores the
    round-2 mixed-precision scheme (f32 LN/softmax/attention islands;
    higher fidelity to the f32 model, but only CPU-bit-exact — the TPU
    mask agreement has a size envelope, PARITY.md).

    ``ranges`` supplies pre-computed activation ranges instead of running
    calibration here.  Tensor names in static-shape exports are
    size-stable, so ranges calibrated on a SMALL export apply to a
    large-size export of the same model — how ``segformer:int8`` serves
    arbitrary frame sizes without running the oracle at frame resolution.
    """
    g = model.graph
    if ranges is None:
        ranges = calibrate(model, feeds_list, percentile=percentile,
                           entropy=entropy)
    inits = {t.name: tensor_to_numpy(t) for t in g.initializer}

    out = GraphProto(name=g.name + "_int8", input=list(g.input),
                     output=list(g.output))
    new_inits: dict[str, np.ndarray] = {}
    nodes: list = []
    counter = [0]

    def fresh(prefix: str) -> str:
        counter[0] += 1
        return f"{prefix}__{counter[0]}"

    def add_init(name: str, arr: np.ndarray) -> str:
        new_inits[name] = arr
        return name

    # f32 tensor name -> (quantized name, QParam)
    qmap: dict[str, tuple[str, QParam]] = {}
    # tensors available in f32 domain (graph inputs + dequantized + f32 ops)
    graph_inputs = {vi.name for vi in g.input if vi.name not in inits}

    # single-consumer map for Relu folding
    consumers: dict[str, list] = {}
    for n in g.node:
        for i in n.input:
            consumers.setdefault(i, []).append(n)

    def ensure_q(name: str) -> tuple[str, QParam]:
        """Quantized version of activation `name` (insert QuantizeLinear)."""
        if name in qmap:
            return qmap[name]
        qp = _qparam(*ranges[name])
        qname = fresh(name + "_q")
        s = add_init(qname + "_scale", np.float32(qp.scale))
        z = add_init(qname + "_zp", np.uint8(qp.zero_point))
        nodes.append(make_node("QuantizeLinear", [name, s, z], [qname],
                               name=fresh("quant")))
        qmap[name] = (qname, qp)
        return qmap[name]

    def ensure_f32(name: str) -> str:
        """f32 version of a tensor that currently exists only quantized."""
        if name in f32_avail:
            return name
        qname, qp = qmap[name]
        dq = name + "_dq"
        if dq in f32_avail:
            return dq
        s = add_init(dq + "_scale", np.float32(qp.scale))
        z = add_init(dq + "_zp", np.uint8(qp.zero_point))
        nodes.append(make_node("DequantizeLinear", [qname, s, z], [dq],
                               name=fresh("dequant")))
        f32_avail.add(dq)
        f32_rename[name] = dq
        return dq

    f32_avail: set[str] = set(graph_inputs)
    f32_rename: dict[str, str] = {}
    node_list = list(g.node)
    node_index = {id(n): i for i, n in enumerate(node_list)}
    skip: set[int] = set()

    def relu_fold_target(node) -> tuple[str, object | None]:
        """If node's single consumer is Relu, fold it: return (range-source
        output name, the relu node); else (node output, None)."""
        outn = node.output[0]
        cs = consumers.get(outn, [])
        if len(cs) == 1 and cs[0].op_type == "Relu":
            return cs[0].output[0], cs[0]
        return outn, None

    for idx, node in enumerate(node_list):
        if idx in skip:
            continue
        op = node.op_type

        if op == "Conv" and node.input[1] in inits and \
                (node.input[0] in qmap or node.input[0] in ranges) and \
                relu_fold_target(node)[0] in ranges:
            # inputs without a calibration range (initializer-fed or
            # integer tensors calibrate() skipped) fall through to the
            # f32 path instead of KeyError-ing (ADVICE r1)
            x = node.input[0]
            w = inits[node.input[1]]
            b = inits.get(node.input[2]) if len(node.input) > 2 and \
                node.input[2] else None
            xq, xp = ensure_q(x)
            # weights: symmetric per-channel s8
            absmax = np.abs(w).reshape(w.shape[0], -1).max(axis=1)
            w_scale = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
            wq = np.clip(np.rint(w / w_scale.reshape(-1, 1, 1, 1)),
                         -127, 127).astype(np.int8)
            range_src, relu = relu_fold_target(node)
            yp = _qparam(*ranges[range_src])
            yname = range_src
            qy = fresh(yname + "_q")
            ins = [xq,
                   add_init(qy + "_xs", np.float32(xp.scale)),
                   add_init(qy + "_xz", np.uint8(xp.zero_point)),
                   add_init(fresh(node.input[1] + "_q"), wq),
                   add_init(qy + "_ws", w_scale),
                   add_init(qy + "_wz", np.zeros(w.shape[0], np.int8)),
                   add_init(qy + "_ys", np.float32(yp.scale)),
                   add_init(qy + "_yz", np.uint8(yp.zero_point))]
            if b is not None:
                bq = np.rint(b / (xp.scale * w_scale)).astype(np.int32)
                ins.append(add_init(fresh(yname + "_bq"), bq))
            nodes.append(make_node("QLinearConv", ins, [qy],
                                   name=fresh("qconv"), **node.attrs()))
            qmap[yname] = (qy, yp)
            if relu is not None:
                skip.add(node_index[id(relu)])
            continue

        if op == "Add" and all(i in ranges for i in node.input) and \
                relu_fold_target(node)[0] in ranges:
            aq, ap = ensure_q(node.input[0])
            bq2, bp = ensure_q(node.input[1])
            range_src, relu = relu_fold_target(node)
            yp = _qparam(*ranges[range_src])
            qy = fresh(range_src + "_q")
            ins = [aq, add_init(qy + "_as", np.float32(ap.scale)),
                   add_init(qy + "_az", np.uint8(ap.zero_point)),
                   bq2, add_init(qy + "_bs", np.float32(bp.scale)),
                   add_init(qy + "_bz", np.uint8(bp.zero_point)),
                   add_init(qy + "_ys", np.float32(yp.scale)),
                   add_init(qy + "_yz", np.uint8(yp.zero_point))]
            nodes.append(make_node("QLinearAdd", ins, [qy],
                                   name=fresh("qadd"), domain="com.microsoft"))
            qmap[range_src] = (qy, yp)
            if relu is not None:
                skip.add(node_index[id(relu)])
            continue

        if op == "MatMul" and len(node.input) == 2 \
                and (node.input[0] in qmap or node.input[0] in ranges):
            # dense layer (activation @ 2-D initializer weight, symmetric
            # s8 per-tensor — the importer's int8-operand MXU path needs
            # b_zp == 0) OR activation @ activation (attention
            # scores/context, u8 x u8 with calibrated scales — the
            # integer accumulator+requant path is exact either way).
            # A single consumer Add(out, 1-D initializer) is folded as an
            # int32 bias at scale a_scale*b_scale (QLinearConv-style 9th
            # input) so dense bias adds never become f32 islands.
            b_name = node.input[1]
            b_init = b_name in inits and inits[b_name].ndim == 2
            b_act = transformer_int and b_name not in inits \
                and (b_name in qmap or b_name in ranges)
            range_src, bias_add, bias_arr = node.output[0], None, None
            cs = consumers.get(node.output[0], [])
            if transformer_int and len(cs) == 1 and cs[0].op_type == "Add":
                other = [i for i in cs[0].input if i != node.output[0]]
                if len(other) == 1 and other[0] in inits \
                        and inits[other[0]].ndim == 1:
                    range_src, bias_add = cs[0].output[0], cs[0]
                    bias_arr = inits[other[0]]
            if (b_init or b_act) and range_src in ranges:
                xq, xp = ensure_q(node.input[0])
                yp = _qparam(*ranges[range_src])
                qy = fresh(range_src + "_q")
                if b_init:
                    w = inits[b_name]
                    b_scale = np.float32(
                        max(float(np.abs(w).max()) / 127.0, 1e-12))
                    wq = np.clip(np.rint(w / b_scale),
                                 -127, 127).astype(np.int8)
                    bq_in = add_init(fresh(b_name + "_q"), wq)
                    bs = add_init(qy + "_ws", b_scale)
                    bz = add_init(qy + "_wz", np.int8(0))
                else:
                    bq_in, bp = ensure_q(b_name)
                    b_scale = np.float32(bp.scale)
                    bs = add_init(qy + "_bs", np.float32(bp.scale))
                    bz = add_init(qy + "_bz", np.uint8(bp.zero_point))
                ins = [xq,
                       add_init(qy + "_xs", np.float32(xp.scale)),
                       add_init(qy + "_xz", np.uint8(xp.zero_point)),
                       bq_in, bs, bz,
                       add_init(qy + "_ys", np.float32(yp.scale)),
                       add_init(qy + "_yz", np.uint8(yp.zero_point))]
                if bias_arr is not None:
                    biasq = np.rint(
                        bias_arr / (float(xp.scale) * float(b_scale))
                    ).astype(np.int32)
                    ins.append(add_init(fresh(range_src + "_bq"), biasq))
                nodes.append(make_node("QLinearMatMul", ins, [qy],
                                       name=fresh("qmatmul")))
                qmap[range_src] = (qy, yp)
                if bias_add is not None:
                    skip.add(node_index[id(bias_add)])
                continue

        if op in _Q_PASSTHROUGH and (node.input[0] in qmap
                                     or node.input[0] in ranges):
            xq, xp = ensure_q(node.input[0])
            qy = fresh(node.output[0] + "_q")
            nodes.append(make_node(op, [xq], [qy], name=fresh("qpool"),
                                   **node.attrs()))
            qmap[node.output[0]] = (qy, xp)  # same scale/zp
            continue

        if op in _LUT_OPS and (transformer_int or op not in ("Gelu", "Erf")) \
                and (node.input[0] in qmap
                               or node.input[0] in ranges) \
                and node.output[0] in ranges:
            xq, xp = ensure_q(node.input[0])
            yp = _qparam(*ranges[node.output[0]])
            f = (np.arange(256, dtype=np.float64) - xp.zero_point) * xp.scale
            y = _unary_f64(op, node.attrs(), f)
            table = np.clip(np.rint(y / yp.scale) + yp.zero_point,
                            0, 255).astype(np.uint8)
            qy = fresh(node.output[0] + "_q")
            nodes.append(make_node(
                "QLookupTable",
                [xq, add_init(fresh(node.output[0] + "_lut"), table)],
                [qy], name=fresh("qlut"), domain="infur"))
            qmap[node.output[0]] = (qy, yp)
            continue

        if op == "Mul" and not any(i in inits for i in node.input) \
                and all(i in qmap or i in ranges for i in node.input) \
                and node.output[0] in ranges:
            aq, ap = ensure_q(node.input[0])
            bq2, bp = ensure_q(node.input[1])
            yp = _qparam(*ranges[node.output[0]])
            qy = fresh(node.output[0] + "_q")
            ins = [aq, add_init(qy + "_as", np.float32(ap.scale)),
                   add_init(qy + "_az", np.uint8(ap.zero_point)),
                   bq2, add_init(qy + "_bs", np.float32(bp.scale)),
                   add_init(qy + "_bz", np.uint8(bp.zero_point)),
                   add_init(qy + "_ys", np.float32(yp.scale)),
                   add_init(qy + "_yz", np.uint8(yp.zero_point))]
            nodes.append(make_node("QLinearMul", ins, [qy],
                                   name=fresh("qmul"), domain="com.microsoft"))
            qmap[node.output[0]] = (qy, yp)
            continue

        if op == "GlobalAveragePool" and (node.input[0] in qmap
                                          or node.input[0] in ranges) \
                and node.output[0] in ranges:
            xq, xp = ensure_q(node.input[0])
            yp = _qparam(*ranges[node.output[0]])
            qy = fresh(node.output[0] + "_q")
            ins = [xq, add_init(qy + "_xs", np.float32(xp.scale)),
                   add_init(qy + "_xz", np.uint8(xp.zero_point)),
                   add_init(qy + "_ys", np.float32(yp.scale)),
                   add_init(qy + "_yz", np.uint8(yp.zero_point))]
            nodes.append(make_node("QLinearGlobalAveragePool", ins, [qy],
                                   name=fresh("qgap"), domain="com.microsoft"))
            qmap[node.output[0]] = (qy, yp)
            continue

        if op == "Resize" and (node.input[0] in qmap
                               or node.input[0] in ranges) \
                and node.attrs().get("mode") in (b"linear", "linear"):
            # integer linear Resize, scale/zp passthrough (interpolation
            # stays inside the input's range) — see onnx/qresize.py
            xq, xp = ensure_q(node.input[0])
            qy = fresh(node.output[0] + "_q")
            rest = [f32_rename.get(i, i) for i in node.input[1:]]
            nodes.append(make_node("QLinearResize", [xq, *rest], [qy],
                                   name=fresh("qresize"), domain="infur",
                                   **node.attrs()))
            qmap[node.output[0]] = (qy, xp)  # passthrough qparams
            continue

        # ---- fully-integer transformer rules (onnx/qint.py) ----

        if transformer_int and op in ("Transpose", "Reshape", "Identity",
                  "Squeeze", "Unsqueeze") and node.input[0] in qmap:
            # pure data movement: runs on the u8 codes, scale/zp unchanged
            xq, xp = qmap[node.input[0]]
            qy = fresh(node.output[0] + "_q")
            rest = [f32_rename.get(i, i) for i in node.input[1:]]
            nodes.append(make_node(op, [xq, *rest], [qy],
                                   name=fresh("qmove"), **node.attrs()))
            qmap[node.output[0]] = (qy, xp)
            continue

        if transformer_int and op == "Split" and node.input[0] in qmap:
            xq, xp = qmap[node.input[0]]
            qouts = [fresh(o + "_q") for o in node.output]
            rest = [f32_rename.get(i, i) for i in node.input[1:]]
            nodes.append(make_node("Split", [xq, *rest], qouts,
                                   name=fresh("qsplit"), **node.attrs()))
            for o, qo in zip(node.output, qouts):
                qmap[o] = (qo, xp)
            continue

        if transformer_int and op in ("Mul", "Div", "Add", "Sub") \
                and len(node.input) == 2 and node.output[0] in ranges:
            # elementwise with a SCALAR initializer operand (e.g. the
            # attention 1/sqrt(dh)): an affine map of the dequantized
            # value -> one baked 256-entry u8 table, platform-exact
            cpos = [i for i, nm in enumerate(node.input)
                    if nm in inits and np.size(inits[nm]) == 1]
            apos = 1 - cpos[0] if cpos else None
            if cpos and (node.input[apos] in qmap
                         or node.input[apos] in ranges) \
                    and not (op == "Div" and cpos[0] == 0):
                cval = float(np.asarray(
                    inits[node.input[cpos[0]]], np.float64).reshape(()))
                xq, xp = ensure_q(node.input[apos])
                yp = _qparam(*ranges[node.output[0]])
                f = (np.arange(256, dtype=np.float64)
                     - xp.zero_point) * xp.scale
                if op == "Mul":
                    y = f * cval
                elif op == "Div":
                    y = f / cval
                elif op == "Add":
                    y = f + cval
                else:
                    y = (f - cval) if cpos[0] == 1 else (cval - f)
                table = np.clip(np.rint(y / yp.scale) + yp.zero_point,
                                0, 255).astype(np.uint8)
                qy = fresh(node.output[0] + "_q")
                nodes.append(make_node(
                    "QLookupTable",
                    [xq, add_init(fresh(node.output[0] + "_lut"), table)],
                    [qy], name=fresh("qlut"), domain="infur"))
                qmap[node.output[0]] = (qy, yp)
                continue

        if transformer_int and op == "LayerNormalization" and len(node.input) >= 3 \
                and node.input[1] in inits and node.input[2] in inits \
                and (node.input[0] in qmap or node.input[0] in ranges) \
                and node.output[0] in ranges \
                and int(node.attrs().get("axis", -1)) == -1:
            # integer LayerNorm: (x-mean)/std is scale/zp-free on the u8
            # codes; per-channel gamma/std affine baked as fixed-point
            # (onnx/qint.py).  On any failure (absurd ratios) fall to f32.
            from infur_tpu.onnx.qint import layernorm_consts
            gamma = np.asarray(inits[node.input[1]])
            beta = np.asarray(inits[node.input[2]])
            yp = _qparam(*ranges[node.output[0]])
            try:
                s_, sqd_fp, t_, gmul, boff = layernorm_consts(
                    int(gamma.size), gamma, beta, yp.scale, yp.zero_point)
            except ValueError:
                s_ = None
            if s_ is not None:
                xq, xp = ensure_q(node.input[0])
                qy = fresh(node.output[0] + "_q")
                nodes.append(make_node(
                    "QLayerNorm",
                    [xq, add_init(fresh(node.output[0] + "_gmul"), gmul),
                     add_init(fresh(node.output[0] + "_boff"), boff)],
                    [qy], name=fresh("qln"), domain="infur",
                    s=s_, sqd_fp=sqd_fp, t=t_))
                qmap[node.output[0]] = (qy, yp)
                continue

        if transformer_int and op == "Softmax" \
                and (node.input[0] in qmap or node.input[0] in ranges) \
                and int(node.attrs().get("axis", -1)) == -1:
            # integer softmax: exp of the u8 difference-to-row-max is a
            # 256-entry table; output is u8 probabilities at fixed scale
            # 1/255 (onnx/qint.py)
            from infur_tpu.onnx.qint import softmax_exp_table
            xq, xp = ensure_q(node.input[0])
            table = softmax_exp_table(xp.scale)
            qy = fresh(node.output[0] + "_q")
            nodes.append(make_node(
                "QSoftmax",
                [xq, add_init(fresh(node.output[0] + "_exp"), table)],
                [qy], name=fresh("qsoftmax"), domain="infur"))
            qmap[node.output[0]] = (qy, QParam(1.0 / 255.0, 0))
            continue

        if transformer_int and op == "Concat" and len(node.input) >= 2 \
                and all(i in qmap or i in ranges for i in node.input) \
                and node.output[0] in ranges:
            # integer Concat: inputs requant onto the output grid via
            # 256-entry tables (identity when grids already match)
            yp = _qparam(*ranges[node.output[0]])
            qins = []
            for i in node.input:
                iq, ip = ensure_q(i)
                if (abs(ip.scale - yp.scale) < 1e-12
                        and ip.zero_point == yp.zero_point):
                    qins.append(iq)
                    continue
                f = (np.arange(256, dtype=np.float64)
                     - ip.zero_point) * ip.scale
                table = np.clip(np.rint(f / yp.scale) + yp.zero_point,
                                0, 255).astype(np.uint8)
                rq = fresh(i + "_rq")
                nodes.append(make_node(
                    "QLookupTable",
                    [iq, add_init(fresh(i + "_rqlut"), table)],
                    [rq], name=fresh("qlut"), domain="infur"))
                qins.append(rq)
            qy = fresh(node.output[0] + "_q")
            nodes.append(make_node("Concat", qins, [qy],
                                   name=fresh("qconcat"), **node.attrs()))
            qmap[node.output[0]] = (qy, yp)
            continue

        if op == "Relu" and node.input[0] in qmap \
                and qmap[node.input[0]][1].zero_point == 0:
            # producer's range was already non-negative (post-relu fold or
            # relu'd upstream): relu is the identity in this u8 encoding
            qmap[node.output[0]] = qmap[node.input[0]]
            continue

        # fallback: run the node in f32 (dequantize inputs as needed)
        new_in = []
        for i in node.input:
            if not i or i in inits or i in f32_avail:
                new_in.append(f32_rename.get(i, i))
            elif i in qmap:
                new_in.append(ensure_f32(i))
            else:
                new_in.append(f32_rename.get(i, i))
        nodes.append(make_node(op, new_in, list(node.output),
                               name=node.name or fresh(op), domain=node.domain,
                               **node.attrs()))
        for o in node.output:
            f32_avail.add(o)

    # graph outputs must be f32
    for vi in out.output:
        if vi.name in qmap and vi.name not in f32_avail:
            qname, qp = qmap[vi.name]
            s = add_init(vi.name + "_os", np.float32(qp.scale))
            z = add_init(vi.name + "_oz", np.uint8(qp.zero_point))
            nodes.append(make_node("DequantizeLinear", [qname, s, z],
                                   [vi.name], name=fresh("dequant_out")))

    out.node = nodes
    used: set[str] = set()
    for n in nodes:
        used.update(n.input)
    for name, arr in inits.items():  # keep f32 initializers still referenced
        if name in used and name not in new_inits:
            new_inits[name] = arr
    out.initializer = [numpy_to_tensor(np.asarray(a), nm)
                       for nm, a in new_inits.items() if nm in used]
    return make_model(out, opset=opset)
