"""Pure-NumPy reference executor for ONNX graphs — the golden oracle.

The reference validates inference against onnxruntime-CPU (its tests load the
real FCN-ResNet50 and assert the output contract, reference
infur/src/predict_onnx.rs:357-381).  onnxruntime does not exist in this
environment, so this module serves as the independent CPU reference the TPU
path is checked against: simple, unvectorized-where-it-matters, correctness
over speed.  It is also used by the importer for compile-time constant
folding of Shape/Gather/Concat/Reshape idioms.

Op semantics follow the ONNX operator spec (opset 13 defaults unless noted).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import numpy as np

from infur_tpu.onnx.proto import GraphProto, ModelProto, tensor_to_numpy

OpFn = Callable[..., Any]
OPS: dict[str, OpFn] = {}


def op(name: str) -> Callable[[OpFn], OpFn]:
    def deco(fn: OpFn) -> OpFn:
        OPS[name] = fn
        return fn
    return deco


# ---------------------------------------------------------------------------
# Shared conv/pool geometry helpers (also used by the JAX importer)
# ---------------------------------------------------------------------------

def resolve_pads(attrs: dict, spatial_in: tuple[int, ...], kernel: tuple[int, ...],
                 strides: tuple[int, ...], dilations: tuple[int, ...],
                 ) -> list[tuple[int, int]]:
    """Resolve auto_pad/pads attributes into per-axis (begin, end) pads."""
    nd = len(spatial_in)
    auto = attrs.get("auto_pad", "NOTSET")
    if isinstance(auto, bytes):
        auto = auto.decode()
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        for i in range(nd):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            out_dim = math.ceil(spatial_in[i] / strides[i])
            pad = max((out_dim - 1) * strides[i] + eff_k - spatial_in[i], 0)
            half = pad // 2
            out.append((half, pad - half) if auto == "SAME_UPPER" else (pad - half, half))
        return out
    if auto == "VALID":
        return [(0, 0)] * nd
    pads = attrs.get("pads") or [0] * (2 * nd)
    return [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]


def _window_view(x: np.ndarray, kernel: tuple[int, int], strides: tuple[int, int],
                 dilations: tuple[int, int]) -> np.ndarray:
    """(N,C,H,W) -> strided view (N,C,Ho,Wo,kH,kW)."""
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    dh, dw = dilations
    ho = (h - (kh - 1) * dh - 1) // sh + 1
    wo = (w - (kw - 1) * dw - 1) // sw + 1
    sn, sc, shh, sww = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (n, c, ho, wo, kh, kw),
        (sn, sc, shh * sh, sww * sw, shh * dh, sww * dw), writeable=False)


def conv2d_reference(x: np.ndarray, w: np.ndarray, b: np.ndarray | None,
                     strides: tuple[int, int], pads: list[tuple[int, int]],
                     dilations: tuple[int, int], groups: int,
                     acc_dtype: Any = None) -> np.ndarray:
    """Grouped dilated 2D convolution via windowed tensordot.

    ``acc_dtype`` forces the accumulator (int32 for the quantized path).
    """
    x = np.pad(x, ((0, 0), (0, 0), pads[0], pads[1]))
    n, c, _, _ = x.shape
    m, cg, kh, kw = w.shape
    assert c == cg * groups, f"conv channel mismatch: x has {c}, w wants {cg}*{groups}"
    view = _window_view(x, (kh, kw), strides, dilations)  # (N,C,Ho,Wo,kH,kW)
    ho, wo = view.shape[2], view.shape[3]
    mg = m // groups
    if acc_dtype is not None:
        view = view.astype(acc_dtype)
        w = w.astype(acc_dtype)
    out = np.empty((n, m, ho, wo), dtype=(acc_dtype or np.result_type(x, w)))
    if groups == c and cg == 1 and mg == 1:
        # depthwise fast path: one einsum over all channels instead of a
        # Python loop per group (MobileNetV3 has 960-group convs) — same
        # contraction, contracted per-channel
        out[:] = np.einsum("nchwij,cij->nchw", view, w[:, 0], optimize=True)
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
        return out
    # grouped general case: one einsum with an explicit group axis (the
    # reshape materializes the strided window view once; still far cheaper
    # than a Python loop over groups)
    vg = view.reshape(n, groups, cg, ho, wo, kh, kw)
    wg = w.reshape(groups, mg, cg, kh, kw)
    out[:] = np.einsum("ngchwij,gmcij->ngmhw", vg, wg,
                       optimize=True).reshape(n, m, ho, wo)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Elementwise / activation ops
# ---------------------------------------------------------------------------

@op("Add")
def _add(attrs, a, b):
    return a + b

@op("Sub")
def _sub(attrs, a, b):
    return a - b

@op("Mul")
def _mul(attrs, a, b):
    return a * b

@op("Div")
def _div(attrs, a, b):
    if np.issubdtype(np.asarray(a).dtype, np.integer):
        return (np.asarray(a) // np.asarray(b)).astype(np.asarray(a).dtype)
    return a / b

@op("Pow")
def _pow(attrs, a, b):
    return np.power(a, b).astype(np.asarray(a).dtype)

@op("Sqrt")
def _sqrt(attrs, x):
    return np.sqrt(x)

@op("Exp")
def _exp(attrs, x):
    return np.exp(x)

@op("Log")
def _log(attrs, x):
    return np.log(x)

@op("Neg")
def _neg(attrs, x):
    return -x

@op("Abs")
def _abs(attrs, x):
    return np.abs(x)

@op("Mod")
def _mod(attrs, x, y):
    # fmod=0 (default): result sign follows the divisor, like Python %;
    # fmod=1: C fmod, sign follows the dividend.  torch emits Mod in the
    # opset-14 scaled_dot_product_attention head-split arithmetic.
    if attrs.get("fmod", 0):
        return np.fmod(x, y)
    return np.mod(x, y)

@op("Floor")
def _floor(attrs, x):
    return np.floor(x)

@op("Ceil")
def _ceil(attrs, x):
    return np.ceil(x)

@op("Relu")
def _relu(attrs, x):
    return np.maximum(x, 0)

@op("LeakyRelu")
def _leaky(attrs, x):
    alpha = attrs.get("alpha", 0.01)
    return np.where(x >= 0, x, x * np.asarray(alpha, x.dtype))

@op("Sigmoid")
def _sigmoid(attrs, x):
    return 1.0 / (1.0 + np.exp(-x))

@op("Tanh")
def _tanh(attrs, x):
    return np.tanh(x)

@op("Erf")
def _erf(attrs, x):
    vec = np.vectorize(math.erf)
    return vec(x).astype(x.dtype)

@op("HardSigmoid")
def _hardsigmoid(attrs, x):
    a = attrs.get("alpha", 0.2)
    b = attrs.get("beta", 0.5)
    return np.clip(a * x + b, 0, 1).astype(x.dtype)

@op("HardSwish")
def _hardswish(attrs, x):
    return (x * np.clip(x / 6.0 + 0.5, 0, 1)).astype(x.dtype)

@op("Clip")
def _clip(attrs, x, *bounds):
    lo = bounds[0] if len(bounds) > 0 and bounds[0] is not None else attrs.get("min")
    hi = bounds[1] if len(bounds) > 1 and bounds[1] is not None else attrs.get("max")
    return np.clip(x, lo, hi)

@op("Max")
def _max_(attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.maximum(out, x)
    return out

@op("Min")
def _min_(attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.minimum(out, x)
    return out

@op("Softmax")
def _softmax(attrs, x):
    if attrs.get("__opset__", 13) < 13:
        axis = int(attrs.get("axis", 1)) % x.ndim
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        flat = x.reshape(lead, -1)
        e = np.exp(flat - flat.max(-1, keepdims=True))
        return (e / e.sum(-1, keepdims=True)).reshape(x.shape).astype(x.dtype)
    axis = attrs.get("axis", -1)
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)

@op("Gelu")
def _gelu(attrs, x):
    approx = attrs.get("approximate", "none")
    if isinstance(approx, bytes):
        approx = approx.decode()
    if approx == "tanh":
        return (0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))).astype(x.dtype)
    vec = np.vectorize(math.erf)
    return (0.5 * x * (1 + vec(x / np.sqrt(2.0)))).astype(x.dtype)

@op("Identity")
def _identity(attrs, x):
    return x

@op("Dropout")
def _dropout(attrs, x, *rest):
    return x  # inference mode

@op("Cast")
def _cast(attrs, x):
    from infur_tpu.onnx.proto import _DTYPE_MAP
    return x.astype(_DTYPE_MAP[attrs["to"]])

@op("Where")
def _where(attrs, c, a, b):
    return np.where(c, a, b)

@op("Equal")
def _equal(attrs, a, b):
    return np.equal(a, b)

@op("Greater")
def _greater(attrs, a, b):
    return np.greater(a, b)

@op("Less")
def _less(attrs, a, b):
    return np.less(a, b)


# ---------------------------------------------------------------------------
# Shape / structure ops
# ---------------------------------------------------------------------------

@op("Shape")
def _shape(attrs, x):
    return np.asarray(x.shape, np.int64)

@op("Size")
def _size(attrs, x):
    return np.asarray(x.size, np.int64)

@op("Reshape")
def _reshape(attrs, x, shape=None):
    if shape is None:
        shape = attrs["shape"]
    shape = [int(s) for s in np.asarray(shape).ravel()]
    # 0 = copy input dim (allowzero defaults 0)
    if not attrs.get("allowzero", 0):
        shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return x.reshape(shape)

@op("Flatten")
def _flatten(attrs, x):
    axis = attrs.get("axis", 1)
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    return x.reshape(lead, -1)

@op("Transpose")
def _transpose(attrs, x):
    perm = attrs.get("perm")
    return np.transpose(x, perm)

@op("Concat")
def _concat(attrs, *xs):
    return np.concatenate(xs, axis=attrs["axis"])

@op("Split")
def _split(attrs, x, split=None):
    axis = attrs.get("axis", 0)
    if split is None:
        split = attrs.get("split")
    if split is None:
        n = attrs.get("num_outputs")
        size = x.shape[axis]
        per = -(-size // n)
        split = [per] * (n - 1) + [size - per * (n - 1)]
    idx = np.cumsum([int(s) for s in np.asarray(split).ravel()])[:-1]
    return tuple(np.split(x, idx, axis=axis))

@op("Squeeze")
def _squeeze(attrs, x, axes=None):
    if axes is None:
        axes = attrs.get("axes")
    if axes is None:
        return np.squeeze(x)
    axes = [int(a) % x.ndim for a in np.asarray(axes).ravel()]
    return np.squeeze(x, axis=tuple(axes))

@op("Unsqueeze")
def _unsqueeze(attrs, x, axes=None):
    if axes is None:
        axes = attrs["axes"]
    axes = sorted(int(a) % (x.ndim + len(np.asarray(axes).ravel()))
                  for a in np.asarray(axes).ravel())
    for a in axes:
        x = np.expand_dims(x, a)
    return x

@op("Gather")
def _gather(attrs, x, indices):
    axis = attrs.get("axis", 0)
    return np.take(x, np.asarray(indices, np.int64), axis=axis)

@op("GatherElements")
def _gather_elements(attrs, x, indices):
    axis = attrs.get("axis", 0)
    return np.take_along_axis(x, np.asarray(indices, np.int64), axis=axis)

@op("Slice")
def _slice(attrs, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset-1 attribute form
        starts, ends = attrs["starts"], attrs["ends"]
        axes, steps = attrs.get("axes"), None
    starts = [int(v) for v in np.asarray(starts).ravel()]
    ends = [int(v) for v in np.asarray(ends).ravel()]
    axes = (list(range(len(starts))) if axes is None
            else [int(v) % x.ndim for v in np.asarray(axes).ravel()])
    steps = ([1] * len(starts) if steps is None
             else [int(v) for v in np.asarray(steps).ravel()])
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        INT64_MAX = (1 << 63) - 1
        e = None if e >= INT64_MAX else e
        e2 = None if (st < 0 and e is not None and e < -x.shape[a]) else e
        sl[a] = slice(s, e2, st)
    return x[tuple(sl)]

@op("Pad")
def _pad(attrs, x, pads=None, value=None, axes=None):
    mode = attrs.get("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if pads is None:
        pads = attrs["pads"]
    pads = [int(p) for p in np.asarray(pads).ravel()]
    if axes is not None:
        ax = [int(a) % x.ndim for a in np.asarray(axes).ravel()]
    else:
        ax = list(range(x.ndim))
    nd = len(ax)
    width = [(0, 0)] * x.ndim
    for i, a in enumerate(ax):
        width[a] = (pads[i], pads[i + nd])
    if mode == "constant":
        cval = float(value) if value is not None else attrs.get("value", 0.0)
        return np.pad(x, width, constant_values=np.asarray(cval, x.dtype))
    np_mode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
    return np.pad(x, width, mode=np_mode)

@op("Expand")
def _expand(attrs, x, shape):
    shape = [int(s) for s in np.asarray(shape).ravel()]
    return np.broadcast_to(x, np.broadcast_shapes(x.shape, tuple(shape))).copy()

@op("Tile")
def _tile(attrs, x, repeats):
    return np.tile(x, [int(r) for r in np.asarray(repeats).ravel()])

@op("Range")
def _range(attrs, start, limit, delta):
    return np.arange(start.item(), limit.item(), delta.item(),
                     dtype=np.asarray(start).dtype)

@op("ConstantOfShape")
def _constant_of_shape(attrs, shape):
    val = attrs.get("value")
    if val is None:
        val = np.zeros(1, np.float32)
    return np.full([int(s) for s in np.asarray(shape).ravel()], val.ravel()[0], val.dtype)

@op("Constant")
def _constant(attrs):
    if "value" in attrs:
        return attrs["value"]
    for k in ("value_float", "value_int"):
        if k in attrs:
            return np.asarray(attrs[k])
    if "value_floats" in attrs:
        return np.asarray(attrs["value_floats"], np.float32)
    if "value_ints" in attrs:
        return np.asarray(attrs["value_ints"], np.int64)
    raise ValueError("Constant node without value")


# ---------------------------------------------------------------------------
# Reductions / indices
# ---------------------------------------------------------------------------

def _reduce(fn, attrs, x, axes_in=None):
    axes = attrs.get("axes")
    if axes_in is not None:
        axes = [int(a) for a in np.asarray(axes_in).ravel()]
    keep = bool(attrs.get("keepdims", 1))
    if not axes:  # None or empty axes tensor
        if attrs.get("noop_with_empty_axes", 0):
            return x
        axes = None  # opset-18: empty axes + noop=0 => reduce ALL dims
    ax = None if axes is None else tuple(int(a) % x.ndim for a in axes)
    return fn(x, axis=ax, keepdims=keep)

@op("ReduceMean")
def _reduce_mean(attrs, x, axes=None):
    return _reduce(np.mean, attrs, x, axes).astype(x.dtype)

@op("ReduceSum")
def _reduce_sum(attrs, x, axes=None):
    return _reduce(np.sum, attrs, x, axes).astype(x.dtype)

@op("ReduceMax")
def _reduce_max(attrs, x, axes=None):
    return _reduce(np.max, attrs, x, axes)

@op("ReduceMin")
def _reduce_min(attrs, x, axes=None):
    return _reduce(np.min, attrs, x, axes)

@op("ArgMax")
def _argmax(attrs, x):
    axis = attrs.get("axis", 0)
    keep = bool(attrs.get("keepdims", 1))
    if attrs.get("select_last_index", 0):
        rev = np.flip(x, axis)
        idx = x.shape[axis] - 1 - np.argmax(rev, axis=axis)
    else:
        idx = np.argmax(x, axis=axis)
    idx = idx.astype(np.int64)
    return np.expand_dims(idx, axis) if keep else idx


# ---------------------------------------------------------------------------
# Linear algebra / normalization
# ---------------------------------------------------------------------------

@op("MatMul")
def _matmul(attrs, a, b):
    return np.matmul(a, b)

@op("Gemm")
def _gemm(attrs, a, b, c=None):
    alpha = attrs.get("alpha", 1.0)
    beta = attrs.get("beta", 1.0)
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = alpha * (a @ b)
    if c is not None:
        y = y + beta * c
    return y.astype(a.dtype)

@op("BatchNormalization")
def _bn(attrs, x, scale, bias, mean, var):
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = 1.0 / np.sqrt(var.astype(np.float64) + eps)
    out = (x - mean.reshape(shape)) * (scale * inv).reshape(shape).astype(x.dtype) \
        + bias.reshape(shape)
    return out.astype(x.dtype)

@op("InstanceNormalization")
def _in_norm(attrs, x, scale, bias):
    eps = attrs.get("epsilon", 1e-5)
    ax = tuple(range(2, x.ndim))
    mean = x.mean(axis=ax, keepdims=True)
    var = x.var(axis=ax, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) / np.sqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape)).astype(x.dtype)

@op("LayerNormalization")
def _layer_norm(attrs, x, scale, bias=None):
    axis = attrs.get("axis", -1)
    eps = attrs.get("epsilon", 1e-5)
    ax = tuple(range(axis % x.ndim, x.ndim))
    mean = x.mean(axis=ax, keepdims=True)
    var = x.var(axis=ax, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv / pooling / resize
# ---------------------------------------------------------------------------

def _conv_geometry(attrs, x, w):
    nd = x.ndim - 2
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    kernel = tuple(attrs.get("kernel_shape") or w.shape[2:])
    groups = int(attrs.get("group", 1))
    pads = resolve_pads(attrs, x.shape[2:], kernel, strides, dilations)
    return strides, dilations, kernel, groups, pads

@op("Conv")
def _conv(attrs, x, w, b=None):
    assert x.ndim == 4, "oracle supports 2D conv"
    strides, dilations, _, groups, pads = _conv_geometry(attrs, x, w)
    return conv2d_reference(x, w, b, strides, pads, dilations, groups)

@op("ConvTranspose")
def _conv_transpose(attrs, x, w, b=None):
    assert x.ndim == 4
    nd = 2
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    groups = int(attrs.get("group", 1))
    kh, kw = w.shape[2], w.shape[3]
    pads_attr = attrs.get("pads") or [0] * 4
    out_pad = attrs.get("output_padding") or [0] * nd
    n, c, h, wd = x.shape
    cg = c // groups
    m = w.shape[1] * groups
    # scatter x into a dilated grid, then correlate with flipped kernel
    hu = (h - 1) * strides[0] + 1
    wu = (wd - 1) * strides[1] + 1
    up = np.zeros((n, c, hu, wu), x.dtype)
    up[:, :, ::strides[0], ::strides[1]] = x
    eff_kh = (kh - 1) * dilations[0] + 1
    eff_kw = (kw - 1) * dilations[1] + 1
    pt = eff_kh - 1 - pads_attr[0]
    pl_ = eff_kw - 1 - pads_attr[1]
    pb = eff_kh - 1 - pads_attr[2] + out_pad[0]
    pr = eff_kw - 1 - pads_attr[3] + out_pad[1]
    wf = w[:, :, ::-1, ::-1]  # (C, M/g, kH, kW) flipped
    out_parts = []
    for g in range(groups):
        xg = up[:, g * cg:(g + 1) * cg]
        wg = wf[g * cg:(g + 1) * cg]          # (cg, mg, kh, kw)
        wg2 = np.transpose(wg, (1, 0, 2, 3))  # (mg, cg, kh, kw)
        out_parts.append(conv2d_reference(
            xg, wg2, None, (1, 1), [(pt, pb), (pl_, pr)], dilations, 1))
    out = np.concatenate(out_parts, axis=1)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out.astype(x.dtype)

def _pool_prepare(attrs, x, pad_value):
    kernel = tuple(attrs["kernel_shape"])
    nd = len(kernel)
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    pads = resolve_pads(attrs, x.shape[2:], kernel, strides, dilations)
    if attrs.get("ceil_mode", 0):
        # extend end pads so ceil-division windows fit
        new_pads = []
        for i in range(nd):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            padded = x.shape[2 + i] + pads[i][0] + pads[i][1]
            out_dim = math.ceil((padded - eff_k) / strides[i]) + 1
            # ONNX: last window must start inside input+begin-pad
            if (out_dim - 1) * strides[i] >= x.shape[2 + i] + pads[i][0]:
                out_dim -= 1
            need = (out_dim - 1) * strides[i] + eff_k - padded
            new_pads.append((pads[i][0], pads[i][1] + max(need, 0)))
        pads = new_pads
    xp = np.pad(x, ((0, 0), (0, 0)) + tuple(pads),
                constant_values=pad_value)
    return xp, kernel, strides, dilations, pads

@op("MaxPool")
def _maxpool(attrs, x):
    assert x.ndim == 4
    neg = np.finfo(x.dtype).min if np.issubdtype(x.dtype, np.floating) \
        else np.iinfo(x.dtype).min
    xp, kernel, strides, dilations, _ = _pool_prepare(attrs, x, neg)
    view = _window_view(xp, kernel, strides, dilations)
    return view.max(axis=(4, 5))

@op("AveragePool")
def _avgpool(attrs, x):
    assert x.ndim == 4
    include_pad = attrs.get("count_include_pad", 0)
    xp, kernel, strides, dilations, pads = _pool_prepare(attrs, x, 0)
    view = _window_view(xp, kernel, strides, dilations)
    s = view.sum(axis=(4, 5), dtype=np.float64)
    if include_pad:
        # count explicit pad cells, but NOT the ceil_mode end extension:
        # torch/onnxruntime exclude out-of-bounds ceil windows from the
        # divisor even with count_include_pad=1 (pinned by the torch
        # differential test, tests/test_oracle_vs_torch.py)
        nd = len(kernel)
        expl = resolve_pads(attrs, x.shape[2:], kernel,
                            strides, dilations)
        ones = np.ones((1, 1) + tuple(
            x.shape[2 + i] + expl[i][0] + expl[i][1] for i in range(nd)),
            np.float64)
        onesp = np.pad(ones, ((0, 0), (0, 0)) + tuple(
            (0, (pads[i][0] - expl[i][0]) + (pads[i][1] - expl[i][1]))
            for i in range(nd)))
    else:
        ones = np.ones((1, 1) + x.shape[2:], np.float64)
        onesp = np.pad(ones, ((0, 0), (0, 0)) + tuple(pads))
    cnt = _window_view(onesp, kernel, strides, dilations).sum(axis=(4, 5))
    return (s / np.maximum(cnt, 1)).astype(x.dtype)

@op("GlobalAveragePool")
def _gap(attrs, x):
    return x.mean(axis=tuple(range(2, x.ndim)), keepdims=True).astype(x.dtype)

@op("GlobalMaxPool")
def _gmp(attrs, x):
    return x.max(axis=tuple(range(2, x.ndim)), keepdims=True)


def _resize_coords(out_size: int, in_size: int, scale: float, mode: str) -> np.ndarray:
    """Output-pixel -> input-coordinate mapping per coordinate_transformation_mode."""
    x = np.arange(out_size, dtype=np.float64)
    if mode == "half_pixel":
        return (x + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        return (x + 0.5) / scale - 0.5 if out_size > 1 else np.zeros_like(x)
    if mode == "align_corners":
        if out_size == 1:
            return np.zeros_like(x)
        return x * (in_size - 1) / (out_size - 1)
    if mode == "asymmetric":
        return x / scale
    raise ValueError(f"unsupported coordinate_transformation_mode {mode!r}")


@op("Resize")
def _resize(attrs, x, roi=None, scales=None, sizes=None):
    mode = attrs.get("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    ct = attrs.get("coordinate_transformation_mode", "half_pixel")
    if isinstance(ct, bytes):
        ct = ct.decode()
    nearest_mode = attrs.get("nearest_mode", "round_prefer_floor")
    if isinstance(nearest_mode, bytes):
        nearest_mode = nearest_mode.decode()

    in_shape = np.asarray(x.shape, np.float64)
    if sizes is not None and np.asarray(sizes).size:
        out_shape = np.asarray(sizes, np.int64).ravel()
        scale_arr = out_shape / in_shape
    else:
        scale_arr = np.asarray(scales, np.float64).ravel()
        out_shape = np.floor(in_shape * scale_arr).astype(np.int64)

    out = x
    for axis in range(x.ndim):
        if out_shape[axis] == x.shape[axis] and scale_arr[axis] == 1.0:
            continue
        coords = _resize_coords(int(out_shape[axis]), out.shape[axis],
                                scale_arr[axis], ct)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(coords)
            elif nearest_mode == "ceil":
                idx = np.ceil(coords)
            elif nearest_mode == "round_prefer_ceil":
                idx = np.floor(coords + 0.5)
            else:  # round_prefer_floor
                idx = np.ceil(coords - 0.5)
            idx = np.clip(idx, 0, out.shape[axis] - 1).astype(np.int64)
            out = np.take(out, idx, axis=axis)
        elif mode == "linear":
            lo = np.clip(np.floor(coords), 0, out.shape[axis] - 1).astype(np.int64)
            hi = np.clip(lo + 1, 0, out.shape[axis] - 1)
            t = np.clip(coords - lo, 0.0, 1.0)
            a = np.take(out, lo, axis=axis).astype(np.float64)
            b = np.take(out, hi, axis=axis).astype(np.float64)
            shape = [1] * out.ndim
            shape[axis] = -1
            t = t.reshape(shape)
            out = (a * (1 - t) + b * t)
        else:
            raise ValueError(f"unsupported resize mode {mode!r}")
    return out.astype(x.dtype)

@op("Upsample")
def _upsample(attrs, x, scales=None):
    if scales is None:
        scales = attrs["scales"]
    return _resize({"mode": attrs.get("mode", "nearest"),
                    "coordinate_transformation_mode": "asymmetric",
                    "nearest_mode": "floor"}, x, None, np.asarray(scales), None)


# ---------------------------------------------------------------------------
# Quantization ops (int8 path) — exact integer semantics
# ---------------------------------------------------------------------------

def _qminmax(dtype: np.dtype) -> tuple[int, int]:
    info = np.iinfo(dtype)
    return info.min, info.max


def _fixedpoint_requant_enabled() -> bool:
    """INFUR_FIXEDPOINT_REQUANT=0 restores the f32 requant multiplier
    (A/B escape hatch; the integer path is the platform-exact default —
    see onnx/requant.py)."""
    import os
    return os.environ.get("INFUR_FIXEDPOINT_REQUANT", "1") != "0"


def _requant_int(acc: np.ndarray, multiplier: np.ndarray, y_zp,
                 channel_shape=None) -> np.ndarray | None:
    """Integer-only requant of an int32 accumulator; None → caller falls
    back to the f32 path (out-of-range multiplier or flag off)."""
    if not _fixedpoint_requant_enabled():
        return None
    from .requant import decompose_multiplier, requant_ref
    try:
        q, shift = decompose_multiplier(multiplier)
    except ValueError:
        return None
    if channel_shape is not None and q.size > 1:
        q = q.reshape(channel_shape)
        shift = shift.reshape(channel_shape)
    return requant_ref(acc, q, shift, np.asarray(y_zp, np.int64),
                       np.asarray(y_zp).dtype)

def quantize(x: np.ndarray, scale: np.ndarray, zero_point: np.ndarray,
             axis: int = 1) -> np.ndarray:
    """y = saturate(round_half_to_even(x/scale) + zp), per ONNX QuantizeLinear."""
    zp = np.asarray(zero_point)
    s = np.asarray(scale, np.float32)
    if s.ndim == 1 and s.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
        zp = zp.reshape(shape)
    # one IEEE multiply by the host-precomputed reciprocal instead of a
    # division: f32 division is not correctly rounded on every backend
    # (TPU lowers it to reciprocal+refinement), a multiply is — keeps the
    # JAX lowering bit-identical to this oracle (onnx/requant.py).
    q = np.rint(x * (np.float32(1.0) / s)) + zp.astype(np.int64)
    lo, hi = _qminmax(np.asarray(zero_point).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(zero_point).dtype)

def dequantize(x: np.ndarray, scale: np.ndarray, zero_point: np.ndarray | None,
               axis: int = 1) -> np.ndarray:
    s = np.asarray(scale, np.float32)
    zp = np.zeros_like(s, np.int64) if zero_point is None \
        else np.asarray(zero_point, np.int64)
    if s.ndim == 1 and s.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
        zp = zp.reshape(shape)
    return ((x.astype(np.int64) - zp).astype(np.float32) * s).astype(np.float32)

@op("QuantizeLinear")
def _quantize_linear(attrs, x, scale, zp=None):
    if zp is None:
        zp = np.zeros((), np.uint8)
    return quantize(x, scale, zp, attrs.get("axis", 1))

@op("DequantizeLinear")
def _dequantize_linear(attrs, x, scale, zp=None):
    return dequantize(x, scale, zp, attrs.get("axis", 1))

@op("QLinearConv")
def _qlinear_conv(attrs, x, x_scale, x_zp, w, w_scale, w_zp,
                  y_scale, y_zp, b=None):
    """Integer conv: acc_i32 = conv(x-xzp, w-wzp) + b; y = q(acc * sx*sw/sy)."""
    strides, dilations, _, groups, pads = _conv_geometry(attrs, x, w)
    xi = x.astype(np.int32) - np.int32(x_zp)
    wzp = np.asarray(w_zp, np.int32)
    if wzp.ndim == 1 and wzp.size > 1:
        wi = w.astype(np.int32) - wzp.reshape(-1, 1, 1, 1)
    else:
        wi = w.astype(np.int32) - wzp
    acc = conv2d_reference(xi, wi, None, strides, pads, dilations, groups,
                           acc_dtype=np.int64).astype(np.int64)
    if b is not None:
        acc = acc + b.astype(np.int64).reshape(1, -1, 1, 1)
    sx = np.asarray(x_scale, np.float32)
    sw = np.asarray(w_scale, np.float32)
    sy = np.asarray(y_scale, np.float32)
    multiplier = sx * sw / sy
    out = _requant_int(acc, multiplier, y_zp, channel_shape=(1, -1, 1, 1))
    if out is not None:
        return out
    if sw.ndim == 1 and sw.size > 1:
        scale = multiplier.reshape(1, -1, 1, 1)
    else:
        scale = multiplier
    q = np.rint(acc.astype(np.float32) * scale) + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(y_zp).dtype)

@op("QLinearMatMul")
def _qlinear_matmul(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp,
                    bias=None):
    # 9th input (infur extension, like QLinearConv's): int32 bias at scale
    # a_scale*b_scale added to the exact accumulator — keeps dense bias
    # adds inside the integer domain instead of an f32 Add island
    ai = a.astype(np.int64) - np.int64(a_zp)
    bi = b.astype(np.int64) - np.int64(b_zp)
    acc = np.matmul(ai, bi)
    if bias is not None:
        acc = acc + np.asarray(bias, np.int64)
    scale = (np.float32(a_scale) * np.float32(b_scale)) / np.float32(y_scale)
    out = _requant_int(acc, scale, y_zp)
    if out is not None:
        return out
    q = np.rint(acc.astype(np.float32) * scale) + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(y_zp).dtype)

@op("QLinearAdd")  # com.microsoft domain, used by quantized torchvision exports
def _qlinear_add(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    # Integer-only path (TFLite-style double rescale): inputs are shifted
    # left by 2**20, rescaled by s_in/s_out with the fixed-point core, and
    # the sum is shifted back down with rounding.  A float QLinearAdd is
    # NOT platform-exact even per-op-deterministic math: XLA recomputes
    # fused f32 subgraphs per consumer (FMA/reassociation), so the same
    # tensor can take two different values inside one program — observed
    # as the round-1 int8 mask divergence on TPU.
    out = _qlinear_add_int(a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp)
    if out is not None:
        return out
    af = (a.astype(np.float32) - np.float32(a_zp)) * np.float32(a_scale)
    bf = (b.astype(np.float32) - np.float32(b_zp)) * np.float32(b_scale)
    # reciprocal multiply, not division — see quantize()
    q = np.rint((af + bf) * (np.float32(1.0) / np.float32(y_scale))) + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(y_zp).dtype)


_QADD_SHIFT = 20  # left-shift giving the integer Add its sub-step precision


def _qlinear_add_int(a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    """Integer QLinearAdd; None → caller falls back to the f32 path."""
    if not _fixedpoint_requant_enabled():
        return None
    if any(np.size(v) > 1 for v in (a_scale, a_zp, b_scale, b_zp, y_scale, y_zp)):
        return None
    from .requant import (
        ADD_GRID_BITS, add_rescale_ref, decompose_add_rescale,
        decompose_multiplier, fixed_round_ref,
    )
    ma = np.float32(a_scale) / np.float32(y_scale)
    mb = np.float32(b_scale) / np.float32(y_scale)
    da, db = decompose_add_rescale(ma), decompose_add_rescale(mb)
    if da is not None and db is not None:
        # single-multiply rescale on the 2**14 grid (requant.py) — the
        # importer and NHWC executor take this branch under the SAME
        # host-side condition, so all three compute identical integers
        G = ADD_GRID_BITS
        ai = np.asarray(a).astype(np.int64) - np.int64(a_zp)
        bi = np.asarray(b).astype(np.int64) - np.int64(b_zp)
        ta = np.clip(add_rescale_ref(ai, *da), -(1 << 29), 1 << 29)
        tb = np.clip(add_rescale_ref(bi, *db), -(1 << 29), 1 << 29)
        y = ((ta + tb + (np.int64(1) << (G - 1))) >> G) + np.int64(y_zp)
        lo, hi = _qminmax(np.asarray(y_zp).dtype)
        return np.clip(y, lo, hi).astype(np.asarray(y_zp).dtype)
    try:
        qa, sha = decompose_multiplier(ma)
        qb, shb = decompose_multiplier(mb)
    except ValueError:
        return None
    L = _QADD_SHIFT
    ai = (np.asarray(a).astype(np.int64) - np.int64(a_zp)) << L
    bi = (np.asarray(b).astype(np.int64) - np.int64(b_zp)) << L
    # per-term clamp at 2**29 (= out-magnitude 512, beyond any 8-bit clip)
    # keeps ta+tb inside int32 on the device twin
    ta = np.clip(fixed_round_ref(ai, qa, sha), -(1 << 29), 1 << 29)
    tb = np.clip(fixed_round_ref(bi, qb, shb), -(1 << 29), 1 << 29)
    y = fixed_round_ref(ta + tb, 1 << 30, 30 + L) + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(y, lo, hi).astype(np.asarray(y_zp).dtype)

@op("QLinearMul")  # com.microsoft domain (SE gating and friends)
def _qlinear_mul(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    # integer product then one fixed-point requant: (a-az)*(b-bz) is
    # bounded by 255^2, the i32 accumulator is exact; multiplier
    # = s_a*s_b/s_y.  Same platform-exactness rationale as QLinearAdd.
    acc = ((a.astype(np.int64) - np.int64(a_zp))
           * (b.astype(np.int64) - np.int64(b_zp)))
    if all(np.size(v) <= 1 for v in (a_scale, b_scale, y_scale)):
        multiplier = (np.float32(a_scale) * np.float32(b_scale)
                      / np.float32(y_scale))
        out = _requant_int(acc, multiplier, y_zp)
        if out is not None:
            return out
    af = (a.astype(np.float32) - np.float32(a_zp)) * np.float32(a_scale)
    bf = (b.astype(np.float32) - np.float32(b_zp)) * np.float32(b_scale)
    q = np.rint(af * bf * (np.float32(1.0) / np.float32(y_scale))) \
        + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(y_zp).dtype)


@op("QLookupTable")  # infur domain: unary activation as a baked u8 table
def _qlookup_table(attrs, x, table):
    # The quantizer bakes table[i] = quantize(act(dequantize(i))) on the
    # host (float64), so both executors reduce the activation to the same
    # 256-entry gather — bit-exact by construction, and the fastest
    # possible form on either backend.
    return np.asarray(table, np.uint8)[x]


@op("QLayerNorm")  # infur domain: integer LayerNorm (see onnx/qint.py)
def _qlayernorm(attrs, x, gmul, boff):
    from infur_tpu.onnx.qint import qlayernorm_ref
    return qlayernorm_ref(x, gmul, boff, s=int(attrs["s"]),
                          sqd_fp=int(attrs["sqd_fp"]), t=int(attrs["t"]))


@op("QSoftmax")  # infur domain: integer softmax via a baked exp table
def _qsoftmax(attrs, x, table):
    from infur_tpu.onnx.qint import qsoftmax_ref
    return qsoftmax_ref(x, table)


@op("QLinearResize")  # infur domain: integer linear Resize (see qresize.py)
def _qlinear_resize(attrs, x, roi=None, scales=None, sizes=None):
    mode = attrs.get("mode", "linear")
    if isinstance(mode, bytes):
        mode = mode.decode()
    ct = attrs.get("coordinate_transformation_mode", "half_pixel")
    if isinstance(ct, bytes):
        ct = ct.decode()
    if mode != "linear":
        raise ValueError(f"QLinearResize supports linear mode, got {mode!r}")
    from infur_tpu.onnx.qresize import linear_axis_plan, qresize_axis_ref
    in_shape = np.asarray(x.shape, np.float64)
    if sizes is not None and np.asarray(sizes).size:
        out_shape = np.asarray(sizes, np.int64).ravel()
        scale_arr = out_shape / in_shape
    else:
        scale_arr = np.asarray(scales, np.float64).ravel()
        out_shape = np.floor(in_shape * scale_arr).astype(np.int64)
    out = x
    for axis in range(x.ndim):
        if out_shape[axis] == out.shape[axis] and scale_arr[axis] == 1.0:
            continue
        lo, hi, w_hi = linear_axis_plan(int(out_shape[axis]),
                                        out.shape[axis], scale_arr[axis], ct)
        out = qresize_axis_ref(out, axis, lo, hi, w_hi)
    return out


@op("QLinearGlobalAveragePool")  # com.microsoft domain
def _qlinear_gap(attrs, x, x_scale, x_zp, y_scale, y_zp):
    # Integer spatial sum (order-independent, so platform-exact — an f32
    # mean would accumulate in a backend-specific order) then one requant
    # with multiplier x_scale / (y_scale * N).
    axes = tuple(range(2, x.ndim))
    n = int(np.prod([x.shape[i] for i in axes]))
    acc = (x.astype(np.int64) - np.int64(x_zp)).sum(axis=axes, keepdims=True)
    multiplier = np.float32(x_scale) / (np.float32(y_scale) * np.float32(n))
    out = _requant_int(acc, multiplier, y_zp)
    if out is not None:
        return out
    q = np.rint(acc.astype(np.float32) * multiplier) + np.int64(y_zp)
    lo, hi = _qminmax(np.asarray(y_zp).dtype)
    return np.clip(q, lo, hi).astype(np.asarray(y_zp).dtype)


# ---------------------------------------------------------------------------
# Graph executor
# ---------------------------------------------------------------------------

class UnsupportedOp(NotImplementedError):
    pass


def run_graph(graph: GraphProto, feeds: dict[str, np.ndarray],
              outputs: list[str] | None = None,
              opset: int = 13) -> dict[str, np.ndarray]:
    """Execute a graph with NumPy; returns requested (default: graph) outputs."""
    env: dict[str, np.ndarray] = {}
    for init in graph.initializer:
        env[init.name] = tensor_to_numpy(init)
    env.update(feeds)
    for node in graph.node:
        fn = OPS.get(node.op_type)
        if fn is None:
            raise UnsupportedOp(f"oracle: unsupported op {node.op_type}")
        args = [env[name] if name else None for name in node.input]
        attrs = node.attrs()
        attrs["__opset__"] = opset
        result = fn(attrs, *args)
        outs = result if isinstance(result, tuple) else (result,)
        for name, val in zip(node.output, outs):
            if name:
                env[name] = np.asarray(val)
    wanted = outputs if outputs is not None else [o.name for o in graph.output]
    return {name: env[name] for name in wanted}


def run_model(model: ModelProto, feeds: dict[str, np.ndarray],
              outputs: list[str] | None = None) -> dict[str, np.ndarray]:
    from infur_tpu.onnx.importer import graph_opset
    return run_graph(model.graph, feeds, outputs, opset=graph_opset(model))
