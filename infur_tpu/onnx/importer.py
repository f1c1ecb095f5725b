"""ONNX graph -> JAX callable (the TPU inference path).

Replaces the reference's onnxruntime session (reference
infur/src/predict_onnx.rs:288-293) with a native lowering: every node maps to
jnp/lax primitives, the whole graph is traced once under ``jax.jit`` and XLA
tiles the conv/matmul stack onto the MXU and fuses the elementwise glue.

Import-time design:

* **Constant folding.** Exported graphs are littered with
  Shape->Gather->Unsqueeze->Concat->Reshape machinery.  Any node whose inputs
  are all *small* compile-time constants is evaluated once with the NumPy
  oracle and disappears from the traced graph — so the JAX path never sees a
  dynamic shape.
* **Weights are parameters, not constants.** Initializers above a size
  threshold become entries of a params dict (a pytree the caller can shard
  with ``jax.sharding`` or donate), small ones fold.
* **Static shapes.** Inputs must have concrete shapes at call time; symbolic
  batch dims in the model signature are resolved from the example feed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infur_tpu.errors import ModelLoadError
from infur_tpu.onnx import oracle
from infur_tpu.onnx.proto import (
    GraphProto, ModelProto, ValueInfoProto, load_model, tensor_to_numpy, _DTYPE_MAP,
)

# Initializers with at most this many elements fold into the trace as
# constants; larger ones stay runtime parameters.
FOLD_PARAM_MAX_ELEMS = 1024
# All-constant nodes fold unless their output would exceed this.
FOLD_OUTPUT_MAX_ELEMS = 1 << 20

JaxOpFn = Callable[..., Any]
JAX_OPS: dict[str, JaxOpFn] = {}


def jop(name: str) -> Callable[[JaxOpFn], JaxOpFn]:
    def deco(fn: JaxOpFn) -> JaxOpFn:
        JAX_OPS[name] = fn
        return fn
    return deco


def _dec(v: Any, default: str = "") -> str:
    if isinstance(v, bytes):
        return v.decode()
    return v if isinstance(v, str) else default


# ---------------------------------------------------------------------------
# Elementwise / activations — mirror oracle semantics on jnp
# ---------------------------------------------------------------------------

_SIMPLE = {
    "Add": lambda a, x, y: x + y,
    "Sub": lambda a, x, y: x - y,
    "Mul": lambda a, x, y: x * y,
    "Pow": lambda a, x, y: jnp.power(x, y).astype(x.dtype),
    "Sqrt": lambda a, x: jnp.sqrt(x),
    "Exp": lambda a, x: jnp.exp(x),
    "Log": lambda a, x: jnp.log(x),
    "Neg": lambda a, x: -x,
    "Abs": lambda a, x: jnp.abs(x),
    "Floor": lambda a, x: jnp.floor(x),
    "Ceil": lambda a, x: jnp.ceil(x),
    # fmod=0 -> sign of divisor (jnp.mod); fmod=1 -> sign of dividend
    "Mod": lambda a, x, y: (jnp.fmod(x, y) if a.get("fmod", 0)
                            else jnp.mod(x, y)),
    "Relu": lambda a, x: jnp.maximum(x, 0),
    "Sigmoid": lambda a, x: jax.nn.sigmoid(x),
    "Tanh": lambda a, x: jnp.tanh(x),
    "Erf": lambda a, x: lax.erf(x),
    "Identity": lambda a, x: x,
    "Where": lambda a, c, x, y: jnp.where(c, x, y),
    "Equal": lambda a, x, y: jnp.equal(x, y),
    "Greater": lambda a, x, y: jnp.greater(x, y),
    "Less": lambda a, x, y: jnp.less(x, y),
    "MatMul": lambda a, x, y: jnp.matmul(x, y, preferred_element_type=x.dtype),
}
for _name, _fn in _SIMPLE.items():
    JAX_OPS[_name] = _fn


@jop("Div")
def _jdiv(attrs, a, b):
    if jnp.issubdtype(a.dtype, jnp.integer):
        return (a // b).astype(a.dtype)
    return a / b

@jop("LeakyRelu")
def _jleaky(attrs, x):
    return jnp.where(x >= 0, x, x * jnp.asarray(attrs.get("alpha", 0.01), x.dtype))

@jop("Clip")
def _jclip(attrs, x, *bounds):
    lo = bounds[0] if len(bounds) > 0 and bounds[0] is not None else attrs.get("min")
    hi = bounds[1] if len(bounds) > 1 and bounds[1] is not None else attrs.get("max")
    if lo is not None:
        x = jnp.maximum(x, jnp.asarray(lo, x.dtype))
    if hi is not None:
        x = jnp.minimum(x, jnp.asarray(hi, x.dtype))
    return x

@jop("Max")
def _jmax(attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out

@jop("Min")
def _jmin(attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out

@jop("Softmax")
def _jsoftmax(attrs, x):
    if attrs.get("__opset__", 13) < 13:
        # pre-13 Softmax: coerce to 2D over [axis:] flattened (default 1)
        axis = int(attrs.get("axis", 1)) % x.ndim
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        y = jax.nn.softmax(x.reshape(lead, -1), axis=-1)
        return y.reshape(x.shape)
    return jax.nn.softmax(x, axis=attrs.get("axis", -1))

@jop("Gelu")
def _jgelu(attrs, x):
    return jax.nn.gelu(x, approximate=_dec(attrs.get("approximate", "none")) == "tanh")

@jop("HardSigmoid")
def _jhardsigmoid(attrs, x):
    a = attrs.get("alpha", 0.2)
    b = attrs.get("beta", 0.5)
    return jnp.clip(a * x + b, 0, 1).astype(x.dtype)

@jop("HardSwish")
def _jhardswish(attrs, x):
    return (x * jnp.clip(x / 6.0 + 0.5, 0, 1)).astype(x.dtype)

@jop("Dropout")
def _jdropout(attrs, x, *rest):
    return x

@jop("Cast")
def _jcast(attrs, x):
    return x.astype(_DTYPE_MAP[attrs["to"]])


# Shape/Size are static under jit (trace-time shapes are concrete): they
# return NUMPY arrays, and the trace loop keeps all-numpy-input nodes in
# the numpy domain (oracle ops) — so the zoo models' dynamic
# Shape->Gather->Concat->Resize idiom resolves to constants at trace time
# and XLA never sees a dynamic shape.
@jop("Shape")
def _jshape(attrs, x):
    dims = x.shape
    start = attrs.get("start", 0) or 0
    end = attrs.get("end")
    sl = dims[start:end] if end is not None else dims[start:]
    return np.asarray(sl, np.int64)


@jop("Size")
def _jsize(attrs, x):
    return np.asarray(int(np.prod(x.shape)), np.int64)


# ---------------------------------------------------------------------------
# Structure ops (shape arguments arrive constant-folded as numpy)
# ---------------------------------------------------------------------------

def _const_ints(v: Any, what: str) -> list[int]:
    if isinstance(v, (np.ndarray, list, tuple)):
        return [int(x) for x in np.asarray(v).ravel()]
    raise ModelLoadError(
        f"{what} must be a compile-time constant (constant folding failed)")

@jop("Reshape")
def _jreshape(attrs, x, shape=None):
    dims = _const_ints(shape if shape is not None else attrs["shape"], "Reshape shape")
    if not attrs.get("allowzero", 0):
        dims = [x.shape[i] if s == 0 else s for i, s in enumerate(dims)]
    return x.reshape(dims)

@jop("Flatten")
def _jflatten(attrs, x):
    axis = attrs.get("axis", 1)
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    return x.reshape(lead, -1)

@jop("Transpose")
def _jtranspose(attrs, x):
    return jnp.transpose(x, attrs.get("perm"))

@jop("Concat")
def _jconcat(attrs, *xs):
    return jnp.concatenate(xs, axis=attrs["axis"])

@jop("Split")
def _jsplit(attrs, x, split=None):
    axis = attrs.get("axis", 0)
    if split is None:
        split = attrs.get("split")
    if split is None:
        n = attrs.get("num_outputs")
        size = x.shape[axis]
        per = -(-size // n)
        split = [per] * (n - 1) + [size - per * (n - 1)]
    sizes = _const_ints(split, "Split sizes")
    idx = np.cumsum(sizes)[:-1].tolist()
    return tuple(jnp.split(x, idx, axis=axis))

@jop("Squeeze")
def _jsqueeze(attrs, x, axes=None):
    if axes is None:
        axes = attrs.get("axes")
    if axes is None:
        return jnp.squeeze(x)
    ax = tuple(int(a) % x.ndim for a in _const_ints(axes, "Squeeze axes"))
    return jnp.squeeze(x, axis=ax)

@jop("Unsqueeze")
def _junsqueeze(attrs, x, axes=None):
    if axes is None:
        axes = attrs["axes"]
    axes_list = _const_ints(axes, "Unsqueeze axes")
    nd = x.ndim + len(axes_list)
    for a in sorted(int(a) % nd for a in axes_list):
        x = jnp.expand_dims(x, a)
    return x

@jop("Gather")
def _jgather(attrs, x, indices):
    return jnp.take(x, jnp.asarray(indices, jnp.int32), axis=attrs.get("axis", 0))

@jop("GatherElements")
def _jgather_elements(attrs, x, indices):
    return jnp.take_along_axis(x, jnp.asarray(indices, jnp.int32),
                               axis=attrs.get("axis", 0))

@jop("Slice")
def _jslice(attrs, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:
        starts, ends = attrs["starts"], attrs["ends"]
        axes, steps = attrs.get("axes"), None
    starts = _const_ints(starts, "Slice starts")
    ends = _const_ints(ends, "Slice ends")
    axes = (list(range(len(starts))) if axes is None
            else [a % x.ndim for a in _const_ints(axes, "Slice axes")])
    steps = [1] * len(starts) if steps is None else _const_ints(steps, "Slice steps")
    sl: list[slice] = [slice(None)] * x.ndim
    INT64_MAX = (1 << 63) - 1
    for s, e, a, st in zip(starts, ends, axes, steps):
        e2 = None if e >= INT64_MAX else e
        if st < 0 and e2 is not None and e2 < -x.shape[a]:
            e2 = None
        sl[a] = slice(s, e2, st)
    return x[tuple(sl)]

@jop("Pad")
def _jpad(attrs, x, pads=None, value=None, axes=None):
    mode = _dec(attrs.get("mode", "constant"), "constant")
    p = _const_ints(pads if pads is not None else attrs["pads"], "Pad pads")
    ax = (list(range(x.ndim)) if axes is None
          else [a % x.ndim for a in _const_ints(axes, "Pad axes")])
    nd = len(ax)
    width = [(0, 0)] * x.ndim
    for i, a in enumerate(ax):
        width[a] = (p[i], p[i + nd])
    if mode == "constant":
        cval = 0.0
        if value is not None:
            cval = float(np.asarray(value).ravel()[0])
        elif "value" in attrs:
            cval = attrs["value"]
        return jnp.pad(x, width, constant_values=jnp.asarray(cval, x.dtype))
    return jnp.pad(x, width, mode={"reflect": "reflect", "edge": "edge",
                                   "wrap": "wrap"}[mode])

@jop("Expand")
def _jexpand(attrs, x, shape):
    dims = _const_ints(shape, "Expand shape")
    return jnp.broadcast_to(x, np.broadcast_shapes(x.shape, tuple(dims)))

@jop("Tile")
def _jtile(attrs, x, repeats):
    return jnp.tile(x, _const_ints(repeats, "Tile repeats"))


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def _jreduce(fn, attrs, x, axes_in=None):
    axes = attrs.get("axes")
    if axes_in is not None:
        axes = _const_ints(axes_in, "Reduce axes")
    keep = bool(attrs.get("keepdims", 1))
    if not axes:  # None or empty axes tensor
        if attrs.get("noop_with_empty_axes", 0):
            return x
        axes = None  # opset-18: empty axes + noop=0 => reduce ALL dims
    ax = None if axes is None else tuple(int(a) % x.ndim for a in axes)
    return fn(x, axis=ax, keepdims=keep)

@jop("ReduceMean")
def _jreduce_mean(attrs, x, axes=None):
    return _jreduce(jnp.mean, attrs, x, axes).astype(x.dtype)

@jop("ReduceSum")
def _jreduce_sum(attrs, x, axes=None):
    return _jreduce(jnp.sum, attrs, x, axes).astype(x.dtype)

@jop("ReduceMax")
def _jreduce_max(attrs, x, axes=None):
    return _jreduce(jnp.max, attrs, x, axes)

@jop("ReduceMin")
def _jreduce_min(attrs, x, axes=None):
    return _jreduce(jnp.min, attrs, x, axes)

@jop("ArgMax")
def _jargmax(attrs, x):
    axis = attrs.get("axis", 0)
    keep = bool(attrs.get("keepdims", 1))
    if attrs.get("select_last_index", 0):
        idx = (x.shape[axis] - 1 - jnp.argmax(jnp.flip(x, axis), axis=axis))
    else:
        idx = jnp.argmax(x, axis=axis)
    idx = idx.astype(jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32)
    return jnp.expand_dims(idx, axis) if keep else idx


# ---------------------------------------------------------------------------
# Linear algebra / norm / conv / pool / resize
# ---------------------------------------------------------------------------

@jop("Gemm")
def _jgemm(attrs, a, b, c=None):
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = attrs.get("alpha", 1.0) * jnp.matmul(a, b, preferred_element_type=a.dtype)
    if c is not None:
        y = y + attrs.get("beta", 1.0) * c
    return y.astype(a.dtype)

@jop("BatchNormalization")
def _jbn(attrs, x, scale, bias, mean, var):
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = scale / jnp.sqrt(var + eps)
    return ((x - mean.reshape(shape)) * inv.reshape(shape).astype(x.dtype)
            + bias.reshape(shape)).astype(x.dtype)

@jop("InstanceNormalization")
def _jinorm(attrs, x, scale, bias):
    eps = attrs.get("epsilon", 1e-5)
    ax = tuple(range(2, x.ndim))
    mean = x.mean(axis=ax, keepdims=True)
    var = x.var(axis=ax, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) * lax.rsqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape)).astype(x.dtype)

@jop("LayerNormalization")
def _jlayernorm(attrs, x, scale, bias=None):
    axis = attrs.get("axis", -1) % x.ndim
    eps = attrs.get("epsilon", 1e-5)
    ax = tuple(range(axis, x.ndim))
    mean = x.mean(axis=ax, keepdims=True)
    var = x.var(axis=ax, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _conv_params(attrs, x, w):
    nd = x.ndim - 2
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    kernel = tuple(attrs.get("kernel_shape") or w.shape[2:])
    groups = int(attrs.get("group", 1))
    pads = oracle.resolve_pads(attrs, x.shape[2:], kernel, strides, dilations)
    return strides, dilations, groups, pads

@jop("Conv")
def _jconv(attrs, x, w, b=None):
    strides, dilations, groups, pads = _conv_params(attrs, x, w)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads, rhs_dilation=dilations,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32 if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.int32)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * (x.ndim - 2))
    return out.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else out.dtype)

@jop("ConvTranspose")
def _jconv_transpose(attrs, x, w, b=None):
    nd = x.ndim - 2
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    groups = int(attrs.get("group", 1))
    pads_attr = attrs.get("pads") or [0] * (2 * nd)
    out_pad = attrs.get("output_padding") or [0] * nd
    eff = [(w.shape[2 + i] - 1) * dilations[i] + 1 for i in range(nd)]
    pads = [(eff[i] - 1 - pads_attr[i], eff[i] - 1 - pads_attr[i + nd] + out_pad[i])
            for i in range(nd)]
    # lhs_dilation implements the stride-upsampling; the kernel transposes
    # ONNX's (C, M/g, kH, kW) to OIHW and flips spatially in each branch
    if groups > 1:
        c = x.shape[1]
        cg = c // groups
        parts = []
        for g in range(groups):
            wg = w[g * cg:(g + 1) * cg]  # (cg, mg, kh, kw)
            wg = jnp.transpose(wg, (1, 0, 2, 3))[:, :, ::-1, ::-1]
            dn = lax.conv_dimension_numbers(x[:, :cg].shape, wg.shape,
                                            ("NCHW", "OIHW", "NCHW"))
            parts.append(lax.conv_general_dilated(
                x[:, g * cg:(g + 1) * cg], wg, window_strides=(1,) * nd,
                padding=pads, lhs_dilation=strides, rhs_dilation=dilations,
                dimension_numbers=dn, preferred_element_type=jnp.float32))
        out = jnp.concatenate(parts, axis=1)
    else:
        wf = jnp.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
        dn = lax.conv_dimension_numbers(x.shape, wf.shape, ("NCHW", "OIHW", "NCHW"))
        out = lax.conv_general_dilated(
            x, wf, window_strides=(1,) * nd, padding=pads, lhs_dilation=strides,
            rhs_dilation=dilations, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * nd)
    return out.astype(x.dtype)


def _pool_pads(attrs, x):
    kernel = tuple(attrs["kernel_shape"])
    nd = len(kernel)
    strides = tuple(attrs.get("strides") or [1] * nd)
    dilations = tuple(attrs.get("dilations") or [1] * nd)
    pads = oracle.resolve_pads(attrs, x.shape[2:], kernel, strides, dilations)
    if attrs.get("ceil_mode", 0):
        import math
        new_pads = []
        for i in range(nd):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            padded = x.shape[2 + i] + pads[i][0] + pads[i][1]
            out_dim = math.ceil((padded - eff_k) / strides[i]) + 1
            if (out_dim - 1) * strides[i] >= x.shape[2 + i] + pads[i][0]:
                out_dim -= 1
            need = (out_dim - 1) * strides[i] + eff_k - padded
            new_pads.append((pads[i][0], pads[i][1] + max(need, 0)))
        pads = new_pads
    return kernel, strides, dilations, pads

@jop("MaxPool")
def _jmaxpool(attrs, x):
    kernel, strides, dilations, pads = _pool_pads(attrs, x)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, jnp.asarray(init, x.dtype), lax.max,
        window_dimensions=(1, 1) + kernel, window_strides=(1, 1) + strides,
        window_dilation=(1, 1) + dilations, padding=[(0, 0), (0, 0)] + pads)

@jop("AveragePool")
def _javgpool(attrs, x):
    kernel, strides, dilations, pads = _pool_pads(attrs, x)
    dims = (1, 1) + kernel
    strd = (1, 1) + strides
    dil = (1, 1) + dilations
    pad = [(0, 0), (0, 0)] + pads
    s = lax.reduce_window(x.astype(jnp.float32), jnp.float32(0), lax.add,
                          window_dimensions=dims, window_strides=strd,
                          window_dilation=dil, padding=pad)
    if attrs.get("count_include_pad", 0):
        # count explicit pads in the divisor but NOT the ceil_mode end
        # extension (torch/ort semantics — mirrors oracle._avgpool)
        nd = len(kernel)
        expl = oracle.resolve_pads(attrs, x.shape[2:], kernel,
                                   strides, dilations)
        ones = jnp.ones((1, 1) + tuple(
            x.shape[2 + i] + expl[i][0] + expl[i][1] for i in range(nd)),
            jnp.float32)
        ext = [(0, 0), (0, 0)] + [
            ((pads[i][0] - expl[i][0]), (pads[i][1] - expl[i][1]))
            for i in range(nd)]
        cnt = lax.reduce_window(ones, jnp.float32(0), lax.add,
                                window_dimensions=dims, window_strides=strd,
                                window_dilation=dil, padding=ext)
        return (s / jnp.maximum(cnt, 1.0)).astype(x.dtype)
    ones = jnp.ones((1, 1) + x.shape[2:], jnp.float32)
    cnt = lax.reduce_window(ones, jnp.float32(0), lax.add,
                            window_dimensions=dims, window_strides=strd,
                            window_dilation=dil, padding=pad)
    return (s / jnp.maximum(cnt, 1.0)).astype(x.dtype)

@jop("GlobalAveragePool")
def _jgap(attrs, x):
    return x.mean(axis=tuple(range(2, x.ndim)), keepdims=True).astype(x.dtype)

@jop("GlobalMaxPool")
def _jgmp(attrs, x):
    return x.max(axis=tuple(range(2, x.ndim)), keepdims=True)


@jop("Resize")
def _jresize(attrs, x, roi=None, scales=None, sizes=None):
    mode = _dec(attrs.get("mode", "nearest"), "nearest")
    ct = _dec(attrs.get("coordinate_transformation_mode", "half_pixel"), "half_pixel")
    nearest_mode = _dec(attrs.get("nearest_mode", "round_prefer_floor"),
                        "round_prefer_floor")
    in_shape = np.asarray(x.shape, np.float64)
    if sizes is not None and np.asarray(sizes).size:
        out_shape = np.asarray(_const_ints(sizes, "Resize sizes"), np.int64)
        scale_arr = out_shape / in_shape
    else:
        if isinstance(scales, jnp.ndarray):
            raise ModelLoadError("Resize scales must be a compile-time constant")
        scale_arr = np.asarray(scales, np.float64).ravel()
        out_shape = np.floor(in_shape * scale_arr).astype(np.int64)
    out = x
    for axis in range(x.ndim):
        if out_shape[axis] == out.shape[axis] and scale_arr[axis] == 1.0:
            continue
        coords = oracle._resize_coords(int(out_shape[axis]), out.shape[axis],
                                       scale_arr[axis], ct)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(coords)
            elif nearest_mode == "ceil":
                idx = np.ceil(coords)
            elif nearest_mode == "round_prefer_ceil":
                idx = np.floor(coords + 0.5)
            else:
                idx = np.ceil(coords - 0.5)
            idx = np.clip(idx, 0, out.shape[axis] - 1).astype(np.int32)
            out = jnp.take(out, jnp.asarray(idx), axis=axis)
        elif mode == "linear":
            lo = np.clip(np.floor(coords), 0, out.shape[axis] - 1).astype(np.int32)
            hi = np.clip(lo + 1, 0, out.shape[axis] - 1)
            t = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
            a = jnp.take(out, jnp.asarray(lo), axis=axis).astype(jnp.float32)
            b = jnp.take(out, jnp.asarray(hi), axis=axis).astype(jnp.float32)
            shape = [1] * out.ndim
            shape[axis] = -1
            tb = jnp.asarray(t.reshape(shape))
            out = a * (1 - tb) + b * tb
        else:
            raise ModelLoadError(f"unsupported resize mode {mode!r}")
    return out.astype(x.dtype)

@jop("Upsample")
def _jupsample(attrs, x, scales=None):
    if scales is None:
        scales = attrs["scales"]
    return _jresize({"mode": attrs.get("mode", "nearest"),
                     "coordinate_transformation_mode": "asymmetric",
                     "nearest_mode": "floor"}, x, None, np.asarray(scales), None)


# ---------------------------------------------------------------------------
# Quantized ops — exact integer semantics (int32 accumulation; requant via
# fixed-point multiplier + rounding shift so TPU == NumPy oracle bit-for-bit,
# see onnx/requant.py; INFUR_FIXEDPOINT_REQUANT=0 restores the f32 multiplier)
# ---------------------------------------------------------------------------

def _jqminmax(dtype) -> tuple[int, int]:
    info = jnp.iinfo(dtype)
    return info.min, info.max


def _host_const(*vs) -> bool:
    """True iff every value is a trace-time host constant."""
    return all(v is None or isinstance(v, (np.ndarray, np.generic, int, float))
               for v in vs)


def _jrequant_int(acc, multiplier, y_zp, channel_shape=None):
    """Fixed-point requant of an int32 accumulator on the JAX side; None →
    caller falls back to the f32 multiplier path.  multiplier/y_zp must be
    host constants (they are graph initializers in every real model)."""
    from .oracle import _fixedpoint_requant_enabled
    from .requant import decompose_multiplier, requant_jnp
    if not (_fixedpoint_requant_enabled() and _host_const(multiplier, y_zp)):
        return None
    try:
        q, shift = decompose_multiplier(multiplier)
    except ValueError:
        return None
    if channel_shape is not None and q.size > 1:
        q = q.reshape(channel_shape)
        shift = shift.reshape(channel_shape)
    return requant_jnp(acc, q, shift, np.asarray(y_zp, np.int32),
                       np.asarray(y_zp).dtype)


@jop("QuantizeLinear")
def _jquantize_linear(attrs, x, scale, zp=None):
    axis = attrs.get("axis", 1)
    if zp is None:
        zp = np.zeros((), np.uint8)
    zp_dtype = np.asarray(zp).dtype
    if _host_const(scale):
        # one IEEE multiply by the host-precomputed reciprocal — f32
        # division is not correctly rounded on TPU (reciprocal+refinement
        # lowering) and diverges from the NumPy oracle at ties
        s = jnp.asarray(np.float32(1.0) / np.asarray(scale, np.float32))
        div = False
    else:
        s = jnp.asarray(scale, jnp.float32)
        div = True
    z = jnp.asarray(zp, jnp.int32)
    if s.ndim == 1 and s.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
        z = z.reshape(shape)
    # jnp.round = half-to-even, matches np.rint
    q = jnp.round(x / s if div else x * s) + z
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)

@jop("DequantizeLinear")
def _jdequantize_linear(attrs, x, scale, zp=None):
    axis = attrs.get("axis", 1)
    s = jnp.asarray(scale, jnp.float32)
    z = jnp.zeros_like(s, jnp.int32) if zp is None else jnp.asarray(zp, jnp.int32)
    if s.ndim == 1 and s.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
        z = z.reshape(shape)
    return ((x.astype(jnp.int32) - z).astype(jnp.float32) * s)

def _const_all_zero(v) -> bool:
    """True iff v is a compile-time constant that is identically zero."""
    return (isinstance(v, (np.ndarray, np.generic, int))
            and bool(np.all(np.asarray(v) == 0)))


def _int8_mxu_enabled() -> bool:
    """INFUR_INT8_MXU=0 disables the int8-operand QLinear lowering
    (A/B escape hatch; the int32 fallback is always available)."""
    import os
    return os.environ.get("INFUR_INT8_MXU", "1") != "0"


@jop("QLinearConv")
def _jqlinear_conv(attrs, x, x_scale, x_zp, w, w_scale, w_zp, y_scale, y_zp, b=None):
    strides, dilations, groups, pads = _conv_params(attrs, x, w)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    if (w.dtype == jnp.int8 and _const_all_zero(w_zp)
            and x.dtype in (jnp.uint8, jnp.int8)
            and np.size(x_zp) <= 1 and _int8_mxu_enabled()):
        # MXU-native path: keep both operands 8-bit so XLA emits an int8
        # systolic-array conv (casting to int32 first forces a slow wide
        # conv).  A u8 activation is rebased to s8 by subtracting 128; the
        # zero-point (and the rebase) is restored exactly with one integer
        # correction conv of an all-ones single-channel-per-group map
        # against the kernel's input-channel sums — spatially varying only
        # where padding windows clip, which the ones-map conv reproduces.
        shift = 128 if x.dtype == jnp.uint8 else 0
        x8 = (x.astype(jnp.int32) - shift).astype(jnp.int8) if shift else x
        acc = lax.conv_general_dilated(
            x8, w, window_strides=strides, padding=pads,
            rhs_dilation=dilations, dimension_numbers=dn,
            feature_group_count=groups, preferred_element_type=jnp.int32)
        delta = shift - jnp.asarray(x_zp, jnp.int32).reshape(())
        skip_corr = (isinstance(x_zp, (np.ndarray, np.generic, int))
                     and int(np.asarray(x_zp).reshape(())) == shift)
        if not skip_corr:
            ones = jnp.ones((1, groups) + x.shape[2:], jnp.int32)
            wsum = w.astype(jnp.int32).sum(axis=1, keepdims=True)
            k = lax.conv_general_dilated(
                ones, wsum, window_strides=strides, padding=pads,
                rhs_dilation=dilations,
                dimension_numbers=lax.conv_dimension_numbers(
                    ones.shape, wsum.shape, ("NCHW", "OIHW", "NCHW")),
                feature_group_count=groups,
                preferred_element_type=jnp.int32)
            acc = acc + delta * k
    else:
        xi = x.astype(jnp.int32) - jnp.asarray(x_zp, jnp.int32)
        wz = jnp.asarray(w_zp, jnp.int32)
        if wz.ndim == 1 and wz.size > 1:
            wz = wz.reshape(-1, 1, 1, 1)
        wi = w.astype(jnp.int32) - wz
        acc = lax.conv_general_dilated(
            xi, wi, window_strides=strides, padding=pads,
            rhs_dilation=dilations, dimension_numbers=dn,
            feature_group_count=groups, preferred_element_type=jnp.int32)
    if b is not None:
        acc = acc + jnp.asarray(b, jnp.int32).reshape(1, -1, 1, 1)
    if _host_const(x_scale, w_scale, y_scale):
        m = (np.asarray(x_scale, np.float32) * np.asarray(w_scale, np.float32)
             / np.asarray(y_scale, np.float32))
        out = _jrequant_int(acc, m, y_zp, channel_shape=(1, -1, 1, 1))
        if out is not None:
            return out
    sx = jnp.asarray(x_scale, jnp.float32)
    sw = jnp.asarray(w_scale, jnp.float32)
    sy = jnp.asarray(y_scale, jnp.float32)
    scale = (sx * sw / sy)
    if scale.ndim == 1 and scale.size > 1:
        scale = scale.reshape(1, -1, 1, 1)
    zp_dtype = np.asarray(y_zp).dtype
    q = jnp.round(acc.astype(jnp.float32) * scale) + jnp.asarray(y_zp, jnp.int32)
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)

@jop("QLinearMatMul")
def _jqlinear_matmul(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp,
                     bias=None):
    # 9th input (infur extension): int32 bias at scale a_scale*b_scale
    # added to the exact accumulator (oracle twin: _qlinear_matmul)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if (b.dtype == jnp.int8 and _const_all_zero(b_zp)
            and a.dtype in (jnp.uint8, jnp.int8)
            and np.size(a_zp) <= 1 and _int8_mxu_enabled()):
        # int8 MXU path (see QLinearConv): rebase u8 -> s8, correct the
        # zero-point with the contraction-axis column sums of b.
        shift = 128 if a.dtype == jnp.uint8 else 0
        a8 = (a.astype(jnp.int32) - shift).astype(jnp.int8) if shift else a
        acc = jnp.matmul(a8, b, preferred_element_type=jnp.int32)
        delta = shift - jnp.asarray(a_zp, jnp.int32).reshape(())
        skip_corr = (isinstance(a_zp, (np.ndarray, np.generic, int))
                     and int(np.asarray(a_zp).reshape(())) == shift)
        if not skip_corr:
            colsum = b.astype(jnp.int32).sum(axis=-2, keepdims=True)
            acc = acc + delta * colsum
    else:
        ai = a.astype(jnp.int32) - jnp.asarray(a_zp, jnp.int32)
        bi = b.astype(jnp.int32) - jnp.asarray(b_zp, jnp.int32)
        acc = jnp.matmul(ai, bi, preferred_element_type=jnp.int32)
    if bias is not None:
        acc = acc + jnp.asarray(np.asarray(bias, np.int32))
    if _host_const(a_scale, b_scale, y_scale):
        m = (np.asarray(a_scale, np.float32) * np.asarray(b_scale, np.float32)
             / np.asarray(y_scale, np.float32))
        out = _jrequant_int(acc, m, y_zp)
        if out is not None:
            return out
    scale = (jnp.asarray(a_scale, jnp.float32) * jnp.asarray(b_scale, jnp.float32)
             / jnp.asarray(y_scale, jnp.float32))
    zp_dtype = np.asarray(y_zp).dtype
    q = jnp.round(acc.astype(jnp.float32) * scale) + jnp.asarray(y_zp, jnp.int32)
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)

@jop("QLinearAdd")
def _jqlinear_add(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    from .oracle import _QADD_SHIFT, _fixedpoint_requant_enabled
    if (_fixedpoint_requant_enabled()
            and _host_const(a_scale, a_zp, b_scale, b_zp, y_scale, y_zp)
            and all(np.size(v) <= 1 for v in
                    (a_scale, a_zp, b_scale, b_zp, y_scale, y_zp))):
        # integer-only twin of oracle._qlinear_add_int — float QLinearAdd
        # is not platform-exact (XLA recomputes fused f32 subgraphs per
        # consumer with FMA/reassociation)
        from .requant import (
            ADD_GRID_BITS, add_rescale_jnp, decompose_add_rescale,
            decompose_multiplier, fixed_round_jnp,
        )
        ma = np.float32(a_scale) / np.float32(y_scale)
        mb = np.float32(b_scale) / np.float32(y_scale)
        da, db = decompose_add_rescale(ma), decompose_add_rescale(mb)
        if da is not None and db is not None:
            # single-multiply 2**14-grid rescale; same branch condition as
            # the oracle and the NHWC executor -> identical integers
            G = ADD_GRID_BITS
            ai = a.astype(jnp.int32) - jnp.asarray(a_zp, jnp.int32)
            bi = b.astype(jnp.int32) - jnp.asarray(b_zp, jnp.int32)
            ta = jnp.clip(add_rescale_jnp(ai, *da), -(1 << 29), 1 << 29)
            tb = jnp.clip(add_rescale_jnp(bi, *db), -(1 << 29), 1 << 29)
            y = ((ta + tb + jnp.int32(1 << (G - 1))) >> G) \
                + jnp.asarray(y_zp, jnp.int32)
            zp_dtype = np.asarray(y_zp).dtype
            lo, hi = _jqminmax(zp_dtype)
            return jnp.clip(y, lo, hi).astype(zp_dtype)
        try:
            qa, sha = decompose_multiplier(ma)
            qb, shb = decompose_multiplier(mb)
        except ValueError:
            qa = None
        if qa is not None:
            L = _QADD_SHIFT
            ai = (a.astype(jnp.int32) - jnp.asarray(a_zp, jnp.int32)) << L
            bi = (b.astype(jnp.int32) - jnp.asarray(b_zp, jnp.int32)) << L
            ta = jnp.clip(fixed_round_jnp(ai, qa, sha), -(1 << 29), 1 << 29)
            tb = jnp.clip(fixed_round_jnp(bi, qb, shb), -(1 << 29), 1 << 29)
            y = (fixed_round_jnp(ta + tb, np.int64(1 << 30), np.int64(30 + L))
                 + jnp.asarray(y_zp, jnp.int32))
            zp_dtype = np.asarray(y_zp).dtype
            lo, hi = _jqminmax(zp_dtype)
            return jnp.clip(y, lo, hi).astype(zp_dtype)
    af = (a.astype(jnp.float32) - jnp.asarray(a_zp, jnp.float32)) * jnp.asarray(a_scale, jnp.float32)
    bf = (b.astype(jnp.float32) - jnp.asarray(b_zp, jnp.float32)) * jnp.asarray(b_scale, jnp.float32)
    zp_dtype = np.asarray(y_zp).dtype
    if _host_const(y_scale):
        # reciprocal multiply, not division — see _jquantize_linear
        s = jnp.asarray(np.float32(1.0) / np.asarray(y_scale, np.float32))
        q = jnp.round((af + bf) * s) + jnp.asarray(y_zp, jnp.int32)
    else:
        q = jnp.round((af + bf) / jnp.asarray(y_scale, jnp.float32)) + jnp.asarray(y_zp, jnp.int32)
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)

@jop("QLinearGlobalAveragePool")
def _jqlinear_gap(attrs, x, x_scale, x_zp, y_scale, y_zp):
    zp_dtype = np.asarray(y_zp).dtype
    if _host_const(x_scale, y_scale):
        # integer spatial sum (order-independent, platform-exact) + one
        # fixed-point requant with multiplier x_scale / (y_scale * N) —
        # mirrors oracle._qlinear_gap
        axes = tuple(range(2, x.ndim))
        n = int(np.prod([x.shape[i] for i in axes]))
        acc = (x.astype(jnp.int32) - jnp.asarray(x_zp, jnp.int32)).sum(
            axis=axes, keepdims=True)
        m = np.float32(x_scale) / (np.float32(y_scale) * np.float32(n))
        out = _jrequant_int(acc, m, y_zp)
        if out is not None:
            return out
    xf = (x.astype(jnp.float32) - jnp.asarray(x_zp, jnp.float32)) * jnp.asarray(x_scale, jnp.float32)
    m = xf.mean(axis=tuple(range(2, x.ndim)), keepdims=True)
    q = jnp.round(m / jnp.asarray(y_scale, jnp.float32)) + jnp.asarray(y_zp, jnp.int32)
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)


@jop("QLinearMul")
def _jqlinear_mul(attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    zp_dtype = np.asarray(y_zp).dtype
    if _host_const(a_scale, a_zp, b_scale, b_zp, y_scale, y_zp) and \
            all(np.size(v) <= 1 for v in (a_scale, b_scale, y_scale)):
        # integer twin of oracle._qlinear_mul: i32 product (bounded by
        # 255^2) + one fixed-point requant with multiplier s_a*s_b/s_y
        acc = ((a.astype(jnp.int32) - jnp.asarray(a_zp, jnp.int32))
               * (b.astype(jnp.int32) - jnp.asarray(b_zp, jnp.int32)))
        m = (np.float32(a_scale) * np.float32(b_scale)
             / np.float32(y_scale))
        out = _jrequant_int(acc, m, y_zp)
        if out is not None:
            return out
    af = (a.astype(jnp.float32) - jnp.asarray(a_zp, jnp.float32)) \
        * jnp.asarray(a_scale, jnp.float32)
    bf = (b.astype(jnp.float32) - jnp.asarray(b_zp, jnp.float32)) \
        * jnp.asarray(b_scale, jnp.float32)
    if _host_const(y_scale):
        s = jnp.asarray(np.float32(1.0) / np.asarray(y_scale, np.float32))
        q = jnp.round(af * bf * s) + jnp.asarray(y_zp, jnp.int32)
    else:
        q = jnp.round(af * bf / jnp.asarray(y_scale, jnp.float32)) \
            + jnp.asarray(y_zp, jnp.int32)
    lo, hi = _jqminmax(zp_dtype)
    return jnp.clip(q, lo, hi).astype(zp_dtype)


@jop("QLookupTable")
def _jqlookup_table(attrs, x, table):
    # 256-entry u8 gather baked by the quantizer (see oracle twin) — the
    # whole activation is one take(); bit-exact across backends
    if not _host_const(table):
        raise ModelLoadError("QLookupTable table must be a graph initializer")
    return jnp.take(jnp.asarray(np.asarray(table, np.uint8)),
                    x.astype(jnp.int32))


@jop("QLayerNorm")
def _jqlayernorm(attrs, x, gmul, boff):
    # integer LayerNorm twin (onnx/qint.py) — bit-exact vs the oracle
    if not _host_const(gmul, boff):
        raise ModelLoadError("QLayerNorm gmul/boff must be initializers")
    from infur_tpu.onnx.qint import qlayernorm_jnp
    return qlayernorm_jnp(x, np.asarray(gmul), np.asarray(boff),
                          s=int(attrs["s"]), sqd_fp=int(attrs["sqd_fp"]),
                          t=int(attrs["t"]))


@jop("QSoftmax")
def _jqsoftmax(attrs, x, table):
    # integer softmax twin (onnx/qint.py) — bit-exact vs the oracle
    if not _host_const(table):
        raise ModelLoadError("QSoftmax table must be an initializer")
    from infur_tpu.onnx.qint import qsoftmax_jnp
    return qsoftmax_jnp(x, np.asarray(table))


@jop("QLinearResize")
def _jqlinear_resize(attrs, x, roi=None, scales=None, sizes=None):
    mode = _dec(attrs.get("mode", "linear"), "linear")
    ct = _dec(attrs.get("coordinate_transformation_mode", "half_pixel"),
              "half_pixel")
    if mode != "linear":
        raise ModelLoadError(
            f"QLinearResize supports linear mode, got {mode!r}")
    from infur_tpu.onnx.qresize import W_BITS, W_HALF, W_ONE, linear_axis_plan
    in_shape = np.asarray(x.shape, np.float64)
    if sizes is not None and np.asarray(sizes).size:
        out_shape = np.asarray(_const_ints(sizes, "QLinearResize sizes"),
                               np.int64)
        scale_arr = out_shape / in_shape
    else:
        if isinstance(scales, jnp.ndarray):
            raise ModelLoadError(
                "QLinearResize scales must be a compile-time constant")
        scale_arr = np.asarray(scales, np.float64).ravel()
        out_shape = np.floor(in_shape * scale_arr).astype(np.int64)
    out = x
    for axis in range(x.ndim):
        if out_shape[axis] == out.shape[axis] and scale_arr[axis] == 1.0:
            continue
        lo, hi, w_hi = linear_axis_plan(int(out_shape[axis]),
                                        out.shape[axis], scale_arr[axis], ct)
        a = jnp.take(out, jnp.asarray(lo.astype(np.int32)), axis=axis) \
            .astype(jnp.int32)
        b = jnp.take(out, jnp.asarray(hi.astype(np.int32)), axis=axis) \
            .astype(jnp.int32)
        shape = [1] * x.ndim
        shape[axis] = -1
        w = jnp.asarray(w_hi.astype(np.int32).reshape(shape))
        acc = a * (W_ONE - w) + b * w
        out = ((acc + W_HALF) >> W_BITS).astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# Graph import
# ---------------------------------------------------------------------------

# Quantization metadata (scales / zero-points / int32 biases) must stay
# host constants no matter their size: the QLinear lowerings branch on them
# at trace time (int8-MXU eligibility, fixed-point requant decomposition —
# onnx/requant.py), and a per-channel w_scale of 2048 floats silently
# falling into the traced-params bucket would knock the whole graph back to
# the f32 requant path.  Maps op_type -> input positions that must fold.
_QCONST_ARGS = {
    "QuantizeLinear": (1, 2),
    "DequantizeLinear": (1, 2),
    "QLinearConv": (1, 2, 4, 5, 6, 7, 8),
    "QLinearMatMul": (1, 2, 4, 5, 6, 7, 8),
    "QLinearAdd": (1, 2, 4, 5, 6, 7),
    "QLinearMul": (1, 2, 4, 5, 6, 7),
    "QLinearGlobalAveragePool": (1, 2, 3, 4),
    "QLookupTable": (1,),
    "QLayerNorm": (1, 2),
    "QSoftmax": (1,),
}


# Ops that are pure shape machinery: always fold when inputs are const.
_SHAPE_FAMILY = {
    "Shape", "Size", "Constant", "ConstantOfShape", "Range", "Cast",
    "Gather", "Concat", "Unsqueeze", "Squeeze", "Slice", "Add", "Sub",
    "Mul", "Div", "Reshape", "Transpose", "Identity", "Floor", "Ceil",
    "Expand", "Tile", "Where", "Equal", "Greater", "Less", "ReduceProd",
}


@dataclass
class ImportedModel:
    """An ONNX model lowered to JAX.

    ``fn(params, feeds) -> dict`` is a pure function of the parameter pytree
    and the feed dict; ``jitted`` is its jit-compiled form.  ``params`` holds
    the non-folded initializers (shardable/donatable).
    """

    fn: Callable[[dict, dict], dict]
    params: dict[str, np.ndarray]
    input_info: list[ValueInfoProto]
    output_names: list[str]
    graph: GraphProto
    #: ModelProto metadata_props (e.g. ONNX image-category keys)
    metadata: dict[str, str] = field(default_factory=dict)
    jitted: Callable = field(init=False)

    def __post_init__(self):
        self.jitted = jax.jit(self.fn)

    @property
    def input_names(self) -> list[str]:
        return [vi.name for vi in self.input_info]

    def __call__(self, feeds: dict[str, Any]) -> dict[str, jax.Array]:
        return self.jitted(self.params, feeds)


def graph_opset(model: ModelProto) -> int:
    """The default-domain opset version (13 if unspecified)."""
    for osi in model.opset_import or []:
        if (osi.domain or "") in ("", "ai.onnx") and osi.version:
            return int(osi.version)
    return 13


def import_graph(graph: GraphProto, *, opset: int = 13,
                 matmul_precision: str = "highest",
                 metadata: dict[str, str] | None = None) -> ImportedModel:
    """Lower an ONNX graph to a jitted JAX callable.

    ``matmul_precision`` feeds ``jax.default_matmul_precision`` around the
    trace: TPU convs/matmuls otherwise run bf16 inputs by default, which
    breaks f32 parity with the NumPy/onnxruntime oracle (~1e-3 drift seen on
    hardware).  Use ``"highest"`` (default) for oracle parity; pass
    ``"default"``/``"bfloat16"`` to trade exactness for MXU throughput.
    """
    inits = {t.name: tensor_to_numpy(t) for t in graph.initializer}
    # Model inputs exclude initializer names (older exporters list them both).
    input_info = [vi for vi in graph.input if vi.name not in inits]

    # Split initializers: small ones fold, large ones are runtime params.
    # Quantization metadata folds regardless of size (see _QCONST_ARGS).
    qconst_names: set[str] = set()
    for node in graph.node:
        for pos in _QCONST_ARGS.get(node.op_type, ()):
            if pos < len(node.input) and node.input[pos]:
                qconst_names.add(node.input[pos])
    const_env: dict[str, np.ndarray] = {}
    params: dict[str, np.ndarray] = {}
    for name, arr in inits.items():
        dest = const_env if (arr.size <= FOLD_PARAM_MAX_ELEMS
                             or name in qconst_names) else params
        dest[name] = arr

    # Import-time pass: decide per node folded/traced; fold via the oracle.
    traced_nodes = []
    missing_ops: set[str] = set()
    runtime_names: set[str] = set(params) | {vi.name for vi in input_info}
    for node in graph.node:
        inputs_const = all((not n) or (n in const_env) for n in node.input)
        can_fold = (inputs_const and node.op_type in oracle.OPS
                    and not any(n in runtime_names for n in node.input))
        if can_fold:
            try:
                args = [const_env[n] if n else None for n in node.input]
                result = oracle.OPS[node.op_type](node.attrs(), *args)
                outs = result if isinstance(result, tuple) else (result,)
                if all(np.asarray(o).size <= FOLD_OUTPUT_MAX_ELEMS for o in outs
                       if o is not None) or node.op_type in _SHAPE_FAMILY:
                    for n, v in zip(node.output, outs):
                        if n:
                            const_env[n] = np.asarray(v)
                    continue
            except Exception:
                pass  # fall through to tracing
        if node.op_type not in JAX_OPS:
            missing_ops.add(node.op_type)
        traced_nodes.append(node)
        for n in node.output:
            runtime_names.add(n)
    if missing_ops:
        raise ModelLoadError(
            f"unsupported ONNX ops: {sorted(missing_ops)}")

    output_names = [o.name for o in graph.output]

    def fn(p: dict, feeds: dict) -> dict:
        env: dict[str, Any] = dict(const_env)
        env.update({k: jnp.asarray(v) for k, v in p.items()})
        for vi in input_info:
            if vi.name not in feeds:
                raise KeyError(f"missing model input {vi.name!r}")
        env.update({k: jnp.asarray(v) for k, v in feeds.items()})
        with jax.default_matmul_precision(matmul_precision):
            for node in traced_nodes:
                args = [env[n] if n else None for n in node.input]
                attrs = node.attrs()
                attrs["__opset__"] = opset
                # keep SHAPE machinery in the numpy domain at trace time
                # (e.g. Shape-of-traced-input feeding Concat/Gather/Resize);
                # arbitrary compute ops stay on the JAX path so the
                # import-time fold limits and op semantics hold
                result = None
                if (node.op_type in _SHAPE_FAMILY
                        and node.op_type in oracle.OPS
                        and all(a is None or
                                isinstance(a, (np.ndarray, np.generic))
                                for a in args)):
                    try:
                        result = oracle.OPS[node.op_type](attrs, *args)
                    except Exception:
                        result = None  # fall through to the JAX op
                if result is None:
                    result = JAX_OPS[node.op_type](attrs, *args)
                outs = result if isinstance(result, tuple) else (result,)
                for n, v in zip(node.output, outs):
                    if n:
                        env[n] = v
        return {n: env[n] for n in output_names}

    return ImportedModel(fn=fn, params=params, input_info=input_info,
                         output_names=output_names, graph=graph,
                         metadata=dict(metadata or {}))


def import_model(model_or_path: ModelProto | str | bytes, *,
                 matmul_precision: str = "highest") -> ImportedModel:
    model = (model_or_path if isinstance(model_or_path, ModelProto)
             else load_model(model_or_path))
    if model.graph is None:
        raise ModelLoadError("model has no graph")
    return import_graph(model.graph, opset=graph_opset(model),
                        matmul_precision=matmul_precision,
                        metadata=model.metadata())
