"""LRASPP-MobileNetV3-Large semantic segmentation, TPU-native.

Fourth native model family: torchvision's realtime segmentation head
(``lraspp_mobilenet_v3_large`` — the Lite R-ASPP of "Searching for
MobileNetV3").  Where FCN/DeepLabV3 trade throughput for accuracy, this is
the family for latency floors: a dilated MobileNetV3-Large backbone
(output-stride 16) and a two-branch head.  Same role as the reference's
interactive scale knob (reference README.md:58-60) but architectural — the
user picks a cheaper model instead of a smaller input.

Architecture (matching torchvision exactly so real zoo ``.pth`` weights
drop in through :mod:`infur_tpu.models.torch_weights`):

* stem 3x3/s2 + 15 inverted-residual blocks (expand 1x1 -> depthwise ->
  optional squeeze-excite -> project 1x1) + 1x1 to 960ch; the last three
  blocks dilate by 2 instead of striding ("dilated" backbone);
* LR-ASPP head: 1x1+BN+ReLU on the high-level features, gated by a
  global-pool -> 1x1 -> sigmoid attention branch; upsampled and summed
  with a skip classifier on the stride-8 "low" features (40ch);
* activations: hardswish/hardsigmoid implemented multiply-only (relu6
  scaled by a 1/6 constant — no f32 division on-device).

TPU notes: depthwise convs lower to ``feature_group_count=C`` with HWIO
(k, k, 1, C) kernels — XLA maps them to the VPU; the 1x1 expands/projects
are the MXU work.  Channels-last, bf16-compute option, same family
contract as every other model: ``{"out": (N, K, H, W) f32}``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infur_tpu.models.fcn_resnet50 import (
    NUM_CLASSES, _bn, _bn_init, _conv_init, _upsample_bilinear,
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel-rounding rule (MobileNet convention)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# MobileNetV3-Large inverted-residual config, dilated variant
# (cin, kernel, expanded, cout, squeeze-excite, activation, stride, dilation);
# a dilated block's nominal stride collapses to 1 (torchvision semantics).
_CONF = (
    (16, 3, 16, 16, False, "RE", 1, 1),
    (16, 3, 64, 24, False, "RE", 2, 1),
    (24, 3, 72, 24, False, "RE", 1, 1),
    (24, 5, 72, 40, True, "RE", 2, 1),     # -> "low" features (stride 8)
    (40, 5, 120, 40, True, "RE", 1, 1),
    (40, 5, 120, 40, True, "RE", 1, 1),
    (40, 3, 240, 80, False, "HS", 2, 1),
    (80, 3, 200, 80, False, "HS", 1, 1),
    (80, 3, 184, 80, False, "HS", 1, 1),
    (80, 3, 184, 80, False, "HS", 1, 1),
    (80, 3, 480, 112, True, "HS", 1, 1),
    (112, 3, 672, 112, True, "HS", 1, 1),
    (112, 5, 672, 160, True, "HS", 2, 2),  # dilated: effective stride 1
    (160, 5, 960, 160, True, "HS", 1, 2),
    (160, 5, 960, 160, True, "HS", 1, 2),
)
_LOW_BLOCK = 3        # blocks[3] output = torchvision features[4] ("low")
_HIGH_CH = 960
_LOW_CH = 40
_INTER_CH = 128       # LR-ASPP inter_channels


def init_lraspp_mobilenet_v3_large(key: jax.Array,
                                   num_classes: int = NUM_CLASSES
                                   ) -> dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    params: dict[str, Any] = {
        "stem_conv": _conv_init(next(keys), 3, 3, 3, 16),
        "stem_bn": _bn_init(16),
    }
    blocks = []
    for cin, k, exp, cout, se, _act, _s, _d in _CONF:
        blk: dict[str, Any] = {}
        if exp != cin:
            blk["exp_conv"] = _conv_init(next(keys), 1, 1, cin, exp)
            blk["exp_bn"] = _bn_init(exp)
        blk["dw_conv"] = _conv_init(next(keys), k, k, 1, exp)
        blk["dw_bn"] = _bn_init(exp)
        if se:
            sq = _make_divisible(exp // 4)
            blk["se"] = {
                "fc1": _conv_init(next(keys), 1, 1, exp, sq),
                "fc1_b": jnp.zeros((sq,), jnp.float32),
                "fc2": _conv_init(next(keys), 1, 1, sq, exp),
                "fc2_b": jnp.zeros((exp,), jnp.float32),
            }
        blk["proj_conv"] = _conv_init(next(keys), 1, 1, exp, cout)
        blk["proj_bn"] = _bn_init(cout)
        blocks.append(blk)
    params["blocks"] = blocks
    params["last_conv"] = _conv_init(next(keys), 1, 1, 160, _HIGH_CH)
    params["last_bn"] = _bn_init(_HIGH_CH)
    params["head"] = {
        "cbr_conv": _conv_init(next(keys), 1, 1, _HIGH_CH, _INTER_CH),
        "cbr_bn": _bn_init(_INTER_CH),
        "scale_conv": _conv_init(next(keys), 1, 1, _HIGH_CH, _INTER_CH),
        "low_cls": _conv_init(next(keys), 1, 1, _LOW_CH, num_classes),
        "low_cls_b": jnp.zeros((num_classes,), jnp.float32),
        "high_cls": _conv_init(next(keys), 1, 1, _INTER_CH, num_classes),
        "high_cls_b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params


_SIXTH = 1.0 / 6.0  # multiply-only hard activations (no device division)


def _hardsigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.relu6(x + 3.0) * jnp.asarray(_SIXTH, x.dtype)


def _hardswish(x: jax.Array) -> jax.Array:
    return x * _hardsigmoid(x)


def _act(x: jax.Array, kind: str) -> jax.Array:
    return jax.nn.relu(x) if kind == "RE" else _hardswish(x)


def _conv(x: jax.Array, w: jax.Array, stride: int = 1, dilation: int = 1,
          groups: int = 1) -> jax.Array:
    kh, kw = w.shape[0], w.shape[1]
    ph = dilation * (kh - 1) // 2
    pw = dilation * (kw - 1) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((ph, ph), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _se(x: jax.Array, p: dict[str, Any]) -> jax.Array:
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_conv(s, p["fc1"]) + p["fc1_b"].astype(s.dtype))
    s = _hardsigmoid(_conv(s, p["fc2"]) + p["fc2_b"].astype(s.dtype))
    return x * s


def _inverted_residual(x: jax.Array, blk: dict[str, Any], k: int,
                       stride: int, dilation: int, act: str) -> jax.Array:
    y = x
    if "exp_conv" in blk:
        y = _act(_bn(_conv(y, blk["exp_conv"]), blk["exp_bn"]), act)
    s = 1 if dilation > 1 else stride
    y = _act(_bn(_conv(y, blk["dw_conv"], stride=s, dilation=dilation,
                       groups=y.shape[-1]), blk["dw_bn"]), act)
    if "se" in blk:
        y = _se(y, blk["se"])
    y = _bn(_conv(y, blk["proj_conv"]), blk["proj_bn"])
    # torchvision gates the residual on the NOMINAL stride, not the
    # dilation-collapsed one
    if stride == 1 and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y


def _backbone(params: dict[str, Any], x: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
    x = _hardswish(_bn(_conv(x, params["stem_conv"], stride=2),
                       params["stem_bn"]))
    low = None
    for i, ((_cin, k, _exp, _cout, _se_flag, act, stride, dil), blk) in \
            enumerate(zip(_CONF, params["blocks"])):
        x = _inverted_residual(x, blk, k, stride, dil, act)
        if i == _LOW_BLOCK:
            low = x
    high = _hardswish(_bn(_conv(x, params["last_conv"]), params["last_bn"]))
    return low, high


def _lraspp_head(low: jax.Array, high: jax.Array, p: dict[str, Any]
                 ) -> jax.Array:
    x = jax.nn.relu(_bn(_conv(high, p["cbr_conv"]), p["cbr_bn"]))
    s = high.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.sigmoid(_conv(s, p["scale_conv"]))
    x = x * s
    x = _upsample_bilinear(x, (low.shape[1], low.shape[2])).astype(low.dtype)
    lo = _conv(low, p["low_cls"]) + p["low_cls_b"].astype(low.dtype)
    hi = _conv(x, p["high_cls"]) + p["high_cls_b"].astype(x.dtype)
    return lo + hi


# ---------------------------------------------------------------------------
# ONNX export (zoo-format fixture; exercises HardSwish/HardSigmoid/grouped
# Conv in the owned ONNX stack)
# ---------------------------------------------------------------------------

def lraspp_to_onnx(params: dict[str, Any], opset: int = 14):
    """Emit a torchvision-layout ONNX graph (NCHW f32 in, ``out``) from
    native params.  Dynamic spatial dims via Shape-driven Resize, same
    idiom as :func:`infur_tpu.models.fcn_resnet50.fcn_resnet50_to_onnx`.
    Opset 14 default — HardSwish appears in 14."""
    from infur_tpu.models.fcn_resnet50 import _onnx_conv_weight
    from infur_tpu.onnx.export import GraphBuilder

    g = GraphBuilder("lraspp_mobilenet_v3_large")
    x = g.input("input", np.float32, (1, 3, "height", "width"))

    def conv(x, w_hwio, stride=1, dilation=1, groups=1, bias=None):
        kh = w_hwio.shape[0]
        pad = dilation * (kh - 1) // 2
        ins = [x, g.init(g.fresh("w"), _onnx_conv_weight(w_hwio))]
        if bias is not None:
            ins.append(g.init(g.fresh("b"), np.asarray(bias, np.float32)))
        return g.node("Conv", ins, strides=[stride, stride],
                      dilations=[dilation, dilation],
                      pads=[pad, pad, pad, pad], group=groups)

    def bn(x, p):
        return g.node("BatchNormalization", [
            x, g.init(g.fresh("bn_s"), np.asarray(p["scale"], np.float32)),
            g.init(g.fresh("bn_b"), np.asarray(p["bias"], np.float32)),
            g.init(g.fresh("bn_m"), np.asarray(p["mean"], np.float32)),
            g.init(g.fresh("bn_v"), np.asarray(p["var"], np.float32))],
            epsilon=1e-5)

    def act(x, kind):
        return g.node("Relu" if kind == "RE" else "HardSwish", [x])

    def hw_sizes_of(src, lead: np.ndarray) -> str:
        """Concat(Shape(src)[0:1], channels, Shape(src)[2:4]) for Resize
        ``sizes`` — batch from Shape so the graph serves any batch."""
        shp = g.node("Shape", [src])
        nb = g.node("Slice", [shp, g.const(np.asarray([0], np.int64)),
                              g.const(np.asarray([1], np.int64)),
                              g.const(np.asarray([0], np.int64))])
        hw = g.node("Slice", [shp, g.const(np.asarray([2], np.int64)),
                              g.const(np.asarray([4], np.int64)),
                              g.const(np.asarray([0], np.int64))])
        return g.node("Concat",
                      [nb, g.const(lead.astype(np.int64)[1:]), hw], axis=0)

    y = act(bn(conv(x, params["stem_conv"], stride=2), params["stem_bn"]), "HS")
    low = None
    for i, ((cin, _k, exp, cout, se, a, stride, dil), blk) in enumerate(
            zip(_CONF, params["blocks"])):
        skip = y
        if "exp_conv" in blk:
            y = act(bn(conv(y, blk["exp_conv"]), blk["exp_bn"]), a)
        s = 1 if dil > 1 else stride
        y = act(bn(conv(y, blk["dw_conv"], stride=s, dilation=dil,
                        groups=exp), blk["dw_bn"]), a)
        if se:
            sq = g.node("GlobalAveragePool", [y])
            sq = g.node("Relu", [conv(sq, blk["se"]["fc1"],
                                      bias=blk["se"]["fc1_b"])])
            sq = g.node("HardSigmoid", [conv(sq, blk["se"]["fc2"],
                                             bias=blk["se"]["fc2_b"])],
                        alpha=1.0 / 6.0, beta=0.5)
            y = g.node("Mul", [y, sq])
        y = bn(conv(y, blk["proj_conv"]), blk["proj_bn"])
        if stride == 1 and cin == cout:
            y = g.node("Add", [skip, y])
        if i == _LOW_BLOCK:
            low = y
    high = act(bn(conv(y, params["last_conv"]), params["last_bn"]), "HS")

    head = params["head"]
    cbr = g.node("Relu", [bn(conv(high, head["cbr_conv"]), head["cbr_bn"])])
    s = g.node("GlobalAveragePool", [high])
    s = g.node("Sigmoid", [conv(s, head["scale_conv"])])
    gated = g.node("Mul", [cbr, s])
    up = g.node("Resize", [gated, "", "",
                           hw_sizes_of(low, np.asarray([1, _INTER_CH]))],
                mode="linear", coordinate_transformation_mode="half_pixel")
    k = head["low_cls"].shape[-1]
    lo = conv(low, head["low_cls"], bias=head["low_cls_b"])
    hi = conv(up, head["high_cls"], bias=head["high_cls_b"])
    out = g.node("Add", [lo, hi])
    out = g.node("Resize", [out, "", "", hw_sizes_of(x, np.asarray([1, k]))],
                 mode="linear", coordinate_transformation_mode="half_pixel")
    g.output(g.node("Identity", [out], outputs=["out"]), np.float32,
             (1, k, "height", "width"))
    return g.model(opset=opset)


@partial(jax.jit, static_argnames=("compute_dtype",))
def lraspp_apply(params: dict[str, Any], x_nhwc: jax.Array,
                 compute_dtype: str = "float32") -> dict[str, jax.Array]:
    """(N, H, W, 3) normalized f32 -> {"out": (N, K, H, W) f32}."""
    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        n, h, w, _ = x_nhwc.shape
        x = x_nhwc.astype(compute_dtype)
        low, high = _backbone(params, x)
        out = _lraspp_head(low, high, params["head"])
        out = _upsample_bilinear(out, (h, w)).astype(jnp.float32)
        return {"out": jnp.transpose(out, (0, 3, 1, 2))}
