"""FCN-ResNet50 semantic segmentation, TPU-native.

The flagship model, architecturally equivalent to the reference's
``fcn-resnet50-12`` ONNX file (torchvision ``fcn_resnet50``): a ResNet-50
backbone with output-stride 8 (stages 3/4 use dilation instead of stride),
an FCN head (3x3 conv -> BN -> ReLU -> 1x1 classifier) on stage 4, an aux
head on stage 3, and bilinear upsampling of both logit maps back to input
resolution.  Output contract matches the reference test golden shapes: two
tensors ``out``/``aux`` of shape (N, 21, H, W) f32 at input resolution
(reference infur/src/predict_onnx.rs:371-381).

Design (TPU-first, not a port):

* channels-last NHWC activations and HWIO weights — the layouts XLA's TPU
  conv emitter prefers; outputs transpose to the NCHW contract only at the
  boundary;
* optional bfloat16 compute with f32 params and f32 BN statistics — the MXU
  path; ``compute_dtype="float32"`` gives oracle-parity mode;
* BatchNorm is inference-mode (running stats folded into a single
  scale/shift per channel at apply time — XLA fuses it into the conv);
* pure functions over a params pytree: shard/donate/vmap/grad all compose.

ONNX checkpoints of this architecture run through
:mod:`infur_tpu.onnx.importer` directly; :func:`fcn_resnet50_to_onnx` goes
the other way (native params -> reference-format ONNX file).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NUM_CLASSES = 21  # PASCAL VOC classes, the reference model's output arity

# ResNet-50 stage spec: (blocks, mid_channels, out_channels)
_STAGES = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> jax.Array:
    """He-normal fan-out init (what torchvision uses for ResNets)."""
    fan_out = kh * kw * cout
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c: int) -> dict[str, jax.Array]:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _bottleneck_init(key: jax.Array, cin: int, mid: int, cout: int,
                     downsample: bool) -> dict[str, Any]:
    ks = jax.random.split(key, 4)
    p: dict[str, Any] = {
        "conv1": _conv_init(ks[0], 1, 1, cin, mid), "bn1": _bn_init(mid),
        "conv2": _conv_init(ks[1], 3, 3, mid, mid), "bn2": _bn_init(mid),
        "conv3": _conv_init(ks[2], 1, 1, mid, cout), "bn3": _bn_init(cout),
    }
    if downsample:
        p["down_conv"] = _conv_init(ks[3], 1, 1, cin, cout)
        p["down_bn"] = _bn_init(cout)
    return p


def init_fcn_resnet50(key: jax.Array, num_classes: int = NUM_CLASSES,
                      aux: bool = True) -> dict[str, Any]:
    """Random-init params pytree (He-normal convs, identity BN)."""
    keys = iter(jax.random.split(key, 64))
    params: dict[str, Any] = {
        "stem_conv": _conv_init(next(keys), 7, 7, 3, 64),
        "stem_bn": _bn_init(64),
    }
    cin = 64
    for si, (blocks, mid, cout) in enumerate(_STAGES):
        stage = []
        for bi in range(blocks):
            stage.append(_bottleneck_init(
                next(keys), cin if bi == 0 else cout, mid, cout,
                downsample=(bi == 0)))
        params[f"layer{si + 1}"] = stage
        cin = cout
    params["head"] = {
        "conv1": _conv_init(next(keys), 3, 3, 2048, 512), "bn1": _bn_init(512),
        "conv2": _conv_init(next(keys), 1, 1, 512, num_classes),
        "bias2": jnp.zeros((num_classes,), jnp.float32),
    }
    if aux:
        params["aux_head"] = {
            "conv1": _conv_init(next(keys), 3, 3, 1024, 256), "bn1": _bn_init(256),
            "conv2": _conv_init(next(keys), 1, 1, 256, num_classes),
            "bias2": jnp.zeros((num_classes,), jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(x: jax.Array, w: jax.Array, stride: int = 1, dilation: int = 1) -> jax.Array:
    """NHWC x HWIO conv, SAME-style symmetric padding for odd kernels."""
    kh, kw = w.shape[0], w.shape[1]
    ph = dilation * (kh - 1) // 2
    pw = dilation * (kw - 1) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)), rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(x: jax.Array, p: dict[str, jax.Array], eps: float = 1e-5) -> jax.Array:
    """Inference BN as one fused scale/shift (f32 statistics)."""
    inv = p["scale"] * lax.rsqrt(p["var"] + eps)
    return (x * inv.astype(x.dtype) + (p["bias"] - p["mean"] * inv).astype(x.dtype))


def _bottleneck(x: jax.Array, p: dict[str, Any], stride: int, dilation: int) -> jax.Array:
    # torchvision ResNet-50: 1x1 reduce, 3x3 (stride/dilation), 1x1 expand.
    y = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, p["conv2"], stride=stride, dilation=dilation),
                        p["bn2"]))
    y = _bn(_conv(y, p["conv3"]), p["bn3"])
    if "down_conv" in p:
        x = _bn(_conv(x, p["down_conv"], stride=stride), p["down_bn"])
    return jax.nn.relu(x + y)


def _maxpool_3x3s2(x: jax.Array) -> jax.Array:
    """Stem maxpool: kernel 3, stride 2, padding 1 (torchvision semantics)."""
    # init value must be a Python literal for reduce_window autodiff
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1), padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def _upsample_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Half-pixel bilinear (align_corners=False), matching ONNX Resize."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    xf = x.astype(jnp.float32)
    out = jax.image.resize(xf, (n, oh, ow, c), method="bilinear")
    return out


def _head(x: jax.Array, p: dict[str, Any]) -> jax.Array:
    y = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    y = _conv(y, p["conv2"]) + p["bias2"].astype(y.dtype)
    return y


@partial(jax.jit, static_argnames=("compute_dtype",))
def fcn_resnet50_apply(params: dict[str, Any], x_nhwc: jax.Array,
                       compute_dtype: str = "float32") -> dict[str, jax.Array]:
    """Forward pass.  x: (N, H, W, 3) normalized f32.  Returns NCHW logits
    ``{"out": (N, K, H, W), "aux": ...}`` f32 at input resolution.

    f32 mode pins matmul precision to "highest" — TPU convs otherwise take
    bf16 inputs by default, which breaks oracle/importer parity; bf16 mode
    is the throughput path and keeps the default.
    """
    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        return _fcn_forward(params, x_nhwc, compute_dtype)


def backbone_features(params: dict[str, Any], x_nhwc: jax.Array,
                      compute_dtype: str) -> dict[str, jax.Array]:
    """The shared output-stride-8 dilated ResNet-50 walk: stem + 4 stages
    (layer1 s1, layer2 s2, layer3 s1/d2, layer4 s1/d4), returning each
    stage's NHWC features.  Used by the FCN and DeepLabV3 heads."""
    x = x_nhwc.astype(compute_dtype)
    x = jax.nn.relu(_bn(_conv(x, params["stem_conv"].astype(x.dtype), stride=2),
                        params["stem_bn"]))
    x = _maxpool_3x3s2(x)
    stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))
    feats: dict[str, jax.Array] = {}
    for si, (stride, dilation) in enumerate(stage_cfg):
        for bi, bp in enumerate(params[f"layer{si + 1}"]):
            # torchvision dilated stages: first block keeps the PREVIOUS
            # dilation in its 3x3 (stride replaced), later blocks use the new.
            d_first = max(dilation // 2, 1) if stride == 1 and dilation > 1 else 1
            x = _bottleneck(x, bp, stride if bi == 0 else 1,
                            (d_first if bi == 0 else dilation))
        feats[f"layer{si + 1}"] = x
    return feats


def _fcn_forward(params: dict[str, Any], x_nhwc: jax.Array,
                 compute_dtype: str) -> dict[str, jax.Array]:
    feats = backbone_features(params, x_nhwc, compute_dtype)
    return _fcn_heads_from_feats(params, feats, x_nhwc.shape)


def _fcn_heads_from_feats(params: dict[str, Any], feats: dict[str, jax.Array],
                          in_shape: tuple[int, ...]) -> dict[str, jax.Array]:
    """FCN head(s) on backbone features -> NCHW logits at input resolution.
    Shared by the plain forward and the pipeline-parallel variant."""
    _, h, w = in_shape[0], in_shape[1], in_shape[2]
    out = _head(feats["layer4"], params["head"])
    out = _upsample_bilinear(out, (h, w)).astype(jnp.float32)
    result = {"out": jnp.transpose(out, (0, 3, 1, 2))}
    if "aux_head" in params:
        aux = _head(feats["layer3"], params["aux_head"])
        aux = _upsample_bilinear(aux, (h, w)).astype(jnp.float32)
        result["aux"] = jnp.transpose(aux, (0, 3, 1, 2))
    return result


# ---------------------------------------------------------------------------
# ONNX bridge: export (fixture generation) and checkpoint ingest
# ---------------------------------------------------------------------------

def _onnx_conv_weight(w_hwio: jax.Array) -> np.ndarray:
    return np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1))  # OIHW


def onnx_helpers(g):
    """conv/bn/relu emitters over a GraphBuilder (shared by the FCN and
    DeepLabV3 exporters)."""
    def conv(x, wkey_arr, stride=1, dilation=1, bias=None, name=None):
        kh = wkey_arr.shape[0]
        pad = dilation * (kh - 1) // 2
        ins = [x, g.init(name or g.fresh("w"), _onnx_conv_weight(wkey_arr))]
        if bias is not None:
            ins.append(g.init(g.fresh("b"), np.asarray(bias, np.float32)))
        return g.node("Conv", ins, strides=[stride, stride],
                      dilations=[dilation, dilation],
                      pads=[pad, pad, pad, pad])

    def bn(x, p):
        return g.node("BatchNormalization", [
            x, g.init(g.fresh("bn_s"), np.asarray(p["scale"], np.float32)),
            g.init(g.fresh("bn_b"), np.asarray(p["bias"], np.float32)),
            g.init(g.fresh("bn_m"), np.asarray(p["mean"], np.float32)),
            g.init(g.fresh("bn_v"), np.asarray(p["var"], np.float32))],
            epsilon=1e-5)

    def relu(x):
        return g.node("Relu", [x])

    return conv, bn, relu


def onnx_backbone(g, x, params):
    """Emit the shared dilated OS8 ResNet-50 walk; returns the per-stage
    feature tensor names (mirrors :func:`backbone_features`)."""
    conv, bn, relu = onnx_helpers(g)
    y = relu(bn(conv(x, params["stem_conv"], stride=2), params["stem_bn"]))
    y = g.node("MaxPool", [y], kernel_shape=[3, 3], strides=[2, 2],
               pads=[1, 1, 1, 1])
    stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))
    feats = {}
    for si, (stride, dilation) in enumerate(stage_cfg):
        for bi, bp in enumerate(params[f"layer{si + 1}"]):
            d_first = max(dilation // 2, 1) if stride == 1 and dilation > 1 else 1
            s = stride if bi == 0 else 1
            d = d_first if bi == 0 else dilation
            yy = relu(bn(conv(y, bp["conv1"]), bp["bn1"]))
            yy = relu(bn(conv(yy, bp["conv2"], stride=s, dilation=d), bp["bn2"]))
            yy = bn(conv(yy, bp["conv3"]), bp["bn3"])
            sc = y
            if "down_conv" in bp:
                sc = bn(conv(y, bp["down_conv"], stride=s), bp["down_bn"])
            y = relu(g.node("Add", [sc, yy]))
        feats[f"layer{si + 1}"] = y
    return feats


def onnx_input_size_resize(g, x, num_classes):
    """A dynamic Resize-to-input-size emitter (Shape-driven, the zoo
    model's idiom — the file accepts any input size and the importer
    resolves the shape machinery statically at trace time)."""
    in_shape = g.node("Shape", [x])
    hw = g.node("Slice", [in_shape, g.const(np.asarray([2], np.int64)),
                          g.const(np.asarray([4], np.int64)),
                          g.const(np.asarray([0], np.int64))])
    # batch from Shape too (not a baked 1): the graph stays
    # batch-polymorphic for batched data-parallel serving
    nb = g.node("Slice", [in_shape, g.const(np.asarray([0], np.int64)),
                          g.const(np.asarray([1], np.int64)),
                          g.const(np.asarray([0], np.int64))])
    nk = g.const(np.asarray([num_classes], np.int64), g.fresh("resize_nk"))
    sizes = g.node("Concat", [nb, nk, hw], axis=0)

    def up(t):
        return g.node("Resize", [t, "", "", sizes], mode="linear",
                      coordinate_transformation_mode="half_pixel")

    return up


def fcn_resnet50_to_onnx(params: dict[str, Any], input_hw: tuple[int, int],
                         opset: int = 13):
    """Emit the reference-format ONNX graph (NCHW f32 in, out+aux) from
    native params.  Serves as the full-scale importer fixture — the
    environment has no network to download the zoo model
    (cf. reference infur-test-gen/build.rs:88-93)."""
    from infur_tpu.onnx.export import GraphBuilder

    g = GraphBuilder("fcn_resnet50")
    x = g.input("input", np.float32, (1, 3, "height", "width"))
    conv, bn, relu = onnx_helpers(g)
    feats = onnx_backbone(g, x, params)

    def head(x, p):
        y = relu(bn(conv(x, p["conv1"]), p["bn1"]))
        return conv(y, p["conv2"], bias=p["bias2"])

    k = int(np.asarray(params["head"]["conv2"]).shape[-1])
    up = onnx_input_size_resize(g, x, k)
    out = up(head(feats["layer4"], params["head"]))
    g.output(g.node("Identity", [out], outputs=["out"]), np.float32,
             (1, k, "height", "width"))
    if "aux_head" in params:
        aux = up(head(feats["layer3"], params["aux_head"]))
        g.output(g.node("Identity", [aux], outputs=["aux"]), np.float32,
                 (1, k, "height", "width"))
    return g.model(opset=opset)
