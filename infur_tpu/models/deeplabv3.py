"""DeepLabV3-ResNet50 semantic segmentation, TPU-native.

Third model family: torchvision's other ResNet-50 segmentation head.  The
backbone is shared with :mod:`infur_tpu.models.fcn_resnet50` (output-stride
8, dilated stages); the head is ASPP — parallel 1x1 + three dilated 3x3
branches (rates 12/24/36 at OS8) + global-pool branch, concat, project,
classify — then bilinear upsample to input resolution.  Output contract
matches the family convention: {"out": (N, K, H, W) f32} (+"aux").
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from infur_tpu.models.fcn_resnet50 import (
    NUM_CLASSES, _bn, _bn_init, _conv, _conv_init, _head,
    _upsample_bilinear, backbone_features,
)

ASPP_RATES = (12, 24, 36)  # torchvision rates at output-stride 8
ASPP_DIM = 256


def init_deeplabv3_resnet50(key: jax.Array, num_classes: int = NUM_CLASSES,
                            aux: bool = True) -> dict[str, Any]:
    from infur_tpu.models.fcn_resnet50 import init_fcn_resnet50

    # reuse the backbone + aux init; replace the FCN head with ASPP
    params = init_fcn_resnet50(key, num_classes=num_classes, aux=aux)
    del params["head"]
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 16))
    aspp: dict[str, Any] = {
        "b0_conv": _conv_init(next(keys), 1, 1, 2048, ASPP_DIM),
        "b0_bn": _bn_init(ASPP_DIM),
    }
    for i, r in enumerate(ASPP_RATES):
        aspp[f"b{i + 1}_conv"] = _conv_init(next(keys), 3, 3, 2048, ASPP_DIM)
        aspp[f"b{i + 1}_bn"] = _bn_init(ASPP_DIM)
    aspp["pool_conv"] = _conv_init(next(keys), 1, 1, 2048, ASPP_DIM)
    aspp["pool_bn"] = _bn_init(ASPP_DIM)
    aspp["proj_conv"] = _conv_init(next(keys), 1, 1, 5 * ASPP_DIM, ASPP_DIM)
    aspp["proj_bn"] = _bn_init(ASPP_DIM)
    aspp["cls_conv"] = _conv_init(next(keys), 3, 3, ASPP_DIM, ASPP_DIM)
    aspp["cls_bn"] = _bn_init(ASPP_DIM)
    aspp["cls"] = _conv_init(next(keys), 1, 1, ASPP_DIM, num_classes)
    aspp["cls_b"] = jnp.zeros((num_classes,), jnp.float32)
    params["aspp"] = aspp
    return params


def _aspp(x: jax.Array, p: dict[str, Any]) -> jax.Array:
    n, h, w, _ = x.shape
    branches = [jax.nn.relu(_bn(_conv(x, p["b0_conv"]), p["b0_bn"]))]
    for i, r in enumerate(ASPP_RATES):
        branches.append(jax.nn.relu(_bn(
            _conv(x, p[f"b{i + 1}_conv"], dilation=r), p[f"b{i + 1}_bn"])))
    g = x.mean(axis=(1, 2), keepdims=True)
    g = jax.nn.relu(_bn(_conv(g, p["pool_conv"]), p["pool_bn"]))
    branches.append(jnp.broadcast_to(g, (n, h, w, g.shape[-1])))
    y = jnp.concatenate(branches, axis=-1)
    y = jax.nn.relu(_bn(_conv(y, p["proj_conv"]), p["proj_bn"]))
    y = jax.nn.relu(_bn(_conv(y, p["cls_conv"]), p["cls_bn"]))
    return _conv(y, p["cls"]) + p["cls_b"].astype(y.dtype)


def deeplabv3_to_onnx(params: dict[str, Any], opset: int = 13):
    """Emit the torchvision-format DeepLabV3 ONNX graph (NCHW f32
    ``input`` -> ``out`` [+``aux``], any input size) from native params.
    Same Shape-driven dynamic-size idiom as fcn_resnet50_to_onnx; the
    ASPP pool branch resizes its 1x1 global feature back to layer4's
    spatial dims the way torchvision's export does."""
    import numpy as np

    from infur_tpu.models.fcn_resnet50 import (
        onnx_backbone, onnx_helpers, onnx_input_size_resize,
    )
    from infur_tpu.onnx.export import GraphBuilder

    g = GraphBuilder("deeplabv3_resnet50")
    x = g.input("input", np.float32, (1, 3, "height", "width"))
    conv, bn, relu = onnx_helpers(g)
    feats = onnx_backbone(g, x, params)
    p = params["aspp"]
    f4 = feats["layer4"]

    branches = [relu(bn(conv(f4, p["b0_conv"]), p["b0_bn"]))]
    for i, r in enumerate(ASPP_RATES):
        branches.append(relu(bn(conv(f4, p[f"b{i + 1}_conv"], dilation=r),
                                p[f"b{i + 1}_bn"])))
    pool = g.node("GlobalAveragePool", [f4])
    pool = relu(bn(conv(pool, p["pool_conv"]), p["pool_bn"]))
    # resize the pooled branch to layer4's spatial dims (Shape-driven)
    f4_shape = g.node("Shape", [f4])
    hw4 = g.node("Slice", [f4_shape, g.const(np.asarray([2], np.int64)),
                           g.const(np.asarray([4], np.int64)),
                           g.const(np.asarray([0], np.int64))])
    nb4 = g.node("Slice", [f4_shape, g.const(np.asarray([0], np.int64)),
                           g.const(np.asarray([1], np.int64)),
                           g.const(np.asarray([0], np.int64))])
    nd = g.const(np.asarray([ASPP_DIM], np.int64), g.fresh("pool_nd"))
    pool_sizes = g.node("Concat", [nb4, nd, hw4], axis=0)
    branches.append(g.node("Resize", [pool, "", "", pool_sizes],
                           mode="linear",
                           coordinate_transformation_mode="half_pixel"))

    y = g.node("Concat", branches, axis=1)
    y = relu(bn(conv(y, p["proj_conv"]), p["proj_bn"]))
    y = relu(bn(conv(y, p["cls_conv"]), p["cls_bn"]))
    y = conv(y, p["cls"], bias=p["cls_b"])

    k = int(np.asarray(p["cls"]).shape[-1])
    up = onnx_input_size_resize(g, x, k)
    g.output(g.node("Identity", [up(y)], outputs=["out"]), np.float32,
             (1, k, "height", "width"))
    if "aux_head" in params:
        ah = params["aux_head"]
        a = relu(bn(conv(feats["layer3"], ah["conv1"]), ah["bn1"]))
        a = conv(a, ah["conv2"], bias=ah["bias2"])
        g.output(g.node("Identity", [up(a)], outputs=["aux"]), np.float32,
                 (1, k, "height", "width"))
    return g.model(opset=opset)


@partial(jax.jit, static_argnames=("compute_dtype",))
def deeplabv3_apply(params: dict[str, Any], x_nhwc: jax.Array,
                    compute_dtype: str = "float32") -> dict[str, jax.Array]:
    """(N, H, W, 3) normalized f32 -> {"out": (N, K, H, W) f32, "aux": ...}."""
    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        n, h, w, _ = x_nhwc.shape
        feats = backbone_features(params, x_nhwc, compute_dtype)

        out = _aspp(feats["layer4"], params["aspp"])
        out = _upsample_bilinear(out, (h, w)).astype(jnp.float32)
        result = {"out": jnp.transpose(out, (0, 3, 1, 2))}
        if "aux_head" in params:
            aux = _head(feats["layer3"], params["aux_head"])
            aux = _upsample_bilinear(aux, (h, w)).astype(jnp.float32)
            result["aux"] = jnp.transpose(aux, (0, 3, 1, 2))
        return result
