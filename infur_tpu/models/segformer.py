"""SegFormer (MiT-B0..B2) semantic segmentation, TPU-native.

The stretch model family (SURVEY §5.7): a hierarchical transformer encoder
(overlapped patch embeddings, efficient self-attention with spatial
reduction, Mix-FFN with a depthwise 3x3) and the all-MLP decode head.
Matches the NVlabs/SegFormer architecture; sizes b0/b1/b2 supported.

TPU design notes:

* channels-last everywhere; attention is plain jnp einsum -> XLA tiles the
  (N, heads, L, d) batched matmuls onto the MXU, and the spatial-reduction
  conv keeps K/V length = L/sr^2 so stage-1 attention stays MXU-friendly;
* bfloat16 compute / f32 params, same convention as FCN-ResNet50;
* output contract matches the reference model family: logits upsampled to
  input resolution, NCHW (N, K, H, W) f32.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CONFIGS = {
    "b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2), dec_dim=256),
    "b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2), dec_dim=256),
    "b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), dec_dim=768),
}
HEADS = (1, 2, 5, 8)
SR = (8, 4, 2, 1)
PATCH = ((7, 4), (3, 2), (3, 2), (3, 2))  # (kernel, stride) per stage


def _dense_init(key, din, dout):
    lim = float(np.sqrt(6.0 / (din + dout)))
    return jax.random.uniform(key, (din, dout), jnp.float32, -lim, lim)


def _conv_init(key, kh, kw, cin, cout):
    fan_out = kh * kw * cout
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) \
        * float(np.sqrt(2.0 / fan_out))


def _ln_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_segformer(key: jax.Array, num_classes: int = 21,
                   variant: str = "b0") -> dict[str, Any]:
    cfg = CONFIGS[variant]
    dims, depths, dec = cfg["dims"], cfg["depths"], cfg["dec_dim"]
    keys = iter(jax.random.split(key, 256))
    params: dict[str, Any] = {}  # variant is positional, not a pytree leaf
    cin = 3
    for s in range(4):
        k, stride = PATCH[s]
        d = dims[s]
        stage: dict[str, Any] = {
            "patch_conv": _conv_init(next(keys), k, k, cin, d),
            "patch_bias": jnp.zeros((d,), jnp.float32),
            "patch_ln": _ln_init(d),
            "blocks": [],
            "out_ln": _ln_init(d),
        }
        for _ in range(depths[s]):
            blk = {
                "ln1": _ln_init(d),
                "q": _dense_init(next(keys), d, d),
                "kv": _dense_init(next(keys), d, 2 * d),
                "proj": _dense_init(next(keys), d, d),
                "q_b": jnp.zeros((d,), jnp.float32),
                "kv_b": jnp.zeros((2 * d,), jnp.float32),
                "proj_b": jnp.zeros((d,), jnp.float32),
                "ln2": _ln_init(d),
                "fc1": _dense_init(next(keys), d, 4 * d),
                "fc1_b": jnp.zeros((4 * d,), jnp.float32),
                "dw": _conv_init(next(keys), 3, 3, 1, 4 * d),  # depthwise
                "dw_b": jnp.zeros((4 * d,), jnp.float32),
                "fc2": _dense_init(next(keys), 4 * d, d),
                "fc2_b": jnp.zeros((d,), jnp.float32),
            }
            if SR[s] > 1:
                blk["sr_conv"] = _conv_init(next(keys), SR[s], SR[s], d, d)
                blk["sr_bias"] = jnp.zeros((d,), jnp.float32)
                blk["sr_ln"] = _ln_init(d)
            stage["blocks"].append(blk)
        params[f"stage{s + 1}"] = stage
        cin = d
    params["head"] = {
        "lin": [_dense_init(next(keys), dims[s], dec) for s in range(4)],
        "lin_b": [jnp.zeros((dec,), jnp.float32) for _ in range(4)],
        "fuse": _conv_init(next(keys), 1, 1, 4 * dec, dec),
        "fuse_bn": {"scale": jnp.ones((dec,), jnp.float32),
                    "bias": jnp.zeros((dec,), jnp.float32),
                    "mean": jnp.zeros((dec,), jnp.float32),
                    "var": jnp.ones((dec,), jnp.float32)},
        "cls": _conv_init(next(keys), 1, 1, dec, num_classes),
        "cls_b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params


def _ln(x, p, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["scale"].astype(x.dtype) \
        + p["bias"].astype(x.dtype)


def _conv(x, w, stride=1, groups=1, pad="SAME"):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _attn(x_nhwc, blk, heads, sr, impl="einsum"):
    n, h, w, d = x_nhwc.shape
    dh = d // heads
    q = (x_nhwc.reshape(n, h * w, d) @ blk["q"].astype(x_nhwc.dtype)
         + blk["q_b"].astype(x_nhwc.dtype))
    kv_src = x_nhwc
    if sr > 1:
        kv_src = _conv(x_nhwc, blk["sr_conv"], stride=sr) \
            + blk["sr_bias"].astype(x_nhwc.dtype)
        kv_src = _ln(kv_src, blk["sr_ln"])
    l2 = kv_src.shape[1] * kv_src.shape[2]
    kv = (kv_src.reshape(n, l2, d) @ blk["kv"].astype(x_nhwc.dtype)
          + blk["kv_b"].astype(x_nhwc.dtype))
    k, v = jnp.split(kv, 2, axis=-1)
    qh = q.reshape(n, h * w, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(n, l2, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(n, l2, heads, dh).transpose(0, 2, 1, 3)
    if impl in ("flash", "flash_interpret", "flash_packed"):
        from infur_tpu.ops.pallas_attention import (
            flash_attention, flash_attention_packed,
        )
        # compiled Pallas TPU kernels don't lower on CPU backends — fall
        # back to the interpreter there so `segformer:b0:flash` works
        # everywhere (tests, CPU smoke runs)
        interpret = (impl == "flash_interpret"
                     or jax.default_backend() == "cpu")
        fn = flash_attention_packed if impl == "flash_packed" \
            else flash_attention
        out = fn(qh, kh, vh, scale=float(1.0 / np.sqrt(dh)),
                 interpret=interpret)
    else:
        scores = jnp.einsum("nhld,nhmd->nhlm", qh, kh) / np.sqrt(dh)
        att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("nhlm,nhmd->nhld", att, vh)
    out = out.transpose(0, 2, 1, 3).reshape(n, h * w, d)
    out = out @ blk["proj"].astype(out.dtype) + blk["proj_b"].astype(out.dtype)
    return out.reshape(n, h, w, d)


def _mixffn(x_nhwc, blk):
    n, h, w, d = x_nhwc.shape
    y = x_nhwc @ blk["fc1"].astype(x_nhwc.dtype) + blk["fc1_b"].astype(x_nhwc.dtype)
    y = _conv(y, blk["dw"], groups=y.shape[-1]) + blk["dw_b"].astype(y.dtype)
    y = jax.nn.gelu(y, approximate=False)  # exact erf, like NVlabs/HF nn.GELU
    return y @ blk["fc2"].astype(y.dtype) + blk["fc2_b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# ONNX export (static input shape — the transformer fixture for the
# importer: LayerNormalization, batched-MatMul attention, Softmax, Gelu,
# token<->image Reshape/Transpose plumbing)
# ---------------------------------------------------------------------------

def segformer_to_onnx(params: dict[str, Any], input_hw: tuple[int, int],
                      variant: str = "b0", opset: int = 20):
    """Emit a static-shape ONNX graph (NCHW f32 'input' -> 'out') from
    native params.  Opset 20 for the Gelu op (exact erf form, matching the
    forward).  cf. fcn_resnet50_to_onnx for the exporter conventions;
    static dims keep the attention Reshapes constant."""
    from infur_tpu.models.fcn_resnet50 import _onnx_conv_weight
    from infur_tpu.onnx.export import GraphBuilder

    h0, w0 = input_hw
    cfg = CONFIGS[variant]
    dims, dec = cfg["dims"], cfg["dec_dim"]
    g = GraphBuilder(f"segformer_{variant}")
    x = g.input("input", np.float32, (1, 3, h0, w0))

    def conv(x, w_hwio, stride=1, pad=0, groups=1, bias=None):
        ins = [x, g.init(g.fresh("w"), _onnx_conv_weight(np.asarray(w_hwio)))]
        if bias is not None:
            ins.append(g.init(g.fresh("b"), np.asarray(bias, np.float32)))
        return g.node("Conv", ins, strides=[stride, stride],
                      pads=[pad, pad, pad, pad], group=groups)

    def ln(t, p):
        return g.node("LayerNormalization", [
            t, g.init(g.fresh("ln_s"), np.asarray(p["scale"], np.float32)),
            g.init(g.fresh("ln_b"), np.asarray(p["bias"], np.float32))],
            epsilon=1e-6)

    def matmul_bias(t, w, b):
        y = g.node("MatMul", [t, g.init(g.fresh("mw"),
                                        np.asarray(w, np.float32))])
        return g.node("Add", [y, g.init(g.fresh("mb"),
                                        np.asarray(b, np.float32))])

    def reshape(t, shape):
        return g.node("Reshape", [t, g.const(np.asarray(shape, np.int64))])

    def tokens_of(img, c, hh, ww):
        return g.node("Transpose", [reshape(img, (1, c, hh * ww))],
                      perm=[0, 2, 1])

    def image_of(tok, c, hh, ww):
        return reshape(g.node("Transpose", [tok], perm=[0, 2, 1]),
                       (1, c, hh, ww))

    hh, ww = h0, w0
    feat_imgs = []
    feat_hw = []
    y = x
    for s in range(4):
        st = params[f"stage{s + 1}"]
        k, stride = PATCH[s]
        d = dims[s]
        y = conv(y, st["patch_conv"], stride=stride, pad=(k - 1) // 2,
                 bias=st["patch_bias"])
        hh, ww = -(-hh // stride), -(-ww // stride)  # ceil: SAME-padded
        t = ln(tokens_of(y, d, hh, ww), st["patch_ln"])
        heads, sr = HEADS[s], SR[s]
        dh = d // heads
        L = hh * ww
        for blk in st["blocks"]:
            # --- efficient self-attention ---
            tin = ln(t, blk["ln1"])
            q = matmul_bias(tin, blk["q"], blk["q_b"])
            kv_src = tin
            l2 = L
            if sr > 1:
                img = image_of(tin, d, hh, ww)
                img = conv(img, blk["sr_conv"], stride=sr, bias=blk["sr_bias"])
                l2 = (hh // sr) * (ww // sr)
                kv_src = ln(tokens_of(img, d, hh // sr, ww // sr),
                            blk["sr_ln"])
            kv = matmul_bias(kv_src, blk["kv"], blk["kv_b"])
            kt, vt = g.node("Split", [kv], axis=-1, num_outputs=2,
                            outputs=[g.fresh("k"), g.fresh("v")])
            qh = g.node("Transpose", [reshape(q, (1, L, heads, dh))],
                        perm=[0, 2, 1, 3])
            kh = g.node("Transpose", [reshape(kt, (1, l2, heads, dh))],
                        perm=[0, 2, 3, 1])  # pre-transposed for q @ k^T
            vh = g.node("Transpose", [reshape(vt, (1, l2, heads, dh))],
                        perm=[0, 2, 1, 3])
            scores = g.node("Mul", [g.node("MatMul", [qh, kh]),
                                    g.const(np.float32(1.0 / np.sqrt(dh)))])
            att = g.node("Softmax", [scores], axis=-1)
            o = g.node("MatMul", [att, vh])
            o = reshape(g.node("Transpose", [o], perm=[0, 2, 1, 3]),
                        (1, L, d))
            o = matmul_bias(o, blk["proj"], blk["proj_b"])
            t = g.node("Add", [t, o])
            # --- Mix-FFN ---
            f = matmul_bias(ln(t, blk["ln2"]), blk["fc1"], blk["fc1_b"])
            img = image_of(f, 4 * d, hh, ww)
            img = conv(img, blk["dw"], pad=1, groups=4 * d, bias=blk["dw_b"])
            f = g.node("Gelu", [tokens_of(img, 4 * d, hh, ww)],
                       approximate="none")
            f = matmul_bias(f, blk["fc2"], blk["fc2_b"])
            t = g.node("Add", [t, f])
        t = ln(t, st["out_ln"])
        y = image_of(t, d, hh, ww)
        feat_imgs.append(t)
        feat_hw.append((hh, ww))

    # all-MLP decode head (token-space projections, image-space resizes)
    head = params["head"]
    th, tw = feat_hw[0]
    ups = []
    for s, t in enumerate(feat_imgs):
        p = matmul_bias(t, head["lin"][s], head["lin_b"][s])
        img = image_of(p, dec, *feat_hw[s])
        if feat_hw[s] != (th, tw):
            img = g.node("Resize", [img, "", "",
                                    g.const(np.asarray((1, dec, th, tw),
                                                       np.int64))],
                         mode="linear",
                         coordinate_transformation_mode="half_pixel")
        ups.append(img)
    y = g.node("Concat", ups[::-1], axis=1)
    y = conv(y, head["fuse"])
    bn = head["fuse_bn"]
    y = g.node("BatchNormalization", [
        y, g.init("fbn_s", np.asarray(bn["scale"], np.float32)),
        g.init("fbn_b", np.asarray(bn["bias"], np.float32)),
        g.init("fbn_m", np.asarray(bn["mean"], np.float32)),
        g.init("fbn_v", np.asarray(bn["var"], np.float32))], epsilon=1e-5)
    y = g.node("Relu", [y])
    y = conv(y, head["cls"], bias=head["cls_b"])
    k = np.asarray(head["cls"]).shape[-1]
    y = g.node("Resize", [y, "", "", g.const(np.asarray((1, k, h0, w0),
                                                        np.int64))],
               mode="linear", coordinate_transformation_mode="half_pixel")
    g.output(g.node("Identity", [y], outputs=["out"]), np.float32,
             (1, k, h0, w0))
    return g.model(opset=opset)


@partial(jax.jit, static_argnames=("compute_dtype", "attn_impl"))
def segformer_apply(params: dict[str, Any], x_nhwc: jax.Array,
                    compute_dtype: str = "float32",
                    attn_impl: str = "einsum") -> dict[str, jax.Array]:
    """(N, H, W, 3) normalized f32 -> {"out": (N, K, H, W) f32}.

    ``attn_impl="flash"`` uses the fused Pallas attention kernel
    (ops/pallas_attention.py); ``"flash_interpret"`` is its CPU-testable
    interpreter mode; default ``"einsum"`` is the pure-XLA path.
    """
    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        return _segformer_forward(params, x_nhwc, compute_dtype, attn_impl)


def _segformer_forward(params, x_nhwc, compute_dtype, attn_impl="einsum"):
    n, h0, w0, _ = x_nhwc.shape
    x = x_nhwc.astype(compute_dtype)
    feats = []
    for s in range(4):
        st = params[f"stage{s + 1}"]
        k, stride = PATCH[s]
        pad = (k - 1) // 2
        x = lax.conv_general_dilated(
            x, st["patch_conv"].astype(x.dtype), (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype) \
            + st["patch_bias"].astype(x.dtype)
        x = _ln(x, st["patch_ln"])
        heads, sr = HEADS[s], SR[s]
        for blk in st["blocks"]:
            x = x + _attn(_ln(x, blk["ln1"]), blk, heads, sr, attn_impl)
            x = x + _mixffn(_ln(x, blk["ln2"]), blk)
        x = _ln(x, st["out_ln"])
        feats.append(x)

    return _segformer_head(params, feats, (n, h0, w0))


def _segformer_head(params, feats, nhw):
    """All-MLP decode head: project, upsample to 1/4 res, concat, fuse.
    Shared with the MoE variant (models/segformer_moe.py)."""
    n, h0, w0 = nhw
    head = params["head"]
    th, tw = feats[0].shape[1], feats[0].shape[2]
    ups = []
    for s, f in enumerate(feats):
        y = f @ head["lin"][s].astype(f.dtype) + head["lin_b"][s].astype(f.dtype)
        if y.shape[1] != th or y.shape[2] != tw:
            y = jax.image.resize(y.astype(jnp.float32),
                                 (n, th, tw, y.shape[-1]),
                                 "bilinear").astype(y.dtype)
        ups.append(y)
    y = jnp.concatenate(ups[::-1], axis=-1)  # c4..c1 order like the paper
    y = _conv(y, head["fuse"])
    bn = head["fuse_bn"]
    inv = bn["scale"] * lax.rsqrt(bn["var"] + 1e-5)
    y = jax.nn.relu(y * inv.astype(y.dtype)
                    + (bn["bias"] - bn["mean"] * inv).astype(y.dtype))
    y = _conv(y, head["cls"]) + head["cls_b"].astype(y.dtype)
    y = jax.image.resize(y.astype(jnp.float32), (n, h0, w0, y.shape[-1]),
                         "bilinear")
    return {"out": jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)}
