"""Torchvision checkpoint ingestion: state-dict name mapping -> params pytree.

The reference runs the real zoo ``fcn-resnet50-12-int8.onnx`` downloaded at
build time (/root/reference/infur-test-gen/build.rs:88-93); this environment
has no network, so real weights can't be fetched — but the *name mapping*
from torchvision's ``model.state_dict()`` layout to our pytrees is pure
bookkeeping and is written + tested now, so a real ``.pth`` drops in the
moment a file exists (``family@weights.pth`` specs, model_stage.py).

Covered: ``fcn_resnet50`` and ``deeplabv3_resnet50`` (torchvision
``models.segmentation`` layouts).  Both directions are provided; the
inverse (pytree -> torch-style keys) exists so tests can synthesize a
correctly-keyed state dict and prove the round trip reproduces
``fcn_resnet50_apply`` outputs exactly, and so finetuned params can be
exported back to the torchvision ecosystem.

Conventions mapped:
- conv weights: torch OIHW -> our HWIO (transpose (2, 3, 1, 0))
- batchnorm: weight/bias/running_mean/running_var -> scale/bias/mean/var;
  ``num_batches_tracked`` is accepted and ignored
- FCNHead ``classifier.{0,1,4}`` -> head conv1/bn1/conv2+bias2
- DeepLabHead ``classifier.0`` (ASPP: convs.0 1x1, convs.1-3 dilated 3x3,
  convs.4 pooled, project) + ``classifier.{1,2,4}`` -> aspp pytree
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "fcn_resnet50_from_torch_state",
    "fcn_resnet50_to_torch_state",
    "deeplabv3_resnet50_from_torch_state",
    "deeplabv3_resnet50_to_torch_state",
    "lraspp_mobilenet_v3_from_torch_state",
    "lraspp_mobilenet_v3_to_torch_state",
    "segformer_from_hf_state",
    "segformer_to_hf_state",
    "load_torch_checkpoint",
    "params_from_torch_checkpoint",
]

_BN_MAP = (("scale", "weight"), ("bias", "bias"),
           ("mean", "running_mean"), ("var", "running_var"))
_IGNORED_SUFFIX = ".num_batches_tracked"

# ResNet-50 stage block counts (torchvision layer1..4)
_BLOCKS = (3, 4, 6, 3)


class TorchStateDictError(ValueError):
    """State dict doesn't match the expected torchvision layout."""


def _to_np(v) -> np.ndarray:
    """Accept numpy arrays or torch tensors without importing torch."""
    if isinstance(v, np.ndarray):
        return v
    detach = getattr(v, "detach", None)
    if detach is not None:  # torch.Tensor
        return detach().cpu().numpy()
    return np.asarray(v)


class _Reader:
    """Tracks consumed keys so leftovers/misses produce precise errors."""

    def __init__(self, state: Mapping[str, Any]):
        self.state = dict(state)
        self.used: set[str] = set()

    def conv(self, key: str) -> np.ndarray:
        """torch OIHW conv weight -> HWIO."""
        return np.transpose(self.tensor(key + ".weight"), (2, 3, 1, 0))

    def bn(self, key: str) -> dict[str, np.ndarray]:
        out = {ours: self.tensor(f"{key}.{theirs}")
               for ours, theirs in _BN_MAP}
        self.used.add(key + _IGNORED_SUFFIX)  # optional, ignored
        return out

    def tensor(self, key: str) -> np.ndarray:
        if key not in self.state:
            raise TorchStateDictError(f"missing key {key!r}")
        self.used.add(key)
        return np.ascontiguousarray(_to_np(self.state[key]), dtype=np.float32)

    def ln(self, key: str) -> dict[str, np.ndarray]:
        """LayerNorm weight/bias -> scale/bias."""
        return {"scale": self.tensor(key + ".weight"),
                "bias": self.tensor(key + ".bias")}

    def dense(self, key: str) -> tuple[np.ndarray, np.ndarray]:
        """torch Linear (out, in) -> our (in, out) + bias."""
        return (np.transpose(self.tensor(key + ".weight")),
                self.tensor(key + ".bias"))

    def finish(self, what: str) -> None:
        extra = sorted(set(self.state) - self.used)
        if extra:
            raise TorchStateDictError(
                f"{len(extra)} unexpected keys for {what}: {extra[:8]}...")


def _backbone_from(r: _Reader) -> dict[str, Any]:
    params: dict[str, Any] = {
        "stem_conv": r.conv("backbone.conv1"),
        "stem_bn": r.bn("backbone.bn1"),
    }
    for li, blocks in enumerate(_BLOCKS):
        stage = []
        for bi in range(blocks):
            pre = f"backbone.layer{li + 1}.{bi}"
            blk: dict[str, Any] = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = r.conv(f"{pre}.conv{ci}")
                blk[f"bn{ci}"] = r.bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in r.state:
                blk["down_conv"] = r.conv(f"{pre}.downsample.0")
                blk["down_bn"] = r.bn(f"{pre}.downsample.1")
            stage.append(blk)
        params[f"layer{li + 1}"] = stage
    return params


def _fcn_head_from(r: _Reader, prefix: str) -> dict[str, Any]:
    """torchvision FCNHead: Sequential(conv3x3, BN, ReLU, Dropout, conv1x1)."""
    return {
        "conv1": r.conv(f"{prefix}.0"), "bn1": r.bn(f"{prefix}.1"),
        "conv2": r.conv(f"{prefix}.4"),
        "bias2": r.tensor(f"{prefix}.4.bias"),
    }


def fcn_resnet50_from_torch_state(state: Mapping[str, Any]) -> dict[str, Any]:
    """torchvision ``fcn_resnet50().state_dict()`` -> our params pytree."""
    r = _Reader(state)
    params = _backbone_from(r)
    params["head"] = _fcn_head_from(r, "classifier")
    if "aux_classifier.0.weight" in r.state:
        params["aux_head"] = _fcn_head_from(r, "aux_classifier")
    r.finish("fcn_resnet50")
    return params


def deeplabv3_resnet50_from_torch_state(state: Mapping[str, Any]) -> dict[str, Any]:
    """torchvision ``deeplabv3_resnet50().state_dict()`` -> params pytree."""
    r = _Reader(state)
    params = _backbone_from(r)
    aspp: dict[str, Any] = {
        "b0_conv": r.conv("classifier.0.convs.0.0"),
        "b0_bn": r.bn("classifier.0.convs.0.1"),
    }
    for i in range(3):  # dilated branches (rates 12/24/36)
        aspp[f"b{i + 1}_conv"] = r.conv(f"classifier.0.convs.{i + 1}.0")
        aspp[f"b{i + 1}_bn"] = r.bn(f"classifier.0.convs.{i + 1}.1")
    # ASPPPooling = Sequential(AdaptiveAvgPool2d, Conv2d, BN, ReLU)
    aspp["pool_conv"] = r.conv("classifier.0.convs.4.1")
    aspp["pool_bn"] = r.bn("classifier.0.convs.4.2")
    aspp["proj_conv"] = r.conv("classifier.0.project.0")
    aspp["proj_bn"] = r.bn("classifier.0.project.1")
    # DeepLabHead tail: Sequential(ASPP, conv3x3, BN, ReLU, conv1x1)
    aspp["cls_conv"] = r.conv("classifier.1")
    aspp["cls_bn"] = r.bn("classifier.2")
    aspp["cls"] = r.conv("classifier.4")
    aspp["cls_b"] = r.tensor("classifier.4.bias")
    params["aspp"] = aspp
    if "aux_classifier.0.weight" in r.state:
        params["aux_head"] = _fcn_head_from(r, "aux_classifier")
    r.finish("deeplabv3_resnet50")
    return params


def lraspp_mobilenet_v3_from_torch_state(state: Mapping[str, Any]
                                         ) -> dict[str, Any]:
    """torchvision ``lraspp_mobilenet_v3_large().state_dict()`` -> params.

    Backbone keys are positional (IntermediateLayerGetter keeps the
    ``features`` indices): ``backbone.0`` stem ConvBNActivation,
    ``backbone.1..15`` InvertedResiduals (``block.{j}`` sub-Sequential:
    optional expand CBA, depthwise CBA, optional SqueezeExcitation with
    fc1/fc2, project CB), ``backbone.16`` the 1x1-to-960 CBA.  Head:
    ``classifier.{cbr,scale,low_classifier,high_classifier}``.
    """
    from infur_tpu.models.lraspp_mobilenetv3 import _CONF

    r = _Reader(state)
    params: dict[str, Any] = {
        "stem_conv": r.conv("backbone.0.0"),
        "stem_bn": r.bn("backbone.0.1"),
    }
    blocks = []
    for i, (cin, _k, exp, _cout, se, _act, _s, _d) in enumerate(_CONF):
        pre = f"backbone.{i + 1}.block"
        j = 0
        blk: dict[str, Any] = {}
        if exp != cin:
            blk["exp_conv"] = r.conv(f"{pre}.{j}.0")
            blk["exp_bn"] = r.bn(f"{pre}.{j}.1")
            j += 1
        blk["dw_conv"] = r.conv(f"{pre}.{j}.0")
        blk["dw_bn"] = r.bn(f"{pre}.{j}.1")
        j += 1
        if se:
            blk["se"] = {
                "fc1": r.conv(f"{pre}.{j}.fc1"),
                "fc1_b": r.tensor(f"{pre}.{j}.fc1.bias"),
                "fc2": r.conv(f"{pre}.{j}.fc2"),
                "fc2_b": r.tensor(f"{pre}.{j}.fc2.bias"),
            }
            j += 1
        blk["proj_conv"] = r.conv(f"{pre}.{j}.0")
        blk["proj_bn"] = r.bn(f"{pre}.{j}.1")
        blocks.append(blk)
    params["blocks"] = blocks
    params["last_conv"] = r.conv("backbone.16.0")
    params["last_bn"] = r.bn("backbone.16.1")
    params["head"] = {
        "cbr_conv": r.conv("classifier.cbr.0"),
        "cbr_bn": r.bn("classifier.cbr.1"),
        "scale_conv": r.conv("classifier.scale.1"),
        "low_cls": r.conv("classifier.low_classifier"),
        "low_cls_b": r.tensor("classifier.low_classifier.bias"),
        "high_cls": r.conv("classifier.high_classifier"),
        "high_cls_b": r.tensor("classifier.high_classifier.bias"),
    }
    r.finish("lraspp_mobilenet_v3_large")
    return params


def segformer_from_hf_state(state: Mapping[str, Any]) -> dict[str, Any]:
    """HuggingFace ``SegformerForSemanticSegmentation.state_dict()`` -> our
    params pytree (models/segformer.py layout).

    Geometry (depths, dims, classes) is inferred from the tensors, so any
    MiT size loads without naming its variant.  Our fused ``kv`` projection
    is the concatenation of HF's separate key/value Linears; conv weights
    transpose OIHW -> HWIO; the depthwise dwconv (4d, 1, 3, 3) becomes
    HWIO (3, 3, 1, 4d).  HF's decode head emits logits at 1/4 resolution —
    our apply upsamples to input resolution per the family contract, which
    equals HF + an external half-pixel bilinear resize.
    """
    r = _Reader(state)
    enc = "segformer.encoder"
    params: dict[str, Any] = {}
    for s in range(4):
        pe = f"{enc}.patch_embeddings.{s}"
        if f"{pe}.proj.weight" not in r.state:
            raise TorchStateDictError(f"missing stage {s} ({pe}.proj.weight)")
        stage: dict[str, Any] = {
            "patch_conv": r.conv(f"{pe}.proj"),
            "patch_bias": r.tensor(f"{pe}.proj.bias"),
            "patch_ln": r.ln(f"{pe}.layer_norm"),
            "blocks": [],
            "out_ln": r.ln(f"{enc}.layer_norm.{s}"),
        }
        j = 0
        while f"{enc}.block.{s}.{j}.layer_norm_1.weight" in r.state:
            pre = f"{enc}.block.{s}.{j}"
            att = f"{pre}.attention"
            q, q_b = r.dense(f"{att}.self.query")
            k, k_b = r.dense(f"{att}.self.key")
            v, v_b = r.dense(f"{att}.self.value")
            proj, proj_b = r.dense(f"{att}.output.dense")
            fc1, fc1_b = r.dense(f"{pre}.mlp.dense1")
            fc2, fc2_b = r.dense(f"{pre}.mlp.dense2")
            blk: dict[str, Any] = {
                "ln1": r.ln(f"{pre}.layer_norm_1"),
                "q": q, "q_b": q_b,
                "kv": np.concatenate([k, v], axis=1),
                "kv_b": np.concatenate([k_b, v_b]),
                "proj": proj, "proj_b": proj_b,
                "ln2": r.ln(f"{pre}.layer_norm_2"),
                "fc1": fc1, "fc1_b": fc1_b,
                "dw": r.conv(f"{pre}.mlp.dwconv.dwconv"),
                "dw_b": r.tensor(f"{pre}.mlp.dwconv.dwconv.bias"),
                "fc2": fc2, "fc2_b": fc2_b,
            }
            if f"{att}.self.sr.weight" in r.state:
                blk["sr_conv"] = r.conv(f"{att}.self.sr")
                blk["sr_bias"] = r.tensor(f"{att}.self.sr.bias")
                blk["sr_ln"] = r.ln(f"{att}.self.layer_norm")
            stage["blocks"].append(blk)
            j += 1
        params[f"stage{s + 1}"] = stage
    dec = "decode_head"
    lin, lin_b = zip(*(r.dense(f"{dec}.linear_c.{s}.proj") for s in range(4)))
    params["head"] = {
        "lin": list(lin), "lin_b": list(lin_b),
        "fuse": r.conv(f"{dec}.linear_fuse"),
        "fuse_bn": r.bn(f"{dec}.batch_norm"),
        "cls": r.conv(f"{dec}.classifier"),
        "cls_b": r.tensor(f"{dec}.classifier.bias"),
    }
    r.finish("segformer (HF)")
    return params


def segformer_to_hf_state(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of :func:`segformer_from_hf_state` (tests + HF export)."""
    out: dict[str, np.ndarray] = {}
    enc = "segformer.encoder"

    def put_dense(key, w, b):
        out[key + ".weight"] = np.transpose(np.asarray(w))
        out[key + ".bias"] = np.asarray(b)

    def put_ln(key, p):
        out[key + ".weight"] = np.asarray(p["scale"])
        out[key + ".bias"] = np.asarray(p["bias"])

    for s in range(4):
        st = params[f"stage{s + 1}"]
        pe = f"{enc}.patch_embeddings.{s}"
        _put_conv(out, f"{pe}.proj", st["patch_conv"])
        out[f"{pe}.proj.bias"] = np.asarray(st["patch_bias"])
        put_ln(f"{pe}.layer_norm", st["patch_ln"])
        put_ln(f"{enc}.layer_norm.{s}", st["out_ln"])
        for j, blk in enumerate(st["blocks"]):
            pre = f"{enc}.block.{s}.{j}"
            att = f"{pre}.attention"
            put_ln(f"{pre}.layer_norm_1", blk["ln1"])
            put_dense(f"{att}.self.query", blk["q"], blk["q_b"])
            d = np.asarray(blk["kv"]).shape[0]
            put_dense(f"{att}.self.key", blk["kv"][:, :d], blk["kv_b"][:d])
            put_dense(f"{att}.self.value", blk["kv"][:, d:], blk["kv_b"][d:])
            put_dense(f"{att}.output.dense", blk["proj"], blk["proj_b"])
            if "sr_conv" in blk:
                _put_conv(out, f"{att}.self.sr", blk["sr_conv"])
                out[f"{att}.self.sr.bias"] = np.asarray(blk["sr_bias"])
                put_ln(f"{att}.self.layer_norm", blk["sr_ln"])
            put_ln(f"{pre}.layer_norm_2", blk["ln2"])
            put_dense(f"{pre}.mlp.dense1", blk["fc1"], blk["fc1_b"])
            _put_conv(out, f"{pre}.mlp.dwconv.dwconv", blk["dw"])
            out[f"{pre}.mlp.dwconv.dwconv.bias"] = np.asarray(blk["dw_b"])
            put_dense(f"{pre}.mlp.dense2", blk["fc2"], blk["fc2_b"])
    head = params["head"]
    dec = "decode_head"
    for s in range(4):
        put_dense(f"{dec}.linear_c.{s}.proj", head["lin"][s], head["lin_b"][s])
    _put_conv(out, f"{dec}.linear_fuse", head["fuse"])
    _put_bn(out, f"{dec}.batch_norm", head["fuse_bn"])
    _put_conv(out, f"{dec}.classifier", head["cls"])
    out[f"{dec}.classifier.bias"] = np.asarray(head["cls_b"])
    return out


# ---------------------------------------------------------------------------
# Inverse direction (params pytree -> torch-style state dict)
# ---------------------------------------------------------------------------

def _put_conv(out: dict, key: str, w_hwio) -> None:
    out[key + ".weight"] = np.transpose(np.asarray(w_hwio), (3, 2, 0, 1))


def _put_bn(out: dict, key: str, bn: Mapping[str, Any]) -> None:
    for ours, theirs in _BN_MAP:
        out[f"{key}.{theirs}"] = np.asarray(bn[ours])
    out[key + _IGNORED_SUFFIX] = np.asarray(0, np.int64)


def _backbone_to(params: Mapping[str, Any], out: dict) -> None:
    _put_conv(out, "backbone.conv1", params["stem_conv"])
    _put_bn(out, "backbone.bn1", params["stem_bn"])
    for li in range(4):
        for bi, blk in enumerate(params[f"layer{li + 1}"]):
            pre = f"backbone.layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                _put_conv(out, f"{pre}.conv{ci}", blk[f"conv{ci}"])
                _put_bn(out, f"{pre}.bn{ci}", blk[f"bn{ci}"])
            if "down_conv" in blk:
                _put_conv(out, f"{pre}.downsample.0", blk["down_conv"])
                _put_bn(out, f"{pre}.downsample.1", blk["down_bn"])


def _fcn_head_to(head: Mapping[str, Any], prefix: str, out: dict) -> None:
    _put_conv(out, f"{prefix}.0", head["conv1"])
    _put_bn(out, f"{prefix}.1", head["bn1"])
    _put_conv(out, f"{prefix}.4", head["conv2"])
    out[f"{prefix}.4.bias"] = np.asarray(head["bias2"])


def fcn_resnet50_to_torch_state(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _backbone_to(params, out)
    _fcn_head_to(params["head"], "classifier", out)
    if "aux_head" in params:
        _fcn_head_to(params["aux_head"], "aux_classifier", out)
    return out


def lraspp_mobilenet_v3_to_torch_state(params: Mapping[str, Any]
                                       ) -> dict[str, np.ndarray]:
    from infur_tpu.models.lraspp_mobilenetv3 import _CONF

    out: dict[str, np.ndarray] = {}
    _put_conv(out, "backbone.0.0", params["stem_conv"])
    _put_bn(out, "backbone.0.1", params["stem_bn"])
    for i, ((cin, _k, exp, _cout, se, _act, _s, _d), blk) in enumerate(
            zip(_CONF, params["blocks"])):
        pre = f"backbone.{i + 1}.block"
        j = 0
        if exp != cin:
            _put_conv(out, f"{pre}.{j}.0", blk["exp_conv"])
            _put_bn(out, f"{pre}.{j}.1", blk["exp_bn"])
            j += 1
        _put_conv(out, f"{pre}.{j}.0", blk["dw_conv"])
        _put_bn(out, f"{pre}.{j}.1", blk["dw_bn"])
        j += 1
        if se:
            _put_conv(out, f"{pre}.{j}.fc1", blk["se"]["fc1"])
            out[f"{pre}.{j}.fc1.bias"] = np.asarray(blk["se"]["fc1_b"])
            _put_conv(out, f"{pre}.{j}.fc2", blk["se"]["fc2"])
            out[f"{pre}.{j}.fc2.bias"] = np.asarray(blk["se"]["fc2_b"])
            j += 1
        _put_conv(out, f"{pre}.{j}.0", blk["proj_conv"])
        _put_bn(out, f"{pre}.{j}.1", blk["proj_bn"])
    _put_conv(out, "backbone.16.0", params["last_conv"])
    _put_bn(out, "backbone.16.1", params["last_bn"])
    head = params["head"]
    _put_conv(out, "classifier.cbr.0", head["cbr_conv"])
    _put_bn(out, "classifier.cbr.1", head["cbr_bn"])
    _put_conv(out, "classifier.scale.1", head["scale_conv"])
    _put_conv(out, "classifier.low_classifier", head["low_cls"])
    out["classifier.low_classifier.bias"] = np.asarray(head["low_cls_b"])
    _put_conv(out, "classifier.high_classifier", head["high_cls"])
    out["classifier.high_classifier.bias"] = np.asarray(head["high_cls_b"])
    return out


def deeplabv3_resnet50_to_torch_state(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _backbone_to(params, out)
    aspp = params["aspp"]
    _put_conv(out, "classifier.0.convs.0.0", aspp["b0_conv"])
    _put_bn(out, "classifier.0.convs.0.1", aspp["b0_bn"])
    for i in range(3):
        _put_conv(out, f"classifier.0.convs.{i + 1}.0", aspp[f"b{i + 1}_conv"])
        _put_bn(out, f"classifier.0.convs.{i + 1}.1", aspp[f"b{i + 1}_bn"])
    _put_conv(out, "classifier.0.convs.4.1", aspp["pool_conv"])
    _put_bn(out, "classifier.0.convs.4.2", aspp["pool_bn"])
    _put_conv(out, "classifier.0.project.0", aspp["proj_conv"])
    _put_bn(out, "classifier.0.project.1", aspp["proj_bn"])
    _put_conv(out, "classifier.1", aspp["cls_conv"])
    _put_bn(out, "classifier.2", aspp["cls_bn"])
    _put_conv(out, "classifier.4", aspp["cls"])
    out["classifier.4.bias"] = np.asarray(aspp["cls_b"])
    if "aux_head" in params:
        _fcn_head_to(params["aux_head"], "aux_classifier", out)
    return out


# ---------------------------------------------------------------------------
# File loading + family dispatch
# ---------------------------------------------------------------------------

_FROM_TORCH = {
    "fcn_resnet50": fcn_resnet50_from_torch_state,
    "deeplabv3": deeplabv3_resnet50_from_torch_state,
    "deeplabv3_resnet50": deeplabv3_resnet50_from_torch_state,
    "lraspp": lraspp_mobilenet_v3_from_torch_state,
    "lraspp_mobilenet_v3_large": lraspp_mobilenet_v3_from_torch_state,
    "segformer": segformer_from_hf_state,
}


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a torchvision-style state dict from ``.pt``/``.pth`` (via torch)
    or ``.npz`` (keys = state-dict names)."""
    if path.endswith((".pt", ".pth")):
        import torch  # CPU torch is in the base image
        obj = torch.load(path, map_location="cpu", weights_only=True)
        state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        return {k: _to_np(v) for k, v in state.items()}
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def looks_like_torch_state(flat: Mapping[str, Any]) -> bool:
    return ("backbone.conv1.weight" in flat        # ResNet backbones
            or "backbone.0.0.weight" in flat       # MobileNetV3 backbone
            or "segformer.encoder.patch_embeddings.0.proj.weight" in flat)


def params_from_torch_checkpoint(family: str, path: str) -> dict[str, Any]:
    if family not in _FROM_TORCH:
        raise TorchStateDictError(
            f"no torchvision mapping for family {family!r} "
            f"(have: {sorted(_FROM_TORCH)})")
    return _FROM_TORCH[family](load_torch_checkpoint(path))
