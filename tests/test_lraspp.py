"""LRASPP-MobileNetV3-Large: family contract, torchvision state-dict
round trip, and an independent torch.nn.functional forward as semantic
ground truth (same strategy as test_torch_weights.py — no network, so the
architecture is proven against torch's own operator semantics and real zoo
``.pth`` weights drop in unchanged)."""

import jax
import numpy as np
import pytest

from infur_tpu.models.lraspp_mobilenetv3 import (
    _CONF, _make_divisible, init_lraspp_mobilenet_v3_large, lraspp_apply,
)
from infur_tpu.models.torch_weights import (
    lraspp_mobilenet_v3_from_torch_state, lraspp_mobilenet_v3_to_torch_state,
)


@pytest.fixture(scope="module")
def params():
    return init_lraspp_mobilenet_v3_large(jax.random.PRNGKey(11))


def test_make_divisible_matches_torchvision():
    # hand-checked against torchvision._utils._make_divisible
    assert _make_divisible(72 // 4) == 24
    assert _make_divisible(120 // 4) == 32
    assert _make_divisible(480 // 4) == 120
    assert _make_divisible(672 // 4) == 168
    assert _make_divisible(960 // 4) == 240


def test_output_contract(params):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    out = lraspp_apply(params, x)
    assert set(out) == {"out"}
    assert out["out"].shape == (1, 21, 64, 96)
    assert out["out"].dtype == np.float32
    assert np.isfinite(np.asarray(out["out"])).all()


def test_bf16_mode_runs(params):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = lraspp_apply(params, x, compute_dtype="bfloat16")
    assert out["out"].dtype == np.float32
    assert np.isfinite(np.asarray(out["out"])).all()


def test_round_trip_exact(params):
    state = lraspp_mobilenet_v3_to_torch_state(params)
    back = lraspp_mobilenet_v3_from_torch_state(state)

    def eq(a, b, path=""):
        if isinstance(a, dict):
            assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
            for k in a:
                eq(a[k], b[k], f"{path}/{k}")
        elif isinstance(a, list):
            assert len(a) == len(b)
            for i, (x, y) in enumerate(zip(a, b)):
                eq(x, y, f"{path}[{i}]")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)

    eq(jax.tree.map(np.asarray, params), back)


def test_state_dict_layout(params):
    """Pin the torchvision lraspp_mobilenet_v3_large key layout."""
    state = lraspp_mobilenet_v3_to_torch_state(params)
    for key in (
        "backbone.0.0.weight",
        "backbone.0.1.running_var",
        "backbone.1.block.0.0.weight",        # no expand: dw is block.0
        "backbone.2.block.0.0.weight",        # expand
        "backbone.4.block.2.fc1.weight",      # SE after expand+dw
        "backbone.4.block.2.fc2.bias",
        "backbone.4.block.3.0.weight",        # project after SE
        "backbone.7.block.2.0.weight",        # project w/o SE
        "backbone.13.block.1.0.weight",       # dilated block depthwise
        "backbone.16.0.weight",
        "classifier.cbr.0.weight",
        "classifier.cbr.1.running_mean",
        "classifier.scale.1.weight",
        "classifier.low_classifier.weight",
        "classifier.high_classifier.bias",
    ):
        assert key in state, key
    # OIHW layouts
    assert state["backbone.0.0.weight"].shape == (16, 3, 3, 3)
    assert state["backbone.1.block.0.0.weight"].shape == (16, 1, 3, 3)
    assert state["backbone.4.block.2.fc1.weight"].shape == (24, 72, 1, 1)
    assert state["backbone.16.0.weight"].shape == (960, 160, 1, 1)
    assert state["classifier.low_classifier.weight"].shape == (21, 40, 1, 1)
    # no sigmoid-branch bias, no BN on classifiers
    assert "classifier.scale.1.bias" not in state


def _torch_lraspp_forward(state, x_np):
    """Independent LRASPP forward with torch.nn.functional only."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}

    def bn(x, p):
        return F.batch_norm(x, t[p + ".running_mean"], t[p + ".running_var"],
                            t[p + ".weight"], t[p + ".bias"], False, 0.0, 1e-5)

    def conv(x, key, stride=1, dilation=1, groups=1, bias=False):
        w = t[key + ".weight"]
        b = t.get(key + ".bias") if bias else None
        pad = dilation * (w.shape[2] - 1) // 2
        return F.conv2d(x, w, b, stride, pad, dilation, groups)

    def act(x, kind):
        return F.relu(x) if kind == "RE" else F.hardswish(x)

    x = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))).contiguous()
    x = F.hardswish(bn(conv(x, "backbone.0.0", stride=2), "backbone.0.1"))
    low = None
    for i, (cin, _k, exp, cout, se, a, stride, dil) in enumerate(_CONF):
        pre = f"backbone.{i + 1}.block"
        j = 0
        y = x
        if exp != cin:
            y = act(bn(conv(y, f"{pre}.{j}.0"), f"{pre}.{j}.1"), a)
            j += 1
        s = 1 if dil > 1 else stride
        y = act(bn(conv(y, f"{pre}.{j}.0", stride=s, dilation=dil,
                        groups=y.shape[1]), f"{pre}.{j}.1"), a)
        j += 1
        if se:
            sq = F.adaptive_avg_pool2d(y, 1)
            sq = F.relu(conv(sq, f"{pre}.{j}.fc1", bias=True))
            sq = F.hardsigmoid(conv(sq, f"{pre}.{j}.fc2", bias=True))
            y = y * sq
            j += 1
        y = bn(conv(y, f"{pre}.{j}.0"), f"{pre}.{j}.1")
        if stride == 1 and cin == cout:
            y = x + y
        x = y
        if i == 3:
            low = x
    high = F.hardswish(bn(conv(x, "backbone.16.0"), "backbone.16.1"))

    y = F.relu(bn(conv(high, "classifier.cbr.0"), "classifier.cbr.1"))
    s = torch.sigmoid(conv(F.adaptive_avg_pool2d(high, 1),
                           "classifier.scale.1"))
    y = y * s
    y = F.interpolate(y, size=low.shape[-2:], mode="bilinear",
                      align_corners=False)
    lo = conv(low, "classifier.low_classifier", bias=True)
    hi = conv(y, "classifier.high_classifier", bias=True)
    out = F.interpolate(lo + hi, size=x_np.shape[1:3], mode="bilinear",
                        align_corners=False)
    return out.numpy()


def test_forward_matches_torch_functional(params):
    """Semantic ground truth: our JAX forward == an independently-written
    torch.nn.functional forward of the same state dict."""
    state = lraspp_mobilenet_v3_to_torch_state(params)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    ref = _torch_lraspp_forward(state, x)
    got = np.asarray(lraspp_apply(params, x)["out"])
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_model_stage_family():
    from infur_tpu.model_stage import _open_backend
    import jax.numpy as jnp
    be = _open_backend("lraspp")
    assert be.output_names == ("out",)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    outs = be(jnp.asarray(x))
    assert outs["out"].shape == (1, 21, 32, 32)


def test_checkpoint_spec_roundtrip(tmp_path, params):
    """family@file ingest: a torch-style npz state dict loads through the
    spec grammar and reproduces lraspp_apply outputs exactly."""
    from infur_tpu.model_stage import _open_backend
    import jax.numpy as jnp
    state = lraspp_mobilenet_v3_to_torch_state(params)
    path = tmp_path / "lraspp_state.npz"
    np.savez(path, **state)
    be = _open_backend(f"lraspp@{path}")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(lraspp_apply(params, x)["out"])
    got = np.asarray(be(jnp.asarray(x))["out"])
    np.testing.assert_array_equal(ref, got)

def test_onnx_export_oracle_and_import_parity(params):
    """Native NHWC apply == NumPy-oracle(exported ONNX) == imported-JAX
    apply — the three-way check every exporting family gets; exercises
    HardSwish/HardSigmoid/grouped-Conv/Sigmoid-gating in the owned ONNX
    stack."""
    from infur_tpu.models.lraspp_mobilenetv3 import lraspp_to_onnx
    from infur_tpu.onnx import import_model, run_model

    model = lraspp_to_onnx(params)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    nchw = np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))
    want = np.asarray(lraspp_apply(params, x)["out"])
    oracle = run_model(model, {"input": nchw})["out"]
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(oracle - want).max() / scale < 2e-3
    imported = import_model(model)
    got = np.asarray(imported({"input": nchw})["out"])
    assert np.abs(got - want).max() / scale < 2e-3
