"""Torchvision state-dict mapping: round trips, layout pins, and an
independent torch.nn.functional forward as semantic ground truth.

The reference's tests run the actual zoo model
(/root/reference/infur-test-gen/build.rs:88-93); with no network the name
mapping is proven against a synthetically-keyed state dict (VERDICT r1 §3)
and the architecture is proven against torch's own operator semantics, so
real ``fcn_resnet50-*.pth`` weights drop in unchanged.
"""

import numpy as np
import jax
import pytest

from infur_tpu.models import init_fcn_resnet50, fcn_resnet50_apply
from infur_tpu.models.deeplabv3 import init_deeplabv3_resnet50
from infur_tpu.models.torch_weights import (
    TorchStateDictError,
    deeplabv3_resnet50_from_torch_state,
    deeplabv3_resnet50_to_torch_state,
    fcn_resnet50_from_torch_state,
    fcn_resnet50_to_torch_state,
)


def tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, list):
        assert len(a) == len(b)
        for i, (x, y) in enumerate(zip(a, b)):
            tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


@pytest.fixture(scope="module")
def fcn_params():
    return init_fcn_resnet50(jax.random.PRNGKey(7))


def test_fcn_round_trip_exact(fcn_params):
    state = fcn_resnet50_to_torch_state(fcn_params)
    back = fcn_resnet50_from_torch_state(state)
    tree_equal(jax.tree.map(np.asarray, fcn_params), back)


def test_deeplabv3_round_trip_exact():
    params = init_deeplabv3_resnet50(jax.random.PRNGKey(8))
    state = deeplabv3_resnet50_to_torch_state(params)
    back = deeplabv3_resnet50_from_torch_state(state)
    tree_equal(jax.tree.map(np.asarray, params), back)


def test_fcn_state_dict_layout(fcn_params):
    """Pin the torchvision fcn_resnet50 key layout: exact count and
    independently-known literal names."""
    state = fcn_resnet50_to_torch_state(fcn_params)
    # torchvision fcn_resnet50(aux_loss=True).state_dict() has 334 entries:
    # resnet50 backbone without fc = 318 (conv1 + bn1x5 + 16 bottlenecks x18
    # + 4 downsamples x6), FCNHead 8, aux FCNHead 8
    assert len(state) == 334, len(state)
    for key in (
        "backbone.conv1.weight",
        "backbone.bn1.running_var",
        "backbone.layer1.0.downsample.0.weight",
        "backbone.layer1.0.downsample.1.running_mean",
        "backbone.layer3.5.conv2.weight",
        "backbone.layer4.2.bn3.num_batches_tracked",
        "classifier.0.weight",
        "classifier.1.bias",
        "classifier.4.weight",
        "classifier.4.bias",
        "aux_classifier.0.weight",
        "aux_classifier.4.bias",
    ):
        assert key in state, key
    # weight layout is torch OIHW
    assert state["backbone.conv1.weight"].shape == (64, 3, 7, 7)
    assert state["classifier.0.weight"].shape == (512, 2048, 3, 3)
    assert state["classifier.4.weight"].shape == (21, 512, 1, 1)
    assert state["aux_classifier.0.weight"].shape == (256, 1024, 3, 3)


def test_missing_and_extra_keys_error(fcn_params):
    state = fcn_resnet50_to_torch_state(fcn_params)
    del state["backbone.layer2.1.conv2.weight"]
    with pytest.raises(TorchStateDictError, match="missing key"):
        fcn_resnet50_from_torch_state(state)
    state = fcn_resnet50_to_torch_state(fcn_params)
    state["fc.weight"] = np.zeros((10, 10), np.float32)
    with pytest.raises(TorchStateDictError, match="unexpected"):
        fcn_resnet50_from_torch_state(state)


def _torch_fcn_forward(state, x_np):
    """Independent FCN-ResNet50 forward with torch.nn.functional — the
    operator semantics torchvision itself is built from."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}

    def bn(x, p):
        return F.batch_norm(x, t[p + ".running_mean"], t[p + ".running_var"],
                            t[p + ".weight"], t[p + ".bias"], False, 0.0, 1e-5)

    def conv(x, key, stride=1, dilation=1, bias=None):
        w = t[key + ".weight"]
        pad = dilation * (w.shape[2] - 1) // 2
        return F.conv2d(x, w, bias, stride, pad, dilation)

    x = torch.from_numpy(x_np)
    x = F.relu(bn(conv(x, "backbone.conv1", stride=2), "backbone.bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    feats = {}
    for li, (blocks, stride, dil) in enumerate(
            ((3, 1, 1), (4, 2, 1), (6, 1, 2), (3, 1, 4)), start=1):
        for bi in range(blocks):
            pre = f"backbone.layer{li}.{bi}"
            s = stride if bi == 0 else 1
            d_first = max(dil // 2, 1) if (stride == 1 and dil > 1) else 1
            d = d_first if bi == 0 else dil
            idn = x
            y = F.relu(bn(conv(x, pre + ".conv1"), pre + ".bn1"))
            y = F.relu(bn(conv(y, pre + ".conv2", s, d), pre + ".bn2"))
            y = bn(conv(y, pre + ".conv3"), pre + ".bn3")
            if pre + ".downsample.0.weight" in t:
                idn = bn(F.conv2d(x, t[pre + ".downsample.0.weight"],
                                  None, s), pre + ".downsample.1")
            x = F.relu(idn + y)
        feats[li] = x

    def head(x, pre):
        y = F.relu(bn(conv(x, pre + ".0"), pre + ".1"))
        return conv(y, pre + ".4", bias=t[pre + ".4.bias"])

    hw = x_np.shape[2:]
    out = F.interpolate(head(feats[4], "classifier"), size=hw,
                        mode="bilinear", align_corners=False)
    aux = F.interpolate(head(feats[3], "aux_classifier"), size=hw,
                        mode="bilinear", align_corners=False)
    return out.numpy(), aux.numpy()


def test_fcn_apply_matches_torch_functional(fcn_params):
    """Name-mapped weights through OUR apply == the same weights through
    torch's operators, on an odd-sized input (exercises padding rules)."""
    state = fcn_resnet50_to_torch_state(fcn_params)
    rng = np.random.default_rng(0)
    # normalized-image-scale input, odd H/W to catch padding asymmetries
    x_nchw = rng.normal(0, 1, (1, 3, 49, 63)).astype(np.float32)
    want_out, want_aux = _torch_fcn_forward(state, x_nchw)

    got = fcn_resnet50_apply(fcn_params, np.transpose(x_nchw, (0, 2, 3, 1)))
    got_out, got_aux = np.asarray(got["out"]), np.asarray(got["aux"])
    assert got_out.shape == want_out.shape == (1, 21, 49, 63)
    for g, w in ((got_out, want_out), (got_aux, want_aux)):
        scale = max(float(np.abs(w).max()), 1.0)
        np.testing.assert_allclose(g, w, atol=5e-3 * scale, rtol=0)
        assert (g.argmax(1) == w.argmax(1)).mean() > 0.999


def test_family_spec_loads_torch_npz(tmp_path, fcn_params):
    """``fcn_resnet50@state.npz`` with torchvision keys loads via the name
    map and reproduces fcn_resnet50_apply outputs exactly."""
    from infur_tpu.model_stage import _open_backend

    state = fcn_resnet50_to_torch_state(fcn_params)
    path = tmp_path / "torch_state.npz"
    np.savez(path, **state)
    backend = _open_backend(f"fcn_resnet50@{path}")
    x = np.zeros((1, 32, 32, 3), np.float32)
    got = backend(x)
    want = fcn_resnet50_apply(fcn_params, x)
    np.testing.assert_array_equal(np.asarray(got["out"]),
                                  np.asarray(want["out"]))
