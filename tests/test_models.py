"""FCN-ResNet50: shape contract, native<->ONNX export<->import parity.

The golden shape contract comes from the reference's model test: two outputs
``out``/``aux``, each (1, 21, H, W) f32 at input resolution
(reference infur/src/predict_onnx.rs:371-381).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infur_tpu.models import (
    fcn_resnet50_apply, fcn_resnet50_to_onnx, init_fcn_resnet50,
)
from infur_tpu.onnx import import_model

H, W = 64, 48


@pytest.fixture(scope="module")
def params():
    return init_fcn_resnet50(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def feed(params):
    rng = np.random.default_rng(7)
    return rng.normal(size=(1, H, W, 3)).astype(np.float32)


def test_output_contract(params, feed):
    out = fcn_resnet50_apply(params, feed)
    assert set(out) == {"out", "aux"}
    assert out["out"].shape == (1, 21, H, W)
    assert out["aux"].shape == (1, 21, H, W)
    assert out["out"].dtype == jnp.float32
    assert bool(jnp.isfinite(out["out"]).all())


def test_onnx_roundtrip_parity(params, feed):
    """Native NHWC apply == exported-ONNX-imported NCHW apply."""
    model = fcn_resnet50_to_onnx(params, (H, W))
    imported = import_model(model)
    nchw = np.transpose(feed, (0, 3, 1, 2))
    got = imported({"input": nchw})
    want = fcn_resnet50_apply(params, feed)
    for k in ("out", "aux"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 2e-3, k


def test_bf16_mask_agreement(params, feed):
    """bfloat16 compute keeps the argmax mask close to f32 (perf mode)."""
    f32 = fcn_resnet50_apply(params, feed)["out"]
    bf16 = fcn_resnet50_apply(params, feed, compute_dtype="bfloat16")["out"]
    m32 = np.argmax(np.asarray(f32), axis=1)
    m16 = np.argmax(np.asarray(bf16), axis=1)
    assert (m32 == m16).mean() > 0.98


def test_no_aux_variant():
    params = init_fcn_resnet50(jax.random.PRNGKey(1), num_classes=5, aux=False)
    x = np.zeros((1, 32, 32, 3), np.float32)
    out = fcn_resnet50_apply(params, x)
    assert set(out) == {"out"}
    assert out["out"].shape == (1, 5, 32, 32)
