"""DeepLabV3-ResNet50: contract + family registration."""

import jax
import numpy as np

from infur_tpu.models import deeplabv3_apply, init_deeplabv3_resnet50


def test_output_contract():
    params = init_deeplabv3_resnet50(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(1, 48, 64, 3)).astype(np.float32)
    out = deeplabv3_apply(params, x)
    assert set(out) == {"out", "aux"}
    assert out["out"].shape == (1, 21, 48, 64)
    assert bool(np.isfinite(np.asarray(out["out"])).all())


def test_family_spec():
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.processing import Cell, Frame

    stage = ModelStage()
    stage.control(Load("deeplabv3"))
    frame = Frame(1, np.zeros((32, 32, 3), np.uint8))
    cell = Cell()
    stage.advance(frame, cell)
    assert cell.value.primary.shape == (21, 32, 32)


def test_onnx_roundtrip_parity(rng):
    """Native NHWC apply == exported-ONNX-imported NCHW apply (completes
    the export matrix: all four dense families export)."""
    import jax
    from infur_tpu.models import (
        deeplabv3_apply, deeplabv3_to_onnx, init_deeplabv3_resnet50,
    )
    from infur_tpu.onnx import import_model, run_model

    params = init_deeplabv3_resnet50(jax.random.PRNGKey(4), num_classes=6)
    model = deeplabv3_to_onnx(params)
    x = rng.normal(size=(1, 48, 64, 3)).astype(np.float32)
    nchw = np.transpose(x, (0, 3, 1, 2))
    got = import_model(model)({"input": nchw})
    want = deeplabv3_apply(params, x)
    for k in ("out", "aux"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 2e-3, k
    # oracle agrees too (three-way)
    orc = run_model(model, {"input": nchw})["out"]
    scale = max(np.abs(orc).max(), 1e-6)
    assert np.abs(orc - np.asarray(got["out"])).max() / scale < 2e-3
