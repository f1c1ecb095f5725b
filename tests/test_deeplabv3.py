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
