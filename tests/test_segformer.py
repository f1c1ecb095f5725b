"""SegFormer model family: shape contract, bf16 mode, stage integration."""

import jax
import numpy as np
import pytest

from infur_tpu.models import init_segformer, segformer_apply


@pytest.fixture(scope="module")
def params():
    return init_segformer(jax.random.PRNGKey(0))


def test_output_contract(params):
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    out = segformer_apply(params, x)
    assert set(out) == {"out"}
    assert out["out"].shape == (1, 21, 64, 96)
    assert bool(np.isfinite(np.asarray(out["out"])).all())


def test_bf16_mask_tracks_f32(params):
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    m32 = np.asarray(segformer_apply(params, x)["out"]).argmax(1)
    m16 = np.asarray(segformer_apply(params, x,
                                     compute_dtype="bfloat16")["out"]).argmax(1)
    assert (m32 == m16).mean() > 0.95


def test_batched(params):
    x = np.zeros((2, 32, 32, 3), np.float32)
    out = segformer_apply(params, x)["out"]
    assert out.shape == (2, 21, 32, 32)


def test_model_stage_family():
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.processing import Cell, Frame

    stage = ModelStage()
    stage.control(Load("segformer:b0"))
    info = stage.info()
    assert info.layout == "NHWC" and info.outputs == ("out",)
    frame = Frame(1, np.random.default_rng(0).integers(
        0, 255, (32, 48, 3), dtype=np.uint8))
    cell = Cell()
    stage.advance(frame, cell)
    assert cell.value.primary.shape == (21, 32, 48)
    stage.control(Load(""))  # unload
    assert not stage.loaded


def test_variant_dims():
    p1 = init_segformer(jax.random.PRNGKey(0), variant="b1")
    assert p1["stage1"]["patch_conv"].shape[-1] == 64


def test_unknown_variant_opt_is_typed_error():
    from infur_tpu.errors import ModelLoadError
    from infur_tpu.model_stage import Load, ModelStage
    with pytest.raises(ModelLoadError, match="unknown option"):
        ModelStage().control(Load("segformer:b3"))  # typo'd variant


def test_onnx_export_three_way_parity():
    """Native apply == NumPy oracle == JAX importer on the exported
    static-shape transformer graph (LayerNormalization, batched-MatMul
    attention, Softmax, Gelu-tanh, token<->image plumbing)."""
    import numpy as np
    from infur_tpu.models.segformer import segformer_to_onnx
    from infur_tpu.onnx import import_model, run_model

    p = init_segformer(jax.random.PRNGKey(2), variant="b0")
    model = segformer_to_onnx(p, (64, 64))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    nchw = np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))
    want = np.asarray(segformer_apply(p, x)["out"])
    scale = max(np.abs(want).max(), 1e-6)
    oracle = run_model(model, {"input": nchw})["out"]
    assert np.abs(oracle - want).max() / scale < 1e-4
    got = np.asarray(import_model(model)({"input": nchw})["out"])
    assert np.abs(got - want).max() / scale < 1e-4
