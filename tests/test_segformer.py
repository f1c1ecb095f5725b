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


class TestHuggingFaceParity:
    """Independent semantic ground truth for the SegFormer family: the
    HuggingFace transformers implementation (in-env, random-init — no
    network), connected via the segformer_from_hf_state name mapping.
    Real zoo weights (nvidia/segformer-*) drop in the moment a file
    exists ('segformer@file' specs)."""

    @staticmethod
    def _hf_model(num_labels=7):
        import torch
        from transformers import (
            SegformerConfig, SegformerForSemanticSegmentation,
        )
        torch.manual_seed(0)
        cfg = SegformerConfig(num_labels=num_labels)  # defaults = MiT-b0
        m = SegformerForSemanticSegmentation(cfg).eval()
        return m

    def test_forward_matches_hf(self, rng):
        import torch
        from infur_tpu.models.segformer import segformer_apply
        from infur_tpu.models.torch_weights import segformer_from_hf_state

        m = self._hf_model()
        params = segformer_from_hf_state(m.state_dict())
        x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            hf_quarter = m(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).logits  # (1, K, H/4, W/4)
            hf = torch.nn.functional.interpolate(
                hf_quarter, size=(64, 96), mode="bilinear",
                align_corners=False).numpy()
        ours = np.asarray(segformer_apply(params, x)["out"])
        np.testing.assert_allclose(ours, hf, atol=2e-4, rtol=2e-4)

    def test_state_round_trip_exact(self):
        from infur_tpu.models.torch_weights import (
            segformer_from_hf_state, segformer_to_hf_state,
        )
        m = self._hf_model()
        state = {k: v.numpy() for k, v in m.state_dict().items()}
        params = segformer_from_hf_state(state)
        back = segformer_to_hf_state(params)
        assert set(back) == set(state)
        for k in state:
            np.testing.assert_array_equal(np.asarray(back[k], np.float32),
                                          np.asarray(state[k], np.float32),
                                          err_msg=k)

    def test_model_stage_loads_hf_npz(self, tmp_path):
        """segformer@hf.npz: the checkpoint path end to end."""
        from infur_tpu.model_stage import Load, ModelStage
        m = self._hf_model(num_labels=3)
        state = {k: v.numpy() for k, v in m.state_dict().items()}
        p = tmp_path / "hf_segformer.npz"
        np.savez(p, **state)
        st = ModelStage()
        st.control(Load(f"segformer@{p}"))
        assert st._backend.params["head"]["cls_b"].shape == (3,)


def test_hf_mapping_handles_b1_geometry():
    """The mapping infers geometry from tensors — a b1-sized config maps
    and round-trips without naming the variant."""
    import torch
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from infur_tpu.models.torch_weights import (
        segformer_from_hf_state, segformer_to_hf_state,
    )
    torch.manual_seed(1)
    cfg = SegformerConfig(hidden_sizes=[64, 128, 320, 512], num_labels=4)
    m = SegformerForSemanticSegmentation(cfg).eval()
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    params = segformer_from_hf_state(state)
    assert params["stage4"]["patch_conv"].shape[-1] == 512
    assert params["head"]["cls_b"].shape == (4,)
    back = segformer_to_hf_state(params)
    assert set(back) == set(state)
