"""Runtime pieces: metrics, config persistence/replay, checkpoints, model
stage heuristic."""

import numpy as np
import pytest

from infur_tpu.errors import ModelInputFormatError
from infur_tpu.model_stage import infer_sig_preproc
from infur_tpu.runtime.checkpoint import load_params, save_params
from infur_tpu.runtime.config import ProcConfig
from infur_tpu.runtime.metrics import FrameCounter


# -- input-format heuristic (reference predict_onnx.rs:223-265) -------------

def test_heuristic_nchw_float():
    pp = infer_sig_preproc((1, 3, 224, 224), np.dtype(np.float32), (10, 10))
    assert pp.layout == "NCHW" and pp.dtype == "f32" and pp.channel_order == "rgb"
    assert pp.mean == (0.485, 0.456, 0.406)


def test_heuristic_nhwc_uint8():
    pp = infer_sig_preproc((1, None, None, 3), np.dtype(np.uint8), (10, 10))
    assert pp.layout == "NHWC" and pp.dtype == "u8" and pp.channel_order == "bgr"


def test_heuristic_rejects_bad_rank_and_no_color_axis():
    with pytest.raises(ModelInputFormatError):
        infer_sig_preproc((1, 3, 224), np.dtype(np.float32), (10, 10))
    with pytest.raises(ModelInputFormatError):
        infer_sig_preproc((1, 4, 224, 224), np.dtype(np.float32), (10, 10))
    with pytest.raises(ModelInputFormatError):
        infer_sig_preproc((1, 3, 224, 224), np.dtype(np.int16), (10, 10))


# -- FrameCounter (reference gui.rs:26-89) ----------------------------------

def test_frame_counter_counts_drops():
    fc = FrameCounter(window_s=0.0)  # every stats() call closes a window
    fc.count(10)
    fc.count(12)  # ids 10..12 => received 3, shown 2 => 1 drop
    s = fc.stats()
    assert s is not None
    assert round(s.received_fps / s.shown_fps, 2) == 1.5


def test_frame_counter_resets_on_restart():
    fc = FrameCounter(window_s=0.0)
    fc.count(100)
    fc.count(3)  # id went backwards: restart (gui.rs:41-46)
    s = fc.stats()
    assert s is not None and s.drops == 0


# -- config (reference gui.rs:91-103, 148-155) ------------------------------

def test_config_roundtrip_and_replay_order(tmp_path):
    p = str(tmp_path / "cfg.json")
    cfg = ProcConfig(video_input=["synth:8x8@5:1"], scale=0.25, paused=True,
                     model_input="fcn_resnet50")
    cfg.save(p)
    back = ProcConfig.load(p)
    assert back == cfg
    names = [type(c).__name__ for c in back.commands()]
    assert names == ["ScaleCmd", "Play", "Pause", "ModelCmd"]


def test_config_load_missing_gives_defaults(tmp_path):
    cfg = ProcConfig.load(str(tmp_path / "nope.json"))
    assert cfg.scale == 0.5 and cfg.video_input == []


# -- checkpoints ------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    params = {"a": np.arange(6.0).reshape(2, 3),
              "blocks": [{"w": np.ones((2,))}, {"w": np.zeros((3,))}],
              "nested": {"deep": {"x": np.float32(2.5)}}}
    p = str(tmp_path / "ckpt.npz")
    save_params(p, params)
    back = load_params(p)
    np.testing.assert_array_equal(back["a"], params["a"])
    assert isinstance(back["blocks"], list) and len(back["blocks"]) == 2
    np.testing.assert_array_equal(back["blocks"][1]["w"], np.zeros((3,)))
    assert float(back["nested"]["deep"]["x"]) == 2.5


def test_checkpoint_digit_string_dict_keys(tmp_path):
    """Digit-string dict keys must round-trip as a dict, not become a list."""
    params = {"layers": {"0": np.ones(2), "1": np.zeros(3)}}
    p = str(tmp_path / "d.npz")
    save_params(p, params)
    back = load_params(p)
    assert isinstance(back["layers"], dict)
    np.testing.assert_array_equal(back["layers"]["1"], np.zeros(3))


def test_initial_appinfo_announced_without_commands():
    """Frontends get the startup state snapshot before sending anything."""
    from infur_tpu.runtime.loop import start_proc
    h = start_proc()
    r = h.ctrl_result_rx.get(timeout=5)
    assert hasattr(r, "scale")  # an AppInfo, unprompted
    h.stop()


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Sharded-capable orbax backend; load_params auto-detects directories."""
    import jax

    from infur_tpu.runtime.checkpoint import save_params_orbax

    params = {"w": np.arange(12.0).reshape(3, 4),
              "blocks": [{"b": np.ones(2, np.float32)}]}
    params = jax.tree.map(jax.numpy.asarray, params)
    p = str(tmp_path / "orbax_ckpt")
    save_params_orbax(p, params)
    back = load_params(p)  # directory -> orbax path
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(back["blocks"][0]["b"]), np.ones(2))


# -- preprocess override controls (the reference's flagged todos,
#    predict_onnx.rs:285-306: conventions "should become proper controls") --

def test_spec_query_overrides_native_family():
    from infur_tpu.model_stage import Load, ModelStage
    st = ModelStage()
    st.control(Load("lraspp?order=bgr&norm=unit&interp=bilinear"))
    pp = st._backend.preproc((16, 16))
    assert pp.channel_order == "bgr"
    assert pp.mean == (0.0, 0.0, 0.0) and pp.std == (1.0, 1.0, 1.0)
    assert pp.interp == "bilinear"


def test_spec_query_norm_none_gives_raw_bytes_as_float():
    import jax.numpy as jnp
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.ops.preprocess import preprocess
    st = ModelStage()
    st.control(Load("lraspp?norm=none&order=bgr"))
    pp = st._backend.preproc((4, 4))
    frame = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    x = np.asarray(preprocess(jnp.asarray(frame), pp))
    np.testing.assert_allclose(x[0], frame.astype(np.float32),
                               atol=1e-4)  # raw 0..255, BGR untouched


def test_spec_query_explicit_stats_and_errors():
    import pytest
    from infur_tpu.errors import ModelLoadError
    from infur_tpu.model_stage import Load, ModelStage
    st = ModelStage()
    st.control(Load("lraspp?mean=0.5,0.5,0.5&std=0.25,0.25,0.25"))
    pp = st._backend.preproc((8, 8))
    assert pp.mean == (0.5, 0.5, 0.5) and pp.std == (0.25, 0.25, 0.25)
    for bad in ("lraspp?order=abc", "lraspp?norm=zscore",
                "lraspp?mean=1,2", "lraspp?bogus=1", "lraspp?order"):
        with pytest.raises(ModelLoadError):
            ModelStage().control(Load(bad))


def test_spec_query_on_onnx_overrides_heuristic(tmp_path):
    """A float ONNX model is heuristically RGB+imagenet; ?order=bgr&norm=unit
    overrides both (stats flipped is NOT applied — unit is symmetric)."""
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.onnx import GraphBuilder

    g = GraphBuilder("tiny")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    g.output(g.node("Relu", [x], outputs=["out"]), np.float32, (1, 3, 8, 8))
    p = tmp_path / "tiny.onnx"
    p.write_bytes(g.model().encode())
    st = ModelStage()
    st.control(Load(f"{p}?order=bgr&norm=unit"))
    pp = st._backend.preproc((8, 8))
    assert pp.layout == "NCHW" and pp.channel_order == "bgr"
    assert pp.mean == (0.0, 0.0, 0.0)


def test_family_apply_opts_flash():
    """segformer:b0:flash routes the fused Pallas attention kernel;
    families without the opt reject it as a typed error."""
    import pytest
    from infur_tpu.errors import ModelLoadError
    from infur_tpu.model_stage import Load, ModelStage
    st = ModelStage()
    st.control(Load("segformer:b0:flash"))
    assert st._backend.apply_kwargs == {"attn_impl": "flash"}
    with pytest.raises(ModelLoadError):
        ModelStage().control(Load("lraspp:flash"))


def test_metadata_aware_preprocessing(tmp_path):
    """ONNX image-category metadata drives preprocessing (the reference's
    "meta-data aware pre-processing choices" README todo): BitmapPixelFormat
    sets channel order, NominalPixelRange the value mapping; explicit spec
    queries still win."""
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.onnx import GraphBuilder
    from infur_tpu.onnx.proto import load_model

    g = GraphBuilder("meta")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    g.output(g.node("Relu", [x], outputs=["out"]), np.float32, (1, 3, 8, 8))
    model = g.model(metadata={"Image.BitmapPixelFormat": "Bgr8",
                              "Image.NominalPixelRange": "Normalized_1_1"})
    p = tmp_path / "meta.onnx"
    p.write_bytes(model.encode())
    # metadata round-trips the wire format
    assert load_model(str(p)).metadata() == {
        "Image.BitmapPixelFormat": "Bgr8",
        "Image.NominalPixelRange": "Normalized_1_1"}

    st = ModelStage()
    st.control(Load(str(p)))
    pp = st._backend.preproc((8, 8))
    assert pp.channel_order == "bgr"          # metadata beat the heuristic
    assert pp.mean == (0.5, 0.5, 0.5) and pp.std == (0.5, 0.5, 0.5)

    st2 = ModelStage()
    st2.control(Load(f"{p}?order=rgb&norm=unit"))   # query beats metadata
    pp2 = st2._backend.preproc((8, 8))
    assert pp2.channel_order == "rgb"
    assert pp2.mean == (0.0, 0.0, 0.0) and pp2.std == (1.0, 1.0, 1.0)


def test_metadata_nominal_range_0_255(tmp_path):
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.onnx import GraphBuilder
    g = GraphBuilder("meta2")
    x = g.input("x", np.float32, (1, 3, 4, 4))
    g.output(g.node("Relu", [x], outputs=["out"]), np.float32, (1, 3, 4, 4))
    p = tmp_path / "meta2.onnx"
    p.write_bytes(g.model(metadata={
        "Image.NominalPixelRange": "NominalRange_0_255"}).encode())
    st = ModelStage()
    st.control(Load(str(p)))
    pp = st._backend.preproc((4, 4))
    assert pp.mean == (0.0, 0.0, 0.0)
    assert pp.std == (1.0 / 255.0,) * 3  # raw 0..255 floats
