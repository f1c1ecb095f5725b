"""Round-3 regressions: ADVICE r2 fixes + VERDICT r2 items
(calib= real-frame int8 calibration, mesh= serving for every family with
loud non-divisible-H handling, seek/step id convention)."""

import warnings

import numpy as np
import pytest

from infur_tpu.errors import ModelLoadError
from infur_tpu.model_stage import Load, ModelStage, _calib_frames
from infur_tpu.processing import Cell, Frame, Play, Seek, Step, VideoPlayer


# ---------------------------------------------------------------------------
# ADVICE r2: seek/step id convention


def test_step_back_right_after_seek(small_clip):
    """A Step(-n) issued between a Seek and the next advance must compute
    its target in the same 1-based convention advance maintains
    (ADVICE r2: the stored 0-based landed index was one frame off)."""
    path, spec, _ = small_clip
    p = VideoPlayer()
    p.control(Play((path,)))
    cell = Cell()

    # establish the post-advance behavior first: advance to id 6, step -2
    p.control(Seek(5 / spec.fps))          # land so next read produces id 6
    assert p.advance(None, cell)
    assert cell.value.id == 6
    p.control(Step(-2))
    assert p.advance(None, cell)
    post_advance_id = cell.value.id        # spec behavior: 6 - 2 = 4
    assert post_advance_id == 4

    # now the regression: Seek then Step(-2) with NO advance in between
    # must land on the same frame the post-advance path computes
    p.control(Seek(5 / spec.fps))
    p.control(Step(-2))
    assert p.advance(None, cell)
    assert cell.value.id == post_advance_id
    p.close()


def test_evaluate_empty_data_is_typed():
    from infur_tpu.train import evaluate

    with pytest.raises(ValueError, match="no batches"):
        evaluate(lambda p, x: {"out": x}, None, [])


# ---------------------------------------------------------------------------
# VERDICT r2 #2: calib= spec query (real-frame int8 calibration)


def test_calib_frames_from_synth():
    samples = _calib_frames("synth:64x48@10:1.0", n=3, hw=(32, 32))
    assert len(samples) == 3
    for x in samples:
        assert x.shape == (1, 3, 32, 32) and x.dtype == np.float32
    # normalized real frames, not noise: values inside imagenet-normalized
    # range and distinct across frames
    assert np.abs(samples[0]).max() < 3.5
    assert not np.allclose(samples[0], samples[1])


def test_calib_frames_from_rvf(small_clip):
    path, _, _ = small_clip
    samples = _calib_frames(path, n=2, hw=(24, 24))
    assert len(samples) == 2 and samples[0].shape == (1, 3, 24, 24)


def test_calib_requires_int8():
    st = ModelStage()
    with pytest.raises(ModelLoadError, match="only meaningful"):
        st.control(Load("fcn_resnet50?calib=synth:32x32@10:1"))


def test_calib_rejected_for_onnx_backend(tmp_path):
    from infur_tpu.onnx import GraphBuilder, save_model

    g = GraphBuilder("m")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    y = g.node("Relu", [x])
    g.output(y, np.float32, (1, 3, 8, 8))
    path = tmp_path / "m.onnx"
    save_model(g.model(), str(path))
    st = ModelStage()
    with pytest.raises(ModelLoadError, match="native-family"):
        st.control(Load(f"{path}?calib=synth:32x32@10:1"))


def test_calib_bad_source_is_typed():
    st = ModelStage()
    with pytest.raises(ModelLoadError, match="calib"):
        st.control(Load("lraspp:int8?calib=/does/not/exist.rvf"))


def test_int8_with_real_calibration_runs(small_clip):
    """lraspp:int8?calib=<clip> quantizes on decoded frames and serves."""
    path, _, _ = small_clip
    st = ModelStage()
    st.control(Load(f"lraspp:int8?calib={path}"))
    cell = Cell()
    st.advance(Frame(1, np.zeros((48, 64, 3), np.uint8)), cell)
    out = np.asarray(cell.value.outputs["out"])
    assert out.shape[1:] == (48, 64) and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# VERDICT r2 #4: mesh= serving for non-FCN families + loud non-divisible H


def test_shard_params_covers_dense():
    """The generic rule shards dense (in, out) kernels over model."""
    import jax
    from jax.sharding import PartitionSpec as P

    from infur_tpu.parallel import make_mesh, shard_params

    mesh = make_mesh(4, model_axis=2)
    params = {"dense": {"kernel": np.zeros((8, 4), np.float32),
                        "bias": np.zeros((4,), np.float32)},
              "head": {"kernel": np.zeros((8, 21), np.float32)}}
    sh = shard_params(params, mesh)
    assert sh["dense"]["kernel"].spec == P(None, "model")
    assert sh["dense"]["bias"].spec == P("model")
    assert sh["head"]["kernel"].spec == P()  # 21 doesn't divide 2
    del jax


def test_segformer_mesh_serving():
    st = ModelStage()
    st.control(Load("segformer:b0:mesh=2x2"))
    cell = Cell()
    st.advance(Frame(1, np.zeros((32, 32, 3), np.uint8)), cell)
    out = np.asarray(cell.value.outputs["out"])
    assert out.shape[1:] == (32, 32) and np.isfinite(out).all()


def test_mesh_nondivisible_h_pads_loudly():
    st = ModelStage()
    st.control(Load("fcn_resnet50:mesh=1x2"))
    cell = Cell()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        st.advance(Frame(1, np.zeros((31, 32, 3), np.uint8)), cell)
    out = np.asarray(cell.value.outputs["out"])
    assert out.shape[1:] == (31, 32) and np.isfinite(out).all()
    assert any("not divisible" in str(w.message) for w in caught)


def test_mesh_pad_crop_matches_unsharded():
    """Sharded pad+crop == the unsharded forward on the SAME padded input,
    cropped — isolates the GSPMD sharding (which must be numerically
    faithful) from the documented padding semantics (padding changes the
    backbone grid, so comparing against the unpadded forward would conflate
    the two)."""
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 255, size=(31, 32, 3)).astype(np.uint8)

    st = ModelStage()
    st.control(Load("fcn_resnet50:mesh=1x2"))
    cell = Cell()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st.advance(Frame(1, frame.copy()), cell)
    sharded = np.asarray(cell.value.outputs["out"])
    assert sharded.shape[1:] == (31, 32)

    padded = np.pad(frame, ((0, 1), (0, 0), (0, 0)), mode="edge")
    st2 = ModelStage()
    st2.control(Load("fcn_resnet50"))
    cell2 = Cell()
    st2.advance(Frame(1, padded), cell2)
    plain = np.asarray(cell2.value.outputs["out"])[:, :31, :]
    np.testing.assert_allclose(sharded, plain, rtol=2e-4, atol=2e-4)


def test_flashp_spec_serves():
    """segformer:b0:flashp (head-packed Pallas attention) loads and runs
    through the standard ModelStage (CPU falls back to interpret mode)."""
    st = ModelStage()
    st.control(Load("segformer:b0:flashp"))
    cell = Cell()
    st.advance(Frame(1, np.zeros((32, 32, 3), np.uint8)), cell)
    out = np.asarray(cell.value.outputs["out"])
    assert out.shape[1:] == (32, 32) and np.isfinite(out).all()

    st2 = ModelStage()
    st2.control(Load("segformer:b0"))
    cell2 = Cell()
    st2.advance(Frame(1, np.zeros((32, 32, 3), np.uint8)), cell2)
    np.testing.assert_allclose(out, np.asarray(cell2.value.outputs["out"]),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ADVICE r2: viewer upload cleanup + stale chips (unit level)


def test_config_persists_viewer_ui_state(tmp_path):
    """softmax checkbox + last seek persist and replay as commands
    (VERDICT r2 #8: the whole surface restores like eframe storage)."""
    from infur_tpu.app import ColorCmd
    from infur_tpu.processing import Seek
    from infur_tpu.runtime.config import ProcConfig

    cfg = ProcConfig(video_input=["synth:32x24@10:1"], softmax=True,
                     seek_secs=2.5)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    back = ProcConfig.load(path)
    assert back.softmax is True and back.seek_secs == 2.5
    cmds = back.commands()
    seeks = [c for c in cmds if isinstance(c, Seek)]
    colors = [c for c in cmds if isinstance(c, ColorCmd)]
    assert seeks and seeks[0].seconds == 2.5
    assert colors and colors[0].softmax is True
    # seek replays after Play (a seek needs an open video)
    from infur_tpu.processing import Play
    assert cmds.index(seeks[0]) > cmds.index(
        next(c for c in cmds if isinstance(c, Play)))


def test_viewer_set_upload_unlinks_previous(tmp_path):
    from infur_tpu.viewer import ViewerState

    class _H:  # minimal handle stand-in
        def send(self, *a, **k):
            pass

    st = ViewerState.__new__(ViewerState)
    import threading
    st.lock = threading.Lock()
    st.upload_path = None
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    a.write_bytes(b"x")
    b.write_bytes(b"y")
    st.set_upload(str(a))
    assert a.exists()
    st.set_upload(str(b))
    assert not a.exists() and b.exists()
    st.set_upload(None)
    assert not b.exists()
