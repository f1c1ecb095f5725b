"""App-composite + scheduler behavior, mirroring the reference's app tests
(reference infur/src/app.rs:174-252) driven headlessly through the same
Processor API a GUI would use."""

import queue

import numpy as np
import pytest

from infur_tpu.app import Exit, GUIFrame, ModelCmd, ProcessingApp, ScaleCmd
from infur_tpu.errors import ModelLoadError, ScaleError
from infur_tpu.processing import Pause, Play, Stop
from infur_tpu.runtime.loop import start_proc


def synth(w=64, h=48, fps=10, secs=1.0):
    return [f"synth:{w}x{h}@{fps}:{secs}"]


def test_play_produces_increasing_ids():
    app = ProcessingApp()
    app.control(Play(synth()))
    f1 = app.generate()
    f2 = app.generate()
    assert isinstance(f1, GUIFrame) and isinstance(f2, GUIFrame)
    assert f2.id == f1.id + 1
    assert np.asarray(f1.buffer).shape == (48, 64, 4)
    app.close()


def test_switch_video_then_scale():
    """Reference switch_video_then_scale (app.rs:203-217): dims follow the
    active video, then scale 2x upscales."""
    app = ProcessingApp()
    app.control(Play(synth(32, 24)))
    assert np.asarray(app.generate().buffer).shape == (24, 32, 4)
    app.control(Play(synth(64, 48)))
    assert np.asarray(app.generate().buffer).shape == (48, 64, 4)
    app.control(ScaleCmd(2.0))
    assert np.asarray(app.generate().buffer).shape == (96, 128, 4)
    app.close()


def test_pause_freezes_and_scale_rerenders_same_id():
    """The retained-intermediates contract (app.rs:219-252 / SURVEY §3.3):
    paused -> no new frames; a scale change re-renders the SAME frame id."""
    app = ProcessingApp()
    app.control(Play(synth()))
    first = app.generate()
    app.control(Pause(True))
    assert app.generate() is None          # frozen
    assert not app.is_dirty()
    app.control(ScaleCmd(0.5))
    assert app.is_dirty()                  # scale change marks dirty
    rerendered = app.generate()
    assert rerendered is not None
    assert rerendered.id == first.id       # same frame, recomputed downstream
    assert np.asarray(rerendered.buffer).shape == (24, 32, 4)
    assert app.generate() is None          # still paused, nothing new
    app.control(Pause(False))
    resumed = app.generate()
    assert resumed.id == first.id + 1      # resumes from the next frame
    app.close()


def test_eof_closes_silently_and_retains_last_frame():
    app = ProcessingApp()
    app.control(Play(synth(32, 24, fps=10, secs=0.2)))  # 2 frames
    ids = []
    for _ in range(2):
        f = app.generate()
        ids.append(f.id)
    assert app.generate() is None  # EOF: closed silently, no error
    assert ids == [1, 2]
    assert not app.is_dirty()
    # retained frame still re-renders on parameter change
    app.control(ScaleCmd(2.0))
    f = app.generate()
    assert f.id == 2
    app.close()


def test_invalid_scale_is_typed_error():
    app = ProcessingApp()
    with pytest.raises(ScaleError):
        app.control(ScaleCmd(0.0))
    with pytest.raises(ScaleError):
        app.control(ScaleCmd(float("nan")))


def test_unknown_model_is_typed_error():
    app = ProcessingApp()
    with pytest.raises(ModelLoadError):
        app.control(ModelCmd("no_such_family"))


def test_model_on_frames_produces_masks():
    app = ProcessingApp()
    app.control(Play(synth(32, 24)))
    app.control(ScaleCmd(1.0))
    app.control(ModelCmd("fcn_resnet50"))
    f = app.generate()
    assert f.decoded is not None and f.composited is not None
    assert np.asarray(f.decoded).shape == (24, 32, 4)
    assert np.asarray(f.composited).shape == (24, 32, 4)
    # unload disables inference (reference predict_onnx.rs:310-312)
    app.control(ModelCmd(""))
    f2 = app.generate()
    assert f2.decoded is None and f2.composited is None
    app.close()


def test_model_load_does_not_retrigger_paused_frame():
    """Model::is_dirty is always false (predict_onnx.rs:336-338)."""
    app = ProcessingApp()
    app.control(Play(synth()))
    app.generate()
    app.control(Pause(True))
    app.control(ModelCmd("fcn_resnet50"))
    assert not app.is_dirty()
    assert app.generate() is None
    app.close()


def test_proc_loop_end_to_end():
    """The threaded scheduler: commands in, frames+info out, clean exit."""
    handle = start_proc()
    handle.send(ScaleCmd(0.5))
    handle.send(Play(synth(64, 48, fps=10, secs=0.5)))  # 5 frames
    got = []
    while len(got) < 5:
        r = handle.frame_rx.get(timeout=10)
        if isinstance(r, GUIFrame):
            got.append(r.id)
    assert got == [1, 2, 3, 4, 5]
    infos = []
    while True:
        try:
            infos.append(handle.ctrl_result_rx.get_nowait())
        except queue.Empty:
            break
    assert any(getattr(i, "scale", None) == 0.5 for i in infos)
    handle.stop()
    assert not handle.thread.is_alive()


def test_proc_loop_routes_command_errors():
    handle = start_proc()
    handle.send(Play(["/nonexistent/video.mp4xyz"]))
    r = handle.ctrl_result_rx.get(timeout=10)
    from infur_tpu.errors import InfurError
    # either a start error or (if ffmpeg missing) a start error — both typed
    assert isinstance(r, InfurError) or hasattr(r, "scale")
    handle.send(Exit())
    handle.stop()


def test_yuv420_pipeline_end_to_end(tmp_path):
    """Decode-native planar frames through the whole interactive pipeline:
    synth yuv source -> host i420 scale -> device conversion + model ->
    composited RGBA, same ids/semantics as the bgr24 path."""
    app = ProcessingApp()
    app.control(Play(synth(64, 48), pix_fmt="yuv420p"))
    app.control(ScaleCmd(0.5))
    app.control(ModelCmd("fcn_resnet50"))
    f = app.generate()
    assert f is not None and f.id == 1
    assert np.asarray(f.buffer).shape == (24, 32, 4)
    assert np.asarray(f.composited).shape == (24, 32, 4)
    # paused re-render at a new scale still works on planar frames
    app.control(Pause(True))
    app.control(ScaleCmd(1.0))
    f2 = app.generate()
    assert f2.id == 1 and np.asarray(f2.buffer).shape == (48, 64, 4)
    app.close()


def test_odd_dims_yuv_is_typed_error_not_thread_death():
    from infur_tpu.errors import VideoStartError
    app = ProcessingApp()
    with pytest.raises(VideoStartError):
        app.control(Play(["synth:33x24@10:1"], pix_fmt="yuv420p"))
    # app still alive and usable
    app.control(Play(synth(32, 24)))
    assert app.generate().id == 1
    app.close()


def test_model_bucketing_caps_compile_shapes():
    """With bucket=16, NEARBY sizes share ONE model-input shape (the
    scale-slider recompile-storm mitigation, SURVEY hard part 3)."""
    shapes = set()
    for w, h in ((60, 44), (63, 47), (50, 34)):
        app = ProcessingApp(model_bucket=16)
        app.control(Play(synth(w, h)))
        app.control(ModelCmd("fcn_resnet50"))
        f = app.generate()
        assert np.asarray(f.buffer).shape == (h, w, 4)    # display exact
        assert np.asarray(f.composited).shape == (h, w, 4)
        shapes.add(app.pred.value.primary.shape)
        app.close()
    assert shapes == {(21, 48, 64)}  # three sizes, one compiled model shape


def test_bucket_validation():
    from infur_tpu.errors import ModelLoadError
    from infur_tpu.model_stage import ModelStage
    with pytest.raises(ModelLoadError):
        ModelStage(bucket=0)
    with pytest.raises(ModelLoadError):
        ModelStage(bucket=-8)

def test_still_image_displays_and_rerenders(tmp_path):
    """An image input yields one frame, then EOF retains it; parameter
    changes keep re-rendering the same retained frame (the reference's
    "images" capability: one image2pipe frame + EOF-as-control-flow,
    reference Cargo.toml:9, processing.rs:133-135)."""
    from PIL import Image
    rng = np.random.default_rng(7)
    bgr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    p = tmp_path / "still.png"
    Image.fromarray(np.ascontiguousarray(bgr[:, :, ::-1]), "RGB").save(p)

    app = ProcessingApp()
    app.control(Play([str(p)]))
    f = app.generate()
    assert f.id == 1
    assert np.asarray(f.buffer).shape == (24, 32, 4)
    np.testing.assert_array_equal(np.asarray(f.buffer)[:, :, 2], bgr[:, :, 0])
    assert app.generate() is None          # EOF after the single frame
    assert not app.is_dirty()
    app.control(ScaleCmd(2.0))             # still re-renders the image
    f2 = app.generate()
    assert f2.id == 1
    assert np.asarray(f2.buffer).shape == (48, 64, 4)
    app.close()


def test_hot_model_swap_under_load():
    """Swapping models while frames flow (the reference's hot Load,
    predict_onnx.rs:310-312) never kills the stream: frames before,
    during, and after the swap; unload mid-play works too."""
    import time as _time

    handle = start_proc(ProcessingApp())
    try:
        handle.send(Play(synth(32, 24, fps=60, secs=5)))
        handle.send(ModelCmd("lraspp"))
        got = []
        deadline = _time.monotonic() + 120
        swapped = unloaded = False
        while len(got) < 12 and _time.monotonic() < deadline:
            try:
                r = handle.frame_rx.get(timeout=5)
            except queue.Empty:
                continue  # a jit compile mid-swap can stall several seconds
            if isinstance(r, GUIFrame):
                got.append(r.id)
                if len(got) == 4 and not swapped:
                    swapped = True
                    handle.send(ModelCmd("fcn_resnet50"))
                if len(got) == 8 and not unloaded:
                    unloaded = True
                    handle.send(ModelCmd(""))  # unload = inference off
        assert len(got) >= 12, f"stream stalled: {got}"
        assert got == sorted(got)  # ids stay monotonically increasing
    finally:
        handle.stop()


def test_soak_sustained_streaming():
    """300 frames through the proc loop without a stall, frame drop at the
    bounded channel notwithstanding: ids strictly increase and the stream
    never gaps longer than the idle threshold (production-stability smoke
    for the scheduler's blocking/draining intake)."""
    import time as _time

    handle = start_proc(ProcessingApp())
    try:
        handle.send(Play(["synth:48x36@240:300f"]))
        ids = []
        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            try:
                r = handle.frame_rx.get(timeout=3)
            except queue.Empty:
                break  # end of stream (EOF drains silently)
            if isinstance(r, GUIFrame):
                ids.append(r.id)
                if ids[-1] >= 300:
                    break
        assert len(ids) >= 300, f"only {len(ids)} frames"
        assert ids == sorted(ids)
        assert ids[-1] == 300  # every frame delivered in order (no drops:
        # the consumer here keeps up, backpressure does the pacing)
    finally:
        handle.stop()


def test_color_softmax_control_rerenders_paused_frame():
    """ColorCmd(softmax=True) is a live control: it re-renders the
    retained frame (same id) with probability alpha — visibly different
    composite for logit-scale scores."""
    from infur_tpu.app import ColorCmd

    app = ProcessingApp()
    app.control(Play(synth(32, 24)))
    app.control(ScaleCmd(1.0))
    app.control(ModelCmd("fcn_resnet50"))
    f1 = app.generate()
    app.control(Pause(True))
    assert app.generate() is None
    app.control(ColorCmd(softmax=True))
    assert app.is_dirty()
    f2 = app.generate()
    assert f2 is not None and f2.id == f1.id
    a = np.asarray(f1.composited).astype(int)
    b = np.asarray(f2.composited).astype(int)
    assert np.abs(a - b).max() > 0  # alpha scale actually changed
    app.control(ColorCmd(softmax=True))  # no-op: same value
    assert not app.is_dirty()
    app.close()


class TestSeekStep:
    """Seeking and frame stepping (reference README todos: video
    fast-forward/backward + seeking)."""

    def test_step_forward_while_paused(self):
        from infur_tpu.processing import Step
        app = ProcessingApp()
        app.control(Play(synth(32, 24, fps=10, secs=2.0)))  # 20 frames
        f1 = app.generate()
        app.control(Pause(True))
        assert app.generate() is None
        app.control(Step(1))        # paused single-step: one new frame
        assert app.is_dirty()
        f2 = app.generate()
        assert f2.id == f1.id + 1
        assert app.generate() is None   # still paused after the step
        app.control(Step(5))        # fast-forward skips the gap
        f3 = app.generate()
        assert f3.id == f2.id + 5
        app.close()

    def test_step_backward_on_seekable(self):
        from infur_tpu.processing import Step
        app = ProcessingApp()
        app.control(Play(["synth:32x24@10:20f"]))
        for _ in range(6):
            f = app.generate()
        assert f.id == 6
        app.control(Pause(True))
        app.control(Step(-3))
        fb = app.generate()
        assert fb.id == 3
        # the frame really is frame 3's content (index-coded pattern)
        from infur_tpu.video.testsrc import decode_frame_index, synth_spec_from_url
        spec = synth_spec_from_url("synth:32x24@10:20f")
        rgba = np.asarray(fb.buffer)
        bgr = rgba[:, :, 2::-1][:, :, ::1]  # RGBA -> BGR channel order
        bgr = np.ascontiguousarray(rgba[:, :, [2, 1, 0]])
        assert decode_frame_index(bgr, spec) == 2  # 0-based index of id 3
        app.close()

    def test_seek_seconds(self):
        from infur_tpu.processing import Seek
        app = ProcessingApp()
        app.control(Play(["synth:32x24@10:40f"]))
        app.generate()
        app.control(Seek(2.0))      # 10 fps -> frame index 20
        f = app.generate()
        assert f.id == 21           # 1-based id of 0-based index 20
        app.close()

    def test_seek_on_unseekable_is_typed_error(self, tmp_path, monkeypatch):
        """Pipe decoders have no position: Seek raises ControlError and the
        app survives."""
        from infur_tpu.errors import ControlError
        from infur_tpu.processing import Seek, VideoPlayer

        vp = VideoPlayer()
        vp._vid = object.__new__(type("Pipe", (), {
            "fps": 30.0, "close": lambda self: None}))
        with pytest.raises(ControlError):
            vp.control(Seek(1.0))

    def test_step_past_eof_closes_silently(self):
        from infur_tpu.processing import Step
        app = ProcessingApp()
        app.control(Play(["synth:32x24@10:5f"]))
        app.generate()
        app.control(Pause(True))
        app.control(Step(50))       # way past the end
        assert app.generate() is None  # EOF during skip: silent close
        app.close()


def test_native_int8_spec():
    """`lraspp:int8` builds the quantized executable from native params
    (export -> fold BN -> static quantize -> import), runs through the
    normal pipeline, and matches the NumPy oracle bit-exactly (the int8
    fidelity contract; int8-vs-f32 mask deltas are meaningless on
    random-init weights whose logits are near-tied)."""
    from infur_tpu.onnx import run_model
    from infur_tpu.onnx.proto import make_model

    app = ProcessingApp()
    app.control(Play(synth(48, 32)))
    app.control(ScaleCmd(1.0))
    app.control(ModelCmd("lraspp:int8"))
    f = app.generate()
    assert f.composited is not None
    pred = app.pred.value.primary
    assert pred.shape == (21, 32, 48)
    backend = app.model._backend
    x = np.random.default_rng(9).normal(size=(1, 3, 32, 48)) \
        .astype(np.float32)
    name = backend._int8.input_info[0].name
    feed = x
    if getattr(backend._int8, "input_layout", "NCHW") == "NHWC":
        feed = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    got = np.asarray(backend._int8({name: feed})["out"])
    want = run_model(make_model(backend._int8.graph), {name: x})["out"]
    np.testing.assert_array_equal(got, want)  # executors bit-exact
    app.close()


def test_int8_excludes_other_compute_opts():
    from infur_tpu.model_stage import Load, ModelStage
    with pytest.raises(ModelLoadError):
        ModelStage().control(Load("lraspp:int8:bf16"))
    with pytest.raises(ModelLoadError):  # int8 is integer compute
        ModelStage().control(Load("segformer:int8:bf16"))
    with pytest.raises(ModelLoadError):  # int8 shards data-parallel ONLY
        ModelStage().control(Load("segformer:int8:mesh=2x2"))
