"""Round-2 behavior pins: default-on bucketing, bounded compile caches,
quantizer range fallback (VERDICT/ADVICE round 1)."""

import numpy as np
import pytest

from infur_tpu.runtime.config import ProcConfig


def _tiny_dynamic_onnx(tmp_path) -> str:
    """A 1-conv ONNX model with dynamic H/W (NCHW f32) — cheap to compile
    once per bucketed shape."""
    from infur_tpu.onnx import GraphBuilder, save_model

    g = GraphBuilder("tiny")
    x = g.input("x", np.float32, (1, 3, "h", "w"))
    w = g.init("w", np.ones((4, 3, 1, 1), np.float32))
    y = g.node("Conv", [x, w], outputs=["y"], kernel_shape=[1, 1])
    g.output(y, np.float32, (1, 4, "h", "w"))
    path = str(tmp_path / "tiny.onnx")
    save_model(g.model(), path)
    return path


def test_interactive_config_buckets_by_default():
    """CLI/viewer construct their app from ProcConfig; its default bucket
    caps the scale slider's recompile storm (SURVEY §7 hard part 3)."""
    assert ProcConfig().model_bucket == 32


def test_slider_sweep_compiles_few_shapes(tmp_path):
    """A full 0.1 -> 1.0 slider sweep (91 positions) on a 64x48 video
    compiles at most 4 model shapes with the default bucket."""
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.processing import Cell, Frame, Scale

    stage = ModelStage(bucket=ProcConfig().model_bucket)
    stage.control(Load(_tiny_dynamic_onnx(tmp_path)))
    base = Frame(1, np.zeros((48, 64, 3), np.uint8))
    scale = Scale()
    cell: Cell[Frame] = Cell()
    out: Cell = Cell()
    for i in range(91):  # 0.10, 0.11, ..., 1.00 (gui.rs:278-285 slider)
        scale.control(0.1 + i / 100)
        scale.advance(base, cell)
        stage.advance(cell.value, out)
    shapes = {(th, tw) for (_, th, tw, _) in stage._compiled}
    assert len(shapes) <= 4, shapes
    assert all(th % 32 == 0 and tw % 32 == 0 for th, tw in shapes)


def test_multistream_step_cache_is_bounded(tmp_path):
    """The serving path's compiled-step cache is LRU-bounded (round 1 left
    it unbounded: one executable per swept size, forever)."""
    from infur_tpu.multistream import MultiStreamApp

    app = MultiStreamApp(1, cache_cap=3)
    app.load_model(_tiny_dynamic_onnx(tmp_path))
    for s in range(16, 80, 4):  # 16 distinct geometries
        app._batched_step((s, s))
    assert len(app._step_cache) == 3
    # LRU: the most recent keys survive
    assert (76, 76) in app._step_cache and (16, 16) not in app._step_cache
    app.close()


def test_multistream_bucket_rounds_geometry(tmp_path):
    from infur_tpu.multistream import MultiStreamApp

    app = MultiStreamApp(1, bucket=32)
    app.play(0, ["synth:50x40@10:2"])
    frames = app.tick()
    # 50x40 rounds up to 64x64 — one shared compiled geometry
    assert frames[0].rgba.shape[:2] == (64, 64)
    app.close()


def test_quantizer_falls_back_without_range(tmp_path):
    """A Conv fed by an initializer (no calibration range exists for it)
    must take the f32 path, not KeyError (round-1 ADVICE)."""
    from infur_tpu.onnx import GraphBuilder, run_model
    from infur_tpu.onnx.quantize import quantize_static

    g = GraphBuilder("constfed")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    w = g.init("w", np.random.default_rng(0).normal(
        size=(4, 3, 3, 3)).astype(np.float32))
    # const-fed conv: activation input is an initializer -> never calibrated
    cx = g.init("cx", np.random.default_rng(1).normal(
        size=(1, 3, 8, 8)).astype(np.float32))
    c1 = g.node("Conv", [cx, w], outputs=["c1"], kernel_shape=[3, 3],
                pads=[1, 1, 1, 1])
    # normal path so the quantizer has something to quantize
    c2 = g.node("Conv", [x, w], outputs=["c2"], kernel_shape=[3, 3],
                pads=[1, 1, 1, 1])
    y = g.node("Add", [c1, c2], outputs=["y"])
    g.output(y, np.float32, (1, 4, 8, 8))
    model = g.model()
    feeds = [{"x": np.random.default_rng(2).normal(
        size=(1, 3, 8, 8)).astype(np.float32)}]
    qmodel = quantize_static(model, feeds)  # must not raise
    want = run_model(model, feeds[0])["y"]
    got = run_model(qmodel, feeds[0])["y"]
    # int8 tolerance: a couple of quant steps
    assert np.abs(got - want).max() / np.abs(want).max() < 0.1
