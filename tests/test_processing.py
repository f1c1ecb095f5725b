"""Processor protocol + stage tests (VideoPlayer, Scale).

The scenarios mirror the reference's headless app-level tests (driven through
the same API the frontend uses — infur/src/app.rs:174-252) at stage
granularity; composite-app versions live in test_app.py.
"""

import numpy as np
import pytest

from infur_tpu.errors import ScaleError
from infur_tpu.processing import (
    Cell, Frame, Pause, Play, Scale, Stop, ValidScale, VideoPlayer, resize_nearest,
)


class TestValidScale:
    def test_accepts_positive(self):
        assert float(ValidScale(0.5)) == 0.5

    @pytest.mark.parametrize("bad", [0.0, -1.0, float("nan"), float("inf")])
    def test_rejects(self, bad):
        with pytest.raises(ScaleError):
            ValidScale(bad)


class TestResizeNearest:
    def test_identity(self, rng):
        img = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
        np.testing.assert_array_equal(resize_nearest(img, 7, 9), img)

    def test_double_replicates(self):
        img = np.arange(4, dtype=np.uint8).reshape(2, 2, 1).repeat(3, axis=2)
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4, 3)
        np.testing.assert_array_equal(out[:2, :2, 0], [[0, 0], [0, 0]])
        np.testing.assert_array_equal(out[2:, 2:, 0], [[3, 3], [3, 3]])

    def test_downscale_samples_centers(self):
        # 4->2 samples source rows/cols (i+0.5)*2 = {1, 3}
        img = np.zeros((4, 4, 3), np.uint8)
        img[1, 1] = 200
        img[3, 3] = 99
        out = resize_nearest(img, 2, 2)
        assert out[0, 0, 0] == 200 and out[1, 1, 0] == 99
        assert out[0, 1, 0] == 0 and out[1, 0, 0] == 0


class TestScaleStage:
    def test_unit_scale_copies(self, rng):
        s = Scale(1.0)
        img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
        out = Cell()
        s.advance(Frame(3, img), out)
        assert out.value.id == 3
        np.testing.assert_array_equal(out.value.img, img)
        assert out.value.img is not img  # decoupled from the input buffer

    def test_starts_dirty(self):
        """A fresh Scale is dirty, like the reference's Scale::default()
        (dirty: true, processing.rs:185-192): it has never produced
        output, so the same input WOULD produce new output."""
        assert Scale(0.5).is_dirty()

    def test_control_sets_dirty_only_on_change(self):
        s = Scale(0.5)
        s.advance(Frame(1, np.zeros((8, 8, 3), np.uint8)), Cell())
        assert not s.is_dirty()
        s.control(0.5)
        assert not s.is_dirty()
        s.control(0.25)
        assert s.is_dirty()
        s.advance(Frame(1, np.zeros((8, 8, 3), np.uint8)), Cell())
        assert not s.is_dirty()

    def test_zero_size_input_errors(self):
        s = Scale(0.5)
        with pytest.raises(ScaleError):
            s.advance(Frame(1, np.empty((0, 0, 3), np.uint8)), Cell())

    def test_zero_size_output_errors(self):
        s = Scale(0.01)
        with pytest.raises(ScaleError):
            s.advance(Frame(1, np.zeros((4, 4, 3), np.uint8)), Cell())

    def test_upscale_dims(self):
        s = Scale(2.0)
        out = Cell()
        s.advance(Frame(1, np.zeros((48, 64, 3), np.uint8)), out)
        assert out.value.img.shape == (96, 128, 3)


class TestVideoPlayer:
    def test_play_read_ids(self, small_clip):
        path, spec, frames = small_clip
        vp = VideoPlayer()
        vp.control(Play([path]))
        assert vp.is_dirty()
        out = Cell()
        vp.advance(None, out)
        assert out.value.id == 1
        np.testing.assert_array_equal(out.value.img, frames[0])
        vp.advance(None, out)
        assert out.value.id == 2
        vp.control(Stop())
        assert not vp.is_dirty()

    def test_pause_freezes(self, small_clip):
        path, _, _ = small_clip
        vp = VideoPlayer()
        vp.control(Play([path]))
        out = Cell()
        vp.advance(None, out)
        vp.control(Pause(True))
        assert not vp.is_dirty()
        vp.advance(None, out)
        assert out.value.id == 1  # unchanged while paused
        vp.control(Pause(False))
        vp.advance(None, out)
        assert out.value.id == 2

    def test_eof_closes_silently_and_retains_frame(self):
        vp = VideoPlayer()
        vp.control(Play(["synth:16x16@10:2f"]))
        out = Cell()
        vp.advance(None, out)
        vp.advance(None, out)
        assert out.value.id == 2
        vp.advance(None, out)  # EOF: no error, closes video
        assert out.value.id == 2
        assert not vp.is_dirty()

    def test_restart_resets_ids(self, small_clip):
        path, _, _ = small_clip
        vp = VideoPlayer()
        vp.control(Play([path]))
        out = Cell()
        vp.advance(None, out)
        vp.advance(None, out)
        vp.control(Play([path]))  # restart closes old decoder
        vp.advance(None, out)
        assert out.value.id == 1

    def test_frame_equality_by_id(self):
        a = Frame(5, np.zeros((2, 2, 3), np.uint8))
        b = Frame(5, np.ones((4, 4, 3), np.uint8))
        assert a == b
        assert a != Frame(6, a.img)


def test_errors_cross_thread_boundaries():
    """Errors are values routed over queues/threads: every error type must
    pickle and str() cleanly (the analog of the reference's Send/Sync and
    size compile-time asserts, ff-video/src/error.rs:54-70)."""
    import pickle

    from infur_tpu import errors

    types = [getattr(errors, n) for n in dir(errors)
             if isinstance(getattr(errors, n), type)
             and issubclass(getattr(errors, n), errors.InfurError)]
    assert len(types) >= 10
    for t in types:
        e = t("boom") if t is not errors.VideoStartError \
            else t("boom", "last line")
        back = pickle.loads(pickle.dumps(e))
        assert type(back) is t and "boom" in str(back)
        assert isinstance(e.stage, str) and e.stage


def test_generate_sugar():
    from infur_tpu.processing import VideoPlayer, Play
    vp = VideoPlayer()
    vp.control(Play(["synth:8x8@5:1"]))
    frame = vp.generate()
    assert frame is not None and frame.id == 1
    vp.close()
