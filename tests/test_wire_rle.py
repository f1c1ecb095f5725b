"""Low-wire display transport: ``ProcessingApp(wire="rle")`` + ``planes=``.

Instead of fetching dense RGBA planes (~6 MB/frame at 540p), the app ships
a run-coded mask + quarter-res confidence payload (~0.2 MB) and the
scheduler composites host-side (ops/maskcode.py + hostops blend).  The
dense 6-bit fallback plane keeps the path lossless when a row overflows
the run cap.
"""

import numpy as np
import pytest

from infur_tpu.app import GUIFrame, ModelCmd, ProcessingApp, WIRE_RLE_CAP
from infur_tpu.errors import InfurError
from infur_tpu.ops.maskcode import (
    decode_payload, encode_payload, pack_mask6, payload_nbytes,
    unpack_mask6_np,
)
from infur_tpu.processing import Cell, Play, Stop
from infur_tpu.runtime.loop import _materialize


def synth(w=64, h=48, fps=10, secs=0.3):
    return [f"synth:{w}x{h}@{fps}:{secs}"]


class TestPayload:
    def test_roundtrip(self, rng):
        mask = np.repeat(rng.integers(0, 21, (24, 8), np.uint8), 4, axis=1)
        conf = rng.integers(0, 256, (24, 32), np.uint8)
        flat = np.asarray(encode_payload(mask, conf, cap=16))
        assert flat.shape == (payload_nbytes(24, 32, 16),)
        out_mask, confq = decode_payload(flat, 24, 32, 16)
        np.testing.assert_array_equal(out_mask, mask)
        expect_cq = conf.reshape(12, 2, 16, 2).astype(np.uint16) \
                        .sum(axis=(1, 3)) // 4
        np.testing.assert_array_equal(confq, expect_cq.astype(np.uint8))

    def test_overflow_returns_none(self):
        mask = (np.arange(32, dtype=np.uint8) % 2)[None].repeat(8, axis=0)
        conf = np.zeros((8, 32), np.uint8)
        flat = np.asarray(encode_payload(mask, conf, cap=8))
        out_mask, confq = decode_payload(flat, 8, 32, 8)
        assert out_mask is None and confq.shape == (4, 16)

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError, match="even"):
            encode_payload(np.zeros((7, 8), np.uint8),
                           np.zeros((7, 8), np.uint8), cap=8)

    def test_pack6_roundtrip(self, rng):
        m = rng.integers(0, 64, (2, 48), np.uint8)
        np.testing.assert_array_equal(unpack_mask6_np(np.asarray(pack_mask6(m))), m)


class TestMaterialize:
    def _frame(self, mask, conf, base, cap):
        payload = encode_payload(mask, conf, cap)
        fb = pack_mask6(mask.reshape(1, -1))[0]
        return GUIFrame(id=1, buffer=None, wire_payload=payload,
                        wire_fallback=fb, wire_cap=cap, host_base=base)

    def test_composite_matches_reference_blend(self, rng):
        from infur_tpu.hostops import blend_overlay_bgr_np
        from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
        h, w = 16, 32
        mask = np.repeat(rng.integers(0, 21, (h, w // 4), np.uint8), 4, axis=1)
        conf = rng.integers(0, 256, (h, w), np.uint8)
        base = rng.integers(0, 256, (h, w, 3), np.uint8)
        f = self._frame(mask, conf, base, cap=16)
        _materialize(f, frozenset({"composited", "decoded", "buffer"}))
        confq = (conf.reshape(h // 2, 2, w // 2, 2).astype(np.uint16)
                 .sum(axis=(1, 3)) // 4).astype(np.uint8)
        expect = blend_overlay_bgr_np(mask[None], confq[None], base[None],
                                      np.asarray(_DEFAULT_PALETTE))[0]
        np.testing.assert_array_equal(f.composited, expect)
        assert f.composited.shape == (h, w, 4)
        assert (f.composited[..., 3] == 255).all()
        # requested extra planes built host-side
        np.testing.assert_array_equal(f.buffer[..., :3], base[..., ::-1])
        assert f.decoded.shape == (h, w, 4)
        assert f.wire_payload is None and f.wire_fallback is None

    def test_unrequested_planes_stay_none(self, rng):
        h, w = 8, 16
        mask = np.zeros((h, w), np.uint8)
        conf = np.full((h, w), 128, np.uint8)
        base = rng.integers(0, 256, (h, w, 3), np.uint8)
        f = self._frame(mask, conf, base, cap=8)
        _materialize(f, frozenset({"composited"}))
        assert f.composited is not None
        assert f.buffer is None and f.decoded is None

    def test_overflow_uses_lossless_fallback(self, rng):
        h, w = 8, 32
        mask = (np.arange(w, dtype=np.uint8) % 2)[None].repeat(h, axis=0)
        conf = np.full((h, w), 255, np.uint8)  # full alpha: pure palette
        base = rng.integers(0, 256, (h, w, 3), np.uint8)
        f = self._frame(mask, conf, base, cap=4)  # every row overflows
        _materialize(f, frozenset({"composited"}))
        from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
        pal = np.asarray(_DEFAULT_PALETTE)
        # alpha 255 => composited rgb == palette[mask]: proves the dense
        # fallback carried the EXACT mask
        np.testing.assert_array_equal(f.composited[..., :3], pal[mask])


class TestAppWireRle:
    def test_bad_wire_rejected(self):
        with pytest.raises(InfurError, match="wire"):
            ProcessingApp(wire="zlib")
        with pytest.raises(InfurError, match="planes"):
            ProcessingApp(planes={"composited", "nope"})

    def test_rle_frame_carries_payload_not_planes(self):
        app = ProcessingApp(wire="rle", planes={"composited"})
        app.control(Play(synth()))
        app.control(ModelCmd("fcn_resnet50"))
        cell = Cell()
        app.advance(None, cell)
        f = cell.value
        assert f is not None and f.wire_payload is not None
        assert f.buffer is None and f.composited is None
        assert f.host_base.shape == (48, 64, 3)
        assert f.wire_cap == WIRE_RLE_CAP
        app.control(Stop())
        app.close()

    def test_rle_composite_close_to_dense(self):
        """Same clip + model through both wire modes: the host composite
        must visually match the device composite (alpha is quarter-res u8
        in rle mode, so equality is approximate by design)."""
        results = {}
        for wire in ("dense", "rle"):
            app = ProcessingApp(wire=wire)
            app.control(Play(synth()))
            app.control(ModelCmd("fcn_resnet50"))
            cell = Cell()
            app.advance(None, cell)
            f = cell.value
            _materialize(f, app.planes)
            results[wire] = np.asarray(f.composited).astype(np.int32)
            app.control(Stop())
            app.close()
        diff = np.abs(results["dense"] - results["rle"])
        assert diff.mean() < 3.0 and np.percentile(diff, 99) <= 16

    def test_rle_no_model_is_pure_host(self):
        app = ProcessingApp(wire="rle")
        app.control(Play(synth()))
        cell = Cell()
        app.advance(None, cell)
        f = cell.value
        assert isinstance(f.buffer, np.ndarray)  # never touched the device
        assert f.wire_payload is None
        app.control(Stop())
        app.close()

    def test_wide_frame_falls_back_loudly(self):
        app = ProcessingApp(wire="rle")
        app.control(Play(["synth:1100x48@10:0.3"]))
        app.control(ModelCmd("fcn_resnet50"))
        cell = Cell()
        with pytest.warns(UserWarning, match="dense"):
            app.advance(None, cell)
        f = cell.value
        assert f is not None and f.wire_payload is None
        assert f.composited is not None  # dense path served the frame
        app.control(Stop())
        app.close()

    def test_loop_integration(self):
        """Through the real scheduler: frames arrive host-materialized
        with only the composited plane."""
        import queue

        from infur_tpu.runtime.loop import start_proc
        handle = start_proc(ProcessingApp(wire="rle", planes={"composited"}))
        handle.send(Play(synth(64, 48, fps=10, secs=0.5)))
        handle.send(ModelCmd("fcn_resnet50"))
        got = 0
        deadline = 90.0
        import time
        t0 = time.monotonic()
        while got < 3 and time.monotonic() - t0 < deadline:
            try:
                r = handle.frame_rx.get(timeout=1.0)
            except queue.Empty:
                continue
            if isinstance(r, GUIFrame) and r.composited is not None:
                assert isinstance(r.composited, np.ndarray)
                assert r.composited.shape == (48, 64, 4)
                assert r.wire_payload is None
                got += 1
        handle.stop()
        assert got >= 3
