"""YUV420 ingest: host encoder <-> device decoder round trip, I420 RVF."""

import numpy as np
import pytest

from infur_tpu.ops.yuv import bgr_to_i420, i420_nbytes, i420_to_bgr, i420_to_rgbf
from infur_tpu.video.rvf import FOURCC_I420, RvfReader, RvfWriter


def smooth_frame(h, w):
    """Chroma-smooth content (4:2:0 loses little on it)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    b = 127 + 120 * np.sin(xx / 37)
    g = 127 + 120 * np.cos(yy / 23)
    r = 127 + 120 * np.sin((xx + yy) / 53)
    return np.clip(np.stack([b, g, r], -1), 0, 255).astype(np.uint8)


def test_roundtrip_smooth():
    img = smooth_frame(64, 96)
    flat = bgr_to_i420(img)
    assert flat.shape == (i420_nbytes(64, 96),)
    back = np.asarray(i420_to_bgr(flat, 64, 96))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 40  # 4:2:0 + u8 rounding loss


def test_gray_is_lossless_in_luma():
    img = np.repeat(np.arange(0, 256, 4, dtype=np.uint8)
                    .reshape(1, -1, 1), 3, axis=2)
    img = np.repeat(img, 8, axis=0)  # (8, 64, 3) gray ramp
    back = np.asarray(i420_to_bgr(bgr_to_i420(img), 8, 64))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_rgbf_matches_bgr_path():
    img = smooth_frame(32, 32)
    flat = bgr_to_i420(img)
    bgr = np.asarray(i420_to_bgr(flat, 32, 32)).astype(np.float32)
    rgbf = np.asarray(i420_to_rgbf(flat, 32, 32)) * 255.0
    assert np.abs(bgr[..., ::-1] - rgbf).max() <= 1.0  # same transform, no u8 trip


def test_i420_rvf_roundtrip(tmp_path):
    img = smooth_frame(48, 64)
    flat = bgr_to_i420(img)
    p = tmp_path / "clip.rvf"
    with RvfWriter(p, 64, 48, fps=30, fourcc=FOURCC_I420) as w:
        w.write_frame(flat)
        w.write_frame(flat)
    with RvfReader(p) as r:
        assert r.header.fourcc == FOURCC_I420
        assert r.header.frame_bytes == i420_nbytes(48, 64)
        buf = r.empty_image()
        assert buf.shape == (i420_nbytes(48, 64),)
        assert r.read_frame_into(buf) == 1
        np.testing.assert_array_equal(buf, flat)


def test_writer_rejects_wrong_size(tmp_path):
    with RvfWriter(tmp_path / "x.rvf", 64, 48, fourcc=FOURCC_I420) as w:
        with pytest.raises(ValueError):
            w.write_frame(np.zeros((48, 64, 3), np.uint8))
