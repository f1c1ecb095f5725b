"""Row-RLE mask transport coding (`infur_tpu.ops.maskcode`).

The bench's D2H payload codes class masks as per-row run boundaries
(lossless under a static run cap, dense-plane fallback above it) —
device-side static-shape scatter encode, host-side vectorized decode.
"""

import numpy as np
import pytest

from infur_tpu.ops.maskcode import (
    conf_plane_decode, conf_plane_encode, decode_runs, encode_runs,
    overflowed,
)


def _blobby_mask(rng, b=2, h=32, w=64, n_classes=8):
    """Spatially coherent mask: argmax over low-frequency random fields."""
    yy, xx = np.mgrid[0:h, 0:w]
    fields = []
    for _ in range(n_classes):
        fx, fy, ph = rng.uniform(0, 0.2, 3)
        fields.append(np.sin(fx * xx + fy * yy + ph * 10))
    f = np.stack(fields)  # (c, h, w)
    return np.stack([np.argmax(np.roll(f, i, axis=1), 0).astype(np.uint8)
                     for i in range(b)])


class TestRoundtrip:
    def test_coherent_masks_exact(self, rng):
        m = _blobby_mask(rng)
        counts, words = encode_runs(m, cap=64)
        counts, words = np.asarray(counts), np.asarray(words)
        assert not overflowed(counts, 64)
        out = decode_runs(counts, words, m.shape[-1])
        np.testing.assert_array_equal(out, m)

    def test_single_class_is_one_run(self):
        m = np.full((1, 8, 16), 5, np.uint8)
        counts, words = encode_runs(m, cap=4)
        counts = np.asarray(counts)
        assert (counts == 1).all()
        np.testing.assert_array_equal(
            decode_runs(counts, np.asarray(words), 16), m)

    def test_cap_exactly_met(self):
        # 8 alternating 2-px runs in a 16-px row: count == cap is fine
        row = np.repeat(np.arange(8, dtype=np.uint8) % 2, 2)
        m = np.broadcast_to(row, (1, 4, 16)).copy()
        counts, words = encode_runs(m, cap=8)
        counts = np.asarray(counts)
        assert (counts == 8).all() and not overflowed(counts, 8)
        np.testing.assert_array_equal(
            decode_runs(counts, np.asarray(words), 16), m)

    def test_true_counts_match_numpy(self, rng):
        m = _blobby_mask(rng, h=16, w=48)
        counts, _ = encode_runs(m, cap=64)
        expect = 1 + (m[:, :, 1:] != m[:, :, :-1]).sum(-1)
        np.testing.assert_array_equal(np.asarray(counts), expect)

    def test_max_class_id_63(self):
        m = np.full((1, 2, 8), 63, np.uint8)
        m[0, 0, 4:] = 0
        counts, words = encode_runs(m, cap=4)
        np.testing.assert_array_equal(
            decode_runs(np.asarray(counts), np.asarray(words), 8), m)


class TestOverflow:
    def test_overflow_detected_and_true_count_preserved(self):
        # alternating pixels: w runs per row, far over the cap
        m = (np.arange(32, dtype=np.uint8) % 2).reshape(1, 1, 32)
        m = np.broadcast_to(m, (1, 4, 32)).copy()
        counts, _ = encode_runs(m, cap=8)
        counts = np.asarray(counts)
        assert overflowed(counts, 8)
        assert (counts == 32).all()  # TRUE counts, not clipped

    def test_mixed_rows_only_batch_flag(self):
        m = np.zeros((1, 2, 32), np.uint8)
        m[0, 1] = np.arange(32, dtype=np.uint8) % 2  # one bad row
        counts, _ = encode_runs(m, cap=8)
        counts = np.asarray(counts)
        assert overflowed(counts, 8)
        assert counts[0, 0] == 1 and counts[0, 1] == 32

    def test_w_limit(self):
        m = np.zeros((1, 1, 2048), np.uint8)
        with pytest.raises(ValueError, match="1024"):
            encode_runs(m, cap=8)


class TestConfPlane:
    """Wire confidence (alpha) plane variants (INFUR_BENCH_CONF)."""

    def test_q2_is_block_mean(self, rng):
        conf = rng.integers(0, 256, (2, 8, 16), np.uint8)
        plane = np.asarray(conf_plane_encode(conf, sub=2))
        out = conf_plane_decode(plane, 4, 8)
        expect = (conf.reshape(2, 4, 2, 8, 2).astype(np.uint16)
                  .sum(axis=(2, 4)) // 4).astype(np.uint8)
        np.testing.assert_array_equal(out, expect)

    def test_q4_is_block_mean(self, rng):
        conf = rng.integers(0, 256, (1, 8, 16), np.uint8)
        plane = np.asarray(conf_plane_encode(conf, sub=4))
        assert plane.shape == (1, 2 * 4)
        out = conf_plane_decode(plane, 2, 4)
        expect = (conf.reshape(1, 2, 4, 4, 4).astype(np.uint16)
                  .sum(axis=(2, 4)) // 16).astype(np.uint8)
        np.testing.assert_array_equal(out, expect)

    def test_4bit_roundtrip_error_bound(self, rng):
        conf = rng.integers(0, 256, (2, 8, 16), np.uint8)
        plane = np.asarray(conf_plane_encode(conf, sub=2, bits4=True))
        assert plane.shape == (2, 4 * 8 // 2)  # two codes per byte
        out = conf_plane_decode(plane, 4, 8, bits4=True)
        mean = (conf.reshape(2, 4, 2, 8, 2).astype(np.uint16)
                .sum(axis=(2, 4)) // 4).astype(int)
        # x17 reconstruct of round(v/17): within 8 of the block mean,
        # and the extremes are exact (0 -> 0, 255 -> 255)
        assert np.abs(out.astype(int) - mean).max() <= 8

    def test_4bit_extremes_exact(self):
        conf = np.zeros((1, 4, 8), np.uint8)
        conf[0, :2] = 255
        plane = np.asarray(conf_plane_encode(conf, sub=2, bits4=True))
        out = conf_plane_decode(plane, 2, 4, bits4=True)
        assert out[0, 0].min() == 255 and out[0, 1].max() == 0

    def test_bad_dims_rejected(self):
        with pytest.raises(ValueError, match="divisible"):
            conf_plane_encode(np.zeros((1, 7, 8), np.uint8), sub=2)
