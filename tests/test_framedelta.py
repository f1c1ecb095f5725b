"""Dirty-chunk (temporal-delta) H2D frame coding (`infur_tpu.ops.framedelta`).

The bench ships each batch as its first frame dense + per-frame changed
64-B chunks; the device rebuilds byte-identical frames (lossless, with a
dense fallback above the cap).
"""

import numpy as np

from infur_tpu.ops.framedelta import (
    decode_delta, decode_delta_np, decode_delta_wire, decode_keyed_np,
    decode_keyed_wire, encode_delta, encode_keyed, pack_keyed_wire,
    pack_wire,
)


def _video_like(rng, b=6, n_chunks=40, chunk=16, dirty_per_frame=3):
    """Frames where only a few chunks change between neighbours."""
    frames = np.empty((b, n_chunks * chunk), np.uint8)
    frames[0] = rng.integers(0, 256, n_chunks * chunk, np.uint8)
    for j in range(1, b):
        frames[j] = frames[j - 1]
        ch = frames[j].reshape(n_chunks, chunk)
        for i in rng.choice(n_chunks, dirty_per_frame, replace=False):
            ch[i] = rng.integers(0, 256, chunk, np.uint8)
    return frames


class TestRoundtrip:
    def test_device_rebuild_byte_identical(self, rng):
        frames = _video_like(rng)
        enc = encode_delta(frames, cap=8, chunk=16)
        assert enc is not None
        base, idx, data = enc
        out = np.asarray(decode_delta(*(np.asarray(a) for a in enc)))
        np.testing.assert_array_equal(out, frames)
        np.testing.assert_array_equal(decode_delta_np(base, idx, data),
                                      frames)

    def test_identical_frames_zero_updates(self):
        frames = np.broadcast_to(
            np.arange(64, dtype=np.uint8), (4, 64)).copy()
        enc = encode_delta(frames, cap=4, chunk=16)
        assert enc is not None
        _, idx, data = enc
        # all slots are pads (chunk 0 rewritten with its own bytes)
        assert (idx == 0).all()
        np.testing.assert_array_equal(
            np.asarray(decode_delta(*enc)), frames)

    def test_cap_exactly_met(self, rng):
        frames = _video_like(rng, dirty_per_frame=5)
        enc = encode_delta(frames, cap=5, chunk=16)
        assert enc is not None
        np.testing.assert_array_equal(np.asarray(decode_delta(*enc)), frames)

    def test_over_cap_returns_none(self, rng):
        frames = np.stack([rng.integers(0, 256, 640, np.uint8)
                           for _ in range(3)])  # unrelated frames
        assert encode_delta(frames, cap=4, chunk=16) is None

    def test_chunk_zero_change_vs_pad_collision(self, rng):
        """A genuinely dirty chunk 0 coexists with pad slots targeting 0."""
        frames = _video_like(rng, dirty_per_frame=1)
        ch = frames[1].reshape(-1, 16)
        ch[0] = rng.integers(0, 256, 16, np.uint8)  # force chunk 0 dirty
        enc = encode_delta(frames, cap=8, chunk=16)
        assert enc is not None
        np.testing.assert_array_equal(np.asarray(decode_delta(*enc)), frames)

    def test_bad_geometry_rejected(self, rng):
        # nbytes not divisible by chunk
        assert encode_delta(np.zeros((2, 65), np.uint8), cap=4, chunk=16) is None
        # single frame: nothing to delta against
        assert encode_delta(np.zeros((1, 64), np.uint8), cap=4, chunk=16) is None
        # too many chunks for u16 indexing
        big = np.zeros((2, (1 << 17) * 4), np.uint8)
        assert encode_delta(big, cap=4, chunk=4) is None


class TestWirePack:
    def test_single_buffer_roundtrip(self, rng):
        frames = _video_like(rng, b=5, n_chunks=300, chunk=16,
                             dirty_per_frame=7)  # >255 chunks: exercises hi byte
        enc = encode_delta(frames, cap=8, chunk=16)
        assert enc is not None
        flat = pack_wire(*enc)
        assert flat.dtype == np.uint8 and flat.ndim == 1
        assert flat.nbytes == sum(a.nbytes for a in enc)
        out = np.asarray(decode_delta_wire(flat, 4, 8, 16))
        np.testing.assert_array_equal(out, frames)


class TestKeyed:
    """Keyed-delta: frame 0 coded against a device-resident key frame."""

    def test_roundtrip_vs_nearby_key(self, rng):
        frames = _video_like(rng, b=6, n_chunks=40, chunk=16)
        # key = a frame "just before" frame 0 (a few chunks differ)
        key = frames[0].copy()
        kv = key.reshape(-1, 16)
        for i in rng.choice(40, 4, replace=False):
            kv[i] = rng.integers(0, 256, 16, np.uint8)
        enc = encode_keyed(frames, key, cap_base=8, cap=8, chunk=16)
        assert enc is not None
        bidx, bdata, idx, data = enc
        np.testing.assert_array_equal(
            decode_keyed_np(key, bidx, bdata, idx, data), frames)
        flat = pack_keyed_wire(*enc)
        assert flat.nbytes == sum(a.nbytes for a in enc)
        out = np.asarray(decode_keyed_wire(
            np.asarray(flat), np.asarray(key), 5, 8, 8, 16))
        np.testing.assert_array_equal(out, frames)

    def test_key_identical_to_frame0(self, rng):
        frames = _video_like(rng)
        enc = encode_keyed(frames, frames[0].copy(), cap_base=4, cap=8,
                           chunk=16)
        assert enc is not None
        bidx, bdata, idx, data = enc
        assert (bidx == 0).all()  # all pad slots (no-op rewrite of chunk 0)
        np.testing.assert_array_equal(
            decode_keyed_np(frames[0], bidx, bdata, idx, data), frames)

    def test_base_cap_overflow_returns_none(self, rng):
        frames = _video_like(rng)
        key = rng.integers(0, 256, frames.shape[1], np.uint8)  # unrelated
        assert encode_keyed(frames, key, cap_base=4, cap=8, chunk=16) is None

    def test_delta_cap_overflow_returns_none(self, rng):
        frames = np.stack([rng.integers(0, 256, 640, np.uint8)
                           for _ in range(3)])
        key = frames[0].copy()
        assert encode_keyed(frames, key, cap_base=8, cap=4, chunk=16) is None

    def test_dirty_chunk0_with_clean_key_chunk0(self, rng):
        """Frame 0's chunk 0 differs from the key AND pad slots target 0."""
        frames = _video_like(rng, dirty_per_frame=1)
        key = frames[0].copy()
        kv = key.reshape(-1, 16)
        kv[0] = rng.integers(0, 256, 16, np.uint8)  # chunk 0 dirty vs key
        enc = encode_keyed(frames, key, cap_base=8, cap=8, chunk=16)
        assert enc is not None
        np.testing.assert_array_equal(
            decode_keyed_np(key, *enc), frames)

    def test_wrong_key_shape_rejected(self, rng):
        frames = _video_like(rng)
        assert encode_keyed(frames, np.zeros(8, np.uint8), 4, 8, 16) is None

    def test_wire_much_smaller_than_dense_base(self, rng):
        frames = _video_like(rng, b=8, n_chunks=200, chunk=64,
                             dirty_per_frame=4)
        key = frames[0].copy()
        kv = key.reshape(-1, 64)
        for i in rng.choice(200, 3, replace=False):
            kv[i] = rng.integers(0, 256, 64, np.uint8)
        enc = encode_keyed(frames, key, cap_base=8, cap=8, chunk=64)
        assert enc is not None
        keyed_wire = pack_keyed_wire(*enc).nbytes
        dense_base = encode_delta(frames, cap=8, chunk=64)
        delta_wire = pack_wire(*dense_base).nbytes
        assert keyed_wire < delta_wire / 3  # the dense base dominated


class TestWireSize:
    def test_delta_smaller_than_dense_for_coherent_batches(self, rng):
        frames = _video_like(rng, b=8, n_chunks=200, chunk=64,
                             dirty_per_frame=4)
        enc = encode_delta(frames, cap=8, chunk=64)
        assert enc is not None
        wire = sum(a.nbytes for a in enc)
        assert wire < frames.nbytes / 4
