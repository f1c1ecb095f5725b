"""Native host pixel ops (csrc/hostops.cpp via ctypes): exactness vs the
NumPy int-floor reference, quarter-res confidence indexing, buffer reuse,
argument validation."""

import numpy as np
import pytest

from infur_tpu.hostops import blend_overlay, have_hostops

pytestmark = pytest.mark.skipif(not have_hostops(),
                                reason="no C++ toolchain for hostops")


def _ref(palette, mask, conf_full, base):
    rgb = palette[mask % len(palette)].astype(np.int32)
    a = conf_full.astype(np.int32)[..., None]
    b = base[..., None].astype(np.int32)
    rgb -= b
    rgb *= a
    rgb = np.floor_divide(rgb, 255)
    rgb += b
    return rgb.astype(np.uint8)


@pytest.fixture(scope="module")
def data(rng):
    f, h, w = 3, 32, 48
    return {
        "palette": rng.integers(0, 256, (21, 3)).astype(np.uint8),
        "mask": rng.integers(0, 21, (f, h, w)).astype(np.uint8),
        "conf": rng.integers(0, 256, (f, h, w)).astype(np.uint8),
        "confq": rng.integers(0, 256, (f, h // 2, w // 2)).astype(np.uint8),
        "base": rng.integers(0, 256, (f, h, w)).astype(np.uint8),
    }


def test_full_res_exact(data):
    got = blend_overlay(data["mask"], data["conf"], data["base"],
                        data["palette"])
    ref = _ref(data["palette"], data["mask"], data["conf"], data["base"])
    np.testing.assert_array_equal(got, ref)


def test_quarter_res_conf_indexing(data):
    """Quarter-res confidence is indexed natively — no host repeat()."""
    got = blend_overlay(data["mask"], data["confq"], data["base"],
                        data["palette"])
    full = data["confq"].repeat(2, axis=1).repeat(2, axis=2)
    ref = _ref(data["palette"], data["mask"], full, data["base"])
    np.testing.assert_array_equal(got, ref)


def test_floor_semantics_on_negative_terms():
    """(rgb - base) can be negative; floor division must match numpy //."""
    palette = np.zeros((1, 3), np.uint8)  # rgb = 0 -> rgb - base <= 0
    mask = np.zeros((1, 2, 2), np.uint8)
    conf = np.full((1, 2, 2), 128, np.uint8)
    base = np.full((1, 2, 2), 255, np.uint8)
    got = blend_overlay(mask, conf, base, palette)
    ref = _ref(palette, mask, conf, base)
    np.testing.assert_array_equal(got, ref)


def test_output_buffer_reuse(data):
    out = np.empty(data["mask"].shape + (3,), np.uint8)
    got = blend_overlay(data["mask"], data["conf"], data["base"],
                        data["palette"], out=out)
    assert got is out


def test_single_thread_matches(data):
    a = blend_overlay(data["mask"], data["conf"], data["base"],
                      data["palette"], threads=1)
    b = blend_overlay(data["mask"], data["conf"], data["base"],
                      data["palette"], threads=8)
    np.testing.assert_array_equal(a, b)


def test_bad_shapes_rejected(data):
    with pytest.raises(ValueError):
        blend_overlay(data["mask"], data["conf"][:, :5, :], data["base"],
                      data["palette"])  # 32 % 5 != 0
    with pytest.raises(ValueError):
        blend_overlay(data["mask"], data["conf"], data["base"][:1],
                      data["palette"])


def test_unpack_mask6_matches_numpy(rng):
    from infur_tpu.hostops import have_hostops, unpack_mask6
    if not have_hostops():
        import pytest
        pytest.skip("no native toolchain")
    m = rng.integers(0, 64, (3, 48), dtype=np.uint8)
    q = m.reshape(3, -1, 4)
    packed = np.stack([
        (q[..., 0] | (q[..., 1] << 6)).astype(np.uint8),
        ((q[..., 1] >> 2) | (q[..., 2] << 4)).astype(np.uint8),
        ((q[..., 2] >> 4) | (q[..., 3] << 2)).astype(np.uint8),
    ], axis=-1).reshape(3, -1)
    np.testing.assert_array_equal(unpack_mask6(packed), m)


class TestScaleI420:
    def test_bit_exact_vs_numpy(self, rng):
        from infur_tpu.hostops import scale_i420 as native
        from infur_tpu.ops.yuv import scale_i420 as ref
        h, w, oh, ow = 36, 64, 18, 32
        flat = rng.integers(0, 256, h * w * 3 // 2, np.uint8)
        np.testing.assert_array_equal(native(flat, h, w, oh, ow),
                                      ref(flat, h, w, oh, ow))

    def test_non_integer_ratio_exact(self, rng):
        from infur_tpu.hostops import scale_i420 as native
        from infur_tpu.ops.yuv import scale_i420 as ref
        h, w, oh, ow = 30, 44, 22, 28  # awkward ratios hit the index math
        flat = rng.integers(0, 256, h * w * 3 // 2, np.uint8)
        np.testing.assert_array_equal(native(flat, h, w, oh, ow),
                                      ref(flat, h, w, oh, ow))

    def test_out_view_write(self, rng):
        from infur_tpu.hostops import scale_i420 as native
        h, w, oh, ow = 16, 16, 8, 8
        flat = rng.integers(0, 256, h * w * 3 // 2, np.uint8)
        batch = np.zeros((2, oh * ow * 3 // 2), np.uint8)
        got = native(flat, h, w, oh, ow, out=batch[1])
        assert got.base is batch
        assert (batch[0] == 0).all() and batch[1].any()

    def test_odd_dims_rejected(self):
        from infur_tpu.hostops import scale_i420 as native
        with pytest.raises(ValueError):
            native(np.zeros(15 * 16 * 3 // 2, np.uint8), 15, 16, 8, 8)


class TestDeltaEncode:
    def test_matches_python_encoder(self, rng):
        from infur_tpu.hostops import delta_encode as native
        from infur_tpu.ops.framedelta import encode_delta as ref
        b, n_chunks, chunk = 5, 40, 16
        frames = np.empty((b, n_chunks * chunk), np.uint8)
        frames[0] = rng.integers(0, 256, n_chunks * chunk, np.uint8)
        for j in range(1, b):
            frames[j] = frames[j - 1]
            ch = frames[j].reshape(n_chunks, chunk)
            for i in rng.choice(n_chunks, 3, replace=False):
                ch[i] = rng.integers(0, 256, chunk, np.uint8)
        got, want = native(frames, cap=8, chunk=chunk), \
            ref(frames, cap=8, chunk=chunk)
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(g, w_)

    def test_overflow_returns_none(self, rng):
        from infur_tpu.hostops import delta_encode as native
        frames = np.stack([rng.integers(0, 256, 640, np.uint8)
                           for _ in range(3)])
        assert native(frames, cap=4, chunk=16) is None

    def test_roundtrip_through_device_decoder(self, rng):
        from infur_tpu.hostops import delta_encode as native
        from infur_tpu.ops.framedelta import decode_delta_np
        b, n_chunks, chunk = 4, 30, 8
        frames = np.empty((b, n_chunks * chunk), np.uint8)
        frames[0] = rng.integers(0, 256, n_chunks * chunk, np.uint8)
        for j in range(1, b):
            frames[j] = frames[j - 1]
            frames[j].reshape(n_chunks, chunk)[j * 2] = j
        enc = native(frames, cap=4, chunk=chunk)
        assert enc is not None
        np.testing.assert_array_equal(decode_delta_np(*enc), frames)
