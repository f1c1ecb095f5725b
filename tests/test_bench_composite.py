"""bench.py's host composite must match a float reference (regression for
an int16 overflow that wrapped |palette-gray|*conf products)."""

import importlib.util
import sys

import numpy as np


def test_composite_matches_float_reference(rng):
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = spec.loader.load_module("bench_mod")
    # reproduce the composite math standalone (bench builds it in main()):
    from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
    palette = np.asarray(_DEFAULT_PALETTE)
    oh, ow = 8, 16
    yuv = rng.integers(0, 255, (2, oh * ow * 3 // 2), dtype=np.uint8)
    mask = rng.integers(0, 21, (2, oh, ow)).astype(np.uint8)
    conf = np.full((2, oh, ow), 255, np.uint8)  # worst case for overflow
    ypl = yuv[:, : oh * ow].reshape(-1, oh, ow)

    rgb = palette[mask % len(palette)].astype(np.int32)
    a = conf.astype(np.int32)[..., None]
    base = ypl[..., None].astype(np.int32)
    got = ((base * (255 - a) + rgb * a) // 255).astype(np.uint8)

    ref = (ypl[..., None].astype(np.float64) * (1 - conf[..., None] / 255.0)
           + palette[mask % 20].astype(np.float64) * (conf[..., None] / 255.0))
    assert np.abs(got.astype(np.float64) - ref).max() <= 1.0
    # at conf=255 the composite must equal the palette exactly
    np.testing.assert_array_equal(got, palette[mask % 20].astype(np.uint8))


def test_p53_pack_round_trip(rng):
    """5-bit class + 3-bit conf in one byte: class exact, conf to 32."""
    mask = rng.integers(0, 21, (2, 8, 8)).astype(np.uint8)
    conf = rng.integers(0, 256, (2, 8, 8)).astype(np.uint8)
    packed = (mask << 3) | (conf >> 5)
    m2, c2 = packed >> 3, (packed & 7) << 5
    np.testing.assert_array_equal(m2, mask)
    assert np.abs(c2.astype(int) - conf.astype(int)).max() < 32


def test_confq_quarter_res_round_trip(rng):
    """Quarter-res conf: device 2x2 mean, host 2x nearest upsample."""
    conf = rng.integers(0, 256, (1, 8, 16)).astype(np.uint8)
    c4 = conf.reshape(1, 4, 2, 8, 2).astype(np.uint16)
    confq = (c4.sum(axis=(2, 4)) // 4).astype(np.uint8)
    up = confq.repeat(2, axis=1).repeat(2, axis=2)
    assert up.shape == conf.shape
    # each 2x2 block's upsampled value is its own mean
    blocks = conf.reshape(1, 4, 2, 8, 2).astype(int).mean(axis=(2, 4))
    err = np.abs(up.reshape(1, 4, 2, 8, 2)[:, :, 0, :, 0].astype(float)
                 - blocks)
    assert err.max() <= 1.0


def test_confq6_bitpack_round_trip(rng):
    """6-bit class ids, 4 pixels -> 3 bytes: LOSSLESS (bench default)."""
    m = rng.integers(0, 64, (2, 48)).astype(np.uint8)  # full 6-bit range
    q = m.reshape(2, -1, 4)
    packed = np.stack([
        (q[..., 0] | (q[..., 1] << 6)).astype(np.uint8),
        ((q[..., 1] >> 2) | (q[..., 2] << 4)).astype(np.uint8),
        ((q[..., 2] >> 4) | (q[..., 3] << 2)).astype(np.uint8),
    ], axis=-1).reshape(2, -1)
    t = packed.reshape(2, -1, 3)
    b0, b1, b2 = t[..., 0], t[..., 1], t[..., 2]
    back = np.stack([
        b0 & 63,
        (b0 >> 6) | ((b1 & 15) << 2),
        (b1 >> 4) | ((b2 & 3) << 4),
        b2 >> 2,
    ], axis=-1).reshape(2, -1)
    np.testing.assert_array_equal(back, m)
    assert packed.shape[1] == m.shape[1] * 3 // 4
