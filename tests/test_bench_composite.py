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
