"""Pallas kernels (interpret mode on CPU; hardware parity is driven by the
verify recipe on the real chip)."""

import numpy as np
import pytest

from infur_tpu.ops.colorcode import color_code, make_palette, overlay
from infur_tpu.ops.pallas_colorcode import argmax_conf_pallas, color_code_pallas
from infur_tpu.ops.pallas_overlay import overlay_pallas


@pytest.fixture()
def scores(rng):
    return rng.normal(size=(21, 67, 93)).astype(np.float32)  # awkward dims


def test_argmax_conf_matches_numpy(scores):
    m, c = argmax_conf_pallas(scores, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), scores.argmax(0))
    np.testing.assert_allclose(np.asarray(c), scores.max(0), rtol=1e-6)


def test_color_code_pallas_matches_jnp(scores):
    pal = make_palette()
    want = np.asarray(color_code(scores))
    got = np.asarray(color_code_pallas(scores, pal, interpret=True))
    np.testing.assert_array_equal(want, got)


def test_overlay_pallas_matches_jnp(rng, scores):
    frame = rng.integers(0, 255, (134, 186, 3), dtype=np.uint8)
    want = np.asarray(overlay(frame, scores))          # scores upsampled 2x
    got = np.asarray(overlay_pallas(frame, scores, interpret=True))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_overlay_pallas_softmax(rng, scores):
    frame = rng.integers(0, 255, (67, 93, 3), dtype=np.uint8)
    want = np.asarray(overlay(frame, scores, apply_softmax=True))
    got = np.asarray(overlay_pallas(frame, scores, apply_softmax=True,
                                    interpret=True))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_tiny_single_tile(rng):
    """Sub-tile inputs exercise the padding path."""
    scores = rng.normal(size=(4, 5, 7)).astype(np.float32)
    m, c = argmax_conf_pallas(scores, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), scores.argmax(0))


def test_i420_preprocess_kernel_matches_reference_chain(rng):
    """Fused YUV->normalized-RGB affine == the i420_to_rgbf + normalize
    chain (gamut clip included)."""
    from infur_tpu.ops.pallas_preprocess import i420_to_normalized_pallas
    from infur_tpu.ops.preprocess import IMAGENET_MEAN_RGB, IMAGENET_STD_RGB
    from infur_tpu.ops.yuv import bgr_to_i420, i420_to_rgbf

    img = rng.integers(0, 255, (46, 62, 3), dtype=np.uint8)
    flat = bgr_to_i420(img)
    got = np.asarray(i420_to_normalized_pallas(flat, 46, 62, interpret=True))
    rgbf = np.asarray(i420_to_rgbf(flat, 46, 62))
    want = (rgbf - np.float32(IMAGENET_MEAN_RGB)) / np.float32(IMAGENET_STD_RGB)
    assert got.shape == (46, 62, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)
