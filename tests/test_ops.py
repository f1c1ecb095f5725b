"""Device pre/post-processing ops: parity with host stages + contracts."""

import numpy as np
import pytest

from infur_tpu.ops import PreProc, color_code, make_palette, overlay, preprocess
from infur_tpu.processing import resize_nearest


@pytest.fixture()
def frame(rng):
    return rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)


def test_preprocess_matches_host_scale_and_norm(frame):
    """Device fusion == host Scale(nearest) then torchvision-style norm."""
    cfg = PreProc.imagenet(out_hw=(24, 32))
    got = np.asarray(preprocess(frame, cfg))
    small = resize_nearest(frame, 24, 32)
    rgb = small[..., ::-1].astype(np.float32) / 255.0
    want = (rgb - np.float32(cfg.mean)) / np.float32(cfg.std)
    want = np.transpose(want, (2, 0, 1))[None]
    assert got.shape == (1, 3, 24, 32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_preprocess_u8_bgr_passthrough(frame):
    """u8 path keeps bytes exact (quantized-model input contract)."""
    cfg = PreProc(out_hw=(48, 64), layout="NHWC", dtype="u8", channel_order="bgr")
    got = np.asarray(preprocess(frame, cfg))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got[0], frame)


def test_preprocess_bilinear_differs_from_nearest(frame):
    near = preprocess(frame, PreProc.imagenet(out_hw=(24, 32)))
    bil = preprocess(frame, PreProc.imagenet(out_hw=(24, 32), interp="bilinear"))
    assert np.abs(np.asarray(near) - np.asarray(bil)).max() > 1e-3


def test_color_code_contract(rng):
    """Argmax color + confidence alpha (reference decode_predict.rs:99-116:
    linspace scores => last class wins everywhere, alpha rises to 255)."""
    k, h, w = 4, 6, 8
    scores = np.linspace(0, 1, k * h * w, dtype=np.float32).reshape(k, h, w)
    rgba = np.asarray(color_code(scores))
    assert rgba.shape == (h, w, 4)
    pal = make_palette()
    np.testing.assert_array_equal(
        rgba[..., :3].reshape(-1, 3), np.tile(pal[(k - 1) % 20], (h * w, 1)))
    alpha = rgba[..., 3].ravel()
    assert (np.diff(alpha.astype(np.int32)) >= 0).all()
    assert alpha[-1] == 255


def test_color_code_softmax_alpha():
    scores = np.zeros((3, 2, 2), np.float32)  # uniform logits
    rgba = np.asarray(color_code(scores, apply_softmax=True))
    assert (rgba[..., 3] == 85).all()  # 1/3 * 255 = 85


def test_overlay_composites_and_upsamples(frame):
    k = 5
    scores = np.zeros((k, 24, 32), np.float32)
    scores[2] = 1.0  # class 2 with full confidence everywhere
    rgba = np.asarray(overlay(frame, scores))
    assert rgba.shape == (48, 64, 4)
    assert (rgba[..., 3] == 255).all()
    np.testing.assert_array_equal(
        rgba[..., :3].reshape(-1, 3), np.tile(make_palette()[2], (48 * 64, 1)))


def test_overlay_zero_confidence_is_frame(frame):
    scores = np.zeros((3, 48, 64), np.float32)
    rgba = np.asarray(overlay(frame, scores))
    np.testing.assert_array_equal(rgba[..., :3], frame[..., ::-1])


def test_palette_distinct():
    pal = make_palette()
    assert pal.shape == (20, 3)
    assert len({tuple(c) for c in pal}) == 20


def test_class_histogram_and_labels(rng):
    from infur_tpu.ops.colorcode import class_histogram, class_labels
    scores = rng.normal(size=(5, 8, 9)).astype(np.float32)
    counts = np.asarray(class_histogram(scores))
    assert counts.sum() == 8 * 9
    np.testing.assert_array_equal(
        counts, np.bincount(scores.argmax(0).ravel(), minlength=5))
    assert class_labels(21)[15] == "person"
    assert class_labels(5) == tuple(f"class {i}" for i in range(5))
