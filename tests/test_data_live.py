"""Dataset loaders + augmentation (infur_tpu.data) and live sources
(infur_tpu.video.live) — VERDICT r2 #9."""

import threading
import time

import numpy as np
import pytest

from infur_tpu.data import (
    Augment, SegmentationData, batches, load_data, load_dir, load_npz,
    normalize_batch,
)
from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError
from infur_tpu.video.live import (
    PushSource, camera_args, register_live_source,
)


def _dataset(n=6, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            for _ in range(n)]
    labs = [rng.integers(-1, 5, size=(h, w)).astype(np.int32)
            for _ in range(n)]
    return SegmentationData(imgs, labs)


# ---------------------------------------------------------------------------
# loaders


def test_npz_round_trip(tmp_path):
    d = _dataset()
    path = tmp_path / "d.npz"
    np.savez(path, images=np.stack(d.images), labels=np.stack(d.labels))
    back = load_npz(str(path))
    assert len(back) == len(d)
    np.testing.assert_array_equal(back.images[2], d.images[2])
    np.testing.assert_array_equal(back.labels[2], d.labels[2])
    # load_data dispatch
    assert len(load_data(str(path))) == len(d)


def test_npz_missing_keys_is_typed(tmp_path):
    path = tmp_path / "bad.npz"
    np.savez(path, x=np.zeros(3))
    with pytest.raises(ValueError, match="images"):
        load_npz(str(path))


def test_dir_loader_npy_pairs(tmp_path):
    d = _dataset(n=3)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, (x, y) in enumerate(zip(d.images, d.labels)):
        np.save(tmp_path / "images" / f"s{i}.npy", x)
        np.save(tmp_path / "labels" / f"s{i}.npy", y)
    back = load_dir(str(tmp_path))
    assert len(back) == 3
    np.testing.assert_array_equal(back.images[0], d.images[0])


def test_dir_loader_png_pairs(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    d = _dataset(n=2)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, (x, y) in enumerate(zip(d.images, d.labels)):
        PIL.fromarray(x[..., ::-1]).save(tmp_path / "images" / f"s{i}.png")
        lab = np.where(y < 0, 255, y).astype(np.uint8)
        PIL.fromarray(lab, mode="L").save(tmp_path / "labels" / f"s{i}.png")
    back = load_dir(str(tmp_path))
    np.testing.assert_array_equal(back.images[1], d.images[1])
    np.testing.assert_array_equal(back.labels[1], d.labels[1])  # 255 -> -1


def test_dir_loader_unpaired_is_typed(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    np.save(tmp_path / "images" / "a.npy", np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="unpaired"):
        load_dir(str(tmp_path))


def test_mismatched_shapes_are_typed():
    with pytest.raises(ValueError, match="sample 0"):
        SegmentationData([np.zeros((4, 4, 3), np.uint8)],
                         [np.zeros((4, 5), np.int32)])


# ---------------------------------------------------------------------------
# batches + augmentation


def test_batches_shapes_and_normalization():
    d = _dataset()
    x, y = next(batches(d, 4, augment=None, shuffle=False))
    assert x.shape == (4, 16, 20, 3) and x.dtype == np.float32
    assert y.shape == (4, 16, 20) and y.dtype == np.int32
    # normalization matches the serving stats exactly (BGR -> RGB too)
    np.testing.assert_allclose(
        x[0], normalize_batch(np.stack(d.images[:1]))[0], rtol=1e-6)
    assert x.min() < -1.5 and x.max() > 1.5  # imagenet-normalized range


def test_batches_deterministic_by_seed():
    d = _dataset()
    a = next(batches(d, 2, seed=7))
    b = next(batches(d, 2, seed=7))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_batches_epochs_bound():
    d = _dataset(n=6)
    got = list(batches(d, 2, augment=None, epochs=2))
    assert len(got) == 6  # 3 batches/epoch * 2 epochs


def test_crop_pads_with_void():
    d = _dataset(n=2, h=8, w=8)
    aug = Augment(hflip=False, brightness=0, contrast=0, crop_hw=(12, 12))
    x, y = next(batches(d, 2, augment=aug))
    assert x.shape[1:3] == (12, 12)
    assert (y[:, 8:, :] == -1).all()  # padded rows supervised as void


def test_mixed_sizes_need_crop():
    imgs = [np.zeros((8, 8, 3), np.uint8), np.zeros((10, 8, 3), np.uint8)]
    labs = [np.zeros((8, 8), np.int32), np.zeros((10, 8), np.int32)]
    d = SegmentationData(imgs, labs)
    with pytest.raises(ValueError, match="crop_hw"):
        next(batches(d, 2, augment=None))
    aug = Augment(crop_hw=(8, 8))
    x, _ = next(batches(d, 2, augment=aug))
    assert x.shape == (2, 8, 8, 3)


def test_finetune_consumes_loader_batches():
    """End-to-end: loader batches drive a real finetune step (tiny model)."""
    import jax

    from infur_tpu.models import init_segformer, segformer_apply
    from infur_tpu.train import finetune

    d = _dataset(n=4, h=32, w=32)
    params = init_segformer(jax.random.PRNGKey(0), variant="b0")
    _, losses = finetune(lambda p, x: segformer_apply(p, x), params,
                         batches(d, 2, seed=1), steps=2, log_every=1)
    assert losses and np.isfinite(losses[-1])


# ---------------------------------------------------------------------------
# live sources


def test_push_source_contract():
    src = PushSource(8, 6, fps=15.0)
    assert (src.width, src.height, src.fps) == (8, 6, 15.0)
    frame = np.full((6, 8, 3), 9, np.uint8)
    src.push(frame)
    buf = src.empty_image()
    assert src.read_frame_into(buf) == 1
    np.testing.assert_array_equal(buf, frame)
    src.close()
    with pytest.raises(VideoEOF):
        src.read_frame_into(buf)


def test_push_source_latest_wins():
    src = PushSource(4, 4, depth=2)
    for v in (1, 2, 3, 4):
        src.push(np.full((4, 4, 3), v, np.uint8))
    assert src.dropped == 2
    buf = src.empty_image()
    src.read_frame_into(buf)
    assert buf[0, 0, 0] == 3  # oldest kept is the depth-2 window's first


def test_push_source_stall_is_typed():
    src = PushSource(4, 4, timeout=0.05)
    with pytest.raises(VideoReadError, match="stalled"):
        src.read_frame_into(src.empty_image())


def test_push_source_bad_shape_is_typed():
    src = PushSource(4, 4)
    with pytest.raises(VideoReadError, match="pushed frame"):
        src.push(np.zeros((5, 4, 3), np.uint8))


def test_push_source_cross_thread():
    src = PushSource(4, 4, timeout=5.0)

    def producer():
        time.sleep(0.05)
        for v in range(3):
            src.push(np.full((4, 4, 3), v, np.uint8))
            time.sleep(0.01)
        src.close()

    t = threading.Thread(target=producer)
    t.start()
    buf = src.empty_image()
    seen = []
    while True:
        try:
            src.read_frame_into(buf)
        except VideoEOF:
            break
        seen.append(int(buf[0, 0, 0]))
    t.join()
    assert seen and seen == sorted(seen)


def test_live_registry_through_open_video():
    from infur_tpu.video.decoder import open_video

    src = PushSource(6, 4)
    url = register_live_source("test-cam", src)
    assert url == "live:test-cam"
    v = open_video([url])
    assert (v.width, v.height) == (6, 4)
    src.push(np.zeros((4, 6, 3), np.uint8))
    buf = v.empty_image()
    assert v.read_frame_into(buf) == 1
    v.close()
    with pytest.raises(VideoStartError, match="registered"):
        open_video(["live:nope"])


def test_live_source_through_video_player():
    """A PushSource drives the full VideoPlayer stage (no new surface)."""
    from infur_tpu.processing import Cell, Play, VideoPlayer

    src = PushSource(6, 4)
    url = register_live_source("player-cam", src)
    p = VideoPlayer()
    p.control(Play((url,)))
    src.push(np.full((4, 6, 3), 7, np.uint8))
    cell = Cell()
    assert p.advance(None, cell)
    assert cell.value.id == 1 and cell.value.img[0, 0, 0] == 7
    p.close()


def test_camera_args_per_platform():
    linux = camera_args("0", platform="linux")
    assert ["-f", "v4l2"] == linux[2:4] and "/dev/video0" in linux
    mac = camera_args("1", platform="darwin")
    assert "avfoundation" in mac
    win = camera_args("", platform="win32")
    assert "dshow" in win
    with pytest.raises(VideoStartError):
        camera_args("0", platform="plan9")
    # output side speaks the exact rawvideo-pipe contract
    assert linux[-1] == "pipe:1" and "rawvideo" in linux


def test_camera_url_without_ffmpeg_is_typed(monkeypatch):
    import infur_tpu.video.decoder as dec

    monkeypatch.setattr(dec, "have_ffmpeg", lambda: False)
    from infur_tpu.video.decoder import open_video

    with pytest.raises(VideoStartError, match="ffmpeg"):
        open_video(["camera:0"])
