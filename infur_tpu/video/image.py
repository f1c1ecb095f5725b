"""Still-image source: image files served through the video decoder contract.

The reference supports "ONNX model inference on video and images"
(reference Cargo.toml:9) through one code path — ffmpeg's ``image2pipe``
demuxer decodes an image file to a single rawvideo frame, after which the
pipe hits EOF and the player's silent EOF close retains the last frame
(reference infur/src/processing.rs:133-135), so a still image displays —
and keeps re-rendering through scale/model changes — statically.

This decoder reproduces that behavior natively (PIL decode, no ffmpeg
binary needed): each input path is one frame, frames are served in input
order with monotonically increasing ids, then :class:`VideoEOF`.  ``fps``
reports 25.0, ffmpeg's default image2pipe rate.  Mixed dimensions across
inputs are a typed startup error (ffmpeg likewise refuses to concatenate
mismatched rawvideo geometry into one pipe).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from infur_tpu.errors import VideoEOF, VideoStartError

#: Extensions routed to this decoder by ``open_video`` (PIL-decodable,
#: plus ``.npy`` for raw (H, W, 3) uint8 BGR arrays).
IMAGE_EXTS = frozenset(
    {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff", ".npy"})

IMAGE_FPS = 25.0  # ffmpeg's default image2pipe frame rate


def is_image_path(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in IMAGE_EXTS


def _load_bgr(path: str) -> np.ndarray:
    """Decode one image file to (H, W, 3) uint8 BGR."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        try:
            arr = np.load(path)
        except (OSError, ValueError) as e:
            raise VideoStartError(f"cannot load image {path!r}", str(e)) from e
        if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
            raise VideoStartError(
                f"{path!r}: .npy image must be (H, W, 3) uint8 BGR, "
                f"got shape {arr.shape} dtype {arr.dtype}")
        return np.ascontiguousarray(arr)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is in the base image
        raise VideoStartError("PIL is required to decode image files",
                              str(e)) from e
    try:
        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"))
    except (OSError, ValueError) as e:
        raise VideoStartError(f"cannot decode image {path!r}", str(e)) from e
    return np.ascontiguousarray(rgb[:, :, ::-1])  # RGB -> BGR frame currency


class ImageDecoder:
    """One frame per input image, then EOF (see module docstring)."""

    def __init__(self, paths: Sequence[str], pix_fmt: str = "bgr24"):
        if not paths:
            raise VideoStartError("no image inputs given")
        if pix_fmt not in ("bgr24", "yuv420p"):
            raise VideoStartError(f"unsupported pix_fmt {pix_fmt!r}")
        self.pix_fmt = pix_fmt
        self._frames = [_load_bgr(p) for p in paths]
        h, w = self._frames[0].shape[:2]
        for p, f in zip(paths, self._frames):
            if f.shape[:2] != (h, w):
                raise VideoStartError(
                    f"image dimensions differ: {paths[0]!r} is {w}x{h}, "
                    f"{p!r} is {f.shape[1]}x{f.shape[0]}")
        if pix_fmt == "yuv420p" and (w % 2 or h % 2):
            raise VideoStartError(
                f"yuv420p needs even dimensions, got {w}x{h}")
        self.width, self.height, self.fps = w, h, IMAGE_FPS
        self._next = 0

    def empty_image(self) -> np.ndarray:
        if self.pix_fmt == "yuv420p":
            return np.empty(self.width * self.height * 3 // 2, np.uint8)
        return np.empty((self.height, self.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        if self._next >= len(self._frames):
            raise VideoEOF("end of image sequence")
        bgr = self._frames[self._next]
        if self.pix_fmt == "yuv420p":
            from infur_tpu.ops.yuv import bgr_to_i420
            img[...] = bgr_to_i420(bgr)
        else:
            img[...] = bgr
        self._next += 1
        return self._next  # 1-based ids like every decoder here

    def seek(self, frame_index: int) -> int:
        self._next = max(0, min(int(frame_index), len(self._frames) - 1))
        return self._next

    def close(self) -> None:
        self._frames = []
        self._next = 0
