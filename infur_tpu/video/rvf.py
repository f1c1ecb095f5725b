"""RVF — a trivial raw-video container (``.rvf``).

The reference pipes ``-f image2pipe -pix_fmt bgr24 -c:v rawvideo`` out of an
ffmpeg subprocess and reads exact w*h*3-byte frames
(reference ff-video/src/decoder.rs:32-37,156-165).  This environment has no
ffmpeg binary, so the framework defines its own on-disk raw format carrying the
same payload: a fixed 32-byte header followed by packed BGR24 frames.  It is
the fixture currency of the test suite and a first-class input format of the
decoder facade.

Layout (little-endian):

    offset  size  field
    0       4     magic b"RVF1"
    4       4     width   (u32)
    8       4     height  (u32)
    12      4     fps numerator   (u32)
    16      4     fps denominator (u32)
    20      4     frame count     (u32)
    24      4     fourcc, b"BGR3" (packed 8-bit BGR, row-major)
    28      4     reserved (zeros)
    32      -     frames: count * width*height*3 bytes
"""

from __future__ import annotations

import io
import os
import struct
from dataclasses import dataclass

import numpy as np

from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError

MAGIC = b"RVF1"
FOURCC = b"BGR3"          # packed 8-bit BGR
FOURCC_I420 = b"I420"     # planar YUV 4:2:0 (decode-native, half the bytes)
FOURCCS = (FOURCC, FOURCC_I420)
HEADER = struct.Struct("<4sIIIII4s4x")
assert HEADER.size == 32


@dataclass(frozen=True)
class RvfHeader:
    width: int
    height: int
    fps_num: int
    fps_den: int
    count: int
    fourcc: bytes = FOURCC

    @property
    def fps(self) -> float:
        return self.fps_num / self.fps_den

    @property
    def frame_bytes(self) -> int:
        if self.fourcc == FOURCC_I420:
            return self.width * self.height * 3 // 2
        return self.width * self.height * 3


class RvfWriter:
    """Streaming writer; patches the frame count into the header on close."""

    def __init__(self, path: str | os.PathLike, width: int, height: int,
                 fps: float | tuple[int, int] = 30, fourcc: bytes = FOURCC):
        if isinstance(fps, tuple):
            fps_num, fps_den = fps
        else:
            fps_num, fps_den = int(round(fps * 1000)), 1000
        if fourcc not in FOURCCS:
            raise ValueError(f"unsupported fourcc {fourcc!r}")
        self._f = open(path, "wb")
        self._hdr = RvfHeader(width, height, fps_num, fps_den, 0, fourcc)
        self._count = 0
        self._f.write(HEADER.pack(MAGIC, width, height, fps_num, fps_den, 0, fourcc))

    def write_frame(self, img: np.ndarray) -> None:
        h, w = self._hdr.height, self._hdr.width
        if self._hdr.fourcc == FOURCC_I420:
            if img.dtype != np.uint8 or img.size != self._hdr.frame_bytes:
                raise ValueError(
                    f"I420 frame must be {self._hdr.frame_bytes} uint8 bytes, "
                    f"got {img.dtype} size {img.size}")
        elif img.shape != (h, w, 3) or img.dtype != np.uint8:
            raise ValueError(f"frame must be uint8 ({h},{w},3), got {img.dtype} {img.shape}")
        self._f.write(np.ascontiguousarray(img).tobytes())
        self._count += 1

    def close(self) -> None:
        if self._f.closed:
            return
        self._f.seek(20)
        self._f.write(struct.pack("<I", self._count))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RvfReader:
    """Sequential frame reader with reusable caller-owned output buffers.

    ``read_frame_into`` follows the reference decoder contract: one exact
    frame-sized read into a caller-owned buffer, a monotonically increasing
    frame id, EOF distinguished from truncation
    (reference ff-video/src/decoder.rs:156-165).
    """

    def __init__(self, path_or_file: str | os.PathLike | io.BufferedIOBase):
        if hasattr(path_or_file, "read"):
            self._f = path_or_file
            self._owns = False
        else:
            try:
                self._f = open(path_or_file, "rb")
            except OSError as e:
                raise VideoStartError(f"cannot open {path_or_file}", str(e)) from e
            self._owns = True
        raw = self._f.read(HEADER.size)
        if len(raw) != HEADER.size:
            raise VideoStartError("truncated RVF header")
        magic, w, h, num, den, count, fourcc = HEADER.unpack(raw)
        if magic != MAGIC:
            raise VideoStartError(f"bad RVF magic {magic!r}")
        if fourcc not in FOURCCS:
            raise VideoStartError(f"unsupported RVF fourcc {fourcc!r}")
        if w == 0 or h == 0 or den == 0:
            raise VideoStartError(f"degenerate RVF header {w}x{h}@{num}/{den}")
        self.header = RvfHeader(w, h, num, den, count, fourcc)
        self._frame_id = 0

    def empty_image(self) -> np.ndarray:
        """Allocate a correctly-sized frame buffer (reference decoder.rs:150-153).
        BGR frames are (H, W, 3); I420 frames are flat (frame_bytes,)."""
        if self.header.fourcc == FOURCC_I420:
            return np.empty(self.header.frame_bytes, np.uint8)
        return np.empty((self.header.height, self.header.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        """Read the next frame into ``img``; return its 1-based frame id.

        Raises :class:`VideoEOF` at clean end-of-file and
        :class:`VideoReadError` on a truncated frame.
        """
        n = self.header.frame_bytes
        if img.nbytes != n or not img.flags.c_contiguous:
            raise VideoReadError(
                f"need a contiguous {n}-byte buffer, got {img.nbytes} B "
                f"(contiguous={img.flags.c_contiguous})")
        got = self._f.readinto(memoryview(img.reshape(-1).view(np.uint8)))
        if got == 0:
            raise VideoEOF("end of RVF stream")
        if got != n:
            raise VideoReadError(f"truncated frame: {got}/{n} bytes")
        self._frame_id += 1
        return self._frame_id

    def seek(self, frame_index: int) -> int:
        """Random access (fixed frame size): position so the next read
        returns frame ``frame_index`` (0-based), clamped; returns the
        landed index.  This is what makes RVF sources seekable in the
        player (reference README todo: video seeking)."""
        idx = max(0, min(int(frame_index), max(self.header.count - 1, 0)))
        self._f.seek(HEADER.size + idx * self.header.frame_bytes)
        self._frame_id = idx
        return idx

    def close(self) -> None:
        if self._owns:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_rvf(path: str | os.PathLike, frames: np.ndarray, fps: float = 30) -> None:
    """Write a (N,H,W,3) uint8 array as an RVF file."""
    n, h, w, c = frames.shape
    assert c == 3
    with RvfWriter(path, w, h, fps) as wtr:
        for i in range(n):
            wtr.write_frame(frames[i])


def read_rvf(path: str | os.PathLike) -> tuple[RvfHeader, np.ndarray]:
    """Read an entire RVF file into memory as (header, (N,H,W,3) uint8)."""
    with RvfReader(path) as rdr:
        h = rdr.header
        out = np.empty((h.count, h.height, h.width, 3), np.uint8)
        for i in range(h.count):
            rdr.read_frame_into(out[i])
    return h, out
