"""ctypes binding for the native ffpipe decoder (csrc/ffpipe.cpp).

The C++ library owns the ffmpeg subprocess, a stderr-parsing thread, and a
read-ahead frame ring (decode overlaps compute — the pure-Python pipe
reader in :mod:`infur_tpu.video.decoder` reads synchronously).  The .so is
built lazily with the repo Makefile on first use and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "build", "libffpipe.so")

_lib = None
_lib_lock = threading.Lock()

FFP_OK, FFP_EOF, FFP_ESPAWN, FFP_EHEADER, FFP_EREAD, FFP_EEXIT, FFP_EARG, \
    FFP_ECLOSED = 0, -1, -2, -3, -4, -5, -6, -7


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _CSRC, "-s"], capture_output=True,
                           timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.ffp_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                 ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_double,
                                 ctypes.POINTER(ctypes.c_void_p)]
        lib.ffp_open.restype = ctypes.c_int
        lib.ffp_geometry.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_double)]
        lib.ffp_geometry.restype = ctypes.c_int
        lib.ffp_read_frame.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_size_t]
        lib.ffp_read_frame.restype = ctypes.c_int64
        lib.ffp_last_line.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_size_t]
        lib.ffp_last_line.restype = ctypes.c_int
        lib.ffp_input_geometry.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int),
                                           ctypes.POINTER(ctypes.c_int),
                                           ctypes.POINTER(ctypes.c_double)]
        lib.ffp_input_geometry.restype = ctypes.c_int
        lib.ffp_frame_update.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_double),
                                         ctypes.POINTER(ctypes.c_int64),
                                         ctypes.POINTER(ctypes.c_int64),
                                         ctypes.POINTER(ctypes.c_double)]
        lib.ffp_frame_update.restype = ctypes.c_int64
        lib.ffp_codec_lines.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_size_t]
        lib.ffp_codec_lines.restype = ctypes.c_int
        lib.ffp_close.argtypes = [ctypes.c_void_p]
        lib.ffp_close.restype = ctypes.c_int
        _lib = lib
        return _lib


def have_ffpipe() -> bool:
    return _load() is not None


class FfpipeDecoder:
    """Same contract as the other decoders (width/height/fps,
    read_frame_into, close)."""

    RING_DEPTH = 3

    def __init__(self, inputs: Sequence[str], pix_fmt: str = "bgr24",
                 header_timeout_ms: int = 0, start_secs: float = 0.0):
        """``header_timeout_ms`` <= 0 selects the native default (10 s,
        decoder.rs:89-111); tests shrink it to exercise the timeout path.
        ``start_secs`` > 0 opens at an offset (input-side -ss fast seek)."""
        lib = _load()
        if lib is None:
            raise VideoStartError("ffpipe native library unavailable")
        self._lib = lib
        self.pix_fmt = pix_fmt
        arr = (ctypes.c_char_p * len(inputs))(
            *[i.encode() for i in inputs])
        handle = ctypes.c_void_p()
        rc = lib.ffp_open(arr, len(inputs), self.RING_DEPTH,
                          pix_fmt.encode(), int(header_timeout_ms),
                          float(start_secs), ctypes.byref(handle))
        if rc != FFP_OK:
            raise VideoStartError(
                {FFP_ESPAWN: "cannot spawn ffmpeg",
                 FFP_EHEADER: "no output stream header within timeout"}
                .get(rc, f"ffpipe open error {rc}"))
        self._h = handle
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.ffp_geometry(self._h, ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(fps))
        self.width, self.height, self.fps = w.value, h.value, fps.value
        self._closed = False

    def _last_line(self) -> str:
        buf = ctypes.create_string_buffer(512)
        self._lib.ffp_last_line(self._h, buf, 512)
        return buf.value.decode("utf-8", "replace")

    def last_update(self):
        """Latest decode-progress telemetry (frame= fps= dup= drop= speed=
        stderr lines, reference parse.rs:200-230) as a
        :class:`infur_tpu.video.info.FrameUpdate`, or None if ffmpeg has
        not printed one yet — identical contract to the Python decoder."""
        from infur_tpu.video.info import FrameUpdate
        fps = ctypes.c_double()
        dup = ctypes.c_int64()
        drop = ctypes.c_int64()
        speed = ctypes.c_double()
        frame = self._lib.ffp_frame_update(
            self._h, ctypes.byref(fps), ctypes.byref(dup),
            ctypes.byref(drop), ctypes.byref(speed))
        if frame < 0:
            return None
        return FrameUpdate(
            frame=int(frame),
            fps=fps.value if fps.value >= 0 else None,
            dup=dup.value if dup.value >= 0 else None,
            drop=drop.value if drop.value >= 0 else None,
            speed=speed.value if speed.value >= 0 else None)

    def input_geometry(self) -> tuple[int, int, float] | None:
        """(width, height, fps) of the first INPUT video stream parsed from
        the sideband, or None if none was seen."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        self._lib.ffp_input_geometry(self._h, ctypes.byref(w),
                                     ctypes.byref(h), ctypes.byref(fps))
        if w.value <= 0:
            return None
        return w.value, h.value, fps.value

    def codec_lines(self) -> list[str]:
        """"[codec] ..." stderr lines seen so far (parse.rs:115-117)."""
        buf = ctypes.create_string_buffer(8192)
        self._lib.ffp_codec_lines(self._h, buf, 8192)
        text = buf.value.decode("utf-8", "replace")
        return text.split("\n") if text else []

    def _frame_bytes(self) -> int:
        n = self.width * self.height * 3
        return n // 2 if self.pix_fmt == "yuv420p" else n

    def empty_image(self) -> np.ndarray:
        if self.pix_fmt != "bgr24":
            return np.empty(self._frame_bytes(), np.uint8)
        return np.empty((self.height, self.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        n = self._frame_bytes()
        if img.nbytes != n or not img.flags.c_contiguous:
            raise VideoReadError(
                f"need a contiguous {n}-byte buffer, got {img.nbytes}")
        ptr = img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rid = self._lib.ffp_read_frame(self._h, ptr, n)
        if rid > 0:
            return int(rid)
        if rid == FFP_EOF:
            raise VideoEOF("video finished")
        raise VideoReadError(f"ffpipe read error {rid}: {self._last_line()!r}")

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        code = self._lib.ffp_close(self._h)
        if code not in (0, 255):  # 255 = interrupted by 'q'
            raise VideoReadError(f"ffmpeg exit code {code}")
