"""Live video sources behind the standard decoder contract.

Two scaffolds (VERDICT r2 #9 — a real camera drops in with no new
surface):

* :class:`PushSource` — a queue-fed live decoder for in-process producers
  (a webcam bridge, a network receiver, a synthetic generator thread).
  Producers call :meth:`push`; the pipeline side sees the ordinary
  ``width/height/fps / empty_image / read_frame_into / close`` contract
  (reference ff-video decoder surface, decoder.rs:18-28).  Live semantics:
  a bounded latest-wins buffer — when the consumer falls behind, old
  frames DROP (a camera never blocks on its consumer, unlike the file
  pipe whose OS-pipe backpressure stalls ffmpeg, SURVEY §3.1).
* ``camera:<device>`` URLs — resolved to an ffmpeg capture-device command
  line (v4l2 on Linux, avfoundation on macOS, dshow on Windows) and
  decoded by the ordinary pipe decoder.  Code-ready: raises the typed
  start error until a real ffmpeg + device exist (tests drive the arg
  construction and the shim path).
"""

from __future__ import annotations

import sys
import threading
from collections import deque

import numpy as np

from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError


class PushSource:
    """Producer-fed live source (decoder contract on the consumer side).

    ``fps`` is nominal (telemetry/UI); frames are (H, W, 3) BGR u8.
    ``depth`` bounds the live buffer — newest wins, older frames drop.
    ``timeout`` bounds ``read_frame_into`` waiting on a stalled producer
    (a typed read error, not a hang — the scheduler surfaces it).
    """

    def __init__(self, width: int, height: int, fps: float = 30.0,
                 depth: int = 2, timeout: float = 10.0):
        if width < 1 or height < 1:
            raise VideoStartError(f"bad geometry {width}x{height}")
        self.width, self.height, self.fps = int(width), int(height), float(fps)
        self.pix_fmt = "bgr24"
        self._timeout = timeout
        self._lock = threading.Lock()
        self._have = threading.Condition(self._lock)
        self._buf: deque[np.ndarray] = deque(maxlen=max(1, depth))
        self._dropped = 0
        self._pushed = 0
        self._frame_id = 0
        self._closed = False

    # ---- producer side ----

    def push(self, frame_bgr: np.ndarray) -> None:
        """Queue one frame (any thread).  Latest-wins past ``depth``."""
        a = np.asarray(frame_bgr, np.uint8)
        if a.shape != (self.height, self.width, 3):
            raise VideoReadError(
                f"pushed frame is {a.shape}, source is "
                f"{(self.height, self.width, 3)}")
        with self._have:
            if self._closed:
                raise VideoEOF("push after close")
            if len(self._buf) == self._buf.maxlen:
                self._dropped += 1
            self._buf.append(a.copy())
            self._pushed += 1
            self._have.notify()

    @property
    def dropped(self) -> int:
        """Frames overwritten before the consumer read them (live-source
        analog of the GUI drop counter, reference gui.rs:55-75)."""
        with self._lock:
            return self._dropped

    # ---- decoder contract (consumer side) ----

    def empty_image(self) -> np.ndarray:
        return np.empty((self.height, self.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        with self._have:
            if not self._have.wait_for(
                    lambda: self._buf or self._closed, timeout=self._timeout):
                raise VideoReadError(
                    f"live source stalled (> {self._timeout:.0f} s "
                    "without a frame)")
            if not self._buf:  # closed and drained: clean end of stream
                raise VideoEOF("live source closed")
            frame = self._buf.popleft()
            self._frame_id += 1
        img[...] = frame
        return self._frame_id

    def close(self) -> None:
        with self._have:
            self._closed = True
            self._have.notify_all()


_LIVE_SOURCES: dict[str, PushSource] = {}
_LIVE_LOCK = threading.Lock()


def register_live_source(name: str, source: PushSource) -> str:
    """Register a :class:`PushSource` under ``live:<name>`` so any
    frontend can Play it through the ordinary command path (a live object
    can't travel in a URL; the registry bridges the gap)."""
    with _LIVE_LOCK:
        _LIVE_SOURCES[name] = source
    return f"live:{name}"


def resolve_live_source(url: str) -> PushSource:
    name = url.partition(":")[2]
    with _LIVE_LOCK:
        src = _LIVE_SOURCES.get(name)
    if src is None:
        raise VideoStartError(
            f"no live source registered as {name!r} "
            f"(have: {sorted(_LIVE_SOURCES)})")
    return src


def camera_args(device: str, pix_fmt: str = "bgr24",
                platform: str | None = None) -> list[str]:
    """ffmpeg capture-device command line for ``camera:<device>`` URLs.

    The input side selects the OS capture demuxer; the output side is the
    exact rawvideo-pipe contract every pipe decoder speaks
    (decoder.ffmpeg_args, reference decoder.rs:32-37).
    """
    plat = platform or sys.platform
    if plat.startswith("linux"):
        dev = device or "/dev/video0"
        if not dev.startswith("/dev/"):
            dev = f"/dev/video{dev}"
        inp = ["-f", "v4l2", "-i", dev]
    elif plat == "darwin":
        inp = ["-f", "avfoundation", "-framerate", "30", "-i", device or "0"]
    elif plat in ("win32", "cygwin"):
        inp = ["-f", "dshow", "-i", f"video={device or 'default'}"]
    else:
        raise VideoStartError(f"no camera capture backend for {plat!r}")
    return (["ffmpeg", "-hide_banner"] + inp
            + ["-an", "-f", "image2pipe", "-fflags", "nobuffer",
               "-pix_fmt", pix_fmt, "-c:v", "rawvideo", "pipe:1"])


def open_camera(url: str, pix_fmt: str = "bgr24"):
    """``camera:<device>`` -> a live pipe decoder (needs a real ffmpeg)."""
    from infur_tpu.video.decoder import FfmpegPipeDecoder, have_ffmpeg

    device = url.partition(":")[2]
    if not have_ffmpeg():
        raise VideoStartError(
            f"cannot open {url!r}: no ffmpeg on this host")
    argv = camera_args(device, pix_fmt=pix_fmt)
    return FfmpegPipeDecoder([url], _argv=argv, pix_fmt=pix_fmt)
