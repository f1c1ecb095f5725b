"""Decoder facade: one ``open_video(inputs)`` for every source kind.

Dispatch (first input decides):

* ``synth:WxH@FPS:D``  -> :class:`SynthDecoder` (procedural test pattern)
* ``*.rvf``            -> :class:`RvfDecoder` (native raw container)
* image files (png/jpg/...) -> :class:`~infur_tpu.video.image.ImageDecoder`
  (one frame per input then EOF — the reference's "images" capability,
  reference Cargo.toml:9, served by ffmpeg image2pipe there)
* anything else        -> ffmpeg subprocess decoder: the C++ ``ffpipe`` ring
  (csrc/, preferred) or the pure-Python pipe reader — both run
  ``ffmpeg ... -pix_fmt bgr24 -c:v rawvideo pipe:1`` and read exact
  frame-sized chunks (capability of reference ff-video/src/decoder.rs).

All decoders share one contract (the reference decoder's interface,
ff-video/src/decoder.rs:18-28): ``width/height/fps`` known after construction,
``empty_image()`` allocates a frame buffer, ``read_frame_into(buf) -> id``
with monotonically increasing ids, EOF raised as :class:`VideoEOF`,
``close()`` is graceful and idempotent.
"""

from __future__ import annotations

import os
import queue
import shutil
import subprocess
import threading
from typing import Protocol, Sequence

import numpy as np

from infur_tpu.errors import VideoEOF, VideoReadError, VideoStartError
from infur_tpu.video.info import FrameUpdate, InfoParser, Section, Stream, split_lines
from infur_tpu.video.rvf import RvfReader
from infur_tpu.video.testsrc import SynthSpec, synth_spec_from_url, testsrc_frame

HEADER_TIMEOUT_S = 10.0  # reference blocks <=10s for the stream header (decoder.rs:89-111)


class VideoDecoder(Protocol):
    width: int
    height: int
    fps: float

    def empty_image(self) -> np.ndarray: ...
    def read_frame_into(self, img: np.ndarray) -> int: ...
    def close(self) -> None: ...


class SynthDecoder:
    """Procedural pattern source; infinite unless the spec bounds frames."""

    def __init__(self, spec: SynthSpec, pix_fmt: str = "bgr24"):
        if pix_fmt == "yuv420p" and (spec.width % 2 or spec.height % 2):
            raise VideoStartError(
                f"yuv420p needs even dimensions, got {spec.width}x{spec.height}")
        self.spec = spec
        self.width, self.height, self.fps = spec.width, spec.height, spec.fps
        self.pix_fmt = pix_fmt
        self._next = 0

    def empty_image(self) -> np.ndarray:
        if self.pix_fmt == "yuv420p":
            return np.empty(self.width * self.height * 3 // 2, np.uint8)
        return np.empty((self.height, self.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        if self._next >= self.spec.count:
            raise VideoEOF("end of synth clip")
        if self.pix_fmt == "yuv420p":
            from infur_tpu.ops.yuv import bgr_to_i420
            bgr = np.empty((self.height, self.width, 3), np.uint8)
            testsrc_frame(self.spec, self._next, bgr)
            img[...] = bgr_to_i420(bgr)
        else:
            testsrc_frame(self.spec, self._next, img)
        self._next += 1
        return self._next  # 1-based ids like the reference frame counter

    def seek(self, frame_index: int) -> int:
        """Jump so the next read returns frame ``frame_index`` (0-based);
        returns the landed index (clamped to the clip)."""
        self._next = max(0, min(int(frame_index), self.spec.count - 1))
        return self._next

    def close(self) -> None:
        pass


class RvfDecoder:
    def __init__(self, path: str):
        self._rdr = RvfReader(path)
        h = self._rdr.header
        self.header = h  # VideoPlayer reads fourcc for the frame format
        self.pix_fmt = "yuv420p" if h.fourcc == b"I420" else "bgr24"
        self.width, self.height, self.fps = h.width, h.height, h.fps

    def empty_image(self) -> np.ndarray:
        return self._rdr.empty_image()

    def read_frame_into(self, img: np.ndarray) -> int:
        return self._rdr.read_frame_into(img)

    def seek(self, frame_index: int) -> int:
        return self._rdr.seek(frame_index)

    def close(self) -> None:
        self._rdr.close()


def frame_nbytes(pix_fmt: str, w: int, h: int) -> int:
    if pix_fmt == "bgr24":
        return w * h * 3
    if pix_fmt == "yuv420p":
        return w * h * 3 // 2
    raise VideoStartError(f"unsupported pix_fmt {pix_fmt!r}")


def ffmpeg_args(inputs: Sequence[str], pix_fmt: str = "bgr24",
                start_secs: float = 0.0) -> list[str]:
    """The rawvideo-pipe command line (same contract as decoder.rs:32-37).

    ``pix_fmt="yuv420p"`` ships decode-native planar frames at half the
    bytes; the device converts (infur_tpu.ops.yuv).  ``start_secs`` > 0
    adds an input-side ``-ss`` (fast seek) — the pipe path's Seek."""
    args = ["ffmpeg", "-hide_banner"]
    for inp in inputs:
        if start_secs > 0:
            args += ["-ss", f"{start_secs:.3f}"]
        args += ["-i", inp]
    args += ["-an", "-f", "image2pipe", "-fflags", "nobuffer",
             "-pix_fmt", pix_fmt, "-c:v", "rawvideo", "pipe:1"]
    return args


class FfmpegPipeDecoder:
    """Pure-Python ffmpeg subprocess decoder.

    Spawns ffmpeg with stdin/stdout/stderr piped; a companion thread parses
    stderr for the *Output* stream header (geometry + fps) and live
    ``frame=`` telemetry; frames are exact ``w*h*3``-byte reads off stdout.
    Graceful close: write ``b"q"`` to stdin, drain stdout so ffmpeg can flush,
    wait, map nonzero exit to an error (reference decoder.rs:119-148).
    """

    def __init__(self, inputs: Sequence[str], _argv: Sequence[str] | None = None,
                 pix_fmt: str = "bgr24", start_secs: float = 0.0):
        self.pix_fmt = pix_fmt
        argv = list(_argv) if _argv is not None \
            else ffmpeg_args(inputs, pix_fmt, start_secs)
        try:
            self._proc = subprocess.Popen(
                argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, bufsize=0)
        except OSError as e:
            raise VideoStartError(f"cannot spawn {argv[0]}", str(e)) from e

        self._hdr_q: queue.Queue[Stream] = queue.Queue(2)
        self._parser = InfoParser()
        self.last_update: FrameUpdate | None = None
        self._info_thread = threading.Thread(
            target=self._pump_stderr, name="video-info", daemon=True)
        self._info_thread.start()

        try:
            stream = self._hdr_q.get(timeout=HEADER_TIMEOUT_S)
        except queue.Empty:
            last = self._parser.state()
            self._proc.kill()
            raise VideoStartError("no output stream header within timeout", last)
        self.width, self.height, self.fps = stream.width, stream.height, stream.fps
        self._frame_id = 0
        self._closed = False

    def _pump_stderr(self) -> None:
        def chunks():
            while True:
                b = self._proc.stderr.read(4096)
                if not b:
                    return
                yield b
        for line in split_lines(chunks()):
            try:
                info = self._parser.push(line)
            except Exception:
                continue  # tolerate unparseable sideband lines
            if isinstance(info, Stream) and info.section is Section.OUTPUT:
                try:
                    self._hdr_q.put_nowait(info)
                except queue.Full:
                    pass
            elif isinstance(info, FrameUpdate):
                self.last_update = info

    def empty_image(self) -> np.ndarray:
        if self.pix_fmt != "bgr24":
            return np.empty(frame_nbytes(self.pix_fmt, self.width, self.height),
                            np.uint8)
        return np.empty((self.height, self.width, 3), np.uint8)

    def read_frame_into(self, img: np.ndarray) -> int:
        n = frame_nbytes(self.pix_fmt, self.width, self.height)
        if img.nbytes != n or not img.flags.c_contiguous:
            raise VideoReadError(
                f"need a contiguous {n}-byte buffer, got {img.nbytes} B "
                f"(contiguous={img.flags.c_contiguous})")
        view = memoryview(img.reshape(-1).view(np.uint8))
        got = 0
        while got < n:
            k = self._proc.stdout.readinto(view[got:])
            if not k:
                break
            got += k
        if got == 0:
            rc = self._proc.poll()
            if rc in (0, None):
                raise VideoEOF("video finished")
            raise VideoReadError(f"ffmpeg exited with code {rc}: {self._parser.state()!r}")
        if got != n:
            raise VideoReadError(f"truncated frame: {got}/{n} bytes")
        self._frame_id += 1
        return self._frame_id

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            self._proc.stdin.write(b"q")
            self._proc.stdin.flush()
        except OSError:
            pass
        try:  # drain stdout so ffmpeg can flush and exit
            while self._proc.stdout.read(1 << 16):
                pass
        except OSError:
            pass
        self._proc.stdin.close()
        try:
            rc = self._proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            self._proc.kill()
            self._proc.wait()
            raise VideoReadError(
                f"ffmpeg did not exit after 'q': {self._parser.state()!r}")
        finally:
            self._info_thread.join(timeout=2)
        if rc not in (0, 255):  # 255 = interrupted by 'q', normal for live inputs
            raise VideoReadError(f"ffmpeg exit code {rc}: {self._parser.state()!r}")


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def open_video(inputs: Sequence[str], pix_fmt: str = "bgr24",
               start_secs: float = 0.0) -> VideoDecoder:
    """Open any supported source; see module docstring for dispatch rules.

    ``pix_fmt="yuv420p"`` requests decode-native planar frames.  RVF files
    serve their stored format regardless (the container dictates).
    ``start_secs`` applies to ffmpeg pipe sources (input-side -ss); the
    natively seekable sources use their ``seek`` method instead."""
    if not inputs:
        raise VideoStartError("no video input given")
    first = inputs[0]
    spec = synth_spec_from_url(first)
    if spec is not None:
        return SynthDecoder(spec, pix_fmt=pix_fmt)
    if first.startswith("live:"):
        from infur_tpu.video.live import resolve_live_source
        return resolve_live_source(first)
    if first.startswith("camera:"):
        from infur_tpu.video.live import open_camera
        return open_camera(first, pix_fmt=pix_fmt)
    if first.endswith(".rvf"):
        return RvfDecoder(first)
    from infur_tpu.video.image import ImageDecoder, is_image_path
    if is_image_path(first):
        return ImageDecoder(inputs, pix_fmt=pix_fmt)
    if not have_ffmpeg():
        raise VideoStartError(
            f"cannot open {first!r}: no ffmpeg on this host "
            "(only synth: and .rvf sources are available)")
    try:
        from infur_tpu.video.ffpipe import FfpipeDecoder, have_ffpipe
        if have_ffpipe():
            return FfpipeDecoder(inputs, pix_fmt=pix_fmt,
                                 start_secs=start_secs)
    except ImportError:
        pass
    return FfmpegPipeDecoder(inputs, pix_fmt=pix_fmt, start_secs=start_secs)
