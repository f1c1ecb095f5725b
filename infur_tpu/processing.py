"""Processor protocol and host-side pipeline stages.

The framework's core abstraction, kept from the reference because it is the
right shape for an interactive pipeline (reference infur/src/processing.rs:23-60):
a stage has a typed ``Command`` stream for parameter changes, ``advance``
transforms an input into a caller-owned mutable output (enables buffer reuse
and the retained-intermediates re-render semantics), and ``is_dirty`` reports
whether advancing with the *same* input would produce new output — which
drives both re-render-on-parameter-change and the scheduler's
blocking-vs-polling command intake.

Stages here run on the host (video source, display-path scale).  The model
path runs on the TPU with scaling/normalization fused into the device
preprocess kernel (infur_tpu.ops); :class:`Scale` is the host twin used for
the display frame and for parity tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Generic, Sequence, TypeVar

import numpy as np

from infur_tpu.errors import ScaleError, VideoEOF
from infur_tpu.video.decoder import VideoDecoder, open_video

C = TypeVar("C")  # command
I = TypeVar("I")  # input
O = TypeVar("O")  # output


@dataclass
class Frame:
    """A decoded video frame: monotonically increasing id + uint8 pixels.

    ``fmt="bgr24"``: ``img`` is (H, W, 3) packed BGR.
    ``fmt="i420"``:  ``img`` is the flat planar YUV420 buffer (see
    infur_tpu.ops.yuv) and ``hw`` carries the geometry — the decode-native
    wire format that halves host->device traffic.

    Equality is by id only (reference infur/src/processing.rs:14-18) — two
    Frame objects with the same id are the same logical frame even if one is
    a scaled copy.
    """

    id: int = 0
    img: np.ndarray = field(default_factory=lambda: np.empty((0, 0, 3), np.uint8))
    fmt: str = "bgr24"
    hw: tuple[int, int] | None = None

    @property
    def height_width(self) -> tuple[int, int]:
        return self.hw if self.fmt == "i420" else tuple(self.img.shape[:2])

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Frame) and self.id == other.id


class Cell(Generic[O]):
    """Caller-owned mutable output slot (the streaming-iterator pattern)."""

    __slots__ = ("value",)

    def __init__(self, value: O | None = None):
        self.value: O | None = value


class Processor(Generic[C, I, O]):
    """A pipeline stage. Subclasses implement control/advance/is_dirty."""

    def control(self, cmd: C) -> "Processor[C, I, O]":
        """Apply a parameter change; raise a typed error on invalid commands."""
        raise NotImplementedError

    def advance(self, inp: I, out: Cell[O]):
        """Process ``inp`` into the caller-owned ``out`` slot.

        May return a stage-specific result (the reference's associated
        ``ProcessResult`` type, processing.rs:28-31) — e.g. the video source
        returns whether a frame was actually produced this tick.
        """
        raise NotImplementedError

    def is_dirty(self) -> bool:
        """True if advancing with the same input would write new output."""
        return False

    def generate(self):
        """Sugar for source/sink nodes with ``Input=None``: one advance into
        a fresh cell, returning its value (reference processing.rs:53-59)."""
        cell: Cell = Cell()
        self.advance(None, cell)
        return cell.value


# ---------------------------------------------------------------------------
# VideoPlayer: source stage
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Play:
    """(Re)start playback from these decoder inputs.

    ``pix_fmt="yuv420p"`` requests decode-native planar frames (half the
    host->device bytes; converted on device)."""
    inputs: tuple[str, ...]
    pix_fmt: str = "bgr24"

    def __init__(self, inputs: Sequence[str], pix_fmt: str = "bgr24"):
        object.__setattr__(self, "inputs", tuple(inputs))
        object.__setattr__(self, "pix_fmt", pix_fmt)


@dataclass(frozen=True)
class Pause:
    paused: bool = True


@dataclass(frozen=True)
class Stop:
    pass


@dataclass(frozen=True)
class Seek:
    """Jump to an absolute position (reference README todo: video seeking).
    Seekable sources: RVF (random access), synth, image sequences; pipe
    decoders raise a typed ControlError (a byte pipe has no position)."""
    seconds: float


@dataclass(frozen=True)
class Step:
    """Step ``frames`` forward (any source: skip-decode) or backward
    (seekable sources), producing ONE new frame even while paused —
    the reference README's fast-forward/backward todo."""
    frames: int = 1


VideoCmd = Play | Pause | Stop | Seek | Step


class VideoPlayer(Processor[VideoCmd, None, Frame]):
    """Source node wrapping a :class:`VideoDecoder`.

    Behavior contract (reference infur/src/processing.rs:62-140):
    ``Play`` closes any current video and opens the new inputs (a failed open
    leaves the player stopped but alive); ``Pause`` freezes frame production;
    ``Stop`` closes the video.  ``advance`` reuses/resizes the output Frame's
    buffer and reads the next frame; clean EOF closes the video silently and
    the last frame is retained by downstream stages.  ``is_dirty`` iff
    playing and not paused.
    """

    def __init__(self) -> None:
        self._vid: VideoDecoder | None = None
        self.paused = False
        self.inputs: tuple[str, ...] = ()
        self._last_id = 0    # most recent frame id produced
        self._skip = 0       # frames to decode-and-discard before producing
        self._step_once = False  # produce one frame even while paused

    def _close_video(self) -> None:
        if self._vid is not None:
            vid, self._vid = self._vid, None
            vid.close()

    def _seek_to(self, index: int) -> None:
        from infur_tpu.errors import ControlError
        seek = getattr(self._vid, "seek", None)
        if seek is not None:
            # seek() returns the landed 0-based index; the next read
            # produces 1-based id landed+1.  _last_id holds 1-based ids of
            # produced frames everywhere else, so record the id the pending
            # read will produce — a Step(-n) arriving before that read then
            # computes its target in the same convention.
            self._last_id = seek(max(index, 0)) + 1
            self._step_once = True
            return
        # pipe decoders (ffmpeg) have no stream position: seek by
        # reopening at an input-side -ss offset.  The frame counter
        # restarts at 1 (a pipe has no global index), like a Play.
        fps = self._vid.fps or 30.0
        pix = getattr(self._vid, "pix_fmt", "bgr24")
        try:
            new = open_video(self.inputs, pix_fmt=pix,
                             start_secs=max(index, 0) / fps)
        except Exception as e:
            raise ControlError(f"seek-by-reopen failed: {e}") from e
        self._close_video()
        self._vid = new
        self._last_id = 0
        self._step_once = True

    def control(self, cmd: VideoCmd) -> "VideoPlayer":
        if isinstance(cmd, Play):
            self._close_video()
            self.inputs = cmd.inputs
            self._vid = open_video(cmd.inputs, pix_fmt=cmd.pix_fmt)
            self._last_id = 0
            self._skip = 0
            self._step_once = False
        elif isinstance(cmd, Pause):
            self.paused = cmd.paused
        elif isinstance(cmd, Stop):
            self._close_video()
        elif isinstance(cmd, Seek):
            if self._vid is None:
                from infur_tpu.errors import ControlError
                raise ControlError("no video open to seek")
            fps = self._vid.fps or 30.0
            self._seek_to(int(round(cmd.seconds * fps)))
        elif isinstance(cmd, Step):
            if self._vid is None:
                from infur_tpu.errors import ControlError
                raise ControlError("no video open to step")
            if cmd.frames >= 1:
                # forward: universal (decode-and-discard the gap)
                self._skip += cmd.frames - 1
                self._step_once = True
            else:
                # backward: needs a seekable source; _last_id is 1-based
                self._seek_to(self._last_id - 1 + cmd.frames)
        else:
            raise TypeError(f"not a VideoCmd: {cmd!r}")
        return self

    def is_dirty(self) -> bool:
        return self._vid is not None and (not self.paused or self._step_once)

    @property
    def geometry(self) -> tuple[int, int, float] | None:
        """(width, height, fps) of the open video, if any."""
        v = self._vid
        return None if v is None else (v.width, v.height, v.fps)

    def advance(self, inp: None, out: Cell[Frame]) -> bool:
        """Read the next frame; returns True iff a frame was produced
        (False while paused/stopped/EOF — the retained frame is untouched).
        A pending Seek/Step produces its one frame even while paused."""
        if (self.paused and not self._step_once) or self._vid is None:
            return False
        self._step_once = False
        vid = self._vid
        while self._skip > 0:  # fast-forward: decode-and-discard the gap
            self._skip -= 1
            try:
                vid.read_frame_into(vid.empty_image())
            except VideoEOF:
                self._skip = 0
                self._close_video()
                return False
        fmt = "i420" if getattr(vid, "pix_fmt", "bgr24") == "yuv420p" \
            or getattr(getattr(vid, "header", None), "fourcc", b"") == b"I420" \
            else "bgr24"
        frame = out.value
        want_shape = ((vid.width * vid.height * 3 // 2,) if fmt == "i420"
                      else (vid.height, vid.width, 3))
        if (frame is None or frame.img.shape != want_shape
                or not frame.img.flags.writeable):
            frame = Frame(0, vid.empty_image())
        frame.fmt = fmt
        frame.hw = (vid.height, vid.width) if fmt == "i420" else None
        try:
            frame.id = vid.read_frame_into(frame.img)
        except VideoEOF:
            self._close_video()  # EOF-as-control-flow (processing.rs:133-135)
            return False
        self._last_id = frame.id
        out.value = frame
        return True

    def close(self) -> None:
        self._close_video()


# ---------------------------------------------------------------------------
# Scale: display-path resize stage
# ---------------------------------------------------------------------------

class ValidScale(float):
    """A scale factor validated to be finite and > 0
    (reference infur/src/processing.rs:158-168)."""

    def __new__(cls, value: float) -> "ValidScale":
        v = float(value)
        if not (v > 0.0) or v != v or v in (float("inf"),):
            raise ScaleError(f"scale must be a finite positive number, got {value!r}")
        return super().__new__(cls, v)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer gather (pixel-center sampling)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[ys[:, None], xs[None, :]]


class Scale(Processor[float, Frame, Frame]):
    """Resize frames by a validated factor; unit scale short-circuits.

    Command = new scale factor; sets dirty only if the factor actually
    changed, which is what re-renders a paused frame after a slider move
    (reference infur/src/processing.rs:179-282 and app test
    infur/src/app.rs:219-235).
    """

    def __init__(self, factor: float = 1.0):
        self.factor = ValidScale(factor)
        # starts dirty, like the reference's Scale::default() (dirty: true,
        # processing.rs:185-192): a fresh stage has never produced output,
        # so the same input WOULD produce new output
        self._dirty = True

    def control(self, cmd: float) -> "Scale":
        new = ValidScale(cmd)
        if new != self.factor:
            self.factor = new
            self._dirty = True
        return self

    def is_dirty(self) -> bool:
        return self._dirty

    def out_dims(self, h: int, w: int) -> tuple[int, int]:
        return max(int(round(h * self.factor)), 0), max(int(round(w * self.factor)), 0)

    def advance(self, inp: Frame, out: Cell[Frame]) -> None:
        self._dirty = False
        h, w = inp.height_width
        if h == 0 or w == 0:
            raise ScaleError(f"input frame has zero size: {w}x{h}")
        if self.factor == 1.0:
            out.value = Frame(inp.id, inp.img.copy(), fmt=inp.fmt, hw=inp.hw)
            return
        oh, ow = self.out_dims(h, w)
        if oh == 0 or ow == 0:
            raise ScaleError(f"output would have zero size: {ow}x{oh} (factor {float(self.factor)})")
        if inp.fmt == "i420":
            from infur_tpu.ops.yuv import scale_i420
            oh, ow = (oh + 1) // 2 * 2, (ow + 1) // 2 * 2  # 4:2:0 needs even
            out.value = Frame(inp.id, scale_i420(inp.img, h, w, oh, ow),
                              fmt="i420", hw=(oh, ow))
        else:
            out.value = Frame(inp.id, resize_nearest(inp.img, oh, ow))
