"""Parser for ffmpeg's human-readable stderr sideband.

When video input goes through an ffmpeg subprocess, the only way to learn the
output geometry (width/height/fps) and live decode throughput is to parse the
progress text ffmpeg writes to stderr.  Capability-equivalent to the
reference's stateful line parser (reference ff-video/src/parse.rs:82-230),
written fresh against ffmpeg's actual output format:

* ``Input #N, ...`` / ``Output #N, ...`` headers set the current section.
* ``  Stream #N:M ... Video: ... WxH ... F fps`` lines inside a section yield
  a :class:`Stream` attributed to that section.
* ``[h264 @ 0x...] text`` bracketed lines become :class:`Codec` infos.
* ``frame=  120 fps= 60 ... dup=0 drop=2 speed=2.1x`` progress lines become
  :class:`FrameUpdate` telemetry (free decode-side throughput metrics).

ffmpeg terminates progress lines with a bare ``\\r``; the byte splitter treats
both CR and LF as terminators and keeps the trailing unterminated text as
``state()`` so startup failures can report the last diagnostic line
(reference ff-video/src/parse.rs:280-319, decoder.rs:93-104).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum
from typing import Iterator

from infur_tpu.errors import VideoParseError


class Section(Enum):
    INPUT = "Input"
    OUTPUT = "Output"


@dataclass(frozen=True)
class Stream:
    section: Section
    num: int
    width: int
    height: int
    fps: float


@dataclass(frozen=True)
class Codec:
    name: str
    text: str


@dataclass(frozen=True)
class FrameUpdate:
    frame: int
    fps: float | None
    dup: int | None
    drop: int | None
    speed: float | None


Info = Stream | Codec | FrameUpdate

_SECTION_RE = re.compile(r"^(Input|Output) #(\d+)")
_STREAM_RE = re.compile(r"^\s+Stream #(\d+):(\d+)")
_VIDEO_RE = re.compile(r"\bVideo:\s")
_DIMS_RE = re.compile(r"[\s,](\d{2,5})x(\d{2,5})[\s,]")
_FPS_RE = re.compile(r"(\d+(?:\.\d+)?)\s*fps")
_TBR_RE = re.compile(r"(\d+(?:\.\d+)?k?)\s*tbr")
_CODEC_RE = re.compile(r"^\[([^\]@]+)(?:\s*@\s*0x[0-9a-f]+)?\]\s*(.*)")
_PROGRESS_RE = re.compile(r"^frame=\s*(\d+)")
_KV_RE = re.compile(r"(\w+)=\s*([^\s]+)")


def _parse_rate(s: str) -> float:
    if s.endswith("k"):
        return float(s[:-1]) * 1000.0
    return float(s)


class InfoParser:
    """Stateful push parser: feed lines, pull typed infos."""

    def __init__(self) -> None:
        self._section: Section | None = None
        self._last_line: str = ""

    def state(self) -> str:
        """Most recent line seen (including unterminated tail) — diagnostics."""
        return self._last_line

    def push(self, line: str) -> Info | None:
        """Parse one complete line; return a typed info or None.

        Raises :class:`VideoParseError` for lines that *should* parse (a
        Video stream line inside a section with unparseable geometry).
        """
        self._last_line = line
        m = _SECTION_RE.match(line)
        if m:
            self._section = Section(m.group(1))
            return None
        m = _PROGRESS_RE.match(line)
        if m:
            kv = dict(_KV_RE.findall(line))
            def _f(key: str) -> float | None:
                v = kv.get(key)
                if v is None:
                    return None
                v = v.rstrip("x")
                try:
                    return float(v)
                except ValueError:
                    return None
            def _i(key: str) -> int | None:
                v = _f(key)
                return None if v is None else int(v)
            frame = _i("frame")
            if frame is None:
                raise VideoParseError(f"malformed progress line: {line!r}")
            return FrameUpdate(frame=frame, fps=_f("fps"), dup=_i("dup"),
                               drop=_i("drop"), speed=_f("speed"))
        m = _STREAM_RE.match(line)
        if m and self._section is not None:
            if not _VIDEO_RE.search(line):
                return None  # audio/data streams are ignored
            num = int(m.group(2))
            dims = _DIMS_RE.search(line)
            if not dims:
                raise VideoParseError(f"video stream without dimensions: {line!r}")
            fps_m = _FPS_RE.search(line)
            tbr_m = _TBR_RE.search(line)
            if fps_m:
                fps = float(fps_m.group(1))
            elif tbr_m:
                fps = _parse_rate(tbr_m.group(1))
            else:
                raise VideoParseError(f"video stream without rate: {line!r}")
            return Stream(self._section, num, int(dims.group(1)),
                          int(dims.group(2)), fps)
        m = _CODEC_RE.match(line)
        if m:
            return Codec(m.group(1).strip(), m.group(2).strip())
        return None

    def iter_on(self, lines: Iterator[str]) -> Iterator[Info]:
        for line in lines:
            info = self.push(line)
            if info is not None:
                yield info


def split_lines(chunks: Iterator[bytes]) -> Iterator[str]:
    """Split a byte stream on LF *and* CR (ffmpeg progress uses bare CR).

    Yields complete lines only; an unterminated tail at stream end is flushed
    last (reference ff-video/src/parse.rs:280-319 keeps it as parser state —
    here the caller pushes the flushed tail and InfoParser.state() serves the
    same diagnostic purpose).
    """
    buf = bytearray()
    for chunk in chunks:
        for b in chunk:
            if b in (0x0A, 0x0D):  # \n or \r
                if buf:
                    yield buf.decode("utf-8", "replace")
                    buf.clear()
            else:
                buf.append(b)
    if buf:
        yield buf.decode("utf-8", "replace")
