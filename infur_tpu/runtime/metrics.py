"""Frame-rate metrics: shown fps, processed fps, drops.

The reference's ``FrameCounter`` (reference infur/src/gui.rs:26-89):
per ~1 s window, shown-fps counts UI ticks that displayed a new frame,
received-fps counts frames the pipeline produced (by id delta), and
drops = received - shown.  A frame id that goes *backwards* means the video
restarted — the window resets instead of reporting a negative rate
(gui.rs:41-46).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class FrameStats:
    shown_fps: float
    received_fps: float
    drops: float


@dataclass
class FrameCounter:
    window_s: float = 1.0
    _t0: float = field(default_factory=time.monotonic)
    _first_id: int | None = None
    _last_id: int | None = None
    _shown: int = 0
    _stats: FrameStats | None = None

    def count(self, frame_id: int) -> None:
        """Record one displayed frame (call per UI tick that shows one)."""
        if self._last_id is not None and frame_id < self._last_id:
            self.reset()  # restart detected (gui.rs:41-46)
        if self._first_id is None:
            self._first_id = frame_id
        self._last_id = frame_id
        self._shown += 1

    def reset(self) -> None:
        self._t0 = time.monotonic()
        self._first_id = self._last_id = None
        self._shown = 0

    def stats(self) -> FrameStats | None:
        """Windowed stats; rolls the window when it elapses."""
        dt = time.monotonic() - self._t0
        if dt >= self.window_s and self._first_id is not None:
            received = (self._last_id - self._first_id) + 1
            shown = self._shown
            self._stats = FrameStats(
                shown_fps=shown / dt,
                received_fps=received / dt,
                drops=max(received - shown, 0) / dt)
            self.reset()
        return self._stats
