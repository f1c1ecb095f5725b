"""App composite: the whole pipeline as one Processor.

Mirrors the reference's ``ProcessingApp`` (reference infur/src/app.rs:38-158):
owns the stages plus their retained intermediate outputs, demuxes ``AppCmd``
to children, and its ``generate`` runs the per-frame dataflow:

    VideoPlayer -> [retained frame] -> Scale -> [retained scaled] ->
    ModelStage -> [retained prediction] -> overlay -> GUIFrame

Key semantics carried over exactly (tested the same way the reference tests
them, app.rs:174-252):

* retained intermediates: a *paused* video still re-renders its last frame
  when the scale changes — downstream recomputes from the retained frame
  with the SAME frame id (app.rs:219-235 / SURVEY §3.3);
* a model load does not re-trigger a paused frame (Model::is_dirty false);
* EOF closes the video silently and the last frame stays on screen;
* errors are values: command errors raise typed ``InfurError`` subclasses
  that the scheduler routes to the frontend, never crashes.

TPU re-design: the scaled display frame and the mask are composited **on
device** and returned as lazy ``jax.Array``s — the host only pays D2H for
buffers a frontend actually reads (the reference pays five host copies per
frame, SURVEY §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp

from infur_tpu.errors import InfurError
from infur_tpu.model_stage import Load, ModelInfo, ModelStage, Prediction
from infur_tpu.ops.colorcode import color_code, overlay
from infur_tpu.processing import (
    Cell, Frame, Pause, Play, Processor, Scale, Seek, Step, Stop, VideoCmd,
)


# --- commands (reference AppCmd, app.rs:38-49) -----------------------------

@dataclass(frozen=True)
class ScaleCmd:
    factor: float


@dataclass(frozen=True)
class ModelCmd:
    spec: str


@dataclass(frozen=True)
class ColorCmd:
    """Mask-decode options: ``softmax`` turns raw logits into probability
    alpha (the reference flags this as a todo, reference README.md:76 —
    here it is a live control)."""
    softmax: bool = False


@dataclass(frozen=True)
class Exit:
    pass


AppCmd = Union[VideoCmd, ScaleCmd, ModelCmd, ColorCmd, Exit]


@dataclass
class GUIFrame:
    """One display-ready result (reference GUIFrame, app.rs:84-90).

    ``buffer``: scaled frame as (h, w, 4) RGBA u8.
    ``decoded``: color-coded mask (h', w', 4) RGBA u8, or None w/o model.
    ``composited``: mask alpha-blended over scaled frame, or None.
    Fresh from ``ProcessingApp.advance`` these are lazy ``jax.Array``s;
    the scheduler loop materializes them to numpy on the device thread
    before they cross to frontends (runtime/loop.py) — the transport is
    not safe for cross-thread fetches.
    """
    id: int
    buffer: jax.Array
    decoded: jax.Array | None = None
    composited: jax.Array | None = None
    #: (K,) int32 pixel counts of the predicted classes (frontend captions)
    class_counts: jax.Array | None = None


@dataclass(frozen=True)
class StageStatus:
    """Transient per-stage status line for frontends (e.g. "compiling…"
    while generate() is stalled on a first-shape jit compile).  Empty
    ``text`` clears the stage's line."""
    stage: str
    text: str


@dataclass(frozen=True)
class AppInfo:
    """Debounced state snapshot for frontends (reference AppInfo)."""
    model: ModelInfo | None
    scale: float
    playing: bool
    paused: bool
    geometry: tuple[int, int, float] | None
    timings_ms: dict[str, float] | None = None


@jax.jit
def _frame_rgba(img_bgr_hwc: jax.Array) -> jax.Array:
    h, w = img_bgr_hwc.shape[:2]
    return jnp.concatenate(
        [img_bgr_hwc[..., ::-1],
         jnp.full((h, w, 1), 255, jnp.uint8)], axis=-1)


class ProcessingApp(Processor[AppCmd, None, "GUIFrame | None"]):
    def __init__(self, model_bucket: int | None = None) -> None:
        from infur_tpu.processing import VideoPlayer
        self.vid = VideoPlayer()
        self.scale = Scale(1.0)
        self.model = ModelStage(bucket=model_bucket)
        self.frame: Cell[Frame] = Cell()
        self.scaled: Cell[Frame] = Cell()
        self.pred: Cell[Prediction] = Cell()
        self.color_softmax = False
        self._color_dirty = False
        self.to_exit = False
        # set by the scheduler loop: receives StageStatus for transient
        # states (jit warmup) that frontends show while generate() blocks
        self.status_cb = None
        from infur_tpu.runtime.trace import StageTimers
        self.timers = StageTimers()

    # -- control: demux to children (app.rs:91-105) --
    def control(self, cmd: AppCmd) -> "ProcessingApp":
        if isinstance(cmd, (Play, Pause, Stop, Seek, Step)):
            self.vid.control(cmd)
        elif isinstance(cmd, ScaleCmd):
            self.scale.control(cmd.factor)
        elif isinstance(cmd, ModelCmd):
            self.model.control(Load(cmd.spec))
        elif isinstance(cmd, ColorCmd):
            if cmd.softmax != self.color_softmax:
                self.color_softmax = cmd.softmax
                self._color_dirty = True  # re-render the retained frame
        elif isinstance(cmd, Exit):
            self.to_exit = True
        else:
            raise InfurError(f"unknown command {cmd!r}")
        return self

    def info(self) -> AppInfo:
        return AppInfo(model=self.model.info(), scale=float(self.scale.factor),
                       playing=self.vid.geometry is not None,
                       paused=self.vid.paused, geometry=self.vid.geometry,
                       timings_ms=self.timers.snapshot())

    def is_dirty(self) -> bool:
        return self.vid.is_dirty() or self.scale.is_dirty() \
            or self._color_dirty

    # -- the per-frame dataflow (app.rs:107-153) --
    def advance(self, inp: None, out: Cell["GUIFrame | None"]) -> None:
        out.value = None
        scale_was_dirty = self.scale.is_dirty()
        color_was_dirty, self._color_dirty = self._color_dirty, False

        with self.timers.stage("video"):
            got_new_frame = self.vid.advance(None, self.frame)
        frame = self.frame.value
        if frame is None:
            return

        if got_new_frame or scale_was_dirty or self.scaled.value is None:
            with self.timers.stage("scale"):
                self.scale.advance(frame, self.scaled)
        scaled = self.scaled.value
        if scaled is None:
            return

        recompute_model = (got_new_frame or scale_was_dirty
                           or (self.model.loaded
                               and self.pred.value is not None
                               and self.pred.value.frame_id != scaled.id))
        if self.model.loaded and recompute_model:
            notice = (self.model.compile_notice(scaled)
                      if self.status_cb else None)
            if notice:
                self.status_cb(StageStatus("model", notice))
            try:
                with self.timers.stage("model"):
                    self.model.advance(scaled, self.pred)
            finally:
                if notice:
                    self.status_cb(StageStatus("model", ""))
        elif not self.model.loaded:
            self.pred.value = None

        if not (got_new_frame or scale_was_dirty or color_was_dirty):
            return  # nothing new to show (paused & no param change)

        if scaled.fmt == "i420":
            from infur_tpu.ops.yuv import i420_to_bgr
            sh, sw = scaled.hw
            scaled_dev = i420_to_bgr(jnp.asarray(scaled.img), sh, sw)
        else:
            scaled_dev = jnp.asarray(scaled.img)
        buffer = _frame_rgba(scaled_dev)
        decoded = composited = counts = None
        pred = self.pred.value
        if pred is not None and pred.primary is not None:
            scores = pred.primary
            from infur_tpu.ops.colorcode import class_histogram
            counts = class_histogram(scores)
            from infur_tpu.ops import on_tpu
            with self.timers.stage("decode"):
                sm = self.color_softmax
                if on_tpu():  # fused Pallas postprocess on real hardware
                    from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
                    from infur_tpu.ops.pallas_colorcode import color_code_pallas
                    from infur_tpu.ops.pallas_overlay import overlay_pallas
                    decoded = color_code_pallas(scores,
                                                jnp.asarray(_DEFAULT_PALETTE),
                                                apply_softmax=sm)
                    composited = overlay_pallas(scaled_dev, scores,
                                                apply_softmax=sm)
                else:
                    decoded = color_code(scores, apply_softmax=sm)
                    composited = overlay(scaled_dev, scores, apply_softmax=sm)
        out.value = GUIFrame(id=scaled.id, buffer=buffer,
                             decoded=decoded, composited=composited,
                             class_counts=counts)

    def close(self) -> None:
        self.vid.close()
