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

    Low-wire mode (``ProcessingApp(wire="rle")``): instead of dense RGBA
    planes the frame carries ``wire_payload`` (run-coded mask + quarter-res
    confidence, ops/maskcode.py), ``wire_fallback`` (6-bit-packed dense
    mask, fetched ONLY if a row overflowed ``wire_cap``) and ``host_base``
    (the scaled frame already on host) — the scheduler decodes and
    composites host-side (native hostops blend), cutting per-frame D2H
    from ~3 RGBA planes (~6 MB at 540p) to ~0.2 MB on bandwidth-starved
    links like this environment's relay (BENCH_NOTES.md).
    """
    id: int
    buffer: "jax.Array | None"
    decoded: jax.Array | None = None
    composited: jax.Array | None = None
    #: (K,) int32 pixel counts of the predicted classes (frontend captions)
    class_counts: jax.Array | None = None
    #: wire="rle": flat u8 device payload (ops/maskcode.encode_payload)
    wire_payload: jax.Array | None = None
    #: wire="rle": 6-bit-packed dense mask, the lossless overflow fallback
    wire_fallback: jax.Array | None = None
    #: wire="rle": run cap the payload was encoded with
    wire_cap: int = 0
    #: wire="rle": scaled frame as host (h, w, 3) BGR u8 (no D2H needed)
    host_base: "object | None" = None


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


def _rgba_host(img_bgr_hwc) -> "object":
    """Host twin of :func:`_frame_rgba` (numpy in, numpy out)."""
    import numpy as np
    h, w = img_bgr_hwc.shape[:2]
    return np.concatenate(
        [img_bgr_hwc[..., ::-1], np.full((h, w, 1), 255, np.uint8)], axis=-1)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("h", "w", "cap", "apply_softmax"))
def _wire_encode(scores_khw: jax.Array, h: int, w: int, cap: int,
                 apply_softmax: bool):
    """Device side of the wire="rle" display path: scores -> (run-coded
    payload, 6-bit-packed dense fallback mask).  Mask/confidence are
    nearest-upsampled to the frame size first (same as ops.colorcode.overlay
    when the model ran at reduced scale)."""
    from infur_tpu.ops.maskcode import encode_payload, pack_mask6
    if apply_softmax:
        scores_khw = jax.nn.softmax(scores_khw, axis=0)
    k = jnp.argmax(scores_khw, axis=0)
    conf = jnp.clip(jnp.max(scores_khw, axis=0), 0.0, 1.0)
    kh, kw = scores_khw.shape[1:]
    if (kh, kw) != (h, w):
        from infur_tpu.ops.preprocess import _nearest_indices
        ys = jnp.asarray(_nearest_indices(h, kh))
        xs = jnp.asarray(_nearest_indices(w, kw))
        k = k[ys[:, None], xs[None, :]]
        conf = conf[ys[:, None], xs[None, :]]
    mask = k.astype(jnp.uint8)
    confu8 = jnp.clip(conf * 255.0, 0, 255).astype(jnp.uint8)
    return (encode_payload(mask, confu8, cap),
            pack_mask6(mask.reshape(1, -1))[0])


#: run cap for the wire="rle" payload: covers every measured real mask
#: (max 44 runs/row on the bench fixture, tools/mask_stats.py) with margin;
#: overflowing rows fall back to the dense plane losslessly
WIRE_RLE_CAP = 64

_ALL_PLANES = frozenset({"buffer", "decoded", "composited"})


class ProcessingApp(Processor[AppCmd, None, "GUIFrame | None"]):
    def __init__(self, model_bucket: int | None = None,
                 wire: str = "dense",
                 planes: "set[str] | None" = None) -> None:
        """``wire``: how display results cross the device->host link —
        ``"dense"`` (reference-exact on-device composite, RGBA planes
        fetched) or ``"rle"`` (run-coded mask payload + host composite;
        ~30x fewer D2H bytes, alpha at quarter resolution).  ``planes``:
        which GUIFrame planes frontends want (subset of buffer/decoded/
        composited; default all) — unrequested planes are neither computed
        nor fetched; ``buffer`` is always delivered when no composite
        exists so frontends keep their fallback."""
        from infur_tpu.processing import VideoPlayer
        if wire not in ("dense", "rle"):
            raise InfurError(f"wire must be 'dense' or 'rle', got {wire!r}")
        self.wire = wire
        self.planes = _ALL_PLANES if planes is None else frozenset(planes)
        if self.planes - _ALL_PLANES:
            raise InfurError(f"unknown planes {sorted(self.planes - _ALL_PLANES)}")
        self._wire_warned = False
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

        pred = self.pred.value
        have_scores = pred is not None and pred.primary is not None
        counts = None
        if have_scores:
            from infur_tpu.ops.colorcode import class_histogram
            counts = class_histogram(pred.primary)
        sm = self.color_softmax
        sh, sw = scaled.hw if scaled.fmt == "i420" else scaled.img.shape[:2]

        if self.wire == "rle":
            if not have_scores:
                # fully host-side: no device roundtrip at all
                out.value = GUIFrame(id=scaled.id,
                                     buffer=_rgba_host(self._host_bgr(scaled)))
                return
            ok = (sw <= 1024 and sh % 2 == 0 and sw % 2 == 0
                  and pred.primary.shape[0] <= 64)
            if ok:
                with self.timers.stage("decode"):
                    payload, fb = _wire_encode(pred.primary, sh, sw,
                                               WIRE_RLE_CAP, sm)
                out.value = GUIFrame(id=scaled.id, buffer=None,
                                     class_counts=counts,
                                     wire_payload=payload, wire_fallback=fb,
                                     wire_cap=WIRE_RLE_CAP,
                                     host_base=self._host_bgr(scaled))
                return
            if not self._wire_warned:  # loud, once (VERDICT r2 #4 lesson)
                self._wire_warned = True
                msg = (f"wire=rle needs even dims, width<=1024 and <=64 "
                       f"classes; {sw}x{sh}/{pred.primary.shape[0]} classes "
                       "uses dense D2H")
                import warnings
                warnings.warn(msg, stacklevel=2)
                if self.status_cb:
                    self.status_cb(StageStatus("wire", msg))
            # fall through to the dense path

        if scaled.fmt == "i420":
            from infur_tpu.ops.yuv import i420_to_bgr
            scaled_dev = i420_to_bgr(jnp.asarray(scaled.img), sh, sw)
        else:
            scaled_dev = jnp.asarray(scaled.img)
        decoded = composited = None
        if have_scores:
            scores = pred.primary
            from infur_tpu.ops import on_tpu
            with self.timers.stage("decode"):
                want_dec = "decoded" in self.planes
                want_comp = "composited" in self.planes
                if on_tpu():  # fused Pallas postprocess on real hardware
                    from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
                    from infur_tpu.ops.pallas_colorcode import color_code_pallas
                    from infur_tpu.ops.pallas_overlay import overlay_pallas
                    if want_dec:
                        decoded = color_code_pallas(
                            scores, jnp.asarray(_DEFAULT_PALETTE),
                            apply_softmax=sm)
                    if want_comp:
                        composited = overlay_pallas(scaled_dev, scores,
                                                    apply_softmax=sm)
                else:
                    if want_dec:
                        decoded = color_code(scores, apply_softmax=sm)
                    if want_comp:
                        composited = overlay(scaled_dev, scores,
                                             apply_softmax=sm)
        # buffer: on request, or as the fallback plane when no composite
        buffer = (_frame_rgba(scaled_dev)
                  if ("buffer" in self.planes or composited is None) else None)
        out.value = GUIFrame(id=scaled.id, buffer=buffer,
                             decoded=decoded, composited=composited,
                             class_counts=counts)

    @staticmethod
    def _host_bgr(scaled: Frame):
        """Scaled frame as host (h, w, 3) BGR u8 — the rle display base."""
        import numpy as np
        if scaled.fmt == "i420":
            from infur_tpu.ops.yuv import i420_to_bgr_np
            sh, sw = scaled.hw
            return i420_to_bgr_np(np.asarray(scaled.img), sh, sw)
        return np.asarray(scaled.img)

    def close(self) -> None:
        self.vid.close()
