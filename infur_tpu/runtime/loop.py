"""The scheduler: a processing thread with adaptive command intake.

Reference behavior reproduced exactly (reference infur/src/main.rs:27-99):

* **blocking** command receive while the app is clean (paused/stopped —
  zero CPU burn);
* **non-blocking drain** of the command queue while playing;
* command errors and state-change snapshots go to the control-result
  channel; generated frames (or frame errors) go to the *bounded* frame
  channel whose capacity-2 backpressure throttles the whole pipeline
  (a slow consumer stalls generate(), which stalls the decoder read,
  which fills the OS pipe, which stalls ffmpeg — flow control end to end
  with no explicit rate logic, SURVEY §3.1);
* exits on ``Exit`` or when the command channel hangs up.

The channels are stdlib ``queue.Queue``s; unlike the reference's Rust mpsc
there is no disconnect signal, so hangup is modeled with ``None`` sentinels.
"""

from __future__ import annotations

import os
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any

from infur_tpu.app import AppCmd, AppInfo, Exit, GUIFrame, ProcessingApp
from infur_tpu.errors import InfurError

#: result channel payloads: a GUIFrame, an InfurError, or AppInfo snapshot
FrameResult = Any
CtrlResult = Any

FRAME_CHANNEL_DEPTH = 2  # the reference's sync_channel(2) (main.rs:105)

# Proc pipeline depth: frames in flight between dispatch (generate) and
# delivery.  At depth N-1 materializations (D2H fetch + host decode of the
# wire payload) ride on worker threads UNDER the next frame's decode +
# dispatch, the pattern the bench's interactive phase proved on the real
# chip (46.7 fps with 2 drain workers vs 17.8 fully synchronous —
# BENCH_NOTES.md round 5).  Depth 1 restores the fully synchronous
# dispatch-then-fetch-on-this-thread loop of rounds 1-4.  Delivery order,
# backpressure (the bounded frame channel is still fed from the proc
# thread), and errors-as-values semantics are unchanged.
PROC_PIPELINE_DEPTH = max(1, int(os.environ.get("INFUR_PROC_PIPELINE", "2")))


def _materialize(frame: GUIFrame, planes: frozenset) -> None:
    """Fetch the frame's device arrays to host, in place.

    Low-wire (``wire_payload``) frames fetch only the run-coded payload
    (~0.2 MB vs ~6 MB of RGBA planes at 540p) and composite HOST-side
    with the native hostops blend; the dense 6-bit fallback plane is
    fetched only when a row overflowed the run cap (lossless either way).
    """
    import numpy as np
    if frame.class_counts is not None:
        frame.class_counts = np.asarray(frame.class_counts)
    if frame.wire_payload is None:
        frame.buffer = None if frame.buffer is None else np.asarray(frame.buffer)
        if frame.decoded is not None:
            frame.decoded = np.asarray(frame.decoded)
        if frame.composited is not None:
            frame.composited = np.asarray(frame.composited)
        return

    from infur_tpu.ops.colorcode import _DEFAULT_PALETTE
    from infur_tpu.ops.maskcode import decode_payload, unpack_mask6_np
    base = frame.host_base  # (h, w, 3) BGR u8, already host
    h, w = base.shape[:2]
    flat = np.asarray(frame.wire_payload)
    mask, confq = decode_payload(flat, h, w, frame.wire_cap)
    if mask is None:  # run-cap overflow: dense 6-bit fallback plane
        try:
            from infur_tpu.hostops import have_hostops, unpack_mask6
            native = have_hostops()
        except Exception:
            native = False
        m6 = np.asarray(frame.wire_fallback)
        mask = (unpack_mask6(m6[None])[0] if native
                else unpack_mask6_np(m6)).reshape(h, w)
    frame.wire_payload = frame.wire_fallback = None
    palette = np.asarray(_DEFAULT_PALETTE)
    if "composited" in planes:
        try:
            from infur_tpu.hostops import blend_overlay_bgr, have_hostops
            native = have_hostops()
        except Exception:
            native = False
        if native:
            frame.composited = blend_overlay_bgr(
                mask[None], confq[None], base[None], palette)[0]
        else:
            from infur_tpu.hostops import blend_overlay_bgr_np
            frame.composited = blend_overlay_bgr_np(
                mask[None], confq[None], base[None], palette)[0]
    if "decoded" in planes:
        rgb = palette[mask % palette.shape[0]]
        alpha = confq.repeat(h // confq.shape[0], axis=0) \
                     .repeat(w // confq.shape[1], axis=1)
        frame.decoded = np.concatenate([rgb, alpha[..., None]], axis=-1)
    # buffer on request, or as the fallback plane when no composite was
    # requested (same contract as the dense path in app.advance)
    if "buffer" in planes or frame.composited is None:
        from infur_tpu.app import _rgba_host
        frame.buffer = _rgba_host(base)


def proc_loop(ctrl_rx: "queue.Queue[AppCmd | None]",
              frame_tx: "queue.Queue[FrameResult]",
              app_tx: "queue.Queue[CtrlResult]",
              app: ProcessingApp | None = None) -> None:
    """Run until Exit/hangup.  Mirrors reference main.rs:42-98."""
    if app is None:
        app = ProcessingApp()  # constructed on this thread (main.rs:38-40)
    # transient stage statuses (jit-warmup notices) go out on the control
    # channel so frontends can show "compiling…" while generate() blocks
    app.status_cb = app_tx.put
    state_change = True  # announce initial state
    last_playing: bool | None = None

    # -- frame pipeline (see PROC_PIPELINE_DEPTH) --
    depth = PROC_PIPELINE_DEPTH
    pool = ThreadPoolExecutor(depth - 1, thread_name_prefix="ProcDrain") \
        if depth > 1 else None
    futs: deque = deque()

    def _mat_job(frame: GUIFrame, planes: frozenset):
        """Worker-side materialization; errors stay values.  ``planes`` is
        captured at dispatch time so a plane-set command that lands while
        this frame is in flight cannot change what it materializes."""
        try:
            _materialize(frame, planes)
            return frame
        except InfurError as e:
            return e
        except Exception as e:
            return InfurError(f"{type(e).__name__}: {e}")

    def _deliver_one() -> None:
        # fut.result() never raises (_mat_job returns errors as values);
        # the blocking put keeps the reference's capacity-2 backpressure
        # anchored to THIS thread (main.rs:86-88)
        frame_tx.put(futs.popleft().result())

    def _flush() -> None:
        while futs:
            _deliver_one()

    try:
        while not app.to_exit:
            if state_change:
                # snapshot BEFORE a (possibly blocking) intake, so frontends
                # see the initial/changed state without sending a command
                app_tx.put(app.info())
                state_change = False

            # -- command intake: blocking when clean, draining when dirty --
            cmds: list[AppCmd] = []
            if not app.is_dirty():
                _flush()  # deliver in-flight frames before going idle
                cmd = ctrl_rx.get()
                if cmd is None:
                    return
                cmds.append(cmd)
            while True:
                try:
                    cmd = ctrl_rx.get_nowait()
                except queue.Empty:
                    break
                if cmd is None:
                    return
                cmds.append(cmd)

            for cmd in cmds:
                try:
                    app.control(cmd)
                    state_change = True
                except InfurError as e:
                    app_tx.put(e)  # command errors -> frontend status line
                except Exception as e:  # errors are values, never thread death
                    app_tx.put(InfurError(f"{type(e).__name__}: {e}"))
            if app.to_exit:
                return

            if state_change:
                app_tx.put(app.info())  # debounced snapshot (main.rs:81-83)
                state_change = False

            # -- generate one frame; errors are values --
            # Device dispatch AND the D2H materialization both happen on
            # THIS thread: the relay transport misbehaves when one thread
            # fetches arrays another thread dispatched (see runtime.devlock
            # and BENCH_NOTES.md), and frontends must only ever see host
            # arrays.  This also matches the reference's GUIFrame, which
            # carries host buffers (app.rs:84-90).
            from infur_tpu.runtime.devlock import device_lock
            try:
                with device_lock:
                    frame = app.generate()
                    if frame is not None and pool is None:
                        _materialize(frame, app.planes)
            except InfurError as e:
                _flush()  # keep delivery ordered ahead of the error
                frame_tx.put(e)
                continue
            except Exception as e:  # unexpected: surface, keep the loop alive
                _flush()
                frame_tx.put(InfurError(f"{type(e).__name__}: {e}"))
                continue
            if frame is not None:
                if pool is not None:
                    # pipelined: the fetch+decode of THIS frame rides under
                    # the NEXT frame's decode+dispatch (bench-proven relay
                    # pattern: paced dispatches + worker fetches coexist;
                    # the devlock starvation repro was an unpaced producer)
                    futs.append(pool.submit(_mat_job, frame, app.planes))
                    while len(futs) >= depth:
                        _deliver_one()
                else:
                    frame_tx.put(frame)  # blocks on backpressure (main.rs:86-88)

            # EOF isn't a command, but frontends need to see playing flip
            playing = app.vid.geometry is not None
            if playing != last_playing:
                last_playing = playing
                app_tx.put(app.info())
    finally:
        # best-effort delivery of in-flight frames; lossy (put_nowait) so a
        # consumer that already went away can never strand this thread on
        # the bounded channel during exit
        while futs:
            try:
                frame_tx.put_nowait(futs.popleft().result())
            except queue.Full:
                futs.clear()
            except Exception:
                break
        if pool is not None:
            pool.shutdown(wait=False)
        try:
            app.close()
        except Exception:
            pass  # closing a wedged decoder must not kill the thread exit


@dataclass
class ProcHandle:
    """A running processing thread + its channels."""
    ctrl_tx: "queue.Queue[AppCmd | None]"
    frame_rx: "queue.Queue[FrameResult]"
    ctrl_result_rx: "queue.Queue[CtrlResult]"
    thread: threading.Thread

    def send(self, cmd: AppCmd) -> None:
        self.ctrl_tx.put(cmd)

    def stop(self, timeout: float = 10.0) -> None:
        """Graceful shutdown handshake (reference gui.rs:336-347)."""
        from infur_tpu.processing import Stop
        self.send(Stop())
        self.send(Exit())
        # drain so a generate() blocked on the bounded channel can finish
        while self.thread.is_alive():
            try:
                self.frame_rx.get(timeout=0.05)
            except queue.Empty:
                pass
            self.thread.join(timeout=0.001)
            if not self.thread.is_alive():
                break
        self.thread.join(timeout=timeout)


def start_proc(app: ProcessingApp | None = None,
               name: str = "Proc") -> ProcHandle:
    """Spawn the processing thread (reference main.rs:110-112).
    Pass a pre-built app to configure it (e.g. ProcessingApp(model_bucket=32));
    it must not have been used on another thread."""
    ctrl: "queue.Queue[AppCmd | None]" = queue.Queue()
    frames: "queue.Queue[FrameResult]" = queue.Queue(FRAME_CHANNEL_DEPTH)
    results: "queue.Queue[CtrlResult]" = queue.Queue()
    t = threading.Thread(target=proc_loop, args=(ctrl, frames, results, app),
                         name=name, daemon=True)
    t.start()
    return ProcHandle(ctrl_tx=ctrl, frame_rx=frames, ctrl_result_rx=results,
                      thread=t)
