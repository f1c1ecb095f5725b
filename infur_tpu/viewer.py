"""Web viewer frontend (the reference's egui GUI, L6, re-imagined headless).

The reference renders frames in an eframe window with live fps/drop stats,
a pause checkbox, a scale slider, video/model text inputs, per-stage status
lines and a fading error history (reference infur/src/gui.rs).  This
environment has no display, so the frontend is a tiny stdlib HTTP server +
single-page UI speaking to the *same* proc-loop channels:

    GET  /            the UI (vanilla HTML/JS, no dependencies)
    GET  /stream      MJPEG live stream (multipart/x-mixed-replace): one
                      JPEG part per processed frame, pushed as frames
                      arrive — the egui texture upload's web analog
    GET  /frame.png   latest composited frame (PNG, encoded on demand)
    GET  /state       JSON: fps stats, per-stage status, app info, errors
    POST /cmd         {"scale": f} | {"paused": b} | {"video": [..]} |
                      {"model": s} | {"exit": true}

Commands map 1:1 to AppCmds (widget change -> command, gui.rs:258-294);
the MJPEG push stream replaces the 30 ms recv_timeout texture upload
(gui.rs:169-192); the error history keeps the last 8 fatal errors
(gui.rs:308-313).  Transient StageStatus messages (jit-warmup
"compiling…" notices from the scheduler) show on the stage status line
while generate() is blocked.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from infur_tpu.app import (
    AppInfo, Exit, GUIFrame, ModelCmd, ScaleCmd, StageStatus,
)
from infur_tpu.errors import InfurError
from infur_tpu.processing import Pause, Play, Stop
from infur_tpu.runtime.loop import ProcHandle, start_proc
from infur_tpu.runtime.metrics import FrameCounter

_PAGE = """<!doctype html><html><head><title>infur-tpu</title><style>
body{font-family:system-ui;margin:1rem;background:#14161a;color:#dde}
img{max-width:100%;max-height:72vh;object-fit:contain;border:1px solid #333}
.row{margin:.4rem 0}.err{color:#f88}.stage{color:#8bc}
input[type=text]{width:24rem;background:#222;color:#dde;border:1px solid #444}
</style></head><body>
<h3>infur-tpu</h3>
<img id=frame src=/stream>
<div class=row><label><input type=checkbox id=paused> pause</label>
 <label><input type=checkbox id=softmax
  onchange="cmd({softmax:this.checked})"> softmax alpha</label>
 <button onclick="cmd({step:-10})">&#9194;10</button>
 <button onclick="cmd({step:-1})">&#9664;</button>
 <button onclick="cmd({step:1})">&#9654;</button>
 <button onclick="cmd({step:10})">&#9193;10</button>
 <label>seek <input type=number id=seeks style="width:5rem"
  onchange="cmd({seek:parseFloat(this.value)||0})"> s</label>
 <label>scale <input type=range id=scale min=0.1 max=1.0 step=0.01>
 <span id=scaleval></span></label></div>
<div class=row><input type=text id=video placeholder="video input">
 <button onclick="cmd({video:[document.getElementById('video').value]})">play</button>
 <input type=file id=imgfile accept="image/*" style="color:#889"
  onchange="upimg(this.files[0])"></div>
<div class=row><input type=text id=model placeholder="model (.onnx | fcn_resnet50)">
 <button onclick="cmd({model:document.getElementById('model').value})">load</button></div>
<div class=row id=stats></div><div class=row id=classes></div>
<div class=row id=status></div>
<div class=row id=errors></div>
<script>
async function cmd(c){await fetch('/cmd',{method:'POST',body:JSON.stringify(c)})}
async function upimg(f){if(f)await fetch('/image',{method:'POST',
 headers:{'Content-Type':f.type||'image/png'},body:f})}
// a dropped MJPEG connection freezes the <img>; reconnect with backoff
document.getElementById('frame').onerror=()=>setTimeout(()=>{
  document.getElementById('frame').src='/stream?'+Date.now()},1000);
document.getElementById('paused').onchange=e=>cmd({paused:e.target.checked});
document.getElementById('scale').oninput=e=>{
  document.getElementById('scaleval').textContent=e.target.value};
document.getElementById('scale').onchange=e=>cmd({scale:+e.target.value});
// initial widget sync from the persisted surface (eframe-storage analog)
(async()=>{const s=await(await fetch('/state')).json();const c=s.config;
  if(!c)return;
  document.getElementById('paused').checked=c.paused;
  document.getElementById('softmax').checked=c.softmax;
  document.getElementById('scale').value=c.scale;
  document.getElementById('scaleval').textContent=c.scale;
  document.getElementById('video').value=(c.video||[]).join(' ');
  document.getElementById('model').value=c.model||'';
  if(c.seek_secs)document.getElementById('seeks').value=c.seek_secs;})();
setInterval(async()=>{const s=await(await fetch('/state')).json();
  document.getElementById('stats').textContent=
    `shown ${s.shown_fps.toFixed(1)} fps · recv ${s.received_fps.toFixed(1)} · drops ${s.drops.toFixed(1)}`;
  const cl=document.getElementById('classes'); cl.replaceChildren();
  (s.classes||[]).forEach(c=>{
    const chip=document.createElement('span');
    chip.style.cssText=`border-left:0.8rem solid rgb(${c.rgb});`+
      'padding:0 .3rem;margin-right:.5rem';
    chip.textContent=`${c.name} ${c.pct}%`; cl.append(chip)});
  const status=document.getElementById('status'); status.replaceChildren();
  Object.entries(s.stages).forEach(([k,v],i)=>{
    if(i) status.append(' · ');
    const tag=document.createElement('span'); tag.className='stage';
    tag.textContent=k; status.append(tag, ': '+v);});
  const errs=document.getElementById('errors'); errs.replaceChildren(
    ...s.errors.map(e=>{const d=document.createElement('div');
      d.className='err'; d.textContent=e; return d;}));},500);
</script></body></html>"""


class ViewerState:
    """Shared state between the frame-pump thread and HTTP handlers."""

    def __init__(self, handle: ProcHandle, config=None):
        self.handle = handle
        # live config mirror: commands update it so a clean shutdown can
        # persist the session (reference saves ProcConfig on close,
        # gui.rs:349-352); also the source of pix_fmt for UI-initiated
        # Play so a decode-native yuv420p session isn't silently dropped
        # back to packed BGR
        self.config = config
        self.lock = threading.Lock()
        self.new_frame = threading.Condition(self.lock)  # wakes /stream
        self.seq = 0                       # bumps once per displayed frame
        self.jpeg: bytes = b""             # latest frame, stream encoding
        self.jpeg_seq = 0                  # seq the jpeg was encoded at
        self.frame_arr = None              # latest frame, RGBA numpy
        self.stream_clients = 0            # open /stream connections
        self.max_stream_clients = 8        # cap: stuck clients can't pin
        #                                    every HTTP server thread
        self._notices: dict[str, str] = {}  # StageStatus text we set
        self.counter = FrameCounter()
        self.stages: dict[str, str] = {}
        self.errors: deque[str] = deque(maxlen=8)  # fading history (gui.rs:308)
        self.info: AppInfo | None = None
        self.classes: list[dict] = []  # caption chips (reference README todo)
        self.upload_path: str | None = None  # last POST /image temp file
        self.running = True

    def set_upload(self, path: str | None) -> None:
        """Track the current /image temp file; unlink the one it replaces
        (uploads used delete=False and leaked one file per POST)."""
        import os as _os
        with self.lock:
            old, self.upload_path = self.upload_path, path
        if old and old != path:
            try:
                _os.unlink(old)
            except OSError:
                pass

    def pump(self) -> None:
        """Consume the frame channel (the GUI-thread role, gui.rs:169-192)."""
        try:
            from PIL import Image
        except ImportError as e:
            with self.lock:
                self.stages["display"] = f"Pillow unavailable: {e}"
                self.errors.appendleft(f"display: Pillow unavailable: {e}")
            return
        while self.running:
            try:
                r = self.handle.frame_rx.get(timeout=0.03)
            except queue.Empty:
                self._drain_ctrl()
                continue
            if isinstance(r, InfurError):
                with self.lock:
                    self.stages[r.stage] = str(r)
                    self.errors.appendleft(f"{time.strftime('%H:%M:%S')} {r}")
                continue
            frame: GUIFrame = r
            try:
                # frames arrive host-materialized (runtime/loop.py): no
                # device access happens on this thread.  The JPEG (stream
                # encoding) is paid only while someone is watching;
                # /frame.png and late-joining streams encode on demand
                # from the retained array.
                img = frame.composited if frame.composited is not None \
                    else frame.buffer
                arr = np.asarray(img)
                jpeg = (self._encode_jpeg(arr)
                        if self.stream_clients else None)
            except Exception as e:  # encode failure must not kill the pump
                with self.lock:
                    self.stages["display"] = f"{type(e).__name__}: {e}"
                    self.errors.appendleft(
                        f"{time.strftime('%H:%M:%S')} display: {e}")
                continue
            chips = self._class_chips(frame.class_counts)
            with self.new_frame:
                self.frame_arr = arr
                self.seq += 1
                if jpeg is not None:
                    self.jpeg, self.jpeg_seq = jpeg, self.seq
                self.counter.count(frame.id)
                self.stages.pop("video", None)
                # chips is None when the frame carried no class_counts
                # (model unloaded): clear, or the last model's caption
                # chips would persist indefinitely
                self.classes = chips if chips is not None else []
                self.new_frame.notify_all()
            self._drain_ctrl()

    @staticmethod
    def _class_chips(counts) -> list[dict] | None:
        """Top predicted classes as caption chips: name, pixel share, and
        the palette color the mask paints them with."""
        if counts is None:
            return None
        from infur_tpu.ops.colorcode import _DEFAULT_PALETTE, class_labels
        counts = np.asarray(counts)
        total = max(int(counts.sum()), 1)
        names = class_labels(len(counts))
        order = np.argsort(counts)[::-1]
        chips = []
        for k in order[:6]:
            if counts[k] == 0:
                break
            rgb = _DEFAULT_PALETTE[int(k) % len(_DEFAULT_PALETTE)]
            chips.append({"name": names[int(k)],
                          "pct": round(100.0 * int(counts[k]) / total, 1),
                          "rgb": [int(v) for v in rgb]})
        return chips

    @staticmethod
    def _encode_jpeg(arr) -> bytes:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(arr, "RGBA").convert("RGB").save(
            buf, "JPEG", quality=85)
        return buf.getvalue()

    def encode_png(self) -> bytes:
        """Latest frame as PNG (on-demand; /frame.png compatibility)."""
        with self.lock:
            arr = self.frame_arr
        if arr is None:
            return b""
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(arr, "RGBA").save(buf, "PNG")
        return buf.getvalue()

    def wait_frame(self, last_seq: int, timeout: float = 1.0):
        """Block until a frame newer than ``last_seq`` exists (or timeout);
        returns (seq, jpeg) — the /stream producer side.  Re-encodes from
        the retained array when the cached JPEG is stale (the pump skips
        encoding while no stream is connected)."""
        with self.new_frame:
            self.new_frame.wait_for(
                lambda: self.seq != last_seq or not self.running,
                timeout=timeout)
            seq, arr = self.seq, self.frame_arr
            if self.jpeg_seq == seq or arr is None:
                return seq, self.jpeg
        jpeg = self._encode_jpeg(arr)  # encode outside the lock
        with self.lock:
            if self.jpeg_seq < seq:  # don't clobber a newer pump encode
                self.jpeg, self.jpeg_seq = jpeg, seq
            return self.seq, self.jpeg

    def _drain_ctrl(self) -> None:
        while True:
            try:
                r = self.handle.ctrl_result_rx.get_nowait()
            except queue.Empty:
                return
            with self.lock:
                if isinstance(r, InfurError):
                    self.stages[r.stage] = str(r)
                    self.errors.appendleft(f"{time.strftime('%H:%M:%S')} {r}")
                elif isinstance(r, AppInfo):
                    self.info = r
                elif isinstance(r, StageStatus):  # e.g. "compiling WxH…"
                    if r.text:
                        self.stages[r.stage] = r.text
                        self._notices[r.stage] = r.text
                    else:
                        # clear ONLY the notice we set: an error that
                        # landed on this stage meanwhile must survive
                        if self.stages.get(r.stage) == self._notices.pop(
                                r.stage, None):
                            self.stages.pop(r.stage, None)

    def state_json(self) -> bytes:
        cfg = self.config
        with self.lock:
            stats = self.counter.stats()
            info = self.info
            return json.dumps({
                # the persisted surface, for initial widget sync (the
                # reference restores every widget from eframe storage,
                # gui.rs:148-155)
                "config": None if cfg is None else {
                    "scale": cfg.scale, "paused": cfg.paused,
                    "video": cfg.video_input, "model": cfg.model_input,
                    "softmax": cfg.softmax, "seek_secs": cfg.seek_secs},
                "shown_fps": stats.shown_fps if stats else 0.0,
                "received_fps": stats.received_fps if stats else 0.0,
                "drops": stats.drops if stats else 0.0,
                "stages": dict(self.stages),
                "errors": list(self.errors),
                "classes": list(self.classes),
                "info": None if info is None else {
                    "scale": info.scale, "playing": info.playing,
                    "paused": info.paused,
                    "model": info.model.spec if info.model else None,
                    "geometry": info.geometry,
                    "timings_ms": info.timings_ms},
            }).encode()

    def apply_cmd(self, c: dict) -> None:
        cfg = self.config
        if "scale" in c:
            self.handle.send(ScaleCmd(float(c["scale"])))
            if cfg is not None:
                cfg.scale = float(c["scale"])
        if "paused" in c:
            self.handle.send(Pause(bool(c["paused"])))
            if cfg is not None:
                cfg.paused = bool(c["paused"])
        if "video" in c:
            # preserve the session wire format (or take an explicit one)
            pix = str(c.get("pix_fmt")
                      or getattr(cfg, "pix_fmt", None) or "bgr24")
            self.handle.send(Play([str(v) for v in c["video"]], pix_fmt=pix))
            if cfg is not None:
                cfg.video_input = [str(v) for v in c["video"]]
                cfg.pix_fmt = pix
        if "model" in c:
            self.handle.send(ModelCmd(str(c["model"])))
            if cfg is not None:
                cfg.model_input = str(c["model"])
        if "softmax" in c:
            from infur_tpu.app import ColorCmd
            self.handle.send(ColorCmd(softmax=bool(c["softmax"])))
            if cfg is not None:
                cfg.softmax = bool(c["softmax"])
        if "seek" in c:
            from infur_tpu.processing import Seek
            self.handle.send(Seek(float(c["seek"])))
            if cfg is not None:
                cfg.seek_secs = float(c["seek"])
        if "step" in c:
            from infur_tpu.processing import Step
            self.handle.send(Step(int(c["step"])))
        if c.get("stop"):
            self.handle.send(Stop())
        if c.get("exit"):
            self.running = False


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif path == "/frame.png":
                png = state.encode_png()
                if png:
                    self._send(200, png, "image/png")
                else:
                    self._send(404, b"no frame yet", "text/plain")
            elif path == "/stream":
                self._stream()
            elif path == "/state":
                self._send(200, state.state_json(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def _stream(self):
            """MJPEG push: one part per processed frame, no client polling.
            Runs on this request's thread until the client disconnects or
            the viewer exits.  Concurrent streams are capped so stuck
            clients can't pin every ThreadingHTTPServer thread."""
            # reserve the slot in the SAME critical section as the check:
            # concurrent requests at cap-1 must not all pass the check
            with state.lock:
                if state.stream_clients >= state.max_stream_clients:
                    reserved = False
                else:
                    state.stream_clients += 1
                    reserved = True
            if not reserved:
                self._send(503, b"too many stream clients", "text/plain")
                return
            self.send_response(200)
            self.send_header("Content-Type",
                             "multipart/x-mixed-replace; boundary=infurframe")
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            last = 0  # pre-frame seq: waits if no frame ever arrived,
            #           sends the current frame immediately otherwise
            try:
                while state.running:
                    seq, jpeg = state.wait_frame(last)
                    if seq == last or not jpeg:
                        # timeout tick (paused/idle): probe the socket so
                        # abandoned connections don't leak threads — a
                        # stream client never sends after the request, so
                        # readable means FIN (or junk we also hang up on)
                        import select
                        r, _, _ = select.select([self.connection], [], [], 0)
                        if r:
                            break
                        continue
                    last = seq
                    self.wfile.write(
                        b"--infurframe\r\nContent-Type: image/jpeg\r\n"
                        + f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
                        + jpeg + b"\r\n")
            except OSError:
                pass  # client went away — normal stream teardown
            finally:
                with state.lock:
                    state.stream_clients -= 1

        def do_POST(self):
            if self.path not in ("/cmd", "/image"):
                self._send(404, b"not found", "text/plain")
                return
            # reject cross-origin browser posts (drive-by command injection);
            # same-origin fetches and originless clients (curl) are fine
            origin = self.headers.get("Origin")
            host = self.headers.get("Host", "")
            if origin and origin.split("//")[-1] != host:
                self._send(403, b"cross-origin commands rejected", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            if self.path == "/image":
                self._image_upload(n)
                return
            try:
                cmd = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(cmd, dict):
                    raise ValueError("command must be a JSON object")
                state.apply_cmd(cmd)
                self._send(200, b"ok", "text/plain")
            except Exception as e:  # malformed shapes answer 400, not EOF
                self._send(400, f"bad command: {e}".encode(), "text/plain")

        def _image_upload(self, n: int) -> None:
            """POST /image: raw image bytes -> temp file -> Play([file])
            (the still-image source, video/image.py: one frame, retained)."""
            if not 0 < n <= 32 << 20:
                self._send(413, b"image too large (32 MB cap)", "text/plain")
                return
            import tempfile
            ctype = self.headers.get("Content-Type", "image/png")
            ext = {"image/jpeg": ".jpg", "image/webp": ".webp",
                   "image/bmp": ".bmp"}.get(ctype.split(";")[0], ".png")
            body = self.rfile.read(n)
            f = tempfile.NamedTemporaryFile(prefix="infur_upload_",
                                            suffix=ext, delete=False)
            with f:
                f.write(body)
            try:
                state.apply_cmd({"video": [f.name]})
                state.set_upload(f.name)  # unlinks the upload it replaces
                self._send(200, b"ok", "text/plain")
            except Exception as e:
                state.set_upload(f.name)  # still ours to clean up
                self._send(400, f"bad image: {e}".encode(), "text/plain")

    return Handler


def serve(host: str = "127.0.0.1", port: int = 8793,
          config=None, ready_event: threading.Event | None = None,
          handle: ProcHandle | None = None,
          config_path: str | None = None, wire: str = "dense") -> None:
    """Run the viewer until /cmd {"exit": true} (close handshake:
    Stop+Exit to the proc thread, then join — gui.rs:336-347).  On clean
    shutdown the live config is saved to ``config_path`` (the reference
    persists ProcConfig via eframe on close, gui.rs:349-352)."""
    if handle is None:
        from infur_tpu.app import ProcessingApp
        bucket = getattr(config, "model_bucket", None)
        # the viewer displays composited (buffer as its no-model fallback):
        # skip computing/fetching the decoded plane entirely
        handle = start_proc(ProcessingApp(model_bucket=bucket, wire=wire,
                                          planes={"composited"}))
    if config is not None:
        for cmd in config.commands():
            handle.send(cmd)
    state = ViewerState(handle, config=config)
    pump = threading.Thread(target=state.pump, name="viewer-pump", daemon=True)
    pump.start()
    server = ThreadingHTTPServer((host, port), make_handler(state))
    if ready_event is not None:
        ready_event.set()
    server.timeout = 0.2
    try:
        while state.running:
            server.handle_request()
    finally:
        server.server_close()
        state.running = False
        with state.new_frame:
            state.new_frame.notify_all()  # release blocked /stream threads
        handle.stop()
        pump.join(timeout=2)
        state.set_upload(None)  # remove the last /image temp file
        if config is not None and config_path is not None:
            try:
                config.save(config_path)
            except OSError:
                pass  # persisting settings must never turn exit into a crash
