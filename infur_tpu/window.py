"""Native desktop window frontend (the reference's egui/wgpu window, L6).

The reference renders frames in an eframe window: a per-frame texture
upload on a 30 ms recv_timeout (reference infur/src/gui.rs:169-192),
widget changes mapped to AppCmds (gui.rs:258-294), live fps/drop stats,
per-stage status lines and a fading error history (gui.rs:308-313).
This frontend is the SDL equivalent: a desktop window whose main loop
blits each composited frame aspect-fit (the texture upload), draws a HUD
with the same stats the web viewer serves, and maps keyboard input to
the same commands the web widgets send.  Headless machines (CI, TPU
hosts) exercise the full path via SDL's ``dummy`` video driver
(``SDL_VIDEODRIVER=dummy``); a real display gets a real window.

It shares ``ViewerState`` with the web viewer: the pump thread consuming
the frame channel, the fps counter, stage status, error history, class
chips, config mirror and command routing are identical — only the sink
differs (SDL surface blit instead of an MJPEG part).

Keys (the widget surface, gui.rs:258-294):
    space        pause / resume
    left/right   step -1 / +1 frames (shift: +-10)
    up/down      scale +0.05 / -0.05
    home         seek to 0 s
    x            toggle softmax alpha
    s            stop playback
    q / escape   exit (close handshake: Stop+Exit, then join)
"""

from __future__ import annotations

import threading
import time

import numpy as np

from infur_tpu.errors import InfurError
from infur_tpu.viewer import ViewerState

HUD_H = 72  # pixels reserved below the frame for stats/chips/errors


class WindowUnavailable(InfurError):
    """SDL (pygame) is not importable or the video driver failed to init."""

    def __init__(self, msg: str):
        super().__init__(msg, stage="window")


def _import_pygame():
    try:
        import pygame
    except ImportError as e:  # pragma: no cover - pygame is in the image
        raise WindowUnavailable(f"pygame unavailable: {e}") from e
    return pygame


def fit_rect(fw: int, fh: int, ww: int, wh: int) -> tuple[int, int, int, int]:
    """Aspect-fit a (fw x fh) frame into a (ww x wh) viewport: returns
    (x, y, w, h) of the centered destination rect (the web viewer's
    object-fit:contain, the reference's egui image sizing)."""
    if fw <= 0 or fh <= 0 or ww <= 0 or wh <= 0:
        return 0, 0, 0, 0
    s = min(ww / fw, wh / fh)
    w, h = max(int(fw * s), 1), max(int(fh * s), 1)
    return (ww - w) // 2, (wh - h) // 2, w, h


class WindowViewer:
    """SDL window over a ViewerState: render loop + key->command map.

    Split from ``run_window`` so tests can drive ``handle_event`` /
    ``render`` directly under the dummy video driver.
    """

    def __init__(self, state: ViewerState, width: int = 1024,
                 height: int = 640, title: str = "infur-tpu"):
        pygame = self.pg = _import_pygame()
        self.state = state
        try:
            pygame.display.init()
            pygame.font.init()
            self.screen = pygame.display.set_mode(
                (width, height), pygame.RESIZABLE)
        except pygame.error as e:
            raise WindowUnavailable(f"SDL video init failed: {e}") from e
        pygame.display.set_caption(title)
        self.font = pygame.font.Font(None, 20)
        self.title = title
        self._last_seq = -1
        self._last_hud = 0.0
        self._surf = None  # cached frame surface (rebuilt per new frame)

    # ---- input: keys -> the same commands the web widgets send ----

    def handle_event(self, ev) -> None:
        pygame = self.pg
        state = self.state
        if ev.type == pygame.QUIT:
            state.apply_cmd({"exit": True})
            return
        if ev.type == pygame.VIDEORESIZE:
            self.screen = pygame.display.set_mode(
                (max(ev.w, 160), max(ev.h, 120)), pygame.RESIZABLE)
            self._last_seq = -1  # force a re-blit at the new geometry
            return
        if ev.type != pygame.KEYDOWN:
            return
        cfg = state.config
        shift = bool(ev.mod & pygame.KMOD_SHIFT)
        if ev.key == pygame.K_SPACE:
            cur = bool(cfg.paused) if cfg is not None else False
            state.apply_cmd({"paused": not cur})
        elif ev.key == pygame.K_RIGHT:
            state.apply_cmd({"step": 10 if shift else 1})
        elif ev.key == pygame.K_LEFT:
            state.apply_cmd({"step": -10 if shift else -1})
        elif ev.key in (pygame.K_UP, pygame.K_DOWN):
            cur = float(cfg.scale) if cfg is not None else 0.5
            d = 0.05 if ev.key == pygame.K_UP else -0.05
            state.apply_cmd({"scale": round(min(max(cur + d, 0.1), 1.0), 2)})
        elif ev.key == pygame.K_HOME:
            state.apply_cmd({"seek": 0.0})
        elif ev.key == pygame.K_x:
            cur = bool(cfg.softmax) if cfg is not None else False
            state.apply_cmd({"softmax": not cur})
        elif ev.key == pygame.K_s:
            state.apply_cmd({"stop": True})
        elif ev.key in (pygame.K_q, pygame.K_ESCAPE):
            state.apply_cmd({"exit": True})

    # ---- output: frame blit + HUD (the texture upload + status panel) ----

    def render(self) -> bool:
        """Blit the latest frame (if newer than last drawn) and refresh the
        HUD at ~4 Hz; returns True when anything was drawn."""
        pygame = self.pg
        state = self.state
        now = time.monotonic()
        with state.lock:
            seq, arr = state.seq, state.frame_arr
        new_frame = seq != self._last_seq and arr is not None
        hud_due = now - self._last_hud >= 0.25
        if not new_frame and not hud_due:
            return False
        ww, wh = self.screen.get_size()
        view_h = max(wh - HUD_H, 1)
        if new_frame:
            self._last_seq = seq
            fh, fw = arr.shape[:2]
            # RGBA row-major bytes -> SDL surface (the texture upload)
            self._surf = pygame.image.frombuffer(
                np.ascontiguousarray(arr).tobytes(), (fw, fh), "RGBA")
        self.screen.fill((20, 22, 26))
        if self._surf is not None:
            fw, fh = self._surf.get_size()
            x, y, w, h = fit_rect(fw, fh, ww, view_h)
            surf = self._surf if (w, h) == (fw, fh) else \
                pygame.transform.smoothscale(self._surf, (w, h))
            self.screen.blit(surf, (x, y))
        self._draw_hud(ww, wh, view_h)
        pygame.display.flip()
        if hud_due:
            self._last_hud = now
        return True

    def _draw_hud(self, ww: int, wh: int, view_h: int) -> None:
        pygame = self.pg
        state = self.state
        with state.lock:
            stats = state.counter.stats()
            stages = dict(state.stages)
            errors = list(state.errors)[:2]
            chips = list(state.classes)
        line = (f"shown {stats.shown_fps:.1f} fps · "
                f"recv {stats.received_fps:.1f} · drops {stats.drops:.1f}"
                if stats else "no frames yet")
        if stages:
            line += "   " + " · ".join(f"{k}: {v}" for k, v in stages.items())
        y = view_h + 4
        self.screen.blit(
            self.font.render(line[:200], True, (220, 221, 238)), (8, y))
        pygame.display.set_caption(
            f"{self.title} — {stats.shown_fps:.1f} fps" if stats
            else self.title)
        x = 8
        y += 22
        for c in chips:  # class caption chips: palette swatch + name + %
            sw = pygame.Rect(x, y + 2, 10, 14)
            pygame.draw.rect(self.screen, tuple(c["rgb"]), sw)
            t = self.font.render(f'{c["name"]} {c["pct"]}%', True,
                                 (200, 200, 210))
            self.screen.blit(t, (x + 14, y))
            x += 20 + t.get_width()
            if x > ww - 80:
                break
        y += 22
        for e in errors:  # fading error history (gui.rs:308-313)
            self.screen.blit(
                self.font.render(str(e)[:200], True, (255, 136, 136)), (8, y))
            y += 20

    def pixels(self) -> np.ndarray:
        """Window surface as (H, W, 3) RGB — the dummy-driver test's eye."""
        return self.pg.surfarray.array3d(self.screen).swapaxes(0, 1)

    def close(self) -> None:
        self.pg.display.quit()


def run_window(config=None, width: int = 1024, height: int = 640,
               wire: str = "dense", config_path: str | None = None,
               handle=None, max_seconds: float | None = None) -> None:
    """Open the window and run until the user exits (q/escape/close) —
    the desktop analog of viewer.serve(): same proc loop, same close
    handshake (Stop+Exit then join), same config persistence on clean
    shutdown (gui.rs:336-352).  ``max_seconds`` bounds headless smoke
    runs."""
    pygame = _import_pygame()
    if handle is None:
        from infur_tpu.app import ProcessingApp
        from infur_tpu.runtime.loop import start_proc
        bucket = getattr(config, "model_bucket", None)
        handle = start_proc(ProcessingApp(model_bucket=bucket, wire=wire,
                                          planes={"composited"}))
    if config is not None:
        for cmd in config.commands():
            handle.send(cmd)
    state = ViewerState(handle, config=config)
    try:
        viewer = WindowViewer(state, width, height)
    except WindowUnavailable:
        handle.stop()  # no window -> shut the proc loop down, don't leak it
        raise
    pump = threading.Thread(target=state.pump, name="window-pump",
                            daemon=True)
    pump.start()
    t0 = time.monotonic()
    clock = pygame.time.Clock()
    try:
        while state.running:
            for ev in pygame.event.get():
                viewer.handle_event(ev)
            viewer.render()
            if max_seconds is not None and time.monotonic() - t0 > max_seconds:
                state.apply_cmd({"exit": True})
            clock.tick(33)  # ~30 ms — the reference's recv_timeout cadence
    finally:
        state.running = False
        handle.stop()
        pump.join(timeout=2)
        viewer.close()
        if config is not None and config_path is not None:
            try:
                config.save(config_path)
            except OSError:
                pass  # persisting settings must never turn exit into a crash
