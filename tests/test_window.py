"""Native desktop window frontend (SDL dummy driver): blit, keys, exit.

The reference's GUI is an eframe window (infur/src/gui.rs); this exercises
the SDL analog end-to-end headlessly — SDL's dummy video driver renders to
a real in-memory surface, so pixel assertions and the full event/command
path run in CI without a display.
"""

import os
import queue
import threading
import time

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from infur_tpu.app import ColorCmd, ScaleCmd  # noqa: E402
from infur_tpu.processing import Pause, Seek, Step, Stop  # noqa: E402
from infur_tpu.runtime.config import ProcConfig  # noqa: E402
from infur_tpu.viewer import ViewerState  # noqa: E402
from infur_tpu.window import WindowViewer, fit_rect, run_window  # noqa: E402


class FakeHandle:
    """Records sends; provides the queues ViewerState's pump expects."""

    def __init__(self):
        self.sent = []
        self.frame_rx = queue.Queue()
        self.ctrl_result_rx = queue.Queue()

    def send(self, cmd):
        self.sent.append(cmd)

    def stop(self):
        pass


def _key(k, mod=0):
    return pygame.event.Event(pygame.KEYDOWN, {"key": k, "mod": mod})


class TestFitRect:
    def test_wide_frame_letterboxes(self):
        x, y, w, h = fit_rect(1920, 1080, 960, 960)
        assert (w, h) == (960, 540) and x == 0 and y == 210

    def test_tall_viewport_pillarboxes(self):
        x, y, w, h = fit_rect(100, 100, 300, 100)
        assert (w, h) == (100, 100) and x == 100 and y == 0

    def test_degenerate(self):
        assert fit_rect(0, 0, 100, 100) == (0, 0, 0, 0)


@pytest.fixture()
def win():
    handle = FakeHandle()
    cfg = ProcConfig(scale=0.5, paused=False, softmax=False)
    state = ViewerState(handle, config=cfg)
    viewer = WindowViewer(state, width=320, height=260)
    yield viewer, state, handle
    viewer.close()


class TestKeys:
    """Each key maps to the same command its web widget sends
    (gui.rs:258-294 parity, via ViewerState.apply_cmd)."""

    def test_space_toggles_pause_and_mirrors_config(self, win):
        viewer, state, handle = win
        viewer.handle_event(_key(pygame.K_SPACE))
        assert isinstance(handle.sent[-1], Pause) and handle.sent[-1].paused
        assert state.config.paused is True
        viewer.handle_event(_key(pygame.K_SPACE))
        assert handle.sent[-1].paused is False

    def test_steps(self, win):
        viewer, _, handle = win
        viewer.handle_event(_key(pygame.K_RIGHT))
        viewer.handle_event(_key(pygame.K_LEFT))
        viewer.handle_event(_key(pygame.K_RIGHT, pygame.KMOD_SHIFT))
        steps = [c.frames for c in handle.sent if isinstance(c, Step)]
        assert steps == [1, -1, 10]

    def test_scale_clamped(self, win):
        viewer, state, handle = win
        viewer.handle_event(_key(pygame.K_UP))
        assert isinstance(handle.sent[-1], ScaleCmd)
        assert handle.sent[-1].factor == pytest.approx(0.55)
        for _ in range(20):
            viewer.handle_event(_key(pygame.K_DOWN))
        assert state.config.scale == pytest.approx(0.1)  # floor

    def test_seek_softmax_stop(self, win):
        viewer, state, handle = win
        viewer.handle_event(_key(pygame.K_HOME))
        viewer.handle_event(_key(pygame.K_x))
        viewer.handle_event(_key(pygame.K_s))
        kinds = [type(c) for c in handle.sent]
        assert kinds == [Seek, ColorCmd, Stop]
        assert state.config.softmax is True

    def test_resize_rebuilds_viewport(self, win):
        viewer, state, _ = win
        with state.lock:
            state.frame_arr = np.full((8, 8, 4), 255, np.uint8)
            state.seq = 1
        assert viewer.render()
        ev = pygame.event.Event(pygame.VIDEORESIZE, {"w": 500, "h": 400})
        viewer.handle_event(ev)
        assert viewer.screen.get_size() == (500, 400)
        assert viewer.render()  # re-blits at the new geometry
        assert viewer.pixels().shape[:2] == (400, 500)

    def test_quit_keys_and_window_close(self, win):
        viewer, state, _ = win
        viewer.handle_event(_key(pygame.K_q))
        assert state.running is False
        state.running = True
        viewer.handle_event(pygame.event.Event(pygame.QUIT, {}))
        assert state.running is False


class TestRender:
    def test_frame_blits_to_surface(self, win):
        viewer, state, _ = win
        arr = np.zeros((48, 64, 4), np.uint8)
        arr[:, :, 1] = 200  # green frame
        arr[:, :, 3] = 255
        with state.lock:
            state.frame_arr = arr
            state.seq = 1
        assert viewer.render()
        px = viewer.pixels()
        assert px.shape[0] == 260 and px.shape[1] == 320
        view = px[: 260 - 72]  # above the HUD strip
        assert view[:, :, 1].max() >= 190  # the green frame landed
        # letterbox margins stay background
        assert view[0, 0, 1] < 60

    def test_render_skips_when_nothing_new(self, win):
        viewer, state, _ = win
        with state.lock:
            state.frame_arr = np.zeros((8, 8, 4), np.uint8)
            state.seq = 1
        assert viewer.render()
        viewer._last_hud = time.monotonic()  # HUD freshly drawn
        assert viewer.render() is False

    def test_hud_shows_errors(self, win):
        viewer, state, _ = win
        with state.lock:
            state.errors.appendleft("video: boom")
        viewer._last_hud = 0.0
        assert viewer.render()
        px = viewer.pixels()
        hud = px[260 - 72:]
        # the error line renders in red (255,136,136)
        reds = (hud[:, :, 0] > 200) & (hud[:, :, 1] < 180)
        assert reds.any()


class TestEndToEnd:
    def test_run_window_over_synth_source(self, tmp_path):
        """Full path: proc loop -> pump -> SDL blit -> auto-exit -> config
        persisted (the close handshake, gui.rs:336-352)."""
        cfg = ProcConfig(video_input=["synth:64x48@30:10"], scale=1.0)
        path = str(tmp_path / "win.json")
        t = threading.Thread(
            target=run_window,
            kwargs=dict(config=cfg, width=320, height=240,
                        config_path=path, max_seconds=6.0),
            daemon=True)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive()
        assert os.path.exists(path)
        saved = ProcConfig.load(path)
        assert saved.video_input == ["synth:64x48@30:10"]
