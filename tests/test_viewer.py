"""Web viewer frontend: endpoints, command routing, close handshake."""

import json
import threading
import time
import urllib.request

import numpy as np

import pytest

from infur_tpu.runtime.config import ProcConfig
from infur_tpu.viewer import serve


@pytest.fixture()
def viewer_url():
    cfg = ProcConfig(video_input=["synth:64x48@30:10"], scale=1.0)
    ready = threading.Event()
    port = 18793
    t = threading.Thread(target=serve,
                         args=("127.0.0.1", port),
                         kwargs={"config": cfg, "ready_event": ready},
                         daemon=True)
    t.start()
    assert ready.wait(10)
    url = f"http://127.0.0.1:{port}"
    yield url
    try:
        _post(url, {"exit": True})
    except OSError:
        pass
    t.join(timeout=10)
    assert not t.is_alive()


def _get(url: str, path: str) -> bytes:
    with urllib.request.urlopen(url + path, timeout=5) as r:
        return r.read()


def _post(url: str, cmd: dict) -> None:
    req = urllib.request.Request(url + "/cmd", data=json.dumps(cmd).encode(),
                                 method="POST")
    urllib.request.urlopen(req, timeout=5).read()


def test_page_and_state(viewer_url):
    page = _get(viewer_url, "/")
    assert b"infur-tpu" in page
    state = json.loads(_get(viewer_url, "/state"))
    assert set(state) >= {"shown_fps", "stages", "errors", "info"}


def test_frame_updates_and_commands(viewer_url):
    deadline = time.time() + 10
    png = b""
    while time.time() < deadline:
        try:
            png = _get(viewer_url, "/frame.png")
            break
        except urllib.error.HTTPError:
            time.sleep(0.1)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    _post(viewer_url, {"paused": True})
    _post(viewer_url, {"scale": 0.5})
    time.sleep(0.5)
    state = json.loads(_get(viewer_url, "/state"))
    assert state["info"]["paused"] is True
    assert state["info"]["scale"] == 0.5


def test_bad_command_is_400(viewer_url):
    import urllib.error
    req = urllib.request.Request(viewer_url + "/cmd", data=b"{not json",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=5)
    assert ei.value.code == 400


def test_command_error_routed_to_errors(viewer_url):
    _post(viewer_url, {"model": "bogus_family"})
    deadline = time.time() + 5
    while time.time() < deadline:
        state = json.loads(_get(viewer_url, "/state"))
        if state["errors"]:
            break
        time.sleep(0.1)
    assert any("bogus_family" in e for e in state["errors"])
    assert "model" in state["stages"]


def test_malformed_but_valid_json_is_400(viewer_url):
    import urllib.error
    for body in (b'{"scale": null}', b'[1]', b'{"video": 42}'):
        req = urllib.request.Request(viewer_url + "/cmd", data=body,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=5)
        assert ei.value.code == 400, body


def test_cross_origin_post_rejected(viewer_url):
    import urllib.error
    req = urllib.request.Request(
        viewer_url + "/cmd", data=b'{"paused": true}', method="POST",
        headers={"Origin": "http://evil.example"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=5)
    assert ei.value.code == 403


def test_mjpeg_stream_pushes_frames(viewer_url):
    """/stream is multipart/x-mixed-replace and pushes JPEG parts as
    frames are processed (no client polling)."""
    req = urllib.request.Request(viewer_url + "/stream")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert "multipart/x-mixed-replace" in r.headers.get("Content-Type", "")
        data = b""
        deadline = time.time() + 10
        while time.time() < deadline and data.count(b"--infurframe") < 3:
            data += r.read1(65536)
    parts = data.split(b"--infurframe")
    jpegs = [p for p in parts if b"image/jpeg" in p]
    assert len(jpegs) >= 2
    body = jpegs[0].split(b"\r\n\r\n", 1)[1]
    assert body[:3] == b"\xff\xd8\xff"  # JPEG SOI marker


def test_stage_status_compiling_notice():
    """The scheduler announces jit warmup: loading a model then playing
    emits StageStatus("model", "compiling …") before the blocking advance
    and clears it after (shown by the viewer's stage line)."""
    import queue

    from infur_tpu.app import ProcessingApp, StageStatus

    app = ProcessingApp()
    seen: "queue.Queue" = queue.Queue()
    app.status_cb = seen.put
    app.control(__import__("infur_tpu.app", fromlist=["ModelCmd"])
                .ModelCmd("fcn_resnet50"))
    from infur_tpu.processing import Play
    app.control(Play(["synth:64x48@30:2"]))
    from infur_tpu.processing import Cell
    out = Cell()
    app.advance(None, out)
    first = seen.get_nowait()
    assert isinstance(first, StageStatus) and first.stage == "model"
    assert "compiling" in first.text and "64" in first.text
    assert seen.get_nowait().text == ""  # cleared after the advance
    # warm shape: advancing again emits no further notices
    app.advance(None, out)
    assert seen.empty()
    app.close()


def test_abandoned_stream_on_idle_viewer_exits_cleanly():
    """A /stream client that disconnects while no frames flow (idle/paused
    session) must not leak its handler thread or block shutdown — the
    timeout tick probes the socket for FIN."""
    import socket

    from infur_tpu.runtime.config import ProcConfig
    from infur_tpu.viewer import serve

    ready = threading.Event()
    port = 18794
    t = threading.Thread(  # no video: the pump never produces a frame
        target=serve, args=("127.0.0.1", port),
        kwargs={"config": ProcConfig(video_input=[]), "ready_event": ready},
        daemon=True)
    t.start()
    assert ready.wait(10)
    before = threading.active_count()
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")
    assert b"multipart/x-mixed-replace" in s.recv(4096)
    s.close()  # abandon while idle
    deadline = time.time() + 5
    while time.time() < deadline and threading.active_count() > before:
        time.sleep(0.2)
    assert threading.active_count() <= before  # handler thread reaped
    _post(f"http://127.0.0.1:{port}", {"exit": True})
    t.join(timeout=10)
    assert not t.is_alive()


def test_config_persisted_on_clean_exit(tmp_path):
    """Reference behavior: ProcConfig is saved on close (gui.rs:349-352)
    and replayed on the next start — run, change scale via /cmd, exit,
    reload: the scale (and a UI-initiated video + its wire format) are
    restored."""
    from infur_tpu.runtime.config import ProcConfig
    from infur_tpu.viewer import serve

    cfg_path = str(tmp_path / "viewer_config.json")
    cfg = ProcConfig(video_input=["synth:64x48@30:10"], scale=1.0,
                     pix_fmt="yuv420p")
    ready = threading.Event()
    port = 18795
    t = threading.Thread(target=serve, args=("127.0.0.1", port),
                         kwargs={"config": cfg, "ready_event": ready,
                                 "config_path": cfg_path},
                         daemon=True)
    t.start()
    assert ready.wait(10)
    url = f"http://127.0.0.1:{port}"
    _post(url, {"scale": 0.25})
    _post(url, {"video": ["synth:32x32@10:5"]})
    _post(url, {"exit": True})
    t.join(timeout=10)
    assert not t.is_alive()

    restored = ProcConfig.load(cfg_path)
    assert restored.scale == 0.25
    assert restored.video_input == ["synth:32x32@10:5"]
    # a decode-native session keeps its wire format across UI-initiated
    # playback (round-1 ADVICE: it used to fall back to bgr24)
    assert restored.pix_fmt == "yuv420p"


def test_stream_client_cap(viewer_url):
    """Concurrent /stream connections past the cap get 503 instead of
    pinning another server thread (VERDICT r1 weak #8)."""
    import http.client
    import urllib.error

    host, port = viewer_url.replace("http://", "").split(":")
    conns = []
    try:
        # saturate the cap with idle stream connections
        for _ in range(8):
            c = http.client.HTTPConnection(host, int(port), timeout=5)
            c.request("GET", "/stream")
            r = c.getresponse()
            assert r.status == 200
            conns.append((c, r))
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(viewer_url, "/stream")
        assert exc.value.code == 503
    finally:
        for c, r in conns:
            r.close()  # the response holds the socket — close it too, or
            c.close()  # the server never sees the FIN
        conns.clear()
    # closing frees slots again
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            c = http.client.HTTPConnection(host, int(port), timeout=5)
            c.request("GET", "/stream")
            assert c.getresponse().status == 200
            c.close()
            break
        except AssertionError:
            time.sleep(0.2)
    else:
        raise AssertionError("slot never freed after disconnect")


def test_image_upload_plays_still(viewer_url, tmp_path, rng):
    """POST /image: uploaded bytes become a still-image Play; the frame
    geometry follows the uploaded image."""
    import io

    from PIL import Image
    bgr = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(bgr[:, :, ::-1], "RGB").save(buf, format="PNG")
    req = urllib.request.Request(
        viewer_url + "/image", data=buf.getvalue(), method="POST",
        headers={"Content-Type": "image/png"})
    assert urllib.request.urlopen(req, timeout=5).status == 200
    # the still displays: frame.png takes the uploaded image's geometry
    # (after its single frame, EOF retains it — video/image.py)
    deadline = time.time() + 10
    size = None
    while time.time() < deadline:
        try:
            png = _get(viewer_url, "/frame.png")
        except urllib.error.HTTPError:
            time.sleep(0.2)
            continue
        size = Image.open(io.BytesIO(png)).size
        if size == (30, 20):
            break
        time.sleep(0.2)
    assert size == (30, 20)


def test_class_caption_chips(viewer_url):
    """With a model loaded, /state carries class-caption chips (name, pixel
    share, palette color) — the reference README's captions todo."""
    _post(viewer_url, {"model": "lraspp"})
    deadline = time.time() + 60
    classes = []
    while time.time() < deadline:
        classes = json.loads(_get(viewer_url, "/state")).get("classes", [])
        if classes:
            break
        time.sleep(0.3)
    assert classes, "no class chips after 60s"
    top = classes[0]
    assert set(top) == {"name", "pct", "rgb"}
    assert 0 < top["pct"] <= 100 and len(top["rgb"]) == 3
