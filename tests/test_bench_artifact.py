"""The bench artifact is unloseable (VERDICT r3 #1).

Round 3's official number was lost because bench.py sat in its preflight
wait past the driver's kill timeout with no SIGTERM handler — rc=124 and
no JSON line.  These tests run bench.py as a real subprocess (CPU-pinned
via INFUR_BENCH_CPU=1 — the env var alone is ignored by the axon
sitecustomize) and prove a parseable JSON line comes out of EVERY exit
path: SIGTERM at any phase, the wall-clock deadline, the progress
watchdog, and a clean finish.  Reference bar: errors are values routed
out, never lost (infur/src/main.rs:69-72).
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "bench.py"


def _env(tmp_path, **over):
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), str(REPO)) if p)
    env.update({
        "INFUR_BENCH_CPU": "1",
        "INFUR_BENCH_WH": "128x128",
        "INFUR_BENCH_BATCH": "2",
        "INFUR_BENCH_FRAMES": "6",
        "INFUR_BENCH_ROUNDS": "1",
        "INFUR_BENCH_FIDELITY": "0",
        "INFUR_BENCH_MFU": "0",
        "INFUR_BENCH_INTERACTIVE": "0",
        "INFUR_BENCH_INGEST": "dense",
        "INFUR_BENCH_DEADLINE_S": "0",
        "INFUR_BENCH_SIDE": str(tmp_path / "partial.json"),
    })
    env.update({k: str(v) for k, v in over.items()})
    return env


def _launch(tmp_path, **over):
    errf = open(tmp_path / "stderr.txt", "wb")
    proc = subprocess.Popen(
        [sys.executable, str(BENCH)], stdout=subprocess.PIPE, stderr=errf,
        stdin=subprocess.DEVNULL, env=_env(tmp_path, **over))
    return proc, tmp_path / "stderr.txt"


def _wait_for_marker(errpath: Path, marker: str, timeout: float) -> None:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if marker in errpath.read_text(errors="replace"):
            return
        time.sleep(0.2)
    raise AssertionError(
        f"marker {marker!r} never appeared; stderr:\n"
        + errpath.read_text(errors="replace"))


def _json_line(stdout: bytes) -> dict:
    lines = [ln for ln in stdout.decode().splitlines() if ln.strip()]
    assert lines, "bench printed no output"
    out = json.loads(lines[-1])
    assert out["unit"] == "fps"
    assert "value" in out and "vs_baseline" in out
    return out


def test_sigterm_during_preflight(tmp_path):
    """The round-3 failure mode exactly: killed while waiting for the
    relay -> an honest zero line, not silence."""
    proc, err = _launch(tmp_path, INFUR_BENCH_TEST_STALL="preflight")
    _wait_for_marker(err, "TEST STALL at preflight", 30)
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=30)
    out = _json_line(stdout)
    assert out["value"] == 0.0
    assert proc.returncode == 0


def test_sigterm_during_warmup(tmp_path):
    """Killed after jax import / before any round completes."""
    proc, err = _launch(tmp_path, INFUR_BENCH_TEST_STALL="warmup")
    _wait_for_marker(err, "TEST STALL at warmup", 120)
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=30)
    out = _json_line(stdout)
    assert out["value"] == 0.0
    assert proc.returncode == 0


def test_deadline_emits_without_any_signal(tmp_path):
    """The wall-clock deadline guarantees a line even if the driver's
    SIGTERM never arrives (or the main thread is wedged in C)."""
    proc, _ = _launch(tmp_path, INFUR_BENCH_TEST_STALL="preflight",
                      INFUR_BENCH_DEADLINE_S="4")
    stdout, _ = proc.communicate(timeout=60)
    out = _json_line(stdout)
    assert out["value"] == 0.0
    assert proc.returncode == 0


def test_watchdog_emits_on_silent_stall(tmp_path):
    """No progress for a full window -> best-so-far line, exit 0."""
    proc, _ = _launch(tmp_path, INFUR_BENCH_TEST_STALL="warmup",
                      INFUR_BENCH_WATCHDOG_S="2",
                      INFUR_BENCH_WARMUP_WATCHDOG_S="2")
    stdout, _ = proc.communicate(timeout=180)
    out = _json_line(stdout)
    assert out["value"] == 0.0
    assert proc.returncode == 0


def test_watchdog_defers_during_warmup(tmp_path):
    """A slow warmup (cold compile) must NOT trip the normal watchdog
    window: with the warmup budget left at its large default, the
    deadline — not the watchdog — ends a warmup stall.  Guards the
    premature-zero mode measured on hardware (healthy relay, cold
    compilation cache, zero at watchdog_s + preflight)."""
    # deadline must outlast jax import + preflight on a LOADED 1-core
    # host (measured >25 s under a concurrent suite) or the emission
    # happens before warmup is ever reached and the test can't assert
    # the stall marker below
    proc, err = _launch(tmp_path, INFUR_BENCH_TEST_STALL="warmup",
                        INFUR_BENCH_WATCHDOG_S="1",
                        INFUR_BENCH_DEADLINE_S="60")
    stdout, _ = proc.communicate(timeout=240)
    out = _json_line(stdout)
    assert out["value"] == 0.0
    assert proc.returncode == 0
    stderr = err.read_text(errors="replace")
    # the warmup stall must actually have been REACHED — with a too-small
    # deadline the emission can happen during preflight/jax import and the
    # watchdog-silence assertion below would hold vacuously
    assert "TEST STALL at warmup" in stderr
    # the watchdog stayed silent through >= 10 one-second windows of
    # warmup stall; the deadline did the emitting
    assert "watchdog fired" not in stderr


def test_preflight_bounded_by_deadline(tmp_path):
    """A huge INFUR_BENCH_PREFLIGHT_S can no longer outlast the driver:
    the deadline caps it (round 3's exact loss mode)."""
    proc, _ = _launch(tmp_path, INFUR_BENCH_TEST_STALL="preflight",
                      INFUR_BENCH_PREFLIGHT_S="100000",
                      INFUR_BENCH_DEADLINE_S="4")
    t0 = time.monotonic()
    stdout, _ = proc.communicate(timeout=60)
    assert time.monotonic() - t0 < 45
    assert _json_line(stdout)["value"] == 0.0


@pytest.mark.slow
def test_clean_tiny_run_carries_proof_fields(tmp_path):
    """A full tiny CPU run: fps headline plus the round-4 proof fields
    (fidelity crc+agreement, time decomposition, interactive latency),
    and the side file mirrors the final line."""
    proc, _ = _launch(
        tmp_path,
        INFUR_BENCH_FIDELITY="1", INFUR_BENCH_MFU="1",
        INFUR_BENCH_INTERACTIVE="1", INFUR_BENCH_INTERACTIVE_FRAMES="4",
        INFUR_BENCH_DEADLINE_S="0")
    stdout, _ = proc.communicate(timeout=900)
    out = _json_line(stdout)
    assert proc.returncode == 0
    assert out["value"] > 0
    assert len(out["rounds_fps"]) == 1
    # fidelity (VERDICT r3 #4): recomputed in-run on the exact bench path
    assert len(out["mask_crc32"]) == 8
    assert 0.0 <= out["mask_agreement_bf16_vs_f32"] <= 1.0
    # decomposition (VERDICT r3 #3)
    assert out["device_ms_per_frame"] > 0
    assert out["host_ms_per_frame"] > 0
    assert "transport_ms_per_frame" in out
    assert out["device_kind"]  # cpu here, TPU kind on hardware
    # interactive mode (VERDICT r3 #6)
    assert out["frame_latency_interactive_p50_ms"] > 0
    assert out["frame_latency_interactive_p99_ms"] >= \
        out["frame_latency_interactive_p50_ms"]
    assert out["interactive_fps"] > 0
    # side file mirrors the emitted line
    side = json.loads((tmp_path / "partial.json").read_text())
    assert side == out


def test_side_file_written_after_rounds(tmp_path):
    """SIGKILL leaves no handler a chance — but the side file written
    after warmup/rounds still holds the best-so-far line."""
    proc, err = _launch(tmp_path, INFUR_BENCH_TEST_STALL="post")
    _wait_for_marker(err, "TEST STALL at post", 600)
    side = json.loads((tmp_path / "partial.json").read_text())
    assert side["value"] > 0  # one round completed before the stall
    proc.kill()
    proc.communicate(timeout=30)
