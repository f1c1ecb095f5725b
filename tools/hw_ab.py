"""Adaptive bench A/B sweep on the real chip (VERDICT r3 #2).

Runs bench.py as a subprocess per config (each child is self-protecting:
preflight, watchdog, wall-clock deadline — so this orchestrator never
wedges the relay and never hangs), parses the JSON line, and greedily
walks the knob space the round-3 analysis queued:

  FETCH 4 -> 1 -> 2   (fewer D2H roundtrips at the ~0.2 MB/frame payload)
  DEPTH  2 -> 3       (one more batch in flight)
  RLE_CAP 64 -> 48    (smaller mask payload; fixture rows measured <= 44)
  BATCH  8 -> 16      (halve the per-frame share of the fixed roundtrip)

Short rounds (2 x 96 frames) keep each probe ~2 min; the baseline config
re-runs LAST so relay drift over the sweep is visible in the log.  The
winner is printed with its full JSON line; bench.py defaults should then
be updated to match (the driver runs bench.py with no env).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 3000 python tools/hw_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.environ.get("INFUR_AB_LOG", "/tmp/hw_ab_results.jsonl")


def run_bench(tag: str, **knobs: object) -> dict | None:
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    # short probe: 2 rounds, no proof phases, bounded hard at 10 min
    env.update({"INFUR_BENCH_ROUNDS": "2", "INFUR_BENCH_FRAMES": "96",
                "INFUR_BENCH_FIDELITY": "0", "INFUR_BENCH_INTERACTIVE": "0",
                "INFUR_BENCH_MFU": "0", "INFUR_BENCH_DEADLINE_S": "570",
                "INFUR_BENCH_PREFLIGHT_S": "240",
                "INFUR_BENCH_SIDE": f"/tmp/ab_{tag}.json"})
    env.update({k: str(v) for k, v in knobs.items()})
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           capture_output=True, text=True, timeout=640,
                           cwd=ROOT, env=env)
    except subprocess.TimeoutExpired:
        print(f"[{tag}] TIMEOUT (orchestrator)", flush=True)
        return None
    line = None
    for ln in (r.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                line = json.loads(ln)
            except json.JSONDecodeError:
                pass
    dt = time.time() - t0
    if line is None:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        print(f"[{tag}] no JSON after {dt:.0f}s rc={r.returncode} "
              f"tail={tail}", flush=True)
        return None
    rec = {"tag": tag, "knobs": knobs, "wall_s": round(dt, 1), **line}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[{tag}] best={line.get('value')} med={line.get('median_fps')} "
          f"rounds={line.get('rounds_fps')} rt_ms={line.get('roundtrip_ms')} "
          f"({dt:.0f}s)", flush=True)
    return rec


def score(rec: dict | None) -> float:
    # median is the drift-robust comparator for short probes
    return rec.get("median_fps", 0.0) if rec else 0.0


def main() -> int:
    base: dict[str, object] = {}
    results: list[dict] = []

    def probe(tag: str, **kw):
        rec = run_bench(tag, **{**base, **kw})
        if rec:
            results.append(rec)
        return rec

    r0 = probe("base_f4d2")
    best = score(r0)

    # FETCH sweep
    for f in (1, 2):
        r = probe(f"fetch{f}", INFUR_BENCH_FETCH=f)
        if score(r) > best:
            best = score(r)
            base["INFUR_BENCH_FETCH"] = f

    # DEPTH 3
    r = probe("depth3", INFUR_BENCH_DEPTH=3)
    if score(r) > best:
        best = score(r)
        base["INFUR_BENCH_DEPTH"] = 3

    # RLE_CAP 48
    r = probe("cap48", INFUR_BENCH_RLE_CAP=48)
    if score(r) > best:
        best = score(r)
        base["INFUR_BENCH_RLE_CAP"] = 48

    # BATCH 16 (new shapes: first run pays compile; judge by a second run)
    probe("batch16_warm", INFUR_BENCH_BATCH=16)
    r = probe("batch16", INFUR_BENCH_BATCH=16)
    if score(r) > best:
        best = score(r)
        base["INFUR_BENCH_BATCH"] = 16
        # batch16 changes the roundtrip economics: re-check fetch 1 vs cur
        cur_f = base.get("INFUR_BENCH_FETCH", 4)
        for f in {1, 2, 4} - {cur_f}:
            r = probe(f"batch16_fetch{f}", INFUR_BENCH_FETCH=f)
            if score(r) > best:
                best = score(r)
                base["INFUR_BENCH_FETCH"] = f

    # drift check: re-run the ORIGINAL defaults at the end (no base merge)
    r = run_bench("base_again")
    if r:
        results.append(r)

    print("\n=== sweep done ===")
    for rec in sorted(results, key=score, reverse=True):
        print(f"  {rec['tag']:>16}: med {rec.get('median_fps')} "
              f"best {rec.get('value')} knobs={rec['knobs']}")
    print(f"WINNER knobs: {base or 'defaults'} (median {best})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
