"""Hardware drive: batched multi-stream serving vs single-stream baseline.

Four 1080p RVF streams tick in lockstep through ONE batched lraspp step
(the realtime family) on the real chip — the scale-out story SURVEY §5.8
maps to batching.  Measures, in the SAME relay window so the numbers are
comparable:

  1. single-stream fps (batch-1 ticks, the interactive serving shape)
  2. N-stream aggregate fps and per-stream fps

and prints the batching speedup (aggregate / single-stream): the
data-parallel serving claim as a measurement (VERDICT r3 #5).  The D2H
is each stream's composited RGBA — the interactive app's dense display
contract, no wire tricks.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/drive_multistream.py
"""
import json
import os
import threading

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
killer = threading.Timer(840.0, lambda: os._exit(3))
killer.daemon = True
killer.start()

import time  # noqa: E402

import numpy as np  # noqa: E402

import bench  # noqa: E402  (repo root on path — fixture path helper)

from infur_tpu.multistream import MultiStreamApp  # noqa: E402

N, TICKS, WARM = 4, 24, 2
fixture = bench._fixture_path()


def measure(n_streams: int, ticks: int, fetch: bool) -> tuple[float, int]:
    """fetch=True materializes every composited RGBA to host (the dense
    display contract: ~8.3 MB/frame at 1080p over the relay link);
    fetch=False blocks on the device value only, isolating the
    decode+H2D+compute rate the batch actually achieves on-chip."""
    import jax
    app = MultiStreamApp(n_streams)
    for i in range(n_streams):
        app.play(i, [fixture])
    app.set_scale(0.5)
    app.load_model("lraspp:bf16")
    for _ in range(WARM):  # compile + first fetches
        for f in app.tick():
            np.asarray(f.rgba)
    t0 = time.perf_counter()
    n = 0
    for _ in range(ticks):
        for f in app.tick():
            if fetch:
                np.asarray(f.rgba)  # materialize: the display contract
            else:
                jax.block_until_ready(f.rgba)
        n += n_streams
    dt = time.perf_counter() - t0
    app.close()
    return n / dt, n


rows = {}
for fetch in (True, False):
    lane = "dense_d2h" if fetch else "device_rate"
    single_fps, n1 = measure(1, TICKS, fetch)
    print(f"[{lane}] 1 stream  x {TICKS} ticks: {n1} frames = "
          f"{single_fps:.2f} fps", flush=True)
    agg_fps, n4 = measure(N, TICKS, fetch)
    print(f"[{lane}] {N} streams x {TICKS} ticks: {n4} frames = "
          f"{agg_fps:.2f} aggregate fps ({agg_fps / N:.2f}/stream)",
          flush=True)
    rows[lane] = {
        "aggregate_fps": round(agg_fps, 2),
        "per_stream_fps": round(agg_fps / N, 2),
        "single_stream_fps": round(single_fps, 2),
        "batching_speedup": round(agg_fps / single_fps, 2),
    }
print(json.dumps({
    "metric": ("multistream_aggregate_fps_1080p_lraspp"
               if (bench.W, bench.H) == (1920, 1080) else
               f"multistream_aggregate_fps_{bench.W}x{bench.H}_lraspp"),
    "n_streams": N, **rows["dense_d2h"], **{
        f"{k}_device": v for k, v in rows["device_rate"].items()},
}), flush=True)
os._exit(0)
