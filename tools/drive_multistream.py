"""Hardware drive: 4-stream batched serving aggregate throughput.

Four 1080p RVF streams tick in lockstep through ONE batched lraspp step
(the realtime family) on the real chip — the scale-out story SURVEY §5.8
maps to batching.  Reports aggregate frames/s over a few dozen ticks
(the D2H is each stream's composited RGBA, i.e. the interactive app's
dense display contract — no wire tricks, this measures the serving
composite path).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/drive_multistream.py
"""
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

app = MultiStreamApp(N)
for i in range(N):
    app.play(i, [fixture])
app.set_scale(0.5)
app.load_model("lraspp:bf16")

for _ in range(WARM):  # compile + first fetches
    out = app.tick()
    for f in out:
        np.asarray(f.rgba)

t0 = time.perf_counter()
n = 0
for _ in range(TICKS):
    out = app.tick()
    for f in out:
        np.asarray(f.rgba)  # materialize: the display contract
    n += len(out)
dt = time.perf_counter() - t0
print(f"{N} streams x {TICKS} ticks: {n} frames in {dt:.2f} s "
      f"= {n / dt:.2f} aggregate fps ({n / dt / N:.2f}/stream)")
app.close()
os._exit(0)
