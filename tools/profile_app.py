"""Where does an interactive `play` frame actually block? (round 5)

`infur_tpu play --wire rle` measured 1.3-1.7 fps ON CHIP with the model
stage's EMA at ~1 s/frame, while the bench's batch-1 interactive path
(same model, same wire codecs) runs 42-47 fps.  The stage EMAs only say
"model"; this tool cProfiles ProcessingApp.generate + the proc-loop
materialization over real frames on the TPU and prints the top blocking
calls by cumulative time, so the 30x gap gets a name.

Run OUTSIDE pytest (real TPU):
  PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/profile_app.py
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

import threading as _threading
_killer = _threading.Timer(850.0, lambda: __import__("os")._exit(3))
_killer.daemon = True
_killer.start()

CLIP = os.environ.get("INFUR_APP_CLIP",
                      "/tmp/infur_bench_1920x1080_16_i420.rvf")
N_WARM = 3
N_PROF = 10


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    from infur_tpu.app import ModelCmd, ProcessingApp, ScaleCmd
    from infur_tpu.processing import Play
    from infur_tpu.runtime.loop import _materialize

    pix = os.environ.get("INFUR_APP_PIX", "yuv420p")  # or bgr24
    app = ProcessingApp(wire="rle", planes={"composited"})
    app.control(ScaleCmd(0.5))
    app.control(Play((CLIP,), pix_fmt=pix))
    app.control(ModelCmd("fcn_resnet50"))
    print(f"pix_fmt={pix}", flush=True)

    def one_frame():
        f = app.generate()
        if f is not None:
            _materialize(f, app.planes)
        return f

    t0 = time.perf_counter()
    for i in range(N_WARM):  # compiles + key upload
        one_frame()
        print(f"warm {i}: cum {time.perf_counter() - t0:.1f}s", flush=True)

    per = []
    prof = cProfile.Profile()
    prof.enable()
    for i in range(N_PROF):
        t1 = time.perf_counter()
        one_frame()
        per.append((time.perf_counter() - t1) * 1e3)
    prof.disable()

    print(f"per-frame ms: {[round(m, 1) for m in per]}", flush=True)
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(32)
    # drop the header noise, keep the table
    for line in s.getvalue().splitlines():
        if line.strip():
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
