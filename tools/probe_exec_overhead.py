"""Isolate per-EXECUTION overhead of the int8 vs bf16 step programs.

The batch-16 probe (2026-08-19) falsified the round-5 "fixed program
overhead" model: int8's non-device cost per frame GREW with batch size
(12.9 -> 15.8 ms/frame), so the ~5 ms/frame e2e penalty vs bf16 is not
a per-dispatch constant.  This probe discriminates the remaining
hypotheses in ONE relay window:

  slope_sep(K)  — wall time of K back-to-back *separate* executions of
                  the forward (scalar-reduced output, one final fetch):
                  per-execution cost INCLUDING device program setup +
                  relay enqueue + scheduling gaps.
  slope_scan(K) — the microbench_int8 pattern: ONE execution running the
                  forward K times under lax.scan: pure device compute.

  slope_sep - slope_scan = per-execution overhead.  If int8's is much
  larger than bf16's, the constant-heavy program (1012 HLO constants)
  pays per execute on the far side; if equal, the e2e delta lives in
  the bench loop's host path instead.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/probe_exec_overhead.py
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

_killer = threading.Timer(860.0, lambda: os._exit(3))
_killer.daemon = True
_killer.start()

B = int(os.environ.get("INFUR_MB_BATCH", "8"))
H, W = 540, 960
KS = (1, 4, 10)
REPS = 3
FIXTURES = os.environ.get("INFUR_FIXTURES", "/tmp/infur_fixtures")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from infur_tpu import testgen
    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import _fcn_forward
    from infur_tpu.onnx.qexec import compile_qexec

    paths = testgen.generate(FIXTURES, verbose=False)
    qe = compile_qexec(paths["fcn_resnet50_int8_onnx"], input_layout="NHWC")
    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    x = jax.device_put(np.random.default_rng(0).random(
        (B, H, W, 3), np.float32))

    def int8_out(v):
        return jnp.sum(qe.fn(qe.params, {"input": v})["out"].astype(jnp.float32))

    def bf16_out(v):
        return jnp.sum(_fcn_forward(params, v, "bfloat16")["out"]
                       .astype(jnp.float32))

    def scan_of(fwd):
        def run(v, k):
            def body(c, _):
                return c, fwd(v)
            _, ys = jax.lax.scan(body, 0, None, length=k)
            return jnp.sum(ys)
        return run

    rows = []
    for name, fwd in (("int8", int8_out), ("bf16", bf16_out)):
        sep = jax.jit(fwd)
        scans = {k: jax.jit(scan_of(fwd), static_argnums=1) for k in KS}
        # warm every executable (compile + first fetch)
        float(sep(x))
        for k in KS:
            float(scans[k](x, k))

        def t_sep(k: int) -> float:
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                y = None
                for _ in range(k):
                    y = sep(x)
                float(y)  # one fetch: forces the chain to completion
                best = min(best, time.perf_counter() - t0)
            return best

        def t_scan(k: int) -> float:
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(scans[k](x, k))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = KS[0], KS[-1]
        sep_lo, sep_hi = t_sep(lo), t_sep(hi)
        scan_lo, scan_hi = t_scan(lo), t_scan(hi)
        slope_sep = (sep_hi - sep_lo) / (hi - lo)
        slope_scan = (scan_hi - scan_lo) / (hi - lo)
        row = {
            "program": name, "batch": B,
            "slope_sep_ms": round(slope_sep * 1e3, 2),
            "slope_scan_ms": round(slope_scan * 1e3, 2),
            "per_exec_overhead_ms": round((slope_sep - slope_scan) * 1e3, 2),
            "per_frame_compute_ms": round(slope_scan * 1e3 / B, 3),
            "sep_lo_s": round(sep_lo, 3), "sep_hi_s": round(sep_hi, 3),
            "scan_lo_s": round(scan_lo, 3), "scan_hi_s": round(scan_hi, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    d = rows[0]["per_exec_overhead_ms"] - rows[1]["per_exec_overhead_ms"]
    print(json.dumps({"int8_minus_bf16_per_exec_ms": round(d, 2)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
