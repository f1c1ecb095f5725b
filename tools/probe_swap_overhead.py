"""Does alternating executables make the constant-heavy int8 program pay?

probe_exec_overhead (2026-08-19) showed int8 and bf16 cost the SAME
back-to-back (+1.44 ms/exec) — the ~38 ms/batch e2e penalty is not the
program run in isolation.  The bench loop, however, interleaves other
executables between step dispatches (keyed-delta decode, small u8
builders, CRC/interactive steps).  If the relay/far side evicts and
reloads program state when executables alternate, the 25 MB-of-constants
int8 program would pay per swap while bf16 (params passed as arguments,
207 small constants) would not.

Pattern per K: [step(x); tiny(i)] x K, one final fetch.  Compare the
K-slope against the no-interleave slope from probe_exec_overhead.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/probe_swap_overhead.py
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
KS = (1, 10)
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
    params = jax.device_put(init_fcn_resnet50(jax.random.PRNGKey(0)))
    x = jax.device_put(
        np.random.default_rng(0).random((B, H, W, 3), np.float32))

    tiny = jax.jit(lambda i: jnp.full((8,), i, jnp.uint8))
    float(np.asarray(tiny(1))[0])

    def int8_out(v):
        return jnp.sum(qe.fn(qe.params, {"input": v})["out"].astype(jnp.float32))

    def bf16_out(v):
        return jnp.sum(_fcn_forward(params, v, "bfloat16")["out"]
                       .astype(jnp.float32))

    rows = []
    for name, fwd in (("int8", int8_out), ("bf16", bf16_out)):
        sep = jax.jit(fwd)
        float(sep(x))  # warm

        def t_pattern(k: int, interleave: bool) -> float:
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                y = None
                for i in range(k):
                    y = sep(x)
                    if interleave:
                        np.asarray(tiny(i))  # tiny exec + fetch
                float(y)
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = KS
        rows.append({
            "program": name, "batch": B,
            "slope_plain_ms": round(
                (t_pattern(hi, False) - t_pattern(lo, False))
                / (hi - lo) * 1e3, 2),
            "slope_interleaved_ms": round(
                (t_pattern(hi, True) - t_pattern(lo, True))
                / (hi - lo) * 1e3, 2),
        })
        rows[-1]["swap_cost_ms"] = round(
            rows[-1]["slope_interleaved_ms"] - rows[-1]["slope_plain_ms"], 2)
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"int8_minus_bf16_swap_ms": round(
        rows[0]["swap_cost_ms"] - rows[1]["swap_cost_ms"], 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
