"""Per-chip device-compute microbenchmark: int8 FCN (imported NCHW vs the
NHWC channels-last executor) vs native bf16.

Answers the STATUS question "does the int8 model beat bf16 native
per-chip?".  Round 4's verdict: the imported NCHW QLinear graph was 3x
SLOWER than bf16 (13.6 vs 4.5 ms/frame) — `int8_nhwc` is the round-5
serving path (onnx/qexec.py: channels-last s8, fused requant epilogue,
constant border corrections) whose target is <= bf16's ms/frame with
bit-exact oracle parity.

Method: the relay transport adds a fixed ~0.6 s per jitted execution
(BENCH_NOTES.md), which would drown single-digit-ms forwards.  So each
variant runs K forwards inside ONE execution via `lax.scan` (iteration-
dependent inputs so XLA cannot hoist the forward out of the loop), and the
per-forward compute time is the slope between K=1 and K=1+KSPAN runs.

Run OUTSIDE pytest (real TPU): `timeout 590 python tools/microbench_int8.py`
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Wedge guard: hard-exit before any external `timeout` could SIGTERM this
# process mid-transfer (that is what wedges the relay — BENCH_NOTES.md).
import threading as _threading
_killer = _threading.Timer(1700.0, lambda: __import__("os")._exit(3))
_killer.daemon = True
_killer.start()

# frames per forward (bench.py uses 8; 4 keeps int8 HBM modest).  Override
# with INFUR_MB_BATCH=8 to measure at the bench's batch shape — round 5's
# F1 run showed an int8 end-to-end batch cost the batch-4 device numbers
# don't explain, so batch scaling itself needs a row.
B = int(os.environ.get("INFUR_MB_BATCH", "4"))
H, W = 540, 960
K_SPAN = 6     # extra in-execution forwards between the two timed points
FIXTURES = os.environ.get("INFUR_FIXTURES", "/tmp/infur_fixtures")


def _slope_ms(run, k_lo: int, k_hi: int, reps: int = 3) -> float:
    """Median wall ms per extra in-execution forward between k_lo and k_hi."""
    def timed(k: int) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            # fetch the scalar: on the axon relay block_until_ready returns
            # at enqueue, only a host read observes completion
            float(np.asarray(run(k)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import _fcn_forward
    from infur_tpu.onnx import import_model
    from infur_tpu import testgen

    from infur_tpu.onnx.qexec import compile_qexec

    paths = testgen.generate(FIXTURES, verbose=True)
    model = import_model(paths["fcn_resnet50_int8_onnx"])
    qexec = compile_qexec(paths["fcn_resnet50_int8_onnx"])
    params_native = init_fcn_resnet50(jax.random.PRNGKey(0))

    x0 = np.random.default_rng(0).normal(size=(B, 3, H, W)).astype(np.float32)
    x0_nhwc = np.ascontiguousarray(x0.transpose(0, 2, 3, 1))

    def scan_forward(fwd):
        """K serialized forwards in one execution; input varies per step."""
        def run(params, x, k_arr):
            def body(acc, i):
                out = fwd(params, x + i.astype(jnp.float32) * 1e-6)
                # reduce over the FULL output: a single-element read would
                # let XLA slice the conv stack down to one receptive field
                return acc + jnp.sum(out, dtype=jnp.float32), None
            acc, _ = lax.scan(body, jnp.float32(0), k_arr)
            return acc
        return jax.jit(run)

    int8_run = scan_forward(
        lambda p, x: model.fn(p, {"input": x})["out"])
    int8_nhwc_run = scan_forward(
        lambda p, x: qexec.fn(qexec.params, {"input": x})["out"])
    bf16_run = scan_forward(
        lambda p, x: _fcn_forward(p, x, "bfloat16")["out"].astype(jnp.float32))

    results = {}
    for name, fn, p, xin in (
            ("int8_imported", int8_run, model.params, x0),
            ("int8_nhwc", int8_nhwc_run, {}, x0),
            ("bf16_native", bf16_run, params_native, x0_nhwc)):
        xd = jax.device_put(xin)
        pd = jax.device_put(p)
        def run(k, fn=fn, pd=pd, xd=xd):
            return fn(pd, xd, jnp.arange(k, dtype=jnp.int32))
        float(np.asarray(run(1)))           # compile K=1
        float(np.asarray(run(1 + K_SPAN)))  # compile K=1+K_SPAN
        ms_batch = _slope_ms(run, 1, 1 + K_SPAN)
        results[name] = {
            "ms_per_batch": round(ms_batch, 2),
            "ms_per_frame": round(ms_batch / B, 3),
            "device_fps": round(B / (ms_batch / 1e3), 1),
        }
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({"metric": "fcn_resnet50_device_compute_540x960",
                      "batch": B, **results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
