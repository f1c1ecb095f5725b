"""Per-chip device-compute microbenchmark across the native model families.

Same K-slope method as microbench_int8.py (K forwards per execution via
lax.scan; the slope between K points cancels the relay's ~0.6 s fixed
dispatch cost).  Answers "what does each family cost on the chip at the
bench resolution?" — the transport-independent throughput table.

Run OUTSIDE pytest (real TPU):
    PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 590 python tools/microbench_models.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = 4
H, W = 540, 960
K_SPAN = 6


def _slope_ms(run, k_lo: int, k_hi: int, reps: int = 3) -> float:
    def timed(k: int) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(k)))  # host read observes completion
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infur_tpu.models import (
        deeplabv3_apply, fcn_resnet50_apply, init_deeplabv3_resnet50,
        init_fcn_resnet50, init_lraspp_mobilenet_v3_large, init_segformer,
        lraspp_apply, segformer_apply,
    )

    fams = {
        "fcn_resnet50": (init_fcn_resnet50(jax.random.PRNGKey(0)),
                         fcn_resnet50_apply),
        "deeplabv3": (init_deeplabv3_resnet50(jax.random.PRNGKey(0)),
                      deeplabv3_apply),
        "segformer_b0": (init_segformer(jax.random.PRNGKey(0), variant="b0"),
                         segformer_apply),
        "lraspp_mnv3": (init_lraspp_mobilenet_v3_large(jax.random.PRNGKey(0)),
                        lraspp_apply),
    }
    x0 = np.random.default_rng(0).normal(size=(B, H, W, 3)).astype(np.float32)

    results = {}
    for name, (params, apply_fn) in fams.items():
        def run_k(p, x, k_arr, apply_fn=apply_fn):
            def body(acc, i):
                out = apply_fn(p, x + i.astype(jnp.float32) * 1e-6,
                               compute_dtype="bfloat16")["out"]
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.float32(0), k_arr)
            return acc
        jitted = jax.jit(run_k)
        pd, xd = jax.device_put(params), jax.device_put(x0)

        def run(k):
            return jitted(pd, xd, jnp.arange(k, dtype=jnp.int32))
        float(np.asarray(run(1)))
        float(np.asarray(run(1 + K_SPAN)))
        ms_batch = _slope_ms(run, 1, 1 + K_SPAN)
        results[name] = {
            "ms_per_frame": round(ms_batch / B, 3),
            "device_fps": round(B / (ms_batch / 1e3), 1),
        }
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({"metric": "family_device_compute_540x960_bf16",
                      "batch": B, **results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
