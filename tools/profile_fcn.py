"""Per-stage device-time breakdown of the bf16 FCN forward (VERDICT r4 #6).

The bench headline reports one scalar (49.4% device MFU) with no account
of the other 50%.  jax.profiler device traces are not available through
the axon relay, so this tool decomposes the forward the same way the
bench isolates device time: K-forwards-per-execution `lax.scan` slope
timing (the ~0.6 s relay dispatch cost cancels between K points), applied
to CUMULATIVE PREFIXES of the network:

    stem -> +layer1 -> +layer2 -> +layer3 -> +layer4 -> +heads -> full

Per-stage time = slope delta between consecutive prefixes.  Each prefix is
also lowered WITHOUT the scan to read XLA's `cost_analysis` (flops, bytes
accessed); flops/bytes deltas give per-stage MFU and arithmetic intensity,
which names each sink as MXU-bound or HBM-bound:

    stage_mfu   = stage_flops / stage_time / PEAK_FLOPS
    stage_bw    = stage_bytes / stage_time  (vs ~819 GB/s v5e HBM)

Run OUTSIDE pytest (real TPU): `python tools/profile_fcn.py`
Shapes match the bench headline (batch 8, 540x960 model input).
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

B = int(os.environ.get("INFUR_PROFILE_BATCH", "8"))
H, W = 540, 960
K_SPAN = 4
PEAK_BF16_TFLOPS = 197.0   # v5e MXU bf16 peak (BENCH assumptions)
PEAK_HBM_GBPS = 819.0      # v5e HBM bandwidth


def _slope_ms(run, k_lo: int, k_hi: int, reps: int = 5) -> float:
    """min-of-reps: a single relay stall inflates one sample by seconds,
    which a 3-rep median cannot reject (negative slopes measured in a
    degraded window, round 5) — min is the stall-robust statistic."""
    def timed(k: int) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(k)))   # host read observes completion
            ts.append(time.perf_counter() - t0)
        return float(min(ts))
    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo) * 1e3


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import (
        _bn, _bottleneck, _conv, _fcn_forward, _head, _maxpool_3x3s2,
    )

    params = init_fcn_resnet50(jax.random.PRNGKey(0))

    def stem(p, x):
        x = x.astype(jnp.bfloat16)
        x = jax.nn.relu(_bn(_conv(x, p["stem_conv"].astype(x.dtype),
                                  stride=2), p["stem_bn"]))
        return _maxpool_3x3s2(x)

    stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))

    def through_layer(p, x, n_layers: int):
        x = stem(p, x)
        for si in range(n_layers):
            stride, dilation = stage_cfg[si]
            for bi, bp in enumerate(p[f"layer{si + 1}"]):
                d_first = (max(dilation // 2, 1)
                           if stride == 1 and dilation > 1 else 1)
                x = _bottleneck(x, bp, stride if bi == 0 else 1,
                                (d_first if bi == 0 else dilation))
        return x

    def heads_no_upsample(p, x):
        f = through_layer(p, x, 4)
        # layer3 features recomputed by XLA? no: layer4 consumes layer3's
        # output, XLA shares the subgraph — aux head reads the same tensor.
        f3 = through_layer(p, x, 3)
        return (_head(f, p["head"]).astype(jnp.float32),
                _head(f3, p["aux_head"]).astype(jnp.float32))

    def full(p, x):
        o = _fcn_forward(p, x, "bfloat16")
        return o["out"], o["aux"]

    prefixes = [
        ("stem", lambda p, x: stem(p, x)),
        ("layer1", lambda p, x: through_layer(p, x, 1)),
        ("layer2", lambda p, x: through_layer(p, x, 2)),
        ("layer3", lambda p, x: through_layer(p, x, 3)),
        ("layer4", lambda p, x: through_layer(p, x, 4)),
        ("heads", heads_no_upsample),
        ("full", full),
    ]

    x0 = np.random.default_rng(0).normal(size=(B, H, W, 3)).astype(np.float32)
    xd = jax.device_put(x0)
    pd = jax.device_put(params)

    def scan_forward(fwd):
        def run(p, x, k_arr):
            def body(acc, i):
                out = fwd(p, x + i.astype(jnp.float32) * 1e-6)
                leaves = out if isinstance(out, tuple) else (out,)
                s = sum(jnp.sum(o, dtype=jnp.float32) for o in leaves)
                return acc + s, None
            acc, _ = lax.scan(body, jnp.float32(0), k_arr)
            return acc
        return jax.jit(run)

    rows = []
    prev_ms = prev_gf = prev_gb = 0.0
    for name, fwd in prefixes:
        srun = scan_forward(fwd)
        def run(k, srun=srun):
            return srun(pd, xd, jnp.arange(k, dtype=jnp.int32))
        float(np.asarray(run(1)))
        float(np.asarray(run(1 + K_SPAN)))
        ms = _slope_ms(run, 1, 1 + K_SPAN)

        # flops/bytes of the plain (unscanned) prefix
        comp = jax.jit(fwd).lower(pd, xd).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gf = float(ca.get("flops", 0.0)) / 1e9
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9

        d_ms, d_gf, d_gb = ms - prev_ms, gf - prev_gf, gb - prev_gb
        prev_ms, prev_gf, prev_gb = ms, gf, gb
        sec = max(d_ms, 1e-6) / 1e3
        row = {
            "stage": name,
            "cum_ms_batch": round(ms, 2),
            "stage_ms_batch": round(d_ms, 2),
            "stage_ms_frame": round(d_ms / B, 3),
            "stage_gflops": round(d_gf, 1),
            "stage_gbytes": round(d_gb, 2),
            "stage_mfu_pct": round(
                d_gf / sec / 1e3 / PEAK_BF16_TFLOPS * 100, 1),
            "stage_hbm_pct": round(
                d_gb / sec / PEAK_HBM_GBPS * 100, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": f"fcn_bf16_stage_profile_{H}x{W}",
        "batch": B,
        "total_ms_frame": round(prev_ms / B, 3),
        "total_gflops_frame": round(prev_gf / B, 1),
        "stages": rows,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
