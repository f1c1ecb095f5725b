"""Hardware parity + device-compute comparison for the fused Pallas
attention kernel (ops/pallas_attention.py) vs the XLA einsum path, on the
full SegFormer-B0 forward at the bench resolution.

Same K-slope method as microbench_models.py (fixed relay dispatch cost
cancels).  Run OUTSIDE pytest (real TPU):

    PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 590 python tools/microbench_attention.py
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

B = 4
H, W = 540, 960
K_SPAN = 6


def _slope_ms(run, k_lo: int, k_hi: int, reps: int = 3) -> float:
    def timed(k: int) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
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

    from infur_tpu.models.segformer import init_segformer, segformer_apply

    params = init_segformer(jax.random.PRNGKey(0), variant="b0")
    rng = np.random.default_rng(0)

    # --- parity: f32 flash vs einsum on hardware (small input) ---
    xs = rng.normal(size=(1, 96, 128, 3)).astype(np.float32)
    ref = np.asarray(segformer_apply(params, xs)["out"])
    got = np.asarray(segformer_apply(params, xs, attn_impl="flash")["out"])
    err = float(np.abs(got - ref).max())
    print(f"hardware f32 parity max|diff|: {err:.3e}", flush=True)
    assert err < 1e-3, "flash attention diverges from einsum on hardware"
    gotp = np.asarray(
        segformer_apply(params, xs, attn_impl="flash_packed")["out"])
    errp = float(np.abs(gotp - ref).max())
    print(f"hardware f32 parity (packed) max|diff|: {errp:.3e}", flush=True)
    assert errp < 1e-3, "packed flash diverges from einsum on hardware"

    # --- device compute, bf16: bench res (B=4) and full-1080p (B=1) ---
    results = {"parity_max_abs_diff_f32": err}
    for tag, b, h, w in (("540x960", B, H, W), ("1080x1920", 1, 1080, 1920)):
        _bench_res(results, tag, b, h, w, params, rng)
    _memory_demo(results, rng)
    print(json.dumps({"metric": "segformer_b0_attention_bf16",
                      **results}), flush=True)
    return 0


def _memory_demo(results, rng):
    """The kernel's raison d'etre: stage-1-at-4K attention, where the
    einsum path's (L, L2) score matrix alone is ~16.8 GB f32 (OOM on a
    16 GB v5e) while the fused kernel never materializes it."""
    import jax.numpy as jnp

    from infur_tpu.ops.pallas_attention import flash_attention

    l, l2, dh = 540 * 960, 68 * 120, 32   # b0 stage 1 at 2160x3840 input
    q = jnp.asarray(rng.normal(size=(1, 1, l, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 1, l2, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 1, l2, dh)), jnp.bfloat16)
    t0 = time.perf_counter()
    out = flash_attention(q, k, v, scale=float(1.0 / np.sqrt(dh)))
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    scores_gb = l * l2 * 4 / 1e9
    print(f"4K stage-1 attention via flash: ok ({dt:.1f}s incl. compile, "
          f"sum={s:.1f}); einsum would materialize {scores_gb:.1f} GB of "
          "f32 scores", flush=True)
    results["flash_4k_scores_avoided_gb"] = round(scores_gb, 1)


def _bench_res(results, tag, b, h, w, params, rng):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infur_tpu.models.segformer import segformer_apply

    x0 = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    for impl in ("einsum", "flash", "flash_packed"):
        def run_k(p, x, k_arr, impl=impl):
            def body(acc, i):
                out = segformer_apply(p, x + i.astype(jnp.float32) * 1e-6,
                                      compute_dtype="bfloat16",
                                      attn_impl=impl)["out"]
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
        results[f"{impl}_{tag}"] = {
            "ms_per_frame": round(ms_batch / b, 3),
            "device_fps": round(b / (ms_batch / 1e3), 1),
            "batch": b,
        }
        print(f"{impl} {tag}: {results[f'{impl}_{tag}']}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
