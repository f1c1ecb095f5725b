"""Segment-level device-time breakdown of the NHWC int8 executor
(VERDICT r4 #6 companion to tools/profile_fcn.py).

Times CUMULATIVE PREFIXES of the compiled step list (K-slope method, the
relay's fixed dispatch cost cancels) at segment boundaries spread through
the graph, so the remaining int8-vs-bf16 gap can be attributed to real
graph regions (entry quantize, backbone conv blocks, heads, the f32
dequant + Resize tail) rather than guessed.

Run OUTSIDE pytest (real TPU): `python tools/profile_qexec.py`
Shapes match tools/microbench_int8.py (batch 4, 540x960).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

import numpy as np

import threading as _threading
_killer = _threading.Timer(1700.0, lambda: __import__("os")._exit(3))
_killer.daemon = True
_killer.start()

B = 4
H, W = 540, 960
K_SPAN = 4
N_SEGMENTS = 8
FIXTURES = os.environ.get("INFUR_FIXTURES", "/tmp/infur_fixtures")


def _slope_ms(run, k_lo: int, k_hi: int, reps: int = 5) -> float:
    """min-of-reps slope: a single relay stall inflates a sample by
    SECONDS (D2 round-5 measured negative slopes off a 3-rep median in a
    degraded window) — the minimum is the only stall-robust statistic,
    and the K-slope still cancels the fixed dispatch cost because the
    best-case roundtrip is the same at both K points."""
    def timed(k: int) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(k)))
            ts.append(time.perf_counter() - t0)
        return float(min(ts))
    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo) * 1e3


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infur_tpu import testgen
    from infur_tpu.onnx import qexec as Q

    paths = testgen.generate(FIXTURES, verbose=False)
    qe = Q.compile_qexec(paths["fcn_resnet50_int8_onnx"])

    # segment boundaries: after every len/N_SEGMENTS-th *device* step,
    # always ending at the full graph
    steps = qe.graph.node
    n = len(steps)
    cuts = sorted({round(n * (i + 1) / N_SEGMENTS) for i in range(N_SEGMENTS)})
    x0 = np.random.default_rng(0).normal(
        size=(B, 3, H, W)).astype(np.float32)
    xd = jax.device_put(x0)

    # Prefix executors are built by truncating the GRAPH and re-compiling:
    # the live frontier (tensors produced but not consumed inside the
    # prefix) becomes the output set, so the reduction covers every value
    # XLA must actually materialize (nothing gets DCE'd or sliced).
    from infur_tpu.onnx.proto import (
        GraphProto, ModelProto, make_value_info,
    )

    results = []
    prev_ms = 0.0
    for ci, cut in enumerate(cuts):
        sub_nodes = list(steps[:cut])
        produced = {o for nd in sub_nodes for o in nd.output if o}
        consumed = {i for nd in sub_nodes for i in nd.input if i}
        live = [o for o in produced if o not in consumed]
        g = GraphProto(name=f"prefix{cut}")
        g.node.extend(sub_nodes)
        g.initializer.extend(qe.graph.initializer)
        g.input.extend(qe.graph.input)
        for o in live:
            g.output.append(make_value_info(o, 1, ()))
        model = ModelProto(graph=g)
        try:
            sub = Q.compile_qexec(model)
        except Q.QExecUnsupported as e:
            print(json.dumps({"cut": cut, "error": str(e)}), flush=True)
            continue

        def fwd(x, sub=sub):
            out = sub.fn(sub.params, {"input": x})
            leaves = [v for v in out.values()
                      if not isinstance(v, (np.ndarray, np.generic))]
            return sum(jnp.sum(v.astype(jnp.float32),
                               dtype=jnp.float32) for v in leaves)

        def scan_run(k, fwd=fwd):
            def body(acc, i):
                return acc + fwd(xd + i.astype(jnp.float32) * 1e-6), None
            def run(x, k_arr):
                acc, _ = lax.scan(body, jnp.float32(0), k_arr)
                return acc
            return jax.jit(run)(xd, jnp.arange(k, dtype=jnp.int32))

        float(np.asarray(scan_run(1)))
        float(np.asarray(scan_run(1 + K_SPAN)))
        ms = _slope_ms(scan_run, 1, 1 + K_SPAN)
        if ms < prev_ms:  # non-monotonic cumulative prefix = window noise
            ms2 = _slope_ms(scan_run, 1, 1 + K_SPAN)
            ms = max(ms, ms2)
        seg_ops = Counter(nd.op_type for nd in
                          steps[0 if ci == 0 else cuts[ci - 1]:cut])
        row = {"cut": cut, "cum_ms_batch": round(ms, 2),
               "seg_ms_frame": round((ms - prev_ms) / B, 3),
               "seg_ops": dict(seg_ops.most_common(5))}
        prev_ms = ms
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"metric": f"qexec_int8_segment_profile_{H}x{W}",
                      "batch": B, "segments": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
