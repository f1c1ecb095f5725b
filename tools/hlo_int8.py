"""Static XLA-program comparison: int8 NHWC executor vs native bf16.

The prefix-timing profiler (tools/profile_qexec.py) needs a stable relay
window for ~20 minutes — this environment cannot provide one (two runs
produced negative segment deltas).  This tool answers the same question
("where does the int8 model's extra time go?") from the COMPILED
programs instead, which needs one cached compile each and no timing:

  * `cost_analysis()` totals: flops + bytes accessed for both programs.
    If the int8 program moves more HBM bytes than bf16 despite 1-byte
    activations, the delta IS the unfused glue.
  * optimized-HLO scan: every s32 tensor that appears as a fusion/conv
    OUTPUT (i.e. a materialized int32 accumulator that round-trips HBM
    instead of fusing into its requant epilogue), largest first, and
    the fusion count per opcode.

Run OUTSIDE pytest (real TPU): `python tools/hlo_int8.py`
Shapes match tools/microbench_int8.py (batch 4, 540x960).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

import numpy as np

import threading as _threading
_killer = _threading.Timer(1500.0, lambda: __import__("os")._exit(3))
_killer.daemon = True
_killer.start()

B = int(os.environ.get("INFUR_MB_BATCH", "4"))
H, W = 540, 960
FIXTURES = os.environ.get("INFUR_FIXTURES", "/tmp/infur_fixtures")

_SHAPE_RE = re.compile(r"(s32|s8|u8|bf16|f32)\[([\d,]*)\]")


def _nbytes(dt: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * {"s32": 4, "f32": 4, "bf16": 2, "s8": 1, "u8": 1}[dt]


def _analyze(name: str, compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    out = {"program": name,
           "gflops": round(float(ca.get("flops", 0.0)) / 1e9, 1),
           "gbytes": round(float(ca.get("bytes accessed", 0.0)) / 1e9, 3)}
    txt = compiled.as_text()
    ops = Counter()
    s32_out = []
    for line in txt.splitlines():
        ls = line.strip()
        # "root-ish" computation results: fusion/convolution/custom-call
        # lines whose RESULT type is s32 — materialized accumulators
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (s32\[[\d,]*\][^ ]*) "
                     r"(fusion|convolution|custom-call)", ls)
        if m:
            sm = _SHAPE_RE.match(m.group(1))
            if sm:
                s32_out.append((_nbytes(*sm.groups()), ls[:110]))
        m2 = re.match(r"(?:ROOT )?%?[\w.\-]+ = [^ ]+ (\w[\w\-]*)\(", ls)
        if m2:
            ops[m2.group(1)] += 1
    s32_out.sort(reverse=True)
    out["ops"] = dict(ops.most_common(8))
    out["s32_materialized"] = [
        {"mbytes": round(b / 1e6, 1), "hlo": h} for b, h in s32_out[:10]]
    out["s32_materialized_total_mb"] = round(
        sum(b for b, _ in s32_out) / 1e6, 1)
    return out


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp

    from infur_tpu import testgen
    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import _fcn_forward
    from infur_tpu.onnx.qexec import compile_qexec

    paths = testgen.generate(FIXTURES, verbose=False)
    qe = compile_qexec(paths["fcn_resnet50_int8_onnx"], input_layout="NHWC")
    params = init_fcn_resnet50(jax.random.PRNGKey(0))

    x_nhwc = np.zeros((B, H, W, 3), np.float32)

    def int8_fwd(x):
        return jnp.sum(qe.fn(qe.params, {"input": x})["out"].astype(jnp.float32))

    def bf16_fwd(p, x):
        return jnp.sum(_fcn_forward(p, x, "bfloat16")["out"]
                       .astype(jnp.float32))

    rows = [
        _analyze("int8_nhwc", jax.jit(int8_fwd).lower(x_nhwc).compile()),
        _analyze("bf16_native",
                 jax.jit(bf16_fwd).lower(params, x_nhwc).compile()),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
