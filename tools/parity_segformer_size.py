"""int8-SegFormer mask parity (TPU vs NumPy oracle) at one given size.

VERDICT r2 #3: the mixed-precision transformer's f32 LN/attention islands
feed requant boundaries, so mask agreement must be measured at the sizes
the app actually serves, not just the 48x48 pin.  The full four-model
tool (parity_check.py) sweeps the CNNs too; this one isolates the
transformer so the big-size runs (e.g. the bench's 540x960) stay
tractable for the NumPy oracle.

    PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 2400 python tools/parity_segformer_size.py --size 540x960
"""

import argparse
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="96x96")
    p.add_argument("--variant", default="b0")
    args = p.parse_args()
    h, w = (int(v) for v in args.size.split("x"))

    import jax

    from infur_tpu.models.segformer import init_segformer, segformer_to_onnx
    from infur_tpu.onnx import import_model, run_model
    from infur_tpu.onnx.quantize import quantize_static

    rng = np.random.default_rng(0)
    sp = init_segformer(jax.random.PRNGKey(4), variant=args.variant,
                        num_classes=21)
    calib = [{"input": rng.normal(size=(1, 3, h, w)).astype(np.float32) * 0.5}
             for _ in range(2)]
    t0 = time.perf_counter()
    model = quantize_static(segformer_to_onnx(sp, (h, w)), calib)
    t_q = time.perf_counter() - t0
    feed = {"input": rng.normal(size=(1, 3, h, w)).astype(np.float32)}
    t0 = time.perf_counter()
    want = run_model(model, feed)["out"]
    t_oracle = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = np.asarray(import_model(model)(feed)["out"])
    t_tpu = time.perf_counter() - t0
    gm, wm = got.argmax(1), want.argmax(1)
    agree = float((gm == wm).mean())
    mism = gm != wm
    gap = 0.0
    if mism.any():
        b, y, x = np.nonzero(mism)
        gap = float(np.abs(want[b, wm[b, y, x], y, x]
                           - want[b, gm[b, y, x], y, x]).max())
    out = {"model": f"segformer_{args.variant}_int8", "size": f"{h}x{w}",
           "mask_agreement": round(agree, 6),
           "mismatch_logit_gap": round(gap, 9),
           "pass": agree >= 0.995,
           "t_quantize_s": round(t_q, 1), "t_oracle_s": round(t_oracle, 1),
           "t_tpu_s": round(t_tpu, 1)}
    print(json.dumps(out), flush=True)
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
