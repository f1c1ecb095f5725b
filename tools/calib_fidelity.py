"""int8 calibration-estimator fidelity A/B: minmax vs percentile vs entropy.

For each family, quantizes with each range estimator on REAL decoded
frames (the standard ``family:int8?calib=<src>&...`` Load path), then
scores held-out frames against the family's f32 forward: mask agreement
(argmax equality) and logit MAE.  The transformer (segformer) is the
interesting case — LayerNorm/attention activation tails are what
percentile/entropy clipping exists for (VERDICT r3 #8); lraspp covers
the CNN case.

Pure CPU (importer + oracle are platform-exact for int8 by construction;
TPU bit-exactness is pinned separately by tools/parity_check.py), so this
runs in wedge windows.  Prints a markdown table for BENCH_NOTES.md.

Run: JAX_PLATFORMS handled in-script; timeout 1200 python tools/calib_fidelity.py
"""
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np  # noqa: E402

from infur_tpu.model_stage import Load, ModelStage  # noqa: E402
from infur_tpu.processing import Cell, Frame  # noqa: E402

CAL_SRC = "synth:64x48@10:0.8"  # calibration frames (decoded, real content)
HOLD_N = 4                      # held-out eval frames
HW = (48, 64)

ESTIMATORS = [("minmax", ""), ("pct=99.9", "&pct=99.9"),
              ("entropy", "&cal=entropy")]
FAMILIES = ["lraspp", "segformer"]


def eval_frames():
    """Held-out frames: synth content the calibration clip did not cover
    (later timestamps), decoded through the same testsrc generator."""
    from infur_tpu.video.testsrc import SynthSpec, testsrc_frame
    spec = SynthSpec(width=HW[1], height=HW[0], fps=10.0, count=32)
    out = []
    buf = np.empty((*HW, 3), np.uint8)
    for i in range(20, 20 + HOLD_N):  # past the 8 calib frames
        testsrc_frame(spec, i, buf)
        out.append(buf.copy())
    return out


def forward(spec: str, frames) -> list[np.ndarray]:
    st = ModelStage()
    st.control(Load(spec))
    outs = []
    for i, f in enumerate(frames):
        cell = Cell()
        st.advance(Frame(i + 1, f), cell)
        outs.append(np.asarray(cell.value.outputs["out"], np.float32))
    st.control(Load(""))
    return outs


def main() -> int:
    frames = eval_frames()
    print(f"| family | estimator | mask agreement vs f32 | logit MAE |")
    print(f"|---|---|---|---|")
    for fam in FAMILIES:
        ref = forward(fam, frames)
        for name, q in ESTIMATORS:
            t0 = time.time()
            got = forward(f"{fam}:int8?calib={CAL_SRC}{q}", frames)
            agree = float(np.mean([
                (r.argmax(axis=-3) == g.argmax(axis=-3)).mean()
                for r, g in zip(ref, got)]))
            mae = float(np.mean([np.abs(r - g).mean()
                                 for r, g in zip(ref, got)]))
            print(f"| {fam} | {name} | {agree:.4f} | {mae:.4f} |"
                  f"  <!-- {time.time() - t0:.0f}s -->", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
