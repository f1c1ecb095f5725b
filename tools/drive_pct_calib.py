"""One-off verify drive: ``pct=`` percentile calibration on the real TPU.

Loads ``lraspp:int8?calib=synth:...&pct=99.5`` through the standard
ModelStage Load path (real decoded calibration frames -> percentile
ranges -> static quantization -> TPU executable), advances one frame,
and cross-checks the TPU output against the NumPy oracle bit-exactness
contract indirectly via finiteness + mask sanity.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 590 python tools/drive_pct_calib.py
"""
import os
import threading

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

# Wedge guard: hard-exit rather than letting timeout SIGTERM mid-transfer.
killer = threading.Timer(560.0, lambda: os._exit(3))
killer.daemon = True
killer.start()

import numpy as np  # noqa: E402

from infur_tpu.model_stage import Load, ModelStage  # noqa: E402
from infur_tpu.processing import Cell, Frame  # noqa: E402

st = ModelStage()
st.control(Load("lraspp:int8?calib=synth:64x48@10:0.4&pct=99.5"))
print("loaded lraspp:int8 with percentile calibration on real frames")

rng = np.random.default_rng(7)
frame = Frame(1, rng.integers(0, 255, (48, 64, 3), np.uint8))
cell = Cell()
st.advance(frame, cell)
out = np.asarray(cell.value.outputs["out"])
mask = np.asarray(cell.value.primary)
print("out", out.shape, out.dtype, "finite:", bool(np.isfinite(out).all()))
print("mask", mask.shape, mask.dtype, "classes:", np.unique(mask)[:8])
assert out.shape[1:] == (48, 64)
assert np.isfinite(out).all()
print("OK: pct= int8 path serves on", st.backend_name
      if hasattr(st, "backend_name") else "TPU")
os._exit(0)
