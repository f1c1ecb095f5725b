"""Hardware check: TPU-side encode_runs == host decode roundtrip on real
bench masks (the scatter-with-drop encode runs on the actual chip).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 590 python tools/drive_maskcode.py
"""
import os
import threading

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
killer = threading.Timer(560.0, lambda: os._exit(3))
killer.daemon = True
killer.start()

import numpy as np  # noqa: E402

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infur_tpu.models import init_fcn_resnet50  # noqa: E402
from infur_tpu.models.fcn_resnet50 import _fcn_forward  # noqa: E402
from infur_tpu.ops.maskcode import decode_runs, encode_runs, overflowed  # noqa: E402
from infur_tpu.ops.pallas_preprocess import i420_to_normalized_pallas  # noqa: E402
from infur_tpu.ops.preprocess import scale_to_hw  # noqa: E402
from infur_tpu.ops.yuv import scale_i420  # noqa: E402
from infur_tpu.video.rvf import RvfReader  # noqa: E402

H, W, B, CAP = bench.H, bench.W, 8, 64
oh, ow = scale_to_hw(bench.SCALE, H, W)
params = init_fcn_resnet50(jax.random.PRNGKey(0))


@jax.jit
def step(params, yuv):
    x = jax.vmap(lambda f: i420_to_normalized_pallas(
        f, oh, ow, compute_dtype="bfloat16"))(yuv)
    scores = _fcn_forward(params, x, "bfloat16")["out"]
    mask = jnp.argmax(scores, axis=1).astype(jnp.uint8)
    counts, words = encode_runs(mask, CAP)
    return mask, counts, words


rdr = RvfReader(bench._fixture_path())
rbuf = rdr.empty_image()
frames = []
for _ in range(B):
    rdr.read_frame_into(rbuf)
    frames.append(scale_i420(rbuf, H, W, oh, ow))
rdr.close()
mask, counts, words = step(params, jax.device_put(np.stack(frames)))
mask, counts, words = np.asarray(mask), np.asarray(counts), np.asarray(words)
assert not overflowed(counts, CAP), counts.max()
dec = decode_runs(counts, words, ow)
eq = (dec == mask).mean()
print(f"TPU encode -> host decode: agreement {eq:.6f}, "
      f"max count {counts.max()}/{CAP}")
assert eq == 1.0
print("OK: maskcode bit-exact on hardware")
os._exit(0)
