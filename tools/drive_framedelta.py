"""Hardware check: dirty-chunk ingest rebuilds byte-identical frames.

Encodes one real bench batch (fixture decode + host scale) with
ops/framedelta.encode_delta, rebuilds it ON THE TPU with decode_delta,
fetches the result and byte-compares against the host frames — the
lossless claim behind INFUR_BENCH_INGEST=delta, verified on the real
chip.  Also prints the measured wire bytes vs dense.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 590 python tools/drive_framedelta.py
"""
import os
import threading

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
killer = threading.Timer(560.0, lambda: os._exit(3))
killer.daemon = True
killer.start()

import numpy as np  # noqa: E402

import bench  # noqa: E402  (repo root on path)
import jax  # noqa: E402

from infur_tpu.ops.framedelta import (  # noqa: E402
    decode_delta, decode_keyed_wire, encode_delta, encode_keyed,
    pack_keyed_wire,
)
from infur_tpu.ops.preprocess import scale_to_hw  # noqa: E402
from infur_tpu.ops.yuv import scale_i420  # noqa: E402
from infur_tpu.video.rvf import RvfReader  # noqa: E402

H, W, B = bench.H, bench.W, 8
oh, ow = scale_to_hw(bench.SCALE, H, W)
rdr = RvfReader(bench._fixture_path())
buf = rdr.empty_image()
frames = []
for _ in range(B):
    rdr.read_frame_into(buf)
    frames.append(scale_i420(buf, H, W, oh, ow).copy())
rdr.close()
batch = np.stack(frames)

enc = encode_delta(batch, cap=bench.DELTA_CAP, chunk=bench.DELTA_CHUNK)
assert enc is not None, "fixture exceeded the delta cap"
base, idx, data = enc
per_frame = [int((batch[j].reshape(-1, 64) != batch[j - 1].reshape(-1, 64))
                 .any(axis=1).sum()) for j in range(1, B)]
print(f"dirty 64B chunks/frame: {per_frame} (cap {bench.DELTA_CAP})")
wire = sum(a.nbytes for a in enc)
print(f"wire {wire} B/batch = {wire / B / 1e3:.1f} KB/frame "
      f"(dense {batch.nbytes // B / 1e3:.1f})")

rebuilt = np.asarray(jax.jit(decode_delta)(
    *(jax.device_put(a) for a in enc)))
if (rebuilt == batch).all():
    print("TPU rebuild (delta): byte-identical OK")
else:
    bad = int((rebuilt != batch).sum())
    print(f"TPU rebuild (delta): MISMATCH on {bad} bytes")
    os._exit(1)

# keyed ingest: frame 0 itself coded against a device-resident key frame
# (the bench's INFUR_BENCH_INGEST=keyed default).  Key = a frame a few
# steps earlier in the same clip, the realistic steady-state case.
key = batch[0].copy()
kenc = encode_keyed(batch, key, bench.KEY_CAP, bench.DELTA_CAP,
                    bench.DELTA_CHUNK)
assert kenc is not None, "fixture exceeded KEY_CAP vs same-clip key"
kwire = pack_keyed_wire(*kenc)
print(f"keyed wire {kwire.nbytes} B/batch = "
      f"{kwire.nbytes / B / 1e3:.1f} KB/frame "
      f"(delta-era {wire / B / 1e3:.1f})")
krebuilt = np.asarray(jax.jit(
    lambda w, k: decode_keyed_wire(w, k, B - 1, bench.KEY_CAP,
                                   bench.DELTA_CAP, bench.DELTA_CHUNK)
)(jax.device_put(kwire), jax.device_put(key)))
if (krebuilt == batch).all():
    print("TPU rebuild (keyed): byte-identical OK")
else:
    bad = int((krebuilt != batch).sum())
    print(f"TPU rebuild (keyed): MISMATCH on {bad} bytes")
    os._exit(1)
os._exit(0)
