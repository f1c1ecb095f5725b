"""Fidelity of the wire confidence-plane variants (INFUR_BENCH_CONF).

Drives the EXACT bench pipeline (fixture frames -> host scale -> device
i420 ingest -> bf16 FCN -> argmax/max) once, fetches the FULL-RES u8
confidence, then measures the host composite error of each wire variant
(q2 = 2x2-mean u8, q2n4 = 2x2-mean 4-bit, q4 = 4x4-mean u8) against the
full-res-conf composite — the number that decides whether a cheaper
alpha plane is visually defensible as the bench default.

The subsample/quantize math is integer block means (ops/maskcode.py), so
emulating the device encode on the fetched full-res conf is exact.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 590 python tools/conf_fidelity.py
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
import jax.numpy as jnp  # noqa: E402

from infur_tpu.models import init_fcn_resnet50  # noqa: E402
from infur_tpu.models.fcn_resnet50 import _fcn_forward  # noqa: E402
from infur_tpu.ops.colorcode import _DEFAULT_PALETTE  # noqa: E402
from infur_tpu.ops.maskcode import (  # noqa: E402
    conf_plane_decode, conf_plane_encode,
)
from infur_tpu.ops.pallas_preprocess import i420_to_normalized_pallas  # noqa: E402
from infur_tpu.ops.preprocess import scale_to_hw  # noqa: E402
from infur_tpu.ops.yuv import scale_i420  # noqa: E402
from infur_tpu.video.rvf import RvfReader  # noqa: E402

H, W, SCALE, B = bench.H, bench.W, bench.SCALE, 8
oh, ow = scale_to_hw(SCALE, H, W)
params = init_fcn_resnet50(jax.random.PRNGKey(0))


@jax.jit
def step(params, yuv):
    x = jax.vmap(lambda f: i420_to_normalized_pallas(
        f, oh, ow, compute_dtype="bfloat16"))(yuv)
    scores = _fcn_forward(params, x, "bfloat16")["out"]
    mask = jnp.argmax(scores, axis=1).astype(jnp.uint8)
    conf = jnp.clip(jnp.max(scores, axis=1) * 255.0, 0, 255).astype(jnp.uint8)
    # softmax confidence (the app's ColorCmd softmax live control): never
    # saturates, so it exposes the conf-plane variants' real error where
    # raw-logit conf may clip to a constant 255
    csm = (jax.nn.softmax(scores.astype(jnp.float32), axis=1).max(axis=1)
           * 255.0).astype(jnp.uint8)
    return mask, conf, csm


rdr = RvfReader(bench._fixture_path())
buf = rdr.empty_image()
frames = []
for _ in range(B):
    rdr.read_frame_into(buf)
    frames.append(scale_i420(buf, H, W, oh, ow))
rdr.close()
yuv = np.stack(frames)

mask, conf, conf_sm = (np.asarray(v) for v in step(params, jax.device_put(yuv)))
yplane = yuv[:, : oh * ow].reshape(B, oh, ow)
palette = np.asarray(_DEFAULT_PALETTE)
pal21 = palette[np.arange(32) % len(palette)].astype(np.uint8)


def composite(conf_hw: np.ndarray) -> np.ndarray:
    """bench.py's numpy composite (gray base, int floor semantics)."""
    if conf_hw.shape[-2:] != (oh, ow):
        conf_hw = conf_hw.repeat(oh // conf_hw.shape[-2], axis=1) \
                         .repeat(ow // conf_hw.shape[-1], axis=2)
    rgb = pal21[mask].astype(np.int32)
    a = conf_hw.astype(np.int32)[..., None]
    base = yplane[..., None].astype(np.int32)
    return (base + (rgb - base) * a // 255).astype(np.uint8)


for label, c in (("raw-logit", conf), ("softmax", conf_sm)):
    pct = [int(np.percentile(c, p)) for p in (1, 50, 99)]
    print(f"{label} conf u8: p1/p50/p99 = {pct}, "
          f"saturated(=255) {float((c == 255).mean()):.1%}")
    ref = composite(c).astype(np.int32)
    print(f"  composite error vs full-res ({B} frames @ {ow}x{oh}):")
    print(f"  {'variant':8} {'B/px':>7} {'mean|d|':>8} {'p99|d|':>7} {'max|d|':>7}")
    for name, sub, bits4 in (("q2", 2, False), ("q2n4", 2, True),
                             ("q4", 4, False)):
        plane = np.asarray(conf_plane_encode(jnp.asarray(c), sub, bits4))
        cq = conf_plane_decode(plane, oh // sub, ow // sub, bits4)
        d = np.abs(composite(cq).astype(np.int32) - ref)
        bpp = plane.shape[1] / (oh * ow)
        print(f"  {name:8} {bpp:7.4f} {d.mean():8.3f} "
              f"{np.percentile(d, 99):7.1f} {d.max():7d}")

os._exit(0)
