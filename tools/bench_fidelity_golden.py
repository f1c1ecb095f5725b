"""Golden-vs-TPU mask fidelity at the EXACT bench config (960x540 bf16).

Two halves so the expensive golden compute happens off-chip:

  --make-golden   (CPU) run the bench's exact preprocessing + f32
                  matmul-precision-highest forward on the warm batch
                  (first 8 fixture frames, i420 ingest included) and save
                  masks + logit stats to --golden.
  (default)       (TPU) run the same batch through the bench's bf16 path
                  AND its f32 path on the chip, then report
                  mask agreement (bf16-TPU vs f32-CPU golden),
                  mask agreement (f32-TPU vs f32-CPU: platform
                  exactness at bench res), and max logit deviation.

This pins VERDICT r3 #4 end-to-end: the fps headline's config measured
against an off-chip golden, not just TPU-vs-TPU.

Run:
  python tools/bench_fidelity_golden.py --make-golden        # CPU, slow ok
  PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 \
      python tools/bench_fidelity_golden.py                  # TPU
"""
import argparse
import json
import os
import sys
import threading

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DEFAULT = "/tmp/bench_fidelity_golden.npz"


def _warm_batch():
    """The bench's warm batch: first BATCH fixture frames, host-scaled."""
    import numpy as np

    import bench
    from infur_tpu.ops.yuv import scale_i420
    from infur_tpu.video.rvf import RvfReader

    rdr = RvfReader(bench._fixture_path())
    buf = rdr.empty_image()
    from infur_tpu.ops.preprocess import scale_to_hw
    oh, ow = scale_to_hw(bench.SCALE, bench.H, bench.W)
    out = np.empty((bench.BATCH, oh * ow * 3 // 2), np.uint8)
    for j in range(bench.BATCH):
        rdr.read_frame_into(buf)
        out[j] = scale_i420(buf, bench.H, bench.W, oh, ow)
    rdr.close()
    return out, oh, ow


def _forward(jax, sm, oh, ow, dtype: str):
    import jax.numpy as jnp

    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import _fcn_forward
    from infur_tpu.ops.pallas_preprocess import i420_to_normalized_pallas

    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    interpret = jax.default_backend() == "cpu"

    def fn(params, yuv):
        x = jax.vmap(lambda f: i420_to_normalized_pallas(
            f, oh, ow, compute_dtype=dtype, interpret=interpret))(yuv)
        if dtype == "float32":
            with jax.default_matmul_precision("highest"):
                scores = _fcn_forward(params, x, "float32")["out"]
        else:
            scores = _fcn_forward(params, x, dtype)["out"]
        return (jnp.argmax(scores, axis=1).astype(jnp.uint8),
                scores.astype(jnp.float32))
    import numpy as np
    mask, scores = jax.jit(fn)(params, sm)
    return np.asarray(mask), np.asarray(scores)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--make-golden", action="store_true")
    p.add_argument("--golden", default=GOLDEN_DEFAULT)
    args = p.parse_args()

    import numpy as np
    if args.make_golden:
        import jax
        jax.config.update("jax_platforms", "cpu")
        sm, oh, ow = _warm_batch()
        mask, scores = _forward(jax, sm, oh, ow, "float32")
        np.savez_compressed(args.golden, mask=mask,
                            score_mean=np.float32(scores.mean()),
                            score_std=np.float32(scores.std()),
                            scores_f0=scores[0])
        print(f"golden saved: {args.golden} mask {mask.shape} "
              f"classes {np.unique(mask).size}")
        return 0

    killer = threading.Timer(1100.0, lambda: os._exit(3))
    killer.daemon = True
    killer.start()
    g = np.load(args.golden)
    import jax
    sm, oh, ow = _warm_batch()
    mask_bf16, _ = _forward(jax, sm, oh, ow, "bfloat16")
    mask_f32, scores_f32 = _forward(jax, sm, oh, ow, "float32")
    gm = g["mask"]
    out = {
        "metric": "bench_mask_fidelity_960x540",
        "device": str(jax.devices()[0].device_kind),
        "mask_agreement_bf16tpu_vs_f32golden":
            round(float((mask_bf16 == gm).mean()), 5),
        "mask_agreement_f32tpu_vs_f32golden":
            round(float((mask_f32 == gm).mean()), 5),
        "max_logit_dev_f32tpu_vs_golden_frame0":
            float(np.abs(scores_f32[0] - g["scores_f0"]).max()),
    }
    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
