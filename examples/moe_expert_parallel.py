"""Example: SegFormer-MoE with expert parallelism over an ``expert`` axis.

The two deepest encoder stages route tokens to experts (Switch top-1);
expert weights shard over the mesh so model capacity scales with chips.
Emulate multi-chip on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/moe_expert_parallel.py
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infur_tpu.models.segformer_moe import (
    init_segformer_moe, segformer_moe_apply, shard_segformer_moe_params,
)
from infur_tpu.train import finetune, moe_segmentation_loss

devs = jax.devices()
exp = 4 if len(devs) % 4 == 0 else 1
mesh = Mesh(np.asarray(devs).reshape(-1, exp), ("data", "expert"))
print("mesh:", dict(mesh.shape))

params = init_segformer_moe(jax.random.PRNGKey(0), variant="b0", n_experts=4)
params = jax.device_put(params, shard_segformer_moe_params(params, mesh))

rng = np.random.default_rng(0)
x = jax.device_put(rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
                   NamedSharding(mesh, P("data")))
out = segformer_moe_apply(params, x)
print("expert-parallel forward:", out["out"].shape)

# finetune with the Switch load-balancing aux loss (keeps routing spread)
def batches():
    while True:
        yield (rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
               rng.integers(0, 21, size=(2, 64, 64)).astype(np.int32))

params, losses = finetune(None, jax.device_get(params), batches(), steps=5,
                          learning_rate=5e-5, log_every=1,
                          loss_fn=moe_segmentation_loss)
print("losses:", [round(v, 2) for v in losses])
