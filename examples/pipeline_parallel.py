"""Example: GPipe pipeline parallelism over a ``pipe`` mesh axis.

FCN-ResNet50's layer3 interior (five identical 1024-channel bottlenecks)
is split across pipeline stages; microbatches flow stage-to-stage over ICI
via collective permutes.  On a single machine, emulate the mesh with
virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/pipeline_parallel.py
"""

import numpy as np

import jax
from jax.sharding import Mesh

from infur_tpu.models import fcn_resnet50_apply, init_fcn_resnet50
from infur_tpu.parallel import (
    fcn_pipeline_params, fcn_resnet50_apply_pp, shard_fcn_pp_params,
)

devs = jax.devices()
pipe = 4 if len(devs) % 4 == 0 else 1
mesh = Mesh(np.asarray(devs).reshape(-1, pipe), ("data", "pipe"))
print("mesh:", dict(mesh.shape))

params = init_fcn_resnet50(jax.random.PRNGKey(0))
# stack + place each stage's blocks on its own device
stage_params = fcn_pipeline_params(params, mesh.shape["pipe"])
stage_params = jax.device_put(stage_params,
                              shard_fcn_pp_params(stage_params, mesh))

x = np.random.default_rng(0).normal(size=(4, 64, 64, 3)).astype(np.float32)
out_pp = fcn_resnet50_apply_pp(params, x, mesh, n_micro=2,
                               stage_params=stage_params)
out_ref = fcn_resnet50_apply(params, x)
diff = np.abs(np.asarray(out_pp["out"]) - np.asarray(out_ref["out"])).max()
print("pipelined forward ok, |pp - plain| =", float(diff))
