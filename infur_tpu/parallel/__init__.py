"""Multi-chip scaling: meshes, shardings, and the batched-stream config.

The reference is a single-process app whose only "parallelism" is a
3-thread pipeline with channel backpressure (SURVEY §2.8, §5.8).  The
TPU-native equivalents live here:

* :func:`make_mesh` — device mesh construction (data x model x spatial);
* :func:`shard_fcn_params` / :func:`shard_batch` — NamedShardings for the
  flagship model: batch over ``data`` (the multi-stream config), output
  channels of the widest convs over ``model`` (tensor parallelism), with
  XLA GSPMD inserting the all-gathers/psums over ICI;
* :func:`train_step` — a pjit-able training step (segmentation
  cross-entropy + SGD) used by the multi-chip dry-run; inference is the
  same sharding story minus the gradient;
* :mod:`pipeline` — GPipe-style pipeline parallelism over a ``pipe`` axis
  (shard_map + ppermute microbatch schedule, applied to the flagship's
  layer3);
* :mod:`moe` — Switch-style routed mixture-of-experts with expert
  parallelism over an ``expert`` axis (used by the segformer_moe family).

Together with the (data, model, spatial) mesh that covers the full
dp/tp/sp/pp/ep sharding set.
"""

from infur_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_fcn_params, shard_params, train_step,
)
from infur_tpu.parallel.pipeline import (  # noqa: F401
    fcn_pipeline_params, fcn_resnet50_apply_pp, pipeline_apply,
    shard_fcn_pp_params, stack_blocks,
)
from infur_tpu.parallel.moe import (  # noqa: F401
    init_moe_ffn, moe_capacity, moe_ffn_apply, shard_moe_params,
)
