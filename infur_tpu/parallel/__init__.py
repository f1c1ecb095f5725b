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
  same sharding story minus the gradient.
"""

from infur_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_fcn_params, train_step,
)
