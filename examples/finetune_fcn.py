"""Example: finetune FCN-ResNet50 on your own (image, mask) pairs.

Data: an iterable of (x, y) batches, x = (B, H, W, 3) float32 normalized
RGB, y = (B, H, W) int32 class labels with -1 for void pixels.
"""

import jax
import numpy as np

from infur_tpu.models import fcn_resnet50_apply, init_fcn_resnet50
from infur_tpu.train import finetune

rng = np.random.default_rng(0)


def batches():
    while True:
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        y = rng.integers(0, 21, size=(2, 64, 64)).astype(np.int32)
        yield x, y


params = init_fcn_resnet50(jax.random.PRNGKey(0))
params, losses = finetune(
    lambda p, x: fcn_resnet50_apply(p, x), params, batches(),
    steps=50, learning_rate=1e-4, checkpoint_path="fcn_finetuned.npz")
print("final loss:", losses[-1])
# reuse in the pipeline: --model fcn_resnet50@fcn_finetuned.npz
