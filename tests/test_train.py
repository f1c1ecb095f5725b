"""Finetuning loop: loss decreases on a learnable synthetic task."""

import jax
import numpy as np
import pytest

from infur_tpu.models import fcn_resnet50_apply, init_fcn_resnet50
from infur_tpu.train import finetune, segmentation_ce


@pytest.fixture(scope="module")
def tiny_task():
    """Color blobs -> class labels (left half class 1, right half class 2)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32) * 0.1
    x[:, :, :8, 0] += 2.0
    x[:, :, 8:, 1] += 2.0
    y = np.zeros((2, 16, 16), np.int32)
    y[:, :, :8] = 1
    y[:, :, 8:] = 2
    return x, y


def test_loss_decreases(tiny_task):
    x, y = tiny_task
    params = init_fcn_resnet50(jax.random.PRNGKey(0), num_classes=4, aux=False)
    first = float(segmentation_ce(
        lambda p, xx: fcn_resnet50_apply(p, xx), params, x, y))
    params, losses = finetune(
        lambda p, xx: fcn_resnet50_apply(p, xx), params,
        data=iter(lambda: (x, y), None), steps=8,
        learning_rate=1e-3, log_every=4)
    assert losses[-1] < first


def test_ignore_label(tiny_task):
    x, y = tiny_task
    y2 = y.copy()
    y2[:, :4] = -1  # void pixels must not contribute
    params = init_fcn_resnet50(jax.random.PRNGKey(0), num_classes=4, aux=False)
    fn = lambda p, xx: fcn_resnet50_apply(p, xx)
    l_all = float(segmentation_ce(fn, params, x, y))
    l_masked = float(segmentation_ce(fn, params, x, y2))
    assert np.isfinite(l_masked) and l_masked != l_all


def test_checkpoint_written(tiny_task, tmp_path):
    x, y = tiny_task
    params = init_fcn_resnet50(jax.random.PRNGKey(1), num_classes=4, aux=False)
    ck = str(tmp_path / "ft.npz")
    finetune(lambda p, xx: fcn_resnet50_apply(p, xx), params,
             data=iter(lambda: (x, y), None), steps=2,
             checkpoint_path=ck, log_every=1)
    from infur_tpu.runtime.checkpoint import load_params
    back = load_params(ck)
    assert back["stem_conv"].shape == (7, 7, 3, 64)
