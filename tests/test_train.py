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


def test_finetune_segformer_moe_with_aux_loss(rng):
    """Routed families train through finetune with the Switch aux term;
    the router stays non-degenerate (>1 expert used after training)."""
    import jax
    from infur_tpu.models.segformer_moe import init_segformer_moe
    from infur_tpu.train import finetune, moe_segmentation_loss

    params = init_segformer_moe(jax.random.PRNGKey(0), num_classes=5,
                                variant="b0", n_experts=2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)

    def data():
        while True:
            yield x, y

    # transformer families at random init need a gentler lr than the CNN
    # default (dense segformer diverges identically at 1e-3) — 5e-5 is
    # stable; 16 same-batch steps overfit well below the starting loss
    new_params, losses = finetune(
        None, params, data(), steps=16, learning_rate=5e-5,
        log_every=1, loss_fn=moe_segmentation_loss)
    assert len(losses) == 16
    assert losses[-1] < losses[0]  # it optimizes
    w = np.asarray(new_params["stage3"]["blocks"][0]["moe"]["w1"])
    assert not np.allclose(w, np.asarray(params["stage3"]["blocks"][0]["moe"]["w1"]))


def test_segmentation_metrics_hand_case():
    """mIoU/accuracy against a hand-computed confusion matrix; void pixels
    ignored; absent classes excluded from the mean."""
    import jax.numpy as jnp
    from infur_tpu.train import segmentation_metrics

    # 1 image, 2x3, 3 classes. logits -> pred = [[0,0,1],[1,2,2]]
    pred = np.array([[0, 0, 1], [1, 2, 2]])
    logits = np.full((1, 3, 2, 3), -10.0, np.float32)
    for y in range(2):
        for x in range(3):
            logits[0, pred[y, x], y, x] = 10.0
    labels = np.array([[[0, 1, 1], [1, 2, -1]]], np.int32)  # one void
    m = segmentation_metrics(jnp.asarray(logits), jnp.asarray(labels))
    # valid pixels (void dropped): pred [0,0,1,1,2], label [0,1,1,1,2]
    # class0: tp1 fp1 fn0 -> iou 1/2 ; class1: tp2 fp0 fn1 -> 2/3 ; class2: 1/1
    assert abs(float(m["pixel_acc"]) - 4 / 5) < 1e-6
    np.testing.assert_allclose(np.asarray(m["iou"]), [0.5, 2 / 3, 1.0],
                               rtol=1e-6)
    assert abs(float(m["miou"]) - (0.5 + 2 / 3 + 1.0) / 3) < 1e-6


def test_evaluate_matches_jit_metrics(rng):
    """The streaming evaluate() agrees with the jitted per-batch metrics
    on a single batch, and runs a real family forward."""
    import jax
    from infur_tpu.models import init_lraspp_mobilenet_v3_large, lraspp_apply
    from infur_tpu.train import evaluate, segmentation_metrics

    params = init_lraspp_mobilenet_v3_large(jax.random.PRNGKey(0),
                                            num_classes=5)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.integers(-1, 5, size=(2, 32, 32)).astype(np.int32)
    out = evaluate(lambda p, xx: lraspp_apply(p, xx), params, [(x, y)],
                   num_classes=5)
    logits = lraspp_apply(params, x)["out"]
    m = segmentation_metrics(logits, y, num_classes=5)
    assert abs(out["pixel_acc"] - float(m["pixel_acc"])) < 1e-6
    assert abs(out["miou"] - float(m["miou"])) < 1e-5


def test_poly_schedule_shape():
    """Warmup ramps 0 -> base; decay follows (1 - t/T)^0.9 to ~0."""
    from infur_tpu.train import poly_schedule
    sched = poly_schedule(1e-2, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-2) < 1e-9
    mid = float(sched(55))          # halfway through decay
    assert 0 < mid < 1e-2
    assert abs(mid - 1e-2 * 0.5 ** 0.9) < 1e-5
    assert float(sched(100)) < 1e-6


def test_finetune_with_poly_schedule(tiny_task):
    """finetune(lr_schedule="poly") optimizes the learnable blob task."""
    x, y = tiny_task
    params = init_fcn_resnet50(jax.random.PRNGKey(2), num_classes=4,
                               aux=False)
    _, losses = finetune(
        lambda p, xx: fcn_resnet50_apply(p, xx), params,
        data=iter(lambda: (x, y), None), steps=8,
        learning_rate=2e-3, lr_schedule="poly", warmup_steps=2,
        log_every=1)
    assert losses[-1] < losses[0]


def test_train_state_resume_bitexact(tiny_task, tmp_path):
    """An interrupted 8-step run resumed from its step-4 state checkpoint
    ends bit-identical to an uninterrupted run (Adam moments, poly-schedule
    count and step all survive the round trip)."""
    import jax
    x, y = tiny_task
    sp = str(tmp_path / "state.npz")
    fn = lambda pp, xx: fcn_resnet50_apply(pp, xx)

    def fresh():
        return init_fcn_resnet50(jax.random.PRNGKey(3), num_classes=4,
                                 aux=False)

    def batches(n):
        for _ in range(n):
            yield x, y
        raise KeyboardInterrupt  # simulated crash mid-run

    straight, _ = finetune(fn, fresh(), data=iter(lambda: (x, y), None),
                           steps=8, learning_rate=1e-3, lr_schedule="poly",
                           log_every=100)
    with pytest.raises(KeyboardInterrupt):  # dies at step 4; state saved
        finetune(fn, fresh(), data=batches(4), steps=8, learning_rate=1e-3,
                 lr_schedule="poly", log_every=100,
                 state_path=sp, resume=False, checkpoint_every=4)
    resumed, _ = finetune(fn, fresh(), data=iter(lambda: (x, y), None),
                          steps=8, learning_rate=1e-3, lr_schedule="poly",
                          log_every=100, state_path=sp, resume=True,
                          checkpoint_every=100)
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
