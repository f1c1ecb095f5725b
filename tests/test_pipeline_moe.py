"""Pipeline parallelism (GPipe over a ``pipe`` axis) and expert parallelism
(routed MoE over an ``expert`` axis) — the pp/ep half of the dp/tp/sp/pp/ep
sharding set.  Runs on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infur_tpu.models import init_fcn_resnet50
from infur_tpu.models.fcn_resnet50 import _bottleneck, fcn_resnet50_apply
from infur_tpu.parallel.pipeline import (
    fcn_pipeline_params, fcn_resnet50_apply_pp, pipeline_apply,
    shard_fcn_pp_params, stack_blocks,
)


@pytest.fixture(scope="module")
def pipe_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "pipe"))


@pytest.fixture(scope="module")
def fcn_params():
    return init_fcn_resnet50(jax.random.PRNGKey(0))


def test_pipeline_combinator_bit_exact(pipe_mesh, fcn_params):
    """The GPipe schedule must equal the sequential block chain exactly:
    same ops per microbatch, identity padding contributes nothing."""
    blocks = fcn_params["layer3"][1:]
    rng = np.random.default_rng(0)
    # post-ReLU-like activations (identity padding relies on x >= 0)
    x = jnp.asarray(np.abs(rng.normal(size=(3, 2, 8, 8, 1024))
                           ).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = x
        for bp in blocks:
            ref = _bottleneck(ref.reshape(-1, 8, 8, 1024), bp, 1, 2
                              ).reshape(ref.shape)
        sp = fcn_pipeline_params(fcn_params, 4)
        got = pipeline_apply(sp, x, lambda p, xx: _bottleneck(xx, p, 1, 2),
                             pipe_mesh, "pipe")
    # identical values per microbatch requires identical shapes in the
    # reference: recompute per-microbatch
    with jax.default_matmul_precision("highest"):
        ref2 = x
        for bp in blocks:
            ref2 = jax.vmap(lambda m, b=bp: _bottleneck(m, b, 1, 2))(ref2)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(got))
    # and the full-batch chain agrees to f32 tolerance
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_identity_padding(pipe_mesh, fcn_params):
    """5 interior blocks pad to 4 stages x 2 blocks: the padding block is
    an exact identity (all-zero convs on post-ReLU activations)."""
    sp = fcn_pipeline_params(fcn_params, 4)
    lead = jax.tree.leaves(sp)[0].shape[:2]
    assert lead == (4, 2)
    # the padded block's convs are all zero
    last = jax.tree.map(lambda a: a[3, 1], sp)
    assert float(jnp.abs(last["conv3"]).max()) == 0.0


def test_fcn_pp_forward_matches_plain(pipe_mesh, fcn_params):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    ref = fcn_resnet50_apply(fcn_params, x)
    got = fcn_resnet50_apply_pp(fcn_params, x, pipe_mesh, n_micro=2)
    for k in ("out", "aux"):
        assert got[k].shape == ref[k].shape
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=1e-3, atol=1e-3)


def test_fcn_pp_with_sharded_stage_params(pipe_mesh, fcn_params):
    """Stage weights actually placed per-device (NamedSharding over pipe)."""
    sp = fcn_pipeline_params(fcn_params, 4)
    sp = jax.device_put(sp, shard_fcn_pp_params(sp, pipe_mesh))
    assert jax.tree.leaves(sp)[0].sharding.spec == P("pipe")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = fcn_resnet50_apply_pp(fcn_params, x, pipe_mesh, n_micro=2,
                                stage_params=sp)
    ref = fcn_resnet50_apply(fcn_params, x)
    np.testing.assert_allclose(np.asarray(ref["out"]), np.asarray(got["out"]),
                               rtol=1e-3, atol=1e-3)


def test_pipeline_grads_flow(pipe_mesh, fcn_params):
    """pp composes with jax.grad: the ppermute/scan schedule is
    differentiable, so a pipelined train step works."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 21, size=(2, 32, 32)).astype(np.int32)

    def loss(params):
        from infur_tpu.train import segmentation_ce
        return segmentation_ce(
            lambda p, xx: fcn_resnet50_apply_pp(p, xx, pipe_mesh, n_micro=2),
            params, x, y)

    val, grads = jax.value_and_grad(loss)(fcn_params)
    assert np.isfinite(float(val))
    g = np.asarray(grads["layer3"][2]["conv2"])  # inside the pipelined region
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_stack_blocks_shapes(fcn_params):
    st = stack_blocks(list(fcn_params["layer3"][1:]))
    assert st["conv1"].shape == (5, 1, 1, 1024, 256)


# ---------------------------------------------------------------------------
# MoE / expert parallelism
# ---------------------------------------------------------------------------

from infur_tpu.parallel.moe import (  # noqa: E402
    init_moe_ffn, moe_capacity, moe_ffn_apply, shard_moe_params,
)


@pytest.fixture(scope="module")
def ep_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "expert"))


def test_moe_capacity():
    assert moe_capacity(256, 4, 1.25) == 80
    assert moe_capacity(3, 4, 1.0) == 1


def test_moe_routes_and_combines():
    p = init_moe_ffn(jax.random.PRNGKey(0), 32, 64, 4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(128, 32)).astype(np.float32)
    y, aux = jax.jit(moe_ffn_apply)(p, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # aux loss near 1.0 for near-uniform routing, >= 1 lower bound in theory
    assert 0.5 < float(aux) < 4.0
    # routing is not degenerate: more than one expert used
    logits = x @ np.asarray(p["router"]) + np.asarray(p["router_b"])
    assert len(np.unique(np.argmax(logits, -1))) > 1


def test_moe_overflow_tokens_emit_zero():
    """Tokens past an expert's capacity produce zero output (the residual
    path carries them), never garbage."""
    p = init_moe_ffn(jax.random.PRNGKey(1), 16, 32, 2)
    # force every token to expert 0 by biasing the router
    p = dict(p, router_b=jnp.asarray([100.0, -100.0]))
    x = np.ones((8, 16), np.float32)
    y, _ = moe_ffn_apply(p, x, capacity_factor=0.5)  # capacity 2 of 8
    rows = np.abs(np.asarray(y)).sum(axis=1)
    assert (rows[:2] > 0).all()          # first two tokens served
    assert np.allclose(rows[2:], 0.0)    # overflow: exact zeros


def test_moe_expert_parallel_matches_replicated(ep_mesh):
    """ep sharding must be numerically a no-op (one-hot dispatch adds
    exact zeros across shards; within-expert matmul tiling is the only
    low-bit source)."""
    p = init_moe_ffn(jax.random.PRNGKey(2), 64, 128, 4)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(256, 64)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ref_y, ref_aux = jax.jit(moe_ffn_apply)(p, x)
        ps = jax.device_put(p, shard_moe_params(p, ep_mesh))
        xs = jax.device_put(x, NamedSharding(ep_mesh, P("data")))
        got_y, got_aux = jax.jit(moe_ffn_apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(ref_y), np.asarray(got_y),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(ref_aux) - float(got_aux)) < 1e-6


def test_moe_shard_rules(ep_mesh):
    p = init_moe_ffn(jax.random.PRNGKey(0), 64, 128, 4)
    sh = shard_moe_params(p, ep_mesh)
    assert sh["w1"].spec == P("expert")
    assert sh["b2"].spec == P("expert")
    assert sh["router"].spec == P()


def test_segformer_moe_family(ep_mesh):
    """The segformer_moe family: dense stages 1-2, routed stages 3-4;
    family contract shapes; ep-sharded == replicated."""
    from infur_tpu.models.segformer_moe import (
        init_segformer_moe, segformer_moe_apply, shard_segformer_moe_params,
    )
    p = init_segformer_moe(jax.random.PRNGKey(0), variant="b0", n_experts=4)
    # stages 1-2 dense, 3-4 routed
    assert "moe" not in p["stage1"]["blocks"][0]
    assert "moe" in p["stage3"]["blocks"][0]
    assert "fc1" not in p["stage3"]["blocks"][0]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ref = segformer_moe_apply(p, x)
    assert ref["out"].shape == (2, 21, 64, 64)
    ps = jax.device_put(p, shard_segformer_moe_params(p, ep_mesh))
    xs = jax.device_put(x, NamedSharding(ep_mesh, P("data")))
    got = segformer_moe_apply(ps, xs)
    np.testing.assert_allclose(np.asarray(ref["out"]), np.asarray(got["out"]),
                               rtol=1e-3, atol=1e-4)


def test_segformer_moe_model_stage():
    """Loadable through the ModelStage spec grammar like any family."""
    from infur_tpu.model_stage import _open_backend
    be = _open_backend("segformer_moe:b0")
    assert be.output_names == ("out",)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    outs = be(jnp.asarray(x))
    assert outs["out"].shape == (1, 21, 32, 32)


def test_segformer_moe_train_step(ep_mesh):
    """Gradients flow through routing (straight-through via the gate
    weighting); the Switch aux loss is differentiable."""
    from infur_tpu.models.segformer_moe import segformer_moe_forward
    p = init_segformer_moe_small()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 21, size=(2, 32, 32)).astype(np.int32)

    def loss(params):
        from infur_tpu.train import segmentation_ce
        logits, aux = segformer_moe_forward(params, x)
        ce = segmentation_ce(lambda pp, xx: logits, params, x, y)
        return ce + 0.01 * aux

    val, grads = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    g = np.asarray(grads["stage3"]["blocks"][0]["moe"]["w1"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def init_segformer_moe_small():
    from infur_tpu.models.segformer_moe import init_segformer_moe
    return init_segformer_moe(jax.random.PRNGKey(3), variant="b0",
                              n_experts=2)
