"""Multi-chip sharding: mesh, param shardings, sharded train step.

Runs on the 8-device virtual CPU mesh (conftest) — the same path the
driver's ``dryrun_multichip`` validates.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from infur_tpu.models import init_fcn_resnet50
from infur_tpu.parallel import (
    make_mesh, shard_batch, shard_fcn_params, train_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should give 8 virtual devices"
    return make_mesh(8, model_axis=2)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"data": 4, "model": 2, "spatial": 1}


def test_param_sharding_rules(mesh):
    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    sh = shard_fcn_params(params, mesh)
    # wide conv kernels shard their output channels over "model"
    assert sh["stem_conv"].spec == P(None, None, None, "model")
    assert sh["layer4"][0]["conv2"].spec == P(None, None, None, "model")
    # the 21-class head kernel does not divide by 2 -> replicated
    assert sh["head"]["conv2"].spec == P()
    assert sh["head"]["bias2"].spec == P()
    # BN vectors follow the channel shard
    assert sh["stem_bn"]["scale"].spec == P("model")


def test_sharded_train_step_runs(mesh):
    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    params = jax.device_put(params, shard_fcn_params(params, mesh))
    rng = np.random.default_rng(0)
    batch = mesh.shape["data"]
    x = jax.device_put(rng.normal(size=(batch, 16, 16, 3)).astype(np.float32),
                       shard_batch(mesh))
    y = jax.device_put(rng.integers(0, 21, size=(batch, 16, 16)).astype(np.int32),
                       shard_batch(mesh))
    new_params, loss = train_step(params, x, y)
    assert np.isfinite(float(loss))
    # params actually moved and kept their sharding
    assert not np.allclose(np.asarray(new_params["stem_conv"]),
                           np.zeros(()), atol=0)
    assert new_params["stem_conv"].sharding.spec == P(None, None, None, "model")


def test_spatial_partitioning_matches_replicated():
    """Sharding image rows over the spatial axis must be numerically a
    no-op: GSPMD's conv halo exchanges reproduce the unsharded forward."""
    from infur_tpu.parallel.mesh import segmentation_loss

    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    y = rng.integers(0, 21, size=(2, 16, 16)).astype(np.int32)

    ref = float(jax.jit(segmentation_loss)(params, x, y))

    mesh3 = make_mesh(8, model_axis=2, spatial_axis=2)
    assert dict(mesh3.shape) == {"data": 2, "model": 2, "spatial": 2}
    ps = jax.device_put(params, shard_fcn_params(params, mesh3))
    xs = jax.device_put(x, shard_batch(mesh3))
    ys = jax.device_put(y, shard_batch(mesh3))
    got = float(jax.jit(segmentation_loss)(ps, xs, ys))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_full_3axis_mesh():
    """The dryrun path at 8 devices: (2 data, 2 model, 2 spatial)."""
    mesh3 = make_mesh(8, model_axis=2, spatial_axis=2)
    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    params = jax.device_put(params, shard_fcn_params(params, mesh3))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(2, 16, 16, 3)).astype(np.float32),
                       shard_batch(mesh3))
    y = jax.device_put(rng.integers(0, 21, size=(2, 16, 16)).astype(np.int32),
                       shard_batch(mesh3))
    new_params, loss = train_step(params, x, y)
    assert np.isfinite(float(loss))


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Multi-chip checkpoint/resume: NamedSharding-sharded params save
    through orbax and restore directly onto the mesh (each leaf placed by
    a ShapeDtypeStruct+sharding template) with values intact."""
    import jax.numpy as jnp
    from infur_tpu.runtime.checkpoint import (
        load_params_orbax, save_params_orbax,
    )

    mesh = make_mesh(8, model_axis=2)
    params = init_fcn_resnet50(jax.random.PRNGKey(4))
    shardings = shard_fcn_params(params, mesh)
    sharded = jax.device_put(params, shardings)

    path = tmp_path / "ckpt_sharded"
    save_params_orbax(str(path), sharded)

    like = jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        params, shardings)
    restored = load_params_orbax(str(path), like=like)
    # placement: restored leaves carry the mesh sharding
    from jax.sharding import PartitionSpec as P
    assert restored["stem_conv"].sharding.spec == P(None, None, None, "model")
    # values: exact round trip
    flat_a = jax.tree.leaves(sharded)
    flat_b = jax.tree.leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored tree trains
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(4, 16, 16, 3)).astype(np.float32),
                       shard_batch(mesh))
    y = jax.device_put(rng.integers(0, 21, size=(4, 16, 16)).astype(np.int32),
                       shard_batch(mesh))
    _, loss = train_step(restored, x, y)
    assert np.isfinite(float(loss))


def test_model_stage_mesh_spec_serving_parity():
    """`fcn_resnet50:mesh=2x2` through the product Load command: params
    shard over (model, spatial), frames shard over image rows, outputs
    match the unsharded stage exactly (8-device virtual mesh)."""
    import numpy as np

    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.processing import Frame

    frame = Frame(1, np.random.default_rng(5).integers(
        0, 255, (32, 48, 3), dtype=np.uint8))

    def run(spec):
        from infur_tpu.processing import Cell
        st = ModelStage()
        st.control(Load(spec))
        cell = Cell()
        st.advance(frame, cell)
        return np.asarray(cell.value.outputs["out"])

    plain = run("fcn_resnet50")
    meshed = run("fcn_resnet50:mesh=2x2")
    # channel sharding (model axis) changes the conv contraction order, so
    # f32 sums reassociate — logits agree to ~1e-3, masks exactly
    np.testing.assert_allclose(meshed, plain, atol=2e-3, rtol=2e-3)
    np.testing.assert_array_equal(meshed.argmax(0), plain.argmax(0))


def test_model_stage_mesh_spec_validation():
    import pytest

    from infur_tpu.errors import ModelLoadError
    from infur_tpu.model_stage import Load, ModelStage
    for bad in ("lraspp:mesh=abc", "lraspp:mesh=0x2", "lraspp:mesh=9x9"):
        with pytest.raises(ModelLoadError):
            ModelStage().control(Load(bad))
