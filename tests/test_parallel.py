"""Parallelism tests on the virtual 8-device CPU mesh: sharded execution of
the SFNO (data x spatial) must reproduce single-device results; the mesh
helpers build the documented axis layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
from spherical_dyffusion_tpu.parallel import batch_sharding, make_mesh, shard_batch


def test_make_mesh_layouts():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "h", "w", "matmul")
    assert mesh.size == 8
    mesh2 = make_mesh(data=2, h=2, w=2)
    assert dict(zip(mesh2.axis_names, mesh2.devices.shape)) == {
        "data": 2, "h": 2, "w": 2, "matmul": 1
    }
    with pytest.raises(ValueError):
        make_mesh(data=3, h=2)


def _forward(params, model, x):
    return model.apply(params, x)


def test_sfno_data_parallel_matches_single_device():
    model = SFNO(SFNOConfig(img_shape=(16, 32), in_chans=3, out_chans=3,
                            embed_dim=8, num_layers=2))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16, 32, 3)),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y_ref = jax.jit(_forward, static_argnums=1)(params, model, x)

    mesh = make_mesh(data=8)
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y_sharded = jax.jit(_forward, static_argnums=1)(ps, model, xs)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_sfno_spatial_sharding_matches_single_device():
    """lat/lon sharded over the h/w mesh axes: XLA inserts the collectives for
    the SHT contraction and instance-norm reductions; numerics must agree.
    This is the TPU-native replacement for the reference's distributed SHT +
    DistributedInstanceNorm (SURVEY §2.5)."""
    model = SFNO(SFNOConfig(img_shape=(16, 32), in_chans=3, out_chans=3,
                            embed_dim=8, num_layers=2))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 32, 3)),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y_ref = jax.jit(_forward, static_argnums=1)(params, model, x)

    mesh = make_mesh(data=2, h=2, w=2)
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim, spatial=True))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y_sharded = jax.jit(_forward, static_argnums=1)(ps, model, xs)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(data=4, h=2)
    batch = {"dynamics": np.zeros((4, 3, 16, 32, 2), np.float32)}
    out = shard_batch(mesh, batch, spatial=True)
    sh = out["dynamics"].sharding
    assert sh.spec == P("data", None, "h", "w", None)


def test_distributed_sht_matches_single_device():
    """shard_map SHT (lat/lon sharded, all_to_all + psum) == plain SHT."""
    from spherical_dyffusion_tpu.ops import InverseRealSHT, RealSHT
    from spherical_dyffusion_tpu.parallel.distributed_sht import (
        distributed_dhconv,
        distributed_isht,
        distributed_sht,
    )

    H, W, C = 16, 32, 8
    mesh = make_mesh(data=2, h=2, w=2)
    sht = RealSHT.create(H, W, grid="legendre-gauss")
    isht = InverseRealSHT.create(H, W, grid="legendre-gauss")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)

    want = sht(x)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "h", "w", None)))
    got = distributed_sht(xs, sht, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # inverse roundtrip through the sharded pipeline
    back = distributed_isht(got, isht, mesh)
    want_back = isht(want)
    np.testing.assert_allclose(np.asarray(back), np.asarray(want_back), atol=2e-5)

    # tensor-parallel dhconv against the einsum path; the default
    # reduce_scatter hands channels back sharded over 'w' (the ISHT layout)
    from spherical_dyffusion_tpu.ops.contractions import contract_dhconv

    w = jnp.asarray(rng.standard_normal((C, C, sht.lmax, 2)) * 0.1, jnp.float32)
    want_conv = contract_dhconv(want, w)
    got_conv = distributed_dhconv(got, w, mesh)
    assert got_conv.sharding.spec == P(None, None, None, "w")
    np.testing.assert_allclose(np.asarray(got_conv), np.asarray(want_conv),
                               atol=2e-5, rtol=1e-4)
    got_rep = distributed_dhconv(got, w, mesh, scatter_output=False)
    np.testing.assert_allclose(np.asarray(got_rep), np.asarray(want_conv),
                               atol=2e-5, rtol=1e-4)

    # full sharded spectral pipeline SHT -> dhconv -> ISHT with zero-copy
    # hand-offs (every stage consumes the previous stage's output sharding)
    pipe = distributed_isht(got_conv, isht, mesh)
    want_pipe = isht(want_conv)
    np.testing.assert_allclose(np.asarray(pipe), np.asarray(want_pipe),
                               atol=2e-5, rtol=1e-4)
    assert pipe.sharding.spec == P(None, "h", "w", None)
