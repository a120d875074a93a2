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


def _tiny_training_setup(dropout=0.0):
    from spherical_dyffusion_tpu.data import DebugDataModule
    from spherical_dyffusion_tpu.training import (
        ExperimentConfig,
        InterpolationExperiment,
        Trainer,
        TrainerConfig,
    )

    dm = DebugDataModule(channels=2, height=8, width=16, horizon=3,
                         batch_size=8, n_timesteps=24)
    model = SFNO(SFNOConfig(img_shape=(8, 16), in_chans=4, out_chans=2,
                            embed_dim=8, num_layers=1, with_time_emb=True,
                            dropout_mlp=dropout, min_time=1, max_time=2))
    exp = InterpolationExperiment(
        model, ExperimentConfig(horizon=3), dm.in_packer, dm.out_packer,
        dm.normalizer)
    return dm, exp, Trainer, TrainerConfig


def test_shard_map_bf16_grad_reduce_matches_pjit_step():
    """The explicit shard_map DP step with bf16 gradient all-reduce must match
    the pjit step's math to bf16 rounding (dropout off so the only difference
    is collective precision)."""
    dm, exp, Trainer, TrainerConfig = _tiny_training_setup(dropout=0.0)
    batch = next(iter(dm.train_batches(seed=0)))
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    rng = jax.random.PRNGKey(0)

    losses, final_params = [], []
    for rd in (None, "bfloat16"):
        tr = Trainer(exp, dm, TrainerConfig(epochs=1, steps_per_epoch=1,
                                            grad_reduce_dtype=rd, use_ema=False),
                     mesh=mesh)
        state = tr.init_state(batch)
        step = tr._make_train_step()
        dyn = shard_batch(mesh, batch["dynamics"])
        state, metrics = step(state, dyn, None, rng, None)
        losses.append(float(metrics["loss"]))
        final_params.append(jax.device_get(state.params))
    assert np.isfinite(losses[1])
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-2)
    a = jax.tree_util.tree_leaves(final_params[0])
    b = jax.tree_util.tree_leaves(final_params[1])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-2)


def test_shard_map_step_rejects_model_parallel_mesh():
    dm, exp, Trainer, TrainerConfig = _tiny_training_setup()
    batch = next(iter(dm.train_batches(seed=0)))
    mesh = make_mesh(data=2, h=2, devices=jax.devices()[:4])
    tr = Trainer(exp, dm, TrainerConfig(epochs=1, steps_per_epoch=1,
                                        grad_reduce_dtype="bfloat16"), mesh=mesh)
    tr.init_state(batch)
    with pytest.raises(ValueError, match="data-parallel mesh"):
        tr._make_train_step()


def test_zero_shard_opt_state_sharded_and_trains():
    dm, exp, Trainer, TrainerConfig = _tiny_training_setup()
    batch = next(iter(dm.train_batches(seed=0)))
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    tr = Trainer(exp, dm, TrainerConfig(epochs=1, steps_per_epoch=1,
                                        zero_shard_opt_state=True), mesh=mesh)
    state = tr.init_state(batch)
    # at least one adam moment leaf must actually be sharded over 'data'
    specs = [
        x.sharding.spec for x in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(x, "sharding") and np.ndim(x) >= 1
    ]
    assert any("data" in str(s) for s in specs), specs
    step = tr._make_train_step()
    dyn = shard_batch(mesh, batch["dynamics"])
    state, metrics = step(state, dyn, None, jax.random.PRNGKey(0), None)
    assert np.isfinite(float(metrics["loss"]))


def test_donate_state_multi_step():
    """Buffer donation across the TrainState (params + EMA + opt state): the
    round-1 failure was EMA aliasing params at init (donating the same buffer
    twice); ema_init now copies. Two chained donated steps must work."""
    dm, exp, Trainer, TrainerConfig = _tiny_training_setup()
    batch = next(iter(dm.train_batches(seed=0)))
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    tr = Trainer(exp, dm, TrainerConfig(epochs=1, steps_per_epoch=1,
                                        donate_state=True), mesh=mesh)
    state = tr.init_state(batch)
    step = tr._make_train_step()
    dyn = shard_batch(mesh, batch["dynamics"])
    for i in range(2):
        state, metrics = step(state, dyn, None,
                              jax.random.fold_in(jax.random.PRNGKey(0), i), None)
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# multihost wireup guard (parallel/multihost.py): the env parse must be exact
# and the guard must no-op single-host — a pod launch recipe is untestable
# here, so the parse/no-op contract is the testable surface (reference
# analog: the WORLD_SIZE/RANK parsing of comm.py:112-179).


def test_multihost_env_parse():
    from spherical_dyffusion_tpu.parallel import (
        MultihostSpec,
        parse_multihost_env,
    )

    # no opt-in -> None (single-host default; unrelated env vars ignored)
    assert parse_multihost_env({}) is None
    assert parse_multihost_env({"WORLD_SIZE": "8", "RANK": "0"}) is None

    # auto-detection mode: flag only, no coordinator
    assert parse_multihost_env({"SPHDY_MULTIHOST": "1"}) == MultihostSpec()

    # explicit coordinator with topology
    spec = parse_multihost_env({
        "SPHDY_COORDINATOR": "10.0.0.2:8476",
        "SPHDY_NUM_PROCESSES": "4",
        "SPHDY_PROCESS_ID": "1",
    })
    assert spec == MultihostSpec("10.0.0.2:8476", 4, 1)

    # explicit coordinator, topology auto-detected
    spec = parse_multihost_env({"SPHDY_COORDINATOR": "host:1234"})
    assert spec == MultihostSpec("host:1234", None, None)

    # malformed opt-ins fail loudly at startup (not in the handshake)
    with pytest.raises(ValueError):
        parse_multihost_env({"SPHDY_COORDINATOR": "no-port"})
    with pytest.raises(ValueError):
        parse_multihost_env({"SPHDY_COORDINATOR": "h:12",
                             "SPHDY_NUM_PROCESSES": "two",
                             "SPHDY_PROCESS_ID": "0"})
    with pytest.raises(ValueError):  # num/id must come together
        parse_multihost_env({"SPHDY_COORDINATOR": "h:12",
                             "SPHDY_NUM_PROCESSES": "2"})


def test_multihost_guard_noops_single_host():
    from spherical_dyffusion_tpu.parallel import maybe_init_multihost

    # empty env: returns None and must NOT touch jax.distributed
    assert maybe_init_multihost(env={}) is None
    # jax remains single-process (initialize() was never called)
    assert jax.process_count() == 1
