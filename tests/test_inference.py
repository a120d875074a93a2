"""Inference engine tests: prescriber, window stitching, full rollout with
aggregators/writers, exactness in an analytically-solvable world."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.data import (
    DebugDataModule,
    StandardNormalizer,
    SyntheticTimeSeries,
)
from spherical_dyffusion_tpu.diffusion import DYffusionConfig
from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator
from spherical_dyffusion_tpu.inference import (
    DYffusionStepper,
    InferenceConfig,
    InferenceWindows,
    PackedPrescriber,
    PredictionWriter,
    PrescriberConfig,
    run_inference,
)
from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
from spherical_dyffusion_tpu.training import (
    DYffusionForecastingExperiment,
    ExperimentConfig,
    InterpolationExperiment,
    Trainer,
    TrainerConfig,
)


def test_prescriber_overwrite_and_interpolate():
    cfg = PrescriberConfig("sst", "ocean_fraction", mask_value=1)
    p = cfg.build(["a", "sst", "b"])
    preds = jnp.zeros((2, 4, 4, 3))
    target = jnp.full((2, 4, 4), 5.0)
    mask = jnp.zeros((2, 4, 4)).at[:, :2].set(1.0)
    out = p(preds, target, mask)
    np.testing.assert_array_equal(np.asarray(out[..., 1][:, :2]), 5.0)
    np.testing.assert_array_equal(np.asarray(out[..., 1][:, 2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[..., 0]), 0.0)

    p2 = PrescriberConfig("sst", "of", mask_value=1, interpolate=True).build(["a", "sst", "b"])
    mask_f = jnp.full((2, 4, 4), 0.25)
    out2 = p2(preds, target, mask_f)
    np.testing.assert_allclose(np.asarray(out2[..., 1]), 1.25)


def test_inference_windows_cover_rollout_with_repeats():
    src = SyntheticTimeSeries(["x"], n_timesteps=20, spatial_shape=(4, 8))
    cfg = InferenceConfig(n_forward_steps=45, forward_steps_in_memory=16, n_repeats=3)
    win = InferenceWindows(src, ["x"], cfg)
    chunks = list(win)
    starts = [s for s, _ in chunks]
    assert starts == [0, 16, 32]
    total = sum(d["x"].shape[0] - 1 for _, d in chunks)
    assert total == 45
    # consecutive windows overlap by exactly one frame (the stitched state)
    a = chunks[0][1]["x"][-1]
    b = chunks[1][1]["x"][0]
    np.testing.assert_array_equal(a, b)


class _LinearWorldExperiment:
    """Minimal experiment stub with exact linear dynamics x(t+1) = x(t) + v.
    Lets us verify the stepper's stitching/segment algebra end-to-end without
    network noise."""

    class _Cfg:
        horizon = 4
        window = 1

    def __init__(self, names, v, normalizer):
        from spherical_dyffusion_tpu.data import Packer
        from spherical_dyffusion_tpu.diffusion import build_schedule

        self.cfg = self._Cfg()
        self.cfg.horizon = 4
        self.in_packer = Packer(names)
        self.out_packer = Packer(names)
        self.normalizer = normalizer
        self.forcing_names = ()
        self.forcing_normalizer = None
        self.diffusion_cfg = DYffusionConfig(timesteps=4, forward_conditioning="none")
        self.sched = build_schedule(self.diffusion_cfg)
        self._v = v  # velocity in normalized space

    def _interp_fn(self, ip_params=None):
        h = self.cfg.horizon

        def interpolate_fn(x_end, x_last, t, rng, **kw):
            w = (t / h).reshape((-1,) + (1,) * (x_end.ndim - 1))
            return x_end + (x_last - x_end) * w

        return interpolate_fn

    def _forecast_fn(self, params, deterministic=True, rng=None):
        h = self.cfg.horizon
        v = self._v

        def forecast_fn(x_t, time, condition, static_condition=None):
            tt = jnp.asarray(time, jnp.float32).reshape((-1,) + (1,) * (x_t.ndim - 1))
            return x_t + v * (h - tt)

        return forecast_fn


def test_stepper_exact_linear_world_multi_window():
    names = ["a", "b"]
    H_, W_ = 8, 16
    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names}, {n: 1.0 for n in names}, names)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, H_, W_, 2)) * 0.01, jnp.float32)
    exp = _LinearWorldExperiment(names, v, norm)
    stepper = DYffusionStepper(exp, params=None)

    x0 = jnp.asarray(rng.standard_normal((1, H_, W_, 2)), jnp.float32)
    # 10 steps = 2 full segments of 4 + partial of 2
    xf, preds = stepper.run_window(x0, None, None, None, jax.random.PRNGKey(0), 10)
    assert preds.shape == (1, 10, H_, W_, 2)
    for t in range(10):
        np.testing.assert_allclose(
            np.asarray(preds[:, t]), np.asarray(x0 + v * (t + 1)), atol=1e-4, err_msg=str(t)
        )
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x0 + v * 10), atol=1e-4)
    # continue from the stitched state: next window must continue the line
    xf2, preds2 = stepper.run_window(xf, None, None, None, jax.random.PRNGKey(1), 4)
    np.testing.assert_allclose(
        np.asarray(preds2[:, -1]), np.asarray(x0 + v * 14), atol=1e-4
    )


def _train_tiny_dyffusion(dm, horizon):
    C, CF = len(dm.cfg.in_names), len(dm.cfg.forcing_names)
    H_, W_ = dm._src.spatial_shape
    icfg = ExperimentConfig(horizon=horizon, window=1, enable_inference_dropout=True)
    imodel = SFNO(SFNOConfig(img_shape=(H_, W_), in_chans=2 * C + CF, out_chans=C,
                             embed_dim=8, num_layers=1, with_time_emb=True,
                             dropout_mlp=0.1, min_time=1, max_time=horizon - 1))
    interp = InterpolationExperiment(imodel, icfg, dm.in_packer, dm.out_packer, dm.normalizer)
    t1 = Trainer(interp, dm, TrainerConfig(lr=8e-3, epochs=1, use_ema=False,
                                           warmup_steps=2, steps_per_epoch=7))
    t1.fit(verbose=False, val_every=100)

    fmodel = SFNO(SFNOConfig(img_shape=(H_, W_), in_chans=C + CF, out_chans=C,
                             embed_dim=8, num_layers=1, with_time_emb=True,
                             min_time=0, max_time=horizon - 1))
    dcfg = DYffusionConfig(timesteps=horizon, forward_conditioning="none")
    exp = DYffusionForecastingExperiment(
        fmodel, interp, t1.state.params, dcfg,
        ExperimentConfig(horizon=horizon), dm.in_packer, dm.out_packer, dm.normalizer,
        forcing_names=dm.cfg.forcing_names, forcing_normalizer=dm.forcing_normalizer,
    )
    t2 = Trainer(exp, dm, TrainerConfig(lr=4e-3, epochs=1, use_ema=False,
                                        warmup_steps=2, steps_per_epoch=7))
    t2.fit(verbose=False, val_every=100)
    return exp, t2.state.params


def test_full_rollout_with_aggregator_and_writer(tmp_path):
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    # prescribe var_0 where a static mask is 1
    prescriber = PrescriberConfig("var_0", "forcing_0", mask_value=1).build(
        dm.cfg.out_names
    )
    stepper = DYffusionStepper(exp, params, prescriber=prescriber)
    cfg = InferenceConfig(n_forward_steps=18, forward_steps_in_memory=10,
                          n_ensemble=2, n_repeats=1)
    src = dm._src
    agg = InferenceAggregator(list(dm.cfg.out_names),
                              dm.grid.horizontal.area_weights(),
                              snapshot_steps=[3, 11])
    writer = PredictionWriter(str(tmp_path / "preds.nc"), dm.cfg.out_names,
                              dm.grid.horizontal.lat, dm.grid.horizontal.lon,
                              n_ensemble=2, save_targets=True)
    summary = run_inference(stepper, src, cfg, aggregator=agg, writer=writer,
                            mask_name="forcing_0", verbose=False)
    writer.close()
    assert summary["n_forward_steps"] == 18
    assert summary["total_steps_per_second"] > 0
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])
    assert any("crps" in k for k in logs)  # ensemble metrics present
    assert np.isfinite(logs["inference/time_mean/rmse/var_0"])
    assert 3 in agg.snapshots.snapshots and 11 in agg.snapshots.snapshots
    # written file is readable and has the full time axis
    import h5py

    with h5py.File(tmp_path / "preds.nc") as f:
        assert f["var_0"].shape == (2, 18, 8, 16)
        assert f["target_var_0"].shape == (18, 8, 16)
        assert np.isfinite(f["var_0"][()]).all()


def test_run_dataset_inference_rescores_saved_predictions(tmp_path):
    """Saved predictions re-scored (reference run_dataset_inference)."""
    import h5py

    from spherical_dyffusion_tpu.inference.loop import run_dataset_inference
    from spherical_dyffusion_tpu.evaluation.metrics import spherical_area_weights

    names = ["a", "b"]
    src = SyntheticTimeSeries(names, n_timesteps=12, spatial_shape=(8, 16))
    # fabricate "predictions" = truth + noise, saved like PredictionWriter
    tgt = src.read_window(1, 6, names)
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "preds.nc", "w") as f:
        for v in names:
            data = tgt[v][None] + 0.1 * rng.standard_normal((2, 6, 8, 16)).astype(np.float32)
            f.create_dataset(v, data=data)
    w = spherical_area_weights(np.linspace(-80, 80, 8), 16)
    logs = run_dataset_inference(str(tmp_path / "preds.nc"), src, names, w)
    assert np.isfinite(logs["inference/avg/rmse"])
    assert logs["inference/avg/rmse"] < 0.3


def test_direct_strategy_dataset():
    src = SyntheticTimeSeries(["x"], n_timesteps=20, spatial_shape=(4, 8))
    from spherical_dyffusion_tpu.data import WindowedDataset

    ds = WindowedDataset(src, in_names=["x"], horizon=6, window=1, strategy="direct")
    item = ds[0]
    assert item["dynamics"].shape == (2, 4, 8, 1)  # window frame + final frame
    seq = WindowedDataset(src, in_names=["x"], horizon=6, window=1)[0]
    np.testing.assert_array_equal(item["dynamics"][0], seq["dynamics"][0])
    np.testing.assert_array_equal(item["dynamics"][1], seq["dynamics"][6])


def test_snapshot_and_zonal_plots(tmp_path):
    from spherical_dyffusion_tpu.evaluation.plots import (
        plot_snapshot_panels,
        plot_zonal_mean_hovmoeller,
    )

    rng = np.random.default_rng(0)
    snaps = {5: {"preds": rng.standard_normal((8, 16, 2)).astype(np.float32),
                 "targets": rng.standard_normal((8, 16, 2)).astype(np.float32)}}
    paths = plot_snapshot_panels(snaps, ["a", "b"], str(tmp_path))
    assert (tmp_path / "snapshot_t5.png").exists()
    pz = rng.standard_normal((10, 8, 2)).astype(np.float32)
    tz = rng.standard_normal((10, 8, 2)).astype(np.float32)
    paths2 = plot_zonal_mean_hovmoeller(pz, tz, ["a", "b"], str(tmp_path))
    assert (tmp_path / "zonal_mean_a.png").exists()


def test_conservation_loss():
    from spherical_dyffusion_tpu.data import SigmaCoordinates
    from spherical_dyffusion_tpu.evaluation.metrics import spherical_area_weights
    from spherical_dyffusion_tpu.training.losses import conservation_loss

    K, B, T, H_, W_ = 3, 1, 4, 8, 16
    sigma = SigmaCoordinates(np.linspace(0, 0, K + 1), np.linspace(0, 1, K + 1))
    w = spherical_area_weights(np.linspace(-80, 80, H_), W_)
    loss_fn = conservation_loss(w, sigma)
    gen = {"PRESsfc": jnp.full((B, T, H_, W_), 1e5)}
    for k in range(K):
        gen[f"specific_total_water_{k}"] = jnp.full((B, T, H_, W_), 1e-3)
    # constant fields -> perfectly conserved -> zero loss
    assert float(loss_fn(gen)) < 1e-6
    gen2 = dict(gen)
    drift = jnp.arange(T, dtype=jnp.float32)[None, :, None, None] * 100.0
    gen2["PRESsfc"] = gen["PRESsfc"] + drift
    assert float(loss_fn(gen2)) > 1.0


def test_ensemble_chunking_equivalent_shapes(tmp_path):
    """ensemble_in_memory chunks members through the device without changing
    the outputs' shape contract."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    stepper = DYffusionStepper(exp, params)
    agg = InferenceAggregator(list(dm.cfg.out_names), dm.grid.horizontal.area_weights())
    cfg = InferenceConfig(n_forward_steps=8, forward_steps_in_memory=8,
                          n_ensemble=3, ensemble_in_memory=2, n_repeats=1)
    summary = run_inference(stepper, dm._src, cfg, aggregator=agg, verbose=False)
    assert summary["n_forward_steps"] == 8
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])
    assert any("crps" in k for k in logs)


def test_multi_initial_condition_windows_and_rollout():
    """Multi-IC rollouts (reference InferenceInitialConditionIndices,
    data_loading/inference.py:17-60): each IC reads its own forcing/target
    window; all ICs x members run as one batch; per-IC targets are scored."""
    names = ["a", "b"]
    H_, W_ = 8, 16
    src = SyntheticTimeSeries(names, n_timesteps=40, spatial_shape=(H_, W_))
    cfg = InferenceConfig(n_forward_steps=8, forward_steps_in_memory=8,
                          n_ensemble=2, n_initial_conditions=3, ic_interval=4)
    assert cfg.start_indices == (0, 4, 8)
    win = InferenceWindows(src, names, cfg)
    step, data = next(iter(win))
    assert data["a"].shape == (3, 9, H_, W_)
    # IC k's window starts at frame 4k
    ref = src.read_window(4, 9, ["a"])["a"]
    np.testing.assert_array_equal(data["a"][1], ref)

    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names},
                                         {n: 1.0 for n in names}, names)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, H_, W_, 2)) * 0.01, jnp.float32)
    exp = _LinearWorldExperiment(names, v, norm)
    stepper = DYffusionStepper(exp, params=None)
    agg = InferenceAggregator(names, jnp.ones((H_, W_)) / (H_ * W_))
    summary = run_inference(stepper, src, cfg, aggregator=agg, verbose=False)
    assert summary["n_forward_steps"] == 8
    # throughput counts all IC x member trajectories
    assert summary["total_steps_per_second"] > 0
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])

    # writers are single-IC only (documented restriction)
    with pytest.raises(ValueError, match="single initial condition"):
        run_inference(stepper, src, cfg, writer=object(), verbose=False)


def test_stepper_mesh_sharded_rollout_matches_unsharded():
    """Rollout batch rows shard over the mesh 'data' axis; numerics match the
    unsharded run (pod-scale path, VERDICT r1 item 6)."""
    from spherical_dyffusion_tpu.parallel import make_mesh

    names = ["a", "b"]
    H_, W_ = 8, 16
    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names},
                                         {n: 1.0 for n in names}, names)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, H_, W_, 2)) * 0.01, jnp.float32)
    exp = _LinearWorldExperiment(names, v, norm)
    x0 = jnp.asarray(rng.standard_normal((4, H_, W_, 2)), jnp.float32)

    plain = DYffusionStepper(exp, params=None)
    xf_ref, preds_ref = plain.run_window(x0, None, None, None,
                                         jax.random.PRNGKey(3), 6)
    mesh = make_mesh(data=4, h=2)
    sharded = DYffusionStepper(exp, params=None, mesh=mesh)
    xf, preds = sharded.run_window(x0, None, None, None, jax.random.PRNGKey(3), 6)
    assert "data" in str(preds.sharding) or preds.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(preds), np.asarray(preds_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_ref),
                               atol=1e-5, rtol=1e-5)


def test_stepper_use_ema_params():
    """use_ema_params selects the forecaster EMA tree for the rollout and
    fails loudly when no EMA tree exists (was a dead knob in round 1)."""
    names = ["a", "b"]
    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names},
                                         {n: 1.0 for n in names}, names)
    exp = _LinearWorldExperiment(names, jnp.zeros((1, 4, 8, 2)), norm)
    raw = {"params": {"w": jnp.zeros((2,))}}
    ema = {"params": {"w": jnp.ones((2,))}}
    st = DYffusionStepper(exp, raw, use_ema_params=True, ema_params=ema)
    assert st.params["forecaster"] is ema
    st2 = DYffusionStepper(exp, raw)
    assert st2.params["forecaster"] is raw
    with pytest.raises(ValueError, match="ema_params"):
        DYffusionStepper(exp, raw, use_ema_params=True)


def test_rollout_determinism_and_ensemble_divergence():
    """Same seed -> bitwise-identical rollout (determinism, reference §5.2);
    different ensemble rngs -> diverging members (stochastic interpolator)."""
    names = ["a", "b"]
    H_, W_ = 8, 16
    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names},
                                         {n: 1.0 for n in names}, names)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, H_, W_, 2)) * 0.01, jnp.float32)
    exp = _LinearWorldExperiment(names, v, norm)
    stepper = DYffusionStepper(exp, params=None)
    x0 = jnp.asarray(rng.standard_normal((1, H_, W_, 2)), jnp.float32)
    _, p1 = stepper.run_window(x0, None, None, None, jax.random.PRNGKey(7), 8)
    _, p2 = stepper.run_window(x0, None, None, None, jax.random.PRNGKey(7), 8)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # stochastic world: a real dropout interpolator diverges across member rngs
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp2, params2 = _train_tiny_dyffusion(dm, HORIZON)
    st2 = DYffusionStepper(exp2, params2)
    x = jnp.zeros((2, 8, 16, 2))  # two members, same initial condition
    f = jnp.zeros((2, HORIZON + 1, 8, 16, 1))
    _, preds = st2.run_window(x, f, None, None, jax.random.PRNGKey(0), HORIZON)
    # members share the window rng stream but dropout masks differ per batch row
    assert not np.allclose(np.asarray(preds[0]), np.asarray(preds[1]))


def test_repeating_window_uploads_are_cached():
    """Round-3: with n_repeats > 1 and a source aligned to the window length,
    every window's wrapped read offsets coincide — the conditioning/target
    device buffers must be uploaded once and reused (guards the axon-client
    host-RAM leak workaround AND the redundant-transfer cost)."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    stepper = DYffusionStepper(exp, params)
    W = 2 * HORIZON
    names = list(dm.cfg.in_names) + list(dm.cfg.forcing_names)
    src = SyntheticTimeSeries(names, n_timesteps=W, spatial_shape=(8, 16))
    n_puts = {"n": 0}
    orig_put = jax.device_put

    def counting_put(x, *a, **k):
        if hasattr(x, "nbytes") and getattr(x, "nbytes", 0) > 1024:
            n_puts["n"] += 1
        return orig_put(x, *a, **k)

    agg = InferenceAggregator(list(dm.cfg.out_names),
                              dm.grid.horizontal.area_weights())
    jax.device_put = counting_put
    try:
        run_inference(
            stepper, src,
            InferenceConfig(n_forward_steps=4 * W, forward_steps_in_memory=W,
                            n_repeats=16),
            aggregator=agg, verbose=False,
        )
    finally:
        jax.device_put = orig_put
    # 4 windows of identical wrapped offsets: the upload happens for the first
    # window only (conditioning + forcing + targets), then buffers are reused
    first_window_puts = n_puts["n"]
    assert first_window_puts <= 8, n_puts
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])


def test_rollout_rbg_hardware_rng_deterministic_and_divergent():
    """Round-3 perf: InferenceConfig.rng_impl defaults to "rbg" (TPU hardware
    RNG; threefry mask generation fused into the MLP megafusions held them at
    ~34 TF/s — measured +10.7% end-to-end). The rbg key must flow through the
    whole window program: same key -> bitwise-identical, dropout still
    diverges members."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    st = DYffusionStepper(exp, params)
    x = jnp.zeros((2, 8, 16, 2))
    f = jnp.zeros((2, HORIZON + 1, 8, 16, 1))
    key = jax.random.key(0, impl="rbg")
    _, p1 = st.run_window(x, f, None, None, key, HORIZON)
    _, p2 = st.run_window(x, f, None, None, jax.random.key(0, impl="rbg"),
                          HORIZON)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert np.all(np.isfinite(np.asarray(p1)))
    # dropout masks differ per batch row -> members diverge
    assert not np.allclose(np.asarray(p1[0]), np.asarray(p1[1]))


def test_params_dtype_bf16_storage_close_to_f32():
    """bf16 weight STORAGE (params_dtype="bfloat16") must track the f32 tree:
    weights are cast at use anyway under bf16 compute, so pre-cast storage
    only rounds each weight once. Checked on a deterministic window."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    s32 = DYffusionStepper(exp, params)
    s16 = DYffusionStepper(exp, params, params_dtype="bfloat16")
    for leaf in jax.tree_util.tree_leaves(s16.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 8, 16, 2)), jnp.float32
    )
    forcing = jnp.zeros((1, HORIZON + 1, 8, 16, 1), jnp.float32)
    rng = jax.random.PRNGKey(7)
    y32, p32 = s32.run_window(x0, forcing, None, None, rng, HORIZON)
    y16, p16 = s16.run_window(x0, forcing, None, None, rng, HORIZON)
    p32, p16 = np.asarray(p32), np.asarray(p16)
    assert np.isfinite(p16).all()
    # same rng -> same dropout masks; the only difference is one bf16
    # rounding per weight (relative ~4e-3), amplified by the rollout depth
    denom = np.maximum(np.abs(p32), 1e-3)
    assert np.median(np.abs(p16 - p32) / denom) < 0.05

    # preds_dtype narrows only the EMITTED copy: the hand-off state (the
    # next-window initial condition) must stay full precision and identical
    sp = DYffusionStepper(exp, params, preds_dtype="bfloat16")
    yp, pp = sp.run_window(x0, forcing, None, None, rng, HORIZON)
    assert pp.dtype == jnp.bfloat16
    assert yp.dtype == y32.dtype
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y32), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(pp, dtype=np.float32), p32, atol=0.03, rtol=0.05
    )


def test_preds_dtype_bf16_full_product_path(tmp_path):
    """run_inference with bf16-emitted preds: aggregator reduces in f32 from
    the narrow buffer, writer upcasts after the fetch, metrics finite and
    close to the f32-emit run."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    src = dm._src

    def product(preds_dtype):
        stepper = DYffusionStepper(exp, params, preds_dtype=preds_dtype)
        agg = InferenceAggregator(list(dm.cfg.out_names),
                                  dm.grid.horizontal.area_weights())
        writer = PredictionWriter(
            str(tmp_path / f"p_{preds_dtype}.nc"), dm.cfg.out_names,
            dm.grid.horizontal.lat, dm.grid.horizontal.lon, n_ensemble=2)
        run_inference(stepper, src,
                      InferenceConfig(n_forward_steps=12,
                                      forward_steps_in_memory=8, n_ensemble=2),
                      aggregator=agg, writer=writer, verbose=False)
        writer.close()
        return agg.get_logs()

    logs16 = product("bfloat16")
    logs32 = product(None)
    assert np.isfinite(logs16["inference/avg/rmse"])
    assert logs16["inference/avg/rmse"] == pytest.approx(
        logs32["inference/avg/rmse"], rel=0.02)
    import h5py

    with h5py.File(tmp_path / "p_bfloat16.nc") as f:
        assert f["var_0"].dtype == np.float32
        assert np.isfinite(f["var_0"][()]).all()


def test_targets_dtype_bf16_halves_upload_and_matches_f32():
    """InferenceConfig.targets_dtype='bfloat16': the pre-uploaded target
    windows the device aggregator reduces against ride bf16 (half the
    upload bytes / HBM residency / per-upload client-RAM pin), the fused
    reduce upcasts on device, and metrics match the f32-target run to bf16
    truth quantization."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    src = dm._src

    def product(targets_dtype):
        stepper = DYffusionStepper(exp, params)
        agg = InferenceAggregator(list(dm.cfg.out_names),
                                  dm.grid.horizontal.area_weights())
        # n_repeats > 1 exercises the upload-cache path for the cast targets
        run_inference(stepper, src,
                      InferenceConfig(n_forward_steps=24,
                                      forward_steps_in_memory=8,
                                      n_repeats=2,
                                      targets_dtype=targets_dtype),
                      aggregator=agg, verbose=False)
        return agg.get_logs()

    logs16 = product("bfloat16")
    logs32 = product("float32")
    assert np.isfinite(logs16["inference/avg/rmse"])
    assert logs16["inference/avg/rmse"] == pytest.approx(
        logs32["inference/avg/rmse"], rel=0.02)
    assert logs16["inference/time_mean/rmse/var_0"] == pytest.approx(
        logs32["inference/time_mean/rmse/var_0"], rel=0.02)
    with pytest.raises(ValueError, match="targets_dtype"):
        run_inference(
            DYffusionStepper(exp, params), src,
            InferenceConfig(n_forward_steps=8, forward_steps_in_memory=8,
                            targets_dtype="float16"),
            aggregator=InferenceAggregator(
                list(dm.cfg.out_names), dm.grid.horizontal.area_weights()),
            verbose=False)


def test_capped_window_heuristic():
    from spherical_dyffusion_tpu.inference.loop import capped_window

    paper = dict(spatial=(180, 360), n_out=35, horizon=6)
    cfg96 = InferenceConfig(n_forward_steps=14600, forward_steps_in_memory=96)
    # single member at window 96 f32: untouched (the 10-year product path)
    assert capped_window(cfg96, 1, paper["spatial"], paper["n_out"], 4, 6) == 96
    # ensemble 4 f32: capped to the measured-fit region (<=48)
    assert capped_window(cfg96, 4, paper["spatial"], paper["n_out"], 4, 6) <= 48
    # ensemble 4 with bf16-emitted preds: window 96 estimated to fit
    assert capped_window(cfg96, 4, paper["spatial"], paper["n_out"], 2, 6) == 96
    # cap is a horizon multiple and never below one horizon
    got = capped_window(cfg96, 64, paper["spatial"], paper["n_out"], 4, 6)
    assert got >= 6 and got % 6 == 0
    # guard off: requested window wins
    cfg_off = InferenceConfig(forward_steps_in_memory=96, auto_window_cap=False)
    assert capped_window(cfg_off, 64, paper["spatial"], paper["n_out"], 4, 6) == 96
    # tiny test grids: never capped
    assert capped_window(cfg96, 8, (8, 16), 2, 4, 4) == 96


def test_upload_cache_overflow_is_reported():
    """When a repeating source produces more distinct wrapped-offset keys
    than upload_cache_entries, the overflow must be surfaced in the summary
    (each uncached upload pins host RAM through the tunnel client) rather
    than silently re-uploading."""
    HORIZON = 4
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=HORIZON,
                         n_forcing=1, batch_size=8, n_timesteps=64)
    exp, params = _train_tiny_dyffusion(dm, HORIZON)
    stepper = DYffusionStepper(exp, params)
    W = 2 * HORIZON
    names = list(dm.cfg.in_names) + list(dm.cfg.forcing_names)
    # source NOT aligned to the window -> wrapped offsets differ per cycle
    src = SyntheticTimeSeries(names, n_timesteps=3 * W + 2,
                              spatial_shape=(8, 16))
    agg = InferenceAggregator(list(dm.cfg.out_names),
                              dm.grid.horizontal.area_weights())
    summary = run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=12 * W, forward_steps_in_memory=W,
                        n_repeats=8, upload_cache_entries=1),
        aggregator=agg, verbose=False,
    )
    assert summary["upload_cache_skips"] > 0
    # with a big enough cache the same run reports zero skips
    summary2 = run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=12 * W, forward_steps_in_memory=W,
                        n_repeats=8, upload_cache_entries=64),
        aggregator=agg, verbose=False,
    )
    assert summary2["upload_cache_skips"] == 0


def test_video_writer_persists_running_stats_as_netcdf(tmp_path):
    """VideoWriter composes the VideoAggregator and flushes (time, lat, lon)
    running statistics to reduced_autoregressive_predictions.nc (reference
    VideoDataWriter, data_writer/video.py:12-73)."""
    import h5py

    from spherical_dyffusion_tpu.inference.writers import DataWriter, DataWriterConfig

    names = ["a", "b"]
    lat, lon = np.linspace(-80, 80, 8), np.linspace(0, 350, 16)
    cfg = DataWriterConfig(
        save_prediction_files=True,
        save_raw_prediction_names=["b"],
        log_extended_video_netcdfs=True,
    )
    writer = DataWriter(cfg, str(tmp_path), names, lat, lon, n_ensemble=2)
    rng = np.random.default_rng(0)
    # two sequential windows, 2 members each
    p1, p2 = rng.standard_normal((2, 2, 5, 8, 16, 2)).astype(np.float32)
    t1, t2 = rng.standard_normal((2, 5, 8, 16, 2)).astype(np.float32)
    writer.append(p1, t1)
    writer.append(p2, t2)
    writer.close()

    preds = np.concatenate([p1, p2], axis=1)
    targets = np.concatenate([t1, t2], axis=0)
    with h5py.File(tmp_path / "reduced_autoregressive_predictions.nc") as f:
        np.testing.assert_allclose(
            f["gen_mean-a"][()], preds.mean(axis=0)[..., 0], rtol=1e-6)
        np.testing.assert_allclose(
            f["target_mean-b"][()], targets[..., 1], rtol=1e-6)
        np.testing.assert_allclose(
            f["error_mean-a"][()],
            preds.mean(axis=0)[..., 0] - targets[..., 0], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            f["gen_variance-b"][()], preds[..., 1].var(axis=0, ddof=1),
            rtol=2e-5, atol=1e-6)
        assert f["gen_mean-a"].attrs["dims"] == "time,lat,lon"
    # save_raw_prediction_names subselects the prediction file
    with h5py.File(tmp_path / "autoregressive_predictions.nc") as f:
        assert "b" in f and "a" not in f
        assert f["b"].shape == (2, 10, 8, 16)


def test_time_coarsen_coarsens_targets_on_same_boundaries(tmp_path):
    """TimeCoarsen averages targets alongside predictions, buffering the
    remainder across windows (reference data_writer/time_coarsen.py)."""
    from spherical_dyffusion_tpu.inference.writers import TimeCoarsen

    class Capture:
        def __init__(self):
            self.preds, self.targets = [], []

        def append(self, p, t=None):
            self.preds.append(p)
            self.targets.append(t)

        def close(self):
            pass

    cap = Capture()
    tc = TimeCoarsen(cap, factor=3)
    rng = np.random.default_rng(1)
    preds = rng.standard_normal((1, 7, 4, 4, 1))
    targets = rng.standard_normal((7, 4, 4, 1))
    tc.append(preds[:, :4], targets[:4])   # 4 steps: one full group + 1 buffered
    tc.append(preds[:, 4:], targets[4:])   # +3 -> one more full group, 1 left
    got_p = np.concatenate(cap.preds, axis=1)
    got_t = np.concatenate(cap.targets, axis=0)
    np.testing.assert_allclose(got_p[:, 0], preds[:, :3].mean(axis=1))
    np.testing.assert_allclose(got_p[:, 1], preds[:, 3:6].mean(axis=1))
    np.testing.assert_allclose(got_t[0], targets[:3].mean(axis=0))
    np.testing.assert_allclose(got_t[1], targets[3:6].mean(axis=0))


def test_save_raw_prediction_names_requires_prediction_files():
    from spherical_dyffusion_tpu.inference.writers import DataWriterConfig

    with pytest.raises(ValueError, match="save_raw_prediction_names"):
        DataWriterConfig(save_prediction_files=False,
                         save_raw_prediction_names=["a"])
