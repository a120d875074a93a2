"""Tests for the small parity components added in round 2: winds geometry,
dynamic histograms, per-member time-mean metrics, per-timestep inference
logs, and the legacy random/interpolation multistep loader strategies."""

import numpy as np
import pytest


def test_winds_uv_to_xyz_preserves_magnitude_and_known_cases():
    from spherical_dyffusion_tpu.utils.winds import u_v_to_x_y_z_wind

    rng = np.random.default_rng(0)
    u = rng.standard_normal((5, 7)).astype(np.float32)
    v = rng.standard_normal((5, 7)).astype(np.float32)
    lat = rng.uniform(-89, 89, (5, 7)).astype(np.float32)
    lon = rng.uniform(0, 360, (5, 7)).astype(np.float32)
    wx, wy, wz = u_v_to_x_y_z_wind(u, v, lat, lon)
    # (east, north) is an orthonormal local basis: |w| = sqrt(u^2 + v^2)
    np.testing.assert_allclose(
        np.asarray(wx**2 + wy**2 + wz**2), u**2 + v**2, rtol=1e-5
    )
    # at (lat=0, lon=0): east = +y, north = +z
    wx, wy, wz = u_v_to_x_y_z_wind(2.0, 3.0, 0.0, 0.0)
    np.testing.assert_allclose([float(wx), float(wy), float(wz)], [0.0, 2.0, 3.0],
                               atol=1e-6)
    # at (lat=0, lon=90E): east = -x, north = +z
    wx, wy, wz = u_v_to_x_y_z_wind(2.0, 3.0, 0.0, 90.0)
    np.testing.assert_allclose([float(wx), float(wy), float(wz)], [-2.0, 0.0, 3.0],
                               atol=1e-5)


def test_lon_lat_xyz_roundtrip_and_pole_guard():
    from spherical_dyffusion_tpu.utils.winds import lon_lat_to_xyz, xyz_to_lon_lat

    lon = np.asarray([0.0, 90.0, 123.4, 359.0, 45.0])
    lat = np.asarray([0.0, 45.0, -67.8, 12.0, -45.0])
    x, y, z = lon_lat_to_xyz(lon, lat)
    lon2, lat2 = xyz_to_lon_lat(x, y, z)
    np.testing.assert_allclose(np.asarray(lon2), lon, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-4)
    lon_p, lat_p = xyz_to_lon_lat(np.asarray(0.0), np.asarray(0.0), np.asarray(1.0))
    assert float(lon_p) == 0.0 and abs(float(lat_p) - 90.0) < 1e-4


def test_dynamic_histogram_rescales_and_never_drops():
    from spherical_dyffusion_tpu.inference.writers import DynamicHistogram

    h = DynamicHistogram(n_bins=100)
    h.add(np.linspace(0.0, 1.0, 500))
    assert h.counts.sum() == 500
    # out-of-range on both sides: bins double, counts merge, nothing dropped
    h.add(np.asarray([-3.0, 5.0, 0.5]))
    assert h.counts.sum() == 503
    assert h.bin_edges[0] <= -3.0 and h.bin_edges[-1] >= 5.0
    with pytest.raises(ValueError):
        DynamicHistogram(n_bins=301)


def test_histogram_writer_dynamic_range():
    from spherical_dyffusion_tpu.inference.writers import HistogramWriter

    w = HistogramWriter(["a"], n_bins=50)
    w.append(np.zeros((1, 2, 4, 4, 1)) + 0.5)
    w.append(np.zeros((1, 2, 4, 4, 1)) + 100.0)  # would be dropped pre-fix
    counts, edges = w.histogram("a")
    assert counts.sum() == 64
    assert edges[-1] >= 100.0


def test_time_mean_aggregator_member_avg_metrics():
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.evaluation.aggregators import TimeMeanAggregator

    rng = np.random.default_rng(1)
    H, W, C, E, T = 4, 8, 2, 3, 5
    w = jnp.ones((H, W))
    agg = TimeMeanAggregator(["a", "b"], w)
    target = rng.standard_normal((T, H, W, C))
    preds = target[None] + rng.standard_normal((E, T, H, W, C))
    agg.record(preds, target)
    logs = agg.get_logs("tm")
    assert "tm/rmse/a" in logs and "tm/rmse_member_avg/a" in logs
    # per-member RMSE >= ensemble-mean RMSE (Jensen)
    assert logs["tm/rmse_member_avg/a"] >= logs["tm/rmse/a"]
    # single-member: no member_avg keys
    agg1 = TimeMeanAggregator(["a", "b"], w)
    agg1.record(preds[:1], target)
    assert not any("member_avg" in k for k in agg1.get_logs())


def test_inference_aggregator_per_timestep_logs():
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator

    rng = np.random.default_rng(2)
    H, W, C, E = 4, 8, 2, 2
    agg = InferenceAggregator(["a", "b"], jnp.ones((H, W)),
                              log_zonal_mean_images=False)
    for start in (0, 3):
        t = rng.standard_normal((3, H, W, C))
        agg.record_batch(t[None] + 0.1 * rng.standard_normal((E, 3, H, W, C)), t,
                         start_step=start)
    logs = agg.get_inference_logs("inference")
    assert len(logs) == 6
    assert [e["timestep"] for e in logs] == [0, 1, 2, 3, 4, 5]
    assert "inference/rmse/a" in logs[0] and "inference/avg/crps" in logs[0]
    # aggregate time-mean metrics attach to the final entry only
    assert any(k.startswith("inference/time_mean/") for k in logs[-1])
    assert not any(k.startswith("inference/time_mean/") for k in logs[0])


def test_windowed_dataset_random_and_interpolation_strategies():
    from spherical_dyffusion_tpu.data.datasets import (
        SyntheticTimeSeries,
        WindowedDataset,
    )

    names = ["v0", "v1"]
    src = SyntheticTimeSeries(names, n_timesteps=40, spatial_shape=(4, 8), seed=0)
    horizon = 6
    full = WindowedDataset(src, names, horizon=horizon, window=1)
    rnd = WindowedDataset(src, names, horizon=horizon, window=1, strategy="random",
                          seed=5)
    itp = WindowedDataset(src, names, horizon=horizon, window=1,
                          strategy="interpolation", seed=5)
    i = 3
    ref = full[i]["dynamics"]  # (1+horizon, H, W, C)
    s_r = rnd[i]
    t_r = int(s_r["random_timestep"])
    assert 1 <= t_r <= horizon
    assert s_r["dynamics"].shape[0] == 2  # window frame + random frame
    np.testing.assert_allclose(s_r["dynamics"][0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(s_r["dynamics"][1], ref[t_r], rtol=1e-6)
    s_i = itp[i]
    t_i = int(s_i["random_timestep"])
    assert 1 <= t_i <= horizon - 1
    assert s_i["dynamics"].shape[0] == 3  # window + random + last
    np.testing.assert_allclose(s_i["dynamics"][1], ref[t_i], rtol=1e-6)
    np.testing.assert_allclose(s_i["dynamics"][2], ref[horizon], rtol=1e-6)
    # deterministic per (seed, index)
    assert int(rnd[i]["random_timestep"]) == t_r


def _tiny_dyffusion_exp():
    import jax

    from spherical_dyffusion_tpu.data import DebugDataModule
    from spherical_dyffusion_tpu.diffusion import DYffusionConfig
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        DYffusionForecastingExperiment,
        ExperimentConfig,
        InterpolationExperiment,
        Trainer,
        TrainerConfig,
    )

    dm = DebugDataModule(channels=2, height=8, width=16, horizon=3,
                         batch_size=2, n_timesteps=16)
    mk = lambda lo, hi: SFNO(SFNOConfig(  # noqa: E731
        img_shape=(8, 16), in_chans=4, out_chans=2, embed_dim=8, num_layers=1,
        with_time_emb=True, min_time=lo, max_time=hi))
    interp = InterpolationExperiment(
        mk(1, 2), ExperimentConfig(horizon=3, enable_inference_dropout=True),
        dm.in_packer, dm.out_packer, dm.normalizer)
    batch = next(iter(dm.train_batches(seed=0)))
    tr = Trainer(interp, dm, TrainerConfig(epochs=0, steps_per_epoch=1))
    dynn = dm.normalizer.normalize(np.asarray(batch["dynamics"][:1]))
    import jax.numpy as jnp

    ip = tr._init_params(jax.random.PRNGKey(0), jnp.asarray(dynn), batch)
    fexp = DYffusionForecastingExperiment(
        mk(0, 2), interp, jax.device_get(ip),
        DYffusionConfig(timesteps=3, forward_conditioning="data"),
        ExperimentConfig(horizon=3, prediction_inputs_noise=0.1),
        dm.in_packer, dm.out_packer, dm.normalizer)
    tr_fc = Trainer(fexp, dm, TrainerConfig(epochs=0, steps_per_epoch=1))
    fc = tr_fc._init_params(jax.random.PRNGKey(1), jnp.asarray(dynn), batch)
    return dm, fexp, jax.device_get(fc)


def test_prediction_inputs_noise_creates_rollout_spread():
    import jax
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.inference import DYffusionStepper

    dm, fexp, fc = _tiny_dyffusion_exp()
    x0 = jnp.zeros((2, 8, 16, 2))  # two identical member rows
    rng = jax.random.PRNGKey(3)
    # noise from the experiment config (0.1): member rows must diverge
    stepper = DYffusionStepper(fexp, fc)
    assert stepper.inputs_noise == 0.1
    _, preds = stepper.run_window(x0, None, None, None, rng, 3)
    assert float(jnp.max(jnp.abs(preds[0] - preds[1]))) > 0.0
    # explicit zero override: identical rows stay identical
    stepper0 = DYffusionStepper(fexp, fc, inputs_noise=0.0)
    _, preds0 = stepper0.run_window(x0, None, None, None, rng, 3)
    np.testing.assert_array_equal(np.asarray(preds0[0]), np.asarray(preds0[1]))


def test_prediction_inputs_noise_in_trainer_eval():
    import jax

    from spherical_dyffusion_tpu.training import Trainer, TrainerConfig

    dm, fexp, fc = _tiny_dyffusion_exp()
    tr = Trainer(fexp, dm, TrainerConfig(epochs=0, steps_per_epoch=1,
                                         num_predictions=3))
    eval_step = tr._get_eval_step()
    batch = next(iter(dm.val_batches(horizon=3)))
    import jax.numpy as jnp

    w = jnp.asarray(dm.grid.horizontal.area_weights())
    table = eval_step(fc, fexp.aux_params, jnp.asarray(batch["dynamics"]),
                      None, jax.random.PRNGKey(0), w)
    # with inputs noise the 3-member ensemble has nonzero spread -> SSR > 0
    assert float(table["ssr"]) > 0.0


def test_batched_welford_matches_loop():
    from spherical_dyffusion_tpu.evaluation.video import _RunningMoments

    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((3, 4, 5, 6, 2)) for _ in range(3)]
    rm = _RunningMoments()
    for x in xs:
        rm.update(0, x)
    allx = np.concatenate(xs, 0).astype(np.float64)
    np.testing.assert_allclose(rm.mean, allx.mean(0), atol=1e-10)
    np.testing.assert_allclose(rm.variance, allx.var(0, ddof=1), atol=1e-10)
    # disjoint + overlapping step ranges
    rm2 = _RunningMoments()
    rm2.update(0, xs[0])
    rm2.update(4, xs[1])
    assert rm2.mean.shape[0] == 8


def test_normed_metric_variants():
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.data.normalization import StandardNormalizer
    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator

    rng = np.random.default_rng(3)
    names = ["a", "b"]
    norm = StandardNormalizer.from_dicts({"a": 1.0, "b": -2.0},
                                         {"a": 4.0, "b": 0.5}, names)
    agg = InferenceAggregator(names, jnp.ones((4, 8)), normalizer=norm,
                              log_zonal_mean_images=False)
    t = rng.standard_normal((3, 4, 8, 2))
    p = t[None] + rng.standard_normal((2, 3, 4, 8, 2))
    agg.record_batch(p, t, 0)
    logs = agg.get_logs("inf")
    assert "inf/rmse/a" in logs and "inf/rmse_normed/a" in logs
    # normed rmse of channel a must be raw rmse / std_a (pure rescale)
    series = agg.reduced.series()
    np.testing.assert_allclose(series["rmse_normed"][:, 0],
                               series["rmse"][:, 0] / 4.0, rtol=1e-5)
    np.testing.assert_allclose(series["rmse_normed"][:, 1],
                               series["rmse"][:, 1] / 0.5, rtol=1e-5)


def test_time_mean_running_mean_matches_exact_and_stays_bounded():
    """Round-3 fix: the time-mean aggregator accumulates running MEANS (Chan
    update) instead of raw f32 sums, so large-magnitude fields over long
    rollouts don't drown O(1) bias metrics in rounding error."""
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.evaluation.aggregators import TimeMeanAggregator

    rng = np.random.default_rng(7)
    H, W, C = 4, 8, 1
    w = jnp.ones((H, W))
    # surface-pressure-like magnitude with a tiny known bias
    base = 1.0e5
    bias = 2.0  # Pa
    agg = TimeMeanAggregator(["ps"], w)
    exact_p, exact_t, n = 0.0, 0.0, 0
    for k in range(40):  # uneven window lengths
        T = 3 if k % 2 else 5
        t = base + rng.standard_normal((T, H, W, C)).astype(np.float32)
        p = t + bias
        agg.record(p, t)
        exact_p += np.float64(p).sum(0)
        exact_t += np.float64(t).sum(0)
        n += T
    logs = agg.get_logs("tm")
    # the running mean recovers the small bias to <2% despite |field| ~ 1e5
    # (raw f32 sums reach ~1.6e7 here; at 1e4+ steps they'd reach ~1e9
    # where ulp ~ 128 and the bias would be unrecoverable)
    assert abs(logs["tm/bias/ps"] - bias) < 0.05 * bias
    # and it matches the exact f64 mean closely
    np.testing.assert_allclose(
        np.asarray(agg.maps[0]), (exact_p / n), rtol=1e-6)


def test_sparse_interpolation_strategy_trains_on_loader_frames():
    """Round-3 fix: the sparse 'interpolation' loader's random_timestep is
    consumed by InterpolationExperiment.train_loss (previously silently
    ignored, training on clamped out-of-bounds frames)."""
    import jax
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.data.datasets import (
        SyntheticTimeSeries,
        WindowedDataset,
    )
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        ExperimentConfig,
        InterpolationExperiment,
    )
    from spherical_dyffusion_tpu.data.normalization import StandardNormalizer
    from spherical_dyffusion_tpu.data.packer import Packer

    names = ["v0", "v1"]
    src = SyntheticTimeSeries(names, n_timesteps=30, spatial_shape=(8, 16), seed=0)
    horizon = 4
    sparse = WindowedDataset(src, names, horizon=horizon, window=1,
                             strategy="interpolation", seed=3)
    packer = Packer(names)
    norm = StandardNormalizer.from_dicts({n: 0.0 for n in names},
                                         {n: 1.0 for n in names}, names)
    exp = InterpolationExperiment(
        SFNO(SFNOConfig(img_shape=(8, 16), in_chans=4, out_chans=2,
                        embed_dim=8, num_layers=1, with_time_emb=True,
                        min_time=1, max_time=horizon - 1)),
        ExperimentConfig(horizon=horizon), packer, packer, norm)
    s0, s1 = sparse[0], sparse[1]
    dyn = jnp.asarray(np.stack([s0["dynamics"], s1["dynamics"]]))
    rt = jnp.asarray([s0["random_timestep"], s1["random_timestep"]], jnp.int32)
    params = jax.jit(
        lambda r: exp.model.init(
            r, exp.get_inputs_from_dynamics(dyn),
            time=jnp.ones((2,), jnp.float32))
    )(jax.random.PRNGKey(0))
    loss, m = jax.jit(
        lambda p, d, r, t: exp.train_loss(p, d, r, random_timestep=t)
    )(params, dyn, jax.random.PRNGKey(1), rt)
    assert np.isfinite(float(loss))
    # shape mismatch fails loudly instead of clamping out-of-bounds
    with pytest.raises(ValueError, match="sparse"):
        exp.train_loss(params, dyn, jax.random.PRNGKey(1))  # no rt, 3 frames
    full = jnp.asarray(np.zeros((2, 1 + horizon, 8, 16, 2), np.float32))
    with pytest.raises(ValueError, match="random_timestep"):
        exp.train_loss(params, full, jax.random.PRNGKey(1),
                       random_timestep=jnp.ones((2,), jnp.int32))


def test_forecasting_experiments_reject_sparse_strategies():
    import jax.numpy as jnp
    import jax

    dm, fexp, fc = _tiny_dyffusion_exp()
    dyn = jnp.zeros((2, 3, 8, 16, 2))
    with pytest.raises(ValueError, match="sparse"):
        fexp.train_loss(fc, dyn, jax.random.PRNGKey(0),
                        random_timestep=jnp.ones((2,), jnp.int32))


def test_inputs_noise_applied_once_per_rollout_not_per_window():
    """Round-3 fix (advisor): prediction_inputs_noise is an initial-condition
    perturbation; continuation windows must NOT re-inject it, so ensemble
    spread is independent of forward_steps_in_memory."""
    import jax
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.inference import DYffusionStepper

    dm, fexp, fc = _tiny_dyffusion_exp()
    x0 = jnp.zeros((2, 8, 16, 2))
    stepper = DYffusionStepper(fexp, fc, inputs_noise=0.3)
    rng = jax.random.PRNGKey(5)
    # continuation window with identical rows: no injection -> rows identical
    _, preds = stepper.run_window(x0, None, None, None, rng, 3,
                                  apply_inputs_noise=False)
    np.testing.assert_array_equal(np.asarray(preds[0]), np.asarray(preds[1]))
    # first window: injection -> rows diverge
    _, preds1 = stepper.run_window(x0, None, None, None, rng, 3,
                                   apply_inputs_noise=True)
    assert float(jnp.max(jnp.abs(preds1[0] - preds1[1]))) > 0.0
