"""ACE physics tests: ClimateData, corrector conservation math, ocean,
derived variables, single-step stepper rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.data import SigmaCoordinates, StandardNormalizer
from spherical_dyffusion_tpu.evaluation import metrics as M
from spherical_dyffusion_tpu.evaluation.metrics import spherical_area_weights
from spherical_dyffusion_tpu.inference.ace_stepper import (
    SingleStepStepper,
    SingleStepStepperConfig,
)
from spherical_dyffusion_tpu.inference.climate_data import ClimateData, natural_sort
from spherical_dyffusion_tpu.inference.corrector import Corrector, CorrectorConfig
from spherical_dyffusion_tpu.inference.derived_variables import compute_derived_quantities
from spherical_dyffusion_tpu.inference.ocean import Ocean, OceanConfig, SlabOceanConfig

K = 3
H, W = 8, 16


def sigma():
    return SigmaCoordinates(ak=np.linspace(0, 100.0, K + 1), bk=np.linspace(0, 1.0, K + 1))


def area():
    lats = np.linspace(-80, 80, H)
    return spherical_area_weights(lats, W)


def sample_data(rng=None, B=2):
    rng = rng or np.random.default_rng(0)
    d = {
        "PRESsfc": jnp.asarray(1e5 + 1e3 * rng.standard_normal((B, H, W)), jnp.float32),
        "LHTFLsfc": jnp.asarray(80 + 10 * rng.standard_normal((B, H, W)), jnp.float32),
        "PRATEsfc": jnp.asarray(np.abs(3e-5 * (1 + 0.3 * rng.standard_normal((B, H, W)))), jnp.float32),
        "tendency_of_total_water_path_due_to_advection": jnp.asarray(
            1e-5 * rng.standard_normal((B, H, W)), jnp.float32
        ),
    }
    for k in range(K):
        d[f"specific_total_water_{k}"] = jnp.asarray(
            np.abs(3e-3 * (1 + 0.1 * rng.standard_normal((B, H, W)))), jnp.float32
        )
    return d


def test_natural_sort():
    assert natural_sort(["a_11", "a_2", "a_1"]) == ["a_1", "a_2", "a_11"]


def test_climate_data_accessors():
    d = sample_data()
    cd = ClimateData(d)
    assert cd.specific_total_water.shape == (2, H, W, K)
    np.testing.assert_allclose(
        np.asarray(cd.evaporation_rate),
        np.asarray(d["LHTFLsfc"]) / M.LATENT_HEAT_OF_VAPORIZATION,
    )
    twp = cd.total_water_path(sigma())
    assert twp.shape == (2, H, W)
    assert np.isfinite(np.asarray(twp)).all()


def test_corrector_conserves_dry_air():
    rng = np.random.default_rng(1)
    inp = sample_data(rng)
    gen = sample_data(np.random.default_rng(2))
    cfg = CorrectorConfig(conserve_dry_air=True)
    corr = cfg.build(area(), sigma())
    out = corr(inp, gen)
    s = sigma()
    da_in = M.weighted_mean(
        ClimateData(inp).surface_pressure_due_to_dry_air(s), area(), dim=(-2, -1)
    )
    da_out = M.weighted_mean(
        ClimateData(out).surface_pressure_due_to_dry_air(s), area(), dim=(-2, -1)
    )
    np.testing.assert_allclose(np.asarray(da_out), np.asarray(da_in), rtol=1e-5)


def test_corrector_zero_mean_advection():
    gen = sample_data()
    corr = CorrectorConfig(zero_global_mean_moisture_advection=True).build(area(), sigma())
    out = corr(gen, gen)
    adv = M.weighted_mean(
        out["tendency_of_total_water_path_due_to_advection"], area(), dim=(-2, -1)
    )
    np.testing.assert_allclose(np.asarray(adv), 0.0, atol=1e-10)


@pytest.mark.parametrize("terms", ["precipitation", "evaporation",
                                   "advection_and_precipitation"])
def test_corrector_moisture_budget(terms):
    inp = sample_data(np.random.default_rng(3))
    gen = sample_data(np.random.default_rng(4))
    corr = CorrectorConfig(
        zero_global_mean_moisture_advection=True, moisture_budget_correction=terms
    ).build(area(), sigma())
    out = corr(inp, gen)
    s, w = sigma(), area()
    cd_out, cd_in = ClimateData(out), ClimateData(inp)
    tendency = (cd_out.total_water_path(s) - cd_in.total_water_path(s)) / M.TIMESTEP_SECONDS
    # global budget: mean(tendency) == mean(evap) - mean(precip) (+ mean(adv)=0)
    lhs = M.weighted_mean(tendency, w, dim=(-2, -1))
    rhs = M.weighted_mean(cd_out.evaporation_rate, w, dim=(-2, -1)) - M.weighted_mean(
        cd_out.precipitation_rate, w, dim=(-2, -1)
    )
    if terms.startswith("advection"):
        rhs = rhs + M.weighted_mean(
            cd_out.tendency_of_total_water_path_due_to_advection, w, dim=(-2, -1)
        )
        # columnwise closure too
        col = tendency - (
            cd_out.evaporation_rate - cd_out.precipitation_rate
            + cd_out.tendency_of_total_water_path_due_to_advection
        )
        np.testing.assert_allclose(np.asarray(col), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-4)


def test_ocean_prescribed_and_slab():
    B = 1
    gen = {"surface_temperature": jnp.full((B, H, W), 290.0)}
    mask = jnp.zeros((B, H, W)).at[:, :4].set(1.0)
    target = {"surface_temperature": jnp.full((B, H, W), 300.0), "ocean_fraction": mask}
    ocean = OceanConfig("surface_temperature", "ocean_fraction").build(
        ["surface_temperature"], ["surface_temperature"]
    )
    out = ocean(target, gen, dict(gen))
    np.testing.assert_allclose(np.asarray(out["surface_temperature"][:, :4]), 300.0)
    np.testing.assert_allclose(np.asarray(out["surface_temperature"][:, 4:]), 290.0)

    # slab ocean: d(SST)/dt = (F_net + Q) / (rho * d * c_p)
    gen2 = {
        "surface_temperature": jnp.full((B, H, W), 290.0),
        "DLWRFsfc": jnp.full((B, H, W), 400.0),
        "ULWRFsfc": jnp.full((B, H, W), 390.0),
        "DSWRFsfc": jnp.full((B, H, W), 200.0),
        "USWRFsfc": jnp.full((B, H, W), 20.0),
        "LHTFLsfc": jnp.full((B, H, W), 80.0),
        "SHTFLsfc": jnp.full((B, H, W), 10.0),
    }
    target2 = {
        "ocean_fraction": jnp.ones((B, H, W)),
        "depth": jnp.full((B, H, W), 50.0),
        "qflux": jnp.full((B, H, W), 0.0),
    }
    ocean2 = OceanConfig(
        "surface_temperature", "ocean_fraction",
        slab=SlabOceanConfig("depth", "qflux"),
    ).build(["surface_temperature"], ["surface_temperature"])
    out2 = ocean2(target2, gen2, dict(gen2))
    f_net = 400 - 390 + 200 - 20 - 80 - 10  # = 100 W/m2
    expected = 290.0 + f_net / (1000.0 * 50.0 * 4000.0) * M.TIMESTEP_SECONDS
    np.testing.assert_allclose(
        np.asarray(out2["surface_temperature"]), expected, rtol=1e-6
    )


def test_derived_variables():
    B, T = 1, 3
    rng = np.random.default_rng(0)
    data = {}
    base = sample_data(rng, B=1)
    for k, v in base.items():
        data[k] = jnp.tile(v[:, None], (1, T, 1, 1))
    out = compute_derived_quantities(data, sigma())
    assert "total_water_path" in out
    assert "surface_pressure_due_to_dry_air" in out
    assert "total_water_path_budget_residual" in out
    assert out["total_water_path"].shape == (B, T, H, W)
    # constant-in-time data -> residual driven by -(E - P + adv) for t>0, 0 at t=0
    np.testing.assert_allclose(np.asarray(out["total_water_path_budget_residual"][:, 0]), 0.0)


def test_single_step_stepper_rollout():
    """Identity-ish model: next step = current out channels. With prescribed
    SST + dry-air conservation active, the rollout stays stable and the
    physics paths execute inside jit."""
    in_names = ["PRESsfc", "surface_temperature", "specific_total_water_0",
                "specific_total_water_1", "specific_total_water_2", "DSWRFtoa"]
    out_names = in_names[:-1]
    names_all = in_names + ["ocean_fraction"]
    rng = np.random.default_rng(0)
    B, T = 2, 5
    data = {
        n: np.abs(rng.standard_normal((B, T + 1, H, W)).astype(np.float32)) + 1.0
        for n in names_all
    }
    data["ocean_fraction"] = (data["ocean_fraction"] > 1.5).astype(np.float32)
    norm = StandardNormalizer.from_dicts(
        {n: 1.0 for n in names_all}, {n: 0.5 for n in names_all}, names_all
    )
    cfg = SingleStepStepperConfig(
        in_names=in_names, out_names=out_names, loss="l2",
        corrector=CorrectorConfig(conserve_dry_air=True),
        ocean=OceanConfig("surface_temperature", "ocean_fraction"),
    )

    def model_fn(params, x_norm):
        return x_norm[..., : len(out_names)]  # persistence forecast

    stepper = SingleStepStepper(cfg, model_fn, params={}, normalizer=norm,
                                area_weights=area(), sigma=sigma())
    stepped = stepper.run_on_batch(data, n_forward_steps=T)
    assert stepped.gen_data["PRESsfc"].shape == (B, T + 1, H, W)
    assert np.isfinite(np.asarray(stepped.metrics["loss"]))
    for v in stepped.gen_data.values():
        assert np.isfinite(np.asarray(v)).all()
    # prescribed SST: generated surface_temperature equals target in ocean region
    mask = data["ocean_fraction"][:, 1] == 1
    gen_sst = np.asarray(stepped.gen_data["surface_temperature"])[:, 1][mask]
    tgt_sst = data["surface_temperature"][:, 1][mask]
    np.testing.assert_allclose(gen_sst, tgt_sst, rtol=1e-5)


def test_run_ace_inference_windowed_matches_single_window(tmp_path):
    """The windowed ACE driver with state carry-over must reproduce the
    single-window rollout exactly (corrector + prescribed ocean active), and
    feed aggregator/writer with finite outputs."""
    from spherical_dyffusion_tpu.data.datasets import SyntheticTimeSeries
    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator
    from spherical_dyffusion_tpu.inference import (
        PredictionWriter,
        run_ace_inference,
    )

    in_names = ["PRESsfc", "surface_temperature", "specific_total_water_0",
                "specific_total_water_1", "specific_total_water_2", "DSWRFtoa"]
    out_names = in_names[:-1]
    names_all = in_names + ["ocean_fraction"]
    norm = StandardNormalizer.from_dicts(
        {n: 1.0 for n in names_all}, {n: 0.5 for n in names_all}, names_all
    )
    cfg = SingleStepStepperConfig(
        in_names=in_names, out_names=out_names, loss="l2",
        corrector=CorrectorConfig(conserve_dry_air=True),
        ocean=OceanConfig("surface_temperature", "ocean_fraction"),
    )

    def model_fn(params, x_norm):
        return 0.98 * x_norm[..., : len(out_names)]

    stepper = SingleStepStepper(cfg, model_fn, params={}, normalizer=norm,
                                area_weights=area(), sigma=sigma())
    src = SyntheticTimeSeries(names_all, n_timesteps=13, spatial_shape=(H, W))

    T = 12
    # reference run: one window covering everything
    data_full = {n: src.read_window(0, T + 1, [n])[n][None] for n in names_all}
    full = stepper.run_on_batch(data_full, T)

    # windowed run: 3 windows of 4, state carried across
    agg = InferenceAggregator(
        out_names,
        jnp.asarray(area()),
        log_zonal_mean_images=False,
    )
    writer = PredictionWriter(str(tmp_path / "ace.nc"), out_names,
                              np.linspace(-80, 80, H), np.linspace(0, 360, W),
                              n_ensemble=1, save_targets=True)
    summary = run_ace_inference(stepper, src, n_forward_steps=T,
                                forward_steps_in_memory=4,
                                aggregator=agg, writer=writer, verbose=False)
    writer.close()
    assert summary["n_forward_steps"] == T
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])

    import h5py

    with h5py.File(tmp_path / "ace.nc") as f:
        got = f["PRESsfc"][0]  # (T, H, W)
        want = np.asarray(full.gen_data["PRESsfc"])[0, 1:]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def test_run_ace_inference_with_derived_diagnostics():
    """derived=True scores registered diagnostics (dry-air pressure, water
    path) alongside prognostics; names from ace_scored_names."""
    from spherical_dyffusion_tpu.data.datasets import SyntheticTimeSeries
    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator
    from spherical_dyffusion_tpu.inference import (
        ace_scored_names,
        run_ace_inference,
    )

    in_names = ["PRESsfc", "specific_total_water_0", "specific_total_water_1",
                "specific_total_water_2", "DSWRFtoa"]
    out_names = in_names[:-1]
    norm = StandardNormalizer.from_dicts(
        {n: 1.0 for n in in_names}, {n: 0.5 for n in in_names}, in_names
    )
    cfg = SingleStepStepperConfig(in_names=in_names, out_names=out_names)
    stepper = SingleStepStepper(cfg, lambda p, x: 0.95 * x[..., :4], {},
                                norm, area_weights=area(), sigma=sigma())
    src = SyntheticTimeSeries(in_names, n_timesteps=9, spatial_shape=(H, W))
    scored = ace_scored_names(stepper, src, derived=True)
    assert "surface_pressure_due_to_dry_air" in scored
    agg = InferenceAggregator(scored, jnp.asarray(area()),
                              log_zonal_mean_images=False)
    summary = run_ace_inference(stepper, src, n_forward_steps=8,
                                forward_steps_in_memory=4, aggregator=agg,
                                derived=True, verbose=False)
    assert summary["n_forward_steps"] == 8
    logs = agg.get_logs()
    key = "inference/time_mean/rmse/surface_pressure_due_to_dry_air"
    assert np.isfinite(logs[key])
