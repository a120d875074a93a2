"""Benchmark: simulated-years/day for the 10-year FV3GFS emulation rollout.

Mirrors the reference's throughput metric (total_steps_per_second,
src/ace_inference/inference/inference.py:294-298) on the paper configuration:
SFNO embed_dim 256 / 8 layers / dhconv (configs/model/sfno.yaml), DYffusion
horizon 6, 35 predicted channels + 2 forcings at 180x360, prescribed-SST,
windowed autoregressive rollout (ckpts_from_huggingface_10years.yaml:
14,600 6-hourly steps = 10 years).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 25 simulated-years/day on TPU v5e (BASELINE.md).

Env overrides: BENCH_STEPS (total steps to time), BENCH_WINDOW, BENCH_EMBED,
BENCH_LAYERS, BENCH_ENSEMBLE.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from spherical_dyffusion_tpu.data import Packer, StandardNormalizer, SyntheticTimeSeries
from spherical_dyffusion_tpu.diffusion import DYffusionConfig
from spherical_dyffusion_tpu.inference import DYffusionStepper, PrescriberConfig
from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
from spherical_dyffusion_tpu.training import (
    DYffusionForecastingExperiment,
    ExperimentConfig,
    InterpolationExperiment,
)

STEPS_PER_SIM_YEAR = 1460  # 6-hourly steps
BASELINE_SIM_YEARS_PER_DAY = 25.0


def build(embed=256, layers=8, dtype="float32", fold=False, use_pallas=False):
    H, W = 180, 360
    horizon = 6
    in_names = [f"v{i}" for i in range(35)]
    in_names[1] = "surface_temperature"
    forcing_names = ["DSWRFtoa", "HGTsfc"]
    C, CF = len(in_names), len(forcing_names)
    norm = StandardNormalizer.from_dicts(
        {n: 0.0 for n in in_names}, {n: 1.0 for n in in_names}, in_names
    )
    fnorm = StandardNormalizer.from_dicts(
        {n: 0.0 for n in forcing_names}, {n: 1.0 for n in forcing_names}, forcing_names
    )
    in_packer, out_packer = Packer(in_names), Packer(in_names)

    icfg = ExperimentConfig(horizon=horizon, window=1, enable_inference_dropout=True)
    imodel = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=2 * C + CF, out_chans=C, embed_dim=embed,
        num_layers=layers, operator_type="dhconv", with_time_emb=True,
        dropout_mlp=0.1, drop_path_rate=0.1, min_time=1, max_time=horizon - 1,
        data_grid="equiangular", compute_dtype=dtype, sht_matmul_dtype=dtype,
        sht_fold_symmetry=fold, use_pallas=use_pallas,
    ))
    interp = InterpolationExperiment(imodel, icfg, in_packer, out_packer, norm)

    fmodel = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=C + CF, out_chans=C, embed_dim=embed,
        num_layers=layers, operator_type="dhconv", with_time_emb=True,
        min_time=0, max_time=horizon - 1, data_grid="equiangular",
        compute_dtype=dtype, sht_matmul_dtype=dtype, sht_fold_symmetry=fold,
        use_pallas=use_pallas,
    ))
    dcfg = DYffusionConfig(timesteps=horizon, forward_conditioning="none",
                           time_encoding="dynamics")

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, C))
    cond_i = jnp.zeros((1, H, W, CF))
    ip_params = jax.jit(lambda r: imodel.init(
        r, jnp.concatenate([x, x], -1), time=jnp.ones((1,)), static_condition=cond_i
    ))(rng)
    fc_params = jax.jit(lambda r: fmodel.init(
        r, x, time=jnp.zeros((1,)), static_condition=cond_i
    ))(rng)

    exp = DYffusionForecastingExperiment(
        fmodel, interp, ip_params, dcfg,
        ExperimentConfig(horizon=horizon), in_packer, out_packer, norm,
        forcing_names=forcing_names, forcing_normalizer=fnorm,
    )
    prescriber = PrescriberConfig("surface_temperature", "ocean_fraction", 1).build(in_names)
    stepper = DYffusionStepper(exp, fc_params, prescriber=prescriber)
    return stepper, in_names, forcing_names


def product_bench(stepper, src, window, total_steps, n_ensemble, embed, layers):
    """Time the REAL inference product path (run_inference with aggregator and
    netCDF writer enabled), not just raw device windows."""
    import tempfile

    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator
    from spherical_dyffusion_tpu.inference import (
        DataWriter,
        DataWriterConfig,
        InferenceConfig,
        run_inference,
    )

    names = list(stepper.exp.out_packer.names)
    n_steps = max(2 * window, total_steps)
    icfg = InferenceConfig(
        n_forward_steps=n_steps, forward_steps_in_memory=window,
        n_ensemble=n_ensemble, n_repeats=n_steps // window + 2,
    )
    agg = InferenceAggregator(names, src.horizontal.area_weights(),
                              log_zonal_mean_images=True)
    # warmup: compile the window program AND the aggregator's reduce programs
    # outside the timed run
    run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=window, forward_steps_in_memory=window,
                        n_ensemble=n_ensemble, n_repeats=3),
        aggregator=InferenceAggregator(names, src.horizontal.area_weights(),
                                       log_zonal_mean_images=True),
        mask_name="ocean_fraction", verbose=False,
    )
    # BENCH_WRITER=0 drops the netCDF writer: with it, every window's full
    # prediction tensor (~435MB at w=48) must cross the axon HTTP tunnel —
    # a tunnel-bandwidth ceiling, not a pipeline defect (PCIe-attached hosts
    # fetch the same bytes in ~0.1s)
    with_writer = os.environ.get("BENCH_WRITER", "1") == "1"
    with tempfile.TemporaryDirectory() as td:
        writer = DataWriter(
            DataWriterConfig(save_prediction_files=True),
            td, names, src.horizontal.lat, src.horizontal.lon, n_ensemble,
        ) if with_writer else None
        summary = run_inference(stepper, src, icfg, aggregator=agg,
                                writer=writer, mask_name="ocean_fraction",
                                verbose=False)
        if writer is not None:
            writer.close()
    dev = summary["duration_s"] - summary["time/data_loading"] - summary[
        "time/writer_and_aggregator"]
    sps = summary["total_steps_per_second"]
    sim_years_per_day = sps * 86400.0 / STEPS_PER_SIM_YEAR
    print(json.dumps({
        "metric": "simulated_years_per_day",
        "value": round(sim_years_per_day, 3),
        "unit": "sim-years/day (PRODUCT bench: run_inference w/ aggregator+writer, "
                f"embed{embed}x{layers}, window {window}, ensemble {n_ensemble}; "
                f"host fractions: data "
                f"{summary['time/data_loading']/summary['duration_s']:.1%}, "
                f"writer+agg "
                f"{summary['time/writer_and_aggregator']/summary['duration_s']:.1%}, "
                f"device+dispatch {dev/summary['duration_s']:.1%})",
        "vs_baseline": round(sim_years_per_day / BASELINE_SIM_YEARS_PER_DAY, 3),
    }))


def main():
    embed = int(os.environ.get("BENCH_EMBED", 256))
    layers = int(os.environ.get("BENCH_LAYERS", 8))
    window = int(os.environ.get("BENCH_WINDOW", 96))
    total_steps = int(os.environ.get("BENCH_STEPS", 4 * window))
    n_ensemble = int(os.environ.get("BENCH_ENSEMBLE", 1))
    # float32 arrays + XLA default matmul precision = bf16 MXU passes with
    # f32 accumulation and no explicit convert ops — ~2x faster than manually
    # casting activations to bf16 (measured: 954 vs 494 sim-yr/day)
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    fold = os.environ.get("BENCH_FOLD", "0") == "1"
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"

    stepper, in_names, forcing_names = build(embed, layers, dtype, fold, use_pallas)
    names = in_names + forcing_names + ["ocean_fraction"]
    src = SyntheticTimeSeries(names, n_timesteps=window + 1, spatial_shape=(180, 360))

    if os.environ.get("BENCH_PRODUCT", "0") == "1":
        # product bench: the full run_inference path with aggregator + writer
        # consuming every window (100MB/window host drains) — proves the
        # deferred-drain + prefetch pipeline overlaps host work with device
        # compute (time/* fractions in the output)
        return product_bench(stepper, src, window, total_steps, n_ensemble,
                             embed, layers)

    # drive windows directly and take the MEDIAN window time: the shared TPU
    # tunnel has multi-x run-to-run variance, so mean-over-one-run is noise
    import jax.numpy as jnp
    import jax.random as jr

    f_raw = np.stack([src.read_window(0, window + 1, forcing_names)[n]
                      for n in forcing_names], axis=-1)[None]
    forcing = jnp.tile(jnp.asarray(f_raw, jnp.float32), (n_ensemble, 1, 1, 1, 1))
    sst = jnp.tile(jnp.asarray(
        src.read_window(0, window + 1, ["surface_temperature"])["surface_temperature"]
    )[None], (n_ensemble, 1, 1, 1))
    mask = jnp.tile(jnp.asarray(
        src.read_window(0, 1, ["ocean_fraction"])["ocean_fraction"][0])[None],
        (n_ensemble, 1, 1))
    x = jnp.zeros((n_ensemble, 180, 360, 35), jnp.float32)

    # the remote compile service occasionally 500s; retry before giving up
    compile_s = None
    for attempt in range(3):
        try:
            t0 = time.time()
            x, _ = stepper.run_window(x, forcing, sst, mask, jr.PRNGKey(0), window)
            jax.block_until_ready(x)
            compile_s = time.time() - t0
            break
        except Exception as e:
            print(f"[bench] warmup attempt {attempt} failed: {str(e)[:200]}",
                  flush=True)
            time.sleep(10)
    if compile_s is None:
        raise RuntimeError("bench warmup failed after retries")

    n_windows = max(2, total_steps // window)
    times = []
    for i in range(n_windows):
        t0 = time.time()
        x, _ = stepper.run_window(x, forcing, sst, mask, jr.PRNGKey(i + 1), window)
        jax.block_until_ready(x)
        times.append(time.time() - t0)
    med = float(np.median(times))
    sps = window * n_ensemble / med
    sim_years_per_day = sps * 86400.0 / STEPS_PER_SIM_YEAR
    print(json.dumps({
        "metric": "simulated_years_per_day",
        "value": round(sim_years_per_day, 3),
        "unit": "sim-years/day (10-yr FV3GFS rollout config, SFNO-DYffusion "
                f"embed{embed}x{layers} {dtype}, window {window}, ensemble {n_ensemble}; "
                f"median-window steps/s {sps:.3f}; window times "
                f"{[round(t,1) for t in times]}; compile {compile_s:.0f}s)",
        "vs_baseline": round(sim_years_per_day / BASELINE_SIM_YEARS_PER_DAY, 3),
    }))


if __name__ == "__main__":
    main()
