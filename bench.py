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
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
# BENCH_PLATFORM=cpu for smoke runs off the TPU (env JAX_PLATFORMS is baked
# by sitecustomize; only the config update works)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def _probe_device(timeout_s: int = 120) -> bool:
    """Fail fast when the axon tunnel is dead: backend init then HANGS
    indefinitely (observed: connection refused on 127.0.0.1:8093 after the
    remote service dies), which would turn the whole bench into a silent
    timeout. Probe in a subprocess with a hard deadline and emit a parseable
    zero-result instead. Skipped for CPU runs.

    The tunnel flaps (observed outages of minutes-to-hours): ``BENCH_WAIT``
    (seconds, default 600) keeps re-probing until the deadline so a bench
    launched during a brief outage still runs instead of recording zero.
    Set BENCH_WAIT=0 for the old single-probe fail-fast behavior."""
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        return True
    import subprocess

    wait_budget = float(os.environ.get("BENCH_WAIT", "600"))
    start = time.time()
    attempt = 0
    last_err = ""
    while True:
        attempt += 1
        try:
            # the baked platform list is "axon,cpu": when the tunnel fails
            # FAST (e.g. "No jellyfish device found") jax silently falls back
            # to CPU and a bare jit probe exits 0 — require a non-CPU backend
            # so that outage mode is detected too, not just the hang mode
            r = subprocess.run(
                ["python", "-c",
                 "import jax, jax.numpy as jnp; "
                 "assert jax.default_backend() != 'cpu', jax.default_backend(); "
                 "jax.jit(lambda a: (a*2).sum())(jnp.ones((8,8)))"
                 ".block_until_ready()"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
            # surface the failure: a persistent import/venv error is NOT a
            # tunnel flap and should be diagnosable from the log/zero-result
            tail = r.stderr.decode(errors="replace").strip().splitlines()
            last_err = tail[-1][-300:] if tail else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {timeout_s}s (tunnel hang mode)"
        elapsed = time.time() - start
        if elapsed + 60 > wait_budget:
            break
        print(f"[bench] tunnel probe {attempt} failed ({elapsed:.0f}s elapsed) "
              f"[{last_err}]; retrying until BENCH_WAIT={wait_budget:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(60)
    print(json.dumps({
        "metric": "simulated_years_per_day", "value": 0.0,
        "unit": "TPU tunnel unreachable (device probe hung/failed; see "
                ".claude/skills/verify/SKILL.md 'Tunnel health') — no "
                f"benchmark was run; last probe error: {last_err}",
        "vs_baseline": 0.0,
    }))
    return False

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

# BENCH_RNG selects the PRNG impl for every random draw in the window program
# (inference-time interpolator dropout — the DYffusion spread mechanism).
# Default "rbg": the TPU's hardware RNG instruction. Software threefry mask
# generation fuses INTO the per-layer MLP megafusions and holds them at
# ~34 TF/s (measured: threefry 1036.7 vs rbg 1147.3 sim-yr/day — +10.7%).
RNG_IMPL = os.environ.get("BENCH_RNG", "rbg")


def mkkey(i: int):
    if RNG_IMPL == "threefry":
        return jax.random.PRNGKey(i)
    return jax.random.key(i, impl=RNG_IMPL)


def build(embed=256, layers=8, dtype="float32", fold=False, use_pallas=False,
          merged_dhconv=False, params_dtype=None, preds_dtype=None,
          thresh=1.0, factorization="", rank=1.0, rank_pipeline=True,
          spectral_io="", fused_mlp=False, fused_tile=1024,
          scan_layers=False, peel=False, fused_tail=False):
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
        merged_dhconv=merged_dhconv, hard_thresholding_fraction=thresh,
        factorization=factorization, rank=rank, rank_pipeline=rank_pipeline,
        spectral_io_dtype=spectral_io, fused_mlp=fused_mlp,
        fused_mlp_tile_rows=fused_tile, scan_layers=scan_layers,
        fused_tail=fused_tail,
    ))
    interp = InterpolationExperiment(imodel, icfg, in_packer, out_packer, norm)

    fmodel = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=C + CF, out_chans=C, embed_dim=embed,
        num_layers=layers, operator_type="dhconv", with_time_emb=True,
        min_time=0, max_time=horizon - 1, data_grid="equiangular",
        compute_dtype=dtype, sht_matmul_dtype=dtype, sht_fold_symmetry=fold,
        use_pallas=use_pallas, merged_dhconv=merged_dhconv,
        hard_thresholding_fraction=thresh,
        factorization=factorization, rank=rank, rank_pipeline=rank_pipeline,
        spectral_io_dtype=spectral_io, fused_mlp=fused_mlp,
        fused_mlp_tile_rows=fused_tile, scan_layers=scan_layers,
        fused_tail=fused_tail,
    ))
    dcfg = DYffusionConfig(timesteps=horizon, forward_conditioning="none",
                           time_encoding="dynamics", peel_sampler=peel)

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
    stepper = DYffusionStepper(exp, fc_params, prescriber=prescriber,
                               params_dtype=params_dtype,
                               preds_dtype=preds_dtype)
    return stepper, in_names, forcing_names


def product_bench(stepper, window, total_steps, n_ensemble, embed, layers):
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
    # aligned repeating source: one upload per distinct window content (see
    # inference/loop.py upload cache)
    from spherical_dyffusion_tpu.data import SyntheticTimeSeries as _STS

    src = _STS(
        [n for n in (list(stepper.exp.in_packer.names)
                     + list(stepper.exp.forcing_names) + ["ocean_fraction"])],
        n_timesteps=window, spatial_shape=(180, 360),
    )
    n_steps = max(2 * window, total_steps)
    # BENCH_TGT_DTYPE=bfloat16: bf16 target uploads (halved upload bytes +
    # HBM residency per cache slot; aggregator upcasts on device — see
    # InferenceConfig.targets_dtype). Unlocks consumer configs whose f32
    # targets OOM (ensembles / window > 48).
    tgt_dtype = os.environ.get("BENCH_TGT_DTYPE", "float32")
    icfg = InferenceConfig(
        n_forward_steps=n_steps, forward_steps_in_memory=window,
        n_ensemble=n_ensemble, n_repeats=n_steps // window + 2,
        targets_dtype=tgt_dtype,
    )
    agg = InferenceAggregator(names, src.horizontal.area_weights(),
                              log_zonal_mean_images=True)
    # warmup: compile the window program AND the aggregator's reduce programs
    # outside the timed run
    run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=window, forward_steps_in_memory=window,
                        n_ensemble=n_ensemble, n_repeats=3,
                        targets_dtype=tgt_dtype),
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


def ace_bench(embed, layers, window, total_steps, dtype,
              thresh=1.0, factorization="", rank=1.0, rank_pipeline=True,
              spectral_io=""):
    """BENCH_ACE=1: paper-scale ACE single-module stepper rollout — the
    reference's comparison baseline (hot loop
    src/ace_inference/core/stepper.py:529-560, python-stepped there; here the
    whole window is one lax.scan program with the dry-air-conservation
    corrector and the prescribed ocean fused into the scan body)."""
    from spherical_dyffusion_tpu.data.coords import SigmaCoordinates
    from spherical_dyffusion_tpu.evaluation.metrics import spherical_area_weights
    from spherical_dyffusion_tpu.inference.ace_stepper import (
        SingleStepStepper,
        SingleStepStepperConfig,
    )
    from spherical_dyffusion_tpu.inference.corrector import CorrectorConfig
    from spherical_dyffusion_tpu.inference.ocean import OceanConfig

    H, W = 180, 360
    K = 8  # vertical water levels (reference ACE: 8 sigma levels)
    out_names = (
        ["PRESsfc", "surface_temperature"]
        + [f"specific_total_water_{k}" for k in range(K)]
        + [f"v{i}" for i in range(25)]
    )  # 35 prognostic channels, paper width
    in_names = out_names + ["DSWRFtoa"]
    all_names = in_names + ["ocean_fraction"]

    model = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=len(in_names), out_chans=len(out_names),
        embed_dim=embed, num_layers=layers, operator_type="dhconv",
        data_grid="equiangular", compute_dtype=dtype, sht_matmul_dtype=dtype,
        hard_thresholding_fraction=thresh,
        factorization=factorization or None, rank=rank,
        rank_pipeline=rank_pipeline, spectral_io_dtype=spectral_io,
    ))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, len(in_names)))
    )

    def model_fn(p, x_norm):
        return model.apply(p, x_norm)

    # realistic magnitudes: water ~1e-3 (specific humidity) keeps the dry-air
    # denominator 1 - sum(bk_diff * q) away from zero under an untrained net
    def _mean(n):
        return 1e5 if n == "PRESsfc" else 1e-3 if "water" in n else 1.0

    def _std(n):
        return 1e3 if n == "PRESsfc" else 1e-4 if "water" in n else 0.5

    norm = StandardNormalizer.from_dicts(
        {n: _mean(n) for n in all_names}, {n: _std(n) for n in all_names},
        all_names,
    )
    sigma = SigmaCoordinates(ak=np.linspace(0.0, 100.0, K + 1),
                             bk=np.linspace(0.0, 1.0, K + 1))
    area = spherical_area_weights(np.linspace(-89.5, 89.5, H), W)
    cfg = SingleStepStepperConfig(
        in_names=in_names, out_names=out_names,
        corrector=CorrectorConfig(conserve_dry_air=True),
        ocean=OceanConfig("surface_temperature", "ocean_fraction"),
    )
    stepper = SingleStepStepper(cfg, model_fn, params, norm, area, sigma)

    rng = np.random.default_rng(0)
    data = {
        n: np.abs(rng.standard_normal((1, window + 1, H, W), np.float32)) + 1.0
        for n in all_names
    }
    data["PRESsfc"] = 1e5 + 1e3 * data["PRESsfc"]
    for n in all_names:
        if "water" in n:
            data[n] = 1e-3 * data[n]
    data["ocean_fraction"] = (data["ocean_fraction"] > 1.8).astype(np.float32)
    # upload ONCE: run_on_batch's jnp.asarray is a no-op on device arrays;
    # re-uploading ~1.3GB per timed window would both dominate the timing and
    # leak host RAM through the axon client (see inference/loop.py cache)
    data = {n: jnp.asarray(data[n].astype(np.float32)) for n in all_names}

    t0 = time.time()
    out = stepper.run_on_batch(data, n_forward_steps=window, lean=True)
    jax.block_until_ready(out.metrics["loss"])
    compile_s = time.time() - t0
    times = []
    n_windows = max(1, total_steps // window)
    for _ in range(n_windows):
        t0 = time.time()
        out = stepper.run_on_batch(data, n_forward_steps=window, lean=True)
        jax.block_until_ready(out.metrics["loss"])
        times.append(time.time() - t0)
    med = float(np.median(times))
    sps = window / med
    sim_years_per_day = sps * 86400.0 / STEPS_PER_SIM_YEAR
    finite = bool(np.isfinite(float(out.metrics["loss"])))
    print(json.dumps({
        "metric": "ace_simulated_years_per_day",
        "value": round(sim_years_per_day, 1),
        "unit": f"sim-years/day (ACE single-step stepper, SFNO {embed}x"
                f"{layers}@{H}x{W} {dtype}, dry-air corrector + prescribed "
                f"ocean in-scan, window {window}; {sps:.1f} steps/s, compile "
                f"{compile_s:.0f}s, finite={finite})",
        "vs_baseline": round(sim_years_per_day / BASELINE_SIM_YEARS_PER_DAY, 3),
    }))


def train_bench(embed, layers, window):
    """BENCH_TRAIN=1: paper-scale TRAINING step timings (reference logs
    per-step train time, _base_experiment.py:746,770-778).

    Times three things on the real chip, all jitted with buffer donation:
    1. the interpolator train step (fwd+bwd+adamw+EMA),
    2. the DYffusion forecaster train step (interpolator forward inside the
       loss + forecaster fwd+bwd+adamw+EMA),
    3. one fused whole-epoch lax.scan segment (fit_in_memory's program).
    """
    from spherical_dyffusion_tpu.data import DebugDataModule
    from spherical_dyffusion_tpu.training import Trainer, TrainerConfig

    H, W, horizon = 180, 360, 6
    C, CF = 35, 2
    bs = int(os.environ.get("BENCH_TRAIN_BATCH", 1))
    dm = DebugDataModule(channels=C, height=H, width=W, horizon=horizon,
                         n_forcing=CF, batch_size=bs,
                         n_timesteps=horizon + 18)
    icfg = ExperimentConfig(horizon=horizon, window=1,
                            enable_inference_dropout=True)
    # BENCH_SCAN_LAYERS=1 scans the middle blocks; at paper scale the fused
    # epoch's backward then needs remat (BENCH_CKPT=3) — without it the scan
    # backward's stacked residuals overflow HBM (measured: program 12.1G +
    # args 4.6G > 15.75G)
    imodel = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=2 * C + CF, out_chans=C, embed_dim=embed,
        num_layers=layers, operator_type="dhconv", with_time_emb=True,
        dropout_mlp=0.1, min_time=1, max_time=horizon - 1,
        scan_layers=os.environ.get("BENCH_SCAN_LAYERS", "0") == "1",
        checkpointing=int(os.environ.get("BENCH_CKPT", "0")),
    ))
    interp = InterpolationExperiment(imodel, icfg, dm.in_packer,
                                     dm.out_packer, dm.normalizer)
    batch = next(iter(dm.train_batches(seed=0)))
    results = {}

    def time_steps(tr, exp, label, n=8):
        state = tr.init_state(batch)
        step = tr._make_train_step()
        dyn = jnp.asarray(batch["dynamics"])
        cond = batch.get("dynamical_condition")
        cond = jnp.asarray(cond) if cond is not None else None
        aux = getattr(exp, "aux_params", None)
        t0 = time.time()
        state, m = step(state, dyn, cond, jax.random.PRNGKey(0), aux)
        jax.block_until_ready(m["loss"])
        results[f"{label}_compile_s"] = round(time.time() - t0, 1)
        times = []
        for i in range(n):
            t0 = time.time()
            state, m = step(state, dyn, cond, jax.random.PRNGKey(i + 1), aux)
            jax.block_until_ready(m["loss"])
            times.append(time.time() - t0)
        results[f"{label}_step_ms"] = round(float(np.median(times)) * 1e3, 1)
        return state

    tr_i = Trainer(interp, dm, TrainerConfig(epochs=1, steps_per_epoch=8,
                                             donate_state=True))
    st_i = time_steps(tr_i, interp, "interpolator")

    dcfg = DYffusionConfig(
        timesteps=horizon, forward_conditioning="none",
        time_encoding="dynamics",
        peel_sampler=os.environ.get("BENCH_PEEL", "0") == "1")
    fmodel = SFNO(SFNOConfig(
        img_shape=(H, W), in_chans=C + CF, out_chans=C, embed_dim=embed,
        num_layers=layers, operator_type="dhconv", with_time_emb=True,
        min_time=0, max_time=horizon - 1,
        scan_layers=os.environ.get("BENCH_SCAN_LAYERS", "0") == "1",
        checkpointing=int(os.environ.get("BENCH_CKPT", "0")),
    ))
    # keep the frozen interpolator tree ON DEVICE: host numpy aux_params
    # would re-upload ~100MB through the tunnel at every step
    fexp = DYffusionForecastingExperiment(
        fmodel, interp, st_i.params, dcfg,
        ExperimentConfig(horizon=horizon), dm.in_packer, dm.out_packer,
        dm.normalizer, forcing_names=dm.cfg.forcing_names,
        forcing_normalizer=dm.forcing_normalizer,
    )
    tr_f = Trainer(fexp, dm, TrainerConfig(epochs=1, steps_per_epoch=8,
                                           donate_state=True))
    time_steps(tr_f, fexp, "forecaster")

    # fused whole-epoch segment (the fit_in_memory program)
    n_fused = int(os.environ.get("BENCH_TRAIN_FUSED_STEPS", 8))
    tr_fused = Trainer(interp, dm, TrainerConfig(
        epochs=1, steps_per_epoch=n_fused, donate_state=False))
    t0 = time.time()
    tr_fused.fit_in_memory(epochs=1, val_every=100, verbose=False)
    fused_s = time.time() - t0
    results["fused_epoch_steps"] = n_fused
    results["fused_epoch_s_incl_compile"] = round(fused_s, 1)

    step_ms = results["forecaster_step_ms"]
    print(json.dumps({
        "metric": "train_step_time_ms",
        "value": step_ms,
        "unit": f"ms/step (DYffusion forecaster fwd+bwd+adamw+EMA, "
                f"embed{embed}x{layers}@{H}x{W} batch {bs}, donation on; "
                f"all timings: {results})",
        "vs_baseline": None,
    }))


def mesh_bench(embed, layers, window, total_steps, n_ensemble):
    """BENCH_MESH=1: multi-chip inference bench — ready to run the day more
    than one real chip is attached. Builds a data(xh xw) mesh over all
    devices, shards the IC x ensemble rows over 'data' (optionally the grid
    over h/w via BENCH_MESH_H/BENCH_MESH_W), and times sharded windows."""
    n_dev = len(jax.devices())
    h_ax = int(os.environ.get("BENCH_MESH_H", 1))
    w_ax = int(os.environ.get("BENCH_MESH_W", 1))
    data_ax = max(1, n_dev // (h_ax * w_ax))
    if n_dev == 1:
        print(json.dumps({
            "metric": "simulated_years_per_day", "value": 0.0,
            "unit": "BENCH_MESH needs >1 real device; found 1 "
                    "(use the virtual-CPU dryrun for sharding validation)",
            "vs_baseline": 0.0,
        }))
        return
    from spherical_dyffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=data_ax, h=h_ax, w=w_ax,
                     devices=jax.devices()[: data_ax * h_ax * w_ax])
    stepper, in_names, forcing_names = build(embed, layers)
    # rebuild with the mesh so params get replicated placement up front
    stepper = DYffusionStepper(
        stepper.exp, stepper.params["forecaster"],
        prescriber=stepper.prescriber, mesh=mesh,
    )
    # at least one row per data shard, rounded UP to a multiple of the data
    # axis — a non-divisible batch silently falls back to replication in
    # shard_rows, which would misrepresent the "sharded over data" claim below
    B = -(-max(n_ensemble, data_ax) // data_ax) * data_ax
    x = jnp.zeros((B, 180, 360, 35), jnp.float32)
    x = stepper.shard_rows(x)
    t0 = time.time()
    x, _ = stepper.run_window(x, None, None, None, jax.random.PRNGKey(0),
                              window)
    jax.block_until_ready(x)
    compile_s = time.time() - t0
    times = []
    for i in range(4):
        t0 = time.time()
        x, _ = stepper.run_window(x, None, None, None,
                                  jax.random.PRNGKey(i + 1), window)
        jax.block_until_ready(x)
        times.append(time.time() - t0)
    med = float(np.median(times))
    sps = window * B / med
    sim_years_per_day = sps * 86400.0 / STEPS_PER_SIM_YEAR
    print(json.dumps({
        "metric": "simulated_years_per_day",
        "value": round(sim_years_per_day, 3),
        "unit": f"sim-years/day (MESH bench: {dict(mesh.shape)}, {B} rows "
                f"sharded over data={data_ax}, window {window}, "
                f"embed{embed}x{layers}; compile {compile_s:.0f}s)",
        "vs_baseline": round(sim_years_per_day / BASELINE_SIM_YEARS_PER_DAY, 3),
    }))


def main():
    if not _probe_device():
        return
    # belt-and-braces: never report a CPU-fallback run as a TPU number.
    # This is the PARENT's first backend init — if the tunnel enters its hang
    # mode between the subprocess probe succeeding and now, this call blocks
    # in C with no deadline, so arm a watchdog thread that emits the same
    # parseable zero-result and hard-exits instead of hanging to the driver
    # timeout (advisor round-3 finding).
    if os.environ.get("BENCH_PLATFORM") != "cpu":
        import threading

        def _watchdog():
            print(json.dumps({
                "metric": "simulated_years_per_day", "value": 0.0,
                "unit": "TPU tunnel hung during parent backend init (after a "
                        "successful subprocess probe) — no benchmark was run",
                "vs_baseline": 0.0,
            }), flush=True)
            os._exit(2)

        timer = threading.Timer(180.0, _watchdog)
        timer.daemon = True
        timer.start()
        backend = jax.default_backend()
        timer.cancel()
        assert backend != "cpu", (
            "axon backend fell back to CPU after a successful probe — refusing "
            "to record a CPU run as the TPU benchmark"
        )
    embed = int(os.environ.get("BENCH_EMBED", 256))
    layers = int(os.environ.get("BENCH_LAYERS", 8))
    window = int(os.environ.get("BENCH_WINDOW", 96))
    total_steps = int(os.environ.get("BENCH_STEPS", 4 * window))
    n_ensemble = int(os.environ.get("BENCH_ENSEMBLE", 1))
    # float32 arrays + XLA default matmul precision = bf16 MXU passes with
    # f32 accumulation and no explicit convert ops — ~2x faster than manually
    # casting activations to bf16 (measured: 954 vs 494 sim-yr/day)
    # bfloat16 compute measured +15.5% (the window program is HBM-bandwidth
    # bound; bf16 halves the bytes) and scientifically equivalent on the
    # trained skill model (results/precision_bf16: RMSE/CRPS within 0.02%,
    # SSR within 0.22%, rollout stability unchanged). float32 reverts.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    fold = os.environ.get("BENCH_FOLD", "0") == "1"
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    # BENCH_MERGED=1: single merged-GEMM dhconv (measured ~3% slower on v5e)
    merged = os.environ.get("BENCH_MERGED", "0") == "1"
    # BENCH_PARAM_DTYPE: weight-STORAGE dtype for the rollout (cast once at
    # stepper build). Under bf16 compute the weights are cast to bf16 at use
    # anyway, so bf16 storage is numerically identical and halves the weight
    # HBM reads. Empty = params stay float32.
    params_dtype = os.environ.get("BENCH_PARAM_DTYPE", "") or None
    # BENCH_PREDS_DTYPE: dtype of the EMITTED window predictions (halves their
    # HBM residency — the ensemble-4 OOM driver — and the writer fetch bytes;
    # the AR hand-off stays full precision). Empty = same as activations.
    preds_dtype = os.environ.get("BENCH_PREDS_DTYPE", "") or None
    # BENCH_THRESH: spectral hard-thresholding fraction (lmax/mmax scale;
    # the reference exposes the same knob, sfnonet.py
    # hard_thresholding_fraction — 1.0 in the released configs). <1 cuts the
    # Legendre/dhconv FLOPs+bytes quadratically-ish; a MODEL change, so any
    # non-1.0 use needs its own skill study.
    thresh = float(os.environ.get("BENCH_THRESH", "1.0"))
    # BENCH_FACT / BENCH_RANK: factorized spectral weights (cp|tucker|tt, rank
    # as a fraction of embed). The reference exposes the same family via
    # tensorly (s2convolutions.py factorization/rank). CP at rank r has
    # 2*r*embed multiplies per mode vs embed^2 dense — FLOP parity at r=0.5,
    # wins below. A MODEL change: any non-dense use needs its own skill study.
    factorization = os.environ.get("BENCH_FACT", "")
    rank = float(os.environ.get("BENCH_RANK", "1.0"))
    # BENCH_RANKPIPE=0 reverts CP to the spectral-space contraction (the
    # rank-space grid-projected pipeline is the default; exactly equivalent)
    rank_pipeline = os.environ.get("BENCH_RANKPIPE", "1") == "1"
    # BENCH_SPECTRAL_IO=bfloat16: emit every spectral-pipeline intermediate
    # (SHT/dhconv/ISHT stages, stacked real layout) in bf16 instead of the
    # complex64 f32 pairs — numerically identical under bf16 matmul inputs
    # (each GEMM rounds its inputs to bf16 anyway), halves the dominant
    # intermediate HBM traffic (results/roofline). Empty = f32 materialization.
    spectral_io = os.environ.get("BENCH_SPECTRAL_IO", "") or ""
    # BENCH_FUSED_MLP=1: Pallas VMEM-resident fused block MLP (one kernel for
    # GEMM+gelu+dropout+GEMM+outer-skip; removes the hidden tensor's 133 MB
    # HBM round trip per layer-forward and the skip's read-modify-write)
    fused_mlp = os.environ.get("BENCH_FUSED_MLP", "0") == "1"
    fused_tile = int(os.environ.get("BENCH_FUSED_TILE", "1024"))
    # BENCH_FUSED_TAIL=1: round-5 boundary-corrected kernel — norm1-apply +
    # time-scale-shift folded into the VMEM-resident MLP+skip kernel
    # (ops/fused_mlp.py:fused_block_tail); the normalized tensor never
    # materializes to HBM (fixes loss mechanism #2 of results/fused_mlp)
    fused_tail = os.environ.get("BENCH_FUSED_TAIL", "0") == "1"
    # BENCH_SCAN_LAYERS: the 6 homogeneous middle blocks as ONE lax.scan
    # body with stacked params (alone: -4% runtime but 9.4x faster cold
    # compile). BENCH_PEEL: peel the s=0/s=N-1 sampling iterations out of the
    # fused sampler scan, skipping the 2 masked interpolator halves (~11% of
    # window network rows) at the cost of two extra compiled network bodies.
    # DEFAULT ON TOGETHER (exact math, equivalence-tested): measured 1821.8
    # vs 1718.5 sim-yr/day unrolled (+6.0%); peel WITHOUT scan_layers is the
    # documented remote-compile hang (NOTES_ROUND3 "Peeled scan sampler").
    # BENCH_SCAN_LAYERS=0 / BENCH_PEEL=0 revert.
    scan_layers = os.environ.get("BENCH_SCAN_LAYERS", "1") == "1"
    peel = os.environ.get("BENCH_PEEL", "1") == "1"

    if os.environ.get("BENCH_TRAIN", "0") == "1":
        return train_bench(embed, layers, window)
    if os.environ.get("BENCH_MESH", "0") == "1":
        return mesh_bench(embed, layers, window, total_steps, n_ensemble)
    if os.environ.get("BENCH_ACE", "0") == "1":
        # ACE windows carry per-name (B, T+1, H, W) data; default to a
        # smaller window than the DYffusion bench
        ace_window = int(os.environ.get("BENCH_WINDOW", 12))
        return ace_bench(embed, layers, ace_window,
                         int(os.environ.get("BENCH_STEPS", 4 * ace_window)),
                         dtype, thresh, factorization, rank, rank_pipeline,
                         os.environ.get("BENCH_SPECTRAL_IO", "") or "")

    stepper, in_names, forcing_names = build(embed, layers, dtype, fold, use_pallas,
                                             merged, params_dtype, preds_dtype,
                                             thresh, factorization, rank,
                                             rank_pipeline, spectral_io,
                                             fused_mlp, fused_tile,
                                             scan_layers, peel, fused_tail)
    names = in_names + forcing_names + ["ocean_fraction"]
    src = SyntheticTimeSeries(names, n_timesteps=window + 1, spatial_shape=(180, 360))

    if os.environ.get("BENCH_PRODUCT", "0") == "1":
        # product bench: the full run_inference path with aggregator + writer
        # consuming every window (100MB/window host drains) — proves the
        # deferred-drain + prefetch pipeline overlaps host work with device
        # compute (time/* fractions in the output)
        return product_bench(stepper, window, total_steps, n_ensemble,
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
            x, _ = stepper.run_window(x, forcing, sst, mask, mkkey(0), window)
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
        x, _ = stepper.run_window(x, forcing, sst, mask, mkkey(i + 1), window)
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
