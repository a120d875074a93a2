"""Skill proof: train the full two-stage DYffusion pipeline on learnable
stochastic spherical dynamics and measure forecast quality.

This is the synthetic-analog of the reference's FV3GFS evaluation protocol
(reference src/evaluation/metrics.py:178-249 CRPS/SSR; ckpt selection on
val/avg/crps, configs/experiment/fv3gfs_dyffusion.yaml:33-52). The system
(data/datasets.py:StochasticModalTimeSeries) is solid-body rotation plus an
OU modal process, so:

* the deterministic part is exactly learnable (skill >> climatology is
  achievable, unlike pure-noise debug data);
* the stochastic part has closed-form conditional spread, giving the
  10-member ensemble a well-defined calibration target (SSR -> 1).

Produces results/skill/{metrics.json, report.md, curves_*.png}:
  1. interpolator val-RMSE vs climatology + linear-interpolation baselines,
  2. forecaster: cold vs naive sampling (RMSE/CRPS at every horizon),
  3. CRPS/SSR calibration of the ensemble,
  4. long-rollout stability (>= 500 autoregressive steps).

Run:  python scripts/skill_proof.py                   (real TPU, full size)
      python scripts/skill_proof.py --preset=mini --platform=cpu   (CI size)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--preset", choices=["full", "mini"], default="full")
    ap.add_argument("--out", default="results/skill")
    ap.add_argument("--ensemble", type=int, default=10)
    ap.add_argument("--rollout-steps", type=int, default=504)
    # the DYffusion noise source is interpolator dropout; its rate is THE
    # calibration knob (higher -> more ensemble spread -> SSR closer to 1)
    ap.add_argument("--dropout", type=float, default=None)
    # CI-size overrides (used by tests/test_skill.py to keep the regression
    # test fast while still proving learnability)
    ap.add_argument("--epochs-interp", type=int, default=None)
    ap.add_argument("--epochs-fc", type=int, default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    # per-member gaussian input perturbation at prediction time (reference
    # prediction_inputs_noise) — the second calibration knob; inference-only,
    # so sweeps reuse trained checkpoints via --reuse
    ap.add_argument("--inputs-noise", type=float, default=0.0)
    ap.add_argument("--reuse", default=None,
                    help="out dir of a previous run: load its checkpoints "
                         "and skip training (eval-only calibration sweeps)")
    # fused device training (Trainer.fit_in_memory): whole-epoch lax.scan
    # programs, ~20-40x faster epochs through the axon tunnel
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction, default=True)
    # synthetic system family: "ou" (stochastic forcing, decaying
    # perturbations, closed-form conditional spread) or "chaotic" (Lorenz-96
    # modal flow, POSITIVE Lyapunov exponent — the regime where the
    # reference's interpolator-dropout spread mechanism operates on FV3GFS)
    ap.add_argument("--system", choices=["ou", "chaotic"], default="ou")
    # compute dtype for both networks (params stay f32): bfloat16 measured
    # +15.5% end-to-end on the paper inference config; use with --reuse for
    # an eval-only precision study against the recorded f32 metrics
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--params-dtype", default=None,
                    help="weight STORAGE dtype for the eval/rollout stepper")
    ap.add_argument("--preds-dtype", default=None,
                    help="emitted-prediction dtype for the eval/rollout stepper")
    ap.add_argument("--thresh", type=float, default=1.0,
                    help="spectral hard_thresholding_fraction for both "
                         "networks (model change: quantifies the skill cost "
                         "of the BENCH_THRESH speed knob)")
    ap.add_argument("--factorization", default="",
                    help="spectral-weight factorization for both networks "
                         "(cp|tucker|tt; model change — quantifies the skill "
                         "cost of the BENCH_FACT speed knob)")
    ap.add_argument("--rank", type=float, default=1.0,
                    help="factorization rank as a fraction of embed")
    ap.add_argument("--spectral-io", default="",
                    help="spectral-pipeline intermediate emission dtype "
                         "(e.g. bfloat16 — quantifies the skill cost of the "
                         "BENCH_SPECTRAL_IO speed knob)")
    ap.add_argument("--peel", action="store_true",
                    help="peel_sampler=True in the DYffusion config: "
                         "confirms the calibration/skill gates under the "
                         "peeled sampler's restructured rng stream (the "
                         "fast product config's recommended pairing)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from spherical_dyffusion_tpu.data import StochasticDataModule
    from spherical_dyffusion_tpu.diffusion import DYffusionConfig
    from spherical_dyffusion_tpu.evaluation import metrics as M
    from spherical_dyffusion_tpu.inference import DYffusionStepper
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        DYffusionForecastingExperiment,
        ExperimentConfig,
        InterpolationExperiment,
        Trainer,
        TrainerConfig,
    )
    from spherical_dyffusion_tpu.training.trainer import chunked_vmap
    from spherical_dyffusion_tpu.training.experiments import _stack_window

    if args.preset == "full":
        # NOTE: every training batch ships ~11MB through the axon tunnel
        # (~1 s/step measured) — steps_per_epoch bounds the samples actually
        # drawn per epoch, keeping the full run under ~1h wall
        # fused device epochs are ~3s each (fit_in_memory), so the full run
        # trains 24 epochs/stage in minutes where dispatch-per-step training
        # managed 7
        P = dict(height=64, width=128, channels=2, horizon=6,
                 embed=64, layers=4, batch=16, steps_per_epoch=150,
                 epochs_interp=24, epochs_fc=24, n_timesteps=8192,
                 n_val_timesteps=512, lr_interp=2e-3, lr_fc=1e-3,
                 dropout=0.15, eval_batches=4, eval_bs=8, ens_chunk=2,
                 all_samples=True)
    else:
        P = dict(height=16, width=32, channels=2, horizon=4,
                 embed=16, layers=2, batch=8, steps_per_epoch=40,
                 epochs_interp=4, epochs_fc=3, n_timesteps=512,
                 n_val_timesteps=128, lr_interp=5e-3, lr_fc=3e-3,
                 dropout=0.15, eval_batches=2, eval_bs=4, ens_chunk=3)

    if args.dropout is not None:
        P["dropout"] = args.dropout
    if args.epochs_interp is not None:
        P["epochs_interp"] = args.epochs_interp
    if args.epochs_fc is not None:
        P["epochs_fc"] = args.epochs_fc
    if args.steps_per_epoch is not None:
        P["steps_per_epoch"] = args.steps_per_epoch
    HORIZON = P["horizon"]
    C = P["channels"]
    dm = StochasticDataModule(
        system=args.system,
        channels=C, height=P["height"], width=P["width"], horizon=HORIZON,
        n_timesteps=P["n_timesteps"], n_val_timesteps=P["n_val_timesteps"],
        batch_size=P["batch"], eval_batch_size=P["eval_bs"],
        max_val_samples=P["eval_batches"] * P["eval_bs"],
        # fused epochs permute over the WHOLE dataset and draw
        # steps_per_epoch fresh batches each epoch — capping the sample pool
        # to one epoch's worth overfits the OU noise realizations (measured:
        # train loss down, val RMSE up)
        max_train_samples=(None if P.get("all_samples")
                           else P["steps_per_epoch"] * P["batch"]),
    )
    w = jnp.asarray(dm.grid.horizontal.area_weights())
    out_norm = dm.normalizer
    os.makedirs(args.out, exist_ok=True)
    report = {"preset": args.preset, "params": P,
              "thresh": args.thresh, "factorization": args.factorization,
              "spectral_io": args.spectral_io,
              "rank": args.rank}
    t_start = time.time()

    # ---------------------------------------------------------------- stage 1
    print("== stage 1: interpolator ==", flush=True)
    icfg = ExperimentConfig(horizon=HORIZON, window=1, loss_function="l1",
                            num_predictions=args.ensemble,
                            enable_inference_dropout=True)
    imodel = SFNO(SFNOConfig(
        img_shape=(P["height"], P["width"]), in_chans=2 * C, out_chans=C,
        embed_dim=P["embed"], num_layers=P["layers"], with_time_emb=True,
        dropout_mlp=P["dropout"], min_time=1, max_time=HORIZON - 1,
        compute_dtype=args.dtype, sht_matmul_dtype=args.dtype,
        hard_thresholding_fraction=args.thresh,
        factorization=args.factorization, rank=args.rank,
        spectral_io_dtype=args.spectral_io,
    ))
    interp = InterpolationExperiment(imodel, icfg, dm.in_packer, dm.out_packer,
                                     dm.normalizer)
    from flax import serialization

    def _save(params, name):
        with open(os.path.join(args.out, name), "wb") as f:
            f.write(serialization.msgpack_serialize(jax.device_get(params)))

    def _load(name):
        with open(os.path.join(args.reuse, name), "rb") as f:
            return serialization.msgpack_restore(f.read())

    t1 = Trainer(interp, dm, TrainerConfig(
        lr=P["lr_interp"], epochs=P["epochs_interp"], use_ema=True,
        warmup_steps=50, steps_per_epoch=P["steps_per_epoch"], seed=0,
        val_ensemble_chunk=P.get("ens_chunk"),
    ))
    fit1 = t1.fit_in_memory if args.fused else t1.fit
    if args.reuse:
        ip_params = _load("interpolator.msgpack")
        hist1 = {"train_loss": [], "val": []}
    else:
        hist1 = fit1(verbose=True, val_every=max(1, P["epochs_interp"] // 3))
        ip_params = jax.device_get(
            t1.state.ema.params if t1.state.ema is not None else t1.state.params
        )
    _save(ip_params, "interpolator.msgpack")

    # baselines for the interpolation task on the val set, computed on device:
    #   climatology (predict the training time-mean field) and linear
    #   interpolation between the two conditioning frames
    train_mean = {}
    sample = dm._train_src.read_window(0, min(256, P["n_timesteps"]), dm.cfg.in_names)
    clim_field = jnp.asarray(np.stack(
        [sample[n].mean(0) for n in dm.cfg.in_names], axis=-1))  # (H, W, C)

    @jax.jit
    def interp_baselines(dyn):
        # dyn raw (B, T, H, W, C); window=1 inputs are frames 0 and T-1
        rmse_clim, rmse_lin = [], []
        for t_step in range(1, HORIZON):
            target = dyn[:, 1 + t_step - 1]
            lin = dyn[:, 0] + (dyn[:, -1] - dyn[:, 0]) * (t_step / HORIZON)
            rmse_clim.append(jnp.mean(M.root_mean_squared_error(
                target, jnp.broadcast_to(clim_field, target.shape),
                w[..., None], dim=(-3, -2, -1))))
            rmse_lin.append(jnp.mean(M.root_mean_squared_error(
                target, lin, w[..., None], dim=(-3, -2, -1))))
        return jnp.mean(jnp.stack(rmse_clim)), jnp.mean(jnp.stack(rmse_lin))

    clims, lins = [], []
    for batch in dm.val_batches(horizon=HORIZON):
        c_, l_ = interp_baselines(jnp.asarray(batch["dynamics"]))
        clims.append(float(c_)); lins.append(float(l_))
        if len(clims) >= P["eval_batches"]:
            break
    if args.reuse:
        prev = json.load(open(os.path.join(args.reuse, "metrics.json")))
        interp_val = {f"val/avg/{k.split('_', 1)[1]}": v
                      for k, v in prev["interpolator"].items()
                      if k.startswith("val_") and v is not None}
    else:
        interp_val = t1.validate(t1.state, max_batches=P["eval_batches"])
    report["interpolator"] = {
        "train_loss": hist1["train_loss"],
        "val_rmse": interp_val.get("val/avg/rmse"),
        "val_crps": interp_val.get("val/avg/crps"),
        "val_ssr": interp_val.get("val/avg/ssr"),
        "baseline_rmse_climatology": float(np.mean(clims)),
        "baseline_rmse_linear_interp": float(np.mean(lins)),
    }
    print(json.dumps(report["interpolator"], indent=1), flush=True)

    # ---------------------------------------------------------------- stage 2
    print("== stage 2: DYffusion forecaster ==", flush=True)
    dcfg = DYffusionConfig(timesteps=HORIZON, forward_conditioning="data",
                           lambda_reconstruction=1.0,
                           peel_sampler=args.peel)
    fmodel = SFNO(SFNOConfig(
        img_shape=(P["height"], P["width"]), in_chans=2 * C, out_chans=C,
        embed_dim=P["embed"], num_layers=P["layers"], with_time_emb=True,
        min_time=0, max_time=HORIZON - 1,
        compute_dtype=args.dtype, sht_matmul_dtype=args.dtype,
        hard_thresholding_fraction=args.thresh,
        factorization=args.factorization, rank=args.rank,
        spectral_io_dtype=args.spectral_io,
    ))
    fexp = DYffusionForecastingExperiment(
        fmodel, interp, ip_params, dcfg,
        ExperimentConfig(horizon=HORIZON, loss_function="l1",
                         num_predictions=args.ensemble),
        dm.in_packer, dm.out_packer, dm.normalizer,
    )
    t2 = Trainer(fexp, dm, TrainerConfig(
        lr=P["lr_fc"], epochs=P["epochs_fc"], use_ema=True,
        warmup_steps=50, steps_per_epoch=P["steps_per_epoch"], seed=1,
        val_ensemble_chunk=P.get("ens_chunk"),
    ))
    fit2 = t2.fit_in_memory if args.fused else t2.fit
    if args.reuse:
        fc_params = _load("forecaster.msgpack")
        hist2 = {"train_loss": [], "val": []}
    else:
        hist2 = fit2(verbose=True, val_every=max(1, P["epochs_fc"] // 3))
        fc_params = jax.device_get(
            t2.state.ema.params if t2.state.ema is not None else t2.state.params
        )
    _save(fc_params, "forecaster.msgpack")
    report["forecaster"] = {"train_loss": hist2["train_loss"],
                            "val": hist2["val"][-1] if hist2["val"] else {}}
    report["inputs_noise"] = args.inputs_noise

    # ------------------------------------------------- per-horizon ensembles
    # one jitted program: E members of the full sampling loop + per-horizon
    # area-weighted RMSE (ens mean), CRPS, spread; plus persistence baseline
    def make_eval(exp, E):
        def eval_fn(params, aux, dyn, rng):
            dyn_n = exp.normalizer.normalize(dyn)
            init = _stack_window(dyn_n[:, :1])

            def member(key):
                x = init
                if args.inputs_noise > 0:  # reference get_ensemble_inputs
                    x = x + args.inputs_noise * jax.random.normal(
                        jax.random.fold_in(key, 17), x.shape, x.dtype)
                out = exp.predict(params, x, key, aux_params=aux)
                return {h: out.preds[h] for h in range(1, HORIZON + 1)
                        if h in out.preds}

            preds = chunked_vmap(member, jax.random.split(rng, E),
                                 P.get("ens_chunk"))
            table = {}
            for h in preds:
                pe = out_norm.denormalize(preds[h])  # (E, B, H, W, C)
                target = dyn[:, 1 + h - 1]
                wc = w[..., None]
                table[f"h{h}/rmse"] = jnp.mean(M.root_mean_squared_error(
                    target, jnp.mean(pe, 0), wc, dim=(-3, -2, -1)))
                table[f"h{h}/crps"] = jnp.mean(M.crps_ensemble(
                    target, pe, wc, dim=(-3, -2, -1)))
                table[f"h{h}/ssr"] = jnp.mean(M.spread_skill_ratio(
                    target, pe, wc, dim=(-3, -2, -1)))
                table[f"h{h}/rmse_persistence"] = jnp.mean(M.root_mean_squared_error(
                    target, dyn[:, 0], wc, dim=(-3, -2, -1)))
                table[f"h{h}/rmse_climatology"] = jnp.mean(M.root_mean_squared_error(
                    target, jnp.broadcast_to(clim_field, target.shape), wc,
                    dim=(-3, -2, -1)))
            return table
        return jax.jit(eval_fn)

    def run_eval(exp, params, E, seed=0):
        fn = make_eval(exp, E)
        aux = exp.aux_params
        tables = []
        for i, batch in enumerate(dm.val_batches(horizon=HORIZON)):
            t_ = fn(params, aux, jnp.asarray(batch["dynamics"]),
                    jax.random.PRNGKey(seed + i))
            tables.append({k: float(v) for k, v in t_.items()})
            if len(tables) >= P["eval_batches"]:
                break
        return {k: float(np.mean([t[k] for t in tables])) for k in tables[0]}

    print("== eval: cold vs naive sampling, calibration ==", flush=True)
    cold_eval = run_eval(fexp, fc_params, args.ensemble)
    naive_exp = DYffusionForecastingExperiment(
        fmodel, interp, ip_params,
        dataclasses.replace(dcfg, sampling_type="naive"),
        fexp.cfg, dm.in_packer, dm.out_packer, dm.normalizer,
    )
    naive_eval = run_eval(naive_exp, fc_params, args.ensemble)
    report["cold_sampling"] = cold_eval
    report["naive_sampling"] = naive_eval
    # calibration regression gate (round-4 verdict item #4): a well-calibrated
    # ensemble has SSR ~ 1 at EVERY horizon (reference's paper-level claim;
    # spread knobs = interpolator dropout rate x prediction_inputs_noise).
    # The validated chaotic-system recipe lives in
    # results/skill_chaotic_calibrated/README.md. Ceiling tightened 1.2 ->
    # 1.15 (round 5): the achieved band is 0.80-1.07 and the centering study
    # (results/skill_chaotic_centered) showed the floor margin cannot be
    # bought without paying RMSE — matched-rate dropout training
    # self-calibrates back to the same under-dispersed fixed point.
    ssr_lo, ssr_hi = 0.8, 1.15
    report["calibration"] = {
        "ssr_bounds": [ssr_lo, ssr_hi],
        "cold_ssr": {f"h{h}": cold_eval[f"h{h}/ssr"]
                     for h in range(1, HORIZON + 1)},
        "pass": all(ssr_lo <= cold_eval[f"h{h}/ssr"] <= ssr_hi
                    for h in range(1, HORIZON + 1)),
    }
    src = dm._val_src
    K = src._modes.shape[1]
    if hasattr(src, "conditional_forecast_std"):
        # OU: analytic irreducible spread at each horizon (field units:
        # per-mode std * sqrt(K) since modes are unit-RMS)
        report["analytic_spread"] = {
            f"h{h}": src.conditional_forecast_std(h) * float(np.sqrt(K))
            for h in range(1, HORIZON + 1)
        }
    if hasattr(src, "empirical_growth_factor"):
        # chaotic: measured perturbation growth per horizon (>1 = positive
        # Lyapunov exponent; the dropout-spread amplification regime)
        report["perturbation_growth"] = {
            f"h{h}": src.empirical_growth_factor(h)
            for h in range(1, HORIZON + 1)
        }
    print("cold:", json.dumps({k: round(v, 4) for k, v in cold_eval.items()}, indent=1),
          flush=True)
    print("naive:", json.dumps({k: round(v, 4) for k, v in naive_eval.items()}, indent=1),
          flush=True)

    # ------------------------------------------------------ rollout stability
    print(f"== rollout stability ({args.rollout_steps} AR steps) ==", flush=True)
    stepper = DYffusionStepper(fexp, fc_params, inputs_noise=args.inputs_noise,
                               params_dtype=args.params_dtype,
                               preds_dtype=args.preds_dtype)
    seg = min(args.rollout_steps, 12 * HORIZON)
    # build normalized initial state (B=1, H, W, C)
    frame0 = dm._val_src.read_window(0, 1, dm.cfg.in_names)
    x0_raw = jnp.asarray(np.stack([frame0[n][0] for n in dm.cfg.in_names], -1))[None]
    x = dm.normalizer.normalize(x0_raw)
    done = 0
    max_abs_per_window, rmse_clim_end = [], None
    rng = jax.random.PRNGKey(123)
    while done < args.rollout_steps:
        n = min(seg, args.rollout_steps - done)
        rng, sub = jax.random.split(rng)
        x, preds = stepper.run_window(x, None, None, None, sub, n,
                                      apply_inputs_noise=(done == 0))
        max_abs_per_window.append(float(jnp.max(jnp.abs(preds))))
        done += n
    final_raw = out_norm.denormalize(preds[:, -1])
    rmse_clim_end = float(jnp.mean(M.root_mean_squared_error(
        jnp.broadcast_to(clim_field, final_raw.shape), final_raw,
        w[..., None], dim=(-3, -2, -1))))
    # stability threshold relative to the TRUE data's normalized range: a
    # rollout is stable when it stays within 3x the data's own max |state|
    # (and finite) — an absolute cut-off would mislabel bounded drift
    data_win = dm._val_src.read_window(0, min(256, dm._val_src.n_timesteps),
                                       dm.cfg.in_names)
    data_raw = jnp.asarray(np.stack([data_win[n] for n in dm.cfg.in_names], -1))
    data_max = float(jnp.max(jnp.abs(dm.normalizer.normalize(data_raw))))
    peak = max(max_abs_per_window)
    report["rollout"] = {
        "n_steps": args.rollout_steps,
        "max_abs_normalized_per_window": max_abs_per_window,
        "max_abs_normalized": peak,
        "data_max_abs_normalized": data_max,
        "final_state_rmse_vs_climatology": rmse_clim_end,
        "stable": bool(np.isfinite(peak) and peak < 3.0 * data_max),
    }
    print(json.dumps(report["rollout"], indent=1), flush=True)
    report["wall_time_s"] = time.time() - t_start
    report["device"] = str(jax.devices()[0])

    # ------------------------------------------------------------ artifacts
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(report, f, indent=1)
    _write_report(args.out, report, HORIZON)
    _plot_curves(args.out, report, HORIZON)
    print(f"report written to {args.out}", flush=True)
    return report


def _write_report(out_dir, r, horizon):
    i = r["interpolator"]
    lines = [
        "# Skill proof: two-stage DYffusion on stochastic spherical dynamics",
        "",
        f"Preset `{r['preset']}`, device `{r.get('device')}`, "
        f"wall time {r.get('wall_time_s', 0):.0f}s.",
        "",
        "System: solid-body rotation (deterministic, learnable) + OU modal noise "
        "(irreducible, closed-form conditional spread). See "
        "`data/datasets.py:StochasticModalTimeSeries`.",
        "",
        "## 1. Interpolator skill",
        "",
        "| metric | value |", "|---|---|",
        f"| val RMSE (ensemble mean) | {i['val_rmse']:.4f} |",
        f"| val CRPS | {i.get('val_crps', float('nan')):.4f} |",
        f"| climatology RMSE | {i['baseline_rmse_climatology']:.4f} |",
        f"| linear-interpolation RMSE | {i['baseline_rmse_linear_interp']:.4f} |",
        f"| skill vs climatology | {i['val_rmse'] / i['baseline_rmse_climatology']:.3f}x |",
        "",
        "## 2. Forecaster: cold vs naive sampling (10-member ensembles)",
        "",
        "| h | cold RMSE | naive RMSE | cold CRPS | naive CRPS | SSR (cold) | persistence | climatology |",
        "|---|---|---|---|---|---|---|---|",
    ]
    c, n = r["cold_sampling"], r["naive_sampling"]
    for h in range(1, horizon + 1):
        lines.append(
            f"| {h} | {c[f'h{h}/rmse']:.4f} | {n[f'h{h}/rmse']:.4f} "
            f"| {c[f'h{h}/crps']:.4f} | {n[f'h{h}/crps']:.4f} "
            f"| {c[f'h{h}/ssr']:.3f} | {c[f'h{h}/rmse_persistence']:.4f} "
            f"| {c[f'h{h}/rmse_climatology']:.4f} |"
        )
    ro = r["rollout"]
    lines += [
        "",
        "## 3. Long-rollout stability",
        "",
        f"{ro['n_steps']} autoregressive steps: max |state| (normalized) = "
        f"{ro['max_abs_normalized']:.2f}, final-state RMSE vs climatology = "
        f"{ro['final_state_rmse_vs_climatology']:.3f} -> "
        f"**{'STABLE' if ro['stable'] else 'UNSTABLE'}**",
        "",
        "![curves](curves_rmse.png)", "![calibration](curves_calibration.png)",
    ]
    with open(os.path.join(out_dir, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _plot_curves(out_dir, r, horizon):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    hs = list(range(1, horizon + 1))
    c, n = r["cold_sampling"], r["naive_sampling"]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(hs, [c[f"h{h}/rmse"] for h in hs], "o-", label="cold sampling")
    ax.plot(hs, [n[f"h{h}/rmse"] for h in hs], "s-", label="naive sampling")
    ax.plot(hs, [c[f"h{h}/rmse_persistence"] for h in hs], "--", label="persistence")
    ax.plot(hs, [c[f"h{h}/rmse_climatology"] for h in hs], ":", label="climatology")
    ax.set_xlabel("horizon step"); ax.set_ylabel("area-weighted RMSE")
    ax.legend(); ax.set_title("Ensemble-mean forecast RMSE")
    fig.tight_layout(); fig.savefig(os.path.join(out_dir, "curves_rmse.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(hs, [c[f"h{h}/ssr"] for h in hs], "o-", label="SSR (cold)")
    ax.axhline(1.0, color="k", lw=0.8, ls="--", label="perfect calibration")
    ax.set_xlabel("horizon step"); ax.set_ylabel("spread/skill ratio")
    ax.legend(); ax.set_title("Ensemble calibration")
    fig.tight_layout(); fig.savefig(os.path.join(out_dir, "curves_calibration.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(r["interpolator"]["train_loss"], label="interpolator")
    ax.plot(r["forecaster"]["train_loss"], label="forecaster")
    ax.set_xlabel("epoch"); ax.set_ylabel("train loss"); ax.legend()
    fig.tight_layout(); fig.savefig(os.path.join(out_dir, "curves_train.png"), dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()
