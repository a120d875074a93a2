"""Paper-scale 10-year product-rollout artifact (round-2 verdict #5).

Runs the REAL inference product path — run_inference with the device-resident
fused aggregator consuming every window — for a full 10-simulated-year
rollout (14,600 6-hourly steps, the north-star path of the reference's
configs/inference/ckpts_from_huggingface_10years.yaml:3-14) at the paper
configuration (SFNO embed 256 x 8 dhconv, DYffusion horizon 6, 35 channels +
2 forcings at 180x360, prescribed SST), and commits:

* throughput + host-fraction table (data loading / device / writer+agg),
* the aggregator's time-mean metric logs,
* numerical-range evidence per window (finite-ness; max |state|).

Weights are randomly initialized (no released checkpoints exist in this
environment), so the metric VALUES are not scientific — the artifact proves
the production path end to end at scale. The trained-model stability
evidence over the same 14,600 steps lives in results/stability_10yr/
(scripts/skill_proof.py --rollout-steps 14600 on the skill-proof system).

Usage: python scripts/rollout_10yr.py [--steps 14600] [--window 96]
       [--out results/rollout_10yr] [--writer] [--fast]

Round-5 refresh: defaults now match the round-4 headline program
(scan_layers + peel_sampler, window 96, bf16-emitted predictions); --fast
adds the skill-validated fast configuration (CP rank 0.25 + spectral
truncation 0.8 + bf16 spectral IO, results/skill_fast08 + skill_spectral_io).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=14600)
    ap.add_argument("--window", type=int, default=96,
                    help="single-member window 96 fits the consumer path "
                         "(auto_window_cap guards the resident-preds HBM "
                         "estimate; bf16-emitted preds halve it)")
    ap.add_argument("--out", default="results/rollout_10yr")
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--writer", action="store_true",
                    help="also persist predictions via the netCDF writer "
                         "(tunnel-bandwidth bound; off by default)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype (bfloat16 default matches bench; "
                         "equivalence study in results/precision_bf16)")
    ap.add_argument("--params-dtype", default=None,
                    help="weight STORAGE dtype (bfloat16 halves weight HBM "
                         "reads; identical numerics under bf16 compute)")
    ap.add_argument("--preds-dtype", default="bfloat16",
                    help="emitted-prediction dtype (bfloat16 halves the "
                         "resident window buffer + fetch bytes; the AR "
                         "hand-off stays full precision)")
    ap.add_argument("--no-scan-layers", dest="scan_layers",
                    action="store_false",
                    help="revert to unrolled middle blocks (round-4 default "
                         "is the scanned layout)")
    ap.add_argument("--no-peel", dest="peel", action="store_false",
                    help="revert the peeled sampler (NEVER peel without "
                         "scan_layers at paper scale — remote-compile hang)")
    ap.add_argument("--fast", action="store_true",
                    help="skill-validated fast config: CP rank 0.25 + "
                         "spectral truncation 0.8 + bf16 spectral IO "
                         "(results/skill_fast08, skill_spectral_io)")
    ap.add_argument("--targets-dtype", default="float32",
                    help="dtype of the pre-uploaded target windows the "
                         "device aggregator reduces against (bfloat16 "
                         "halves target upload bytes + HBM residency; "
                         "metrics quantize the truth to bf16 — see "
                         "InferenceConfig.targets_dtype)")
    args = ap.parse_args(argv)
    if args.peel and not args.scan_layers:
        ap.error("--no-scan-layers requires --no-peel (peel without scanned "
                 "blocks is the documented remote-compile hang)")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from bench import STEPS_PER_SIM_YEAR, build
    from spherical_dyffusion_tpu.data import SyntheticTimeSeries
    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator
    from spherical_dyffusion_tpu.inference import (
        DataWriter,
        DataWriterConfig,
        InferenceConfig,
        run_inference,
    )

    os.makedirs(args.out, exist_ok=True)
    fast = dict(factorization="cp", rank=0.25, thresh=0.8,
                spectral_io="bfloat16") if args.fast else {}
    stepper, in_names, forcing_names = build(args.embed, args.layers,
                                             args.dtype,
                                             params_dtype=args.params_dtype,
                                             preds_dtype=args.preds_dtype,
                                             scan_layers=args.scan_layers,
                                             peel=args.peel, **fast)
    names = in_names + forcing_names + ["ocean_fraction"]
    # n_timesteps == window aligns the repeating reads: every window's wrapped
    # offsets coincide, so the per-window forcing/target uploads hit the
    # loop's device-buffer cache (one upload total — also sidesteps the
    # axon-client host-RAM leak per device_put, see inference/loop.py)
    src = SyntheticTimeSeries(names, n_timesteps=args.window,
                              spatial_shape=(180, 360))
    agg = InferenceAggregator(
        list(stepper.exp.out_packer.names), src.horizontal.area_weights(),
        log_zonal_mean_images=True,
    )
    icfg = InferenceConfig(
        n_forward_steps=args.steps, forward_steps_in_memory=args.window,
        n_ensemble=1, n_repeats=args.steps // args.window + 2,
        targets_dtype=args.targets_dtype,
    )
    # warmup compile (window program + fused aggregator reduce) outside timing
    run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=args.window,
                        forward_steps_in_memory=args.window, n_repeats=3,
                        targets_dtype=args.targets_dtype),
        aggregator=InferenceAggregator(
            list(stepper.exp.out_packer.names),
            src.horizontal.area_weights(), log_zonal_mean_images=True),
        mask_name="ocean_fraction", verbose=False,
    )
    writer = None
    if args.writer:
        writer = DataWriter(
            DataWriterConfig(save_prediction_files=True), args.out,
            list(stepper.exp.out_packer.names), src.horizontal.lat,
            src.horizontal.lon, 1,
        )
    t0 = time.time()
    summary = run_inference(stepper, src, icfg, aggregator=agg, writer=writer,
                            mask_name="ocean_fraction", verbose=True)
    if writer is not None:
        writer.close()
    wall = time.time() - t0
    logs = agg.get_logs()
    # numerical-range evidence: the per-timestep rmse series must be finite
    # for all 14,600 steps (a NaN/blow-up at any window would poison it)
    series = agg.reduced.series()
    rmse_rows = series["rmse"]
    finite = bool(np.isfinite(rmse_rows).all())
    sps = summary["total_steps_per_second"]
    artifact = {
        "config": {
            "steps": args.steps, "window": args.window,
            "embed": args.embed, "layers": args.layers,
            "writer": bool(args.writer),
            "scan_layers": args.scan_layers, "peel_sampler": args.peel,
            "fast": bool(args.fast), "dtype": args.dtype,
            "preds_dtype": args.preds_dtype,
            "targets_dtype": args.targets_dtype,
            "note": "random-init weights; production-path evidence "
                    "(throughput, host fractions, aggregator) — trained-model "
                    "stability lives in results/stability_10yr/",
        },
        "throughput": {
            "total_steps": int(summary["n_forward_steps"]),
            "duration_s": round(summary["duration_s"], 1),
            "steps_per_second": round(sps, 3),
            "sim_years_per_day": round(sps * 86400.0 / STEPS_PER_SIM_YEAR, 1),
            "steady_steps_per_second": round(
                summary["steady_steps_per_second"], 3),
            "steady_sim_years_per_day": round(
                summary["steady_steps_per_second"] * 86400.0
                / STEPS_PER_SIM_YEAR, 1),
        },
        "host_fractions": {
            "data_loading": round(
                summary["time/data_loading"] / summary["duration_s"], 4),
            "writer_and_aggregator": round(
                summary["time/writer_and_aggregator"] / summary["duration_s"], 4),
            "device_and_dispatch": round(
                (summary["duration_s"] - summary["time/data_loading"]
                 - summary["time/writer_and_aggregator"]) / summary["duration_s"],
                4),
        },
        "numerics": {
            "all_steps_finite": finite,
            "n_metric_rows": int(rmse_rows.shape[0]),
            "rmse_mean_over_rollout": float(np.nanmean(rmse_rows)),
            "rmse_last_window_mean": float(np.nanmean(rmse_rows[-args.window:])),
        },
        "time_mean_logs": {k: round(float(v), 5) for k, v in logs.items()
                           if "time_mean" in k},
    }
    with open(os.path.join(args.out, "rollout_10yr.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    with open(os.path.join(args.out, "metrics_full.json"), "w") as f:
        json.dump({k: float(v) for k, v in logs.items()}, f, indent=1)
    print(json.dumps(artifact["throughput"] | artifact["host_fractions"]
                     | {"finite": finite, "wall_s": round(wall, 1),
                        "fast": bool(args.fast)}))


if __name__ == "__main__":
    main()
