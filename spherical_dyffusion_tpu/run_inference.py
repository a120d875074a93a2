"""Inference CLI: YAML config -> autoregressive rollout with metrics/writers.

Equivalent of the reference run_inference.py + inference/inference.py:206-324:
loads a checkpoint (rebuilding the experiment from the embedded config with
optional ``overrides:`` deep-merged in), constructs aggregators and data
writers, runs the windowed rollout and reports steps/sec + metric logs.

Usage:
    python -m spherical_dyffusion_tpu.run_inference config.yaml [k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import List, Optional


def main_from_config(cfg: dict) -> dict:
    import jax

    from .parallel.multihost import maybe_init_multihost

    # pod wireup (opt-in via SPHDY_MULTIHOST / SPHDY_COORDINATOR) — must
    # precede the first jax computation
    maybe_init_multihost()
    if cfg.get("platform"):
        jax.config.update("jax_platforms", str(cfg["platform"]))

    from .data.datasets import NetCDFTimeSeries, SyntheticTimeSeries
    from .evaluation.aggregators import InferenceAggregator
    from .inference import (
        DataWriter,
        DataWriterConfig,
        DYffusionStepper,
        InferenceConfig,
        PrescriberConfig,
        run_inference,
    )
    from .interface import load_experiment_checkpoint

    ckpt_path = cfg["checkpoint_path"]

    # native ACE-format torch checkpoints ({"stepper":
    # SingleModuleStepper.get_state()}, reference ace train.py:364) are
    # self-contained — weights, normalizer, physics configs, area, sigma —
    # and load directly into a ready SingleStepStepper
    if cfg.get("stepper_type", "dyffusion") == "ace":
        _guard_ace_knobs(cfg)  # cheap checks BEFORE any checkpoint load
        ck = _load_if_ace_torch_checkpoint(ckpt_path)
        if ck is not None:
            from .interface import load_ace_stepper_checkpoint

            stepper, _ace_cfg = load_ace_stepper_checkpoint(
                ckpt_path, _preloaded=ck
            )
            stepper = _apply_ace_physics_overrides(cfg, stepper)
            if cfg.get("params_dtype"):
                stepper.params = _cast_tree_jit(stepper.params,
                                                cfg["params_dtype"])
            import numpy as _np

            source, n_repeats = _ace_source(
                cfg, list(stepper.cfg.all_names),
                tuple(_np.asarray(stepper.area).shape),
            )
            return _run_ace_rollout(cfg, stepper, source, n_repeats)

    exp, params, ema_params, full_cfg = load_experiment_checkpoint(
        ckpt_path, overrides=cfg.get("overrides")
    )
    use_ema = bool(cfg.get("use_ema", True)) and ema_params is not None

    # ACE product path: any one-step experiment checkpoint drives the scanned
    # SingleStepStepper with optional corrector/prescribed-ocean physics
    # (reference ace_inference/inference/inference.py:206-324 over
    # SingleModuleStepper instead of the DYffusion MultiStepStepper)
    if cfg.get("stepper_type", "dyffusion") == "ace":
        return _run_ace_from_checkpoint(
            cfg, exp, ema_params if use_ema else params, full_cfg
        )

    prescriber = None
    p_cfg = cfg.get("prescriber") or full_cfg.get("datamodule", {}).get("prescriber")
    mask_name = None
    if p_cfg:
        pc = PrescriberConfig(
            prescribed_name=p_cfg["prescribed_name"], mask_name=p_cfg["mask_name"],
            mask_value=p_cfg.get("mask_value", 1),
            interpolate=p_cfg.get("interpolate", False),
        )
        prescriber = pc.build(list(exp.out_packer.names))
        mask_name = pc.mask_name

    stepper = DYffusionStepper(exp, params, prescriber=prescriber,
                               use_ema_params=use_ema, ema_params=ema_params,
                               params_dtype=cfg.get("params_dtype"),
                               preds_dtype=cfg.get("preds_dtype"))

    loader_cfg = cfg.get("validation_loader", {})
    data_path = loader_cfg.get("dataset", {}).get("data_path")
    if data_path and os.path.exists(data_path):
        source = NetCDFTimeSeries(data_path)
    else:
        # synthetic fallback for smoke runs without the FV3GFS dataset
        names = list(dict.fromkeys(
            list(exp.in_packer.names) + list(exp.forcing_names)
            + ([mask_name] if mask_name else [])
        ))
        source = SyntheticTimeSeries(
            names, n_timesteps=int(cfg.get("forward_steps_in_memory", 50)) + 1,
            spatial_shape=exp.model.cfg.img_shape,
        )

    icfg = InferenceConfig(
        n_forward_steps=int(cfg.get("n_forward_steps", 100)),
        forward_steps_in_memory=int(cfg.get("forward_steps_in_memory", 50)),
        n_ensemble=int(cfg.get("n_ensemble", 1)),
        n_repeats=int(loader_cfg.get("dataset", {}).get("n_repeats", 1) or 1)
        if data_path else max(4, int(cfg.get("n_forward_steps", 100))),
        seed=int(cfg.get("seed", 0)),
    )

    out_dir = cfg.get("experiment_dir", "results/inference")
    os.makedirs(out_dir, exist_ok=True)
    hc = source.horizontal
    agg = InferenceAggregator(
        list(exp.out_packer.names), hc.area_weights(),
        log_zonal_mean_images=bool(cfg.get("log_zonal_mean_images", True)),
        log_video=bool(cfg.get("log_video", False)),
        # training-normalization stats give every metric its `_normed`
        # variant (reference MeanAggregator normed metrics)
        normalizer=exp.normalizer.subset(list(exp.out_packer.names)),
    )
    w_cfg = cfg.get("data_writer", {})
    writer = DataWriter(
        DataWriterConfig(
            save_prediction_files=bool(w_cfg.get("save_prediction_files", False)),
            save_histogram_files=bool(w_cfg.get("save_histogram_files", False)),
            log_extended_video_netcdfs=bool(w_cfg.get("log_extended_video_netcdfs", False)),
            save_raw_prediction_names=w_cfg.get("save_raw_prediction_names"),
            time_coarsen_factor=w_cfg.get("time_coarsen_factor"),
        ),
        out_dir, list(exp.out_packer.names), hc.lat, hc.lon, icfg.n_ensemble,
    )

    summary = run_inference(
        stepper, source, icfg, aggregator=agg, writer=writer,
        mask_name=mask_name, verbose=bool(cfg.get("verbose", True)),
    )
    writer.close()
    logs = agg.get_logs()
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({**summary, **logs}, f, indent=1)
    # per-timestep metric replay (reference inference.py:300-313 logs every
    # rollout step to wandb with step=i; locally this lands in the JSONL
    # logger and mirrors to wandb when configured)
    if cfg.get("log_per_timestep", True):
        from .utils.loggers import JsonlLogger

        logger = JsonlLogger(out_dir)
        logger.log_hyperparams(cfg)
        logger.log({**summary}, step=0)
        for entry in agg.get_inference_logs():
            logger.log(entry, step=int(entry["timestep"]))
        logger.finish()
    _save_media(agg, list(exp.out_packer.names), out_dir)
    print(json.dumps({k: round(float(v), 5) for k, v in summary.items()}))
    return {"summary": summary, "logs": logs, "aggregator": agg}


def _save_media(agg, names, out_dir: str) -> None:
    """Snapshot panels, zonal-mean Hovmoellers and rollout videos (reference
    snapshot/zonal-mean/video artifacts); media must never kill a rollout."""
    try:
        if agg.snapshots.snapshots:
            from .evaluation.plots import plot_snapshot_panels

            plot_snapshot_panels(agg.snapshots.snapshots, names,
                                 os.path.join(out_dir, "snapshots"))
        if agg.zonal is not None and agg.zonal.get_maps() is not None:
            from .evaluation.plots import plot_zonal_mean_hovmoeller

            pz, tz = agg.zonal.get_maps()
            plot_zonal_mean_hovmoeller(pz, tz, names,
                                       os.path.join(out_dir, "zonal_means"))
        if agg.video is not None:
            agg.video.save(os.path.join(out_dir, "videos.nc"))
    except Exception as e:
        print(f"[media] skipped: {e}")


def _load_if_ace_torch_checkpoint(path: str):
    """torch.load ``path`` and return the loaded dict when it is a native
    ACE-format checkpoint (its 'stepper' — or the dict itself — carries
    'module' weights and the stepper 'config'); None otherwise. Loading once
    here and passing the dict through avoids a second multi-hundred-MB
    deserialization in the loader."""
    from .utils.torch_convert import is_torch_checkpoint

    if not is_torch_checkpoint(path):
        return None
    import torch

    try:
        ck = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        return None
    if not isinstance(ck, dict):
        return None
    state = ck.get("stepper", ck)
    if isinstance(state, dict) and "module" in state and "config" in state:
        return ck
    return None


def _ocean_cfg_from(o: dict):
    """prescriber/ocean config block -> OceanConfig (shared mapping + the
    loud mask_value guard)."""
    from .inference.ocean import OceanConfig, SlabOceanConfig

    if int(o.get("mask_value", 1)) != 1:
        raise ValueError(
            "the ACE ocean prescribes where round(mask) == 1; "
            f"mask_value={o['mask_value']} would be silently inverted — "
            "invert the mask variable instead"
        )
    slab = o.get("slab")
    return OceanConfig(
        o.get("surface_temperature_name") or o.get("prescribed_name"),
        o.get("ocean_fraction_name") or o.get("mask_name"),
        interpolate=bool(o.get("interpolate", False)),
        slab=SlabOceanConfig(**slab) if slab else None,
    )


def _sigma_from(sg: dict):
    import numpy as np

    from .data.coords import SigmaCoordinates

    return SigmaCoordinates(ak=np.asarray(sg["ak"], np.float64),
                            bk=np.asarray(sg["bk"], np.float64))


def _apply_ace_physics_overrides(cfg: dict, stepper):
    """Explicit corrector/ocean/sigma keys in the run config override the
    checkpoint's embedded physics (the native loader uses the embedded ones;
    silently ignoring the user's keys would run different physics than
    asked)."""
    import dataclasses as _dc

    o = cfg.get("ocean") or cfg.get("prescriber")
    co = cfg.get("corrector")
    sg = cfg.get("sigma_coordinates")
    if not (o or co or sg):
        return stepper
    from .data.normalization import StandardNormalizer
    from .inference import SingleStepStepper, SingleStepStepperConfig
    from .inference.corrector import CorrectorConfig

    ocean_cfg = _ocean_cfg_from(o) if o else stepper.cfg.ocean
    corrector_cfg = CorrectorConfig(**co) if co else stepper.cfg.corrector
    sigma = _sigma_from(sg) if sg else stepper.sigma
    new_cfg = SingleStepStepperConfig(
        in_names=list(stepper.cfg.in_names),
        out_names=list(stepper.cfg.out_names),
        loss=stepper.cfg.loss, corrector=corrector_cfg, ocean=ocean_cfg,
    )
    # extend the normalizer with identity stats for any NEW physics-only
    # fields the override introduces (e.g. a different ocean mask name)
    st = stepper.normalizer.get_state()
    means, stds = dict(st["means"]), dict(st["stds"])
    all_names = list(dict.fromkeys(
        list(stepper.normalizer.names) + list(new_cfg.all_names)
    ))
    for n in all_names:
        means.setdefault(n, 0.0)
        stds.setdefault(n, 1.0)
    normalizer = StandardNormalizer.from_dicts(
        {n: means[n] for n in all_names}, {n: stds[n] for n in all_names},
        all_names,
    )
    return SingleStepStepper(new_cfg, stepper.model_fn, stepper.params,
                             normalizer, stepper.area, sigma=sigma)


def _guard_ace_knobs(cfg: dict) -> None:
    for k in ("n_ensemble", "preds_dtype"):
        if cfg.get(k) not in (None, 1):
            raise ValueError(
                f"{k!r} is not supported on the ACE path (deterministic "
                "single-member stepper; SteppedData carries full-precision "
                "fields) — drop the key or use the DYffusion stepper"
            )


def _cast_tree_jit(tree, dtype: str):
    """One jitted cast program for a whole param tree (per-leaf eager casts
    are one tunnel dispatch each; see DYffusionStepper.params_dtype)."""
    import jax
    import jax.numpy as jnp

    pd = jnp.dtype(dtype)
    return jax.jit(lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(pd)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t
    ))(tree)


def _ace_source(cfg: dict, names, spatial_shape):
    """Validation source for an ACE rollout: the configured netCDF dataset,
    else a synthetic fallback over ``names`` on ``spatial_shape``."""
    from .data.datasets import NetCDFTimeSeries, SyntheticTimeSeries

    loader_cfg = cfg.get("validation_loader", {})
    data_path = loader_cfg.get("dataset", {}).get("data_path")
    n_steps = int(cfg.get("n_forward_steps", 100))
    if data_path and os.path.exists(data_path):
        return NetCDFTimeSeries(data_path), int(
            loader_cfg.get("dataset", {}).get("n_repeats", 1) or 1
        )
    source = SyntheticTimeSeries(
        list(names),
        n_timesteps=int(cfg.get("forward_steps_in_memory", 50)) + 1,
        spatial_shape=tuple(spatial_shape),
    )
    return source, max(4, n_steps)


def _run_ace_from_checkpoint(cfg: dict, exp, params, full_cfg: dict) -> dict:
    """Build a SingleStepStepper around a loaded one-step experiment and run
    the windowed ACE rollout with aggregator + writers."""
    import jax.numpy as jnp

    from .data.normalization import StandardNormalizer
    from .inference import SingleStepStepper, SingleStepStepperConfig
    from .inference.corrector import CorrectorConfig

    if getattr(exp, "horizon_at_once", 1) != 1:
        raise ValueError(
            "stepper_type=ace needs a one-step model "
            f"(horizon_at_once={exp.horizon_at_once})"
        )
    if getattr(exp.cfg, "window", 1) != 1:
        raise ValueError(
            "stepper_type=ace needs a single-frame input window "
            f"(window={exp.cfg.window})"
        )
    state_names = list(exp.in_packer.names)
    out_names = list(exp.out_packer.names)
    forcing_names = [n for n in (getattr(exp, "forcing_names", None) or [])
                     if n not in state_names]
    in_names = state_names + forcing_names

    _guard_ace_knobs(cfg)

    # same fallback order as the DYffusion branch: explicit config, else the
    # checkpoint datamodule's prescriber — a ckpt trained with prescribed SST
    # must not silently roll out free-running
    o = (cfg.get("ocean") or cfg.get("prescriber")
         or full_cfg.get("datamodule", {}).get("prescriber"))
    ocean_cfg = _ocean_cfg_from(o) if o else None
    corr = cfg.get("corrector")
    corrector_cfg = CorrectorConfig(**corr) if corr else None

    # one normalizer over every name the stepper touches: training stats for
    # model variables, identity for physics-only fields (e.g. the ocean mask)
    means = dict(exp.normalizer.get_state()["means"])
    stds = dict(exp.normalizer.get_state()["stds"])
    fnorm = getattr(exp, "forcing_normalizer", None)
    if fnorm is not None:
        means.update(fnorm.get_state()["means"])
        stds.update(fnorm.get_state()["stds"])
    all_names = list(dict.fromkeys(
        in_names + out_names + (list(ocean_cfg.names) if ocean_cfg else [])
    ))
    for n in all_names:
        means.setdefault(n, 0.0)
        stds.setdefault(n, 1.0)
    normalizer = StandardNormalizer.from_dicts(
        {n: means[n] for n in all_names}, {n: stds[n] for n in all_names},
        all_names,
    )

    n_state = len(state_names)
    model = exp.model
    wants_time = bool(getattr(model.cfg, "with_time_emb", False))

    if cfg.get("params_dtype"):
        params = _cast_tree_jit(params, cfg["params_dtype"])

    def model_fn(p, x_norm):
        kwargs = {"deterministic": True}
        if len(forcing_names):
            kwargs["static_condition"] = x_norm[..., n_state:]
        if wants_time:
            kwargs["time"] = jnp.zeros((x_norm.shape[0],))
        return model.apply(p, x_norm[..., :n_state], **kwargs)

    source, n_repeats = _ace_source(cfg, all_names, exp.model.cfg.img_shape)
    sg = cfg.get("sigma_coordinates")
    sigma = _sigma_from(sg) if sg else source.sigma

    stepper = SingleStepStepper(
        SingleStepStepperConfig(
            in_names=in_names, out_names=out_names,
            corrector=corrector_cfg, ocean=ocean_cfg,
        ),
        model_fn, params, normalizer,
        source.horizontal.area_weights(), sigma=sigma,
    )

    return _run_ace_rollout(cfg, stepper, source, n_repeats)


def _run_ace_rollout(cfg: dict, stepper, source, n_repeats: int) -> dict:
    """Shared tail of both ACE entry paths (experiment-ckpt adapter and
    native ACE-format ckpt): aggregator + writers + media + metrics.json."""
    from .evaluation.aggregators import InferenceAggregator
    from .inference import (
        DataWriter,
        DataWriterConfig,
        ace_scored_names,
        run_ace_inference,
    )

    out_names = list(stepper.cfg.out_names)
    n_steps = int(cfg.get("n_forward_steps", 100))
    out_dir = cfg.get("experiment_dir", "results/inference_ace")
    os.makedirs(out_dir, exist_ok=True)
    derived = bool(cfg.get("derived", False))
    scored = ace_scored_names(stepper, source, derived=derived)
    hc = source.horizontal
    agg = InferenceAggregator(
        scored, hc.area_weights(),
        log_zonal_mean_images=bool(cfg.get("log_zonal_mean_images", True)),
    )
    w_cfg = cfg.get("data_writer", {})
    writer = DataWriter(
        DataWriterConfig(
            save_prediction_files=bool(w_cfg.get("save_prediction_files", False)),
            save_histogram_files=bool(w_cfg.get("save_histogram_files", False)),
            log_extended_video_netcdfs=bool(w_cfg.get("log_extended_video_netcdfs", False)),
            save_raw_prediction_names=w_cfg.get("save_raw_prediction_names"),
            time_coarsen_factor=w_cfg.get("time_coarsen_factor"),
        ),
        out_dir, out_names, hc.lat, hc.lon, n_ensemble=1,
    )
    summary = run_ace_inference(
        stepper, source, n_forward_steps=n_steps,
        forward_steps_in_memory=int(cfg.get("forward_steps_in_memory", 50)),
        n_repeats=n_repeats, aggregator=agg,
        writer=writer if writer.writers else None, derived=derived,
        verbose=bool(cfg.get("verbose", True)),
    )
    writer.close()
    logs = agg.get_logs()
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({**summary, **logs}, f, indent=1)
    _save_media(agg, scored, out_dir)
    print(json.dumps({k: round(float(v), 5) for k, v in summary.items()}))
    return {"summary": summary, "logs": logs, "aggregator": agg}


def main(argv: Optional[List[str]] = None):
    from .utils.config import load_config

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        raise SystemExit("usage: run_inference <config.yaml> [k=v ...]")
    cfg = load_config(argv[0], argv[1:])
    main_from_config(cfg)


if __name__ == "__main__":
    main()
