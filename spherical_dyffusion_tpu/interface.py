"""Factory interface: config dicts -> datamodules, models, experiments.

Equivalent of the reference src/interface.py (get_lightning_module:27,
get_datamodule:63, get_model_and_data:90, reload_model_from_config_and_ckpt:121)
without Hydra: plain dict configs (see utils/config.py) drive construction,
and checkpoints embed the full config so experiments can be rebuilt from the
file alone (the property MultiStepStepper.from_state relies on,
stepper_multistep.py:228-295).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .data import DataModuleConfig, DebugDataModule, FV3GFSDataModule
from .diffusion import DYffusionConfig
from .models import SFNO, SFNOConfig, UNet, UNetConfig
from .training import (
    DYffusionForecastingExperiment,
    ExperimentConfig,
    InterpolationExperiment,
    SimultaneousForecastingExperiment,
)

__all__ = [
    "get_datamodule",
    "get_model",
    "get_experiment",
    "save_experiment_checkpoint",
    "load_experiment_checkpoint",
]


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in fields}


def get_datamodule(cfg: Dict[str, Any]):
    """cfg['datamodule'] -> datamodule (reference interface.get_datamodule)."""
    dm_cfg = dict(cfg["datamodule"])
    kind = dm_cfg.pop("kind", "debug")
    if kind == "debug":
        return DebugDataModule(**dm_cfg)
    if kind == "fv3gfs":
        return FV3GFSDataModule(DataModuleConfig(**_filter_kwargs(DataModuleConfig, dm_cfg)))
    raise ValueError(f"Unknown datamodule kind {kind!r}")


def get_model(
    model_cfg: Dict[str, Any],
    img_shape: Tuple[int, int],
    in_chans: int,
    out_chans: int,
    with_time_emb: bool,
    min_time: float = 0.0,
    max_time: float = 1000.0,
):
    cfg = dict(model_cfg)
    kind = cfg.pop("kind", "sfno")
    if kind == "sfno":
        c = SFNOConfig(
            img_shape=tuple(img_shape), in_chans=in_chans, out_chans=out_chans,
            with_time_emb=with_time_emb, min_time=min_time, max_time=max_time,
            **_filter_kwargs_dc(SFNOConfig, cfg),
        )
        return SFNO(c)
    if kind == "unet":
        c = UNetConfig(
            img_shape=tuple(img_shape), in_chans=in_chans, out_chans=out_chans,
            with_time_emb=with_time_emb, **_filter_kwargs_dc(UNetConfig, cfg),
        )
        return UNet(c)
    raise ValueError(f"Unknown model kind {kind!r}")


def _filter_kwargs_dc(cls, d):
    fields = {f.name for f in dataclasses.fields(cls)}
    drop = {"img_shape", "in_chans", "out_chans", "with_time_emb", "min_time", "max_time"}
    return {k: v for k, v in d.items() if k in fields and k not in drop}


def get_experiment(
    cfg: Dict[str, Any],
    dm,
    interpolator: Optional[InterpolationExperiment] = None,
    interpolator_params=None,
    interpolator_ema_params=None,
):
    """Build the experiment named by cfg['experiment'] over datamodule dm."""
    kind = cfg.get("experiment", "interpolation")
    module_cfg = cfg.get("module", {})
    horizon = dm.cfg.horizon
    exp_cfg = ExperimentConfig(
        horizon=horizon,
        window=dm.cfg.window,
        loss_function=module_cfg.get("loss_function", "l1"),
        num_predictions=module_cfg.get("num_predictions", 10),
        enable_inference_dropout=module_cfg.get("enable_inference_dropout", False),
        prediction_inputs_noise=float(
            module_cfg.get("prediction_inputs_noise", 0.0) or 0.0
        ),
    )
    C = len(dm.cfg.in_names)
    CF = len(dm.cfg.forcing_names)
    HW = dm._source("train").spatial_shape
    model_cfg = cfg.get("model", {})

    if kind == "interpolation":
        model = get_model(
            model_cfg, HW, (dm.cfg.window + 1) * C + CF * dm.cfg.window,
            len(dm.cfg.out_names), with_time_emb=True, min_time=1, max_time=horizon - 1,
        )
        return InterpolationExperiment(model, exp_cfg, dm.in_packer, dm.out_packer,
                                       dm.normalizer)

    if kind == "dyffusion":
        dcfg = DYffusionConfig(
            timesteps=horizon,
            **_filter_kwargs_dc2(DYffusionConfig, cfg.get("diffusion", {})),
        )
        if interpolator is None or interpolator_params is None:
            ip_path = cfg.get("diffusion", {}).get("interpolator_checkpoint_path")
            if not ip_path:
                raise ValueError(
                    "dyffusion needs an interpolator (pass one or set "
                    "diffusion.interpolator_checkpoint_path)"
                )
            interpolator, interpolator_params, interpolator_ema_params, _ = (
                load_experiment_checkpoint(ip_path, dm=dm)
            )
        cond_ch = C if dcfg.forward_conditioning == "data" else 0
        model = get_model(
            model_cfg, HW, C + CF + cond_ch, len(dm.cfg.out_names),
            with_time_emb=True, min_time=0, max_time=horizon - 1,
        )
        return DYffusionForecastingExperiment(
            model, interpolator, interpolator_params, dcfg, exp_cfg,
            dm.in_packer, dm.out_packer, dm.normalizer,
            forcing_names=dm.cfg.forcing_names, forcing_normalizer=dm.forcing_normalizer,
            interpolator_ema_params=interpolator_ema_params,
        )

    if kind == "simultaneous":
        hao = module_cfg.get("horizon_at_once") or horizon
        model = get_model(
            model_cfg, HW, dm.cfg.window * C + CF, hao * len(dm.cfg.out_names),
            with_time_emb=False,
        )
        return SimultaneousForecastingExperiment(
            model, exp_cfg, dm.in_packer, dm.out_packer, dm.normalizer,
            horizon_at_once=hao,
            autoregressive_loss_weights=module_cfg.get("autoregressive_loss_weights"),
        )

    raise ValueError(f"Unknown experiment {kind!r}")


def _filter_kwargs_dc2(cls, d):
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in fields}


# --------------------------------------------------------------------------
# checkpointing with embedded config (Lightning-ckpt analog)
# --------------------------------------------------------------------------


def save_experiment_checkpoint(path: str, state, config: Dict[str, Any]):
    """Save params (+EMA) with the full config embedded, so the experiment can
    be rebuilt from the file (reference on_save_checkpoint embeds hparams,
    _base_experiment.py:1244-1259)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def strip_constants(tree):
        # "constants" (SHT matrices etc.) are regenerated at load time; saving
        # them would add ~100MB+ of redundant data per checkpoint
        got = jax.device_get(tree)
        if isinstance(got, dict) and "constants" in got:
            got = {k: v for k, v in got.items() if k != "constants"}
        return serialization.to_state_dict(got)

    payload = {
        "params": strip_constants(state.params),
        "ema_params": (
            strip_constants(state.ema.params)
            if getattr(state, "ema", None) is not None else None
        ),
        # optimizer state (adam moments + schedule counts) makes mid-training
        # resume exact — the reference's Lightning ckpts carry
        # optimizer_states the same way; inference loading ignores this key
        "opt_state": (
            serialization.to_state_dict(jax.device_get(state.opt_state))
            if getattr(state, "opt_state", None) is not None else None
        ),
        "step": int(state.step),
        "config_json": json.dumps(config),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_experiment_checkpoint(
    path: str,
    overrides: Optional[Dict[str, Any]] = None,
    dm=None,
):
    """Rebuild (experiment, params, ema_params, config) from a checkpoint,
    deep-merging ``overrides`` into the stored config (the reference inference
    'overrides:' mechanism, stepper_multistep.py:244)."""
    from .utils.config import deep_update
    from .utils.checkpointing import resolve_checkpoint_path

    path = resolve_checkpoint_path(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    config = json.loads(payload["config_json"])
    if overrides:
        config = deep_update(config, overrides)
    if dm is None:
        dm = get_datamodule(config)
    exp = get_experiment(config, dm)
    # restore leaves into a freshly-initialized param structure
    params = _restore_params(exp, dm, payload["params"])
    ema = payload.get("ema_params")
    ema_params = _restore_params(exp, dm, ema) if ema else None
    return exp, params, ema_params, config


def _restore_params(exp, dm, state_dict):
    """Initialize the experiment's model to get the param structure, then load
    the saved leaves into it."""
    from .training.trainer import Trainer, TrainerConfig

    tr = Trainer(exp, dm, TrainerConfig(epochs=0, steps_per_epoch=1))
    batch = next(iter(dm.train_batches()))
    dyn = jnp.asarray(batch["dynamics"][:1])
    dyn = exp.normalizer.normalize(dyn)
    template = tr._init_params(jax.random.PRNGKey(0), dyn, batch)
    # constants were stripped at save; restore trainable leaves and keep the
    # freshly-built constants from the template
    if isinstance(template, dict) and "constants" in template:
        restored = dict(template)
        restored["params"] = serialization.from_state_dict(
            template["params"], state_dict.get("params", state_dict)
        )
        return restored
    return serialization.from_state_dict(template, state_dict)
