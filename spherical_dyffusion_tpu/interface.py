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
    "load_reference_checkpoint",
    "load_ace_stepper_checkpoint",
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
            forcing_names=getattr(dm.cfg, "forcing_names", None),
            forcing_normalizer=getattr(dm, "forcing_normalizer", None),
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
    from .utils.torch_convert import is_torch_checkpoint

    path = resolve_checkpoint_path(path)
    if is_torch_checkpoint(path):
        # reference (torch Lightning) checkpoint: same call sites, same return
        # contract — the path run_inference.py uses works unchanged on the
        # published HuggingFace files (stepper_multistep.py:228-295 analog)
        return load_reference_checkpoint(path, overrides=overrides)
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


def _init_sfno_variables(model, img_shape, in_chans):
    """jit-init a model on zeros to obtain the full variables tree (the
    'constants' collection holds the SHT matrices; params are then replaced by
    the converted torch weights). Always jitted — eager init through the TPU
    tunnel is orders of magnitude slower."""
    x = jnp.zeros((1,) + tuple(img_shape) + (in_chans,), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    return jax.jit(lambda r: model.init(r, x, time=t))(jax.random.PRNGKey(0))


def _merge_converted(template, converted_params):
    from .utils.params import adapt_block_layout

    out = dict(template)
    # converted torch weights are always unrolled (block_i); restack when the
    # target model was built with scan_layers=True (and vice versa)
    out["params"] = serialization.from_state_dict(
        template["params"],
        adapt_block_layout(template["params"], converted_params["params"]),
    )
    return out


def load_reference_checkpoint(
    path: str,
    overrides: Optional[Dict[str, Any]] = None,
):
    """Rebuild (experiment, params, ema_params, config) from a REFERENCE
    torch Lightning checkpoint — the published HuggingFace format
    (configs/inference/ckpts_from_huggingface_10years.yaml:19-37).

    Mirrors ``MultiStepStepper.from_state`` + ``load_state``
    (stepper_multistep.py:195-295): hyper_parameters drive the rebuild
    (packers from datamodule_config with forcing names filtered out of the
    in-packer, :222-226; normalizer from the data_dir_stats centering/scaling
    files, :112-131), the module weights convert via ``sfno_torch_to_flax``,
    and for a DYffusion checkpoint the OPERATIVE interpolator weights are the
    ones embedded in the forecaster's own state_dict (load_state_dict
    overwrites the preloaded interpolator, :209).

    ``overrides`` deep-merge into the translated config (the reference
    inference 'overrides:' mechanism); ``overrides['interpolator_model']``
    additionally patches the inferred interpolator architecture, and
    ``overrides['datamodule']['data_dir_stats']`` points at the
    centering/scaling files. Without stats files, unit statistics are used and
    ``config['_unit_normalization'] = True`` flags the result as
    structurally-correct-but-unscaled (parity harness use)."""
    import os as _os

    from .data.normalization import StandardNormalizer, get_normalizer
    from .data.packer import Packer
    from .training.ema import EmaState  # noqa: F401 (re-exported shape)
    from .utils.config import deep_update
    from .utils.torch_convert import (
        ema_backbone_state_dict,
        infer_sfno_architecture,
        load_lightning_checkpoint,
        sfno_torch_to_flax,
        split_reference_state_dict,
        translate_reference_hparams,
    )

    sd, hparams = load_lightning_checkpoint(path)
    config = translate_reference_hparams(hparams)
    if overrides:
        config = deep_update(config, dict(overrides))
    parts = split_reference_state_dict(sd)

    dm_cfg = dict(config.get("datamodule", {}))
    in_names_all = list(dm_cfg.get("in_names", []))
    forcing_names = list(dm_cfg.get("forcing_names", []) or [])
    out_names = list(dm_cfg.get("out_names", []) or in_names_all)
    # the reference stepper filters forcing names out of the state packer
    # (init_packers, stepper_multistep.py:222-226)
    state_names = [n for n in in_names_all if n not in forcing_names]
    if not state_names:
        raise ValueError(
            "checkpoint hyper_parameters carry no usable datamodule in_names"
        )
    horizon = int(dm_cfg.get("horizon", 6))
    window = int(dm_cfg.get("window", 1))

    # ----------------------------------------------------------- normalizer
    stats_dir = dm_cfg.get("data_dir_stats") or dm_cfg.get("data_dir")
    norm_names = list(dict.fromkeys(state_names + out_names))
    mean_p = _os.path.join(str(stats_dir), "centering.nc") if stats_dir else ""
    if stats_dir and _os.path.exists(mean_p):
        std_p = _os.path.join(str(stats_dir), "scaling.nc")
        normalizer = get_normalizer(mean_p, std_p, norm_names)
        forcing_normalizer = (
            get_normalizer(mean_p, std_p, forcing_names)
            if forcing_names else None
        )
    else:
        normalizer = StandardNormalizer.from_dicts(
            {n: 0.0 for n in norm_names}, {n: 1.0 for n in norm_names},
            norm_names,
        )
        forcing_normalizer = (
            StandardNormalizer.from_dicts(
                {n: 0.0 for n in forcing_names},
                {n: 1.0 for n in forcing_names}, forcing_names,
            ) if forcing_names else None
        )
        config["_unit_normalization"] = True
    normalizer = normalizer.subset(state_names)

    # -------------------------------------------------------------- models
    from .training import ExperimentConfig

    module_cfg = dict(config.get("module", {}))
    exp_cfg = ExperimentConfig(
        horizon=horizon,
        window=window,
        loss_function=module_cfg.get("loss_function", "l1"),
        num_predictions=int(module_cfg.get("num_predictions", 1) or 1),
        enable_inference_dropout=bool(
            module_cfg.get("enable_inference_dropout", False)),
        prediction_inputs_noise=float(
            module_cfg.get("prediction_inputs_noise", 0.0) or 0.0),
    )
    model_cfg = dict(config.get("model", {}))
    model_cfg.pop("kind", None)

    def build_sfno(net_sd, min_time, max_time, extra_model_cfg=None):
        arch = infer_sfno_architecture(net_sd)
        img_shape = (
            tuple(np.asarray(net_sd["pos_embed"]).shape[2:4])
            if "pos_embed" in net_sd
            else tuple(dm_cfg.get("spatial_shape", (180, 360)))
        )
        cfg_kwargs = dict(model_cfg)
        if extra_model_cfg:
            cfg_kwargs.update(extra_model_cfg)
        # architecture facts recovered from the weights always win over the
        # (possibly missing) yaml-side config
        cfg_kwargs.update({
            k: arch[k]
            for k in ("embed_dim", "num_layers", "encoder_layers",
                      "operator_type", "pos_embed", "use_mlp", "mlp_ratio",
                      "filter_type", "spectral_layers")
        })
        c = SFNOConfig(
            img_shape=img_shape,
            in_chans=arch["net_in_chans"],
            out_chans=arch["net_out_chans"],
            with_time_emb=arch["with_time_emb"],
            min_time=min_time, max_time=max_time,
            **_filter_kwargs_dc(SFNOConfig, cfg_kwargs),
        )
        model = SFNO(c)
        template = _init_sfno_variables(model, img_shape, arch["net_in_chans"])
        variables = _merge_converted(
            template,
            sfno_torch_to_flax(net_sd, arch["num_layers"],
                               arch["encoder_layers"]),
        )
        return model, variables, template

    if parts["kind"] == "interpolation":
        model, variables, template = build_sfno(
            parts["backbone"], min_time=1, max_time=max(horizon - 1, 1))
        exp = InterpolationExperiment(
            model, exp_cfg, Packer(state_names), Packer(out_names), normalizer
        )
        ema_sd = (
            ema_backbone_state_dict(parts["backbone"], parts["ema"], "")
            if parts["ema"] else None
        )
        arch_bb = infer_sfno_architecture(parts["backbone"])
        ema_vars = (
            _merge_converted(
                template,
                sfno_torch_to_flax(
                    ema_sd, arch_bb["num_layers"], arch_bb["encoder_layers"],
                ),
            ) if ema_sd else None
        )
        config.setdefault("experiment", "interpolation")
        return exp, variables, ema_vars, config

    # ------------------------------------------------------------ dyffusion
    interp_sd = parts["interpolator"]
    ip_override = (overrides or {}).get("interpolator_checkpoint_path") or (
        config.get("diffusion", {}) or {}).get("interpolator_checkpoint_path")
    interp_hparams_model = (overrides or {}).get("interpolator_model")
    if interp_sd is None and ip_override:
        ip_sd_full, ip_hp = load_lightning_checkpoint(str(ip_override))
        ip_parts = split_reference_state_dict(ip_sd_full)
        interp_sd = ip_parts["backbone"]
        interp_hparams_model = interp_hparams_model or dict(
            translate_reference_hparams(ip_hp).get("model", {}))
        if interp_hparams_model:
            interp_hparams_model.pop("kind", None)
    if interp_sd is None:
        raise ValueError(
            "DYffusion checkpoint has no embedded interpolator weights; pass "
            "overrides={'interpolator_checkpoint_path': <ckpt>}"
        )

    dcfg = DYffusionConfig(
        timesteps=horizon,
        **_filter_kwargs_dc2(DYffusionConfig, config.get("diffusion", {})),
    )
    if dcfg.hack_for_imprecise_interpolation and (
            not state_names or state_names[0] in out_names):
        # the hack shims slice channel 0 as THE input-only variable
        # (reference dyffusion.py:501-502,655-661: initial_condition[:, :1])
        raise ValueError(
            "hack_for_imprecise_interpolation requires the first in_name "
            f"({state_names[0] if state_names else '?'}) to be input-only "
            "(not in out_names)"
        )
    interp_model, interp_vars, _ = build_sfno(
        interp_sd, min_time=1, max_time=max(horizon - 1, 1),
        extra_model_cfg=interp_hparams_model,
    )
    interp_exp = InterpolationExperiment(
        interp_model,
        dataclasses.replace(exp_cfg, enable_inference_dropout=bool(
            dcfg.enable_interpolator_dropout)),
        Packer(state_names), Packer(out_names), normalizer,
    )
    from .diffusion import build_schedule as _build_schedule

    tmin, tmax = _build_schedule(dcfg).forecaster_time_range
    fc_model, fc_vars, fc_template = build_sfno(
        parts["backbone"], min_time=tmin, max_time=tmax)
    exp = DYffusionForecastingExperiment(
        fc_model, interp_exp, interp_vars, dcfg, exp_cfg,
        Packer(state_names), Packer(out_names), normalizer,
        forcing_names=forcing_names, forcing_normalizer=forcing_normalizer,
    )
    ema_sd = (
        ema_backbone_state_dict(parts["backbone"], parts["ema"], "model.")
        if parts["ema"] else None
    )
    arch_bb = infer_sfno_architecture(parts["backbone"])
    ema_vars = (
        _merge_converted(
            fc_template,
            sfno_torch_to_flax(
                ema_sd, arch_bb["num_layers"], arch_bb["encoder_layers"],
            ),
        ) if ema_sd else None
    )
    config.setdefault("experiment", "dyffusion")
    return exp, fc_vars, ema_vars, config


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
    from .utils.params import adapt_block_layout

    if isinstance(template, dict) and "constants" in template:
        restored = dict(template)
        src = state_dict.get("params", state_dict)
        # checkpoints saved in the unrolled block_i layout load into a model
        # built with scan_layers=True and vice versa (utils/params.py
        # adapt_block_layout restacks the middle blocks either way)
        restored["params"] = serialization.from_state_dict(
            template["params"], adapt_block_layout(template["params"], src)
        )
        return restored
    return serialization.from_state_dict(
        template, adapt_block_layout(template, state_dict))


def load_ace_stepper_checkpoint(path: str, _preloaded=None):
    """Load a reference/upstream ACE torch checkpoint into a ready
    :class:`~.inference.SingleStepStepper`.

    Format: ``torch.save({"stepper": SingleModuleStepper.get_state(), ...})``
    (reference ace_inference/training/train.py:364, consumed at
    inference/inference.py:74 via ``SingleModuleStepper.from_state``): the
    state dict carries the module weights, normalizer means/stds, img_shape,
    the full stepper config (builder/in_names/out_names/ocean/corrector),
    the area weights and the sigma coordinates — everything needed, no side
    files. Returns ``(stepper, config_state_dict)``.
    """
    import numpy as np

    from .data.coords import SigmaCoordinates
    from .data.normalization import StandardNormalizer
    from .inference import SingleStepStepper, SingleStepStepperConfig
    from .inference.corrector import CorrectorConfig
    from .inference.ocean import OceanConfig, SlabOceanConfig
    from .models import SFNO, SFNOConfig
    from .utils.torch_convert import infer_sfno_architecture, sfno_torch_to_flax

    if _preloaded is not None:
        ck = _preloaded  # already torch.load'ed by the caller's format probe
    else:
        import torch

        ck = torch.load(path, map_location="cpu", weights_only=False)
    state = ck["stepper"] if isinstance(ck, dict) and "stepper" in ck else ck
    cfgd = dict(state["config"])
    builder = dict(cfgd.get("builder") or {})
    if builder.get("type") != "SphericalFourierNeuralOperatorNet":
        raise NotImplementedError(
            f"ACE module type {builder.get('type')!r}; only the SFNO family "
            "is implemented"
        )
    sd = {k: np.asarray(v) for k, v in state["module"].items()}
    # DDP-wrapped checkpoints prefix 'module.' (reference strip_leading_module)
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    # both filter families convert: linear (dhconv/diagonal) and non-linear
    # SpectralAttentionS2 (diagonal AND l-dependant); parametrized complex
    # activations (modulus/halfplane ComplexReLU biases) are guarded loudly
    # in sfno_torch_to_flax
    arch = infer_sfno_architecture(sd)
    area_np = np.asarray(state["area"])
    img_shape = tuple(state.get("img_shape") or area_np.shape)

    # ModuleSelector.get_state() stores only the raw training-yaml mapping —
    # keys the yaml relied on defaults for are ABSENT, so the reference ACE
    # builder defaults (registry.py:44-66) must be applied here, not this
    # repo's SFNOConfig defaults (notably data_grid: the reference default is
    # legendre-gauss vs our equiangular — a silent quadrature change)
    ACE_BUILDER_DEFAULTS = {
        "spectral_transform": "sht",
        "operator_type": "diagonal",
        "scale_factor": 16,
        "hard_thresholding_fraction": 1.0,
        "normalization_layer": "instance_norm",
        "activation_function": "gelu",
        "big_skip": True,
        "rank": 1.0,
        "factorization": None,
        "separable": False,
        "complex_activation": "real",
        "data_grid": "legendre-gauss",
    }
    bcfg = {**ACE_BUILDER_DEFAULTS, **dict(builder.get("config") or {})}
    cfg_kwargs = dict(_filter_kwargs_dc(SFNOConfig, bcfg))
    cfg_kwargs.update({
        k: arch[k]
        for k in ("embed_dim", "num_layers", "encoder_layers",
                  "operator_type", "pos_embed", "use_mlp", "mlp_ratio",
                  "filter_type", "spectral_layers")
    })
    # scale_factor recovered from the weights when possible (pos_embed lives
    # on the model grid img_shape // scale_factor) — weights beat config
    if "pos_embed" in sd:
        pe_h = int(np.asarray(sd["pos_embed"]).shape[2])
        if pe_h and img_shape[0] % pe_h == 0:
            cfg_kwargs["scale_factor"] = img_shape[0] // pe_h
    # torch-side parity: exact erf GELU and two-pass norm statistics
    if cfg_kwargs.get("activation_function") == "gelu":
        cfg_kwargs["activation_function"] = "gelu_exact"
    cfg_kwargs["exact_norm"] = True
    mcfg = SFNOConfig(
        img_shape=img_shape, in_chans=arch["net_in_chans"],
        out_chans=arch["net_out_chans"], with_time_emb=arch["with_time_emb"],
        **cfg_kwargs,
    )
    model = SFNO(mcfg)
    template = _init_sfno_variables(model, img_shape, arch["net_in_chans"])
    variables = _merge_converted(
        template, sfno_torch_to_flax(sd, arch["num_layers"],
                                     arch["encoder_layers"]),
    )

    in_names = list(cfgd["in_names"])
    out_names = list(cfgd["out_names"])
    oc = cfgd.get("ocean")
    ocean_cfg = None
    if oc:
        slab = oc.get("slab")
        ocean_cfg = OceanConfig(
            oc["surface_temperature_name"], oc["ocean_fraction_name"],
            interpolate=bool(oc.get("interpolate", False)),
            slab=SlabOceanConfig(**slab) if slab else None,
        )
    co = dict(cfgd.get("corrector") or {})
    corrector_cfg = CorrectorConfig(
        conserve_dry_air=bool(co.get("conserve_dry_air", False)),
        zero_global_mean_moisture_advection=bool(
            co.get("zero_global_mean_moisture_advection", False)
        ),
        moisture_budget_correction=co.get("moisture_budget_correction"),
    ) if co else None

    means = dict(state["normalizer"]["means"])
    stds = dict(state["normalizer"]["stds"])
    all_names = list(dict.fromkeys(
        in_names + out_names + (list(ocean_cfg.names) if ocean_cfg else [])
    ))
    for n in all_names:  # physics-only fields (ocean mask): identity stats
        means.setdefault(n, 0.0)
        stds.setdefault(n, 1.0)
    normalizer = StandardNormalizer.from_dicts(
        {n: means[n] for n in all_names}, {n: stds[n] for n in all_names},
        all_names,
    )
    sc = state.get("sigma_coordinates")
    sigma = SigmaCoordinates(
        ak=np.asarray(sc["ak"], np.float64), bk=np.asarray(sc["bk"], np.float64)
    ) if sc else None

    def model_fn(p, x_norm):
        return model.apply(p, x_norm, deterministic=True)

    # reference loss-type names -> our criterion registry: LpLoss is the
    # RELATIVE Lp norm with p=2 (ace core/loss.py:104-126); AreaWeightedMSE
    # approximated by plain MSE (the stepper loss is a rollout diagnostic
    # here, not a training objective)
    ref_loss = str((cfgd.get("loss") or {}).get("type", "LpLoss")
                   if isinstance(cfgd.get("loss"), dict) else "LpLoss")
    loss_name = {"LpLoss": "l2_rel", "MSE": "l2",
                 "AreaWeightedMSE": "l2"}.get(ref_loss, "l2")
    stepper = SingleStepStepper(
        SingleStepStepperConfig(
            in_names=in_names, out_names=out_names, loss=loss_name,
            corrector=corrector_cfg, ocean=ocean_cfg,
        ),
        model_fn, variables, normalizer,
        jnp.asarray(area_np, jnp.float32), sigma=sigma,
    )
    return stepper, cfgd
