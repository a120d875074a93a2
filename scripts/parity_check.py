"""One-command full-window checkpoint parity check.

Given a reference-format (torch Lightning) DYffusion forecaster checkpoint —
the published HuggingFace format, configs/inference/
ckpts_from_huggingface_10years.yaml:19-37 — this command:

1. loads it through the SAME load path ``run_inference.py`` uses
   (``interface.load_experiment_checkpoint`` -> ``load_reference_checkpoint``:
   hparams-driven packers/normalizer, ``sfno_torch_to_flax`` weight
   conversion, embedded-interpolator extraction),
2. builds the jitted :class:`DYffusionStepper` and runs a full inference
   window (cold sampling, prescriber, ``hack_for_imprecise_interpolation``
   channel order, autoregressive hand-off),
3. independently re-runs the same window through the float64 numpy
   :class:`NumpyDYffusionWindowOracle` (utils/parity_window.py) directly from
   the torch state_dicts,
4. asserts per-step agreement <= --tol in normalized space.

With ``--synthetic`` it first FABRICATES a reduced-size checkpoint pair in the
exact reference format — hyper_parameters composed from the reference's
on-disk configs (model/sfno.yaml, datamodule/fv3gfs_prescriptive_only.yaml,
diffusion/dyffusion.yaml, experiment/fv3gfs_dyffusion.yaml), real
``torch.save`` files, LitEma-named shadow buffers, synthetic centering/
scaling.nc stats — and then runs the full check on them. This proves the
complete pipeline today; when real checkpoints exist, run:

    python scripts/parity_check.py --forecaster forecaster.ckpt \
        --stats data_statistics/ [--steps 13] [--tol 1e-4]

Determinism: interpolator dropout is disabled on both sides via the standard
`overrides` mechanism (dropout draws cannot match numpy vs jax); everything
else — weights, transforms, cold update, prescriber, hand-off — is exercised.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_CONFIG_DIR = os.environ.get(
    "REFERENCE_CONFIG_DIR", "/root/reference/src/configs"
)


# --------------------------------------------------------------------------
# synthetic reference-format checkpoint fabrication
# --------------------------------------------------------------------------


def _load_reference_yaml(rel: str) -> dict:
    """Best-effort yaml read of a reference config (hydra 'defaults' and
    interpolations are dropped/resolved manually)."""
    import yaml

    path = os.path.join(REFERENCE_CONFIG_DIR, rel)
    with open(path) as f:
        raw = f.read()
    # the reference yamls use ${...} interpolation; neutralize for plain yaml
    raw = raw.replace("${datamodule.in_names}", "__IN_NAMES__")
    raw = raw.replace("${diffusion.loss_function}", "l1")
    cfg = yaml.safe_load(raw)
    cfg.pop("defaults", None)
    return cfg


def compose_reference_hparams(
    embed_dim: int = 16,
    num_layers: int = 2,
    horizon: int = 6,
    n_state_extra: Optional[int] = None,
    dropout_mlp: float = 0.0,
) -> dict:
    """Compose the hyper_parameters dicts for a (interpolator, forecaster)
    checkpoint pair from the reference's actual on-disk configs, reduced to
    ``embed_dim`` x ``num_layers`` for tractable numpy f64 oracles.

    Channel layout matches the released models' hack scenario: in_names =
    [HGTsfc] + <fv3gfs in_names>, out_names = <fv3gfs in_names>, forcing_names
    = [DSWRFtoa] — HGTsfc is the input-only channel 0 the hack shims slice
    (reference dyffusion.py:41-44)."""
    model_cfg = _load_reference_yaml("model/sfno.yaml")
    dm_cfg = _load_reference_yaml("datamodule/fv3gfs_prescriptive_only.yaml")
    diff_cfg = _load_reference_yaml("diffusion/dyffusion.yaml")["diffusion"]
    exp_cfg = _load_reference_yaml("experiment/fv3gfs_dyffusion.yaml")

    base_in = list(dm_cfg["in_names"])
    if n_state_extra is not None:
        base_in = base_in[:n_state_extra]
    in_names = ["HGTsfc"] + base_in
    model_cfg.update(embed_dim=embed_dim, num_layers=num_layers,
                     dropout_mlp=dropout_mlp)
    datamodule_config = {
        "_target_": dm_cfg.get("_target_", ""),
        "in_names": in_names,
        "out_names": base_in,
        "forcing_names": ["DSWRFtoa"],
        "horizon": horizon,
        "window": 1,
        "data_dir": None,
        "data_dir_stats": None,
        "prescriber": dict(dm_cfg["prescriber"]),
    }
    diff_cfg = {k: v for k, v in diff_cfg.items()
                if not k.startswith("interpolator")}
    diff_cfg.update(
        timesteps=horizon,
        hack_for_imprecise_interpolation=True,
        forward_conditioning="data",
        time_encoding="dynamics",
    )
    module_extra = dict(exp_cfg.get("module", {}))
    common = {
        "model_config": model_cfg,
        "datamodule_config": datamodule_config,
        "num_predictions": 1,
        "use_ema": True,
        "enable_inference_dropout": bool(
            module_extra.get("enable_inference_dropout", False)),
        "prediction_inputs_noise": 0.0,
        "stack_window_to_channel_dim": True,
    }
    return {
        "interpolator": {**common, "diffusion_config": None},
        "forecaster": {**common, "diffusion_config": diff_cfg},
    }


def _random_torch_sfno_sd(img_shape, in_chans, out_chans, embed_dim,
                          num_layers, horizon_times, seed,
                          encoder_layers: int = 1,
                          dropout_mlp: float = 0.0) -> Dict[str, np.ndarray]:
    """Random SFNO weights in the reference torch state_dict naming, produced
    by initializing OUR flax SFNO and exporting via sfno_flax_to_torch (the
    naming is validated against a real torch file in test_torch_convert)."""
    import jax

    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.utils.torch_convert import sfno_flax_to_torch

    cfg = SFNOConfig(
        img_shape=tuple(img_shape), in_chans=in_chans, out_chans=out_chans,
        embed_dim=embed_dim, num_layers=num_layers, with_time_emb=True,
        min_time=horizon_times[0], max_time=horizon_times[1],
        activation_function="gelu_exact", encoder_layers=encoder_layers,
        dropout_mlp=dropout_mlp,
    )
    model = SFNO(cfg)
    import jax.numpy as jnp

    x = jnp.zeros((1,) + tuple(img_shape) + (in_chans,), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, x, time=jnp.zeros((1,), jnp.float32))
    )(jax.random.PRNGKey(seed))
    return sfno_flax_to_torch(jax.device_get(variables),
                              encoder_layers=encoder_layers,
                              mlp_dropout=dropout_mlp > 0)


def fabricate_checkpoints(out_dir: str, embed_dim=16, num_layers=2,
                          horizon=6, img_shape=(16, 32), n_state_extra=3,
                          with_ema: bool = True,
                          encoder_layers: int = 1,
                          dropout_mlp: float = 0.0) -> dict:
    """Write a reference-format (torch.save) interpolator + forecaster ckpt
    pair plus centering/scaling.nc stats; returns paths + composed facts."""
    import torch

    hp = compose_reference_hparams(embed_dim, num_layers, horizon,
                                   n_state_extra, dropout_mlp=dropout_mlp)
    dmc = hp["forecaster"]["datamodule_config"]
    state_names = [n for n in dmc["in_names"] if n not in dmc["forcing_names"]]
    C_state = len(state_names)
    C_out = len(dmc["out_names"])
    Cf = len(dmc["forcing_names"])

    # stats files (h5py scalar datasets, the layout read by get_normalizer)
    import h5py

    rng = np.random.default_rng(0)
    all_names = sorted(set(dmc["in_names"] + dmc["out_names"]
                           + dmc["forcing_names"]
                           + [dmc["prescriber"]["mask_name"]]))
    stats_dir = os.path.join(out_dir, "data_statistics")
    os.makedirs(stats_dir, exist_ok=True)
    with h5py.File(os.path.join(stats_dir, "centering.nc"), "w") as f:
        for n in all_names:
            f.create_dataset(n, data=float(rng.normal()))
    with h5py.File(os.path.join(stats_dir, "scaling.nc"), "w") as f:
        for n in all_names:
            f.create_dataset(n, data=float(abs(rng.normal()) + 0.5))
    for side in ("interpolator", "forecaster"):
        hp[side]["datamodule_config"]["data_dir_stats"] = stats_dir

    # interpolator net: [x_end_state, x_last_state] + static forcing
    interp_sd = _random_torch_sfno_sd(
        img_shape, 2 * C_state + Cf, C_out, embed_dim, num_layers,
        (1, horizon - 1), seed=1, encoder_layers=encoder_layers,
        dropout_mlp=dropout_mlp,
    )
    # forecaster net: x_t + initial-condition conditioning + static forcing
    fc_sd = _random_torch_sfno_sd(
        img_shape, 2 * C_state + Cf, C_out, embed_dim, num_layers,
        (0, horizon - 1), seed=2, encoder_layers=encoder_layers,
        dropout_mlp=dropout_mlp,
    )

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x))

    interp_path = os.path.join(out_dir, "interpolator-sfno.ckpt")
    torch.save(
        {
            "state_dict": {f"model.{k}": t(v) for k, v in interp_sd.items()},
            "hyper_parameters": hp["interpolator"],
        },
        interp_path,
    )
    fc_state = {f"model.model.{k}": t(v) for k, v in fc_sd.items()}
    fc_state.update(
        {f"model.interpolator.model.{k}": t(v) for k, v in interp_sd.items()}
    )
    if with_ema:
        # LitEma shadow buffers: EMA == live weights shifted by a known
        # epsilon so the EMA path is distinguishable (ema.py:20-28 naming)
        for k, v in fc_sd.items():
            fc_state[f"model_ema.{('model.' + k).replace('.', '')}"] = t(
                np.asarray(v) + 1e-3
            )
    fc_path = os.path.join(out_dir, "forecaster-sfno.ckpt")
    torch.save(
        {"state_dict": fc_state, "hyper_parameters": hp["forecaster"]},
        fc_path,
    )
    return {
        "forecaster": fc_path,
        "interpolator": interp_path,
        "stats": stats_dir,
        "state_names": state_names,
        "out_names": list(dmc["out_names"]),
        "forcing_names": list(dmc["forcing_names"]),
        "mask_name": dmc["prescriber"]["mask_name"],
        "prescribed_name": dmc["prescriber"]["prescribed_name"],
        "img_shape": tuple(img_shape),
        "horizon": horizon,
    }


# --------------------------------------------------------------------------
# the check
# --------------------------------------------------------------------------


def run_window_parity_check(
    forecaster_path: str,
    stats_dir: Optional[str] = None,
    n_steps: int = 13,
    tol: float = 1e-4,
    seed: int = 0,
    interpolator_path: Optional[str] = None,
    verbose: bool = True,
) -> dict:
    """Load the ckpt both ways, run the same window, return the diff report.

    Raises AssertionError if any per-step max|diff| exceeds ``tol``."""
    import jax
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.diffusion import DYffusionConfig
    from spherical_dyffusion_tpu.inference import DYffusionStepper
    from spherical_dyffusion_tpu.inference.prescriber import PrescriberConfig
    from spherical_dyffusion_tpu.interface import (
        _filter_kwargs_dc2,
        load_experiment_checkpoint,
    )
    from spherical_dyffusion_tpu.utils.parity import NumpySFNOOracle
    from spherical_dyffusion_tpu.utils.parity_window import (
        NumpyDYffusionWindowOracle,
    )
    from spherical_dyffusion_tpu.utils.torch_convert import (
        infer_sfno_architecture,
        load_lightning_checkpoint,
        split_reference_state_dict,
        translate_reference_hparams,
    )

    overrides: dict = {"diffusion": {"enable_interpolator_dropout": False}}
    if stats_dir:
        overrides["datamodule"] = {"data_dir_stats": stats_dir}
    if interpolator_path:
        overrides["interpolator_checkpoint_path"] = interpolator_path

    # ---- jax side: run_inference.py's load path -> jitted window stepper
    exp, params, ema_params, config = load_experiment_checkpoint(
        forecaster_path, overrides=overrides
    )
    p_cfg = config.get("datamodule", {}).get("prescriber") or {}
    prescriber = None
    if p_cfg:
        prescriber = PrescriberConfig(
            prescribed_name=p_cfg["prescribed_name"],
            mask_name=p_cfg["mask_name"],
            mask_value=int(p_cfg.get("mask_value", 1)),
            interpolate=bool(p_cfg.get("interpolate", False)),
        ).build(list(exp.out_packer.names))
    stepper = DYffusionStepper(exp, params, prescriber=prescriber)

    state_names = list(exp.in_packer.names)
    out_names = list(exp.out_packer.names)
    forcing_names = list(exp.forcing_names)
    img_shape = exp.model.cfg.img_shape
    H_img, W_img = img_shape
    horizon = exp.cfg.horizon

    # ---- synthetic raw input window (reproducible)
    rng = np.random.default_rng(seed)
    T = n_steps
    raw = {
        n: rng.standard_normal((1, T + 1, H_img, W_img)).astype(np.float32)
        for n in dict.fromkeys(state_names + out_names + forcing_names)
    }
    mask_name = p_cfg.get("mask_name") if p_cfg else None
    mask = None
    if mask_name:
        mask = (rng.random((1, T + 1, H_img, W_img)) > 0.5).astype(np.float32)

    norm = exp.normalizer  # over state_names
    x0_raw = np.stack([raw[n][:, 0] for n in state_names], axis=-1)
    x0_norm = np.asarray(norm.normalize(jnp.asarray(x0_raw)))

    forcing_norm_rows = None
    if forcing_names:
        f_raw = np.stack([raw[n] for n in forcing_names], axis=-1)
        forcing_norm_rows = np.asarray(
            exp.forcing_normalizer.normalize(jnp.asarray(f_raw))
        )  # (1, T+1, H, W, Cf)

    tgt_norm = None
    if p_cfg:
        pn = p_cfg["prescribed_name"]
        ch = out_names.index(pn)
        out_norm = norm.subset(out_names)
        mu, sd_ = float(np.asarray(out_norm.means)[ch]), float(
            np.asarray(out_norm.stds)[ch])
        tgt_norm = (raw[pn] - mu) / sd_  # (1, T+1, H, W)

    # run_window slices per-segment forcing internally from the (B, T+1, ...)
    # window array
    xf, preds = stepper.run_window(
        jnp.asarray(x0_norm),
        jnp.asarray(forcing_norm_rows)
        if forcing_norm_rows is not None else None,
        jnp.asarray(tgt_norm) if tgt_norm is not None else None,
        jnp.asarray(mask) if mask is not None else None,
        jax.random.PRNGKey(0),
        n_steps,
    )
    preds = np.asarray(preds)  # (1, n_steps, H, W, C_out)

    # ---- numpy side: the independent float64 window oracle from the raw sds
    sd_full, hparams = load_lightning_checkpoint(forecaster_path)
    parts = split_reference_state_dict(sd_full)
    ref_cfg = translate_reference_hparams(hparams)
    diff_d = dict(ref_cfg.get("diffusion", {}))
    diff_d["enable_interpolator_dropout"] = False
    dcfg = DYffusionConfig(
        timesteps=horizon, **_filter_kwargs_dc2(DYffusionConfig, diff_d)
    )
    interp_sd = parts["interpolator"]
    if interp_sd is None and interpolator_path:
        interp_sd = split_reference_state_dict(
            load_lightning_checkpoint(interpolator_path)[0]
        )["backbone"]
    mc = ref_cfg.get("model", {})

    def mk_oracle(net_sd, min_time, max_time):
        arch = infer_sfno_architecture(net_sd)
        return NumpySFNOOracle(
            net_sd, img_shape, num_layers=arch["num_layers"],
            embed_dim=arch["embed_dim"], operator_type=arch["operator_type"],
            scale_factor=int(mc.get("scale_factor", 1)),
            hard_thresholding_fraction=float(
                mc.get("hard_thresholding_fraction", 1.0)),
            encoder_layers=arch["encoder_layers"],
            use_mlp=arch["use_mlp"], with_time_emb=arch["with_time_emb"],
            time_scale_shift_before_filter=bool(
                mc.get("time_scale_shift_before_filter", True)),
            min_time=min_time, max_time=max_time,
            data_grid=str(mc.get("data_grid", "equiangular")),
            round_matrices_to_f32=True,
        )

    from spherical_dyffusion_tpu.diffusion import build_schedule

    tmin, tmax = build_schedule(dcfg).forecaster_time_range
    oracle = NumpyDYffusionWindowOracle(
        interpolator=mk_oracle(interp_sd, 1, max(horizon - 1, 1)),
        forecaster=mk_oracle(parts["backbone"], tmin, tmax),
        cfg=dcfg,
        out_channel_indices=np.asarray(
            [state_names.index(n) for n in out_names]),
        prescribed_channel=(out_names.index(p_cfg["prescribed_name"])
                            if p_cfg else None),
        mask_value=int(p_cfg.get("mask_value", 1)) if p_cfg else 1,
        interpolate_mask=bool(p_cfg.get("interpolate", False)) if p_cfg else False,
    )
    chf = lambda a: np.moveaxis(a, -1, 1)  # noqa: E731
    xf_o, preds_o = oracle.run_window(
        chf(x0_norm),
        n_steps,
        forcing_norm=np.moveaxis(forcing_norm_rows, -1, 2)
        if forcing_norm_rows is not None else None,
        prescribed_target_norm=tgt_norm,
        mask=mask,
    )
    preds_o = np.moveaxis(preds_o, 2, -1)  # (1, n_steps, H, W, C_out)

    per_step = np.max(np.abs(preds - preds_o), axis=(0, 2, 3, 4))
    final_diff = float(np.max(np.abs(np.asarray(xf) - np.moveaxis(xf_o, 1, -1))))
    report = {
        "n_steps": n_steps,
        "per_step_max_abs_diff": [float(v) for v in per_step],
        "final_state_max_abs_diff": final_diff,
        "max_abs_diff": float(per_step.max()),
        "tol": tol,
        "pred_scale": float(np.max(np.abs(preds_o))),
    }
    if verbose:
        print(json.dumps(report, indent=1))
    assert report["max_abs_diff"] <= tol and final_diff <= tol, (
        f"window parity violated: max diff {report['max_abs_diff']:.3e} "
        f"(final state {final_diff:.3e}) > tol {tol:g}"
    )
    return report


def run_stochastic_parity_check(
    forecaster_path: str,
    stats_dir: Optional[str] = None,
    n_members: int = 24,
    n_steps: Optional[int] = None,
    seed: int = 0,
    interpolator_path: Optional[str] = None,
    verbose: bool = True,
    z_max: float = 7.0,
    rms_z_max: float = 2.0,
    std_ratio_bounds: Tuple[float, float] = (0.8, 1.25),
) -> dict:
    """The STOCHASTIC parity leg: interpolator dropout ON on both sides.

    Deterministic window parity cannot cover the reference's operative
    ensemble-spread mechanism — inference-time interpolator dropout
    (reference dyffusion.py:226-240) — because Bernoulli draws cannot be made
    bit-identical between numpy and jax. This leg instead fixes the converted
    weights, runs ``n_members`` independent window rollouts per side (the
    jitted product stepper with the exact-dropout fork vs the float64 numpy
    oracle with train-mode float-bernoulli dropout), and asserts the ensemble
    mean and spread agree within sampling tolerance:

    * elementwise ``|mean_jax - mean_np| <= z_max * se`` where ``se`` is the
      two-sample standard error,
    * RMS of those z-scores <= ``rms_z_max`` (≈1 when the distributions
      match),
    * pooled spread ratio within ``std_ratio_bounds``, per step.

    Also asserts the load path auto-selected ``exact_dropout`` (the
    gelu_exact/exact_norm translator-fork pattern): the fast 1/256-quantized
    dropout must NOT be the one reference ckpts run.
    """
    import jax
    import jax.numpy as jnp

    from spherical_dyffusion_tpu.diffusion import DYffusionConfig
    from spherical_dyffusion_tpu.inference import DYffusionStepper
    from spherical_dyffusion_tpu.interface import (
        _filter_kwargs_dc2,
        load_experiment_checkpoint,
    )
    from spherical_dyffusion_tpu.utils.parity import NumpySFNOOracle
    from spherical_dyffusion_tpu.utils.parity_window import (
        NumpyDYffusionWindowOracle,
    )
    from spherical_dyffusion_tpu.utils.torch_convert import (
        infer_sfno_architecture,
        load_lightning_checkpoint,
        split_reference_state_dict,
        translate_reference_hparams,
    )

    overrides: dict = {}
    if stats_dir:
        overrides["datamodule"] = {"data_dir_stats": stats_dir}
    if interpolator_path:
        overrides["interpolator_checkpoint_path"] = interpolator_path

    # ---- jax side: the product load path, dropout left ENABLED
    exp, params, ema_params, config = load_experiment_checkpoint(
        forecaster_path, overrides=overrides
    )
    icfg_model = exp.interpolator.model.cfg
    assert icfg_model.exact_dropout, (
        "translate_reference_hparams must auto-select exact_dropout for "
        "loaded reference checkpoints"
    )
    rate = float(icfg_model.dropout_mlp)
    assert rate > 0.0, (
        "stochastic parity needs an interpolator with dropout_mlp > 0 "
        f"(got {rate})"
    )
    assert bool(exp.diffusion_cfg.enable_interpolator_dropout), (
        "checkpoint/diffusion config disabled interpolator dropout"
    )
    stepper = DYffusionStepper(exp, params)

    state_names = list(exp.in_packer.names)
    forcing_names = list(exp.forcing_names)
    H_img, W_img = exp.model.cfg.img_shape
    horizon = exp.cfg.horizon
    n_steps = int(n_steps or horizon)

    rng = np.random.default_rng(seed)
    x0_norm = rng.standard_normal((1, H_img, W_img, len(state_names))).astype(
        np.float32)
    forcing_norm_rows = None
    if forcing_names:
        forcing_norm_rows = rng.standard_normal(
            (1, n_steps + 1, H_img, W_img, len(forcing_names))
        ).astype(np.float32)

    jx = jnp.asarray(x0_norm)
    jf = (jnp.asarray(forcing_norm_rows)
          if forcing_norm_rows is not None else None)
    members_j = []
    for i in range(n_members):
        _, preds = stepper.run_window(
            jx, jf, None, None, jax.random.PRNGKey(1000 + i), n_steps)
        members_j.append(np.asarray(preds))
    mj = np.stack(members_j)  # (N, 1, n_steps, H, W, C_out)

    # ---- numpy side: float64 oracle with train-mode dropout
    sd_full, hparams = load_lightning_checkpoint(forecaster_path)
    parts = split_reference_state_dict(sd_full)
    ref_cfg = translate_reference_hparams(hparams)
    dcfg = DYffusionConfig(
        timesteps=horizon,
        **_filter_kwargs_dc2(DYffusionConfig, dict(ref_cfg.get("diffusion", {}))),
    )
    assert bool(dcfg.enable_interpolator_dropout)
    interp_sd = parts["interpolator"]
    if interp_sd is None and interpolator_path:
        interp_sd = split_reference_state_dict(
            load_lightning_checkpoint(interpolator_path)[0]
        )["backbone"]
    mc = ref_cfg.get("model", {})

    def mk_oracle(net_sd, min_time, max_time, dropout_mlp=0.0):
        arch = infer_sfno_architecture(net_sd)
        return NumpySFNOOracle(
            net_sd, (H_img, W_img), num_layers=arch["num_layers"],
            embed_dim=arch["embed_dim"], operator_type=arch["operator_type"],
            scale_factor=int(mc.get("scale_factor", 1)),
            hard_thresholding_fraction=float(
                mc.get("hard_thresholding_fraction", 1.0)),
            encoder_layers=arch["encoder_layers"],
            use_mlp=arch["use_mlp"], with_time_emb=arch["with_time_emb"],
            time_scale_shift_before_filter=bool(
                mc.get("time_scale_shift_before_filter", True)),
            min_time=min_time, max_time=max_time,
            data_grid=str(mc.get("data_grid", "equiangular")),
            round_matrices_to_f32=True, dropout_mlp=dropout_mlp,
        )

    from spherical_dyffusion_tpu.diffusion import build_schedule

    tmin, tmax = build_schedule(dcfg).forecaster_time_range
    out_names = list(exp.out_packer.names)
    oracle = NumpyDYffusionWindowOracle(
        interpolator=mk_oracle(interp_sd, 1, max(horizon - 1, 1),
                               dropout_mlp=rate),
        forecaster=mk_oracle(parts["backbone"], tmin, tmax),
        cfg=dcfg,
        out_channel_indices=np.asarray(
            [state_names.index(n) for n in out_names]),
    )
    chf = lambda a: np.moveaxis(a, -1, 1)  # noqa: E731
    members_n = []
    for i in range(n_members):
        _, preds_o = oracle.run_window(
            chf(x0_norm), n_steps,
            forcing_norm=np.moveaxis(forcing_norm_rows, -1, 2)
            if forcing_norm_rows is not None else None,
            rng=np.random.default_rng(2000 + i),
        )
        members_n.append(np.moveaxis(preds_o, 2, -1))
    mn = np.stack(members_n)  # (N, 1, n_steps, H, W, C_out)

    # ---- ensemble statistics
    mean_j, std_j = mj.mean(0), mj.std(0, ddof=1)
    mean_n, std_n = mn.mean(0), mn.std(0, ddof=1)
    pooled_j = float(np.sqrt(np.mean(std_j**2)))
    pooled_n = float(np.sqrt(np.mean(std_n**2)))
    assert pooled_n > 1e-9, "oracle ensemble shows no spread — dropout inert?"
    assert pooled_j > 1e-9, "jax ensemble shows no spread — dropout inert?"
    se = np.sqrt((std_j**2 + std_n**2) / n_members)
    floor = 1e-3 * max(pooled_j, pooled_n)
    z = np.abs(mean_j - mean_n) / np.maximum(se, floor)
    per_step_ratio = [
        float(np.sqrt(np.mean(std_j[:, s] ** 2))
              / max(np.sqrt(np.mean(std_n[:, s] ** 2)), 1e-12))
        for s in range(n_steps)
    ]
    report = {
        "n_members": n_members,
        "n_steps": n_steps,
        "dropout_rate": rate,
        "max_z": float(z.max()),
        "rms_z": float(np.sqrt(np.mean(z**2))),
        "pooled_std_jax": pooled_j,
        "pooled_std_oracle": pooled_n,
        "per_step_std_ratio": per_step_ratio,
        "z_max_allowed": z_max,
        "rms_z_max_allowed": rms_z_max,
        "std_ratio_bounds": list(std_ratio_bounds),
    }
    if verbose:
        print(json.dumps(report, indent=1))
    assert report["max_z"] <= z_max, (
        f"ensemble means disagree: max z {report['max_z']:.2f} > {z_max}"
    )
    assert report["rms_z"] <= rms_z_max, (
        f"ensemble means disagree in aggregate: rms z "
        f"{report['rms_z']:.2f} > {rms_z_max}"
    )
    lo, hi = std_ratio_bounds
    bad = [r for r in per_step_ratio if not (lo <= r <= hi)]
    assert not bad, (
        f"ensemble spread mismatch: per-step std ratio {per_step_ratio} "
        f"outside [{lo}, {hi}]"
    )
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--forecaster", help="reference forecaster .ckpt path")
    ap.add_argument("--interpolator", default=None,
                    help="interpolator .ckpt (only needed if the forecaster "
                         "ckpt lacks embedded interpolator weights)")
    ap.add_argument("--stats", default=None,
                    help="dir holding centering.nc/scaling.nc")
    ap.add_argument("--steps", type=int, default=13)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--synthetic", action="store_true",
                    help="fabricate a reduced-size reference-format ckpt "
                         "pair first and check against it")
    ap.add_argument("--stochastic", action="store_true",
                    help="run the stochastic leg instead: interpolator "
                         "dropout ON both sides, compare ensemble statistics")
    ap.add_argument("--members", type=int, default=24,
                    help="ensemble members per side (stochastic leg)")
    ap.add_argument("--dropout", type=float, default=0.15,
                    help="interpolator dropout_mlp for fabricated ckpts "
                         "(stochastic leg with --synthetic)")
    ap.add_argument("--keep", default=None,
                    help="with --synthetic: directory to keep the fabricated "
                         "checkpoints in (default: temp dir)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # f64 oracle pairs with CPU f32

    if args.synthetic:
        tmp = args.keep or tempfile.mkdtemp(prefix="parity_ckpts_")
        os.makedirs(tmp, exist_ok=True)
        facts = fabricate_checkpoints(
            tmp, dropout_mlp=args.dropout if args.stochastic else 0.0)
        print(f"[synthetic] fabricated reference-format ckpts in {tmp}")
        if args.stochastic:
            report = run_stochastic_parity_check(
                facts["forecaster"], stats_dir=facts["stats"],
                n_members=args.members,
            )
        else:
            report = run_window_parity_check(
                facts["forecaster"], stats_dir=facts["stats"],
                n_steps=args.steps, tol=args.tol,
            )
    else:
        if not args.forecaster:
            raise SystemExit("--forecaster required (or use --synthetic)")
        if args.stochastic:
            report = run_stochastic_parity_check(
                args.forecaster, stats_dir=args.stats,
                n_members=args.members,
                interpolator_path=args.interpolator,
            )
        else:
            report = run_window_parity_check(
                args.forecaster, stats_dir=args.stats, n_steps=args.steps,
                tol=args.tol, interpolator_path=args.interpolator,
            )
    if args.stochastic:
        print(f"PASS: stochastic window parity (N={report['n_members']} "
              f"members, rms z {report['rms_z']:.2f}, std ratios "
              f"{[f'{r:.3f}' for r in report['per_step_std_ratio']]})")
    else:
        print(f"PASS: full-window parity <= {args.tol:g} "
              f"(max diff {report['max_abs_diff']:.3e})")


if __name__ == "__main__":
    main()
