"""Experiment types: interpolation, DYffusion forecasting, simultaneous multi-horizon.

Functional re-design of the reference Lightning experiment classes
(src/experiment_types/_base_experiment.py:39, interpolation.py:13,
forecasting_multi_horizon.py:26/470/610). An *experiment* here is a stateless
object describing how batches map to losses and predictions; parameters,
optimizer state and EMA live in the trainer. Everything operates in
normalized, packed, channels-last space:

    batch["dynamics"]            (B, window+horizon, H, W, C_in)   raw
    batch["dynamical_condition"] (B, window+horizon, H, W, C_f)    normalized

The reference's ensemble machinery (get_ensemble_inputs: tile the batch dim,
_base_experiment.py:851-890) is a vmap/tile at the call site here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    DiffusionSchedule,
    DYffusionConfig,
    build_schedule,
    p_losses,
    sample_loop,
)
from ..data.normalization import StandardNormalizer
from ..data.packer import Packer
from .losses import get_loss_fn

__all__ = [
    "ExperimentConfig",
    "InterpolationExperiment",
    "DYffusionForecastingExperiment",
    "SimultaneousForecastingExperiment",
]


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Shared experiment hyperparameters (reference _base_experiment.py:75-135)."""

    horizon: int
    window: int = 1
    loss_function: str = "l1"
    num_predictions: int = 10  # validation ensemble size
    enable_inference_dropout: bool = False
    stack_window_to_channel_dim: bool = True
    # gaussian noise added to each ensemble member's (normalized) inputs at
    # prediction time (reference prediction_inputs_noise,
    # _base_experiment.py:64,92 + get_ensemble_inputs :852-877) — the second
    # ensemble-spread source besides interpolator dropout
    prediction_inputs_noise: float = 0.0


def _stack_window(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B, H, W, T*C)  (reference rrearrange
    'b window c ... -> b (window c) ...', channels-last here)."""
    B, T, H, W, C = x.shape
    return jnp.moveaxis(x, 1, -2).reshape(B, H, W, T * C)


def _out_indices(in_packer: Packer, out_packer: Packer) -> np.ndarray:
    idx = in_packer.index
    return np.asarray([idx[n] for n in out_packer.names], np.int64)


class InterpolationExperiment:
    """Stochastic time interpolation (reference interpolation.py:13-183).

    Inputs: the first ``window`` frames plus the last frame, stacked into
    channels; a per-sample random time t in [1, horizon-1]; target = frame at
    window + t - 1. Dropout stays active at inference (the DYffusion noise
    source)."""

    def __init__(
        self,
        model,  # flax module: (inputs, time, condition, ...) -> outputs
        cfg: ExperimentConfig,
        in_packer: Packer,
        out_packer: Packer,
        normalizer: StandardNormalizer,
    ):
        assert cfg.horizon >= 2, "horizon must be >= 2 for interpolation"
        self.model = model
        self.cfg = cfg
        self.in_packer = in_packer
        self.out_packer = out_packer
        self.normalizer = normalizer
        self.criterion = get_loss_fn(cfg.loss_function)
        self._out_idx = _out_indices(in_packer, out_packer)

    @property
    def horizon_range(self) -> Sequence[int]:
        return list(range(1, self.cfg.horizon))

    @property
    def true_horizon(self) -> int:
        return self.cfg.horizon

    def get_inputs_from_dynamics(self, dynamics: jax.Array) -> jax.Array:
        past = _stack_window(dynamics[:, : self.cfg.window])
        last = dynamics[:, -1]
        return jnp.concatenate([past, last], axis=-1)

    def slice_condition(self, dynamical_condition: Optional[jax.Array],
                        target_time) -> Optional[jax.Array]:
        if dynamical_condition is None:
            return None
        if isinstance(target_time, int):
            return dynamical_condition[:, target_time]
        B = dynamical_condition.shape[0]
        idx = jnp.asarray(target_time, jnp.int32)
        return dynamical_condition[jnp.arange(B), idx]

    def train_loss(
        self,
        params,
        dynamics: jax.Array,
        rng: jax.Array,
        dynamical_condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        random_timestep: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """``random_timestep`` (B,) comes from a sparse 'interpolation'-strategy
        loader (reference load_series_data_multistep_interpolation): dynamics
        then holds only [window frames, frame at t, last frame] and the target
        time is the loader's draw, not a fresh one. Without it, dynamics must
        be the full sequential window+horizon stack."""
        B = dynamics.shape[0]
        rng_t, rng_drop = jax.random.split(rng)
        if random_timestep is not None:
            if dynamics.shape[1] != self.cfg.window + 2:
                raise ValueError(
                    "random_timestep given but dynamics has "
                    f"{dynamics.shape[1]} frames; the sparse 'interpolation' "
                    f"strategy emits window+2={self.cfg.window + 2}"
                )
            t = jnp.asarray(random_timestep, jnp.int32)
            targets = dynamics[:, self.cfg.window][..., self._out_idx]
            cond = (dynamical_condition[:, self.cfg.window]
                    if dynamical_condition is not None else None)
        else:
            if dynamics.shape[1] != self.cfg.window + self.cfg.horizon:
                raise ValueError(
                    f"sequential interpolation training needs window+horizon="
                    f"{self.cfg.window + self.cfg.horizon} frames, got "
                    f"{dynamics.shape[1]} — a sparse-strategy loader must "
                    "pass its random_timestep through"
                )
            t = jax.random.randint(rng_t, (B,), 1, self.cfg.horizon)
            target_time = self.cfg.window + t - 1
            targets = dynamics[jnp.arange(B), target_time][..., self._out_idx]
            cond = self.slice_condition(dynamical_condition, target_time)
        inputs = self.get_inputs_from_dynamics(dynamics)
        preds = self.model.apply(
            params,
            inputs,
            time=t.astype(jnp.float32),
            condition=cond,
            static_condition=static_condition,
            deterministic=False,
            rngs={"dropout": rng_drop},
        )
        loss = self.criterion(preds, targets)
        return loss, {"loss": loss}

    def predict(
        self,
        params,
        inputs: jax.Array,
        time: jax.Array,
        rng: Optional[jax.Array] = None,
        condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        use_inference_dropout: Optional[bool] = None,
    ) -> jax.Array:
        """Packed prediction (reference predict_packed). Dropout is enabled
        when requested (DYffusion q_sample keeps it ON, dyffusion.py:226-239)."""
        use_do = (
            self.cfg.enable_inference_dropout
            if use_inference_dropout is None
            else use_inference_dropout
        )
        kwargs = {}
        if use_do:
            if rng is None:
                raise ValueError("inference dropout requires an rng")
            kwargs = dict(deterministic=False, rngs={"dropout": rng})
        else:
            kwargs = dict(deterministic=True)
        return self.model.apply(
            params, inputs, time=time, condition=condition,
            static_condition=static_condition, **kwargs
        )

    def make_interpolate_fn(
        self, params, hack_for_imprecise_interpolation: bool = False,
        use_inference_dropout: bool = True,
    ):
        """Build the ``interpolate_fn`` consumed by the DYffusion core.

        Implements the reference ``DYffusion._interpolate`` contract
        (dyffusion.py:642-662) including the hack channel shims: receives
        x_last in forecaster channels, returns state channels.
        """

        def interpolate_fn(x_end, x_last, t, rng, dynamical_condition=None,
                           static_condition=None, **_):
            if hack_for_imprecise_interpolation:
                x_last = jnp.concatenate([x_end[..., :1], x_last], axis=-1)
            inputs = jnp.concatenate([x_end, x_last], axis=-1)
            cond = self.slice_condition(
                dynamical_condition, jnp.floor(t).astype(jnp.int32)
            ) if dynamical_condition is not None else None
            out = self.predict(
                params, inputs, time=t, rng=rng, condition=cond,
                static_condition=static_condition,
                use_inference_dropout=use_inference_dropout,
            )
            if hack_for_imprecise_interpolation:
                out = jnp.concatenate([x_end[..., :1], out], axis=-1)
            return out

        return interpolate_fn


class DYffusionForecastingExperiment:
    """Two-stage DYffusion forecasting (reference
    MultiHorizonForecastingDYffusion, forecasting_multi_horizon.py:470-518):
    a frozen stochastic interpolator + a trainable forecaster, trained with
    p_losses and sampled with the cold sampler."""

    def __init__(
        self,
        forecaster_model,
        interpolator: InterpolationExperiment,
        interpolator_params,
        diffusion_cfg: DYffusionConfig,
        cfg: ExperimentConfig,
        in_packer: Packer,
        out_packer: Packer,
        normalizer: StandardNormalizer,
        forcing_names: Sequence[str] = (),
        forcing_normalizer: Optional[StandardNormalizer] = None,
        interpolator_ema_params=None,
    ):
        if diffusion_cfg.timesteps != cfg.horizon:
            raise ValueError("diffusion timesteps must equal horizon "
                             f"({diffusion_cfg.timesteps} != {cfg.horizon})")
        if diffusion_cfg.interpolator_use_ema and interpolator_ema_params is None:
            # fail loudly: silently running non-EMA weights is exactly the bug
            # class the reference avoids by swapping EMA inside q_sample
            # (dyffusion.py:121-122,236-237)
            raise ValueError(
                "diffusion.interpolator_use_ema=True but no interpolator EMA "
                "params were provided (the interpolator checkpoint has no "
                "ema_params)"
            )
        self.model = forecaster_model
        self.interpolator = interpolator
        self.interpolator_params = interpolator_params
        self.interpolator_ema_params = interpolator_ema_params
        self.diffusion_cfg = diffusion_cfg
        self.sched: DiffusionSchedule = build_schedule(diffusion_cfg)
        self.cfg = cfg
        self.in_packer = in_packer
        self.out_packer = out_packer
        self.normalizer = normalizer
        self.forcing_names = tuple(forcing_names)
        self.forcing_normalizer = forcing_normalizer
        self.criterion = get_loss_fn(cfg.loss_function)
        self._out_idx = _out_indices(in_packer, out_packer)

    def _interp_fn(self, ip_params=None, training: bool = False):
        """Interpolate-fn over explicit params. Callers inside jit MUST pass
        ``ip_params`` as a traced argument — closing over the stored params
        embeds ~hundreds of MB of literals into the compiled program, which
        breaks remote compilation (same failure class as baked-in SHT
        matrices).

        The interpolator's stochastic dropout is always on during training
        (reference q_sample: ``do_enable = self.training or ...``,
        dyffusion.py:226-231)."""
        use_do = training or bool(self.diffusion_cfg.enable_interpolator_dropout)
        return self.interpolator.make_interpolate_fn(
            ip_params if ip_params is not None else self.active_interpolator_params,
            hack_for_imprecise_interpolation=self.diffusion_cfg.hack_for_imprecise_interpolation,
            use_inference_dropout=use_do,
        )

    def _forecast_fn(self, params, deterministic: bool = True,
                     rng: Optional[jax.Array] = None):
        def forecast_fn(x_t, time, condition, static_condition=None):
            kwargs = (
                dict(deterministic=False, rngs={"dropout": rng})
                if (not deterministic and rng is not None)
                else dict(deterministic=True)
            )
            return self.model.apply(
                params, x_t, time=jnp.asarray(time, jnp.float32),
                condition=condition, static_condition=static_condition, **kwargs
            )

        return forecast_fn

    @property
    def active_interpolator_params(self):
        """The interpolator pytree q_sample actually runs with: the EMA tree
        when ``diffusion_cfg.interpolator_use_ema`` is set (reference swaps
        interpolator EMA weights inside q_sample, dyffusion.py:121-122,
        236-237), else the raw trained weights."""
        if self.diffusion_cfg.interpolator_use_ema:
            return self.interpolator_ema_params
        return self.interpolator_params

    @property
    def aux_params(self):
        """Non-trainable parameter trees that must enter jitted steps as
        arguments (the frozen interpolator)."""
        return self.active_interpolator_params

    def train_loss(
        self,
        params,
        dynamics: jax.Array,
        rng: jax.Array,
        dynamical_condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        aux_params=None,
        random_timestep: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if random_timestep is not None:
            raise ValueError(
                "DYffusion forecasting draws its own diffusion timestep; "
                "sparse 'random'/'interpolation' loader strategies are not "
                "supported (use 'sequential' or 'direct')"
            )
        rng_p, rng_drop = jax.random.split(rng)
        input_dynamics = _stack_window(dynamics[:, : self.cfg.window])
        x_last = dynamics[:, -1][..., self._out_idx]
        cond_kwargs = {}
        if dynamical_condition is not None:
            cond_kwargs["dynamical_condition"] = dynamical_condition
        if static_condition is not None:
            cond_kwargs["static_condition"] = static_condition
        losses = p_losses(
            self._interp_fn(aux_params, training=True),
            self._forecast_fn(params, deterministic=False, rng=rng_drop),
            self.diffusion_cfg,
            self.sched,
            input_dynamics,
            x_last,
            rng_p,
            criterion=self.criterion,
            **cond_kwargs,
        )
        return losses["loss"], losses

    def predict(
        self,
        params,
        initial_condition: jax.Array,
        rng: jax.Array,
        dynamical_condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        aux_params=None,
    ):
        """Run the full cold-sampling loop; returns Intermediates with
        per-dynamical-step preds in out-channel space. Uses the fused
        lax.scan sampler when the config admits it (identical math, ~5x
        faster compile — important when this runs inside jitted/vmapped
        validation)."""
        cond_kwargs = {}
        if dynamical_condition is not None:
            cond_kwargs["dynamical_condition"] = dynamical_condition
        if static_condition is not None:
            cond_kwargs["static_condition"] = static_condition
        from ..diffusion import sample_loop_scan, scan_compatible

        sampler = (sample_loop_scan
                   if scan_compatible(self.diffusion_cfg, self.sched)
                   else sample_loop)
        return sampler(
            self._interp_fn(aux_params),
            self._forecast_fn(params, deterministic=True),
            self.diffusion_cfg,
            self.sched,
            initial_condition,
            rng,
            **cond_kwargs,
        )


class SimultaneousForecastingExperiment:
    """ACE-style baseline: predict ``horizon_at_once`` steps in one forward by
    stacking time into channels, optionally trained autoregressively with
    per-step loss weights (reference
    AbstractSimultaneousMultiHorizonForecastingModule,
    forecasting_multi_horizon.py:521-663)."""

    def __init__(
        self,
        model,
        cfg: ExperimentConfig,
        in_packer: Packer,
        out_packer: Packer,
        normalizer: StandardNormalizer,
        horizon_at_once: Optional[int] = None,
        autoregressive_loss_weights: Optional[Sequence[float]] = None,
        forcing_names: Optional[Sequence[str]] = None,
        forcing_normalizer: Optional[StandardNormalizer] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.in_packer = in_packer
        self.out_packer = out_packer
        self.normalizer = normalizer
        # the static_condition channel names/stats (consumed by the ACE
        # inference adapter, run_inference._run_ace_from_checkpoint)
        self.forcing_names = list(forcing_names or [])
        self.forcing_normalizer = forcing_normalizer
        self.horizon_at_once = horizon_at_once or cfg.horizon
        if cfg.horizon % self.horizon_at_once != 0:
            raise ValueError("horizon must be divisible by horizon_at_once")
        self.num_ar_steps = cfg.horizon // self.horizon_at_once
        self.ar_weights = (
            list(autoregressive_loss_weights)
            if autoregressive_loss_weights is not None
            else [1.0 / self.num_ar_steps] * self.num_ar_steps
        )
        self.criterion = get_loss_fn(cfg.loss_function)
        self._out_idx = _out_indices(in_packer, out_packer)

    def _stack_targets(self, frames: jax.Array) -> jax.Array:
        # (B, hao, H, W, C_out) -> (B, H, W, hao*C_out)
        return _stack_window(frames)

    def train_loss(
        self,
        params,
        dynamics: jax.Array,
        rng: jax.Array,
        dynamical_condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        random_timestep: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if random_timestep is not None:
            raise ValueError(
                "simultaneous multi-horizon training needs sequential frames; "
                "sparse 'random'/'interpolation' loader strategies are not "
                "supported"
            )
        w = self.cfg.window
        hao = self.horizon_at_once
        inputs = _stack_window(dynamics[:, :w])
        total = 0.0
        metrics = {}
        for step in range(self.num_ar_steps):
            lo = w + step * hao
            targets = self._stack_targets(dynamics[:, lo : lo + hao][..., self._out_idx])
            cond = dynamical_condition[:, lo - 1] if dynamical_condition is not None else None
            preds = self.model.apply(
                params, inputs, condition=cond, static_condition=static_condition,
                deterministic=False, rngs={"dropout": jax.random.fold_in(rng, step)},
            )
            step_loss = self.criterion(preds, targets)
            total = total + self.ar_weights[step] * step_loss
            metrics[f"loss_ar{step}"] = step_loss
            if step + 1 < self.num_ar_steps:
                # feed the last predicted frame(s) back as the next window
                B, H, W_, _ = preds.shape
                preds_frames = preds.reshape(B, H, W_, hao, len(self._out_idx))
                last = preds_frames[..., -w:, :]
                inputs = jax.lax.stop_gradient(
                    last.reshape(B, H, W_, w * len(self._out_idx))
                )
        metrics["loss"] = total
        return total, metrics

    def predict(
        self,
        params,
        inputs: jax.Array,
        rng: Optional[jax.Array] = None,
        condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One forward: (B, H, W, window*C_in) -> (B, hao, H, W, C_out)."""
        preds = self.model.apply(
            params, inputs, condition=condition, static_condition=static_condition,
            deterministic=True,
        )
        B, H, W_, _ = preds.shape
        return jnp.moveaxis(
            preds.reshape(B, H, W_, self.horizon_at_once, len(self._out_idx)), -2, 1
        )
