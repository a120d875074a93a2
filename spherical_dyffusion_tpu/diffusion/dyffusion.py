"""DYffusion core — schedules, q_sample, forecasting, and cold sampling.

TPU-native, purely functional re-design of the reference DYffusion framework
(src/diffusion/dyffusion.py:19-738). Instead of stateful nn.Modules holding a
frozen interpolator, everything here is expressed over two injected callables:

    interpolate_fn(initial_condition, x_last, t, rng) -> x_t
        runs the (frozen, stochastic) interpolator at interpolation time t
        (reference ``DYffusion._interpolate``, dyffusion.py:642-662);
    forecast_fn(x_t, time, condition, rng) -> x_hat_last
        runs the forecaster backbone (reference ``_predict_last_dynamics``,
        dyffusion.py:287-297).

The diffusion-step <-> interpolation-step mapping and the sampling schedule
are *static* (config-time) quantities, so the cold-sampling loop is laid out
at trace time with no dynamic control flow — exactly what XLA wants. The
stochastic interpolator dropout is explicit rng plumbing.

All tensors are channels-last (B, H, W, C).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DYffusionConfig", "DiffusionSchedule", "build_schedule",
           "q_sample", "predict_x_last", "p_losses", "sample_loop", "Intermediates"]

InterpolateFn = Callable[..., jax.Array]
ForecastFn = Callable[..., jax.Array]


@dataclasses.dataclass(frozen=True)
class DYffusionConfig:
    """Mirrors the reference BaseDYffusion/DYffusion hyperparameters
    (dyffusion.py:21-47, 585-610 and configs/diffusion/dyffusion.yaml)."""

    timesteps: int  # == datamodule horizon
    schedule: str = "before_t1_only"  # 'linear' | 'before_t1_only' | 'before_t1_then_linear'
    additional_interpolation_steps: int = 0
    additional_interpolation_steps_factor: int = 0
    interpolate_before_t1: bool = True
    forward_conditioning: str = "data"  # 'data' | 'none' | 'data+noise-v1' | 'data+noise-v2'
    dynamic_cond_from_t: str = "h"  # 'h' | '0' | 't'
    time_encoding: str = "dynamics"  # 'discrete' | 'continuous' | 'dynamics'
    sampling_type: str = "cold"  # 'cold' | 'naive'
    sampling_schedule: Union[None, str, Sequence[float]] = None
    use_cold_sampling_for_intermediate_steps: bool = True
    use_cold_sampling_for_last_step: bool = True
    use_cold_sampling_for_init_of_ar_step: Optional[bool] = None
    refine_intermediate_predictions: bool = False
    # peel the s=0 / s=N-1 sampling iterations out of the fused scan: the two
    # masked interpolator halves of the uniform body (~11% of the window's
    # network rows) are never computed. Costs two extra compiled network
    # bodies — pair with SFNOConfig.scan_layers to keep the remote-compile
    # payload bounded (the unrolled+peeled program hangs the compile service;
    # NOTES_ROUND3 "Peeled scan sampler").
    peel_sampler: bool = False
    prediction_timesteps: Optional[Sequence[float]] = None
    enable_interpolator_dropout: Union[bool, str] = True
    interpolator_use_ema: bool = False
    hack_for_imprecise_interpolation: bool = False
    lambda_reconstruction: float = 1.0
    lambda_reconstruction2: float = 0.0
    reconstruction2_detach_x_last: bool = False

    @property
    def cold_ar_init(self) -> bool:
        if self.use_cold_sampling_for_init_of_ar_step is None:
            return self.use_cold_sampling_for_last_step
        return self.use_cold_sampling_for_init_of_ar_step


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Static diffusion-step bookkeeping (reference dyffusion.py:62-133)."""

    cfg: DYffusionConfig
    num_timesteps: int
    additional_steps: int
    additional_steps_pre_t1: int
    factor: int
    di_to_ti_add: int
    sampling_steps: tuple  # the diffusion steps visited during sampling

    def d_to_i(self, d: Union[float, jax.Array]) -> Union[float, jax.Array]:
        """Diffusion step -> interpolation step (dyffusion.py:137-188).
        Works on python scalars and jnp arrays identically."""
        sched = self.cfg.schedule
        if sched == "linear":
            return (d + self.di_to_ti_add) / (self.factor + 1)
        if sched == "before_t1_only":
            k = self.additional_steps
            if isinstance(d, (int, float)):
                return d - k if d >= k + 1 else d / (k + 1)
            return jnp.where(d >= k + 1, (d - k).astype(jnp.float32), d / (k + 1))
        if sched == "before_t1_then_linear":
            k = self.additional_steps_pre_t1
            lin = 1 + (d - k - 1) / (self.factor + 1)
            pre = d / (k + 1)
            if isinstance(d, (int, float)):
                return lin if d >= k + 1 else pre
            return jnp.where(d >= k + 1, lin, pre)
        raise ValueError(f"Unknown schedule {sched!r}")

    @property
    def dynamical_steps(self) -> Dict[int, int]:
        """Diffusion steps whose interpolation step is integral (excl. 0)."""
        out = {}
        for d in range(1, self.num_timesteps):
            i_n = self.d_to_i(d)
            if float(i_n).is_integer():
                out[d] = int(i_n)
        return out

    @property
    def artificial_steps(self) -> Dict[int, float]:
        return {
            d: float(self.d_to_i(d))
            for d in range(1, self.num_timesteps)
            if not float(self.d_to_i(d)).is_integer()
        }

    def encode_time(self, t: Union[float, jax.Array]) -> Union[float, jax.Array]:
        """Time fed to the forecaster backbone (dyffusion.py:287-297)."""
        enc = self.cfg.time_encoding
        if enc == "discrete":
            return t
        if enc == "continuous":
            return t / self.num_timesteps
        if enc == "dynamics":
            return self.d_to_i(t)
        raise ValueError(f"Unknown time_encoding {enc!r}")

    @property
    def forecaster_time_range(self) -> tuple:
        times = [float(self.encode_time(d)) for d in range(self.num_timesteps)]
        return (min(times), max(times))


def build_schedule(cfg: DYffusionConfig) -> DiffusionSchedule:
    horizon = cfg.timesteps
    if horizon <= 1:
        raise ValueError(f"timesteps/horizon must be > 1, got {horizon}")

    if cfg.schedule == "linear":
        if cfg.additional_interpolation_steps != 0:
            raise ValueError("additional_interpolation_steps must be 0 for linear schedule")
        factor = cfg.additional_interpolation_steps_factor
        if cfg.interpolate_before_t1:
            interpolated_steps, di_to_ti_add = horizon - 1, 0
        else:
            interpolated_steps, di_to_ti_add = horizon - 2, factor
        additional = factor * interpolated_steps
        additional_pre_t1 = 0
    elif cfg.schedule == "before_t1_only":
        if cfg.additional_interpolation_steps_factor != 0:
            raise ValueError("additional_interpolation_steps_factor must be 0 for before_t1_only")
        if not cfg.interpolate_before_t1:
            raise ValueError("interpolate_before_t1 must be True for before_t1_only")
        factor, di_to_ti_add = 0, 0
        additional = additional_pre_t1 = cfg.additional_interpolation_steps
    elif cfg.schedule == "before_t1_then_linear":
        if not cfg.interpolate_before_t1:
            raise ValueError("interpolate_before_t1 must be True for before_t1_then_linear")
        factor = cfg.additional_interpolation_steps_factor
        additional_pre_t1 = cfg.additional_interpolation_steps
        additional = additional_pre_t1 + factor * (horizon - 2)
        di_to_ti_add = 0
    else:
        raise ValueError(f"Invalid schedule: {cfg.schedule}")

    num_timesteps = horizon + additional
    sched = DiffusionSchedule(
        cfg=cfg,
        num_timesteps=num_timesteps,
        additional_steps=additional,
        additional_steps_pre_t1=additional_pre_t1,
        factor=factor,
        di_to_ti_add=di_to_ti_add,
        sampling_steps=(),
    )
    steps = _parse_sampling_schedule(cfg.sampling_schedule, sched)
    return dataclasses.replace(sched, sampling_steps=tuple(steps))


def _parse_sampling_schedule(schedule, sched: DiffusionSchedule) -> List[Union[int, float]]:
    """Sampling-schedule DSL (reference dyffusion.py:363-455):
    None -> all steps; 'only_dynamics[_plusN[_discrete]]', 'everyN', 'firstN'/'firstFLOAT'."""
    N = sched.num_timesteps
    if schedule is None or schedule == "None":
        return list(range(N))
    if not isinstance(schedule, str):
        steps = list(schedule)
    else:
        base = [0] + list(sched.dynamical_steps.keys())
        artificial = list(sched.artificial_steps.keys())
        if "only_dynamics" in schedule:
            steps = []
            if "only_dynamics_plus" in schedule:
                plus_n = int(schedule.replace("only_dynamics_plus", "").replace("_discrete", ""))
                steps = list(np.linspace(0, base[1], plus_n + 1, endpoint=False))
                if "_discrete" in schedule:
                    steps = [int(np.floor(s)) for s in steps]
            elif schedule != "only_dynamics":
                raise ValueError(f"Invalid sampling schedule: {schedule}")
        elif schedule.startswith("every"):
            n = int(schedule.replace("every", "").rstrip("thndrdst"))
            if not 1 <= n <= N:
                raise ValueError(f"Invalid sampling schedule: {schedule}")
            steps = artificial[::n]
        elif schedule.startswith("first"):
            first_n = float(schedule.replace("first", "").replace("v2", ""))
            if first_n < 1:
                first_n = int(np.ceil(first_n * len(artificial)))
            else:
                if not float(first_n).is_integer():
                    raise ValueError(f"first_n >= 1 must be an integer: {first_n}")
                first_n = int(first_n)
            steps = artificial[:first_n]
        else:
            raise ValueError(f"Invalid sampling schedule: {schedule!r}")
        steps = steps + base
    steps = sorted(set(steps))
    if steps[0] != 0:
        steps = [0] + steps
    if not 1 <= steps[-1] <= N:
        raise ValueError(f"Invalid sampling schedule end: {steps}")
    for a, b in zip(steps, steps[1:]):
        if b <= a:
            raise ValueError(f"Sampling schedule not strictly increasing: {steps}")
    if all(float(s).is_integer() for s in steps):
        steps = [int(s) for s in steps]
    return steps


# ---------------------------------------------------------------------------
# hack_for_imprecise_interpolation channel shims (reference dyffusion.py:41-44,
# 501-502, 532-533, 655-661): the interpolator was trained with one extra
# input-only channel (channel 0 of its packed inputs) that the forecaster does
# not predict. Contract here: ``interpolate_fn`` itself performs the input
# prepend and output prepend (like the reference ``DYffusion._interpolate``),
# i.e. it accepts x_last with the *forecaster* channel count and returns the
# *state* channel count. sample_loop/p_losses only handle the remaining shims:
# the last-step shortcut, the AR hand-off slice and the final preds slice.
# ---------------------------------------------------------------------------


def _hack_prepend(initial_condition: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.concatenate([initial_condition[..., :1], x], axis=-1)


def q_sample(
    interpolate_fn: InterpolateFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    x_end: jax.Array,
    x0: jax.Array,
    t: jax.Array,
    rng: jax.Array,
    interpolation_time: Optional[jax.Array] = None,
    **kwargs: Any,
) -> jax.Array:
    """Run the stochastic interpolator at the interpolation step of diffusion
    step ``t`` (reference q_sample, dyffusion.py:190-240).

    x_end = initial conditions (time 0); x0 = last timestep (diffusion naming).
    ``t`` may be a scalar or per-sample array of *diffusion* steps, or pass
    ``interpolation_time`` directly. The interpolator's stochastic dropout is
    driven by ``rng``.
    """
    if interpolation_time is not None:
        i_t = interpolation_time
    else:
        i_t = sched.d_to_i(jnp.asarray(t, jnp.float32))
    i_t = jnp.asarray(i_t, jnp.float32)
    if i_t.ndim == 0:
        i_t = jnp.full((x0.shape[0],), i_t, jnp.float32)
    # Valid interpolator range is the OPEN interval (0, horizon) — with
    # additional_interpolation_steps k > 0, artificial diffusion steps map to
    # genuine fractional times in (0, 1) which must pass through unchanged
    # (reference _interpolate asserts 0 < t < horizon, dyffusion.py:642-662).
    # Only the masked t == 0 lane (callers select it away) gets a dummy time.
    i_t_safe = jnp.where(i_t > 0, i_t, 1.0)
    return interpolate_fn(x_end, x0, i_t_safe, rng, **kwargs)


def predict_x_last(
    forecast_fn: ForecastFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    initial_condition: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    rng: Optional[jax.Array] = None,
    static_condition: Optional[jax.Array] = None,
    dynamical_condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Forecast x_{t0+h} from x_t (reference predict_x_last, dyffusion.py:299-355)."""
    B = initial_condition.shape[0]
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.full((B,), t, jnp.float32)

    ctype = cfg.forward_conditioning
    if ctype == "data":
        forward_cond = initial_condition
    elif ctype == "none":
        forward_cond = None
    elif ctype in ("data+noise-v1", "data+noise-v2"):
        if rng is None:
            raise ValueError("data+noise conditioning requires an rng")
        tfac = (t / (sched.num_timesteps - 1)).reshape((B,) + (1,) * (initial_condition.ndim - 1))
        noise = jax.random.normal(rng, initial_condition.shape, initial_condition.dtype)
        if ctype == "data+noise-v1":
            forward_cond = tfac * initial_condition + (1 - tfac) * noise
        else:
            forward_cond = (1 - tfac) * initial_condition + tfac * noise
    else:
        raise ValueError(f"Invalid forward conditioning {ctype!r}")

    if dynamical_condition is not None:
        # (B, T+1, H, W, Cc) window of forcings; slice per dynamic_cond_from_t
        if cfg.dynamic_cond_from_t == "0":
            dyn = dynamical_condition[:, 0]
        elif cfg.dynamic_cond_from_t == "h":
            dyn = dynamical_condition[:, -1]
        elif cfg.dynamic_cond_from_t == "t":
            idx = jnp.round(t).astype(jnp.int32)
            dyn = dynamical_condition[jnp.arange(B), idx]
        else:
            raise ValueError(f"Invalid dynamic_cond_from_t {cfg.dynamic_cond_from_t!r}")
        forward_cond = dyn if forward_cond is None else jnp.concatenate([forward_cond, dyn], axis=-1)

    time_enc = sched.encode_time(t)
    return forecast_fn(x_t, time_enc, forward_cond, static_condition)


def p_losses(
    interpolate_fn: InterpolateFn,
    forecast_fn: ForecastFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    input_dynamics: jax.Array,
    xt_last: jax.Array,
    rng: jax.Array,
    criterion: Callable[[jax.Array, jax.Array], jax.Array] = None,
    **cond_kwargs: Any,
) -> Dict[str, jax.Array]:
    """Forecaster training loss (reference DYffusion.p_losses, dyffusion.py:664-738).

    A per-sample diffusion step t ~ U{0..N-1}; for t > 0 the training input
    x_t comes from the frozen stochastic interpolator; loss1 = criterion on the
    forecast of x_last, loss2 (optional) simulates one further diffusion step.
    """
    if criterion is None:
        criterion = lambda a, b: jnp.mean(jnp.abs(a - b))  # noqa: E731 (l1, reference default)
    B = input_dynamics.shape[0]
    rng_t, rng_q1, rng_f1, rng_q2, rng_f2 = jax.random.split(rng, 5)
    t = jax.random.randint(rng_t, (B,), 0, sched.num_timesteps)

    # interpolate_fn handles the hack channel shims internally; x_interp comes
    # back with the same channel count as input_dynamics (the state channels)
    x_interp = q_sample(
        interpolate_fn, cfg, sched, input_dynamics, xt_last, t, rng_q1, **cond_kwargs
    )
    tmask = (t > 0).reshape((B,) + (1,) * (input_dynamics.ndim - 1))
    x_t_model = jnp.where(tmask, x_interp, input_dynamics)

    xt_last_pred = predict_x_last(
        forecast_fn, cfg, sched, input_dynamics, x_t_model, t, rng_f1, **cond_kwargs
    )
    loss_forward = criterion(xt_last_pred, xt_last)

    lam1, lam2 = cfg.lambda_reconstruction, cfg.lambda_reconstruction2
    if lam2 > 0:
        t2 = t + 1
        not_last = (t2 <= sched.num_timesteps - 1)
        x0_2 = xt_last_pred
        if cfg.reconstruction2_detach_x_last:
            x0_2 = jax.lax.stop_gradient(x0_2)
        t2_safe = jnp.minimum(t2, sched.num_timesteps - 1)
        x_interp2 = q_sample(
            interpolate_fn, cfg, sched, input_dynamics, x0_2, t2_safe, rng_q2, **cond_kwargs
        )
        x_last_pred2 = predict_x_last(
            forecast_fn, cfg, sched, input_dynamics, x_interp2, t2_safe, rng_f2, **cond_kwargs
        )
        # Masked mean over samples where t2 is valid, using the *injected*
        # criterion per sample (the reference applies the configured loss to
        # the masked subset, dyffusion.py p_losses). Per-sample application
        # (singleton batch axis) + masked mean is exactly the masked-subset
        # criterion for all supported losses (l1/l2/l1_rel/l2_rel), since
        # each decomposes as a mean of per-sample values.
        mask = not_last.astype(xt_last.dtype)
        per_sample = jax.vmap(lambda a, b: criterion(a[None], b[None]))(
            x_last_pred2, xt_last
        )
        loss_forward2 = jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        loss_forward2 = jnp.asarray(0.0, xt_last.dtype)

    loss = lam1 * loss_forward + lam2 * loss_forward2
    return {"loss": loss, "loss_forward": loss_forward, "loss_forward2": loss_forward2}


@dataclasses.dataclass
class Intermediates:
    """Outputs of one cold-sampling pass over a horizon window."""

    preds: Dict[int, jax.Array]  # dynamical step -> prediction (B, H, W, C)
    x_last: jax.Array  # final forecast of x_{t0+h}
    ar_init: Optional[jax.Array] = None  # autoregressive hand-off state


def sample_loop(
    interpolate_fn: InterpolateFn,
    forecast_fn: ForecastFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    initial_condition: jax.Array,
    rng: jax.Array,
    **cond_kwargs: Any,
) -> Intermediates:
    """Cold sampling (reference sample_loop, dyffusion.py:457-567).

    The sampling schedule is static, so the loop unrolls at trace time:
    per visited step s:  xhat = F(x_s, s);  then the cold update
    x_s <- x_s + I(xhat, s_next) - I(xhat, s), with the documented special
    cases at the first/last step. Ensemble members are batch rows; all
    stochasticity flows through ``rng``.
    """
    steps = list(sched.sampling_steps)
    N = sched.num_timesteps
    last_plus_one = steps[-1] + 1
    s_next_list = steps[1:] + [last_plus_one]
    s_nnext_list = steps[2:] + [last_plus_one, last_plus_one + 1]

    x_s = initial_condition
    preds: Dict[int, jax.Array] = {}
    ar_init = None
    xhat = None
    dynamics_pred_step = 0
    n_steps = len(steps)
    rngs = jax.random.split(rng, 3 * n_steps + 8)
    ri = iter(range(len(rngs)))

    def interp(x0, t_val, key):
        # all conditioning kwargs flow through to the interpolator, like the
        # reference q_sample(**kwargs) -> _interpolate (dyffusion.py:496-499)
        return q_sample(
            interpolate_fn, cfg, sched, initial_condition, x0, None, key,
            interpolation_time=jnp.asarray(float(t_val), jnp.float32),
            **cond_kwargs,
        )

    fc_kwargs = dict(cond_kwargs)
    for s, s_next, s_nnext in zip(steps, s_next_list, s_nnext_list):
        is_first = s == 0
        is_last = s == N - 1

        xhat = predict_x_last(
            forecast_fn, cfg, sched, initial_condition, x_s, float(s),
            rngs[next(ri)], **fc_kwargs
        )
        # state-channel view of xhat for paths that bypass the interpolator
        xhat_state = (
            _hack_prepend(initial_condition, xhat)
            if cfg.hack_for_imprecise_interpolation
            else xhat
        )

        time_i_n = float(sched.d_to_i(s_next)) if not is_last else math.inf
        is_dynamics_pred = float(time_i_n).is_integer() or is_last

        if s_next <= N - 1:
            x_int_next = interp(xhat, sched.d_to_i(s_next), rngs[next(ri)])
        else:
            assert is_last
            x_int_next = xhat_state

        if cfg.sampling_type == "cold":
            if not cfg.use_cold_sampling_for_last_step and is_last:
                if cfg.cold_ar_init:
                    x_int_s = interp(xhat, sched.d_to_i(s), rngs[next(ri)])
                    ar = x_s + xhat_state - x_int_s
                    if cfg.hack_for_imprecise_interpolation:
                        ar = ar[..., 1:]
                    ar_init = ar
                x_s = xhat_state
            else:
                x_int_s = interp(xhat, sched.d_to_i(s), rngs[next(ri)]) if s > 0 else x_s
                x_s = x_s + x_int_next - x_int_s
        elif cfg.sampling_type == "naive":
            x_s = x_int_next
        else:
            raise ValueError(f"Unknown sampling type {cfg.sampling_type!r}")

        dynamics_pred_step = int(time_i_n) if s < N - 1 else dynamics_pred_step + 1
        if is_dynamics_pred:
            p = x_s if (cfg.use_cold_sampling_for_intermediate_steps or is_last) else x_int_next
            if cfg.hack_for_imprecise_interpolation:
                p = p[..., 1:]
            preds[dynamics_pred_step] = p

    if cfg.refine_intermediate_predictions:
        # re-run the interpolator on the final xhat for all intermediate steps
        # (reference dyffusion.py:546-564)
        dyn_steps = cfg.prediction_timesteps or list(sched.dynamical_steps.values())
        dyn_steps = [i for i in dyn_steps if i < N]
        for i_n in dyn_steps:
            p = interp(xhat, i_n, rngs[next(ri)])
            if cfg.hack_for_imprecise_interpolation:
                p = p[..., 1:]
            key = int(i_n) if float(i_n).is_integer() else i_n
            preds[key] = p

    x_last = x_s if last_plus_one < N else xhat
    return Intermediates(preds=preds, x_last=x_last, ar_init=ar_init)


def scan_compatible(cfg: DYffusionConfig, sched: DiffusionSchedule) -> bool:
    """Whether the config admits the fused lax.scan sampler below."""
    return (
        cfg.sampling_type == "cold"
        and tuple(sched.sampling_steps) == tuple(range(sched.num_timesteps))
        and cfg.use_cold_sampling_for_intermediate_steps
        and cfg.use_cold_sampling_for_last_step
        and not cfg.refine_intermediate_predictions
    )


def sample_loop_scan(
    interpolate_fn: InterpolateFn,
    forecast_fn: ForecastFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    initial_condition: jax.Array,
    rng: jax.Array,
    **cond_kwargs: Any,
) -> Intermediates:
    """Cold sampling as ONE ``lax.scan`` over diffusion steps.

    Mathematically identical to :func:`sample_loop` for the default
    configuration (full schedule, cold updates everywhere — the released-model
    path), but the compiled program contains a single step body (1 forecaster
    + 2 interpolator applications) instead of the fully unrolled schedule,
    cutting XLA compile time by ~5x for horizon-6 windows. The first/last-step
    special cases of the reference loop (dyffusion.py:479-544) become selects:
    the s=0 interpolation and the s=N-1 next-step interpolation are computed
    but masked out (2 wasted interpolator calls per window).
    """
    if not scan_compatible(cfg, sched):
        raise ValueError("config is not scan-compatible; use sample_loop")
    N = sched.num_timesteps
    B = initial_condition.shape[0]
    if cfg.peel_sampler and N >= 3:
        return _sample_loop_scan_peeled(
            interpolate_fn, forecast_fn, cfg, sched, initial_condition, rng,
            **cond_kwargs,
        )

    def interp(x0, t_arr, key):
        return q_sample(
            interpolate_fn, cfg, sched, initial_condition, x0, None, key,
            interpolation_time=t_arr, **cond_kwargs
        )

    def body(x_s, s_key):
        s, key = s_key
        k1, k2 = jax.random.split(key, 2)
        t = jnp.full((B,), s, jnp.float32)
        xhat = predict_x_last(
            forecast_fn, cfg, sched, initial_condition, x_s, t, k1, **cond_kwargs
        )
        xhat_state = (
            _hack_prepend(initial_condition, xhat)
            if cfg.hack_for_imprecise_interpolation else xhat
        )
        sf = s.astype(jnp.float32)
        i_next = sched.d_to_i(jnp.minimum(sf + 1.0, float(N - 1)))
        i_s = sched.d_to_i(jnp.maximum(sf, 1.0))
        # the two interpolations of the cold update run as ONE double-batch
        # application: at B=1 (single-IC rollouts) this doubles the MXU batch
        # and halves interpolator dispatches vs two separate calls
        # i_next/i_s are always > 0 by construction (d >= 1 lanes; masked lanes
        # are selected away below) — guard only against a non-positive dummy,
        # never clamp genuine fractional times in (0, 1) from k > 0 schedules
        t_pair = jnp.concatenate([jnp.full((B,), i_next), jnp.full((B,), i_s)])
        t_pair = jnp.where(t_pair > 0, t_pair, 1.0)
        ic2 = jnp.concatenate([initial_condition, initial_condition])
        cond2 = {
            k: (jnp.concatenate([v, v]) if hasattr(v, "shape") else v)
            for k, v in cond_kwargs.items()
        }
        pair = interpolate_fn(ic2, jnp.concatenate([xhat, xhat]), t_pair, k2, **cond2)
        x_int_next_i, x_int_s_i = pair[:B], pair[B:]
        x_int_next = jnp.where(s < N - 1, x_int_next_i, xhat_state)
        x_int_s = jnp.where(s > 0, x_int_s_i, x_s)
        x_next = x_s + x_int_next - x_int_s
        return x_next, (x_next, xhat)

    steps = jnp.arange(N)
    keys = jax.random.split(rng, N)
    _, (states, xhats) = jax.lax.scan(body, initial_condition, (steps, keys))

    # map scan iterations to dynamical-step predictions using the static
    # schedule: iteration s emits the prediction for interpolation step i(s+1)
    # (i(N-1 -> last) emits step N... == horizon T)
    preds: Dict[int, jax.Array] = {}
    for s in range(N):
        i_next = sched.d_to_i(s + 1) if s < N - 1 else float(cfg.timesteps)
        if float(i_next).is_integer():
            p = states[s]
            if cfg.hack_for_imprecise_interpolation:
                p = p[..., 1:]
            preds[int(i_next)] = p
    return Intermediates(preds=preds, x_last=xhats[-1], ar_init=None)


def _sample_loop_scan_peeled(
    interpolate_fn: InterpolateFn,
    forecast_fn: ForecastFn,
    cfg: DYffusionConfig,
    sched: DiffusionSchedule,
    initial_condition: jax.Array,
    rng: jax.Array,
    **cond_kwargs: Any,
) -> Intermediates:
    """:func:`sample_loop_scan` with the s=0 and s=N-1 iterations peeled out
    of the scan (``DYffusionConfig.peel_sampler``).

    The uniform scan body computes a double-batch interpolation per iteration
    and masks one half away at the first and last steps — 2 of the window's
    2N interpolator rows (~11% of its network rows at N=6) are wasted. Here
    the ends degenerate instead of masking:

    * s=0: ``x_int_s == x_s``, so the cold update collapses to
      ``x_1 = I(xhat_0, i(1))`` — one single-batch interpolation;
    * s=N-1: ``x_int_next == xhat`` (no interpolation past the horizon), so
      ``x_N = x_{N-1} + xhat - I(xhat, i(N-1))`` — one single-batch
      interpolation;
    * s=1..N-2 run the scan body with both halves live and no select lanes.

    Same math as the reference loop (dyffusion.py:479-544) and as
    :func:`sample_loop_scan` (equivalence-tested); the compiled program
    carries three network subgraph shapes instead of one, which is only
    tractable through the remote-compile tunnel with scanned block bodies
    (``SFNOConfig.scan_layers``)."""
    N = sched.num_timesteps
    B = initial_condition.shape[0]
    keys = jax.random.split(rng, 2 * N)
    fkeys, ikeys = keys[:N], keys[N:]

    def interp1(xhat, i_t, key):
        # direct interpolator application at a genuine time in (0, horizon) —
        # the same call shape as the scan body's pair (q_sample's t==0 guard
        # is unnecessary: i(1) > 0 and i(N-1) > 0 by construction)
        t_arr = jnp.full((B,), float(i_t), jnp.float32)
        return interpolate_fn(initial_condition, xhat, t_arr, key, **cond_kwargs)

    # s = 0
    xhat0 = predict_x_last(
        forecast_fn, cfg, sched, initial_condition, initial_condition,
        jnp.zeros((B,), jnp.float32), fkeys[0], **cond_kwargs
    )
    x1 = interp1(xhat0, sched.d_to_i(1), ikeys[0])

    # s = 1 .. N-2: uniform cold updates
    def body(x_s, s_key):
        s, fkey, ikey = s_key
        t = jnp.full((B,), s, jnp.float32)
        xhat = predict_x_last(
            forecast_fn, cfg, sched, initial_condition, x_s, t, fkey,
            **cond_kwargs
        )
        sf = s.astype(jnp.float32)
        i_next = sched.d_to_i(sf + 1.0)
        i_s = sched.d_to_i(sf)
        t_pair = jnp.concatenate([jnp.full((B,), i_next), jnp.full((B,), i_s)])
        ic2 = jnp.concatenate([initial_condition, initial_condition])
        cond2 = {
            k: (jnp.concatenate([v, v]) if hasattr(v, "shape") else v)
            for k, v in cond_kwargs.items()
        }
        pair = interpolate_fn(ic2, jnp.concatenate([xhat, xhat]), t_pair,
                              ikey, **cond2)
        x_next = x_s + pair[:B] - pair[B:]
        return x_next, x_next

    carry = x1
    states_mid = None
    if N > 3:
        steps = jnp.arange(1, N - 1)
        carry, states_mid = jax.lax.scan(
            body, x1, (steps, fkeys[1 : N - 1], ikeys[1 : N - 1])
        )
    elif N == 3:
        # a length-1 scan would still compile the body; run it inline
        carry, x2 = body(x1, (jnp.asarray(1), fkeys[1], ikeys[1]))
        states_mid = x2[None]

    # s = N-1
    xhat_l = predict_x_last(
        forecast_fn, cfg, sched, initial_condition, carry,
        jnp.full((B,), N - 1, jnp.float32), fkeys[N - 1], **cond_kwargs
    )
    xhat_state = (
        _hack_prepend(initial_condition, xhat_l)
        if cfg.hack_for_imprecise_interpolation else xhat_l
    )
    x_last_state = carry + xhat_state - interp1(
        xhat_l, sched.d_to_i(N - 1), ikeys[N - 1]
    )

    preds: Dict[int, jax.Array] = {}
    for s in range(N):
        i_next = sched.d_to_i(s + 1) if s < N - 1 else float(cfg.timesteps)
        if float(i_next).is_integer():
            if s == 0:
                p = x1
            elif s == N - 1:
                p = x_last_state
            else:
                p = states_mid[s - 1]
            if cfg.hack_for_imprecise_interpolation:
                p = p[..., 1:]
            preds[int(i_next)] = p
    return Intermediates(preds=preds, x_last=xhat_l, ar_init=None)
