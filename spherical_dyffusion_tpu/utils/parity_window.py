"""Full-inference-window parity oracle.

Round-2's parity harness stopped at the SFNO forward (utils/parity.py). The
released model's actual path is the whole DYffusion inference window:
interpolator + forecaster under the cold sampler with the
``hack_for_imprecise_interpolation`` channel order, packers/normalizer rebuilt
from checkpoint hparams, and the prescriber overwrite — the path of the
reference ``run_on_batch_multistep`` (src/ace_inference/core/
stepper_multistep.py:298-466) driving ``BaseDYffusion.sample_loop``
(src/diffusion/dyffusion.py:457-567).

This module re-implements that entire window in float64 numpy, channels-first,
consuming the two torch-format ``state_dict``s directly through
:class:`~spherical_dyffusion_tpu.utils.parity.NumpySFNOOracle` — no jax, no
flax, no torch. ``scripts/parity_check.py`` runs it side by side with our
jitted :class:`~spherical_dyffusion_tpu.inference.stepper.DYffusionStepper`
(the load path ``run_inference.py`` uses) and asserts window-level agreement,
so the day real HuggingFace checkpoints appear, the secondary BASELINE target
is a single command.

Determinism: parity is checked with interpolator dropout DISABLED on both
sides (``enable_interpolator_dropout=False`` override). Dropout is a Bernoulli
mask whose sampling cannot be made bit-identical between numpy and jax; the
deterministic path covers every weight, every transform, and the full cold
update/prescriber/hand-off algebra.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..diffusion import DYffusionConfig, build_schedule
from .parity import NumpySFNOOracle

__all__ = ["NumpyDYffusionWindowOracle"]


class NumpyDYffusionWindowOracle:
    """Numpy f64 re-implementation of the reference inference window.

    Channels-first throughout (B, C, H, W), matching the reference layout.

    Args:
        interpolator: oracle over the interpolator's torch state_dict; its
            network consumes ``concat([x_end_state, x_last_state])`` (+ static
            condition) at interpolation time t and emits the out channels
            (reference ``DYffusion._interpolate``, dyffusion.py:642-662).
        forecaster: oracle over the forecaster backbone's torch state_dict;
            consumes x_t (+ forward conditioning + static condition) at the
            encoded diffusion time (reference ``predict_x_last``,
            dyffusion.py:299-355).
        cfg: the DYffusion configuration (must have
            ``enable_interpolator_dropout`` falsy for determinism).
        out_channel_indices: positions of the out (predicted) channels inside
            the state channel order. Under ``hack_for_imprecise_interpolation``
            the state is [HGTsfc] + out_names, so this is ``[1..C_state-1]``.
        prescribed_channel: index of the prescribed variable within the OUT
            channels (None = no prescriber), with ``mask_value``/
            ``interpolate_mask`` as in the reference Prescriber
            (src/ace_inference/core/prescriber.py:8-99).
    """

    def __init__(
        self,
        interpolator: NumpySFNOOracle,
        forecaster: NumpySFNOOracle,
        cfg: DYffusionConfig,
        out_channel_indices: Optional[np.ndarray] = None,
        prescribed_channel: Optional[int] = None,
        mask_value: int = 1,
        interpolate_mask: bool = False,
    ):
        # Deterministic parity requires dropout OFF (draws cannot match
        # between numpy and jax). The STOCHASTIC leg instead passes an rng to
        # run_window: interpolator dropout runs float-bernoulli at the exact
        # rate on both sides and ensemble statistics are compared.
        if (cfg.enable_interpolator_dropout not in (False, None)
                and interpolator.dropout_mlp <= 0.0):
            raise ValueError(
                "enable_interpolator_dropout=True requires the interpolator "
                "oracle to be built with its dropout_mlp rate (stochastic "
                "leg) — or disable it for deterministic parity"
            )
        self.interp = interpolator
        self.fc = forecaster
        self.cfg = cfg
        self.sched = build_schedule(cfg)
        self.out_idx = (
            np.asarray(out_channel_indices, np.int64)
            if out_channel_indices is not None else None
        )
        self.prescribed_channel = prescribed_channel
        self.mask_value = mask_value
        self.interpolate_mask = interpolate_mask

    # ----------------------------------------------------------- network ops
    def _interpolate(self, x_end: np.ndarray, x_last: np.ndarray,
                     i_t: float, static: Optional[np.ndarray],
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Reference ``DYffusion._interpolate`` (dyffusion.py:642-662):
        x_end in state channels, x_last in forecaster-out channels; returns
        state channels (hack prepend on both sides when configured). ``rng``
        activates the interpolator's train-mode dropout (the reference keeps
        the interpolator in train mode during sampling when
        ``enable_interpolator_dropout``, dyffusion.py:226-240)."""
        B = x_end.shape[0]
        if self.cfg.hack_for_imprecise_interpolation:
            x_last = np.concatenate([x_end[:, :1], x_last], axis=1)
        inputs = np.concatenate([x_end, x_last], axis=1)
        t = np.full((B,), float(i_t), np.float64)
        out, _ = self.interp.forward(
            inputs, time=t, static_condition=static, collect=False, rng=rng
        )
        if self.cfg.hack_for_imprecise_interpolation:
            out = np.concatenate([x_end[:, :1], out], axis=1)
        return out

    def _predict_x_last(self, initial_condition: np.ndarray, x_t: np.ndarray,
                        s: int, static: Optional[np.ndarray]) -> np.ndarray:
        """Reference ``predict_x_last`` + ``_predict_last_dynamics``
        (dyffusion.py:286-355) for the deterministic conditionings."""
        cfg, sched = self.cfg, self.sched
        B = initial_condition.shape[0]
        if cfg.forward_conditioning == "data":
            cond = initial_condition
        elif cfg.forward_conditioning == "none":
            cond = None
        else:
            raise ValueError(
                f"window parity supports deterministic conditioning only, "
                f"got {cfg.forward_conditioning!r}"
            )
        t_enc = float(sched.encode_time(float(s)))
        out, _ = self.fc.forward(
            x_t, time=np.full((B,), t_enc, np.float64), condition=cond,
            static_condition=static, collect=False,
        )
        return out

    # --------------------------------------------------------- cold sampling
    def sample(self, initial_condition: np.ndarray,
               static: Optional[np.ndarray] = None,
               rng: Optional[np.random.Generator] = None,
               ) -> Tuple[Dict[int, np.ndarray], Optional[np.ndarray]]:
        """One full sampling pass (reference sample_loop, dyffusion.py:457-567).

        Returns ``(preds, ar_init)`` where preds maps dynamical step h (1..H)
        to (B, C_out, H, W) and ar_init is the autoregressive hand-off in out
        channels (None unless the config produces one). ``rng`` drives the
        interpolator's dropout when ``enable_interpolator_dropout``."""
        cfg, sched = self.cfg, self.sched
        rng = rng if cfg.enable_interpolator_dropout else None
        steps = list(sched.sampling_steps)
        N = sched.num_timesteps
        last_plus_one = steps[-1] + 1
        s_next_list = steps[1:] + [last_plus_one]
        s_nnext_list = steps[2:] + [last_plus_one, last_plus_one + 1]

        def hack_prepend(x):
            return np.concatenate([initial_condition[:, :1], x], axis=1)

        x_s = initial_condition
        preds: Dict[int, np.ndarray] = {}
        ar_init = None
        xhat = None
        dynamics_pred_step = 0
        for s, s_next, s_nnext in zip(steps, s_next_list, s_nnext_list):
            is_first = s == 0
            is_last = s == N - 1
            xhat = self._predict_x_last(initial_condition, x_s, s, static)
            xhat_state = (hack_prepend(xhat)
                          if cfg.hack_for_imprecise_interpolation else xhat)

            time_i_n = float(sched.d_to_i(s_next)) if not is_last else math.inf
            is_dynamics_pred = float(time_i_n).is_integer() or is_last

            if s_next <= N - 1:
                x_int_next = self._interpolate(
                    initial_condition, xhat, float(sched.d_to_i(s_next)),
                    static, rng=rng,
                )
            else:
                assert is_last
                x_int_next = xhat_state

            if cfg.sampling_type == "cold":
                if not cfg.use_cold_sampling_for_last_step and is_last:
                    if cfg.cold_ar_init:
                        x_int_s = self._interpolate(
                            initial_condition, xhat, float(sched.d_to_i(s)),
                            static, rng=rng,
                        )
                        ar = x_s + xhat_state - x_int_s
                        if cfg.hack_for_imprecise_interpolation:
                            ar = ar[:, 1:]
                        ar_init = ar
                    x_s = xhat_state
                else:
                    if s > 0:
                        x_int_s = self._interpolate(
                            initial_condition, xhat, float(sched.d_to_i(s)),
                            static, rng=rng,
                        )
                    else:
                        x_int_s = x_s
                    x_s = x_s + x_int_next - x_int_s
            elif cfg.sampling_type == "naive":
                x_s = x_int_next
            else:
                raise ValueError(cfg.sampling_type)

            dynamics_pred_step = (int(time_i_n) if s < N - 1
                                  else dynamics_pred_step + 1)
            if is_dynamics_pred:
                p = (x_s if (cfg.use_cold_sampling_for_intermediate_steps
                             or is_last) else x_int_next)
                if cfg.hack_for_imprecise_interpolation:
                    p = p[:, 1:]
                preds[dynamics_pred_step] = p

        if cfg.refine_intermediate_predictions:
            dyn_steps = cfg.prediction_timesteps or list(
                sched.dynamical_steps.values())
            for i_n in [i for i in dyn_steps if i < N]:
                p = self._interpolate(initial_condition, xhat, float(i_n),
                                      static, rng=rng)
                if cfg.hack_for_imprecise_interpolation:
                    p = p[:, 1:]
                preds[int(i_n) if float(i_n).is_integer() else i_n] = p
        return preds, ar_init

    # ------------------------------------------------------------ prescriber
    def _prescribe(self, pred_out: np.ndarray, target: Optional[np.ndarray],
                   mask: Optional[np.ndarray]) -> np.ndarray:
        """Reference Prescriber.__call__ on the packed out channels
        (prescriber.py:60-99): overwrite the prescribed channel with the
        target where mask == mask_value (or lerp when interpolate)."""
        if self.prescribed_channel is None or target is None or mask is None:
            return pred_out
        ch = self.prescribed_channel
        gen = pred_out[:, ch]
        if self.interpolate_mask:
            new = mask * target + (1.0 - mask) * gen
        else:
            region = np.rint(mask).astype(np.int64) == self.mask_value
            new = np.where(region, target, gen)
        out = pred_out.copy()
        out[:, ch] = new
        return out

    # ----------------------------------------------------------- window loop
    def run_window(
        self,
        x0_state_norm: np.ndarray,  # (B, C_state, H, W) normalized
        n_steps: int,
        forcing_norm: Optional[np.ndarray] = None,  # (B, T+1, Cf, H, W) normalized
        prescribed_target_norm: Optional[np.ndarray] = None,  # (B, T+1, H, W)
        mask: Optional[np.ndarray] = None,  # (B, T+1, H, W) raw
        rng: Optional[np.random.Generator] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """The reference window loop (run_on_batch_multistep,
        stepper_multistep.py:362-427): every ``horizon`` steps one sampling
        pass runs from the last (prescribed) prediction; intermediate horizons
        come from the same pass; the prescriber overwrites every emitted step
        with the time-t target/mask; non-predicted input channels (HGTsfc
        under the hack) carry over across the hand-off.

        Returns ``(final_state (B, C_state, H, W), preds (B, n_steps, C_out,
        H, W))`` in normalized space.
        """
        cfg = self.cfg
        H_hor = cfg.timesteps
        x = np.asarray(x0_state_norm, np.float64)
        C_state = x.shape[1]
        out_idx = (self.out_idx if self.out_idx is not None
                   else np.arange(C_state))
        carry_idx = np.asarray(
            [i for i in range(C_state) if i not in set(out_idx.tolist())],
            np.int64,
        )
        emitted = []
        t_global = 0
        while t_global < n_steps:
            steps_this = min(H_hor, n_steps - t_global)
            static = (np.asarray(forcing_norm[:, t_global], np.float64)
                      if forcing_norm is not None else None)
            preds, ar_init = self.sample(x, static, rng=rng)
            seg_preds = []
            for h in range(1, steps_this + 1):
                t_abs = t_global + h
                p = self._prescribe(
                    preds[h],
                    prescribed_target_norm[:, t_abs]
                    if prescribed_target_norm is not None else None,
                    mask[:, t_abs] if mask is not None else None,
                )
                seg_preds.append(p)
            emitted.extend(seg_preds)
            # autoregressive hand-off (stepper_multistep.py:412-426)
            if ar_init is not None and steps_this == H_hor:
                t_abs = t_global + H_hor
                last = self._prescribe(
                    ar_init,
                    prescribed_target_norm[:, t_abs]
                    if prescribed_target_norm is not None else None,
                    mask[:, t_abs] if mask is not None else None,
                )
            else:
                last = seg_preds[-1]
            x_next = np.zeros_like(x)
            x_next[:, out_idx] = last
            if carry_idx.size:
                x_next[:, carry_idx] = x[:, carry_idx]
            x = x_next
            t_global += steps_this
        return x, np.stack(emitted, axis=1)
