"""DYffusion multi-step stepper: the jitted autoregressive window kernel.

TPU-first re-design of the reference MultiStepStepper
(src/ace_inference/core/stepper_multistep.py:80-466). The reference loops
python-side over every forecast step, re-packing dicts and re-entering the
module; here an entire ``forward_steps_in_memory`` window is ONE compiled XLA
program: a ``lax.scan`` over autoregressive segments whose body is the full
DYffusion cold-sampling loop, with the prescriber overwrite fused in. The
ensemble dimension is plain batch (vmap-free tiling) and shardable over the
mesh; all stochasticity is explicit rng.

Semantics pinned to the reference hot loop (stepper_multistep.py:364-426):
* every ``horizon`` steps a new sample_loop runs from the last (prescribed)
  prediction; intermediate horizons are served from the same sampling pass;
* forcings enter as ``static_condition`` at the segment's initial time
  (stepper_multistep.py:383-386);
* the prescriber overwrites the SST channel of every emitted step and of the
  autoregressive hand-off (stepper_multistep.py:404-426);
* input channels that are not predicted (e.g. HGTsfc under
  ``hack_for_imprecise_interpolation``) are carried over from the previous
  state (stepper_multistep.py:421-422).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import sample_loop, sample_loop_scan, scan_compatible
from ..training.experiments import DYffusionForecastingExperiment
from .prescriber import NullPrescriber, PackedPrescriber

__all__ = ["DYffusionStepper"]


class DYffusionStepper:
    """Runs windows of an autoregressive rollout as single XLA programs."""

    def __init__(
        self,
        experiment: DYffusionForecastingExperiment,
        params,
        prescriber: Optional[PackedPrescriber] = None,
        use_ema_params: bool = False,
        ema_params=None,
        mesh=None,
        inputs_noise: Optional[float] = None,
        params_dtype: Optional[str] = None,
        preds_dtype: Optional[str] = None,
    ):
        """``use_ema_params`` selects the forecaster's EMA tree (``ema_params``)
        for the rollout, the reference MultiStepStepper semantics; the
        interpolator side independently honors
        ``diffusion_cfg.interpolator_use_ema`` via the experiment's
        ``active_interpolator_params``.

        ``mesh``: optional ``jax.sharding.Mesh`` for pod-scale rollouts — the
        IC x ensemble batch rows shard over the mesh's ``data`` axis (the
        reference rank-shards samples across GPUs, data_loading/inference.py:
        103-112; here XLA partitions one program instead), params replicate."""
        self.exp = experiment
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if use_ema_params:
            if ema_params is None:
                raise ValueError(
                    "use_ema_params=True requires ema_params (the checkpoint "
                    "has no EMA weights)"
                )
            params = ema_params
        # both networks' params travel as ONE argument pytree into the jitted
        # rollout — closing over either would embed hundreds of MB of weights
        # as program literals (breaks remote compilation)
        self.params = {
            "forecaster": params,
            "interpolator": getattr(
                experiment, "active_interpolator_params",
                getattr(experiment, "interpolator_params", None),
            ),
        }
        # Half-precision weight STORAGE for the rollout (inference only).
        # With compute_dtype=bfloat16 every weight/constant is cast to bf16
        # at its point of use anyway (flax dtype args / matmul_dtype casts),
        # so pre-storing the tree in bf16 is numerically identical while
        # halving the HBM bytes the (bandwidth-bound) window program reads
        # per layer — the embed-256 dhconv weight alone is 95MB/layer in f32.
        # Pair with compute_dtype/sht_matmul_dtype of the same width; under
        # f32 compute the upcast re-introduces the storage rounding.
        if params_dtype:
            pd = jnp.dtype(params_dtype)

            def _cast_tree(tree):
                return jax.tree_util.tree_map(
                    lambda a: a.astype(pd)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    tree,
                )

            # ONE jitted program for the whole tree: per-leaf eager .astype
            # would be hundreds of dispatches (seconds each through the axon
            # tunnel, CLAUDE.md rule 4)
            self.params = jax.jit(_cast_tree)(self.params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            self.params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), self.params
            )
        self.prescriber = prescriber or NullPrescriber()
        # per-member gaussian input perturbation of the INITIAL condition
        # (reference prediction_inputs_noise / get_ensemble_inputs,
        # _base_experiment.py:852-877: applied once when the ensemble inputs
        # are created). Batch rows are ensemble members; the rollout driver
        # applies it on the first window only, so the number of injections is
        # independent of forward_steps_in_memory (a pure performance knob).
        self.inputs_noise = float(
            inputs_noise
            if inputs_noise is not None
            else getattr(experiment.cfg, "prediction_inputs_noise", 0.0) or 0.0
        )
        # dtype of the EMITTED per-step predictions (the (B, n_steps, H, W, C)
        # window buffer). "bfloat16" halves the dominant HBM residency of long
        # windows (the ensemble-4 x window-96 OOM driver) and the per-window
        # device->host fetch bytes in the writer path. The autoregressive
        # hand-off state always stays full precision — only the emitted COPY
        # is rounded, so rollout trajectories are unchanged.
        self.preds_dtype = jnp.dtype(preds_dtype) if preds_dtype else None
        self.horizon = experiment.cfg.horizon
        in_names = list(experiment.in_packer.names)
        out_names = list(experiment.out_packer.names)
        self._out_idx = np.asarray([in_names.index(n) for n in out_names])
        # channels of the state that are NOT predicted -> carried across steps
        self._carry_idx = np.asarray(
            [i for i, n in enumerate(in_names) if n not in out_names], dtype=np.int64
        )
        self._rollout_cache: Dict[int, Callable] = {}

    # ------------------------------------------------------------------ build
    def _build_rollout(self, n_steps: int) -> Callable:
        """Compile a rollout over ``n_steps`` forecast steps.

        n_steps = n_full * horizon + r. Full segments run under one lax.scan;
        a trailing partial segment (r > 0) runs one more sampling pass and
        hands off its r-th prediction, mirroring the reference behavior at
        window boundaries (run_on_batch_multistep restarts the horizon phase
        each window, stepper_multistep.py:364-372)."""
        H = self.horizon
        n_full, r = divmod(n_steps, H)
        exp = self.exp
        prescriber = self.prescriber
        out_idx = jnp.asarray(self._out_idx)
        carry_idx = jnp.asarray(self._carry_idx)
        has_prescriber = not isinstance(prescriber, NullPrescriber)
        preds_dtype = self.preds_dtype

        # the scan-form sampler compiles ~5x faster and is mathematically
        # identical for the default (released-model) configuration
        sampler = (
            sample_loop_scan
            if scan_compatible(exp.diffusion_cfg, exp.sched)
            else sample_loop
        )

        def segment(params, x, forcing, tgt, mask, rng, handoff_step: int):
            # x: (B, H, W, C_in) normalized state at segment start
            # mask: (B, H_steps, H, W) raw mask at each emitted step (the
            # reference prescribes with the time-t mask, data_time[mask_name],
            # stepper_multistep.py:408-409)
            out = sampler(
                exp._interp_fn(params["interpolator"]),
                exp._forecast_fn(params["forecaster"], deterministic=True),
                exp.diffusion_cfg,
                exp.sched,
                x,
                rng,
                static_condition=forcing,
            )
            preds = jnp.stack([out.preds[h] for h in range(1, H + 1)], axis=1)
            # preds: (B, H_steps, H, W, C_out) normalized
            if has_prescriber:
                preds = prescriber(preds, tgt, mask)
            # autoregressive hand-off (reference: ar_init if present else the
            # prediction at the hand-off step)
            if out.ar_init is not None and handoff_step == H:
                last = out.ar_init
                if has_prescriber:
                    last = prescriber(last, tgt[:, -1], mask[:, -1])
            else:
                last = preds[:, handoff_step - 1]
            # scatter predicted channels into the state; carry the rest
            x_next = jnp.zeros_like(x)
            x_next = x_next.at[..., out_idx].set(last)
            if carry_idx.size:
                x_next = x_next.at[..., carry_idx].set(x[..., carry_idx])
            # the hand-off (`last`) above was taken from the full-precision
            # preds; only the emitted copy is narrowed
            if preds_dtype is not None:
                preds = preds.astype(preds_dtype)
            return x_next, preds

        def rollout(params, x0, forcings, tgts, masks, rng, noise_scale):
            """x0: (B, H, W, C_in) normalized initial state.
            forcings: (n_seg_total, B, H, W, Cf) normalized forcing at segment
                      starts (or None); n_seg_total = n_full + (r > 0).
            tgts: (n_seg_total, B, H_steps, H, W) normalized prescribed-channel
                  targets (zeros when no prescriber).
            masks: (n_seg_total, B, H_steps, H, W) raw mask at each emitted
                  step (reference: prescribe with the time-t mask).
            noise_scale: traced scalar — inputs_noise on the rollout's FIRST
                  window, 0.0 on continuation windows (no recompile between).
            Returns (final_state, preds (B, n_steps, H, W, C_out))."""
            rng, nkey = jax.random.split(rng)
            x0 = x0 + noise_scale * jax.random.normal(nkey, x0.shape, x0.dtype)
            keys = jax.random.split(rng, n_full + 1)

            def split_seg(arr):
                if arr is None:
                    return None, None
                return (arr[:n_full], arr[n_full] if r > 0 else None)

            forc_full, forc_part = split_seg(forcings)
            tgt_full, tgt_part = split_seg(tgts)
            mask_full, mask_part = split_seg(masks)

            parts = []
            x = x0
            if n_full > 0:
                def body(carry, xs):
                    x, = carry
                    forcing, tgt, mask, key = xs
                    x_next, preds = segment(params, x, forcing, tgt, mask, key, H)
                    return (x_next,), preds

                (x,), preds = jax.lax.scan(
                    body, (x0,), (forc_full, tgt_full, mask_full, keys[:n_full])
                )
                # (n_full, B, H_steps, ...) -> (B, n_full * H_steps, ...)
                preds = jnp.moveaxis(preds, 0, 1)
                B = preds.shape[0]
                parts.append(preds.reshape((B, n_full * H) + preds.shape[3:]))
            if r > 0:
                x, preds_p = segment(params, x, forc_part, tgt_part, mask_part,
                                     keys[-1], r)
                parts.append(preds_p[:, :r])
            preds_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            return x, preds_all

        return jax.jit(rollout)

    def rollout_fn(self, n_steps: int) -> Callable:
        if n_steps not in self._rollout_cache:
            self._rollout_cache[n_steps] = self._build_rollout(n_steps)
        return self._rollout_cache[n_steps]

    def shard_rows(self, x: Optional[jax.Array], axis: int = 0,
                   spatial_dims=None):
        """Shard a batch-rows array over the mesh's ``data`` axis (no-op
        without a mesh). Rollout batch rows are fully independent, so this is
        the embarrassingly-parallel axis — collectives only appear if a model
        axis is also meshed. ``spatial_dims``: optional (lat_dim, lon_dim)
        axes to shard over the mesh's 'h'/'w' axes when present — the
        pod-scale spatial decomposition of the window program (XLA inserts
        the SHT/DFT contraction collectives; cf. the reference's hand-built
        distributed SHT, sfnonet.py:543-597)."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = [None] * x.ndim
        dp = self.mesh.shape.get("data", 1)
        if dp > 1 and x.shape[axis] % dp == 0:
            # fewer rows than the data axis (e.g. single-IC rollout
            # validation): leave replicated instead of sharding
            spec[axis] = "data"
        if spatial_dims is not None:
            for name, d in zip(("h", "w"), spatial_dims):
                n = self.mesh.shape.get(name, 1)
                if n > 1 and x.shape[d] % n == 0:
                    spec[d] = name
        return jax.device_put(x, NamedSharding(self.mesh, PartitionSpec(*spec)))

    # ------------------------------------------------------------------- run
    def run_window(
        self,
        x0_norm: jax.Array,
        window_forcing_norm: Optional[jax.Array],  # (B, T+1, H, W, Cf)
        window_prescribed_target_norm: Optional[jax.Array],  # (B, T+1, H, W)
        mask: Optional[jax.Array],  # (B, T+1, H, W) per-time or (B, H, W) static
        rng: jax.Array,
        n_steps: int,
        apply_inputs_noise: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Convenience wrapper: slices per-segment conditioning out of the
        window arrays and invokes the compiled rollout.

        ``apply_inputs_noise``: whether this window starts a NEW rollout (the
        initial-condition perturbation is applied) or continues one (it is
        not). Drivers pass ``start_step == 0``; the default True keeps
        single-window calls equivalent to a fresh rollout."""
        fn, args = self._window_args(
            x0_norm, window_forcing_norm, window_prescribed_target_norm,
            mask, rng, n_steps, apply_inputs_noise)
        return fn(*args)

    def _window_args(
        self,
        x0_norm: jax.Array,
        window_forcing_norm: Optional[jax.Array],
        window_prescribed_target_norm: Optional[jax.Array],
        mask: Optional[jax.Array],
        rng: jax.Array,
        n_steps: int,
        apply_inputs_noise: bool = True,
    ):
        """Argument prep for one window: returns ``(jitted_fn, args)`` so
        callers can either invoke (``run_window``) or ``jitted_fn.lower(*args)
        .compile()`` for AOT memory analysis (the multichip dryrun)."""
        H = self.horizon
        n_full, r = divmod(n_steps, H)
        n_seg = n_full + (1 if r > 0 else 0)
        B = x0_norm.shape[0]
        if window_forcing_norm is not None:
            # forcing at segment start times 0, H, 2H, ...
            seg_f = jnp.stack(
                [window_forcing_norm[:, s * H] for s in range(n_seg)], axis=0
            )
        else:
            seg_f = None  # None is an empty pytree leaf for lax.scan
        def seg_frames(arr):
            """(B, T+1, H, W) frames -> (n_seg, B, H_steps, H, W) per-segment
            slices of frames s*H+1 .. s*H+H, edge-padded so the partial
            segment can slice H frames (padded steps are never emitted nor
            used for the hand-off)."""
            need = n_seg * H + 1
            if arr.shape[1] < need:
                pad = jnp.repeat(arr[:, -1:], need - arr.shape[1], axis=1)
                arr = jnp.concatenate([arr, pad], axis=1)
            return jnp.stack(
                [arr[:, s * H + 1 : s * H + H + 1] for s in range(n_seg)], axis=0
            )

        if window_prescribed_target_norm is not None:
            seg_t = seg_frames(window_prescribed_target_norm)
        else:
            seg_t = jnp.zeros((n_seg, B, H) + x0_norm.shape[1:3], x0_norm.dtype)
        if mask is None:
            seg_m = jnp.zeros_like(seg_t)
        elif mask.ndim == 4:
            # time-varying mask frames (B, T+1, H, W): prescribe each emitted
            # step with the mask at ITS time (reference data_time[mask_name],
            # stepper_multistep.py:408-409)
            seg_m = seg_frames(mask)
        else:
            # static mask (B, H, W): broadcast over segment steps
            seg_m = jnp.broadcast_to(
                mask[None, :, None], (n_seg, B, H) + mask.shape[1:3]
            )
        if self.mesh is not None:
            x0_norm = self.shard_rows(x0_norm, spatial_dims=(1, 2))
            # (n_seg, B, [steps,] H, W[, C]) — seg_f carries a channel axis
            seg_f = self.shard_rows(seg_f, axis=1, spatial_dims=(2, 3))
            seg_t = self.shard_rows(seg_t, axis=1, spatial_dims=(3, 4))
            seg_m = self.shard_rows(seg_m, axis=1, spatial_dims=(3, 4))
        fn = self.rollout_fn(n_steps)
        scale = jnp.float32(self.inputs_noise if apply_inputs_noise else 0.0)
        return fn, (self.params, x0_norm, seg_f, seg_t, seg_m, rng, scale)
