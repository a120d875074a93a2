"""ACE-style single-step stepper: pack -> model -> unpack -> denorm ->
corrector -> ocean -> renorm, scanned over forecast steps.

TPU-first equivalent of the reference SingleModuleStepper
(src/ace_inference/core/stepper.py:234-591, hot loop 529-560): the reference
python-loops each step through dict packing and physics; here the whole
n-step rollout is one ``lax.scan`` program — the dict views needed by the
physics constraints (corrector/ocean operate on named fields) are pytrees
inside jit, so nothing leaves the device between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.coords import SigmaCoordinates
from ..data.normalization import StandardNormalizer
from ..data.packer import Packer
from ..training.losses import get_loss_fn
from .corrector import Corrector, CorrectorConfig
from .ocean import Ocean, OceanConfig

__all__ = ["SingleStepStepperConfig", "SingleStepStepper", "SteppedData",
           "run_ace_inference", "ace_scored_names"]


class SteppedData(struct.PyTreeNode):
    """Mirror of reference SteppedData (stepper.py:177-231)."""

    metrics: Dict[str, jax.Array]
    gen_data: Dict[str, jax.Array]
    target_data: Dict[str, jax.Array]
    gen_data_norm: Dict[str, jax.Array]
    target_data_norm: Dict[str, jax.Array]
    # normalized input-side state after the last step — the next window's
    # initial condition for chained rollouts (run_ace_inference)
    final_input_norm: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class SingleStepStepperConfig:
    """Mirrors reference SingleModuleStepperConfig (stepper.py:44-134)."""

    in_names: Sequence[str]
    out_names: Sequence[str]
    loss: str = "l2"
    corrector: Optional[CorrectorConfig] = None
    ocean: Optional[OceanConfig] = None

    @property
    def forcing_names(self) -> List[str]:
        return [n for n in self.in_names if n not in self.out_names]

    @property
    def all_names(self) -> List[str]:
        extra = list(self.ocean.names) if self.ocean is not None else []
        return list(dict.fromkeys(list(self.in_names) + list(self.out_names) + extra))


class SingleStepStepper:
    """Classic ACE autoregressive stepper over a one-step model.

    ``model_fn(params, x_norm) -> preds_norm`` maps the packed normalized
    input (B, H, W, C_in) to packed normalized outputs (B, H, W, C_out).
    """

    def __init__(
        self,
        cfg: SingleStepStepperConfig,
        model_fn: Callable,
        params,
        normalizer: StandardNormalizer,  # over all_names
        area_weights: jax.Array,
        sigma: Optional[SigmaCoordinates] = None,
    ):
        self.cfg = cfg
        self.model_fn = model_fn
        self.params = params
        self.normalizer = normalizer
        self.in_packer = Packer(cfg.in_names)
        self.out_packer = Packer(cfg.out_names)
        self.area = area_weights
        self.sigma = sigma
        self.corrector = (
            cfg.corrector.build(area_weights, sigma) if cfg.corrector is not None else None
        )
        self.ocean = cfg.ocean.build(cfg.in_names, cfg.out_names) if cfg.ocean else None
        self.loss_fn = get_loss_fn(cfg.loss)
        self._in_norm = normalizer.subset(list(cfg.in_names))
        self._out_norm = normalizer.subset(list(cfg.out_names))
        self._jitted = {}

    # ------------------------------------------------------------------- run
    def run_on_batch(self, data: Dict[str, np.ndarray], n_forward_steps: int,
                     initial_state_norm: Optional[jax.Array] = None,
                     lean: bool = False) -> SteppedData:
        """data: {name: (B, T+1, H, W)} raw fields covering the rollout.

        ``initial_state_norm``: normalized (B, H, W, C_in) state to start from
        instead of ``data[:, 0]`` — carries the model state across windows in
        a chained rollout (the reference loop's ``data_requirements``
        hand-off, ace_inference/inference/loop.py).

        ``lean``: return only ``gen_data`` + the total loss + the hand-off
        state. The target/normalized dict quartet roughly doubles the
        window's resident HBM (4 x n_names full-window maps); the rollout
        driver derives targets from its own input data."""
        key = (n_forward_steps, initial_state_norm is not None, lean)
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = jax.jit(
                lambda params, d, x0: self._run(params, d, n_forward_steps,
                                                x0, lean)
            )
        data_j = {k: jnp.asarray(v, jnp.float32) for k, v in data.items()}
        return fn(self.params, data_j, initial_state_norm)

    def _run(self, params, data: Dict[str, jax.Array], n_steps: int,
             x0_override: Optional[jax.Array] = None,
             lean: bool = False) -> SteppedData:
        cfg = self.cfg
        in_names = list(cfg.in_names)
        out_names = list(cfg.out_names)
        forcing_names = cfg.forcing_names
        in_norm, out_norm = self._in_norm, self._out_norm

        x0_raw = jnp.stack([data[n][:, 0] for n in in_names], axis=-1)
        x0 = in_norm.normalize(x0_raw) if x0_override is None else x0_override

        # per-step slices, time-major for lax.scan
        def tslice(names, t0, t1):
            return {n: jnp.moveaxis(data[n][:, t0:t1], 1, 0) for n in names}

        step_raw_cur = tslice(list(data.keys()), 0, n_steps)  # step t (input side)
        step_raw_next = tslice(list(data.keys()), 1, n_steps + 1)  # step t+1 (target)

        out_idx = {n: i for i, n in enumerate(out_names)}

        def body(x, xs):
            cur_raw, next_raw = xs
            preds_norm = self.model_fn(params, x)
            gen_raw_packed = out_norm.denormalize(preds_norm)
            gen_raw = {n: gen_raw_packed[..., i] for i, n in enumerate(out_names)}
            if self.corrector is not None:
                gen_raw = self.corrector(cur_raw, gen_raw)
            if self.ocean is not None:
                gen_raw = self.ocean(next_raw, cur_raw, gen_raw)
            gen_raw_packed = jnp.stack([gen_raw[n] for n in out_names], axis=-1)
            gen_norm = out_norm.normalize(gen_raw_packed)
            # next input: predicted channels + forcings refreshed from data
            # (reference stepper.py:552-556)
            cols = []
            for n in in_names:
                if n in out_idx:
                    cols.append(gen_norm[..., out_idx[n]])
                else:
                    mu = in_norm.means[in_names.index(n)]
                    sd = in_norm.stds[in_names.index(n)]
                    cols.append((next_raw[n] - mu) / sd)
            x_next = jnp.stack(cols, axis=-1)
            target_norm = out_norm.normalize(
                jnp.stack([next_raw[n] for n in out_names], axis=-1)
            )
            step_loss = self.loss_fn(gen_norm, target_norm)
            return x_next, (gen_norm, step_loss)

        x_final, (gen_norm_seq, step_losses) = jax.lax.scan(
            body, x0, (step_raw_cur, step_raw_next)
        )
        gen_norm_seq = jnp.moveaxis(gen_norm_seq, 0, 1)  # (B, T, H, W, C_out)
        gen_raw_seq = out_norm.denormalize(gen_norm_seq)

        # prepend initial state (reference prepends input as first timestep)
        init_out_raw = jnp.stack([data[n][:, 0] for n in out_names], axis=-1)
        gen_raw_full = jnp.concatenate([init_out_raw[:, None], gen_raw_seq], axis=1)
        if lean:
            return SteppedData(
                metrics={"loss": jnp.sum(step_losses)},
                gen_data={n: gen_raw_full[..., i]
                          for i, n in enumerate(out_names)},
                target_data={}, gen_data_norm={}, target_data_norm={},
                final_input_norm=x_final,
            )
        gen_norm_full = jnp.concatenate(
            [out_norm.normalize(init_out_raw)[:, None], gen_norm_seq], axis=1
        )

        tgt_raw = {n: data[n][:, : n_steps + 1] for n in out_names}
        tgt_norm = {
            n: (data[n][:, : n_steps + 1] - out_norm.means[i]) / out_norm.stds[i]
            for i, n in enumerate(out_names)
        }
        metrics = {
            "loss": jnp.sum(step_losses),
            **{f"loss_step_{i}": step_losses[i] for i in range(n_steps)},
        }
        return SteppedData(
            metrics=metrics,
            gen_data={n: gen_raw_full[..., i] for i, n in enumerate(out_names)},
            target_data=tgt_raw,
            gen_data_norm={n: gen_norm_full[..., i] for i, n in enumerate(out_names)},
            target_data_norm=tgt_norm,
            final_input_norm=x_final,
        )

    # ------------------------------------------------------------------ state
    def get_state(self) -> dict:
        """Serializable state (reference stepper.py:359-422)."""
        return {
            "config": dataclasses.asdict(self.cfg),
            "normalizer": self.normalizer.get_state(),
            "area": np.asarray(self.area).tolist(),
            "sigma_coordinates": self.sigma.as_dict() if self.sigma else None,
        }


def ace_scored_names(stepper: "SingleStepStepper", source,
                     derived: bool = False) -> List[str]:
    """Variable list ``run_ace_inference`` will score — prognostics plus, with
    ``derived=True``, every registered diagnostic computable from the
    source's fields. Build the aggregator from this list."""
    names = list(stepper.cfg.out_names)
    if not derived:
        return names
    from .derived_variables import compute_derived_quantities

    # shape-only tracing: no device ops (eager diagnostics through the axon
    # tunnel cost seconds each), no data reads
    all_names = list(stepper.cfg.all_names)
    dummy = {n: jax.ShapeDtypeStruct((1, 2) + tuple(source.spatial_shape),
                                     jnp.float32) for n in all_names}
    aug = jax.eval_shape(
        lambda d: compute_derived_quantities(d, stepper.sigma), dummy
    )
    return names + sorted(k for k in aug if k not in all_names)


def run_ace_inference(
    stepper: SingleStepStepper,
    source,
    n_forward_steps: int,
    forward_steps_in_memory: int = 50,
    n_repeats: int = 1,
    aggregator=None,
    writer=None,
    derived: bool = False,
    verbose: bool = True,
) -> Dict[str, float]:
    """Windowed ACE rollout driver (reference ace_inference/inference loop,
    run_inference at loop.py:158): each ``forward_steps_in_memory`` window is
    one scanned device program; the normalized model state is carried across
    windows (``SteppedData.final_input_norm``), so only forcings/targets are
    re-read per window. Aggregator reductions consume device arrays; the
    writer receives host copies of the emitted steps only.

    ``derived``: also score every computable registered diagnostic
    (reference compute_derived_quantities applied to gen and target data
    during inference, ace_inference/inference/loop.py) — requires
    ``stepper.sigma``. Derived fields extend the aggregator's variable list;
    the writer still persists the prognostic set.

    ``source``: a :class:`~..data.datasets.TimeSeriesSource` covering
    ``stepper.cfg.all_names`` (``n_repeats`` loops it for long rollouts).
    """
    import time as _time

    names = list(stepper.cfg.all_names)
    out_names = list(stepper.cfg.out_names)
    total_available = source.n_timesteps * max(1, n_repeats)
    if n_forward_steps + 1 > total_available:
        raise ValueError(
            f"rollout needs {n_forward_steps + 1} frames; source has "
            f"{source.n_timesteps} x n_repeats={n_repeats}"
        )

    def read_frames_host(t0: int, length: int) -> Dict[str, np.ndarray]:
        """(1, length, H, W) per name, wrapping over the source."""
        out = {n: [] for n in names}
        got = 0
        while got < length:
            s = (t0 + got) % source.n_timesteps
            n_read = min(length - got, source.n_timesteps - s)
            piece = source.read_window(s, n_read, names)
            for n in names:
                out[n].append(piece[n])
            got += n_read
        return {
            n: (v[0][None] if len(v) == 1 else np.concatenate(v, axis=0)[None])
            for n, v in out.items()
        }

    # device-buffer cache for repeating windows (same rationale as
    # inference/loop.py's _upload_cache: each device_put through the axon
    # client pins ~0.4GB host RAM AND costs a full re-upload; windows whose
    # wrapped offsets coincide carry identical data)
    _upload_cache: Dict[tuple, Dict[str, jax.Array]] = {}
    _CACHE_CAP = 8

    def read_frames(t0: int, length: int) -> Dict[str, jax.Array]:
        key = (t0 % source.n_timesteps, length)
        hit = _upload_cache.get(key)
        if hit is not None:
            return hit
        dev = {n: jnp.asarray(v, jnp.float32)
               for n, v in read_frames_host(t0, length).items()}
        if len(_upload_cache) < _CACHE_CAP:
            _upload_cache[key] = dev
        return dev

    derived_fn = None
    scored_names: List[str] = list(out_names)
    if derived:
        if stepper.sigma is None:
            raise ValueError("derived=True requires stepper.sigma "
                             "(vertical coordinate for the diagnostics)")
        from .derived_variables import compute_derived_quantities

        # jitted: per-window eager diagnostics would be one tunnel dispatch
        # per op (seconds each on axon)
        derived_fn = jax.jit(
            lambda d: compute_derived_quantities(d, stepper.sigma)
        )
        # computable-diagnostic name set via shape-only tracing (no device
        # work; keys are static at trace time)
        dummy = {n: jax.ShapeDtypeStruct((1, 2) + tuple(source.spatial_shape),
                                         jnp.float32) for n in names}
        aug = jax.eval_shape(
            lambda d: compute_derived_quantities(d, stepper.sigma), dummy
        )
        scored_names = list(out_names) + sorted(
            k for k in aug if k not in names
        )

    @jax.jit
    def _score_pack(gen_data, data):
        """gen dict + window data -> (preds (B,n,H,W,C), tgts (n,H,W,C)),
        derived diagnostics included; ONE jitted program per window instead
        of ~2x35 eager per-name slices/stacks (CLAUDE.md rule 4)."""
        gen_d = {nm: gen_data[nm][:, 1:] for nm in out_names}
        # targets keep the batch dim through the derived computation — the
        # registry contract is time on axis 1 ((..., time, H, W)); a
        # (time, H, W) array would be differenced along LATITUDE by e.g.
        # total_water_path_budget_residual
        tgt_d = {nm: data[nm][:, 1:] for nm in names}
        if derived_fn is not None:
            gen_d = derived_fn({
                **gen_d,
                **{nm: data[nm][:, 1:] for nm in names if nm not in out_names},
            })
            tgt_d = derived_fn(tgt_d)
        preds = jnp.stack([gen_d[nm] for nm in scored_names], axis=-1)
        tgts = jnp.stack([tgt_d[nm][0] for nm in scored_names], axis=-1)
        return preds, tgts

    timers = {"data_loading": 0.0, "run_on_batch": 0.0,
              "writer_and_aggregator": 0.0}
    t_start = _time.time()
    x_norm = None
    start = 0
    last = None
    while start < n_forward_steps:
        n = min(forward_steps_in_memory, n_forward_steps - start)
        t0 = _time.time()
        data = read_frames(start, n + 1)
        timers["data_loading"] += _time.time() - t0

        t0 = _time.time()
        out = stepper.run_on_batch(data, n, initial_state_norm=x_norm,
                                   lean=True)
        x_norm = out.final_input_norm
        jax.block_until_ready(out.metrics["loss"])
        timers["run_on_batch"] += _time.time() - t0

        t0 = _time.time()
        if aggregator is not None or writer is not None:
            preds, tgts = _score_pack(out.gen_data, data)
            if aggregator is not None:
                aggregator.record_batch(preds, tgts, start_step=start)
            if writer is not None:
                n_prog = len(out_names)  # prognostics lead scored_names
                preds_h = np.asarray(preds[..., :n_prog])  # ONE device fetch
                tgts_h = np.asarray(tgts[..., :n_prog])
                writer.append(preds_h, tgts_h)
        timers["writer_and_aggregator"] += _time.time() - t0

        last = out
        start += n
        if verbose:
            sps = start / max(_time.time() - t_start, 1e-9)
            print(f"[ace-rollout] steps {start}/{n_forward_steps} "
                  f"({sps:.2f} steps/s)", flush=True)

    duration = _time.time() - t_start
    summary = {
        "n_forward_steps": float(n_forward_steps),
        "duration_s": round(duration, 5),
        "total_steps_per_second": round(n_forward_steps / duration, 5),
        "loss_last_window": float(last.metrics["loss"]) if last else float("nan"),
    }
    summary.update({f"time/{k}": round(v, 5) for k, v in timers.items()})
    return summary
