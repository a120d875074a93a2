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

__all__ = ["SingleStepStepperConfig", "SingleStepStepper", "SteppedData"]


class SteppedData(struct.PyTreeNode):
    """Mirror of reference SteppedData (stepper.py:177-231)."""

    metrics: Dict[str, jax.Array]
    gen_data: Dict[str, jax.Array]
    target_data: Dict[str, jax.Array]
    gen_data_norm: Dict[str, jax.Array]
    target_data_norm: Dict[str, jax.Array]


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
    def run_on_batch(self, data: Dict[str, np.ndarray], n_forward_steps: int) -> SteppedData:
        """data: {name: (B, T+1, H, W)} raw fields covering the rollout."""
        fn = self._jitted.get(n_forward_steps)
        if fn is None:
            fn = self._jitted[n_forward_steps] = jax.jit(
                lambda params, d: self._run(params, d, n_forward_steps)
            )
        data_j = {k: jnp.asarray(v, jnp.float32) for k, v in data.items()}
        return fn(self.params, data_j)

    def _run(self, params, data: Dict[str, jax.Array], n_steps: int) -> SteppedData:
        cfg = self.cfg
        in_names = list(cfg.in_names)
        out_names = list(cfg.out_names)
        forcing_names = cfg.forcing_names
        in_norm, out_norm = self._in_norm, self._out_norm

        x0_raw = jnp.stack([data[n][:, 0] for n in in_names], axis=-1)
        x0 = in_norm.normalize(x0_raw)

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

        _, (gen_norm_seq, step_losses) = jax.lax.scan(
            body, x0, (step_raw_cur, step_raw_next)
        )
        gen_norm_seq = jnp.moveaxis(gen_norm_seq, 0, 1)  # (B, T, H, W, C_out)
        gen_raw_seq = out_norm.denormalize(gen_norm_seq)

        # prepend initial state (reference prepends input as first timestep)
        init_out_raw = jnp.stack([data[n][:, 0] for n in out_names], axis=-1)
        gen_raw_full = jnp.concatenate([init_out_raw[:, None], gen_raw_seq], axis=1)
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
