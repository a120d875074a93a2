"""Autoregressive rollout driver: windowed loop over a (possibly repeated)
forcing dataset.

Equivalent of the reference inference engine (src/ace_inference/inference/
loop.py:26-326 WindowStitcher + run_inference, data_loading/inference.py:61-175
InferenceDataset). The reference python-loops every step; here the device work
per window is ONE compiled program (see stepper.py) and the host only slices
forcing windows, carries the stitched state, and feeds aggregators/writers.

The window stitching of the reference (WindowStitcher, loop.py:26-117) becomes
trivial: the stepper returns the final state of each window, which is the next
window's initial condition — no index bookkeeping, no host copies of state.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import TimeSeriesSource
from ..data.normalization import StandardNormalizer
from .stepper import DYffusionStepper

__all__ = ["InferenceConfig", "InferenceWindows", "run_inference"]


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Mirrors the reference InferenceConfig (inference/inference.py:78-203)."""

    n_forward_steps: int = 100
    forward_steps_in_memory: int = 50
    n_ensemble: int = 1
    # HBM-bounded ensemble chunking (reference num_predictions_in_memory,
    # _base_experiment.py:118-120): members run in device batches of this size
    ensemble_in_memory: Optional[int] = None
    n_repeats: int = 1  # loop the dataset for rollouts longer than the data
    start_index: int = 0
    seed: int = 0


class InferenceWindows:
    """Yields consecutive (start_step, window dict) covering the rollout:
    window k holds frames [k*T, k*T + T] (T = forward_steps_in_memory), read
    with wrap-around over the source when n_repeats > 1
    (reference data_loading/inference.py:89-147)."""

    def __init__(
        self,
        source: TimeSeriesSource,
        names: Sequence[str],
        cfg: InferenceConfig,
    ):
        self.source = source
        self.names = list(names)
        self.cfg = cfg
        n_avail = source.n_timesteps * cfg.n_repeats - cfg.start_index
        if cfg.n_forward_steps + 1 > n_avail:
            raise ValueError(
                f"rollout needs {cfg.n_forward_steps + 1} frames, source has "
                f"{n_avail} (n_repeats={cfg.n_repeats})"
            )

    def _read(self, start: int, length: int,
              names: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        """Read with wrap-around across dataset repeats."""
        names = list(names) if names is not None else self.names
        n = self.source.n_timesteps
        out = {k: [] for k in names}
        t = start
        remaining = length
        while remaining > 0:
            local = t % n
            take = min(remaining, n - local)
            chunk = self.source.read_window(local, take, names)
            for k in names:
                out[k].append(chunk[k])
            t += take
            remaining -= take
        return {
            k: (np.concatenate(v, axis=0) if len(v) > 1 else v[0]) for k, v in out.items()
        }

    def __iter__(self) -> Iterator[Tuple[int, Dict[str, np.ndarray]]]:
        cfg = self.cfg
        T = cfg.forward_steps_in_memory
        step = 0
        while step < cfg.n_forward_steps:
            length = min(T, cfg.n_forward_steps - step) + 1
            data = self._read(cfg.start_index + step, length)
            yield step, data
            step += length - 1

    def iter_ranges(self) -> Iterator[Tuple[int, int]]:
        """(start_step, n_steps) pairs without reading any data."""
        cfg = self.cfg
        T = cfg.forward_steps_in_memory
        step = 0
        while step < cfg.n_forward_steps:
            n = min(T, cfg.n_forward_steps - step)
            yield step, n
            step += n


def run_inference(
    stepper: DYffusionStepper,
    source: TimeSeriesSource,
    cfg: InferenceConfig,
    aggregator=None,
    writer=None,
    mask_name: Optional[str] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Run the full rollout; returns the summary timing/throughput dict
    (reference inference.py:294-298 logs total_steps_per_second)."""
    exp = stepper.exp
    in_names = list(exp.in_packer.names)
    out_names = list(exp.out_packer.names)
    forcing_names = [n for n in getattr(exp, "forcing_names", [])]
    consume = aggregator is not None or writer is not None
    prescribed_name_early = getattr(stepper.prescriber, "prescribed_name", None)
    # only read what the rollout actually consumes per window: forcings,
    # prescriber fields, and (when aggregating/writing) targets; the full
    # in_names are needed only for the initial condition
    needed = list(forcing_names)
    if mask_name:
        needed.append(mask_name)
    if prescribed_name_early:
        needed.append(prescribed_name_early)
    if consume:
        needed += out_names
    needed = list(dict.fromkeys(needed))
    windows = InferenceWindows(source, needed, cfg)

    normalizer = exp.normalizer  # over in_names
    out_norm = normalizer.subset(out_names)
    prescriber = stepper.prescriber
    prescribed_name = getattr(prescriber, "prescribed_name", None)

    timers = {"data_loading": 0.0, "run_on_batch": 0.0, "writer_and_aggregator": 0.0}
    t_start = time.time()
    rng = jax.random.PRNGKey(cfg.seed)
    x_norm = None
    H = stepper.horizon

    it = iter(windows)
    n_done = 0
    pending = []  # deferred (device preds, window data) awaiting host work

    def _drain(item):
        preds_raw, w_data, w_start, w_steps = item
        preds_raw_host = np.asarray(preds_raw)
        targets_raw = np.stack(
            [w_data[n][1 : w_steps + 1] for n in out_names], axis=-1
        )
        if aggregator is not None:
            aggregator.record_batch(preds_raw_host, targets_raw, start_step=w_start)
        if writer is not None:
            writer.append(preds_raw_host, targets_raw)

    while True:
        t0 = time.time()
        try:
            start_step, data = next(it)
        except StopIteration:
            break
        timers["data_loading"] += time.time() - t0

        t0 = time.time()
        n_steps = min(cfg.forward_steps_in_memory, cfg.n_forward_steps - start_step)

        if x_norm is None:
            init_data = windows._read(cfg.start_index, 1, in_names)
            init_raw = np.stack([init_data[n][0] for n in in_names], axis=-1)[None]
            x_norm = jnp.asarray(
                normalizer.normalize(jnp.asarray(init_raw, jnp.float32))
            )
            x_norm = jnp.tile(x_norm, (cfg.n_ensemble, 1, 1, 1))

        forcing1 = None
        if forcing_names:
            f_raw = np.stack([data[n] for n in forcing_names], axis=-1)[None]
            forcing1 = exp_forcing_normalizer(exp).normalize(jnp.asarray(f_raw, jnp.float32))

        tgt1 = None
        mask1 = None
        if prescribed_name and mask_name:
            ch = out_names.index(prescribed_name)
            t_raw = jnp.asarray(data[prescribed_name][None], jnp.float32)
            mu, sd = out_norm.means[ch], out_norm.stds[ch]
            tgt1 = (t_raw - mu) / sd
            mask1 = jnp.asarray(data[mask_name][0][None], jnp.float32)

        # ensemble in HBM-bounded chunks (reference num_predictions_in_memory)
        E = cfg.n_ensemble
        chunk = cfg.ensemble_in_memory or E
        new_states, pred_parts = [], []
        for s0 in range(0, E, chunk):
            e = min(chunk, E - s0)
            rng, sub = jax.random.split(rng)
            fc = jnp.tile(forcing1, (e, 1, 1, 1, 1)) if forcing1 is not None else None
            tc = jnp.tile(tgt1, (e, 1, 1, 1)) if tgt1 is not None else None
            mc = jnp.tile(mask1, (e, 1, 1)) if mask1 is not None else None
            xc, pc = stepper.run_window(
                x_norm[s0 : s0 + e], fc, tc, mc, sub, n_steps
            )
            new_states.append(xc)
            pred_parts.append(pc)
        x_norm = jnp.concatenate(new_states) if len(new_states) > 1 else new_states[0]
        preds_norm = (
            jnp.concatenate(pred_parts) if len(pred_parts) > 1 else pred_parts[0]
        )
        consume = aggregator is not None or writer is not None
        if consume:
            # denormalize on device; defer host materialization until AFTER
            # the NEXT window has been dispatched, so host-side aggregation
            # overlaps with device compute (async dispatch pipelining)
            pending.append(
                (out_norm.denormalize(preds_norm), data, start_step, n_steps)
            )
        else:
            # nothing consumes the predictions: only the carried state matters
            # (pure-throughput benchmarking); avoid 100MB/window transfers
            jax.block_until_ready(x_norm)
        timers["run_on_batch"] += time.time() - t0

        t0 = time.time()
        # process the PREVIOUS window's outputs while this one computes
        while len(pending) > (1 if consume else 0):
            _drain(pending.pop(0))
        timers["writer_and_aggregator"] += time.time() - t0
        n_done += n_steps
        if verbose:
            el = time.time() - t_start
            print(
                f"[rollout] steps {n_done}/{cfg.n_forward_steps} "
                f"({n_done / el:.2f} steps/s)", flush=True,
            )

    t0 = time.time()
    for item in pending:  # flush the last window's deferred host work
        _drain(item)
    timers["writer_and_aggregator"] += time.time() - t0

    duration = time.time() - t_start
    summary = {
        "n_forward_steps": n_done,
        "duration_s": duration,
        "total_steps_per_second": n_done * cfg.n_ensemble / duration,
        **{f"time/{k}": v for k, v in timers.items()},
    }
    return summary


def run_dataset_inference(
    predictions_path: str,
    source: TimeSeriesSource,
    out_names,
    area_weights,
    n_forward_steps: Optional[int] = None,
    aggregator=None,
) -> Dict[str, float]:
    """Re-score previously saved predictions against the dataset
    (reference run_dataset_inference, loop.py:271-326): reads the
    autoregressive_predictions netCDF written by PredictionWriter and feeds
    the aggregator window-free."""
    import h5py

    from ..evaluation.aggregators import InferenceAggregator

    if aggregator is None:
        aggregator = InferenceAggregator(list(out_names), area_weights)
    with h5py.File(predictions_path, "r") as f:
        T = f[out_names[0]].shape[1]
        n = min(T, n_forward_steps) if n_forward_steps else T
        preds = np.stack([f[v][:, :n] for v in out_names], axis=-1)  # (E, n, H, W, C)
    targets_raw = source.read_window(1, n, list(out_names))
    targets = np.stack([targets_raw[v] for v in out_names], axis=-1)
    aggregator.record_batch(preds, targets, start_step=0)
    return aggregator.get_logs()


def exp_forcing_normalizer(exp) -> StandardNormalizer:
    if getattr(exp, "forcing_normalizer", None) is not None:
        return exp.forcing_normalizer
    raise ValueError("experiment has no forcing normalizer but forcings requested")
