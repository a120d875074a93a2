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
    """Mirrors the reference InferenceConfig (inference/inference.py:78-203)
    plus the multi-initial-condition selection of
    InferenceInitialConditionIndices (data_loading/inference.py:17-60)."""

    n_forward_steps: int = 100
    forward_steps_in_memory: int = 50
    n_ensemble: int = 1
    # HBM-bounded ensemble chunking (reference num_predictions_in_memory,
    # _base_experiment.py:118-120): members run in device batches of this size
    ensemble_in_memory: Optional[int] = None
    n_repeats: int = 1  # loop the dataset for rollouts longer than the data
    start_index: int = 0
    # multi-IC rollouts (reference InferenceInitialConditionIndices): rollouts
    # start at start_index + ic_first + i * ic_interval, i < n_initial_conditions;
    # all ICs x ensemble members run as one (shardable) device batch
    n_initial_conditions: int = 1
    ic_first: int = 0
    ic_interval: int = 1
    seed: int = 0
    # PRNG implementation for the rollout's stochastic draws (inference-time
    # interpolator dropout — the DYffusion spread mechanism — and the
    # initial-condition perturbation). "rbg" uses the TPU's hardware RNG
    # instruction; software threefry mask generation fuses INTO the per-layer
    # MLP megafusions and holds them at ~34 TF/s (measured: threefry 1036.7 vs
    # rbg 1147.3 sim-yr/day on the paper config — +10.7%). Same Bernoulli
    # statistics either way; set "threefry" for cross-backend stream
    # reproducibility.
    rng_impl: str = "rbg"
    # device-buffer upload cache size (distinct repeating-window contents kept
    # resident; each entry is ~window-size targets+conditioning in HBM). When
    # a repeating source produces MORE distinct wrapped-offset keys than this,
    # the overflow windows re-upload every cycle — through the axon tunnel
    # each such device_put also pins ~0.4GB host RAM (client leak), so a
    # warning is printed with the distinct-key count. Align the source
    # (n_timesteps a multiple of the window) or raise this cap to stay fully
    # cached.
    upload_cache_entries: int = 8
    # host-side window READ cache (companion to the device upload cache
    # below): with n_repeats > 1, windows whose wrapped read offsets coincide
    # carry identical data, so re-reading them from the source each cycle is
    # pure waste — for generated sources (SyntheticTimeSeries and friends) the
    # per-window regeneration was measured at ~39% of 10-year-rollout wall
    # time on the 1-core host (results/rollout_10yr round-3 artifact). Each
    # entry holds one window's host arrays (~1 GB at window 96 x 38 names), so
    # the cap is small; aligned sources (n_timesteps a multiple of the window)
    # need exactly one entry. 0 disables. Semantics-preserving: read_window is
    # a pure function of (start, length, names) for every TimeSeriesSource.
    host_read_cache_entries: int = 2
    # resident-preds HBM guard: the emitted prediction buffer is
    # rows x window x H x W x C_out x itemsize, and the async pipeline holds
    # ~2.5 windows of it (the window being computed, its denormalized copy
    # awaiting drain, the in-flight next window). When the estimate exceeds
    # hbm_budget_gb the window is capped to the largest horizon multiple
    # that fits — forward_steps_in_memory is a pure performance knob, so the
    # cap is semantics-preserving (it turns the ensemble-4 x window-96
    # RESOURCE_EXHAUSTED into a working run). Set auto_window_cap=False to
    # run the requested window regardless. The default budget is the preds'
    # SHARE of a 16GB v5e — params, the upload cache, conditioning buffers
    # and sampler workspace take the rest; calibrated so the measured OOM
    # boundary (ensemble 4 fits at window<=48 f32, paper config) sits just
    # inside it while single-member window 96 is untouched.
    auto_window_cap: bool = True
    hbm_budget_gb: float = 4.5
    # dtype of the pre-uploaded TARGET windows the device-resident aggregator
    # reduces against. "bfloat16" halves (a) per-window upload bytes through
    # the tunnel, (b) HBM residency of every upload-cache slot (f32 targets
    # are ~871 MB/window at window 96, paper geometry — the dominant term in
    # the window-96 + consumer RESOURCE_EXHAUSTED), and (c) the ~0.4 GB host
    # RAM the axon client pins per device_put. The aggregator's fused reduce
    # upcasts to f32 on device (aggregators.py record_batch), so the only
    # effect on metrics is bf16 quantization of the truth values (~3 decimal
    # digits); predictions' own emit dtype is a separate knob
    # (DYffusionStepper.preds_dtype). Keep "float32" for metric-precision
    # studies.
    targets_dtype: str = "float32"

    @property
    def start_indices(self) -> Tuple[int, ...]:
        return tuple(
            self.start_index + self.ic_first + i * self.ic_interval
            for i in range(self.n_initial_conditions)
        )


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
        self.start_indices = list(cfg.start_indices)
        self._read_cache: Dict[tuple, Dict[str, np.ndarray]] = {}
        n_avail = source.n_timesteps * cfg.n_repeats - max(self.start_indices)
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
        """Yields (start_step, data). With a single IC, data values are
        (T+1, H, W) as before; with n_initial_conditions > 1 they gain a
        leading IC axis (n_ic, T+1, H, W), each IC read at its own offset."""
        cfg = self.cfg
        T = cfg.forward_steps_in_memory
        step = 0
        multi = len(self.start_indices) > 1
        n = self.source.n_timesteps
        cap = cfg.host_read_cache_entries if cfg.n_repeats > 1 else 0
        while step < cfg.n_forward_steps:
            length = min(T, cfg.n_forward_steps - step) + 1
            key = (
                tuple((s + step) % n for s in self.start_indices) + (length,)
                if cap > 0 else None
            )
            data = self._read_cache.get(key) if key is not None else None
            if data is None:
                if not multi:
                    data = self._read(self.start_indices[0] + step, length)
                else:
                    per_ic = [self._read(s + step, length) for s in self.start_indices]
                    data = {k: np.stack([d[k] for d in per_ic]) for k in per_ic[0]}
                if key is not None and len(self._read_cache) < cap:
                    self._read_cache[key] = data
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


# denormalize the emitted window IN its emitted dtype (bf16 preds stay bf16 —
# f32 stats must not promote them) as one jitted program instead of two eager
# tunnel dispatches
@jax.jit
def _denorm_cast(x, stds, means):
    return (x * stds + means).astype(x.dtype)


def capped_window(cfg: InferenceConfig, n_rows: int, spatial, n_out: int,
                  preds_itemsize: int, horizon: int) -> int:
    """Largest window (multiple of ``horizon``, >= horizon) whose resident
    emitted-preds estimate fits ``cfg.hbm_budget_gb`` (see the field's
    docstring); returns the requested window when the guard is off or the
    estimate fits."""
    T_req = int(cfg.forward_steps_in_memory)
    if not cfg.auto_window_cap:
        return T_req
    Hs, Ws = spatial
    per_step = n_rows * Hs * Ws * n_out * preds_itemsize
    if per_step <= 0:
        return T_req
    max_T = int(cfg.hbm_budget_gb * 1e9 / (2.5 * per_step))
    max_T = max(horizon, (max_T // horizon) * horizon)
    return min(T_req, max_T)


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
    itemsize = np.dtype(stepper.preds_dtype).itemsize if stepper.preds_dtype else 4
    T_eff = capped_window(
        cfg, len(cfg.start_indices) * cfg.n_ensemble, source.spatial_shape,
        len(out_names), itemsize, stepper.horizon,
    )
    if T_eff < cfg.forward_steps_in_memory:
        if verbose:
            print(
                f"[rollout] forward_steps_in_memory {cfg.forward_steps_in_memory}"
                f" -> {T_eff}: resident emitted-preds estimate exceeds "
                f"hbm_budget_gb={cfg.hbm_budget_gb} (semantics-preserving; "
                "set auto_window_cap=False to override)", flush=True,
            )
        cfg = dataclasses.replace(cfg, forward_steps_in_memory=T_eff)
    windows = InferenceWindows(source, needed, cfg)
    n_ic = len(windows.start_indices)
    E = cfg.n_ensemble
    if writer is not None and n_ic > 1:
        raise ValueError(
            "data writers support a single initial condition; score multi-IC "
            "rollouts through the aggregator"
        )

    normalizer = exp.normalizer  # over in_names
    out_norm = normalizer.subset(out_names)
    prescriber = stepper.prescriber
    prescribed_name = getattr(prescriber, "prescribed_name", None)

    timers = {"data_loading": 0.0, "run_on_batch": 0.0, "writer_and_aggregator": 0.0}
    t_start = time.time()
    rng = (
        jax.random.PRNGKey(cfg.seed)
        if cfg.rng_impl == "threefry"
        else jax.random.key(cfg.seed, impl=cfg.rng_impl)
    )
    H = stepper.horizon

    def _ic_view(arr: np.ndarray) -> np.ndarray:
        """Canonical (n_ic, T, H, W) view of a window variable."""
        return arr if n_ic > 1 else arr[None]

    # initial conditions read BEFORE the prefetch thread starts (all source
    # reads must stay on one thread; h5py handles are not thread-safe):
    # one initial state per IC, each tiled over the ensemble — batch rows are
    # IC-major [(ic0, e0..eE), (ic1, e0..eE), ...]
    t0 = time.time()
    inits = []
    for s in windows.start_indices:
        init_data = windows._read(s, 1, in_names)
        inits.append(np.stack([init_data[n][0] for n in in_names], axis=-1))
    init_raw = np.stack(inits)  # (n_ic, H, W, C)
    x_norm = jnp.asarray(normalizer.normalize(jnp.asarray(init_raw, jnp.float32)))
    x_norm = jnp.repeat(x_norm, E, axis=0)  # (n_ic * E, H, W, C)
    x_norm = stepper.shard_rows(x_norm)
    timers["data_loading"] += time.time() - t0

    # background-thread window prefetch: window k+1's h5py reads, the target
    # stacking, AND the target host->device upload all run on the producer
    # thread while window k computes (paired with the deferred-drain queue
    # below, the host pipeline is fully async around the device). Uploading
    # targets early matters: the aggregator reduces on device, and a
    # synchronous 400MB+ upload per window would otherwise sit on the
    # critical path (dominant cost through the TPU tunnel).
    #
    # Upload caching: with n_repeats > 1 the dataset loops, so windows whose
    # wrapped read offsets coincide carry IDENTICAL data — reuse their device
    # buffers instead of re-uploading. Besides skipping redundant transfers,
    # this bounds host memory against a measured axon-tunnel-client leak
    # (~0.4GB of host RAM pinned PER device_put of a 435MB array, never
    # freed — OOM-killed a 14,600-step run at window ~250). The cache is
    # capped; aligned sources (n_timesteps == forward_steps_in_memory) hit
    # one entry forever.
    from ..data.datamodule import prefetched

    src_n = source.n_timesteps
    _upload_cache: Dict[tuple, tuple] = {}
    _CACHE_CAP = int(cfg.upload_cache_entries)
    _cache_skips = [0]  # windows whose key did not fit in the cache

    if cfg.targets_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"InferenceConfig.targets_dtype must be 'float32' or 'bfloat16', "
            f"got {cfg.targets_dtype!r}")
    _tgt_np_dtype = (np.dtype("float32") if cfg.targets_dtype == "float32"
                     else jnp.bfloat16.dtype)  # numpy-compatible via ml_dtypes

    def _cast_targets(arr):
        # cast on the HOST so the device_put itself moves half the bytes
        # (and pins half the leaked client RAM); a device-side cast would
        # transfer f32 first
        return arr if arr.dtype == _tgt_np_dtype else arr.astype(_tgt_np_dtype)

    def _wkey(start_step: int, length: int):
        if cfg.n_repeats <= 1:
            return None  # no reuse possible; don't occupy cache slots
        return tuple(((s + start_step) % src_n) for s in windows.start_indices
                     ) + (length,)

    def _with_targets(stream):
        for start_step, data in stream:
            tgt_dev = None
            if consume and aggregator is not None:
                n_avail = _ic_view(data[out_names[0]]).shape[1] - 1
                key = _wkey(start_step, n_avail)
                hit = _upload_cache.get(("tgt", key)) if key is not None else None
                if hit is not None:
                    tgt_dev = hit
                else:
                    tgt_dev = [
                        jax.device_put(_cast_targets(np.stack(
                            [_ic_view(data[n])[ic, 1 : n_avail + 1]
                             for n in out_names],
                            axis=-1,
                        )))
                        for ic in range(n_ic)
                    ]
                    if key is not None:
                        if len(_upload_cache) < _CACHE_CAP:
                            _upload_cache[("tgt", key)] = tgt_dev
                        else:
                            _cache_skips[0] += 1
            yield start_step, data, tgt_dev

    it = prefetched(_with_targets(iter(windows)), depth=2)
    n_done = 0
    window_wall: list = []  # (n_steps, wall_s) per window for steady-state stats
    pending = []  # deferred (device preds, window data) awaiting host work

    def _drain(item):
        preds_raw, w_data, w_tgt_dev, w_start, w_steps = item
        # the full prediction tensor (hundreds of MB/window) crosses to the
        # host ONLY when a writer must persist it; aggregators reduce on
        # device against the pre-uploaded targets and fetch just
        # tables/rows/snapshot slices
        preds_raw_host = (
            np.asarray(preds_raw) if writer is not None else None
        )  # (n_ic * E, T, H, W, C)
        if preds_raw_host is not None and preds_raw_host.dtype != np.float32:
            # bf16-emitted preds cross the tunnel at half the bytes; h5py
            # writers need a standard dtype, so upcast AFTER the fetch
            preds_raw_host = preds_raw_host.astype(np.float32)
        for ic in range(n_ic):
            if aggregator is not None:
                # single-IC fast path: avoid the device-slice dispatch (each
                # eager op through the axon tunnel costs a round trip)
                p = preds_raw if n_ic == 1 else preds_raw[ic * E : (ic + 1) * E]
                aggregator.record_batch(p, w_tgt_dev[ic], start_step=w_start)
            if writer is not None:
                targets_raw = np.stack(
                    [_ic_view(w_data[n])[ic, 1 : w_steps + 1] for n in out_names],
                    axis=-1,
                )
                writer.append(preds_raw_host[ic * E : (ic + 1) * E], targets_raw)

    while True:
        t_win = time.time()
        t0 = t_win
        try:
            start_step, data, tgt_dev = next(it)
        except StopIteration:
            break
        timers["data_loading"] += time.time() - t0

        t0 = time.time()
        n_steps = min(cfg.forward_steps_in_memory, cfg.n_forward_steps - start_step)

        cond_key = _wkey(start_step, n_steps)
        cached = (_upload_cache.get(("cond", cond_key))
                  if cond_key is not None else None)
        if cached is not None:
            forcing_rows, tgt_rows, mask_rows = cached
        else:
            forcing_rows = None
            if forcing_names:
                f_raw = np.stack(
                    [_ic_view(data[n]) for n in forcing_names], axis=-1
                )  # (n_ic, T+1, H, W, Cf)
                f_norm = exp_forcing_normalizer(exp).normalize(
                    jnp.asarray(f_raw, jnp.float32)
                )
                forcing_rows = jnp.repeat(f_norm, E, axis=0)

            tgt_rows = None
            mask_rows = None
            if prescribed_name and mask_name:
                ch = out_names.index(prescribed_name)
                t_raw = jnp.asarray(_ic_view(data[prescribed_name]), jnp.float32)
                mu, sd = out_norm.means[ch], out_norm.stds[ch]
                tgt_rows = jnp.repeat((t_raw - mu) / sd, E, axis=0)
                # full (B, T+1, H, W) mask frames: each emitted step is
                # prescribed with the mask at its own time (reference
                # data_time[mask_name])
                mask_rows = jnp.repeat(
                    jnp.asarray(_ic_view(data[mask_name]), jnp.float32), E, axis=0
                )
            if cond_key is not None:
                if len(_upload_cache) < _CACHE_CAP:
                    _upload_cache[("cond", cond_key)] = (
                        forcing_rows, tgt_rows, mask_rows)
                else:
                    _cache_skips[0] += 1

        # device batch = n_ic * E rows, run in HBM-bounded chunks (reference
        # num_predictions_in_memory); one chunk covering all rows is one
        # compiled program shardable over the mesh's data axis
        B_tot = n_ic * E
        chunk = cfg.ensemble_in_memory or B_tot
        new_states, pred_parts = [], []
        for s0 in range(0, B_tot, chunk):
            e = min(chunk, B_tot - s0)
            rng, sub = jax.random.split(rng)
            sl = slice(s0, s0 + e)
            xc, pc = stepper.run_window(
                x_norm[sl],
                forcing_rows[sl] if forcing_rows is not None else None,
                tgt_rows[sl] if tgt_rows is not None else None,
                mask_rows[sl] if mask_rows is not None else None,
                sub, n_steps,
                apply_inputs_noise=(start_step == 0),
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
            # keep the emitted dtype through denormalization (f32 stats would
            # silently promote bf16 preds back to f32, undoing the residency/
            # fetch savings of DYffusionStepper.preds_dtype); aggregators
            # upcast to f32 inside their jitted reductions. One jitted call
            # instead of two eager tunnel dispatches.
            denorm = _denorm_cast(preds_norm, out_norm.stds, out_norm.means)
            pending.append((denorm, data, tgt_dev, start_step, n_steps))
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
        window_wall.append((n_steps, time.time() - t_win))
        if verbose:
            el = time.time() - t_start
            print(
                f"[rollout] steps {n_done}/{cfg.n_forward_steps} "
                f"({n_done / el:.2f} steps/s)", flush=True,
            )

    t0 = time.time()
    for item in pending:  # flush the last window's deferred host work
        _drain(item)
    # HONEST throughput accounting: everything above is async dispatch — the
    # host loop can run windows ahead of the device (especially with the
    # read/upload caches removing host-side throttles). Block on the carried
    # state (synchronizes the chained window programs) and on an aggregator
    # accumulator (synchronizes the reduce chain) so duration_s includes
    # device completion of every step, not just its enqueue.
    jax.block_until_ready(x_norm)
    tm = getattr(aggregator, "time_mean", None)
    if tm is not None and tm._pred_mean is not None:
        jax.block_until_ready(tm._pred_mean)
    timers["writer_and_aggregator"] += time.time() - t0

    duration = time.time() - t_start
    if _cache_skips[0]:
        print(
            f"[run_inference] upload cache overflow: {_cache_skips[0]} "
            f"window uploads exceeded upload_cache_entries={_CACHE_CAP} and "
            "were re-uploaded each cycle (through the axon tunnel each such "
            "upload also pins host RAM). Align source n_timesteps to the "
            "window or raise InferenceConfig.upload_cache_entries.",
            flush=True,
        )
    # steady-state throughput: completion-rate over everything after the
    # first window (which carries compiles / cache fills). Per-window walls
    # measure DISPATCH in the async pipeline, so the steady figure is instead
    # (total − first window) against the end-synced duration — both
    # numerator and denominator are device-completion quantities.
    if len(window_wall) > 1:
        w0_steps, w0_wall = window_wall[0]
        steady_sps = (n_done - w0_steps) * n_ic * E / max(
            duration - w0_wall, 1e-9)
    else:
        steady_sps = float("nan")
    summary = {
        "n_forward_steps": n_done,
        "duration_s": duration,
        "total_steps_per_second": n_done * n_ic * E / duration,
        "steady_steps_per_second": steady_sps,
        "upload_cache_skips": _cache_skips[0],
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
