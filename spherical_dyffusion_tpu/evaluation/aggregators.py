"""Running metric aggregators for training eval and long rollouts.

Functional re-design of the reference aggregator classes
(src/evaluation/aggregators/*: OneStepAggregator main.py:62, MeanAggregator
timestepwise.py:26-214, TimeMeanAggregator time_mean.py:17-214,
SnapshotAggregator snapshot.py, and the inference-side aggregators under
src/ace_inference/core/aggregator/inference/). Device work is one jitted
reduction per recorded window returning small (T, C) tables; running state is
tiny host-side numpy. Metric taxonomy matches the reference:
``{split}/t{h}/{metric}/{var}`` plus ``avg`` reductions
(_base_experiment.py:966-1030).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M

__all__ = [
    "TimeMeanAggregator",
    "ReducedMetricsAggregator",
    "SnapshotAggregator",
    "ZonalMeanAggregator",
    "InferenceAggregator",
]


class TimeMeanAggregator:
    """Accumulates time-mean prediction/target maps; final logs are
    area-weighted RMSE and bias of the time means per variable
    (reference time_mean.py:17-214 and inference/time_mean*.py).

    When predictions carry an ensemble axis, per-member sums are kept so the
    logs also include the per-member-averaged variants
    ``rmse_member_avg``/``bias_member_avg`` (reference time_mean_salva.py:
    TimeMeanAggregator.get_logs with is_ensemble=True) alongside the
    ensemble-mean metrics."""

    def __init__(self, names: Sequence[str], area_weights: jax.Array):
        self.names = list(names)
        self.w = area_weights
        self._pred_mean = None  # (E, H, W, C) when ensemble, else (H, W, C)
        self._tgt_mean = None
        self._n = 0
        # device-resident accumulation: reducing on device avoids fetching the
        # full prediction tensor to host every window (435MB/window through
        # the TPU tunnel — measured 90%+ of product-inference wall time);
        # jitted because eager ops through the tunnel are seconds each.
        # Running MEANS (incremental Chan update, frac = T_window / n_total)
        # rather than raw sums: over a 10-year rollout raw f32 sums of e.g.
        # surface pressure reach ~1e9 where ulp ~128 and O(1 Pa) bias metrics
        # drown in rounding; the running mean stays at field magnitude
        # (reference accumulates per-window means for the same reason,
        # time_mean.py:17-214).
        # .astype(f32): preds may arrive in the stepper's narrowed emit dtype
        # (preds_dtype="bfloat16") — read the bf16 bytes, ACCUMULATE in f32
        self._accum = jax.jit(
            lambda pm, tm, p, t, frac: (
                pm + (jnp.mean(p.astype(jnp.float32), axis=-4) - pm) * frac,
                tm + (jnp.mean(t.astype(jnp.float32), axis=0) - tm) * frac,
            )
        )
        self._mean0 = jax.jit(
            lambda p, t: (jnp.mean(p.astype(jnp.float32), axis=-4),
                          jnp.mean(t.astype(jnp.float32), axis=0))
        )

    def record(self, preds, targets):
        """preds: (E, T, H, W, C) or (T, H, W, C); targets: (T, H, W, C).
        Accepts device arrays (preferred — no host round trip) or numpy."""
        preds = jnp.asarray(preds)
        targets = jnp.asarray(targets)
        T = preds.shape[-4]
        if self._pred_mean is None:
            self._pred_mean, self._tgt_mean = self._mean0(preds, targets)
        else:
            frac = jnp.float32(T / (self._n + T))
            self._pred_mean, self._tgt_mean = self._accum(
                self._pred_mean, self._tgt_mean, preds, targets, frac
            )
        self._n += T

    def get_logs(self, label: str = "time_mean") -> Dict[str, float]:
        if self._n == 0:
            return {}
        is_ensemble = jnp.ndim(self._pred_mean) == 4
        members = is_ensemble and self._pred_mean.shape[0] > 1

        # one jitted program for ALL final metrics (eager ops on the summed
        # maps are seconds each through the TPU tunnel)
        @jax.jit
        def final(pred_mean, tgt_mean):
            pred_mean = pred_mean.astype(jnp.float32)
            tgt_mean = tgt_mean.astype(jnp.float32)
            w = self.w[..., None]
            ens_mean = jnp.mean(pred_mean, axis=0) if is_ensemble else pred_mean
            out = {
                "rmse": M.root_mean_squared_error(tgt_mean, ens_mean, w, dim=(-3, -2)),
                "bias": M.weighted_mean_bias(tgt_mean, ens_mean, w, dim=(-3, -2)),
            }
            if members:
                out["rmse_member_avg"] = jnp.mean(M.root_mean_squared_error(
                    tgt_mean, pred_mean, w, dim=(-3, -2)), axis=0)
                out["bias_member_avg"] = jnp.mean(M.weighted_mean_bias(
                    tgt_mean, pred_mean, w, dim=(-3, -2)), axis=0)
            return out

        tables = jax.device_get(final(self._pred_mean, self._tgt_mean))
        out = {}
        for metric, row in tables.items():
            for i, n in enumerate(self.names):
                out[f"{label}/{metric}/{n}"] = float(np.asarray(row)[..., i].mean())
        return out

    @property
    def maps(self):
        if self._n == 0:
            return None
        p = self._pred_mean
        if p.ndim == 4:
            p = p.mean(axis=0)
        return p, self._tgt_mean


def _window_tables(preds, targets, w, norm_stats=None):
    """Jitted per-window reduction. preds (E, T, H, W, C), targets (T, H, W, C)
    -> dict of (T, C) tables. With ``norm_stats`` = (means, stds), the
    ``*_normed`` variants on standardized fields are added (reference
    MeanAggregator's lazy `_normed` metric dict, timestepwise.py:26-214)."""
    preds = preds.astype(jnp.float32)  # may arrive in the stepper emit dtype
    targets = targets.astype(jnp.float32)
    wc = w[..., None]
    ens_mean = jnp.mean(preds, axis=0)
    out = {
        "rmse": M.root_mean_squared_error(targets, ens_mean, wc, dim=(-3, -2)),
        "bias": M.weighted_mean_bias(targets, ens_mean, wc, dim=(-3, -2)),
        "grad_mag_percent_diff": M.gradient_magnitude_percent_diff(
            targets, ens_mean, wc, dim=(-3, -2)
        ),
    }
    if preds.shape[0] > 1:
        out["crps"] = M.crps_ensemble(targets, preds, wc, dim=(-3, -2))
        out["ssr"] = M.spread_skill_ratio(targets, preds, wc, dim=(-3, -2))
    if norm_stats is not None:
        mu, sd = norm_stats
        pn = (preds - mu) / sd
        tn = (targets - mu) / sd
        out.update({f"{k}_normed": v
                    for k, v in _window_tables(pn, tn, w, None).items()})
    return out


class ReducedMetricsAggregator:
    """Per-timestep metric tables over a full rollout (reference
    inference/reduced.py + MeanAggregator): rows indexed by global timestep."""

    def __init__(self, names: Sequence[str], area_weights: jax.Array,
                 normalizer=None):
        """``normalizer``: optional StandardNormalizer over ``names`` — when
        given, every metric also gets its ``_normed`` variant on the
        standardized fields (reference `_normed` metrics)."""
        self.names = list(names)
        self.w = area_weights
        self._norm_stats = (
            (jnp.asarray(normalizer.means), jnp.asarray(normalizer.stds))
            if normalizer is not None else None
        )
        self._tables: Dict[str, List[np.ndarray]] = {}
        self._steps: List[int] = []
        self._fn = jax.jit(_window_tables)

    def record(self, preds, targets, start_step: int = 0):
        preds = jnp.asarray(preds)
        if preds.ndim == 4:
            preds = preds[None]
        # tables stay DEVICE arrays until series() — recording must not force
        # a host sync (it would serialize against the in-flight next window)
        tables = self._fn(preds, jnp.asarray(targets), self.w, self._norm_stats)
        T = preds.shape[1]
        self._steps.extend(range(start_step, start_step + T))
        for k, v in tables.items():
            self._tables.setdefault(k, []).append(v)

    def series(self) -> Dict[str, np.ndarray]:
        """{metric: (total_T, C)} tables."""
        return {k: np.concatenate([np.asarray(x) for x in v], axis=0)
                for k, v in self._tables.items()}

    def get_logs(self, label: str = "") -> Dict[str, float]:
        """Time-averaged metrics per variable + global avg (reference avg/)."""
        out = {}
        prefix = f"{label}/" if label else ""
        for metric, rows in self.series().items():
            mean_t = rows.mean(axis=0)
            for i, n in enumerate(self.names):
                out[f"{prefix}{metric}/{n}"] = float(mean_t[i])
            out[f"{prefix}avg/{metric}"] = float(mean_t.mean())
        return out


class SnapshotAggregator:
    """Stores (pred, target) snapshot maps at fixed global timesteps
    (reference inference/main.py:105-112 snapshot schedule)."""

    DEFAULT_STEPS = (20, 500, 1400, 5000, 10000, 14600)

    def __init__(self, names: Sequence[str], steps: Optional[Sequence[int]] = None):
        self.names = list(names)
        self.steps = sorted(steps if steps is not None else self.DEFAULT_STEPS)
        self.snapshots: Dict[int, dict] = {}

    def record(self, preds, targets, start_step: int = 0):
        if hasattr(preds, "ndim") and preds.ndim == 5:
            preds = preds[0]  # first ensemble member (lazy slice on device)
        T = preds.shape[0]
        for s in self.steps:
            local = s - start_step
            if 0 <= local < T and s not in self.snapshots:
                # fetch ONLY the selected timestep (one (H, W, C) slice), not
                # the whole window
                self.snapshots[s] = {
                    "preds": np.asarray(preds[local], dtype=np.float32),
                    "targets": np.asarray(targets[local], dtype=np.float32),
                }


class ZonalMeanAggregator:
    """Zonal-mean (over longitude) Hovmoeller accumulation
    (reference inference/zonal_mean.py)."""

    def __init__(self, names: Sequence[str]):
        self.names = list(names)
        self._pred_rows: List[jax.Array] = []  # device until get_maps
        self._tgt_rows: List[jax.Array] = []
        self._fn = jax.jit(
            lambda p, t: (
                (p.mean(axis=0) if p.ndim == 5 else p)
                .astype(jnp.float32).mean(axis=-2),
                t.astype(jnp.float32).mean(axis=-2),
            )
        )

    def record(self, preds, targets, start_step: int = 0):
        pr, tr = self._fn(jnp.asarray(preds), jnp.asarray(targets))
        self._pred_rows.append(pr)  # (T, H, C), ~1MB/window
        self._tgt_rows.append(tr)

    def get_maps(self):
        if not self._pred_rows:
            return None
        return (
            np.concatenate([np.asarray(x) for x in self._pred_rows], axis=0),
            np.concatenate([np.asarray(x) for x in self._tgt_rows], axis=0),
        )


class InferenceAggregator:
    """Composes the per-rollout aggregators (reference
    ace_inference/core/aggregator/inference/main.py:42-220)."""

    def __init__(
        self,
        names: Sequence[str],
        area_weights,
        record_step_20: bool = True,
        log_zonal_mean_images: bool = True,
        log_video: bool = False,
        snapshot_steps: Optional[Sequence[int]] = None,
        normalizer=None,
    ):
        self.names = list(names)
        self.time_mean = TimeMeanAggregator(names, area_weights)
        self.reduced = ReducedMetricsAggregator(names, area_weights,
                                                normalizer=normalizer)
        self.snapshots = SnapshotAggregator(names, snapshot_steps)
        self.zonal = ZonalMeanAggregator(names) if log_zonal_mean_images else None
        if log_video:
            from .video import VideoAggregator

            self.video = VideoAggregator(names)
        else:
            self.video = None

    def _build_fused_reduce(self):
        """ONE jitted program per window covering every aggregator's device
        reduction (metric tables + time-mean accumulation + zonal means):
        through the TPU tunnel each dispatch costs ~25ms+, and separate
        programs forgo fusion of the shared ensemble-mean subexpression."""
        w = self.time_mean.w
        with_zonal = self.zonal is not None

        norm_stats = self.reduced._norm_stats

        def fused(pmean, tmean, preds, targets, frac):
            # bf16-emitted preds (stepper preds_dtype): read the narrow bytes,
            # reduce/accumulate in f32
            preds = preds.astype(jnp.float32)
            targets = targets.astype(jnp.float32)
            tables = _window_tables(preds, targets, w, norm_stats)
            # running-mean update (see TimeMeanAggregator: bounded magnitudes
            # keep f32 accumulation accurate over multi-year rollouts)
            pmean = pmean + (jnp.mean(preds, axis=-4) - pmean) * frac
            tmean = tmean + (jnp.mean(targets, axis=0) - tmean) * frac
            if with_zonal:
                ens = preds.mean(axis=0) if preds.ndim == 5 else preds
                zrows = (ens.mean(axis=-2), targets.mean(axis=-2))
            else:
                zrows = ()
            return pmean, tmean, tables, zrows

        return jax.jit(fused)

    def record_batch(self, preds, targets, start_step: int = 0):
        """preds: (E, T, H, W, C) raw; targets: (T, H, W, C) raw.

        Device arrays preferred: every reduction runs on device in one fused
        program and only the small results (tables, zonal rows, selected
        snapshots) ever cross to the host — the full prediction tensor is
        never fetched (the reference moves everything through host numpy;
        through the TPU tunnel that was >90% of inference wall time)."""
        preds = jnp.asarray(preds)
        if preds.ndim == 4:
            preds = preds[None]
        targets = jnp.asarray(targets)
        tm = self.time_mean
        if getattr(self, "_fused", None) is None:
            self._fused = self._build_fused_reduce()
        if tm._pred_mean is None:
            tm._pred_mean = jnp.zeros(preds.shape[:1] + preds.shape[2:])
            tm._tgt_mean = jnp.zeros(targets.shape[1:])
        T = preds.shape[-4]
        frac = jnp.float32(T / (tm._n + T))
        tm._pred_mean, tm._tgt_mean, tables, zrows = self._fused(
            tm._pred_mean, tm._tgt_mean, preds, targets, frac
        )
        tm._n += T
        T = preds.shape[1]
        self.reduced._steps.extend(range(start_step, start_step + T))
        for k, v in tables.items():
            self.reduced._tables.setdefault(k, []).append(v)
        if self.zonal is not None:
            self.zonal._pred_rows.append(zrows[0])
            self.zonal._tgt_rows.append(zrows[1])
        self.snapshots.record(preds, targets, start_step)
        if self.video is not None:
            self.video.record_batch(preds, targets, start_step)

    def get_logs(self, label: str = "inference") -> Dict[str, float]:
        logs = {}
        logs.update(self.reduced.get_logs(label))
        logs.update(self.time_mean.get_logs(f"{label}/time_mean"))
        return logs

    def get_inference_logs(self, label: str = "inference") -> List[Dict[str, float]]:
        """Per-timestep log dicts, one per rollout step, with the aggregate
        (time-mean) metrics attached to the final entry — the structure the
        reference replays to wandb step by step
        (reference inference/inference.py:300-313, aggregator
        get_inference_logs)."""
        prefix = f"{label}/" if label else ""
        series = self.reduced.series()
        steps = self.reduced._steps
        out: List[Dict[str, float]] = []
        for row, step in enumerate(steps):
            entry: Dict[str, float] = {"timestep": step}
            for metric, rows in series.items():
                for i, n in enumerate(self.names):
                    entry[f"{prefix}{metric}/{n}"] = float(rows[row, i])
                entry[f"{prefix}avg/{metric}"] = float(rows[row].mean())
            out.append(entry)
        if out:
            out[-1].update(self.time_mean.get_logs(f"{label}/time_mean"))
        return out
