"""Rollout output writers (netCDF via h5py).

Equivalents of the reference data writers
(src/ace_inference/inference/data_writer/main.py:19-187, prediction writer,
histogram writer, time-coarsening wrapper). Files are HDF5-backed netCDF4
with appendable time dimensions.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = [
    "PredictionWriter",
    "HistogramWriter",
    "VideoWriter",
    "TimeCoarsen",
    "DataWriterConfig",
    "DataWriter",
]


class PredictionWriter:
    """Appends predicted (and optionally target) fields to a netCDF-style
    HDF5 file with an unlimited time axis (reference PredictionDataWriter)."""

    def __init__(self, path: str, names: Sequence[str], lat: np.ndarray, lon: np.ndarray,
                 n_ensemble: int = 1, save_targets: bool = False,
                 save_names: Optional[Sequence[str]] = None):
        if h5py is None:
            raise RuntimeError("h5py required for writing predictions")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.names = list(names)
        # save_raw_prediction_names: subselect persisted variables (reference
        # data_writer/main.py:29-31) — channel indexing still follows `names`
        self.save_set = set(save_names) if save_names is not None else None
        unknown = (self.save_set or set()) - set(self.names)
        if unknown:
            raise ValueError(f"save_raw_prediction_names not in outputs: {sorted(unknown)}")
        self.save_targets = save_targets
        self.f = h5py.File(path, "w")
        self.f.create_dataset("lat", data=np.asarray(lat))
        self.f.create_dataset("lon", data=np.asarray(lon))
        H, W = len(lat), len(lon)
        self._dsets = {}
        from ..utils.naming import variable_metadata

        for n in self.names:
            if self.save_set is not None and n not in self.save_set:
                continue
            self._dsets[n] = self.f.create_dataset(
                n, shape=(n_ensemble, 0, H, W), maxshape=(n_ensemble, None, H, W),
                dtype="f4", chunks=(1, 1, H, W), compression=None,
            )
            ln, u = variable_metadata(n)
            self._dsets[n].attrs["long_name"] = ln
            if u:
                self._dsets[n].attrs["units"] = u
            if save_targets:
                self._dsets["target_" + n] = self.f.create_dataset(
                    "target_" + n, shape=(0, H, W), maxshape=(None, H, W),
                    dtype="f4", chunks=(1, H, W),
                )
        self._t = 0

    def append(self, preds: np.ndarray, targets: Optional[np.ndarray] = None):
        """preds: (E, T, H, W, C); targets: (T, H, W, C)."""
        preds = np.asarray(preds)
        if preds.dtype not in (np.float32, np.float64):
            preds = preds.astype(np.float32)  # e.g. bf16-emitted preds
        T = preds.shape[1]
        for i, n in enumerate(self.names):
            if n not in self._dsets:
                continue
            d = self._dsets[n]
            d.resize(self._t + T, axis=1)
            d[:, self._t : self._t + T] = preds[..., i]
            if self.save_targets and targets is not None:
                dt = self._dsets["target_" + n]
                dt.resize(self._t + T, axis=0)
                dt[self._t : self._t + T] = np.asarray(targets)[..., i]
        self._t += T

    def close(self):
        self.f.close()


class DynamicHistogram:
    """Fixed-bin-count histogram whose bins double in width whenever a new
    value falls outside the current range, pairwise-merging existing counts
    (reference DynamicHistogram, histogram.py:9-101) — no value is ever
    silently dropped. ``n_bins`` must be even (bin pairs merge on resize)."""

    EPSILON = 1.0e-6

    def __init__(self, n_bins: int = 300):
        if n_bins % 2:
            raise ValueError("n_bins must be even (bins merge pairwise on resize)")
        self.n_bins = n_bins
        self.bin_edges: np.ndarray = None
        self.counts = np.zeros(n_bins, np.int64)

    def add(self, value: np.ndarray):
        v = np.asarray(value).ravel()
        vmin, vmax = float(v.min()), float(v.max())
        if vmin == vmax:
            vmin -= self.EPSILON
            vmax += self.EPSILON
        if self.bin_edges is None:
            self.bin_edges = np.linspace(vmin, vmax, self.n_bins + 1)
        else:
            while vmin < self.bin_edges[0]:
                self._double(left=True)
            while vmax > self.bin_edges[-1]:
                self._double(left=False)
        self.counts += np.histogram(v, bins=self.bin_edges)[0]

    def _double(self, left: bool):
        span = 2 * (self.bin_edges[-1] - self.bin_edges[0])
        merged = self.counts[::2] + self.counts[1::2]
        new_counts = np.zeros(self.n_bins, np.int64)
        if left:
            self.bin_edges = np.linspace(
                self.bin_edges[-1] - span, self.bin_edges[-1], self.n_bins + 1
            )
            new_counts[self.n_bins // 2 :] = merged
        else:
            self.bin_edges = np.linspace(
                self.bin_edges[0], self.bin_edges[0] + span, self.n_bins + 1
            )
            new_counts[: self.n_bins // 2] = merged
        self.counts = new_counts


class HistogramWriter:
    """Running per-variable histograms of predictions with dynamic bin
    rescaling (reference HistogramDataWriter / DynamicHistogram,
    histogram.py:9): later windows with out-of-range values rescale the bins
    instead of being dropped."""

    def __init__(self, names: Sequence[str], n_bins: int = 300):
        self.names = list(names)
        self.n_bins = n_bins
        self._hists: Dict[str, DynamicHistogram] = {}

    def append(self, preds: np.ndarray, targets=None):
        preds = np.asarray(preds)
        for i, n in enumerate(self.names):
            if n not in self._hists:
                self._hists[n] = DynamicHistogram(self.n_bins)
            self._hists[n].add(preds[..., i])

    def histogram(self, name: str):
        h = self._hists[name]
        return h.counts, h.bin_edges

    def save(self, path: str):
        with h5py.File(path, "w") as f:
            for n in self.names:
                if n in self._hists:
                    c, e = self.histogram(n)
                    f.create_dataset(f"{n}_counts", data=c)
                    f.create_dataset(f"{n}_edges", data=e)

    def close(self):
        pass


class VideoWriter:
    """Persists the VideoAggregator's running (time, lat, lon) statistics as
    a netCDF file (reference VideoDataWriter, data_writer/video.py:12-73:
    composes a VideoAggregator over the rollout and flushes its dataset to
    ``reduced_autoregressive_predictions.nc``). Statistics accumulate as
    running moments, so full videos never sit in memory twice."""

    def __init__(self, path: str, names: Sequence[str], lat: np.ndarray, lon: np.ndarray):
        if h5py is None:
            raise RuntimeError("h5py required for writing videos")
        from ..evaluation.video import VideoAggregator

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.names = list(names)
        self.lat = np.asarray(lat)
        self.lon = np.asarray(lon)
        self.agg = VideoAggregator(self.names)
        self._t = 0

    def append(self, preds: np.ndarray, targets: Optional[np.ndarray] = None):
        """preds: (E, T, H, W, C); targets: (T, H, W, C) (optional — without
        them only the generated-ensemble stats are recorded)."""
        preds = np.asarray(preds)
        self.agg.record_batch(preds, targets, start_step=self._t)
        self._t += preds.shape[1]

    def close(self):
        from ..utils.naming import variable_metadata

        with h5py.File(self.path, "w") as f:
            f.create_dataset("lat", data=self.lat)
            f.create_dataset("lon", data=self.lon)
            for key, video in self.agg.get_videos().items():
                for i, n in enumerate(self.names):
                    d = f.create_dataset(f"{key}-{n}", data=video[..., i])
                    ln, u = variable_metadata(n)
                    d.attrs["long_name"] = f"{key} of {ln}"
                    if u:
                        d.attrs["units"] = u
                    d.attrs["dims"] = "time,lat,lon"


class TimeCoarsen:
    """Wraps a writer, averaging every ``factor`` consecutive steps
    (reference data_writer/time_coarsen.py). Targets (time-leading rank-4
    arrays) are coarsened on the same boundaries as predictions."""

    def __init__(self, writer, factor: int):
        self.writer = writer
        self.factor = factor
        self._buffer = None
        self._tbuffer = None

    def append(self, preds: np.ndarray, targets: Optional[np.ndarray] = None):
        preds = np.asarray(preds)
        if self._buffer is not None:
            preds = np.concatenate([self._buffer, preds], axis=1)
            self._buffer = None
        if targets is not None:
            targets = np.asarray(targets)
            if self._tbuffer is not None:
                targets = np.concatenate([self._tbuffer, targets], axis=0)
                self._tbuffer = None
        T = preds.shape[1]
        n_full = T // self.factor
        rem = T - n_full * self.factor
        if rem:
            self._buffer = preds[:, T - rem :]
            preds = preds[:, : T - rem]
            if targets is not None:
                self._tbuffer = targets[T - rem :]
                targets = targets[: T - rem]
        if n_full:
            E = preds.shape[0]
            coarse = preds.reshape((E, n_full, self.factor) + preds.shape[2:]).mean(axis=2)
            ct = None
            if targets is not None:
                ct = targets.reshape((n_full, self.factor) + targets.shape[1:]).mean(axis=1)
            self.writer.append(coarse, ct)

    def close(self):
        self.writer.close()


@dataclasses.dataclass
class DataWriterConfig:
    """Mirrors reference DataWriterConfig (data_writer/main.py:19-62:
    save_prediction_files / log_extended_video_netcdfs /
    save_raw_prediction_names / time_coarsen)."""

    save_prediction_files: bool = False
    save_histogram_files: bool = False
    log_extended_video_netcdfs: bool = False
    save_raw_prediction_names: Optional[Sequence[str]] = None
    time_coarsen_factor: Optional[int] = None

    def __post_init__(self):
        if self.save_raw_prediction_names is not None and not self.save_prediction_files:
            raise ValueError(
                "save_raw_prediction_names provided but save_prediction_files is False"
            )


class DataWriter:
    """Composes the configured writers (reference data_writer/main.py:65-130:
    prediction + video + histogram, each optionally time-coarsened)."""

    def __init__(self, cfg: DataWriterConfig, out_dir: str, names, lat, lon,
                 n_ensemble: int = 1):
        self.writers = []

        def _coarsened(w):
            return TimeCoarsen(w, cfg.time_coarsen_factor) if cfg.time_coarsen_factor else w

        if cfg.save_prediction_files:
            self.writers.append(_coarsened(PredictionWriter(
                os.path.join(out_dir, "autoregressive_predictions.nc"),
                names, lat, lon, n_ensemble,
                save_names=cfg.save_raw_prediction_names,
            )))
        if cfg.log_extended_video_netcdfs:
            self.writers.append(_coarsened(VideoWriter(
                os.path.join(out_dir, "reduced_autoregressive_predictions.nc"),
                names, lat, lon,
            )))
        if cfg.save_histogram_files:
            self.writers.append(HistogramWriter(names))

    def append(self, preds, targets=None):
        for w in self.writers:
            w.append(preds, targets)

    def close(self):
        for w in self.writers:
            w.close()
