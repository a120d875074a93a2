"""Matplotlib snapshot/zonal-mean image panels.

Equivalent of the reference SnapshotAggregator image panels
(src/evaluation/aggregators/snapshot.py:18-208) and the zonal-mean Hovmoeller
images (inference/zonal_mean.py): renders (prediction, target, error) map
panels and Hovmoeller diagrams to PNG files. Import-gated on matplotlib.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["plot_snapshot_panels", "plot_zonal_mean_hovmoeller"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_snapshot_panels(
    snapshots: Dict[int, dict],
    names: Sequence[str],
    out_dir: str,
    max_vars: int = 4,
) -> Dict[int, str]:
    """Render per-timestep (pred | target | error) panels for the first
    ``max_vars`` variables; returns {step: png_path}."""
    plt = _mpl()
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for step, snap in snapshots.items():
        preds, targets = np.asarray(snap["preds"]), np.asarray(snap["targets"])
        n = min(max_vars, preds.shape[-1])
        fig, axes = plt.subplots(n, 3, figsize=(12, 3 * n), squeeze=False)
        for i in range(n):
            p, t = preds[..., i], targets[..., i]
            vmin, vmax = np.percentile(t, [2, 98])
            for j, (field, title) in enumerate(
                [(p, "prediction"), (t, "target"), (p - t, "error")]
            ):
                ax = axes[i][j]
                kw = dict(vmin=vmin, vmax=vmax) if j < 2 else dict(cmap="RdBu_r")
                im = ax.imshow(field, aspect="auto", **kw)
                ax.set_title(f"{names[i]} {title} (t={step})", fontsize=8)
                ax.set_xticks([]), ax.set_yticks([])
                fig.colorbar(im, ax=ax, fraction=0.03)
        path = os.path.join(out_dir, f"snapshot_t{step}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=90)
        plt.close(fig)
        paths[step] = path
    return paths


def plot_zonal_mean_hovmoeller(
    pred_zonal: np.ndarray,  # (T, H, C)
    tgt_zonal: np.ndarray,
    names: Sequence[str],
    out_dir: str,
    max_vars: int = 4,
) -> Dict[str, str]:
    """Render (time x latitude) Hovmoeller panels of pred/target/error."""
    plt = _mpl()
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for i, name in enumerate(names[:max_vars]):
        p, t = pred_zonal[..., i].T, tgt_zonal[..., i].T  # (H, T)
        fig, axes = plt.subplots(1, 3, figsize=(14, 3.2))
        vmin, vmax = np.percentile(t, [2, 98])
        for ax, (field, title) in zip(
            axes, [(p, "prediction"), (t, "target"), (p - t, "error")]
        ):
            kw = dict(vmin=vmin, vmax=vmax) if title != "error" else dict(cmap="RdBu_r")
            im = ax.imshow(field, aspect="auto", origin="upper", **kw)
            ax.set_title(f"{name} zonal mean — {title}", fontsize=9)
            ax.set_xlabel("time"), ax.set_ylabel("lat index")
            fig.colorbar(im, ax=ax, fraction=0.03)
        path = os.path.join(out_dir, f"zonal_mean_{name}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=90)
        plt.close(fig)
        paths[name] = path
    return paths
