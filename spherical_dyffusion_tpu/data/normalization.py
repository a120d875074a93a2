"""Standard (z-score) normalization over packed channel vectors.

Replaces the reference StandardNormalizer (src/utilities/normalization.py:7-82
and src/ace_inference/core/normalizer.py): instead of jit-scripted dict loops,
normalization is a single fused multiply-add over the packed channels-last
array with per-channel mean/std vectors — one VPU op on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .netcdf import read_scalar_dataset
from .packer import Packer

__all__ = ["StandardNormalizer", "get_normalizer"]


@dataclasses.dataclass(frozen=True)
class StandardNormalizer:
    """Per-channel z-score normalizer aligned with a Packer's channel order."""

    means: jnp.ndarray  # (C,)
    stds: jnp.ndarray  # (C,)
    names: tuple = None

    def normalize(self, x: jax.Array) -> jax.Array:
        return (x - self.means) / self.stds

    def denormalize(self, x: jax.Array) -> jax.Array:
        return x * self.stds + self.means

    def normalize_dict(self, d: Mapping[str, jax.Array]) -> Dict[str, jax.Array]:
        idx = {n: i for i, n in enumerate(self.names)}
        return {k: (v - self.means[idx[k]]) / self.stds[idx[k]] for k, v in d.items()}

    def denormalize_dict(self, d: Mapping[str, jax.Array]) -> Dict[str, jax.Array]:
        idx = {n: i for i, n in enumerate(self.names)}
        return {k: v * self.stds[idx[k]] + self.means[idx[k]] for k, v in d.items()}

    def subset(self, names: Sequence[str]) -> "StandardNormalizer":
        idx = {n: i for i, n in enumerate(self.names)}
        sel = np.asarray([idx[n] for n in names])
        return StandardNormalizer(
            means=self.means[sel], stds=self.stds[sel], names=tuple(names)
        )

    def get_state(self) -> dict:
        return {
            "means": {n: float(m) for n, m in zip(self.names, np.asarray(self.means))},
            "stds": {n: float(s) for n, s in zip(self.names, np.asarray(self.stds))},
        }

    @classmethod
    def from_state(cls, state: dict) -> "StandardNormalizer":
        names = tuple(state["means"].keys())
        return cls(
            means=jnp.asarray([state["means"][n] for n in names], jnp.float32),
            stds=jnp.asarray([state["stds"][n] for n in names], jnp.float32),
            names=names,
        )

    @classmethod
    def from_dicts(cls, means: Mapping[str, float], stds: Mapping[str, float],
                   names: Sequence[str]) -> "StandardNormalizer":
        return cls(
            means=jnp.asarray([means[n] for n in names], jnp.float32),
            stds=jnp.asarray([stds[n] for n in names], jnp.float32),
            names=tuple(names),
        )


def get_normalizer(
    global_means_path: str,
    global_stds_path: str,
    names: Sequence[str],
) -> StandardNormalizer:
    """Build a normalizer from the centering.nc / scaling.nc statistics files
    shipped with the reference (data_statistics/, fv3gfs_ensemble.py:57-66)."""
    means = read_scalar_dataset(global_means_path)
    stds = read_scalar_dataset(global_stds_path)
    missing = [n for n in names if n not in means or n not in stds]
    if missing:
        raise KeyError(f"Variables missing from normalization stats: {missing}")
    return StandardNormalizer.from_dicts(means, stds, names)
