"""Variable name <-> channel index packing.

TPU-native replacement for the reference Packer (src/utilities/packer.py:16-68
and src/ace_inference/core/packer.py): the canonical on-device representation
is a single packed channels-last array plus a static name->index map, so no
per-step python dict work happens inside jit. Dict views exist only at the
host boundary (data loading, writers, aggregator outputs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping

import jax
import jax.numpy as jnp

__all__ = ["Packer"]


@dataclasses.dataclass(frozen=True)
class Packer:
    """Packs dicts of (..., H, W) arrays into (..., H, W, C) and back."""

    names: tuple

    def __init__(self, names):
        object.__setattr__(self, "names", tuple(names))

    @property
    def index(self) -> Dict[str, int]:
        return {n: i for i, n in enumerate(self.names)}

    def __len__(self) -> int:
        return len(self.names)

    def pack(self, tensors: Mapping[str, jax.Array], axis: int = -1) -> jax.Array:
        """Stack named arrays along a new channel axis (default: trailing)."""
        return jnp.stack([tensors[n] for n in self.names], axis=axis)

    def unpack(self, packed: jax.Array, axis: int = -1) -> Dict[str, jax.Array]:
        arrs = jnp.moveaxis(packed, axis, 0)
        return {n: arrs[i] for i, n in enumerate(self.names)}

    def channel(self, name: str) -> int:
        return self.index[name]

    def select(self, packed: jax.Array, name: str, axis: int = -1) -> jax.Array:
        return jnp.take(packed, self.index[name], axis=axis)

    def subset_indices(self, names: List[str]) -> jnp.ndarray:
        return jnp.asarray([self.index[n] for n in names], jnp.int32)

    def get_state(self) -> dict:
        return {"names": list(self.names), "axis": -1}

    @classmethod
    def from_state(cls, state: dict) -> "Packer":
        return cls(state["names"])
