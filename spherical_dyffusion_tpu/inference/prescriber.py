"""Prescribed boundary forcing (e.g. sea-surface temperature overwrite).

Packed-tensor re-design of the reference Prescriber
(src/ace_inference/core/prescriber.py:8-134): instead of dict surgery per
step, the overwrite is a single fused where/lerp on the packed channels-last
prediction inside the jitted rollout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["PrescriberConfig", "PackedPrescriber", "NullPrescriber"]


@dataclasses.dataclass(frozen=True)
class PrescriberConfig:
    prescribed_name: str
    mask_name: str
    mask_value: int = 1
    interpolate: bool = False

    def __post_init__(self):
        if self.interpolate and self.mask_value != 1:
            raise ValueError("interpolation requires mask_value == 1")

    def build(self, out_names) -> "PackedPrescriber":
        if self.prescribed_name not in out_names:
            raise ValueError(
                f"prescribed variable {self.prescribed_name!r} must be in out_names"
            )
        return PackedPrescriber(
            channel=list(out_names).index(self.prescribed_name),
            mask_value=self.mask_value,
            interpolate=self.interpolate,
            prescribed_name=self.prescribed_name,
            mask_name=self.mask_name,
        )


@dataclasses.dataclass(frozen=True)
class PackedPrescriber:
    """Overwrites one channel of a packed prediction with target values in the
    masked region (mask from the raw data, target in the same space as preds)."""

    channel: int
    mask_value: int = 1
    interpolate: bool = False
    prescribed_name: str = ""
    mask_name: str = ""

    def __call__(
        self,
        preds: jax.Array,  # (..., H, W, C) packed (normalized) predictions
        target: jax.Array,  # (..., H, W) target values for the prescribed channel
        mask: jax.Array,  # (..., H, W) raw mask field
    ) -> jax.Array:
        gen = preds[..., self.channel]
        if self.interpolate:
            new = mask * target + (1.0 - mask) * gen
        else:
            region = jnp.round(mask).astype(jnp.int32) == self.mask_value
            new = jnp.where(region, target, gen)
        return preds.at[..., self.channel].set(new)

    def get_state(self) -> dict:
        return {
            "prescribed_name": self.prescribed_name,
            "mask_name": self.mask_name,
            "mask_value": self.mask_value,
            "interpolate": self.interpolate,
        }


class NullPrescriber:
    def __call__(self, preds, target=None, mask=None):
        return preds

    def get_state(self):
        return {}
