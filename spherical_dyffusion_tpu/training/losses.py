"""Training criteria.

Equivalents of the reference losses (src/losses/losses.py:15-81 and the
area-weighted/conservation losses of src/ace_inference/core/loss.py).
All pure jnp, channels-last.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..evaluation.metrics import weighted_mean

__all__ = ["lp_loss", "get_loss_fn", "area_weighted_mse", "global_mean_loss",
           "conservation_loss", "weighted_sum_loss"]


def lp_loss(pred: jax.Array, target: jax.Array, p: int = 2, relative: bool = True) -> jax.Array:
    """Relative/absolute Lp norm loss averaged over the batch
    (reference LpLoss, losses.py:15-63)."""
    B = pred.shape[0]
    diff = jnp.linalg.norm((pred - target).reshape(B, -1), ord=p, axis=1)
    if relative:
        denom = jnp.linalg.norm(target.reshape(B, -1), ord=p, axis=1)
        return jnp.mean(diff / denom)
    return jnp.mean(diff)


def get_loss_fn(name: str) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Name -> criterion dispatch (reference get_loss, losses.py:66-81)."""
    name = name.lower()
    if name in ("l1", "mae"):
        return lambda p, t: jnp.mean(jnp.abs(p - t))
    if name in ("l2", "mse"):
        return lambda p, t: jnp.mean((p - t) ** 2)
    if name == "l1_rel":
        return lambda p, t: lp_loss(p, t, p=1, relative=True)
    if name == "l2_rel":
        return lambda p, t: lp_loss(p, t, p=2, relative=True)
    raise ValueError(f"Unknown loss {name!r}")


def area_weighted_mse(weights: jax.Array) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Latitude-weighted MSE (reference AreaWeightedMSELoss, core/loss.py:129).
    weights: (H, W); inputs channels-last (..., H, W, C)."""

    def fn(pred: jax.Array, target: jax.Array) -> jax.Array:
        return weighted_mean((pred - target) ** 2, weights[..., None], dim=())

    return fn


def conservation_loss(area_weights: jax.Array, sigma, dry_air_penalty: float = 1.0) -> Callable:
    """Dry-air non-conservation penalty (reference ConservationLoss,
    core/loss.py:11-102): |d/dt global_mean(dry-air surface pressure)| between
    consecutive generated steps, averaged over the trajectory.

    Operates on a dict of named fields with a time axis (B, T, H, W) — the
    same view the ACE stepper produces.
    """
    from ..inference.climate_data import ClimateData

    def fn(gen_data: dict) -> jax.Array:
        cd = ClimateData(gen_data)
        dry_air = cd.surface_pressure_due_to_dry_air(sigma)  # (B, T, H, W)
        gm = weighted_mean(dry_air, area_weights, dim=(-2, -1))  # (B, T)
        return dry_air_penalty * jnp.mean(jnp.abs(jnp.diff(gm, axis=-1)))

    return fn


def weighted_sum_loss(losses: dict, weights: dict) -> Callable:
    """Weighted combination of named criteria (reference WeightedSum,
    core/loss.py:138)."""

    def fn(pred, target):
        total = 0.0
        for name, loss in losses.items():
            total = total + weights.get(name, 1.0) * loss(pred, target)
        return total

    return fn


def global_mean_loss(weights: jax.Array, base: Optional[Callable] = None) -> Callable:
    """Loss on the area-weighted global mean of each channel
    (reference GlobalMeanLoss, core/loss.py:162)."""
    base = base or (lambda p, t: jnp.mean((p - t) ** 2))

    def fn(pred: jax.Array, target: jax.Array) -> jax.Array:
        pm = weighted_mean(pred, weights[..., None], dim=(-3, -2))
        tm = weighted_mean(target, weights[..., None], dim=(-3, -2))
        return base(pm, tm)

    return fn
