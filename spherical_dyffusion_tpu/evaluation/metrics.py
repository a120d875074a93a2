"""Area-weighted probabilistic evaluation metrics (pure jnp).

TPU-native equivalents of the reference metric functions
(src/evaluation/metrics.py:15-456 and src/ace_inference/core/metrics.py).
All functions are pure, jit-able, and operate channels-last; the ensemble
axis, where present, is axis 0.
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

Dimension = Union[int, Iterable[int]]

GRAVITY = 9.80665  # m/s^2 (reference core/constants.py:1)
TIMESTEP_SECONDS = 21600.0  # 6 h (reference core/constants.py)
LATENT_HEAT_OF_VAPORIZATION = 2.5e6  # J/kg (reference core/constants.py)

__all__ = [
    "GRAVITY",
    "TIMESTEP_SECONDS",
    "LATENT_HEAT_OF_VAPORIZATION",
    "spherical_area_weights",
    "weighted_mean",
    "weighted_std",
    "weighted_mean_bias",
    "mean_squared_error",
    "root_mean_squared_error",
    "ensemble_spread",
    "spread_skill_ratio",
    "crps_ensemble",
    "gradient_magnitude",
    "weighted_mean_gradient_magnitude",
    "gradient_magnitude_percent_diff",
    "rmse_of_time_mean",
    "time_and_global_mean_bias",
    "vertical_integral",
    "surface_pressure_due_to_dry_air",
]


def spherical_area_weights(lats: np.ndarray, num_lon: int) -> jnp.ndarray:
    """cos(lat) cell-area weights normalized to sum 1 over the (lat, lon) grid
    (reference evaluation/metrics.py:15-29)."""
    lats = jnp.asarray(lats, jnp.float32)
    w = jnp.cos(jnp.deg2rad(lats))[:, None] * jnp.ones((1, num_lon), jnp.float32)
    return w / jnp.sum(w)


def weighted_mean(
    x: jax.Array,
    weights: Optional[jax.Array] = None,
    dim: Dimension = (),
    keepdims: bool = False,
) -> jax.Array:
    if weights is None:
        return jnp.mean(x, axis=dim if dim != () else None, keepdims=keepdims)
    axis = dim if dim != () else None
    wb = jnp.broadcast_to(weights, x.shape)
    return jnp.sum(x * weights, axis=axis, keepdims=keepdims) / jnp.sum(
        wb, axis=axis, keepdims=keepdims
    )


def weighted_std(
    x: jax.Array, weights: Optional[jax.Array] = None, dim: Dimension = ()
) -> jax.Array:
    mean = weighted_mean(x, weights, dim, keepdims=True)
    var = weighted_mean((x - mean) ** 2, weights, dim)
    return jnp.sqrt(var)


def weighted_mean_bias(
    truth: jax.Array, predicted: jax.Array,
    weights: Optional[jax.Array] = None, dim: Dimension = (),
) -> jax.Array:
    return weighted_mean(predicted - truth, weights, dim)


def mean_squared_error(
    truth: jax.Array, predicted: jax.Array,
    weights: Optional[jax.Array] = None, dim: Dimension = (),
) -> jax.Array:
    return weighted_mean((predicted - truth) ** 2, weights, dim)


def root_mean_squared_error(
    truth: jax.Array, predicted: jax.Array,
    weights: Optional[jax.Array] = None, dim: Dimension = (),
) -> jax.Array:
    return jnp.sqrt(mean_squared_error(truth, predicted, weights, dim))


def ensemble_spread(
    predicted: jax.Array, weights: Optional[jax.Array] = None, dim: Dimension = ()
) -> jax.Array:
    """sqrt of the weighted-mean ensemble variance; ensemble is axis 0
    (reference metrics.py:166-176). Uses the unbiased (ddof=1) variance like
    torch.var."""
    var = jnp.var(predicted, axis=0, ddof=1)
    return jnp.sqrt(weighted_mean(var, weights, dim))


def spread_skill_ratio(
    truth: jax.Array, predicted: jax.Array,
    weights: Optional[jax.Array] = None, dim: Dimension = (),
) -> jax.Array:
    """SSR with the sqrt((M+1)/M) small-ensemble correction
    (reference metrics.py:178-197)."""
    n = predicted.shape[0]
    spread = ensemble_spread(predicted, weights, dim) * ((n + 1) / n) ** 0.5
    skill = root_mean_squared_error(truth, jnp.mean(predicted, axis=0), weights, dim)
    return spread / skill


def crps_ensemble(
    truth: jax.Array,
    predicted: jax.Array,
    weights: Optional[jax.Array] = None,
    dim: Dimension = (),
    reduction: str = "mean",
) -> jax.Array:
    """Fair (unbiased) ensemble CRPS, Zamo & Naveau 2018
    (reference metrics.py:199-249). Ensemble axis 0 of ``predicted``;
    ``truth`` has no ensemble axis.

    CRPS = E|X - y| - 1/2 E|X - X'| with the spread term averaged over
    M(M-1) ordered pairs instead of M^2.
    """
    n = predicted.shape[0]
    skill = jnp.mean(jnp.abs(predicted - truth[None]), axis=0)
    diffs = jnp.abs(predicted[None, :] - predicted[:, None])
    spread = jnp.sum(diffs, axis=(0, 1)) / (n * (n - 1))
    crps = skill - 0.5 * spread
    if reduction == "none":
        return crps
    if reduction != "mean":
        raise ValueError(f"Unknown reduction {reduction!r}")
    return weighted_mean(crps, weights, dim)


def _gradient(x: jax.Array, axis: int) -> jax.Array:
    """np.gradient-style central differences with one-sided edges."""
    upper = jnp.take(x, jnp.arange(2, x.shape[axis]), axis=axis)
    lower = jnp.take(x, jnp.arange(0, x.shape[axis] - 2), axis=axis)
    inner = (upper - lower) / 2.0
    first = jnp.take(x, jnp.asarray([1]), axis=axis) - jnp.take(x, jnp.asarray([0]), axis=axis)
    last = jnp.take(x, jnp.asarray([x.shape[axis] - 1]), axis=axis) - jnp.take(
        x, jnp.asarray([x.shape[axis] - 2]), axis=axis
    )
    return jnp.concatenate([first, inner, last], axis=axis)


def gradient_magnitude(x: jax.Array, dim: Dimension = ()) -> jax.Array:
    """sqrt(sum of squared spatial gradients) (reference metrics.py:249-258)."""
    dims = (dim,) if isinstance(dim, int) else tuple(dim)
    dims = tuple(d for d in dims if x.shape[d] > 1)
    grads = [_gradient(x, d) for d in dims]
    if not grads:
        return jnp.zeros_like(x)
    return jnp.sqrt(sum(g**2 for g in grads))


def weighted_mean_gradient_magnitude(
    x: jax.Array, weights: Optional[jax.Array] = None, dim: Dimension = ()
) -> jax.Array:
    return weighted_mean(gradient_magnitude(x, dim), weights, dim)


def gradient_magnitude_percent_diff(
    truth: jax.Array,
    predicted: jax.Array,
    weights: Optional[jax.Array] = None,
    dim: Dimension = (),
    is_ensemble_prediction: bool = False,
) -> jax.Array:
    t = weighted_mean_gradient_magnitude(truth, weights, dim)
    if is_ensemble_prediction:
        p = jnp.mean(
            jax.vmap(lambda m: weighted_mean_gradient_magnitude(m, weights, dim))(predicted),
            axis=0,
        )
    else:
        p = weighted_mean_gradient_magnitude(predicted, weights, dim)
    return 100.0 * (p - t) / t


def rmse_of_time_mean(
    truth: jax.Array,
    predicted: jax.Array,
    weights: Optional[jax.Array] = None,
    time_dim: int = 0,
    spatial_dims: Dimension = (-2, -1),
) -> jax.Array:
    """RMSE of the time-averaged fields (reference metrics.py:286-310)."""
    return root_mean_squared_error(
        jnp.mean(truth, axis=time_dim),
        jnp.mean(predicted, axis=time_dim),
        weights=weights,
        dim=spatial_dims,
    )


def time_and_global_mean_bias(
    truth: jax.Array,
    predicted: jax.Array,
    weights: Optional[jax.Array] = None,
    time_dim: int = 0,
    spatial_dims: Dimension = (-2, -1),
) -> jax.Array:
    """Bias of the global- and time-mean (reference metrics.py:312-337)."""
    return weighted_mean(
        jnp.mean(predicted - truth, axis=time_dim), weights, spatial_dims
    )


def vertical_integral(
    integrand: jax.Array,
    surface_pressure: jax.Array,
    ak: jax.Array,
    bk: jax.Array,
) -> jax.Array:
    """(1/g) * sum_k dp_k x_k with dp = diff(ak + ps * bk)
    (reference core/metrics.py:296-335). integrand: (..., K); ps: (...)."""
    p_interface = ak + surface_pressure[..., None] * bk  # (..., K+1)
    dp = jnp.diff(p_interface, axis=-1)
    return jnp.sum(dp * integrand, axis=-1) / GRAVITY


def surface_pressure_due_to_dry_air(
    specific_total_water: jax.Array,
    surface_pressure: jax.Array,
    ak: jax.Array,
    bk: jax.Array,
) -> jax.Array:
    """ps - g * TWP (reference core/metrics.py:337-367)."""
    twp = vertical_integral(specific_total_water, surface_pressure, ak, bk)
    return surface_pressure - GRAVITY * twp
