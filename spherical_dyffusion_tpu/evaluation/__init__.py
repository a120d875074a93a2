from . import metrics
from .metrics import (
    crps_ensemble,
    ensemble_spread,
    root_mean_squared_error,
    spherical_area_weights,
    spread_skill_ratio,
    weighted_mean,
)

__all__ = [
    "metrics",
    "crps_ensemble",
    "ensemble_spread",
    "root_mean_squared_error",
    "spherical_area_weights",
    "spread_skill_ratio",
    "weighted_mean",
]
