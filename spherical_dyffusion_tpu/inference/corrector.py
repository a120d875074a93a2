"""Physics-constraint correctors applied after each forecast step.

Exact re-implementation (in jnp, fully jit-able) of the reference Corrector
(src/ace_inference/core/corrector.py:13-296):

* dry-air conservation via a globally-constant surface-pressure offset:
    ps_new = (dry_air_target + sum_k ak_diff * wat_k) / (1 - sum_k bk_diff * wat_k)
* zero-global-mean moisture advection tendency,
* moisture-budget closure by rescaling precipitation/evaporation and/or
  recomputing the advective tendency as the budget residual.

Constants from reference core/constants.py:1-6.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from ..data.coords import SigmaCoordinates
from ..evaluation import metrics as M
from .climate_data import ClimateData

__all__ = ["CorrectorConfig", "Corrector"]

DENSITY_OF_WATER = 1000.0  # kg/m^3
SPECIFIC_HEAT_OF_WATER = 4000.0  # J/kg/K (SHiELD slab-ocean values)


@dataclasses.dataclass(frozen=True)
class CorrectorConfig:
    conserve_dry_air: bool = False
    zero_global_mean_moisture_advection: bool = False
    moisture_budget_correction: Optional[str] = None  # precipitation | evaporation |
    # advection_and_precipitation | advection_and_evaporation

    def __post_init__(self):
        valid = (None, "precipitation", "evaporation",
                 "advection_and_precipitation", "advection_and_evaporation")
        if self.moisture_budget_correction not in valid:
            raise ValueError(self.moisture_budget_correction)

    def build(self, area: jax.Array, sigma: SigmaCoordinates) -> "Corrector":
        return Corrector(self, area, sigma)


class Corrector:
    def __init__(self, config: CorrectorConfig, area: jax.Array, sigma: SigmaCoordinates):
        self.cfg = config
        self.area = area
        self.sigma = sigma

    def __call__(
        self,
        input_data: Mapping[str, jax.Array],
        gen_data: Mapping[str, jax.Array],
    ) -> Dict[str, jax.Array]:
        if self.cfg.conserve_dry_air:
            gen_data = _force_conserve_dry_air(input_data, gen_data, self.area, self.sigma)
        if self.cfg.zero_global_mean_moisture_advection:
            gen_data = _force_zero_global_mean_moisture_advection(gen_data, self.area)
        if self.cfg.moisture_budget_correction is not None:
            gen_data = _force_conserve_moisture(
                input_data, gen_data, self.area, self.sigma,
                self.cfg.moisture_budget_correction,
            )
        return gen_data


def _force_conserve_dry_air(input_data, gen_data, area, sigma) -> Dict[str, jax.Array]:
    """reference corrector.py:136-190."""
    inp = ClimateData(input_data)
    gen = ClimateData(gen_data)
    gen_dry_air = gen.surface_pressure_due_to_dry_air(sigma)
    global_gen = M.weighted_mean(gen_dry_air, area, dim=(-2, -1))
    global_target = M.weighted_mean(
        inp.surface_pressure_due_to_dry_air(sigma), area, dim=(-2, -1)
    )
    error = global_gen - global_target
    new_dry_air = gen_dry_air - error[..., None, None]
    wat = gen.specific_total_water
    ak_diff = jnp.diff(jnp.asarray(sigma.ak, jnp.float32))
    bk_diff = jnp.diff(jnp.asarray(sigma.bk, jnp.float32))
    new_ps = (new_dry_air + jnp.sum(ak_diff * wat, -1)) / (1.0 - jnp.sum(bk_diff * wat, -1))
    gen.surface_pressure = new_ps
    return gen.data


def _force_zero_global_mean_moisture_advection(gen_data, area) -> Dict[str, jax.Array]:
    """reference corrector.py:191-217."""
    gen = ClimateData(gen_data)
    adv = gen.tendency_of_total_water_path_due_to_advection
    mean_adv = M.weighted_mean(adv, area, dim=(-2, -1))
    gen.tendency_of_total_water_path_due_to_advection = adv - mean_adv[..., None, None]
    return gen.data


def _force_conserve_moisture(input_data, gen_data, area, sigma, terms) -> Dict[str, jax.Array]:
    """reference corrector.py:218-296."""
    inp = ClimateData(input_data)
    gen = ClimateData(gen_data)
    twp_tendency = (
        gen.total_water_path(sigma) - inp.total_water_path(sigma)
    ) / M.TIMESTEP_SECONDS
    twp_mean = M.weighted_mean(twp_tendency, area, dim=(-2, -1))
    evap_mean = M.weighted_mean(gen.evaporation_rate, area, dim=(-2, -1))
    precip_mean = M.weighted_mean(gen.precipitation_rate, area, dim=(-2, -1))
    if terms.endswith("precipitation"):
        new_precip_mean = evap_mean - twp_mean
        gen.precipitation_rate = (
            gen.precipitation_rate * (new_precip_mean / precip_mean)[..., None, None]
        )
    elif terms.endswith("evaporation"):
        new_evap_mean = twp_mean + precip_mean
        gen.evaporation_rate = (
            gen.evaporation_rate * (new_evap_mean / evap_mean)[..., None, None]
        )
    if terms.startswith("advection"):
        gen.tendency_of_total_water_path_due_to_advection = twp_tendency - (
            gen.evaporation_rate - gen.precipitation_rate
        )
    return gen.data
