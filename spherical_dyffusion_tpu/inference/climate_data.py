"""Named-field accessor over dict climate data (jnp pytrees).

Equivalent of the reference ClimateData
(src/ace_inference/core/aggregator/climate_data.py:48-233): a thin view over a
dict of (..., H, W) arrays that stacks vertically-resolved variables (e.g.
``specific_total_water_{k}``) into (..., K) tensors via prefix registry +
natural sort, and exposes physical accessors (evaporation rate from latent
heat flux, net surface energy flux, vertical integrals).
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Union

import jax
import jax.numpy as jnp

from ..data.coords import SigmaCoordinates
from ..evaluation import metrics as M

__all__ = ["ClimateData", "CLIMATE_FIELD_NAME_PREFIXES", "natural_sort"]

CLIMATE_FIELD_NAME_PREFIXES: Dict[str, List[str]] = {
    "specific_total_water": ["specific_total_water_"],
    "surface_pressure": ["PRESsfc", "PS"],
    "tendency_of_total_water_path_due_to_advection": [
        "tendency_of_total_water_path_due_to_advection"
    ],
    "latent_heat_flux": ["LHTFLsfc", "LHFLX"],
    "sensible_heat_flux": ["SHTFLsfc"],
    "precipitation_rate": ["PRATEsfc", "surface_precipitation_rate"],
    "sfc_down_sw_radiative_flux": ["DSWRFsfc"],
    "sfc_up_sw_radiative_flux": ["USWRFsfc"],
    "sfc_down_lw_radiative_flux": ["DLWRFsfc"],
    "sfc_up_lw_radiative_flux": ["ULWRFsfc"],
}


def natural_sort(names: List[str]) -> List[str]:
    def convert(t: str) -> Union[str, int]:
        return int(t) if t.isdigit() else t.lower()

    return sorted(names, key=lambda s: [convert(c) for c in re.split(r"([0-9]+)", s)])


class ClimateData:
    def __init__(self, data: Mapping[str, jax.Array],
                 prefixes: Mapping[str, List[str]] = CLIMATE_FIELD_NAME_PREFIXES):
        self._data = dict(data)
        self._prefixes = prefixes

    @property
    def data(self) -> Dict[str, jax.Array]:
        return self._data

    # -- generic accessors
    def _get(self, name: str) -> jax.Array:
        for p in self._prefixes[name]:
            if p in self._data:
                return self._data[p]
        raise KeyError(name)

    def _set(self, name: str, value: jax.Array):
        for p in self._prefixes[name]:
            if p in self._data:
                self._data[p] = value
                return
        raise KeyError(name)

    def _extract_levels(self, prefixes: List[str]) -> jax.Array:
        for prefix in prefixes:
            names = natural_sort([n for n in self._data if n.startswith(prefix)])
            if names:
                return jnp.stack([self._data[n] for n in names], axis=-1)
        raise KeyError(prefixes)

    # -- physical fields
    @property
    def specific_total_water(self) -> jax.Array:
        return self._extract_levels(self._prefixes["specific_total_water"])

    @property
    def surface_pressure(self) -> jax.Array:
        return self._get("surface_pressure")

    @surface_pressure.setter
    def surface_pressure(self, v: jax.Array):
        self._set("surface_pressure", v)

    def surface_pressure_due_to_dry_air(self, sigma: SigmaCoordinates) -> jax.Array:
        return M.surface_pressure_due_to_dry_air(
            self.specific_total_water, self.surface_pressure,
            jnp.asarray(sigma.ak, jnp.float32), jnp.asarray(sigma.bk, jnp.float32),
        )

    def total_water_path(self, sigma: SigmaCoordinates) -> jax.Array:
        return M.vertical_integral(
            self.specific_total_water, self.surface_pressure,
            jnp.asarray(sigma.ak, jnp.float32), jnp.asarray(sigma.bk, jnp.float32),
        )

    @property
    def precipitation_rate(self) -> jax.Array:
        return self._get("precipitation_rate")

    @precipitation_rate.setter
    def precipitation_rate(self, v: jax.Array):
        self._set("precipitation_rate", v)

    @property
    def latent_heat_flux(self) -> jax.Array:
        return self._get("latent_heat_flux")

    @property
    def evaporation_rate(self) -> jax.Array:
        """kg m-2 s-1, from the latent heat flux (climate_data.py:175-182)."""
        return self._get("latent_heat_flux") / M.LATENT_HEAT_OF_VAPORIZATION

    @evaporation_rate.setter
    def evaporation_rate(self, v: jax.Array):
        self._set("latent_heat_flux", v * M.LATENT_HEAT_OF_VAPORIZATION)

    @property
    def tendency_of_total_water_path_due_to_advection(self) -> jax.Array:
        return self._get("tendency_of_total_water_path_due_to_advection")

    @tendency_of_total_water_path_due_to_advection.setter
    def tendency_of_total_water_path_due_to_advection(self, v: jax.Array):
        self._set("tendency_of_total_water_path_due_to_advection", v)

    @property
    def net_surface_energy_flux_without_frozen_precip(self) -> jax.Array:
        """DLW - ULW + DSW - USW - LHF - SHF (reference core/metrics.py
        net_surface_energy_flux)."""
        return (
            self._get("sfc_down_lw_radiative_flux")
            - self._get("sfc_up_lw_radiative_flux")
            + self._get("sfc_down_sw_radiative_flux")
            - self._get("sfc_up_sw_radiative_flux")
            - self._get("latent_heat_flux")
            - self._get("sensible_heat_flux")
        )
