"""Coordinate metadata: hybrid sigma-pressure levels and lat-lon grids.

Equivalents of the reference data typing (src/ace_inference/core/data_loading/
data_typing.py:14-96): SigmaCoordinates (ak/bk interface offsets),
HorizontalCoordinates, VariableMetadata and the gridded-data bundle.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from ..evaluation.metrics import spherical_area_weights

__all__ = [
    "SigmaCoordinates",
    "HorizontalCoordinates",
    "VariableMetadata",
    "GridMetadata",
]


@dataclasses.dataclass(frozen=True)
class SigmaCoordinates:
    """Hybrid sigma-pressure vertical coordinate: p_interface = ak + ps * bk."""

    ak: np.ndarray  # (K+1,)
    bk: np.ndarray  # (K+1,)

    @property
    def coords(self) -> Dict[str, np.ndarray]:
        return {"ak": self.ak, "bk": self.bk}

    @property
    def num_levels(self) -> int:
        return len(self.ak) - 1

    def as_dict(self) -> dict:
        return {"ak": np.asarray(self.ak).tolist(), "bk": np.asarray(self.bk).tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "SigmaCoordinates":
        return cls(np.asarray(d["ak"], np.float64), np.asarray(d["bk"], np.float64))


@dataclasses.dataclass(frozen=True)
class HorizontalCoordinates:
    """Cell-center latitudes/longitudes of a regular grid (degrees)."""

    lat: np.ndarray  # (H,)
    lon: np.ndarray  # (W,)

    @property
    def shape(self) -> Tuple[int, int]:
        return (len(self.lat), len(self.lon))

    def area_weights(self):
        return spherical_area_weights(self.lat, len(self.lon))

    @classmethod
    def regular(cls, nlat: int = 180, nlon: int = 360) -> "HorizontalCoordinates":
        """1-degree FV3GFS-style cell-centered grid (lat descending from N)."""
        lat = 90.0 - (np.arange(nlat) + 0.5) * (180.0 / nlat)
        lon = (np.arange(nlon) + 0.5) * (360.0 / nlon)
        return cls(lat, lon)


@dataclasses.dataclass(frozen=True)
class VariableMetadata:
    units: str = ""
    long_name: str = ""


@dataclasses.dataclass(frozen=True)
class GridMetadata:
    """Bundle of grid info carried alongside batches (reference GriddedData)."""

    horizontal: HorizontalCoordinates
    sigma: Optional[SigmaCoordinates] = None
    metadata: Optional[Dict[str, VariableMetadata]] = None
