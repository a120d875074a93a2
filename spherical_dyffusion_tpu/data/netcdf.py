"""Minimal netCDF4(-HDF5) reading via h5py.

The environment has neither xarray nor netCDF4; netCDF4-format files are HDF5
containers, which h5py reads natively. This module provides the small slice of
functionality the framework needs: open a file, list variables, read scalar /
array variables (with optional slicing), and read attributes.

Replaces the reference's xarray/netCDF4 usage in the data layer
(src/ace_inference/core/data_loading/_xarray.py, utilities/normalization.py:85).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = ["NetCDFFile", "read_scalar_dataset"]


_PHONY = "This is a netCDF dimension but not a netCDF variable"


@dataclasses.dataclass
class NetCDFFile:
    """Lazy reader over a netCDF4/HDF5 file."""

    path: str

    def __post_init__(self):
        if h5py is None:
            raise RuntimeError("h5py is required to read netCDF files")
        self._f = h5py.File(self.path, "r")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _is_dim_only(self, name: str) -> bool:
        ds = self._f[name]
        return ds.attrs.get("NAME", b"").startswith(_PHONY.encode()) if "NAME" in ds.attrs else False

    @property
    def variables(self) -> List[str]:
        return [k for k in self._f.keys() if not self._is_dim_only(k)]

    def dims_of(self, name: str) -> tuple:
        """Dimension names of a variable, from the HDF5 dimension scales."""
        ds = self._f[name]
        out = []
        for i, dim in enumerate(ds.dims):
            label = dim.label or (dim[0].name.lstrip("/") if len(dim) else f"dim_{i}")
            out.append(label)
        return tuple(out)

    def shape(self, name: str) -> tuple:
        return self._f[name].shape

    def read(self, name: str, sl: Optional[slice] = None) -> np.ndarray:
        ds = self._f[name]
        data = ds[sl] if sl is not None else ds[()]
        # apply CF scale/offset + missing values if present
        attrs = ds.attrs
        fill = attrs.get("_FillValue", None)
        data = np.asarray(data)
        if fill is not None and data.dtype.kind == "f":
            fill = np.ravel(np.asarray(fill))[0]
            if not np.isnan(fill):
                data = np.where(data == fill, np.nan, data).reshape(data.shape)
        scale = attrs.get("scale_factor", None)
        offset = attrs.get("add_offset", None)
        if scale is not None or offset is not None:
            data = data * (scale if scale is not None else 1.0) + (
                offset if offset is not None else 0.0
            )
        return data

    def attr(self, name: str, attr: str, default: Any = None) -> Any:
        return self._f[name].attrs.get(attr, default)


def read_scalar_dataset(path: str) -> Dict[str, float]:
    """Read a file of scalar variables (the data_statistics centering/scaling
    files) into {name: float}."""
    out: Dict[str, float] = {}
    with NetCDFFile(path) as f:
        for name in f.variables:
            arr = np.asarray(f.read(name))
            if arr.ndim == 0:
                out[name] = float(arr)
    return out
