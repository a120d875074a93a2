"""Wind-vector coordinate conversions on the sphere.

Parity with the reference's geometry helpers
(reference src/ace_inference/core/winds.py): converting (u, v) horizontal
wind components to earth-centered cartesian (x, y, z) components and
converting between (lon, lat) and unit-sphere (x, y, z). Used when regridding
winds or computing vector-consistent statistics near the poles.

Conventions (identical to the reference): x points at (lat=0, lon=0),
y at (lat=0, lon=90E), z at the north pole; lon/lat in degrees; u is the
eastward and v the northward wind component.

Implemented over jax.numpy so it can run on device inside jitted pipelines;
numpy arrays are accepted (jnp coerces) and results can be np.asarray'd.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "u_v_to_x_y_z_wind",
    "normalize_vector",
    "lon_lat_to_xyz",
    "xyz_to_lon_lat",
]


def u_v_to_x_y_z_wind(
    u: jnp.ndarray, v: jnp.ndarray, lat: jnp.ndarray, lon: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(u, v) -> cartesian (wx, wy, wz) wind components.

    The local east unit vector at (lat, lon) is (-sin lon, cos lon, 0) and the
    local north unit vector is (-sin lat cos lon, -sin lat sin lon, cos lat);
    the cartesian wind is u * east + v * north. lat/lon in degrees.
    """
    lat = jnp.deg2rad(lat)
    lon = jnp.deg2rad(lon)
    wx = -u * jnp.sin(lon) - v * jnp.sin(lat) * jnp.cos(lon)
    wy = u * jnp.cos(lon) - v * jnp.sin(lat) * jnp.sin(lon)
    wz = v * jnp.cos(lat)
    return wx, wy, wz


def normalize_vector(*components: jnp.ndarray) -> jnp.ndarray:
    """Normalize a vector given per-axis components (orthonormal basis);
    returns the components stacked along a new leading axis."""
    stacked = jnp.stack([jnp.asarray(c) for c in components])
    norm = jnp.sqrt(jnp.sum(stacked**2, axis=0))
    return stacked / norm


def lon_lat_to_xyz(
    lon: jnp.ndarray, lat: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(lon, lat) in degrees -> unit-sphere (x, y, z)."""
    lat = jnp.deg2rad(lat)
    lon = jnp.deg2rad(lon)
    x = jnp.cos(lat) * jnp.cos(lon)
    y = jnp.cos(lat) * jnp.sin(lon)
    z = jnp.sin(lat)
    xyz = normalize_vector(x, y, z)
    return xyz[0], xyz[1], xyz[2]


def xyz_to_lon_lat(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit-sphere (x, y, z) -> (lon, lat) in degrees, lon in [0, 360).

    Points on the polar axis (|x| + |y| ~ 0) get lon = 0, matching the
    reference's guarded arctan2.
    """
    xyz = normalize_vector(x, y, z)
    x, y, z = xyz[0], xyz[1], xyz[2]
    on_axis = jnp.abs(x) + jnp.abs(y) < 1.0e-10
    lon = jnp.where(on_axis, 0.0, jnp.arctan2(y, x))
    lon = jnp.where(lon < 0.0, lon + 2 * jnp.pi, lon)
    lat = jnp.arcsin(jnp.clip(z, -1.0, 1.0))
    return jnp.rad2deg(lon), jnp.rad2deg(lat)
