"""GPS / geodetic conversions: WGS84 ellipsoid <-> ECEF <-> ENU.

Reference: src/colmap/geometry/gps.h:43-70 (GPSTransform). Used for spatial
pair generation, pose priors, and model alignment. Pure numpy/JAX-agnostic
(host-side code path) but written with jnp so it also batches on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# WGS84 ellipsoid constants
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

# GRS80
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222100882711
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)


def ell_to_ecef(lat_lon_alt: jax.Array, a: float = WGS84_A, e2: float = WGS84_E2) -> jax.Array:
    """(lat°, lon°, alt m) (..., 3) -> ECEF xyz (..., 3)."""
    lat = jnp.radians(lat_lon_alt[..., 0])
    lon = jnp.radians(lat_lon_alt[..., 1])
    alt = lat_lon_alt[..., 2]
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    N = a / jnp.sqrt(1.0 - e2 * sin_lat**2)
    x = (N + alt) * cos_lat * jnp.cos(lon)
    y = (N + alt) * cos_lat * jnp.sin(lon)
    z = (N * (1.0 - e2) + alt) * sin_lat
    return jnp.stack([x, y, z], axis=-1)


def ecef_to_ell(xyz: jax.Array, a: float = WGS84_A, e2: float = WGS84_E2) -> jax.Array:
    """ECEF (..., 3) -> (lat°, lon°, alt m), Bowring iteration (fixed 10 steps)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    lat = jnp.arctan2(z, p * (1.0 - e2))

    def body(_, lat):
        sin_lat = jnp.sin(lat)
        N = a / jnp.sqrt(1.0 - e2 * sin_lat**2)
        return jnp.arctan2(z + e2 * N * sin_lat, p)

    lat = jax.lax.fori_loop(0, 10, body, lat)
    sin_lat = jnp.sin(lat)
    N = a / jnp.sqrt(1.0 - e2 * sin_lat**2)
    alt = jnp.where(
        jnp.abs(jnp.cos(lat)) > 1e-8, p / jnp.cos(lat) - N, z / sin_lat - N * (1.0 - e2)
    )
    return jnp.stack([jnp.degrees(lat), jnp.degrees(lon), alt], axis=-1)


def ecef_to_enu(xyz: jax.Array, ref_lat_deg, ref_lon_deg, ref_ecef) -> jax.Array:
    """ECEF -> local East-North-Up at the given reference origin."""
    lat = jnp.radians(ref_lat_deg)
    lon = jnp.radians(ref_lon_deg)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    R = jnp.array(
        [
            [-so, co, 0.0],
            [-sl * co, -sl * so, cl],
            [cl * co, cl * so, sl],
        ]
    )
    d = xyz - ref_ecef
    return d @ R.T


def ell_to_enu(lat_lon_alt: jax.Array, ref_lat_deg=None, ref_lon_deg=None) -> jax.Array:
    """Geodetic (..., 3) -> ENU relative to the first point (or given ref)."""
    ecef = ell_to_ecef(lat_lon_alt)
    if ref_lat_deg is None:
        ref_lat_deg = lat_lon_alt[..., 0, 0] if lat_lon_alt.ndim > 1 else lat_lon_alt[0]
        ref_lon_deg = lat_lon_alt[..., 0, 1] if lat_lon_alt.ndim > 1 else lat_lon_alt[1]
        ref_ecef = ecef[..., 0, :] if ecef.ndim > 1 else ecef
    else:
        ref_ecef = ell_to_ecef(jnp.stack([jnp.asarray(ref_lat_deg), jnp.asarray(ref_lon_deg), jnp.zeros_like(jnp.asarray(ref_lat_deg))], axis=-1))
    return ecef_to_enu(ecef, ref_lat_deg, ref_lon_deg, ref_ecef)
