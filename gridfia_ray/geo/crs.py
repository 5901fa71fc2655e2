"""Closed-form CRS transforms (M18 full) — no pyproj in this
environment, so the two projections the reference actually uses are
implemented from the published formulas:

* WGS84 (EPSG:4326) ↔ Web Mercator (EPSG:3857) — spherical Mercator,
  R = 6378137 (the EPSG:3857 definition uses the WGS84 semi-major axis
  as a sphere radius);
* geographic (NAD83/GRS80) ↔ USA Contiguous Albers Equal Area Conic
  USGS version (ESRI:102039 / EPSG:5070 parameters: φ₁=29.5°,
  φ₂=45.5°, φ₀=23°, λ₀=−96°, false easting/northing 0) — the
  ellipsoidal Albers formulas from Snyder, *Map Projections — A
  Working Manual* (USGS PP 1395), eqs. 14-12…14-21 (public domain).

Mirrors the reference's bbox conversions
(``gridfia/utils/location_config.py:301-318``: ``transform_bounds``
between EPSG:4326, EPSG:3857 and a target CRS) as ``transform_bbox``
with densified edges — a bbox's extrema under a curved projection are
not at its corners, so each edge is sampled like pyproj's
``transform_bounds(densify_pts=…)``.

All functions are vectorized numpy over coordinate arrays.
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0  # EPSG:3857 sphere radius (= WGS84 a)
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)
_E = np.sqrt(GRS80_E2)

# ESRI:102039 / EPSG:5070 — USA Contiguous Albers Equal Area Conic USGS
ALBERS_LAT1 = 29.5
ALBERS_LAT2 = 45.5
ALBERS_LAT0 = 23.0
ALBERS_LON0 = -96.0


def lonlat_to_webmercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857 (spherical Mercator). Latitude is clipped
    to the projection's ±85.051128779806° validity bound."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128779806604, 85.051128779806604)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


# -- ellipsoidal Albers (Snyder 14-12..14-21) --------------------------------


def _q(sin_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: authalic q."""
    es = _E * sin_phi
    return (1.0 - GRS80_E2) * (
        sin_phi / (1.0 - es * es) - (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
    )


def _m(sin_phi: np.ndarray, cos_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 14-15."""
    return cos_phi / np.sqrt(1.0 - GRS80_E2 * sin_phi * sin_phi)


def _albers_constants():
    p1 = np.radians(ALBERS_LAT1)
    p2 = np.radians(ALBERS_LAT2)
    p0 = np.radians(ALBERS_LAT0)
    m1 = _m(np.sin(p1), np.cos(p1))
    m2 = _m(np.sin(p2), np.cos(p2))
    q1 = _q(np.sin(p1))
    q2 = _q(np.sin(p2))
    q0 = _q(np.sin(p0))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)  # Snyder 14-14
    C = m1 * m1 + n * q1  # Snyder 14-13
    rho0 = GRS80_A * np.sqrt(C - n * q0) / n  # Snyder 14-12a
    return n, C, rho0


_N, _C, _RHO0 = _albers_constants()


def lonlat_to_albers(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """NAD83 geographic → ESRI:102039 meters (Snyder 14-12, 14-4)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - ALBERS_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _q(np.sin(phi))
    rho = GRS80_A * np.sqrt(_C - _N * q) / _N
    theta = _N * lam
    return rho * np.sin(theta), _RHO0 - rho * np.cos(theta)


def albers_to_lonlat(x, y, tol: float = 1e-12, max_iter: int = 15):
    """ESRI:102039 meters → NAD83 geographic (Snyder 14-19 with the
    iterative eq. 3-16 for the inverse authalic latitude)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.sqrt(x * x + (_RHO0 - y) ** 2)
    theta = np.arctan2(x, _RHO0 - y)  # n > 0 for this projection
    q = (_C - (rho * _N / GRS80_A) ** 2) / _N  # Snyder 14-19
    lon = ALBERS_LON0 + np.degrees(theta / _N)
    # iterate phi (Snyder 3-16)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(max_iter):
        sin_phi = np.sin(phi)
        es = _E * sin_phi
        one = 1.0 - es * es
        corr = (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - GRS80_E2)
            - sin_phi / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
        )
        phi = phi + corr
        if np.max(np.abs(corr)) < tol:
            break
    return lon, np.degrees(phi)


# -- bbox transforms (the reference's transform_bounds analog) ---------------

_FORWARD = {
    ("EPSG:4326", "EPSG:3857"): lonlat_to_webmercator,
    ("EPSG:3857", "EPSG:4326"): webmercator_to_lonlat,
    ("EPSG:4326", "ESRI:102039"): lonlat_to_albers,
    ("ESRI:102039", "EPSG:4326"): albers_to_lonlat,
    ("EPSG:4326", "EPSG:5070"): lonlat_to_albers,
    ("EPSG:5070", "EPSG:4326"): albers_to_lonlat,
}


def _to_lonlat(x, y, src: str):
    from gridfia_ray.geo import stateplane as sp

    if src in ("EPSG:4326", "EPSG:4269"):  # NAD83 geographic ≈ WGS84 here
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if (src, "EPSG:4326") in _FORWARD:
        return _FORWARD[(src, "EPSG:4326")](x, y)
    if sp.supported(src):
        return sp.sp_inverse(src, x, y)
    return None


def _from_lonlat(lon, lat, dst: str):
    from gridfia_ray.geo import stateplane as sp

    if dst in ("EPSG:4326", "EPSG:4269"):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if ("EPSG:4326", dst) in _FORWARD:
        return _FORWARD[("EPSG:4326", dst)](lon, lat)
    if sp.supported(dst):
        return sp.sp_forward(dst, lon, lat)
    return None


def transform_points(x, y, src: str, dst: str):
    src, dst = src.upper(), dst.upper()
    if src == dst:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    fn = _FORWARD.get((src, dst))
    if fn is not None:
        return fn(x, y)
    # route through WGS84 — covers the per-state State Plane / UTM / HOM
    # family (geo/stateplane.py, mirroring the reference's
    # location_config.py:301-318 transform_bounds usage)
    ll = _to_lonlat(x, y, src)
    if ll is not None:
        out = _from_lonlat(ll[0], ll[1], dst)
        if out is not None:
            return out
    raise ValueError(f"unsupported CRS pair {src} -> {dst}")


def transform_bbox(
    bbox: tuple[float, float, float, float], src: str, dst: str, densify_pts: int = 21
) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) in src → the tight bbox of the
    transformed region in dst, with densified edges (curved-projection
    extrema lie mid-edge, not at corners) — semantics of pyproj
    ``transform_bounds`` as used by the reference
    (``location_config.py:307-318``)."""
    xmin, ymin, xmax, ymax = bbox
    xs = np.linspace(xmin, xmax, densify_pts)
    ys = np.linspace(ymin, ymax, densify_pts)
    ex = np.concatenate([xs, xs, np.full_like(ys, xmin), np.full_like(ys, xmax)])
    ey = np.concatenate([np.full_like(xs, ymin), np.full_like(xs, ymax), ys, ys])
    tx, ty = transform_points(ex, ey, src, dst)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())
