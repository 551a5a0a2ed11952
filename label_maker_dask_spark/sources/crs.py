"""Dependency-free WGS84 → projected-CRS math for the WMS reader.

The reference projects a tile's lat/lng bbox into the WMS endpoint's CRS
with ``rasterio.warp.transform_bounds(WGS84, CRS.from_string(srs), *bound,
densify_pts=21)`` (reference utils.py:81-84).  rasterio/pyproj are not
available here, so this module implements the forward projections that
cover the overwhelming majority of real WMS endpoints in pure math:

- ``EPSG:4326`` / ``CRS:84`` — identity (degrees).
- ``EPSG:3857`` / ``EPSG:900913`` — spherical Web Mercator.
- ``EPSG:3395`` — World Mercator on the WGS84 *ellipsoid* (isometric
  latitude with the eccentricity correction term).
- ``EPSG:326xx`` / ``EPSG:327xx`` — UTM north/south zones, via the
  Karney–Krüger 4th-order series (Karney 2011, "Transverse Mercator with
  an accuracy of a few nanometers"; the published series, sub-mm inside
  a zone) with the standard k0=0.9996 and 500 km false easting.

Anything else falls back to pyproj when installed, and otherwise raises a
``ValueError`` naming the CRS — a plan-time error, not a per-task one
(the fetcher factory runs on the driver).

``transform_bounds`` mirrors rasterio's densification contract: each bbox
edge is sampled at ``densify_pts`` interior points before projecting, so
curved edges (a UTM parallel bows away from the equator as it leaves the
central meridian) still produce a covering envelope.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple, Union

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = math.sqrt(_F * (2.0 - _F))  # first eccentricity

ProjectFn = Callable[[float, float], Tuple[float, float]]


def _web_mercator(lon: float, lat: float) -> Tuple[float, float]:
    x = math.radians(lon) * _A
    y = _A * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    return x, y


def _world_mercator(lon: float, lat: float) -> Tuple[float, float]:
    phi = math.radians(lat)
    es = _E * math.sin(phi)
    x = math.radians(lon) * _A
    y = _A * math.log(
        math.tan(math.pi / 4.0 + phi / 2.0)
        * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)
    )
    return x, y


# Krüger series coefficients (order n^4) — Karney 2011 eq. 12/35
_N = _F / (2.0 - _F)
_A_BAR = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0 + 41.0 * _N**4 / 180.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0 + 557.0 * _N**4 / 1440.0,
    61.0 * _N**3 / 240.0 - 103.0 * _N**4 / 140.0,
    49561.0 * _N**4 / 161280.0,
)


def _transverse_mercator(
    lon: float, lat: float, lon0: float, k0: float, fe: float, fn: float
) -> Tuple[float, float]:
    phi = math.radians(lat)
    lam = math.radians(lon - lon0)
    # conformal latitude via the exact Gauss–Schreiber step
    t = math.sinh(
        math.atanh(math.sin(phi)) - _E * math.atanh(_E * math.sin(phi))
    )
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    xi, eta = xi_p, eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * math.sin(2.0 * j * xi_p) * math.cosh(2.0 * j * eta_p)
        eta += a * math.cos(2.0 * j * xi_p) * math.sinh(2.0 * j * eta_p)
    return fe + k0 * _A_BAR * eta, fn + k0 * _A_BAR * xi


def _utm(zone: int, south: bool) -> ProjectFn:
    lon0 = zone * 6.0 - 183.0
    fn = 10_000_000.0 if south else 0.0

    def project(lon: float, lat: float) -> Tuple[float, float]:
        return _transverse_mercator(lon, lat, lon0, 0.9996, 500_000.0, fn)

    return project


def project_fn(crs: str) -> ProjectFn:
    """Forward (lon, lat) → (x, y) projection for a CRS string like
    ``epsg:32617``.  Raises ``ValueError`` for unsupported CRS (unless
    pyproj is installed, which handles the long tail)."""
    c = crs.strip().lower().replace("urn:ogc:def:crs:", "")
    code = c.split(":")[-1]
    if c in ("crs:84", "ogc:crs84") or code in ("4326", "crs84"):
        return lambda lon, lat: (lon, lat)
    if code in ("3857", "900913", "102100"):
        return _web_mercator
    if code == "3395":
        return _world_mercator
    if code.isdigit() and len(code) == 5 and code[:3] in ("326", "327"):
        zone = int(code[3:])
        if 1 <= zone <= 60:
            return _utm(zone, south=code[:3] == "327")
    try:  # optional long-tail dependency; never required for the above
        from pyproj import Transformer

        tr = Transformer.from_crs("EPSG:4326", crs, always_xy=True)
        return lambda lon, lat: tr.transform(lon, lat)
    except ImportError:
        raise ValueError(
            f"unsupported WMS CRS {crs!r}: built-in support covers "
            "EPSG:4326/CRS:84, EPSG:3857/900913, EPSG:3395 and UTM "
            "EPSG:326xx/327xx; install pyproj for other CRS"
        ) from None


def transform_bounds(
    dst_crs: Union[str, ProjectFn],
    west: float,
    south: float,
    east: float,
    north: float,
    densify_pts: int = 21,
) -> Tuple[float, float, float, float]:
    """Project a WGS84 bbox and return its envelope in ``dst_crs``,
    densifying each edge with ``densify_pts`` interior samples first —
    the same contract as rasterio's ``transform_bounds`` used at
    reference utils.py:81-84 (a projected edge can bow outside the
    endpoints' envelope; sampling catches the extremum).

    ``dst_crs`` may be an already-resolved projection callable from
    :func:`project_fn` — per-tile callers (the WMS fetch loop) resolve
    once at plan time instead of paying a CRS lookup (a pyproj database
    hit for the long tail) on every fetch."""
    project = dst_crs if callable(dst_crs) else project_fn(dst_crs)
    n = max(int(densify_pts), 0) + 1
    pts = []
    for i in range(n + 1):
        t = i / n
        lon = west + (east - west) * t
        lat = south + (north - south) * t
        pts.append((lon, south))  # bottom edge
        pts.append((lon, north))  # top edge
        pts.append((west, lat))   # left edge
        pts.append((east, lat))   # right edge
    xs, ys = zip(*(project(lon, lat) for lon, lat in pts))
    return min(xs), min(ys), max(xs), max(ys)
