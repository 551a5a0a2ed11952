"""WGS84 -> projected CRS math (sources/crs.py): published test vectors,
projection invariants, and the densified-envelope contract the reference
gets from rasterio's transform_bounds(densify_pts=21) (utils.py:81-84)."""

import math

import pytest

from label_maker_dask_spark.sources.crs import (
    project_fn,
    transform_bounds,
)


def test_identity_and_aliases():
    for crs in ("EPSG:4326", "epsg:4326", "CRS:84", "urn:ogc:def:crs:EPSG::4326"):
        assert project_fn(crs)(12.5, -33.25) == (12.5, -33.25)


def test_web_mercator_published_vector():
    x, y = project_fn("EPSG:3857")(10.0, 45.0)
    # R * radians(10) and the standard 45N northing
    assert abs(x - 1113194.9079) < 1e-3
    assert abs(y - 5621521.4862) < 1e-3


def test_world_mercator_ellipsoidal_y_via_numeric_integration():
    """Non-circular check of EPSG:3395: y must equal a * integral of the
    isometric-latitude derivative (1-e^2)/((1-e^2 sin^2 t) cos t) — the
    defining ODE, integrated numerically, not the closed form itself."""
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    phi1 = math.radians(45.0)
    n = 20000
    h = phi1 / n
    total = 0.0
    for i in range(n):  # Simpson needs even n
        t0, t1 = i * h, (i + 1) * h
        tm = (t0 + t1) / 2

        def g(t):
            return (1.0 - e2) / ((1.0 - e2 * math.sin(t) ** 2) * math.cos(t))

        total += (g(t0) + 4 * g(tm) + g(t1)) * h / 6
    _, y = project_fn("EPSG:3395")(0.0, 45.0)
    assert abs(y - a * total) < 0.01  # 1 cm


def test_utm_published_vector_cn_tower():
    # CN Tower, the standard UTM worked example: 43.642567N 79.387139W
    # -> zone 17N, 630084 E / 4833438 N
    e, n = project_fn("EPSG:32617")(-79.387139, 43.642567)
    assert abs(e - 630084) < 1.0
    assert abs(n - 4833438) < 1.0


def test_utm_invariants():
    p = project_fn("EPSG:32617")
    # central meridian of zone 17 is 81W; equator -> exactly (500000, 0)
    assert p(-81.0, 0.0) == (500000.0, 0.0)
    # southern zone mirrors the northing around the 10,000 km false northing
    ps = project_fn("EPSG:32717")
    e_n, n_n = p(-79.387139, 43.642567)
    e_s, n_s = ps(-79.387139, -43.642567)
    assert abs(e_n - e_s) < 1e-6
    assert abs((10_000_000 - n_n) - n_s) < 1e-6


def test_transform_bounds_densification_catches_curved_edge():
    """In UTM a parallel bows toward the equator away from the central
    meridian, so the bottom edge of a bbox crossing lon0 has its northing
    minimum in the edge INTERIOR — corner-only projection misses it."""
    dense = transform_bounds("EPSG:32631", 1.0, 58.0, 5.0, 60.0, densify_pts=21)
    corners = transform_bounds("EPSG:32631", 1.0, 58.0, 5.0, 60.0, densify_pts=0)
    assert dense[1] < corners[1] - 1000  # ymin: ~1.7 km of bowing at 58N
    assert dense[0] == corners[0] and dense[2] == corners[2]
    # densified envelope covers the corner envelope
    assert dense[1] <= corners[1] and dense[3] >= corners[3]


def test_unsupported_crs_raises_actionable_error():
    with pytest.raises(ValueError, match="pyproj"):
        project_fn("EPSG:2154")  # Lambert-93: long tail, needs pyproj


def test_wms_fetcher_projects_bbox_utm():
    """End-to-end: the WMS URL template gets a UTM bbox for a tile, and an
    unsupported CRS fails at fetcher-construction (plan) time."""
    from label_maker_dask_spark.sources.imagery import wms_image_fetcher
    from label_maker_dask_spark.tiles import tile_ul_lat_scalar, tile_ul_lng_scalar

    captured = {}

    class _Resp:
        content = b"img"

        def raise_for_status(self):
            pass

    fetcher = wms_image_fetcher(
        "http://wms.test/?version=1.1.1&srs=EPSG:32617&bbox={bbox}"
    )
    import requests

    def fake_get(self, url, timeout=0):
        captured["url"] = url
        return _Resp()

    orig = requests.Session.get
    requests.Session.get = fake_get
    try:
        out = fetcher(12, 1171, 1566)  # a zoom-12 tile inside zone 17
    finally:
        requests.Session.get = orig
    assert out == b"img"
    xmin, ymin, xmax, ymax = map(float, captured["url"].split("bbox=")[1].split(","))
    # the bbox must cover the corner-projected tile bounds
    p = project_fn("EPSG:32617")
    west, east = tile_ul_lng_scalar(1171, 12), tile_ul_lng_scalar(1172, 12)
    north, south = tile_ul_lat_scalar(1566, 12), tile_ul_lat_scalar(1567, 12)
    for lon, lat in [(west, south), (west, north), (east, south), (east, north)]:
        x, y = p(lon, lat)
        assert xmin - 1e-6 <= x <= xmax + 1e-6
        assert ymin - 1e-6 <= y <= ymax + 1e-6

    with pytest.raises(ValueError, match="pyproj"):
        wms_image_fetcher("http://wms.test/?version=1.1.1&srs=EPSG:2154&bbox={bbox}")
