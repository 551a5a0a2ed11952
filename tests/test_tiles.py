"""Tile source: distributed generation vs scalar math, slippy-map anchors."""

import math

from label_maker_dask_spark import tiles as T

LISBON = [-9.179, 38.708, -9.1195, 38.754]  # reference example.ipynb bbox


def test_world_z0():
    assert T.tile_range([-180, -85, 180, 85], 0) == (0, 0, 0, 0)
    assert T.n_tiles([-180, -85, 180, 85], 0) == 1


def test_known_anchors():
    # slippy-map formula anchors (OSM wiki): z1 quadrants
    assert T.lnglat_to_tile(-90, 40, 1) == (0, 0)
    assert T.lnglat_to_tile(90, 40, 1) == (1, 0)
    assert T.lnglat_to_tile(-90, -40, 1) == (0, 1)
    assert T.lnglat_to_tile(90, -40, 1) == (1, 1)


def test_boundary_epsilon():
    # a bbox ending exactly on a tile boundary must not spill into the next
    # tile column (mercantile's LL_EPSILON convention)
    assert T.tile_range([0.0, 0.0, 90.0, 40.0], 2) == (2, 1, 2, 1)


def test_tiles_df_matches_range(spark):
    df = T.tiles_df(spark, LISBON, 15)
    rows = {(r.z, r.x, r.y) for r in df.collect()}
    xmin, ymin, xmax, ymax = T.tile_range(LISBON, 15)
    expected = {
        (15, x, y)
        for x in range(xmin, xmax + 1)
        for y in range(ymin, ymax + 1)
    }
    assert rows == expected
    assert len(rows) == T.n_tiles(LISBON, 15)
    assert df.count() > 0


def test_tile_bounds_roundtrip():
    # upper-left corner of tile(x, y) maps back to tile index (x, y)
    z = 10
    for x, y in [(0, 0), (511, 511), (1023, 3)]:
        lng = T.tile_ul_lng_scalar(x + 0.5, z)
        lat = T.tile_ul_lat_scalar(y + 0.5, z)
        assert T.lnglat_to_tile(lng, lat, z) == (x, y)
    assert math.isclose(T.tile_ul_lng_scalar(0, 1), -180.0)
    assert math.isclose(T.tile_ul_lat_scalar(1, 1), 0.0, abs_tol=1e-9)


def test_lnglat_to_tile_cols_matches_scalar(spark):
    """The Column twin must reproduce the driver-side scalar tile math
    bit-for-bit, including the pole/antimeridian clamps."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.tiles import lnglat_to_tile, lnglat_to_tile_cols

    pts = [
        (lng, lat)
        for lng in [-180.0, -179.99, -9.1501, 0.0, 38.7, 179.99]
        for lat in [-85.0, -38.71, 0.0, 38.7089, 84.99, 85.05]
    ]
    df = spark.createDataFrame(pts, "lng double, lat double")
    for zoom in (1, 6, 15):
        got = {
            (r.lng, r.lat): (r.t.x, r.t.y)
            for r in df.select(
                "lng", "lat",
                lnglat_to_tile_cols(F.col("lng"), F.col("lat"), zoom).alias("t"),
            ).collect()
        }
        for lng, lat in pts:
            assert got[(lng, lat)] == lnglat_to_tile(lng, lat, zoom), (
                lng, lat, zoom,
            )
