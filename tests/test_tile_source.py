"""Spark Python DataSource connector for the tile set
(sources/tile_source.py): format-name loading, partition-parallel
generation equal to the arithmetic builder, and x/y/z filter pushdown
pruning rows before any task materializes them."""

from pyspark.sql import functions as F

from label_maker_dask_spark.sources.tile_source import (
    SlippyTileReader,
    register_tile_source,
)
from label_maker_dask_spark.tiles import n_tiles, tiles_df

BOUNDS = [-9.179, 38.708, -9.1195, 38.754]
ZOOM = 15


def _load(spark, **opts):
    # pushFilters requires the (off-by-default) python pushdown flag
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_tile_source(spark)
    r = (
        spark.read.format("slippy_tiles")
        .option("bounds", ",".join(str(v) for v in BOUNDS))
        .option("zoom", str(ZOOM))
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_connector_equals_arithmetic_builder(spark):
    got = sorted(map(tuple, _load(spark).collect()))
    want = sorted(map(tuple, tiles_df(spark, BOUNDS, ZOOM).collect()))
    assert got == want and len(got) == n_tiles(BOUNDS, ZOOM) == 36


def test_connector_respects_num_partitions(spark):
    df = _load(spark, numPartitions=3)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 36


def test_filter_pushdown_prunes_ranges(spark):
    # the reader's ranges must tighten EXACTLY under pushed filters
    full = _load(spark)
    xs = sorted(r["x"] for r in full.select("x").distinct().collect())
    cut = xs[2]
    pruned = _load(spark).where(F.col("x") > cut)
    got = sorted(map(tuple, pruned.collect()))
    want = sorted(
        map(tuple, full.where(F.col("x") > cut).collect())
    )
    assert got == want and 0 < len(got) < 36


def test_filter_pushdown_zoom_mismatch_empty(spark):
    assert _load(spark).where(F.col("z") == ZOOM + 1).count() == 0


def test_reader_pushdown_unit():
    # unit-level: accepted filters tighten ranges; others are yielded back
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

    r = SlippyTileReader(
        {"bounds": "-9.179,38.708,-9.1195,38.754", "zoom": "15"}
    )
    x0 = r.xmin
    rest = list(
        r.pushFilters(
            [GreaterThan(("x",), x0 + 1), IsNotNull(("y",))]
        )
    )
    assert r.xmin == x0 + 2
    assert len(rest) == 1 and isinstance(rest[0], IsNotNull)


def test_missing_options_raise():
    import pytest

    with pytest.raises(ValueError, match="bounds"):
        SlippyTileReader({"zoom": "15"})
