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


def test_stream_reader_offsets_partition_and_replay():
    """The streaming reader's offset algebra, without a running query:
    successive read() calls walk the y range in rowsPerBatch stripes,
    the exhausted source returns an empty ITERATOR with an unchanged
    offset (Spark's prefetch wrapper calls next() on it and pickles
    it), and readBetweenOffsets() reproduces any batch verbatim — the
    crash-replay contract."""
    from label_maker_dask_spark.sources.tile_source import (
        SlippyTileStreamReader,
    )

    r = SlippyTileStreamReader(
        {"bounds": "-10,36,10,44", "zoom": "8", "rowsperbatch": "3"}
    )
    assert (r.xmin, r.ymin, r.xmax, r.ymax) == (120, 93, 135, 100)
    off = r.initialOffset()
    seen, batches = [], []
    while True:
        it, nxt = r.read(off)
        rows = list(it)
        if not rows:
            assert nxt == off  # exhausted: offset must not move
            break
        batches.append((off, nxt, rows))
        seen += rows
        off = nxt
    assert len(batches) == 3  # 8 y-rows in stripes of 3 -> 3, 3, 2
    expected = [
        (8, x, y) for y in range(93, 101) for x in range(120, 136)
    ]
    assert sorted(seen) == sorted(expected) and len(seen) == len(set(seen))
    for start, end, rows in batches:  # crash replay: byte-identical
        assert list(r.readBetweenOffsets(start, end)) == rows
    import pickle

    it, _ = r.read(r.initialOffset())
    assert list(pickle.loads(pickle.dumps(it))) == batches[0][2]


def test_partitioned_stream_reader_plans_stripes():
    """The partitioned streaming reader's offset/partition algebra:
    latestOffset walks the y range in rowsPerBatch steps and clamps at
    the grid end, partitions(start, end) plans one executor stripe per
    y row, read(partition) generates exactly that stripe, and an empty
    range plans a no-row partition (Spark still calls partitions on
    empty restart-catch-up batches)."""
    from label_maker_dask_spark.sources.tile_source import (
        SlippyTilePartitionedStreamReader,
    )

    r = SlippyTilePartitionedStreamReader(
        {"bounds": "-10,36,10,44", "zoom": "8", "rowsperbatch": "3"}
    )
    assert r.initialOffset() == {"y": 93}
    offs = [r.latestOffset() for _ in range(4)]
    assert offs == [{"y": 96}, {"y": 99}, {"y": 101}, {"y": 101}]
    parts = r.partitions({"y": 93}, {"y": 96})
    assert [p.y for p in parts] == [93, 94, 95]
    rows = [row for p in parts for row in r.read(p)]
    assert rows == [(8, x, y) for y in (93, 94, 95) for x in range(120, 136)]
    empty = r.partitions({"y": 96}, {"y": 96})
    assert len(empty) == 1 and list(r.read(empty[0])) == []
