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


def test_partitioned_reader_restart_never_redelivers():
    """The restart contract, unit-level.  Measured call order (see the
    latestOffset comment): Spark always hands a restarted reader the
    frontier through a partitions() call — an (end_k, end_k) probe in
    the committed case, the replayed (s_k, e_k) range in the
    uncommitted case — BEFORE its first latestOffset(), so a regressed
    offset is never planned in practice.  This test additionally pins
    the DEFENSE-IN-DEPTH behavior under the hypothetical
    latestOffset-first order: a regressed first offset must plan an
    empty batch (no re-delivery of committed stripes) and the next
    batch must resume at the frontier with no ymin-re-walk stall; and
    the crash-replay paths must deliver the uncommitted range
    verbatim."""
    from label_maker_dask_spark.sources.tile_source import (
        SlippyTilePartitionedStreamReader,
    )

    opts = {"bounds": "-10,36,10,44", "zoom": "8", "rowsperbatch": "3"}
    # run 1: two committed batches -> checkpointed offset {"y": 99}
    r1 = SlippyTilePartitionedStreamReader(opts)
    assert r1.latestOffset() == {"y": 96}
    r1.partitions({"y": 93}, {"y": 96})
    assert r1.latestOffset() == {"y": 99}
    delivered = {
        p.y for p in r1.partitions({"y": 96}, {"y": 99})
    } | {93, 94, 95}

    # restart (committed case): fresh reader, latestOffset first
    r2 = SlippyTilePartitionedStreamReader(opts)
    regressed = r2.latestOffset()
    assert regressed == {"y": 96}  # below checkpoint - API inherent
    catchup = r2.partitions({"y": 99}, regressed)
    assert [p.y for p in catchup if p.xmin <= p.xmax] == []  # no dupes
    nxt = r2.latestOffset()
    assert nxt == {"y": 102} or nxt == {"y": 101}  # resumed, no stall
    resumed = r2.partitions(regressed, nxt)
    ys = [p.y for p in resumed if p.xmin <= p.xmax]
    assert ys and min(ys) == 99  # clip: committed stripes not replanned
    assert not (set(ys) & delivered)

    # restart (uncommitted case): fresh reader, partitions() first —
    # the checkpointed range must replay verbatim, unclipped
    r3 = SlippyTilePartitionedStreamReader(opts)
    assert [p.y for p in r3.partitions({"y": 96}, {"y": 99})] == [
        96,
        97,
        98,
    ]

    # restart (uncommitted case, observed call order): Spark probes
    # with an EMPTY (end_k, end_k) range before replaying the
    # uncommitted batch (s_k, e_k) — the probe must not raise the
    # clip floor, or the replay is lost
    r4 = SlippyTilePartitionedStreamReader(opts)
    probe = r4.partitions({"y": 99}, {"y": 99})
    assert [p.y for p in probe if p.xmin <= p.xmax] == []
    assert [p.y for p in r4.partitions({"y": 96}, {"y": 99})] == [
        96,
        97,
        98,
    ]
    # and the cursor fast-forwarded past the replayed batch: the next
    # planned offset resumes at the frontier (99+3 clamped to ymax+1),
    # not at ymin
    assert r4.latestOffset() == {"y": 101}


def test_partitioned_stream_restart_end_to_end(spark, tmp_path):
    """Checkpoint-restart the partitioned streaming source for real:
    run until >=2 micro-batches are committed, stop, restart the same
    query from the checkpoint, run to grid exhaustion.  The sink must
    hold the full closed-form grid with ZERO duplicate rows — the
    restart regression (first latestOffset below the checkpoint) must
    cost at most empty catch-up batches, never re-delivery."""
    import time

    from label_maker_dask_spark.tiles import tile_range

    register_tile_source(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    bounds = [-10.0, 36.0, 10.0, 44.0]
    zoom = 9  # 32x16 grid -> 16 one-stripe batches at 1s apiece
    xmin, ymin, xmax, ymax = tile_range(bounds, zoom)
    width = xmax - xmin + 1
    expected = [
        (zoom, x, y)
        for y in range(ymin, ymax + 1)
        for x in range(xmin, xmax + 1)
    ]

    def start_query():
        return (
            spark.readStream.format("slippy_tiles")
            .option("bounds", ",".join(str(v) for v in bounds))
            .option("zoom", str(zoom))
            .option("rowsperbatch", "1")
            .option("streamingMode", "partitioned")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    def sink_count():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    q = start_query()
    try:
        deadline = time.time() + 120
        # wait until at least 2 stripes are committed, then stop —
        # the 1 s trigger over 16 one-stripe batches guarantees the
        # stop lands mid-grid
        while sink_count() < 2 * width and time.time() < deadline:
            if not q.isActive:
                raise RuntimeError(f"stream died: {q.exception()}")
            time.sleep(0.1)
    finally:
        q.stop()
    mid = sink_count()
    assert 0 < mid < len(expected), "stopped mid-grid"

    q = start_query()
    try:
        deadline = time.time() + 180
        while sink_count() < len(expected) and time.time() < deadline:
            if not q.isActive:
                raise RuntimeError(f"stream died: {q.exception()}")
            time.sleep(0.25)
    finally:
        q.stop()

    rows = [
        (r["z"], r["x"], r["y"])
        for r in spark.read.parquet(out).collect()
    ]
    assert sorted(rows) == sorted(expected)  # full grid, no duplicates


def test_latest_offset_regression_double_crash_gap(tmp_path):
    """The double-crash residual of the reader-local floor, and its
    CLOSURE via the ``floordir`` option.  Sequence (hypothetical
    latestOffset-before-partitions restart order): run 1 commits up to
    frontier 99; a first restarted reader plans a catch-up batch whose
    start is below that frontier; the driver crashes BEFORE it commits;
    the second restarted reader replays the range on a fresh reader.

    WITHOUT floordir the in-memory floor reset to ymin and committed
    stripes 96-98 re-deliver (the documented residual — pinned below so
    a behavior change is noticed).  WITH floordir, commit() persisted
    frontier 99 beside the checkpoint, the fresh reader reloads it, and
    the replay's committed prefix is clipped: the gap is closed."""
    from label_maker_dask_spark.sources.tile_source import (
        SlippyTilePartitionedStreamReader,
    )

    opts = {"bounds": "-10,36,10,44", "zoom": "8", "rowsperbatch": "3"}
    # --- bare reader: the residual persists (unchanged behavior) ---
    r1 = SlippyTilePartitionedStreamReader(opts)
    r1.latestOffset()
    r1.partitions({"y": 93}, {"y": 96})
    r1.latestOffset()
    r1.partitions({"y": 96}, {"y": 99})
    r1.commit({"y": 99})  # no floordir: commit is a no-op

    r2 = SlippyTilePartitionedStreamReader(opts)
    assert r2.latestOffset() == {"y": 96}
    assert r2.latestOffset() == {"y": 99}
    # (suppose the WAL now holds (96, 99) uncommitted; crash)

    r3 = SlippyTilePartitionedStreamReader(opts)
    replay = [p.y for p in r3.partitions({"y": 96}, {"y": 99})]
    assert replay == [96, 97, 98]  # the residual: re-delivery

    # --- floordir set: the same double-crash replay is clipped ---
    fopts = {**opts, "floordir": str(tmp_path / "ckpt")}
    d1 = SlippyTilePartitionedStreamReader(fopts)
    d1.latestOffset()
    d1.partitions({"y": 93}, {"y": 96})
    d1.commit({"y": 96})
    d1.latestOffset()
    d1.partitions({"y": 96}, {"y": 99})
    d1.commit({"y": 99})  # durable frontier: 99

    d2 = SlippyTilePartitionedStreamReader(fopts)
    d2.latestOffset()  # crash before anything commits in this run

    d3 = SlippyTilePartitionedStreamReader(fopts)
    parts = d3.partitions({"y": 96}, {"y": 99})
    rows = [r for p in parts for r in d3.read(p)]
    assert rows == []  # committed stripes never re-deliver

    # and a legitimately uncommitted suffix still delivers in full
    d4 = SlippyTilePartitionedStreamReader(fopts)
    tail = [p.y for p in d4.partitions({"y": 96}, {"y": 102})]
    assert tail == [99, 100, 101]

    # a different grid refuses the stale floor file loudly
    import pytest

    with pytest.raises(ValueError, match="different grid"):
        SlippyTilePartitionedStreamReader(
            {**fopts, "zoom": "9"}
        )

    # --- run-id binding: a FRESH query must not inherit a stale floor -
    ropts = {**opts, "floordir": str(tmp_path / "ckpt2"),
             "floorrunid": "run-A"}
    e1 = SlippyTilePartitionedStreamReader(ropts)
    e1.partitions({"y": 93}, {"y": 96})
    e1.commit({"y": 96})  # durable floor bound to run-A

    # same run id (restart of the same query): floor honored
    e2 = SlippyTilePartitionedStreamReader(ropts)
    rows = [r for p in e2.partitions({"y": 93}, {"y": 96})
            for r in e2.read(p)]
    assert rows == []  # committed range clipped

    # NEW run id (fresh checkpoint, same grid + floordir): the stale
    # floor is ignored — the old range DELIVERS again (fresh-run
    # semantics), no silent data loss
    e3 = SlippyTilePartitionedStreamReader(
        {**ropts, "floorrunid": "run-B"}
    )
    ys = sorted({p.y for p in e3.partitions({"y": 93}, {"y": 96})})
    assert ys == [93, 94, 95]
    e3.commit({"y": 96})  # and the file re-binds to run-B
    e4 = SlippyTilePartitionedStreamReader(
        {**ropts, "floorrunid": "run-B"}
    )
    rows = [r for p in e4.partitions({"y": 93}, {"y": 96})
            for r in e4.read(p)]
    assert rows == []

    # LEGACY floor file (written before the run binding, no "run" key)
    # on a continuing checkpoint: must still be honored — dropping it
    # would reopen the double-crash window across an upgrade
    import json

    lopts = {**opts, "floordir": str(tmp_path / "ckpt3"),
             "floorrunid": "run-C"}
    (tmp_path / "ckpt3").mkdir()
    (tmp_path / "ckpt3" / "_slippy_floor.json").write_text(
        json.dumps({"zoom": 8, "bounds": [-10.0, 36.0, 10.0, 44.0],
                    "y": 96})
    )
    e5 = SlippyTilePartitionedStreamReader(lopts)
    rows = [r for p in e5.partitions({"y": 93}, {"y": 96})
            for r in e5.read(p)]
    assert rows == []  # legacy committed range still clipped
