"""Snapshot-versioned maintenance: each micro-batch publishes an
immutable version — pinned reads, O(1) rollback, exactly-once markers
folded into the snapshot, and the rollback-and-replay contract."""

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401  (schema literals)

from label_maker_dask_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
    rollback,
    snapshot_metadata,
)
from label_maker_dask_spark.streaming.snapshot_sink import (
    accumulate_snapshot_batch,
    stream_upsert_to_snapshots,
    upsert_snapshot_batch,
)

SCHEMA = "k long, v string, seq long, is_del boolean"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_snapshots_history_and_pinned_reads(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    v1 = upsert_snapshot_batch(
        _batch(spark, [(1, "a", 1, False), (2, "b", 1, False)]),
        tbl, ["k"], "seq", batch_id=0, delete_col="is_del", run_id="r",
    )
    v2 = upsert_snapshot_batch(
        _batch(spark, [(2, "b2", 2, False), (3, "c", 2, False)]),
        tbl, ["k"], "seq", batch_id=1, delete_col="is_del", run_id="r",
    )
    assert (v1, v2) == (1, 2)
    assert latest_version(tbl) == 2
    now = {r.k: r.v for r in read_snapshot(spark, tbl).collect()}
    assert now == {1: "a", 2: "b2", 3: "c"}
    # the PINNED read still sees the pre-update state — history survives
    old = {r.k: r.v for r in read_snapshot(spark, tbl, version=1).collect()}
    assert old == {1: "a", 2: "b"}
    assert snapshot_metadata(tbl, 2) == {"run": "r", "batch": 1}


def test_upsert_replay_is_skipped_and_heals_pointer(spark, tmp_path):
    """Replaying an already-published batch publishes nothing; a crash
    between the version rename and the pointer move (pointer lagging the
    lineage tip) is healed by the replay."""
    tbl = str(tmp_path / "tbl")
    b0 = _batch(spark, [(1, "a", 1, False)])
    b1 = _batch(spark, [(1, "a2", 2, False)])
    upsert_snapshot_batch(b0, tbl, ["k"], "seq", 0, run_id="r")
    upsert_snapshot_batch(b1, tbl, ["k"], "seq", 1, run_id="r")

    # simulate the torn publish: pointer rolled back behind the tip
    rollback(tbl, 1)
    assert latest_version(tbl) == 1
    got = upsert_snapshot_batch(b1, tbl, ["k"], "seq", 1, run_id="r")
    assert got is None  # no duplicate version published
    assert latest_version(tbl) == 2  # pointer healed onto the lineage tip
    assert {r.v for r in read_snapshot(spark, tbl).collect()} == {"a2"}


def test_accumulate_snapshots_exactly_once_and_rollback_replay(
    spark, tmp_path
):
    """The verdict's rollback test: kill mid-batch (publish done, commit
    not), roll back one version, replay — the stored sums still equal the
    batch truth (no double count)."""
    tbl = str(tmp_path / "counts")
    d0 = spark.createDataFrame([("a", 2), ("b", 3)], "k string, w long")
    d1 = spark.createDataFrame([("a", 5), ("c", 1)], "k string, w long")
    accumulate_snapshot_batch(d0, tbl, ["k"], ["w"], 0, run_id="r")
    accumulate_snapshot_batch(d1, tbl, ["k"], ["w"], 1, run_id="r")

    rollback(tbl, 1)  # operator rolls back after the "crash"
    accumulate_snapshot_batch(d1, tbl, ["k"], ["w"], 1, run_id="r")  # replay
    got = {r.k: r.w for r in read_snapshot(spark, tbl).collect()}
    assert got == {"a": 7, "b": 3, "c": 1}  # equals-batch, no double count
    # and v1 is still the pre-batch state, pinned
    assert {
        r.k: r.w for r in read_snapshot(spark, tbl, version=1).collect()
    } == {"a": 2, "b": 3}


def test_foreign_run_raises(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    b = _batch(spark, [(1, "a", 1, False)])
    upsert_snapshot_batch(b, tbl, ["k"], "seq", 0, run_id="r1")
    with pytest.raises(ValueError, match="different stream run"):
        upsert_snapshot_batch(b, tbl, ["k"], "seq", 0, run_id="r2")


def test_streaming_end_to_end_with_retention(spark, tmp_path):
    changes = str(tmp_path / "changes")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    import time as _time

    for i, rows in enumerate(
        [
            [(1, "a", 1, False), (2, "b", 1, False)],
            [(2, "b2", 2, False)],
            [(1, "gone", 3, True), (3, "c", 3, False)],
        ]
    ):
        _batch(spark, rows).coalesce(1).write.mode("append").parquet(changes)
        if i < 2:
            _time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes)
    )
    q = stream_upsert_to_snapshots(
        stream, tbl, ckpt, keys=["k"], seq_col="seq",
        delete_col="is_del", keep=2,
    )
    q.awaitTermination(120)

    assert latest_version(tbl) == 3
    got = {r.k: r.v for r in read_snapshot(spark, tbl).collect()}
    assert got == {2: "b2", 3: "c"}
    # retention bounded storage to the newest 2 versions
    have = sorted(
        int(n[2:]) for n in os.listdir(tbl) if n.startswith("v=")
    )
    assert have == [2, 3]
