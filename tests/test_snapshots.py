"""Snapshot-versioned tables: publish, pin, rollback, expire."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.sources.snapshots import (
    expire_snapshots,
    latest_version,
    read_snapshot,
    rollback,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"))


def test_publish_pin_and_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, 0, 10), t) == 1
    assert write_snapshot(_df(spark, 0, 25), t) == 2
    assert latest_version(t) == 2
    assert read_snapshot(spark, t).count() == 25
    # a pinned read reproduces the old bytes even after new publishes
    assert read_snapshot(spark, t, version=1).count() == 10


def test_rollback_is_pointer_move(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), t)
    write_snapshot(_df(spark, 0, 25), t)
    rollback(t, 1)
    assert latest_version(t) == 1
    assert read_snapshot(spark, t).count() == 10
    # the newer version still exists and is still pin-readable
    assert read_snapshot(spark, t, version=2).count() == 25
    with pytest.raises(FileNotFoundError, match="missing v=9"):
        rollback(t, 9)


def test_expire_keeps_newest_and_pinned(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for hi in (5, 10, 15, 20):
        write_snapshot(_df(spark, 0, hi), t)
    removed = expire_snapshots(t, keep=2)
    assert removed == [1, 2]
    assert read_snapshot(spark, t, version=3).count() == 15
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=1)
    # expire never deletes the version _latest points at
    rollback(t, 3)
    assert 3 not in expire_snapshots(t, keep=1)
    assert read_snapshot(spark, t).count() == 15


def test_read_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no snapshots"):
        read_snapshot(spark, str(tmp_path / "nope"))
