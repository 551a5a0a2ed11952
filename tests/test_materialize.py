"""The materialize() mode knob (operators/materialize.py): default
localCheckpoint, opt-in persist / reliable-checkpoint for cluster
fault tolerance, and value-equivalence across all three modes."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.materialize import (
    MODE_CONF,
    materialize,
)


@pytest.fixture
def frame(spark):
    return spark.range(100).withColumn("v", F.col("id") * 2)


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


def test_default_mode_is_local_checkpoint(spark, frame):
    spark.conf.unset(MODE_CONF)
    out = materialize(frame)
    # localCheckpoint truncates lineage onto an RDD scan (LogicalRDD)
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    assert _rows(out) == _rows(frame)


def test_persist_mode_retains_lineage_and_caches(spark, frame):
    spark.conf.set(MODE_CONF, "persist")
    try:
        out = materialize(frame)
        assert _rows(out) == _rows(frame)
        # persist keeps the logical plan (no RDD scan) and registers a
        # cache entry; lost blocks would recompute from lineage
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" not in plan
        assert out.storageLevel.useMemory
        out.unpersist()
    finally:
        spark.conf.unset(MODE_CONF)


def test_checkpoint_mode_needs_a_checkpoint_dir(spark, frame, tmp_path):
    spark.conf.set(MODE_CONF, "checkpoint")
    try:
        sc = spark.sparkContext
        had = sc.getCheckpointDir()
        if had is None:
            with pytest.raises(Exception):
                materialize(frame).collect()
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        out = materialize(frame)
        assert _rows(out) == _rows(frame)
    finally:
        spark.conf.unset(MODE_CONF)


def test_unknown_mode_raises_with_the_conf_name(spark, frame):
    spark.conf.set(MODE_CONF, "cache")
    try:
        with pytest.raises(ValueError, match=MODE_CONF):
            materialize(frame)
    finally:
        spark.conf.unset(MODE_CONF)


def test_operator_paths_respect_the_persist_knob(spark):
    """A representative migrated call site (minhash profile pin) still
    returns identical results under the cluster-safe persist mode."""
    from label_maker_dask_spark.operators.dedup import minhash_neardup_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely unrelated text about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    base = sorted(
        tuple(r) for r in minhash_neardup_pairs(docs, threshold=0.3).collect()
    )
    spark.conf.set(MODE_CONF, "persist")
    try:
        under_persist = sorted(
            tuple(r)
            for r in minhash_neardup_pairs(docs, threshold=0.3).collect()
        )
    finally:
        spark.conf.unset(MODE_CONF)
    assert under_persist == base
