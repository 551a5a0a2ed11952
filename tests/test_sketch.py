"""Count-min sketch: merge losslessness, the overestimate guarantee,
and the streaming-maintained form (cells accumulated through the
bucketed additive sink equal the batch-built sketch)."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_increments,
    cms_merge,
)

W, D = 32, 3  # small sketch so collisions actually occur in tests


def _items(spark, n=500):
    # deterministic skewed items: item id i appears (i % 7) + 1 times
    rows = [(i, f"u{i % 37}") for i in range(n)]
    return spark.createDataFrame(rows, "row_id long, item string")


def _cells(df):
    return {
        (r["j"], r["bucket"]): r["n"] for r in df.collect()
    }


def test_cms_merge_is_lossless(spark):
    """Sketches built per group and summed == the sketch of the union."""
    df = _items(spark).withColumn(
        "grp", F.pmod(F.col("row_id"), F.lit(5))
    )
    per_group = cms_build(df, "item", W, D, group_cols=["grp"])
    merged = cms_merge(per_group)
    direct = cms_build(df, "item", W, D)
    assert _cells(merged) == _cells(direct)


def test_cms_estimate_overestimates_and_is_exact_sans_collisions(spark):
    df = _items(spark)
    sketch = cms_build(df, "item", W, D)
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(sketch, exact, "item", W, D)
    rows = est.collect()
    assert len(rows) == 37
    # the CMS guarantee: never under
    assert all(r["n_cms"] >= r["n_exact"] for r in rows)
    # with 37 items in 32x3 buckets some rows collide; the estimate is
    # still bounded by total mass
    total = df.count()
    assert all(r["n_cms"] <= total for r in rows)


def test_cms_estimate_unseen_item_reads_collision_floor(spark):
    df = _items(spark)
    sketch = cms_build(df, "item", W, D)
    probe = spark.createDataFrame([("never-seen",)], "item string")
    [r] = cms_estimate(sketch, probe, "item", W, D).collect()
    # an unseen item reads whatever collided into its cells: >= 0, and
    # never more than the total mass
    assert 0 <= r["n_cms"] <= df.count()


def test_cms_estimate_empty_sketch_is_zero(spark):
    empty = _items(spark).where(F.lit(False))
    sketch = cms_build(empty, "item", W, D)
    probe = spark.createDataFrame([("x",)], "item string")
    [r] = cms_estimate(sketch, probe, "item", W, D).collect()
    assert r["n_cms"] == 0


def test_streaming_maintained_cms_equals_batch_build(spark, tmp_path):
    """Increments drained through the bucketed additive sink in two
    micro-batches produce EXACTLY the batch-built sketch of the union —
    the maintained-sketch pattern (store cells, answer point queries
    any time, never rescan the ingested facts)."""
    from label_maker_dask_spark.streaming.bucketed import (
        read_maintained_table,
        stream_accumulate_to_parquet_bucketed,
    )

    src = str(tmp_path / "src")
    base = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    df = _items(spark)
    half1 = df.where(F.col("row_id") < 250)
    half2 = df.where(F.col("row_id") >= 250)

    def drain(part):
        part.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "row_id long, item string"
        ).parquet(src)
        q = stream_accumulate_to_parquet_bucketed(
            cms_increments(stream, "item", W, D),
            base,
            ckpt,
            keys=["j", "bucket"],
            sum_cols=["n"],
            n_buckets=4,
        )
        q.awaitTermination(120)

    drain(half1)
    drain(half2)
    maintained = read_maintained_table(spark, base)
    assert _cells(maintained) == _cells(cms_build(df, "item", W, D))
    # and the maintained cells answer point queries identically
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    got = {
        r["item"]: r["n_cms"]
        for r in cms_estimate(maintained, exact, "item", W, D).collect()
    }
    want = {
        r["item"]: r["n_cms"]
        for r in cms_estimate(
            cms_build(df, "item", W, D), exact, "item", W, D
        ).collect()
    }
    assert got == want
