"""Bucketed tables: co-located joins and aggregations without a shuffle —
the storage-layout half of the 100 TB join strategy (SCALE.md).  A fact
table bucketed on its join/group key is read bucket-aligned, so the join
exchange (the dominant cost of fact-fact joins at scale) disappears."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
BUCKETS = 8


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    from label_maker_dask_spark.sources.io import write_bucketed_table

    write_bucketed_table(orders, "orders_b", ["o_orderkey"], BUCKETS)
    write_bucketed_table(li, "lineitem_b", ["l_orderkey"], BUCKETS)
    yield orders, li
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@contextlib.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders, li = bucketed_tables
    with _no_broadcast(spark):
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-aligned scan, zero shuffle
        # same rows as the plain (shuffling) join
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected

        # the unbucketed twin DOES shuffle — the assertion above is not
        # vacuous
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in plan_of(plain)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    orders, li = bucketed_tables
    agg = (
        spark.table("lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = plan_of(agg)
    assert "Exchange" not in plan  # grouping key == bucket key
    expected = li.groupBy("l_orderkey").count().count()
    assert agg.count() == expected
