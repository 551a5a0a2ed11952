"""Unit tests for the round-5 operators: CDC merge, salted join, OHLC."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.merge import merge_upsert
from label_maker_dask_spark.operators.skew import salted_join
from label_maker_dask_spark.operators.timeseries import resample_ohlc


# ---------------------------------------------------------------- merge


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, amount double",
    )


def test_merge_update_insert_delete_keep(spark):
    src = spark.createDataFrame(
        [(2, "B", 99.0, False), (5, "e", 50.0, False), (3, "x", 0.0, True)],
        "k long, name string, amount double, is_del boolean",
    )
    out = merge_upsert(
        _target(spark), src, ["k"], delete_col="is_del", action_col="action"
    )
    rows = {r.k: (r.name, r.amount, r.action) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0, "keep"),
        2: ("B", 99.0, "update"),
        4: ("d", 40.0, "keep"),
        5: ("e", 50.0, "insert"),
    }


def test_merge_respects_update_cols_subset(spark):
    src = spark.createDataFrame([(2, "B", 99.0)], "k long, name string, amount double")
    out = merge_upsert(_target(spark), src, ["k"], update_cols=["amount"])
    row = out.where(F.col("k") == 2).collect()[0]
    assert row.name == "b" and row.amount == 99.0  # name NOT updated


def test_merge_rejects_duplicate_source_keys(spark):
    src = spark.createDataFrame(
        [(2, "B", 1.0), (2, "C", 2.0)], "k long, name string, amount double"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_upsert(_target(spark), src, ["k"])


def test_merge_null_key_matches_null_safely(spark):
    tgt = spark.createDataFrame([(None, "n", 1.0)], "k long, name string, amount double")
    src = spark.createDataFrame([(None, "N", 2.0)], "k long, name string, amount double")
    out = merge_upsert(tgt, src, ["k"], action_col="action").collect()
    assert len(out) == 1 and out[0].action == "update" and out[0].name == "N"


def test_merge_broadcast_never_shuffles_target_wide(spark):
    """With broadcast_source, the matched path must be a BroadcastHashJoin
    (the wide target streams) — a FULL OUTER formulation cannot broadcast
    and would silently sort-merge-shuffle the whole base table."""
    from pyspark.sql import functions as F

    tgt = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("amount"),
        F.concat(F.lit("row_"), F.col("id")).alias("payload"),
    )
    src = spark.createDataFrame(
        [(5, 1.0, "x"), (20_000, 2.0, "y")], "k long, amount double, payload string"
    )
    out = merge_upsert(tgt, src, ["k"], broadcast_source=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "FullOuter" not in plan
    # and the result is still the correct 10_001-row merge
    assert out.count() == 10_001


# ---------------------------------------------------------------- salted join


def test_salted_join_equals_plain_join(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], "k long, label string"
    )
    salted = salted_join(big, small, ["k"], n_salts=4)
    plain = big.join(small, on=["k"])
    assert sorted(map(tuple, salted.select("k", "v", "label").collect())) == sorted(
        map(tuple, plain.select("k", "v", "label").collect())
    )


def test_salted_join_left_preserves_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (99, "y")], "k long, v string")
    small = spark.createDataFrame([(1, "one")], "k long, label string")
    out = salted_join(big, small, ["k"], n_salts=3, how="left")
    rows = {r.k: r.label for r in out.collect()}
    assert rows == {1: "one", 99: None}


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="full")


def test_salted_join_plan_no_big_side_shuffle(spark):
    """With the small side broadcast, the salted join itself must add NO
    exchange on the big side — the salt column is pure projection math and
    the join is a BroadcastHashJoin."""
    big = spark.range(0, 5000).select((F.col("id") % 5).alias("k"), "id")
    small = spark.createDataFrame(
        [(i, f"d{i}") for i in range(5)], "k long, label string"
    )
    out = salted_join(big, small, ["k"], n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # only the broadcast exchange, never a shuffle exchange of the big side
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def test_salted_join_rejects_existing_salt_column(spark):
    df = spark.range(1).select(F.col("id").alias("k"), F.lit(0).alias("_salt"))
    ok = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, ok, ["k"])


def test_salted_join_deterministic_salt(spark):
    # same inputs -> identical salted result twice (no rand() anywhere)
    big = spark.range(0, 500).select((F.col("id") % 3).alias("k"), "id")
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, s string")
    a = sorted(map(tuple, salted_join(big, small, ["k"]).collect()))
    b = sorted(map(tuple, salted_join(big, small, ["k"]).collect()))
    assert a == b


# ---------------------------------------------------------------- OHLC


def test_resample_ohlc_values_and_ties(spark):
    rows = [
        # key A, one hour: open=first by (ts,id), close=last by (ts,id);
        # two rows share ts 00:30 -> id breaks the tie for close
        ("A", "2024-01-01 00:05:00", 1, 10.0),
        ("A", "2024-01-01 00:30:00", 2, 5.0),
        ("A", "2024-01-01 00:30:00", 3, 99.0),
        # key A, next hour
        ("A", "2024-01-01 01:10:00", 4, 7.0),
        # key B
        ("B", "2024-01-01 00:50:00", 5, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts_s string, event_id long, value double"
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "event_id", "value")
    out = resample_ohlc(df, "ts", "value", ["key"], "hour", tie_break="event_id")
    got = {
        (r.key, str(r.bucket)): (r.open, r.high, r.low, r.close, r.n)
        for r in out.collect()
    }
    assert got[("A", "2024-01-01 00:00:00")] == (10.0, 99.0, 5.0, 99.0, 3)
    assert got[("A", "2024-01-01 01:00:00")] == (7.0, 7.0, 7.0, 7.0, 1)
    assert got[("B", "2024-01-01 00:00:00")] == (3.0, 3.0, 3.0, 3.0, 1)


def test_resample_ohlc_single_shuffle_plan(spark):
    df = spark.range(100).select(
        F.lit("k").alias("key"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    )
    out = resample_ohlc(df, "ts", "value", ["key"], "hour", tie_break="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange (the group-by), zero window/sort operators
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def test_merge_upsert_evolve_schema_additive(spark):
    """evolve_schema=True widens the target with typed NULLs for
    source-only columns: matched rows take the new value, untouched rows
    read NULL, inserts carry it; the default (False) silently keeps the
    target schema; change-log metadata (delete_col) never becomes a
    table column."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    source = spark.createDataFrame(
        [(2, 21, "fresh", False), (4, 40, "new", False),
         (3, 0, None, True)],
        "k long, v long, note string, is_del boolean",
    )

    out = merge_upsert(
        target, source, keys=["k"], delete_col="is_del", evolve_schema=True
    )
    assert set(out.columns) == {"k", "v", "note"}
    rows = {r.k: (r.v, r.note) for r in out.collect()}
    assert rows == {1: (10, None), 2: (21, "fresh"), 4: (40, "new")}

    # default: the new column is NOT adopted (target schema preserved)
    legacy = merge_upsert(target, source, keys=["k"], delete_col="is_del")
    assert set(legacy.columns) == {"k", "v"}
    assert {r.k: r.v for r in legacy.collect()} == {1: 10, 2: 21, 4: 40}


def test_merge_upsert_evolve_schema_case_insensitive_existing(spark):
    """A source column differing from an existing target column only by
    case is the SAME column under Spark's default resolution — evolution
    must NOT treat it as new (which would withColumn-replace the
    existing data with NULLs)."""
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10, "keepme"), (2, 20, "also")], "k long, v long, Note string"
    )
    source = spark.createDataFrame(
        [(2, 21, "fresh")], "k long, v long, note string"
    )
    out = merge_upsert(target, source, keys=["k"], evolve_schema=True)
    rows = {r.k: (r.v, r[2]) for r in out.collect()}
    # unmatched row keeps its value; matched row takes the update
    assert rows == {1: (10, "keepme"), 2: (21, "fresh")}


def test_merge_upsert_evolve_schema_with_explicit_update_cols(spark):
    """evolve_schema + an explicit update_cols list: the evolved column
    still takes source values on matched rows and inserts (the contract
    'matched rows take the new values' holds regardless of how
    update_cols was supplied)."""
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame(
        [(2, 21, "fresh"), (3, 30, "new")], "k long, v long, note string"
    )
    out = merge_upsert(
        target, source, keys=["k"], update_cols=["v"], evolve_schema=True
    )
    rows = {r.k: (r.v, r.note) for r in out.collect()}
    assert rows == {1: (10, None), 2: (21, "fresh"), 3: (30, "new")}
