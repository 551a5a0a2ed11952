"""SCD type-2: batch historization, incremental apply equality, and the
out-of-order guard."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.scd import historize_changes, scd2_apply


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "cid long, seq long, ts_us long, segment string"
    ).select(
        "cid", "seq",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "segment",
    )


def test_historize_intervals_and_current_flag(spark):
    df = _chg(spark, [
        (1, 1, 1_000_000, "bronze"),
        (1, 2, 5_000_000, "silver"),
        (1, 3, 9_000_000, "gold"),
        (2, 4, 2_000_000, "bronze"),
    ])
    h = {(r.cid, r.seq): r for r in historize_changes(
        df, ["cid"], "ts", "seq").collect()}
    assert str(h[(1, 1)].valid_to) == str(h[(1, 2)].valid_from)
    assert str(h[(1, 2)].valid_to) == str(h[(1, 3)].valid_from)
    assert h[(1, 3)].valid_to is None and h[(1, 3)].is_current
    assert not h[(1, 1)].is_current and not h[(1, 2)].is_current
    assert h[(2, 4)].is_current


def test_scd2_apply_equals_full_historize(spark):
    """Applying change batches in order must equal historizing the whole
    log at once — the equals-batch contract that lets a foreachBatch
    sink maintain the history incrementally."""
    all_rows = [
        (k, i * 10 + k, (i * 50 + k) * 1_000_000, f"s{i % 4}")
        for k in range(1, 8)
        for i in range(6)
    ]
    full = historize_changes(_chg(spark, all_rows), ["cid"], "ts", "seq")

    cut = 3
    b0 = [r for r in all_rows if r[1] // 10 < cut]
    b1 = [r for r in all_rows if r[1] // 10 >= cut]
    hist = historize_changes(_chg(spark, b0), ["cid"], "ts", "seq")
    hist = scd2_apply(hist, _chg(spark, b1), ["cid"], "ts", "seq")

    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, hist.select(*full.columns).collect()))
    assert a == b and len(a) == len(all_rows)


def test_scd2_apply_rejects_out_of_order_batch(spark):
    hist = historize_changes(
        _chg(spark, [(1, 1, 5_000_000, "a")]), ["cid"], "ts", "seq"
    )
    late = _chg(spark, [(1, 2, 4_000_000, "b")])  # before current valid_from
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_apply(hist, late, ["cid"], "ts", "seq")


def test_pit_join_equals_interval_containment(spark):
    """The as-of lowering must equal the textbook interval-containment
    join over a well-formed history — for every fact timestamp,
    including ones exactly on version boundaries (valid_from inclusive,
    valid_to exclusive)."""
    changes = _chg(spark, [
        (k, i * 10 + k, (i * 100 + k * 3) * 1_000_000, f"s{i}")
        for k in range(1, 5)
        for i in range(4)
    ])
    hist = historize_changes(changes, ["cid"], "ts", "seq")

    facts = spark.createDataFrame(
        [(j, j % 4 + 1, (j * 37 % 450) * 1_000_000) for j in range(200)],
        "fid long, cid long, t_us long",
    ).select("fid", "cid", F.timestamp_micros(F.col("t_us")).alias("ft"))

    from label_maker_dask_spark.operators.scd import pit_join

    a = sorted(map(tuple, pit_join(
        facts, hist, on=["cid"], fact_time="ft", tie_break="seq"
    ).select("fid", "cid", "seq", "segment").collect()))

    h, f = hist.alias("h"), facts.alias("f")
    contain = (
        f.join(
            h,
            (F.col("h.cid") == F.col("f.cid"))
            & (F.col("h.valid_from") <= F.col("f.ft"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("h.valid_to") > F.col("f.ft"))
            ),
        )
        .select("f.fid", "f.cid", "h.seq", "h.segment")
    )
    b = sorted(map(tuple, contain.collect()))
    assert a == b and len(a) > 100


def test_stream_scd2_equals_full_historize(spark, tmp_path):
    """The streaming SCD-2 sink drained over two micro-batches must
    produce exactly the full historization of the whole change log,
    and a restart with no new data must not disturb it."""
    import time as _time

    from label_maker_dask_spark.operators.scd import stream_scd2_to_parquet

    all_rows = [
        (k, i * 10 + k, (i * 50 + k) * 1_000_000, f"s{i % 3}")
        for k in range(1, 6)
        for i in range(4)
    ]
    b0 = [r for r in all_rows if r[1] // 10 < 2]
    b1 = [r for r in all_rows if r[1] // 10 >= 2]

    d = str(tmp_path / "chg")
    base = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ck")
    schema = "cid long, seq long, ts_us long, segment string"
    spark.createDataFrame(b0, schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    _time.sleep(1.1)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        ).select(
            "cid", "seq",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "segment",
        )
        q = stream_scd2_to_parquet(
            stream, base, ckpt, keys=["cid"], ts_col="ts", tie_break="seq"
        )
        q.awaitTermination(120)

    drain()
    full = historize_changes(_chg(spark, all_rows), ["cid"], "ts", "seq")
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(
        tuple, spark.read.parquet(base).select(*full.columns).collect()
    ))
    assert a == b and len(a) == len(all_rows)

    drain()  # restart, nothing new: history unchanged
    c = sorted(map(
        tuple, spark.read.parquet(base).select(*full.columns).collect()
    ))
    assert c == a


def test_stream_scd2_bucketed_equals_full_historize(spark, tmp_path):
    """SCD-2 over a BUCKETED history base (per-batch cost O(delta +
    touched buckets), never the whole history): three micro-batches
    drained through the bucket-pruned sink must equal the one-pass
    historization of the full change log; a restart with nothing new
    must not disturb it."""
    import time as _time

    from label_maker_dask_spark.operators.scd import (
        stream_scd2_to_parquet_bucketed,
    )
    from label_maker_dask_spark.streaming.bucketed import (
        read_maintained_table,
    )

    all_rows = [
        (k, i * 10 + k, (i * 50 + k) * 1_000_000, f"s{i % 3}")
        for k in range(1, 9)
        for i in range(6)
    ]
    batches = [
        [r for r in all_rows if r[1] // 10 in (0, 1)],
        [r for r in all_rows if r[1] // 10 in (2, 3)],
        [r for r in all_rows if r[1] // 10 in (4, 5)],
    ]
    d = str(tmp_path / "chg")
    base = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ck")
    schema = "cid long, seq long, ts_us long, segment string"
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(1.1)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        ).select(
            "cid", "seq",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "segment",
        )
        q = stream_scd2_to_parquet_bucketed(
            stream, base, ckpt, keys=["cid"], ts_col="ts",
            tie_break="seq", n_buckets=8,
        )
        q.awaitTermination(120)

    drain()
    full = historize_changes(_chg(spark, all_rows), ["cid"], "ts", "seq")
    a = sorted(map(tuple, full.collect()))
    got = read_maintained_table(spark, base).select(*full.columns)
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) == len(all_rows)

    drain()  # restart, nothing new
    c = sorted(map(
        tuple,
        read_maintained_table(spark, base).select(*full.columns).collect(),
    ))
    assert c == a


def test_scd2_bucketed_partial_crash_replay_exactly_once(spark, tmp_path):
    """Crash mid-batch on the bucketed SCD-2 base: some buckets swapped
    (marker advanced), one restored to its pre-batch state.  Replaying
    the SAME batch must re-historize ONLY the unswapped bucket —
    scd2_apply rejects already-applied changes loudly (they sit at or
    before the affected keys' current valid_from), so this drill proves
    the per-bucket markers keep the replay off the applied buckets
    entirely."""
    import os
    import shutil

    from label_maker_dask_spark.streaming.bucketed import (
        BUCKET_COL,
        _apply_bucketed,
        read_maintained_table,
    )
    from label_maker_dask_spark.operators.scd import scd2_apply

    base = str(tmp_path / "hist")
    schema = "k long, seq long, ts timestamp, v double"

    def merge_fn(b, dd):
        if b is None:
            return historize_changes(dd, ["k"], "ts", "seq")
        return scd2_apply(b, dd, ["k"], "ts", "seq")

    def apply(rows, batch_id):
        delta = spark.createDataFrame(rows, "k long, seq long, ts_us long, v double").select(
            "k", "seq", F.timestamp_micros(F.col("ts_us")).alias("ts"), "v"
        )
        _apply_bucketed(delta, base, ["k"], 8, batch_id, "run-a", merge_fn)

    apply([(k, 0, 1_000_000, 0.0) for k in range(16)], 0)
    victim = next(
        n for n in sorted(os.listdir(base)) if n.startswith(BUCKET_COL + "=")
    )
    saved = str(tmp_path / "savedbucket")
    shutil.copytree(os.path.join(base, victim), saved)
    batch1 = [(k, 1, 60_000_000, 1.0) for k in range(16)]
    apply(batch1, 1)
    shutil.rmtree(os.path.join(base, victim))
    shutil.copytree(saved, os.path.join(base, victim))

    apply(batch1, 1)  # replay after the "crash"
    hist = read_maintained_table(spark, base)
    per_key = {
        r["k"]: (r["n"], r["n_cur"])
        for r in hist.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        ).collect()
    }
    # exactly two versions per key, exactly one current — no key was
    # historized twice, none skipped
    assert per_key == {k: (2, 1) for k in range(16)}
