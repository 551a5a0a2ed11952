"""Event-time windowed aggregation operators.

Each operator is written against a plain DataFrame, so the same function
works on a batch frame (for the DuckDB correctness oracle) and on a
``readStream`` frame (Structured Streaming incrementalizes the identical
plan).  Watermarks are applied only when the input is streaming — on a batch
frame ``withWatermark`` is a no-op pass-through by Spark's own contract.

Scale posture: tumbling/sliding aggs shuffle on (window, key) — naturally
well-distributed; session windows use Spark's native ``session_window``
state merging; dedup-within-watermark bounds state by the watermark delay.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.timeutil import epoch_micros


def _maybe_watermark(df: DataFrame, ts_col: str, delay: Optional[str]) -> DataFrame:
    if delay and df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: Optional[str] = None,
) -> DataFrame:
    """Non-overlapping event-time windows; emits window start/end + keys."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: Optional[str] = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session (native ``session_window`` state store on streams)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming dedup with bounded state; on a batch frame falls
    back to plain dropDuplicates (same result set)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    keys: Sequence[str],
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    left_watermark: Optional[str] = None,
    right_watermark: Optional[str] = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: a left row pairs with the
    right rows sharing its ``keys`` whose ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]``.

    The batch twin of this shape is the catalog's range join
    (``join_range_orders_near_event``); this is the incremental form.
    Under streaming BOTH sides must carry watermarks — the time-range
    condition lets Spark expire a side's buffered state as soon as the
    other side's watermark passes its bound, so state is rate ×
    (watermark + interval width), never unbounded.  ``how`` may be
    "inner", "left_outer", "full_outer", or "left_semi" (the non-inner
    forms need the watermarks).

    Output columns are the left columns plus the right's ``right_ts`` and
    non-key remainder prefixed ``r_`` — a streaming sink needs
    collision-free names.  The semi form emits each matched left row
    exactly once with no right columns (the streaming EXISTS); the full
    outer form coalesces the join keys across sides so a right-null-side
    row still carries them."""
    l = _maybe_watermark(left, left_ts, left_watermark).alias("l")
    r = _maybe_watermark(right, right_ts, right_watermark).alias("r")
    cond = F.expr(
        " AND ".join(
            [f"l.{k} = r.{k}" for k in keys]
            + [
                f"r.{right_ts} >= l.{left_ts} + INTERVAL {lower}",
                f"r.{right_ts} <= l.{left_ts} + INTERVAL {upper}",
            ]
        )
    )
    joined = l.join(r, on=cond, how=how)
    if how == "left_semi":
        return joined.select(*[F.col(f"l.{c}") for c in left.columns])
    if how == "full_outer":
        keep = [
            F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
            if c in keys else F.col(f"l.{c}")
            for c in left.columns
        ]
    else:
        keep = [F.col(f"l.{c}") for c in left.columns]
    keep += [
        F.col(f"r.{c}").alias(f"r_{c}")
        for c in right.columns
        if c not in keys
    ]
    return joined.select(*keep)


def sessionize_lag(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    tie_break: str | None = None,
) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag + running count) —
    the window-function formulation used for oracle cross-checks; the
    streaming twin is :func:`session_agg`.

    Gaps compare at MICROSECOND precision (``epoch_micros``, matching the
    oracle's ``epoch_us`` arithmetic and tolerating TIMESTAMP_NTZ input) —
    casting timestamps to whole seconds would mis-classify boundary gaps
    like 1800.3s.  Pass ``tie_break`` (a unique column) so equal
    timestamps order deterministically."""
    from pyspark.sql import Window

    order = [ts_col] + ([tie_break] if tie_break else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = df.withColumn(
        "_new_session",
        F.when(
            epoch_micros(ts_col)
            - F.lag(epoch_micros(ts_col)).over(w)
            > gap_us,
            1,
        )
        .otherwise(0),
    )
    return with_flag.withColumn(
        "session_id",
        F.sum("_new_session").over(
            Window.partitionBy(user_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).drop("_new_session")


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
    available_now: bool = True,
):
    """Durable streaming sink: exactly-once parquet via the checkpointed
    file-sink commit log (re-running after failure never duplicates a
    batch's files).  ``available_now=True`` drains everything currently
    available then stops — the backfill/batch-replay mode; pass False for
    a continuously-running query the caller awaits.

    Scale posture: output files per batch follow the stage's partitioning;
    use ``partition_by`` for partition-pruned layouts and repartition
    upstream to bound file counts.  Returns the StreamingQuery."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_chunked_sessions(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    tie_break: str | None = None,
    value_col: str | None = None,
    chunk_seconds: int = 7200,
) -> DataFrame:
    """Skew-tolerant sessionization, aggregated to one row per session —
    identical output (including the per-user session-id ORDINALS) to
    aggregating :func:`sessionize_lag`, without any task owning a hot
    user's full timeline.

    Same two-level shape as the transition-graph chunked builder
    (``queries_graph_ext.transition_edges_chunked``):

    1. **within-slice** — gaps-and-islands over ``(user, time-slice)``:
       a plain session's events inside one slice are a contiguous
       no-gap run, so they form exactly one local session; the hot
       user's events spread over as many tasks as slices they span;
    2. **across-slice** — local sessions collapse to ONE summary row
       each (count, start/end, mergeable decimal value sum); a per-user
       window over those summaries re-runs gaps-and-islands on
       (start, previous end) and merges boundary-crossing sessions.
       Summary rows per user ≈ sessions + occupied slices — even a
       continuously-active bot contributes ~timespan/chunk rows, not
       #events.

    Correctness does not depend on ``chunk_seconds`` vs the gap (only
    efficiency does); merge ordinals equal the plain formulation's
    because local-session start times are strictly increasing per user.
    ``value_col`` adds an exact ``decimal(28,8)`` session sum
    (mergeable across slices; round/cast at the call site).  Equality
    with the plain build is tested on skewed data in
    tests/test_streaming.py; the catalog twin hash-matches the same
    oracle as ``events_sessionize_30m``."""
    from pyspark.sql import Window

    reserved = {"_us", "_slice", "_new", "_lsid", "_n", "_start_us",
                "_end_us", "_val", "_chain_new", "session_id"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"sessionize_chunked_sessions reserves column names "
            f"{sorted(clash)}; rename the clashing input columns"
        )
    gap_us = gap_minutes * 60 * 1_000_000
    chunk_us = int(chunk_seconds) * 1_000_000
    us = epoch_micros(ts_col)
    e = df.withColumn("_us", us).withColumn(
        "_slice", F.floor(F.col("_us") / F.lit(chunk_us))
    )
    order = ["_us"] + ([tie_break] if tie_break else [])
    w1 = Window.partitionBy(user_col, "_slice").orderBy(*order)
    flagged = e.withColumn(
        "_new",
        F.when(F.col("_us") - F.lag("_us").over(w1) > gap_us, 1).otherwise(0),
    ).withColumn(
        "_lsid",
        F.sum("_new").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
    )
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.min("_us").alias("_start_us"),
        F.max("_us").alias("_end_us"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(28,8)")).alias("_val")
        )
    local = flagged.groupBy(user_col, "_slice", "_lsid").agg(*aggs)

    # start times of a user's local sessions are strictly increasing
    # (within a slice they are >gap apart; across slices they live in
    # disjoint time ranges), so this order is total and matches the
    # event-order the plain formulation numbers sessions in
    w2 = Window.partitionBy(user_col).orderBy("_start_us")
    chained = local.withColumn(
        "_chain_new",
        F.when(
            F.col("_start_us") - F.lag("_end_us").over(w2) > gap_us, 1
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("_chain_new").over(
            w2.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out_aggs = [
        F.sum("_n").alias("n_events"),
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
    ]
    if value_col is not None:
        out_aggs.append(F.sum("_val").alias("session_value_dec"))
    return chained.groupBy(user_col, "session_id").agg(*out_aggs)
