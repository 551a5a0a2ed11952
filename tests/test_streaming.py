"""True Structured Streaming runs: the same operator functions used in the
batch/oracle queries, executed incrementally over a file stream with
watermarks, must agree with their batch results (SURVEY.md Part B)."""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.streaming.windows import (
    dedup_within_watermark,
    session_agg,
    tumbling_agg,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Materialize sf0.001 events as a micro-batched file stream source
    (nanos timestamps truncated to micros on write)."""
    import label_maker_dask_spark.queries as Q

    path = str(tmp_path_factory.mktemp("events_stream"))
    return path


@pytest.fixture()
def events_batch(spark, events_dir):
    import label_maker_dask_spark.queries as Q

    ev = Q._t(spark, "/root/testdata/sf0.001", "events")
    ev.coalesce(4).write.mode("overwrite").parquet(events_dir)
    return spark.read.parquet(events_dir)


def _run_stream(spark, events_dir, build, name):
    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = build(stream_in)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if out.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_equals_batch(spark, events_dir, events_batch):
    def build(df):
        return tumbling_agg(
            df, "ts", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total")],
            watermark="30 minutes",
        )

    got = _run_stream(spark, events_dir, build, "t_tumbling")
    expected = build(events_batch)
    a = sorted(map(tuple, got.select("window_start", "event_type", "n", "total").collect()))
    b = sorted(map(tuple, expected.select("window_start", "event_type", "n", "total").collect()))
    assert a == b and len(a) > 0


def test_streaming_session_window_equals_batch(spark, events_dir, events_batch):
    """Full equals-batch for session windows: the streamed state-store merge
    across micro-batches must reproduce the batch sessionization row for
    row — including the merged session_end and a value aggregate, not just
    session identity/count."""
    def build(df):
        return session_agg(
            df, "ts", "30 minutes", ["user_id"],
            [F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total")],
            watermark="1 hour",
        )

    cols = ["user_id", "session_start", "session_end", "n", "total"]
    got = _run_stream(spark, events_dir, build, "t_session")
    expected = build(events_batch)
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(map(tuple, expected.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_session_window_agrees_with_lag_sessionization(spark, events_batch):
    """The two sessionization formulations — native session_window (the
    streaming twin) and gaps-and-islands lag (the oracle-checked
    events_sessionize_30m path) — must carve identical sessions: same
    (user, session_start) set, same per-session event counts."""
    from label_maker_dask_spark.streaming.windows import sessionize_lag

    sw = session_agg(
        events_batch, "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n")],
    ).select("user_id", "session_start", "n")

    lag = (
        sessionize_lag(events_batch, "ts", "user_id", gap_minutes=30,
                       tie_break="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.count(F.lit(1)).alias("n"))
        .select("user_id", "session_start", "n")
    )
    a = sorted(map(tuple, sw.collect()))
    b = sorted(map(tuple, lag.collect()))
    assert a == b and len(a) > 0


def test_streaming_dedup_within_watermark(spark, events_dir, events_batch):
    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = dedup_within_watermark(stream_in, ["user_id"], "ts", "10 minutes")
    q = (
        out.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    # a key may legitimately re-emit after the watermark expires its state,
    # but within the run we must never exceed the batch-distinct count and
    # must cover every distinct key at least once
    n_keys = events_batch.select("user_id").distinct().count()
    emitted = got.select("user_id").distinct().count()
    assert emitted == n_keys
    assert got.count() >= n_keys


def test_batch_fallback_paths(spark, events_batch):
    # the same helpers run on batch frames (watermark is a no-op there)
    out = dedup_within_watermark(events_batch, ["user_id"], "ts")
    assert out.count() == events_batch.select("user_id").distinct().count()


def test_stateful_running_user_stats(spark, events_dir, events_batch):
    """applyInPandasWithState running totals: the final update per user must
    equal the batch aggregate (state accumulates across micro-batches)."""
    from label_maker_dask_spark.streaming.stateful import running_user_stats

    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = running_user_stats(stream_in)
    q = (
        out.writeStream.format("memory").queryName("t_stateful")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, micro-batch); the running count
    # is monotone, so the final state is the max-n row per user
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts)
        for r in spark.table("t_stateful")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .where("rn = 1")
        .collect()
    }
    expected = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts)
        for r in running_user_stats(events_batch).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_to_parquet_exactly_once(spark, events_dir, events_batch, tmp_path):
    """availableNow drain of the events file-stream into a parquet sink:
    rows match the batch read, and a second run over the same checkpoint
    writes nothing new (file-sink commit log = exactly-once)."""
    from label_maker_dask_spark.streaming.windows import stream_to_parquet

    stream = (
        spark.readStream.schema(events_batch.schema).parquet(events_dir)
    )
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_parquet(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == events_batch.count()
    # replay with the same checkpoint: no new data -> no duplicates
    q2 = stream_to_parquet(
        spark.readStream.schema(events_batch.schema).parquet(events_dir),
        out,
        ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == events_batch.count()


def test_streaming_sliding_equals_batch(spark, events_dir, events_batch):
    from label_maker_dask_spark.streaming.windows import sliding_agg

    def build(df):
        return sliding_agg(
            df, "ts", "1 hour", "30 minutes", ["event_type"],
            [F.count(F.lit(1)).alias("n")],
            watermark="1 hour",
        )

    got = _run_stream(spark, events_dir, build, "t_sliding")
    expected = build(events_batch)
    a = sorted(map(tuple, got.select("window_start", "event_type", "n").collect()))
    b = sorted(map(tuple, expected.select("window_start", "event_type", "n").collect()))
    assert a == b and len(a) > 0


def test_streaming_ohlc_equals_batch(spark, events_dir, events_batch):
    """OHLC candles computed incrementally over the stream (tumbling
    window + the same min/max-of-struct argmin aggregates) must equal the
    batch resample_ohlc rollup — the struct-min open/close state merges
    across micro-batches exactly like any other min/max state."""
    from label_maker_dask_spark.operators.timeseries import (
        ohlc_aggs,
        resample_ohlc,
    )

    def build(df):
        return tumbling_agg(
            df, "ts", "1 hour", ["event_type"],
            ohlc_aggs("ts", "value", tie_break="event_id"),
            watermark="30 minutes",
        )

    got = _run_stream(spark, events_dir, build, "t_ohlc")
    expected = resample_ohlc(
        events_batch, "ts", "value", ["event_type"], "hour",
        tie_break="event_id",
    )
    cols = ["event_type", "open", "high", "low", "close", "n"]
    a = sorted(
        map(tuple, got.select(F.col("window_start"), *cols).collect())
    )
    b = sorted(map(tuple, expected.select(F.col("bucket"), *cols).collect()))
    assert a == b and len(a) > 0


def test_sessionize_lag_microsecond_boundary(spark):
    """A gap of 1800.3s must split sessions (second-truncation would give
    1801-100=1701... or merge 1800.05s gaps the oracle splits)."""
    from label_maker_dask_spark.streaming.windows import sessionize_lag

    df = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:01:40.900"),
         (2, 7, "2024-01-01 00:31:41.200"),   # +1800.3s -> new session
         (3, 7, "2024-01-01 00:59:41.100")],  # +1679.9s -> same session
        "event_id long, user_id long, lts string",
    ).select("event_id", "user_id", F.col("lts").cast("timestamp").alias("ts"))
    got = {r["event_id"]: r["session_id"]
           for r in sessionize_lag(df, "ts", "user_id",
                                   tie_break="event_id").collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_streaming_interval_join_equals_batch(spark, events_dir, events_batch):
    """Stream-stream interval join: click-like events pair with the same
    user's later events inside a bounded window; the incremental join with
    two watermarked sides must reproduce the batch join row for row."""
    from label_maker_dask_spark.streaming.windows import interval_join

    def build(df):
        left = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        right = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        return interval_join(
            left, right, "ts", "ts", ["user_id"],
            lower="0 seconds", upper="30 minutes",
            left_watermark="1 hour", right_watermark="1 hour",
        )

    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        build(stream_in)
        .writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_interval_join")
    expected = build(events_batch)
    cols = ["user_id", "ts", "event_id", "r_ts", "r_event_id", "r_value"]
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(map(tuple, expected.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_streaming_left_outer_interval_join_equals_batch(
    spark, events_dir, events_batch
):
    """LEFT OUTER stream-stream interval join: clicks with no purchase
    inside the window must still emit (null-padded) — the outer side is
    the part watermarks exist for (a row can only be declared
    unmatched once the other side's watermark passes its bound).

    The equality target is watermark-exact, not naive: MATCHED rows
    emit on match and must all be present, but an UNMATCHED left row
    only emits once the global watermark (min of both sides' max event
    time, minus the delay) passes ``l.ts + upper`` — so unmatched rows
    inside that final horizon are legitimately withheld forever in a
    finite stream (here: the last click IS the left maximum, so its
    own null row can never emit).  The test computes the emittable set
    from the batch result + the watermark arithmetic and requires the
    stream to produce exactly it — which both pins Spark's semantics
    and documents the horizon callers must design for."""
    from label_maker_dask_spark.streaming.windows import interval_join

    def build(df):
        left = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        right = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        return interval_join(
            left, right, "ts", "ts", ["user_id"],
            lower="0 seconds", upper="10 minutes",
            left_watermark="1 hour", right_watermark="1 hour",
            how="left_outer",
        )

    stream_in = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    q = (
        build(stream_in)
        .writeStream.format("memory")
        .queryName("t_louter_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_louter_interval_join")
    expected = build(events_batch)
    cols = ["user_id", "ts", "event_id", "r_ts", "r_event_id", "r_value"]
    a = sorted(map(tuple, got.select(*cols).collect()), key=str)
    rows_b = expected.select(*cols).collect()

    import datetime

    wm_final = min(
        events_batch.where(F.col("event_type") == t)
        .agg(F.max("ts"))
        .collect()[0][0]
        for t in ("click", "purchase")
    ) - datetime.timedelta(hours=1)
    horizon = wm_final - datetime.timedelta(minutes=10)
    emittable = [
        t
        for t in map(tuple, rows_b)
        if t[3] is not None or t[1] < horizon
    ]
    b = sorted(emittable, key=str)
    assert a == b and len(a) > 0
    # the outer semantics are actually exercised both ways: some rows
    # are unmatched-and-emitted, and at least one sits past the horizon
    assert any(t[3] is None for t in a)
    assert len(emittable) < len(rows_b)


def test_stateful_transition_counts_equal_batch(spark, tmp_path):
    """Streaming transition deltas with per-user carry state: summing the
    per-batch (src, dst, w) deltas over two TIME-SPLIT micro-batches must
    equal the batch lag-window edge counts — including every transition
    that straddles the batch boundary, which a stateless per-batch lag
    would drop."""
    import time as _time

    import label_maker_dask_spark.queries as Q
    from label_maker_dask_spark.streaming.stateful import (
        streaming_transition_counts,
    )

    from label_maker_dask_spark.functions.timeutil import epoch_micros

    ev = Q._t(spark, "/root/testdata/sf0.001", "events")
    cut = ev.select(
        F.percentile(epoch_micros("ts"), F.lit(0.5)).alias("c")
    ).collect()[0].c
    d = str(tmp_path / "stream")
    ev.where(epoch_micros("ts") < cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    _time.sleep(1.1)  # distinct mtimes: the file source replays in order
    ev.where(epoch_micros("ts") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_transition_counts(stream_in)
        .writeStream.format("memory").queryName("t_transitions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.src, r.dst): r.total
        for r in spark.table("t_transitions")
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("total"))
        .collect()
    }
    batch = {
        (r.src, r.dst): r.w
        for r in streaming_transition_counts(ev).collect()
    }
    assert streamed == batch and len(streamed) > 0
    # the split genuinely crossed user histories: there must be at least
    # one user whose events span both halves (else the test proves nothing)
    spans = (
        ev.groupBy("user_id")
        .agg(
            F.min(epoch_micros("ts")).alias("lo"),
            F.max(epoch_micros("ts")).alias("hi"),
        )
        .where((F.col("lo") < cut) & (F.col("hi") >= cut))
        .count()
    )
    assert spans > 0


def test_sessionize_chunked_equals_plain_on_skewed_user(spark):
    """One bot user owns half the events: the chunked sessionizer (local
    sessions per time slice + per-user merge of slice summaries) must
    reproduce the plain gaps-and-islands output exactly — session
    ordinals, bounds, counts and value sums — while no task ever holds
    the bot's full timeline."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.streaming.windows import (
        sessionize_chunked_sessions,
        sessionize_lag,
    )

    rows = []
    # 40 regular users with gappy activity; slices (60s) « gaps sometimes
    for i in range(2000):
        uid = i % 40 + 2
        ts = i * 7_000_000 + (i % 5) * 90_000_000  # irregular, some >30s gaps
        rows.append((i, uid, ts, float(i % 13)))
    for j in range(2000):  # the bot: periodic bursts with session breaks
        ts = j * 11_000_000 + (j // 50) * 200_000_000
        rows.append((10_000 + j, 1, ts, 1.5))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "value",
    )

    plain = (
        sessionize_lag(df, "ts", "user_id", gap_minutes=1, tie_break="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(28,8)")).alias("v"),
        )
    )
    chunked = sessionize_chunked_sessions(
        df, "ts", "user_id", gap_minutes=1, tie_break="event_id",
        value_col="value", chunk_seconds=60,  # tiny slices: hostile case
    ).withColumnRenamed("session_value_dec", "v")

    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, chunked.select(*plain.columns).collect()))
    assert a == b and len(a) > 50


class _StubState:
    """Minimal GroupState stand-in for unit-testing stateful fold fns."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_transition_fold_vectorized_and_loop_paths_agree():
    """_transition_counts_fn routes groups >= 512 rows through the
    vectorized shift/value_counts path and small groups through the
    plain loop; both must produce identical (src, dst) delta counts and
    carry the same boundary state."""
    import pandas as pd

    from label_maker_dask_spark.streaming.stateful import (
        _transition_counts_fn,
    )

    types = ["view", "click", "purchase", "signup"]
    n = 1500  # >= 512: exercises the vectorized branch
    big = pd.DataFrame(
        {
            "ts": pd.to_datetime(range(n), unit="s", origin="2024-01-01"),
            "event_id": range(n),
            "event_type": [types[(i * i + 3 * i) % 4] for i in range(n)],
        }
    )

    def fold(pdf, prior):
        st = _StubState(prior)
        out = list(_transition_counts_fn((7,), iter([pdf]), st))
        pairs = {}
        if out:
            for r in out[0].itertuples(index=False):
                pairs[(r.src, r.dst)] = r.w
        return pairs, st.get

    vec_pairs, vec_state = fold(big, ("click",))
    # loop path: same rows in < 512-sized chunks through a fresh state,
    # accumulating deltas — the boundary chain makes the split invisible
    chunks = [big.iloc[i : i + 300] for i in range(0, n, 300)]
    loop_pairs: dict = {}
    st = _StubState(("click",))
    for ch in chunks:
        out = list(_transition_counts_fn((7,), iter([ch]), st))
        if out:
            for r in out[0].itertuples(index=False):
                loop_pairs[(r.src, r.dst)] = (
                    loop_pairs.get((r.src, r.dst), 0) + r.w
                )
    assert vec_pairs == loop_pairs
    assert vec_state == st.get
    assert sum(vec_pairs.values()) == n  # prior-state chain adds row 0


def test_transition_fold_multi_chunk_out_of_order_group():
    """applyInPandasWithState yields a big group as MULTIPLE Arrow
    chunks in post-shuffle (arbitrary) row order within one invocation.
    The fold must concat + sort the whole group ONCE: per-chunk sorting
    mis-chains transitions at every chunk boundary (the sf1 hot-key
    replay twin caught exactly this).  Feed one invocation three
    deliberately time-interleaved chunks and require the same result as
    the single-sorted-frame fold."""
    import pandas as pd

    from label_maker_dask_spark.streaming.stateful import (
        _transition_counts_fn,
    )

    types = ["view", "click", "purchase", "signup"]
    n = 1800  # vectorized regime; also > one simulated chunk
    whole = pd.DataFrame(
        {
            "ts": pd.to_datetime(range(n), unit="s", origin="2024-01-01"),
            "event_id": range(n),
            "event_type": [types[(5 * i + 1) % 4] for i in range(n)],
        }
    )

    def pairs_of(out):
        d = {}
        for frame in out:
            for r in frame.itertuples(index=False):
                d[(r.src, r.dst)] = d.get((r.src, r.dst), 0) + r.w
        return d

    st_ref = _StubState(("signup",))
    ref = pairs_of(
        list(_transition_counts_fn((1,), iter([whole]), st_ref))
    )

    # chunks interleave time: rows i % 3 == k land in chunk k, so every
    # chunk spans the full time range and per-chunk sorting would chain
    # chunk 0's last event into chunk 1's first — wrong globally
    chunks = [
        whole.iloc[k::3].reset_index(drop=True) for k in range(3)
    ]
    st = _StubState(("signup",))
    got = pairs_of(list(_transition_counts_fn((1,), iter(chunks), st)))
    assert got == ref
    assert st.get == st_ref.get
    assert sum(got.values()) == n


class _TimeoutStubState(_StubState):
    """_StubState + the EventTimeTimeout surface streaming_session_stats
    uses (hasTimedOut / setTimeoutTimestamp / remove)."""

    def __init__(self, value=None, timed_out=False):
        super().__init__(value)
        self._timed_out = timed_out
        self.timeout_ms = None

    @property
    def hasTimedOut(self):  # noqa: N802 (Spark API casing)
        return self._timed_out

    def setTimeoutTimestamp(self, ms):  # noqa: N802
        self.timeout_ms = ms

    def remove(self):
        self._v = None


def test_session_stats_fold_chunks_batches_and_timeout():
    """Drive the session fold through two 'micro-batches' (the second
    delivered as out-of-order chunks) plus a final timeout invocation,
    and require exactly the sessions plain gaps-and-islands yields on
    the combined timeline: within-batch split, cross-batch stitch, and
    the timeout-emitted final session."""
    import pandas as pd

    from label_maker_dask_spark.streaming.stateful import (
        streaming_session_stats,
    )

    # build the fold via a throwaway batch frame? No — reach the inner
    # fn the way the operator does: streaming_session_stats closes over
    # gap_minutes, so rebuild the closure by calling the factory's code
    # path directly on a stub "streaming" frame is not possible without
    # a real stream.  Instead import the factory and extract fn through
    # a tiny shim: the factory only uses df at the very end, so calling
    # it with a sentinel that records the fn is the cleanest hook.
    captured = {}

    class _Shim:
        isStreaming = True

        def groupBy(self, user_col):
            outer = self

            class _G:
                def applyInPandasWithState(self, fn, **kw):
                    captured["fn"] = fn
                    return outer

            return _G()

    streaming_session_stats(_Shim(), gap_minutes=30)
    fn = captured["fn"]

    base = pd.Timestamp("2024-03-01 00:00:00")
    mins = [0, 5, 50, 55, 120]          # batch 1: sessions {0,5} {50,55} {120...
    mins2 = [135, 130, 125, 300, 310]   # batch 2 (unsorted): ...125-135} {300,310}
    mk = lambda ms, ids: pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=m) for m in ms],
            "event_id": ids,
            "user_id": [7] * len(ms),
            "event_type": ["view"] * len(ms),
            "value": [100.0] * len(ms),
        }
    )
    st = _TimeoutStubState()
    out1 = list(fn((7,), iter([mk(mins, [1, 2, 3, 4, 5])]), st))
    # batch 2 as two interleaved chunks (arbitrary post-shuffle order)
    b2 = mk(mins2, [6, 7, 8, 9, 10])
    out2 = list(fn((7,), iter([b2.iloc[::2], b2.iloc[1::2]]), st))
    # final timeout invocation closes the open {300,310} session
    st2 = _TimeoutStubState(st.get, timed_out=True)
    out3 = list(fn((7,), iter([]), st2))
    assert st2.get is None  # state removed on timeout

    got = pd.concat(out1 + out2 + out3, ignore_index=True)
    got = got.sort_values("session_start").reset_index(drop=True)
    starts = [0, 50, 120, 300]
    ends = [5, 55, 135, 310]
    ns = [2, 2, 4, 2]
    assert [
        (base + pd.Timedelta(minutes=m)) for m in starts
    ] == list(got["session_start"])
    assert [
        (base + pd.Timedelta(minutes=m)) for m in ends
    ] == list(got["session_end"])
    assert ns == list(got["n_events"])
    assert [n * 100 for n in ns] == list(got["value_cents"])
    # the rearmed horizon tracks the open session's last event + gap
    assert st.timeout_ms is not None


def test_transition_fold_null_event_types_match_batch_semantics():
    """Null event_types: the batch twin filters null SRC only — a
    (x, null) transition still counts, and a null src suppresses the
    following pair.  Both fold paths (loop < 512, vectorized >= 512)
    must agree with that, carry None (not NaN) as state, and agree
    with each other."""
    import pandas as pd

    from label_maker_dask_spark.streaming.stateful import (
        _transition_counts_fn,
    )

    def run(n):
        # every 10th event_type is null; same pattern at both sizes
        ets = [None if i % 10 == 3 else f"t{i % 4}" for i in range(n)]
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(range(n), unit="s", origin="2024-01-01"),
                "event_id": range(n),
                "event_type": ets,
            }
        )
        st = _StubState(("t0",))
        out = list(_transition_counts_fn((1,), iter([pdf]), st))
        pairs = {}
        for fr in out:
            for r in fr.itertuples(index=False):
                pairs[(r.src, r.dst)] = pairs.get((r.src, r.dst), 0) + r.w
        # batch semantics: pairs = rows whose PREDECESSOR is non-null
        # (prior state chains row 0); dst may be null
        ref = {}
        prev = "t0"
        for et in ets:
            if prev is not None:
                ref[(prev, et)] = ref.get((prev, et), 0) + 1
            prev = et
        assert pairs == ref, f"n={n}"
        assert st.get == (prev,)  # None carried as None, never NaN
        assert all(
            d is None or isinstance(d, str) for (_, d) in pairs
        )

    run(100)   # loop path
    run(1500)  # vectorized path — dropna(subset) keeps (x, null) pairs


def test_resolve_tz_for_pandas_java_zone_ids():
    """Java's ZoneId accepts 'GMT+8'-family ids that pytz/zoneinfo
    reject; the resolver maps them to fixed offsets so the timeout
    arming never raises UnknownTimeZoneError, passes region ids and
    explicit offsets through, and fails FAST on garbage (operator
    build time, not mid-batch)."""
    from datetime import timedelta, timezone

    import pytest

    from label_maker_dask_spark.streaming.stateful import (
        _resolve_tz_for_pandas,
    )

    assert _resolve_tz_for_pandas("UTC") == "UTC"
    assert _resolve_tz_for_pandas("GMT+8") == timezone(timedelta(hours=8))
    assert _resolve_tz_for_pandas("UTC-5") == timezone(timedelta(hours=-5))
    assert _resolve_tz_for_pandas("UT+05:30") == timezone(
        timedelta(hours=5, minutes=30)
    )
    assert _resolve_tz_for_pandas("GMT-0230") == timezone(
        -timedelta(hours=2, minutes=30)
    )
    assert _resolve_tz_for_pandas("Asia/Tokyo") == "Asia/Tokyo"
    assert _resolve_tz_for_pandas("+09:00") == "+09:00"
    with pytest.raises(Exception):
        _resolve_tz_for_pandas("Not/AZone")
