"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md Part B — the engine's arbitrary-state surface; the reference has
no streaming at all, cf. SURVEY §1.4).

Scale posture: state is partitioned by the grouping key across the state
store (one entry per key, constant size), updates are Arrow-batched per
micro-batch, and processing-time timeouts bound state lifetime for keys
that go quiet.  Nothing here collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
_STATE_SCHEMA = "n long, total double, last_us long"


def _running_stats_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into (count, sum, max-ts)
    state and emit the updated running totals."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(df: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user running (count, sum(value), max(ts)), updated every
    micro-batch — the custom-stateful-operator surface.

    On a streaming frame this is ``applyInPandasWithState`` in update mode
    (one state row per user, Arrow-batched).  On a batch frame the same
    semantics are a plain hash aggregate, so the operator stays
    oracle-checkable."""
    if not df.isStreaming:
        return df.groupBy(F.col(user_col).alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    return df.groupBy(user_col).applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_SCHEMA = "src string, dst string, w long"
_TRANS_STATE_SCHEMA = "last_et string"


def _transition_counts_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Chain this micro-batch's events (sorted by (ts, event_id)) onto the
    user's REMEMBERED last event type and emit per-(src, dst) transition
    deltas.  The carried state is what a window ``lag`` cannot express on
    a stream: the boundary transition between two micro-batches.

    Chunking: ``applyInPandasWithState`` yields a LARGE group as
    MULTIPLE Arrow chunks, in post-shuffle row order — NOT time order —
    so the group must be concatenated and sorted ONCE before folding.
    Sorting each chunk independently mis-chains transitions at every
    chunk boundary (caught cross-engine by the sf1 hot-key replay twin,
    where the hot user's ~100k-row batch group spans 10+ chunks).  The
    concat holds one group's batch rows in memory — exactly the
    residency the per-group API already implies.

    Pair counting adapts to the group size: a wide group (a hot key)
    takes the vectorized shift + value_counts path so per-row Python
    work never dominates, while the typical small per-user group takes
    a plain loop — this function runs ONCE PER KEY per micro-batch, so
    for small groups the constant cost of building intermediate frames
    outweighs vectorization (measured: the always-vectorized form was
    ~1.5× slower end-to-end on a many-keys/small-groups corpus)."""
    from collections import Counter

    (last_et,) = state.get if state.exists else (None,)
    counts: Counter = Counter()
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        if len(pdf) >= 512:
            dst = pdf["event_type"].reset_index(drop=True)
            src = dst.shift()
            if last_et is not None:
                src.iloc[0] = last_et
            # drop null SRC only (mirrors the batch twin's WHERE src IS
            # NOT NULL and the loop path): a null DST still counts as a
            # (src, null) transition; dropna() over both columns would
            # silently lose those pairs above the 512-row threshold
            pairs = pd.DataFrame(
                {"s": src, "d": dst}
            ).dropna(subset=["s"])
            for (s, d), c in pairs.value_counts(dropna=False).items():
                counts[(s, None if pd.isna(d) else d)] += int(c)
            tail = dst.iloc[-1]
            last_et = None if pd.isna(tail) else tail
        else:
            for et in pdf["event_type"]:
                et = None if pd.isna(et) else et  # pandas nulls are NaN
                if last_et is not None:
                    counts[(last_et, et)] += 1
                last_et = et
    state.update((last_et,))
    if counts:
        srcs, dsts = zip(*counts.keys())
        yield pd.DataFrame(
            {"src": srcs, "dst": dsts, "w": list(counts.values())}
        )


def streaming_transition_counts(
    df: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Per-micro-batch event-type transition deltas with per-user carry
    state — the streaming edge-builder for the transition graph
    (``queries_graph_ext``): summing the emitted ``w`` deltas over all
    batches reproduces the batch lag-window edge counts EXACTLY,
    including transitions that straddle micro-batch boundaries (the case
    a stateless per-batch lag silently drops; equals-batch tested).

    Contract: the stream delivers each user's events in (ts, event_id)
    order across batches (true for replayed logs and ordered CDC feeds);
    within a batch the operator sorts, across batches it chains on the
    stored last event type — one tiny state row per user, the same
    posture as ``running_user_stats``.

    On a batch frame the same semantics are the lag-window edge count, so
    the operator stays oracle-checkable."""
    if not df.isStreaming:
        from pyspark.sql import Window

        from label_maker_dask_spark.functions.timeutil import epoch_micros

        w = Window.partitionBy(user_col).orderBy(
            epoch_micros("ts"), "event_id"
        )
        return (
            df.select(
                F.lag("event_type").over(w).alias("src"),
                F.col("event_type").alias("dst"),
            )
            .where(F.col("src").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
    return df.groupBy(user_col).applyInPandasWithState(
        _transition_counts_fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _resolve_tz_for_pandas(tz_name: str):
    """Map a Spark/Java session-timezone id to something pandas'
    ``tz_localize`` accepts: region ids and ``+08:00`` offsets pass
    through (validated eagerly so a bad id fails at operator build
    time, not mid-batch), and the ``GMT+8`` / ``UTC+8`` / ``UT-05:30``
    family — legal for Java's ZoneId but rejected by pytz/zoneinfo —
    becomes a fixed :class:`datetime.timezone` offset."""
    if tz_name in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        return tz_name
    import re as _re
    from datetime import timedelta as _td
    from datetime import timezone as _tz

    m = _re.fullmatch(
        r"(?:GMT|UTC|UT)([+-])(\d{1,2})(?::?(\d{2}))?", tz_name
    )
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return _tz(
            sign * _td(hours=int(m.group(2)), minutes=int(m.group(3) or 0))
        )
    pd.Timestamp(0, unit="us").tz_localize(
        tz_name, ambiguous=True, nonexistent="shift_forward"
    )
    return tz_name


SESSION_STATS_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_cents long"
)
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, cents long"


def streaming_session_stats(
    df: DataFrame, gap_minutes: int = 30, user_col: str = "user_id"
) -> DataFrame:
    """Custom stateful sessionizer with EVENT-TIME TIMEOUT — the one
    ``applyInPandasWithState`` capability the other operators here don't
    exercise: a session that goes quiet is closed by the STATE STORE
    (``GroupStateTimeout.EventTimeTimeout`` fires once the watermark
    passes ``last_ts + gap``), not by a later event arriving.  Sessions
    closed by a same-user event whose gap exceeds ``gap_minutes`` emit
    in that batch; the final open session per user emits when its
    timeout fires (or never, if the watermark never reaches its
    horizon — withheld state, the same convention as the left-outer
    interval join's null rows).

    ``value`` must be pre-quantized to integer-valued doubles (cents) by
    the caller: the pandas fold then adds exactly-representable
    integers, order-free and engine-independent (the module's
    integer-summation rule).  Expects ``event_id`` for deterministic
    within-timestamp ordering and a watermark already applied to ``ts``.

    Contract (same as ``streaming_transition_counts``): the stream
    delivers each user's events in ``(ts, event_id)`` order ACROSS
    micro-batches — true for replayed logs and ordered CDC feeds.
    Within a batch the fold sorts; across batches it extends the
    carried open session forward.  A cross-batch regression (an event
    older than the carried ``last_ts``, which the watermark alone does
    not forbid) has no well-defined gaps-and-islands answer
    incrementally — it could merge two already-emitted sessions — so
    ordered delivery is a precondition, not a recoverable case.

    On a batch frame the same semantics are plain gaps-and-islands
    sessionization, so the operator stays oracle-checkable.  Scale
    posture: one state row per user (the open session only), timeout
    eviction bounds state lifetime for keys that go quiet — the shape
    that holds a 100 TB clickstream's state to live-user cardinality."""
    gap_us = int(gap_minutes) * 60_000_000
    # Arrow hands the pandas fn NAIVE timestamps rendered in the SESSION
    # timezone, but setTimeoutTimestamp takes UTC epoch millis (Spark
    # compares it to the event-time watermark).  Capture the session tz
    # at build time so the fold can convert the naive micros back to
    # true UTC epoch before arming — without this the timeout is
    # shifted by the UTC offset under any non-UTC session timezone
    # (sessions close hours late, or negative offsets raise
    # INVALID_TIMEOUT_TIMESTAMP).
    try:
        tz_name = df.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
    except Exception:
        tz_name = "UTC"
    # Resolve the Spark/Java zone id AT BUILD TIME (fail fast on the
    # driver, never inside a micro-batch).  NOTE a precondition that
    # is pyarrow's, not ours: Java also accepts "GMT+8"-style ids, and
    # those crash the Arrow->pandas TIMESTAMP conversion inside
    # applyInPandasWithState itself (pyarrow's make_tz_aware calls
    # pytz.timezone on the session zone string) before any operator
    # code runs — so pandas-based stateful operators require a REGION
    # id ("Asia/Tokyo") or "+08:00" offset form session timezone.
    # This resolver maps the GMT±H family anyway for the one part we
    # control (the timeout arming), and validates region ids eagerly.
    tz_arg = _resolve_tz_for_pandas(tz_name)

    def _naive_us_to_utc_ms(naive_us: int) -> int:
        if tz_name in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            return naive_us // 1000
        ts = pd.Timestamp(naive_us, unit="us").tz_localize(
            # DST edges: resolve fall-back ambiguity to STANDARD time
            # (ambiguous=False = the LATER UTC instant), so the armed
            # horizon can only be late, never early — a late timeout
            # delays the final session's emission but never changes
            # emitted content, while an early one (the DST instant)
            # could close an open session that then receives in-gap
            # events, SPLITTING it.  Spring-forward gaps shift forward
            # for the same can-only-be-late reason.
            tz_arg, ambiguous=False, nonexistent="shift_forward"
        )
        return int(ts.value // 1_000_000)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit_all(sessions):
            # ONE frame per invocation — a per-session 1-row DataFrame
            # measured 5x slower on session-dense corpora
            starts, lasts, ns, cs = zip(*sessions)
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": pd.to_datetime(list(starts), unit="us"),
                    "session_end": pd.to_datetime(list(lasts), unit="us"),
                    "n_events": list(ns),
                    "value_cents": list(cs),
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield emit_all([(start_us, last_us, n, cents)])
            return
        # concat + sort ONCE: large groups arrive as multiple Arrow
        # chunks in post-shuffle order (see _transition_counts_fn)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        vals = pdf["value"].tolist()
        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us = None
        out = []
        for t, v in zip(ts_us, vals):
            if start_us is not None and t - last_us > gap_us:
                out.append((start_us, last_us, n, cents))
                start_us = None
            if start_us is None:
                start_us, last_us, n, cents = t, t, 1, int(v)
            else:
                last_us, n, cents = t, n + 1, cents + int(v)
        state.update((start_us, last_us, n, cents))
        # (re)arm the horizon: fire once the watermark passes the open
        # session's gap boundary (EventTimeTimeout takes UTC epoch
        # millis; last_us is session-tz-naive — convert first)
        state.setTimeoutTimestamp(
            _naive_us_to_utc_ms(last_us) + gap_us // 1000
        )
        if out:
            yield emit_all(out)

    if not df.isStreaming:
        from pyspark.sql import Window

        from label_maker_dask_spark.functions.timeutil import epoch_micros

        us = epoch_micros("ts")
        w = Window.partitionBy(user_col).orderBy(us, "event_id")
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (
            df.withColumn(
                "_new",
                F.when(
                    us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1)
                ).otherwise(F.lit(0)),
            )
            .withColumn("_sid", F.sum("_new").over(wrun))
            .groupBy(F.col(user_col).alias("user_id"), "_sid")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").cast("long").alias("value_cents"),
            )
            .drop("_sid")
        )
    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_STATS_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
