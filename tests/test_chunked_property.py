"""Property tests for the skew-tolerant chunked twins: on ARBITRARY event
layouts and slice widths, each chunked operator must equal its plain
formulation exactly — the example-based tests pin known shapes, these
search for boundary cases (events exactly on slice edges, single-event
slices, empty users, duplicate timestamps)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=120),    # seconds offset
        st.sampled_from(["a", "b", "c"]),           # event_type
    ),
    min_size=2,
    max_size=30,
)

_CHUNK = st.sampled_from([1, 7, 30])  # seconds; 1s maximizes boundaries


def _ev_df(spark, events):
    rows = [
        (i, uid, sec * 1_000_000, et)
        for i, (uid, sec, et) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("event_id") % 5).cast("double").alias("value"),
    )


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS, chunk=_CHUNK)
def test_chunked_edges_property(spark, events, chunk):
    from label_maker_dask_spark.functions.timeutil import epoch_micros
    from label_maker_dask_spark.queries_graph_ext import (
        transition_edges_chunked,
    )
    from pyspark.sql import Window

    df = _ev_df(spark, events)
    w = Window.partitionBy("user_id").orderBy(epoch_micros("ts"), "event_id")
    plain = {
        (r.src, r.dst): r.w
        for r in df.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    }
    chunked = {
        (r.src, r.dst): r.w
        for r in transition_edges_chunked(df, chunk_seconds=chunk).collect()
    }
    assert plain == chunked


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS, chunk=_CHUNK, gap=st.sampled_from([1, 2]))
def test_chunked_sessionize_property(spark, events, chunk, gap):
    from label_maker_dask_spark.streaming.windows import (
        sessionize_chunked_sessions,
        sessionize_lag,
    )

    df = _ev_df(spark, events)
    plain = sorted(
        map(
            tuple,
            sessionize_lag(
                df, "ts", "user_id", gap_minutes=gap, tie_break="event_id"
            )
            .groupBy("user_id", "session_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
            .collect(),
        )
    )
    chunked = sorted(
        map(
            tuple,
            sessionize_chunked_sessions(
                df, "ts", "user_id", gap_minutes=gap,
                tie_break="event_id", chunk_seconds=chunk,
            )
            .select(
                "user_id", "session_id", "n_events",
                "session_start", "session_end",
            )
            .collect(),
        )
    )
    assert plain == chunked


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 100)),
        min_size=1, max_size=15,
    ),
    rights=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 100)),
        min_size=1, max_size=15,
    ),
    chunk=_CHUNK,
)
def test_asof_merge_property(spark, lefts, rights, chunk):
    from label_maker_dask_spark.operators.asof import asof_join, asof_join_merge

    left = spark.createDataFrame(
        [(i, k, s * 1_000_000) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, t_us long",
    ).select("lid", "k", F.timestamp_micros(F.col("t_us")).alias("lt"))
    right = spark.createDataFrame(
        [(100 + j, k, s * 1_000_000) for j, (k, s) in enumerate(rights)],
        "rid long, k long, t_us long",
    ).select("rid", "k", F.timestamp_micros(F.col("t_us")).alias("rt"))

    a = sorted(map(tuple, asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        left_key=["lid"], tie_break="rid",
    ).select("lid", "k", "rid").collect()))
    b = sorted(map(tuple, asof_join_merge(
        left, right, on=["k"], left_time="lt", right_time="rt",
        tie_break="rid", chunk_seconds=chunk,
    ).select("lid", "k", "rid").collect()))
    assert a == b
