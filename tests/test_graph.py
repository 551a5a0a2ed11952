"""Graph/anomaly extensions: transition-graph construction, the quantized
PageRank replay contract, and trailing z-score flags on hand-built data."""

from pyspark.sql import functions as F

from label_maker_dask_spark.queries_graph_ext import (
    anomaly_zscore_daily_events,
    graph_event_transitions,
    graph_pagerank_transitions,
)

SF = "/root/testdata/sf0.001"


def test_transitions_probabilities_sum_to_one_per_src(spark):
    out = graph_event_transitions(spark, SF)
    sums = (
        out.groupBy("src").agg(F.round(F.sum("p"), 3).alias("s")).collect()
    )
    # per-edge probabilities are rounded to 6dp, so row sums land within
    # half an ulp-of-rounding per edge of exactly 1
    assert all(abs(r.s - 1.0) < 0.001 for r in sums)


def test_pagerank_partition_invariant_and_mass_conserving(spark):
    """The quantized-integer formulation must be bit-stable under any
    partitioning (the property the DuckDB hash-match certifies
    cross-engine), and total mass stays ~1: the graph built from
    consecutive per-user events gives every observed type out-edges, so
    only quantization dust (< 1e-6 per node per iteration) leaks."""
    a = sorted(map(tuple, graph_pagerank_transitions(spark, SF).collect()))
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = sorted(
            map(tuple, graph_pagerank_transitions(spark, SF).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert a == b
    total = sum(r[1] for r in a)
    assert abs(total - 1.0) < 1e-3
    assert all(r[1] > 0 for r in a)


def test_zscore_flags_known_spike(spark, tmp_path):
    """8 flat days then a spike: the spike's z against the trailing-7
    window is large and flagged; the flat days are not; the first 3 days
    have no score (n_prior < 3)."""
    import pandas as pd

    rows = []
    for d in range(1, 9):
        rows.append((d, f"2024-01-0{d}" if d < 10 else f"2024-01-{d}", 10.0 + (d % 3) * 0.5))
    rows.append((9, "2024-01-09", 500.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "day", "value"])
    pdf["ts"] = pd.to_datetime(pdf["day"]) + pd.Timedelta(hours=1)
    sf = str(tmp_path)
    spark.createDataFrame(pdf[["event_id", "ts", "value"]]).withColumn(
        "user_id", F.lit(1)
    ).withColumn("event_type", F.lit("x")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(f"{sf}/events.parquet")

    out = {
        str(r.day)[:10]: (r.zscore, r.is_anomaly)
        for r in anomaly_zscore_daily_events(spark, sf).collect()
    }
    assert out["2024-01-09"][1] == 1 and out["2024-01-09"][0] > 2
    assert all(
        flag == 0 for day, (_z, flag) in out.items() if day != "2024-01-09"
    )
    # first three days: window has < 3 samples -> unscored
    assert out["2024-01-01"][0] is None
    assert out["2024-01-03"][0] is None


def _plain_edges(ev):
    from label_maker_dask_spark.functions.timeutil import epoch_micros
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(epoch_micros("ts"), "event_id")
    return (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def test_chunked_edges_equal_plain_on_testdata(spark):
    from label_maker_dask_spark.queries import _t
    from label_maker_dask_spark.queries_graph_ext import (
        transition_edges_chunked,
    )

    ev = _t(spark, SF, "events")
    plain = {(r.src, r.dst): r.w for r in _plain_edges(ev).collect()}
    # a 1-second slice forces MANY boundary stitches — the hostile case
    chunked = {
        (r.src, r.dst): r.w
        for r in transition_edges_chunked(ev, chunk_seconds=1).collect()
    }
    assert plain == chunked and len(plain) > 0


def test_chunked_edges_equal_plain_on_skewed_user(spark):
    """One bot user owns ~20% of events (the straggler case the chunked
    build exists for); edge counts must be identical to the plain lag."""
    from label_maker_dask_spark.queries_graph_ext import (
        transition_edges_chunked,
    )

    n, bot = 5000, 1000
    rows = [(i, i % 37 + 2, i * 250_000, "abcde"[i % 5]) for i in range(n)]
    rows += [(n + j, 1, j * 333_000, "abcde"[j % 3]) for j in range(bot)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
    )
    plain = {(r.src, r.dst): r.w for r in _plain_edges(df).collect()}
    chunked = {
        (r.src, r.dst): r.w
        for r in transition_edges_chunked(df, chunk_seconds=30).collect()
    }
    assert plain == chunked
    # every user contributes (events - 1) adjacent pairs: 37 regular
    # users share the first n events, the bot owns the rest
    assert sum(plain.values()) == (n - 37) + (bot - 1)


# --- property: quantized PageRank vs a pure-Python reference ---------------
# The replay contract says every arithmetic step is engine-independent:
# scalar double expressions (IEEE, identical everywhere), HALF_UP rounds of
# shortest-repr decimals (Spark's BigDecimal.valueOf == Python repr()), and
# order-free integer sums.  A pure-Python replica must therefore match the
# distributed result EXACTLY, not approximately.

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _rnd_int(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _py_pagerank(rows, damp=0.85, scale=1e12, iters=3):
    """rows: (event_id, user_id, ts_micros, event_type)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, ts, et in rows:
        by_user[uid].append((ts, eid, et))
    edges = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            edges[(a, b)] += 1
    nodes = sorted({et for _, _, _, et in rows})
    n = len(nodes)
    wout = defaultdict(int)
    for (a, _b), w in edges.items():
        wout[a] += w
    r = {v: _rnd_int(scale / n) for v in nodes}
    base_lit = (1.0 - damp) * scale
    for _ in range(iters):
        contrib = defaultdict(int)
        for (a, b), w in edges.items():
            contrib[b] += _rnd_int(damp * r[a] * w / wout[a])
        r = {v: _rnd_int(base_lit / n) + contrib.get(v, 0) for v in nodes}
    return {
        v: float(
            Decimal(repr(r[v] / scale)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for v in nodes
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # user_id
            st.integers(min_value=0, max_value=50),         # ts step
            st.sampled_from(["a", "b", "c", "d"]),          # event_type
        ),
        min_size=2,
        max_size=40,
    )
)
def test_pagerank_matches_python_reference(spark, events):
    from pyspark.sql import functions as F

    from label_maker_dask_spark.queries_graph_ext import (
        pagerank_event_transitions,
    )

    rows = [
        (i, uid, ts * 1_000_000, et)
        for i, (uid, ts, et) in enumerate(events)
    ]
    # need at least one transition, else the graph is empty and every node
    # holds seed+base mass — still fine, the reference handles it the same
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
    )
    got = {
        r.event_type: r.pagerank
        for r in pagerank_event_transitions(df).collect()
    }
    want = _py_pagerank([(i, u, t, e) for i, u, t, e in rows])
    assert got == want


def test_mad_anomaly_resists_outlier_masking(spark, tmp_path):
    """Two spikes four days apart: the first inflates the mean/stddev
    window so the classical z-score misses the second (masking); the
    MAD score's medians don't budge, so BOTH spikes flag."""
    import pandas as pd

    from label_maker_dask_spark.queries_graph_ext import (
        anomaly_mad_daily_events,
    )

    rows = []
    # the second spike is large in MAD terms but sits inside the sigma
    # the FIRST spike inflated — the classical masking failure
    vals = {5: 900.0, 9: 300.0}
    for d in range(1, 15):
        # continuous base values: a discrete 10/11 alternation parks half
        # the window exactly on the median and degenerates MAD to 0
        rows.append((d, f"2024-01-{d:02d}", vals.get(d, 10.0 + (d % 7) * 0.37)))
    pdf = pd.DataFrame(rows, columns=["event_id", "day", "value"])
    pdf["ts"] = pd.to_datetime(pdf["day"]) + pd.Timedelta(hours=3)
    sf = str(tmp_path)
    spark.createDataFrame(pdf[["event_id", "ts", "value"]]).withColumn(
        "user_id", F.lit(1)
    ).withColumn("event_type", F.lit("x")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(f"{sf}/events.parquet")

    mad = {
        str(r.day)[:10]: (r.robust_z, r.is_anomaly)
        for r in anomaly_mad_daily_events(spark, sf).collect()
    }
    assert mad["2024-01-05"][1] == 1
    assert mad["2024-01-09"][1] == 1  # caught despite the earlier spike
    z = {
        str(r.day)[:10]: r.is_anomaly
        for r in __import__(
            "label_maker_dask_spark.queries_graph_ext",
            fromlist=["anomaly_zscore_daily_events"],
        ).anomaly_zscore_daily_events(spark, sf).collect()
    }
    assert z["2024-01-05"] == 1
    assert z["2024-01-09"] == 0  # the masking failure MAD exists to fix
    # ordinary days stay quiet under MAD
    quiet = [d for d, (_, f) in mad.items()
             if f == 1 and d not in ("2024-01-05", "2024-01-09")]
    assert quiet == []


def test_seasonal_dow_residual_flags_cohort_outlier(spark, tmp_path):
    """Four Mondays at ~10 plus one Monday at 500: the spike is anomalous
    against the leave-one-out stats of its day-of-week cohort (z in the
    hundreds — include-self stats would mask it at z = 1.79 < 2); the
    flat Mondays are not flagged (the spike inflates THEIR loo stddev);
    a cohort with < 4 samples gets no score."""
    import pandas as pd

    from label_maker_dask_spark.queries_graph_ext import (
        anomaly_seasonal_dow_residual,
    )

    mondays = ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22",
               "2024-01-29"]
    rows = []
    for i, day in enumerate(mondays):
        rows.append((i, day, 500.0 if i == 4 else 10.0 + i * 0.5))
    # one lone Tuesday cohort member -> n < 3, no score
    rows.append((9, "2024-01-02", 42.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "day", "value"])
    pdf["ts"] = pd.to_datetime(pdf["day"]) + pd.Timedelta(hours=3)
    sf = str(tmp_path)
    spark.createDataFrame(pdf[["event_id", "ts", "value"]]).withColumn(
        "user_id", F.lit(1)
    ).withColumn("event_type", F.lit("x")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(f"{sf}/events.parquet")

    out = {
        str(r.day)[:10]: r
        for r in anomaly_seasonal_dow_residual(spark, sf).collect()
    }
    assert out["2024-01-29"].is_anomaly == 1 and out["2024-01-29"].seasonal_z > 100
    assert all(
        out[d].is_anomaly == 0 for d in mondays[:4]
    )
    assert out["2024-01-02"].seasonal_z is None
    # dow convention: 0 = Sunday, so all Mondays are cohort 1
    assert all(out[d].dow == 1 for d in mondays)
    assert out["2024-01-02"].dow == 2
