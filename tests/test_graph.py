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
