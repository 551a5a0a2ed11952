"""Unit tests for the round-7 scale-technique extensions
(queries_scale_ext.py): k-hop BFS on a known graph, interpolation
arithmetic on a hand-checked series, and the profiler's one-scan shape.
(The catalog-level oracle equivalence for all four queries is covered by
tools/check_oracle.py / the driver gate.)
"""

from pyspark.sql import functions as F

from label_maker_dask_spark.queries_scale_ext import khop_reachability


def test_khop_known_graph(spark):
    # a -> b -> c -> d, plus a -> c shortcut and a d -> a back-edge
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a")],
        "src: string, dst: string",
    )
    got = {
        r["dst"]: (r["min_hops"], r["n_paths"])
        for r in khop_reachability(edges, "a", max_hops=3).collect()
    }
    # paths from a within 3 hops:
    #  b: [a-b] -> (1, 1)
    #  c: [a-c], [a-b-c] -> (1, 2)
    #  d: [a-c-d], [a-b-c-d] -> (2, 2)
    #  a: [a-c-d-a] -> (3, 1)
    assert got == {"b": (1, 1), "c": (1, 2), "d": (2, 2), "a": (3, 1)}


def test_khop_unreachable_and_empty_frontier(spark):
    edges = spark.createDataFrame(
        [("x", "y")], "src: string, dst: string"
    )
    assert khop_reachability(edges, "zzz", max_hops=3).count() == 0


def test_interpolation_arithmetic(spark, tmp_path):
    # hand-checkable series: observations at day 0 (100.00) and day 4
    # (500.00); gap days must interpolate to 200, 300, 400 (in cents:
    # 10000 .. 50000 stepping 10000)
    import datetime

    rows = [
        (1, 1, "O", 450001.0 + 0.0, datetime.datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 450001.0 + 400.0, datetime.datetime(2024, 1, 5), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
        "o_totalprice: double, o_orderdate: timestamp, "
        "o_orderpriority: string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/orders.parquet")
    from label_maker_dask_spark.queries_scale_ext import (
        timeseries_gapfill_interpolated,
    )

    out = {
        r["day"].day: (r["revenue_interp_cents"], r["observed"])
        for r in timeseries_gapfill_interpolated(spark, sf_dir).collect()
    }
    lo = 45000100
    hi = 45040100
    step = (hi - lo) // 4
    assert out[1] == (lo, 1)
    assert out[5] == (hi, 1)
    assert out[2] == (lo + step, 0)
    assert out[3] == (lo + 2 * step, 0)
    assert out[4] == (lo + 3 * step, 0)


def test_profiler_two_codegen_passes(spark):
    """The profiler pays exactly THREE column-pruned scans of the table
    (stats aggregation; numeric-column KMV hashes; string-column raw
    distinct) — never one per column; each column is read once by the
    stats scan and once more by exactly one KMV scan, ~two full scans
    of column IO total — with every pass in codegen: no
    Expand+SortAggregate multi-distinct
    rewrite, and no ObjectHashAggregate (the rejected shared-scan
    collect_set shape dragged every aggregate into interpreted object
    mode; see the query docstring's measurements)."""
    from label_maker_dask_spark.queries_scale_ext import profile_orders_columns

    df = profile_orders_columns(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 3, plan
    # the string-NDV scan prunes to ONLY the two string columns
    assert "ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>" in plan, plan
    assert "Expand" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    rows = {r["col_name"]: r for r in df.collect()}
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    r = rows["o_orderkey"]
    assert r["n_rows"] == r["n_nonnull"]
    # orderkey is unique: the KMV estimate must land within ~4/sqrt(k)
    assert abs(r["n_distinct_kmv"] / r["n_rows"] - 1.0) < 0.25
    # low-cardinality columns are exact (below k=256 distinct values)
    assert rows["o_orderstatus"]["n_distinct_kmv"] == 3.0
    assert rows["o_orderstatus"]["mean_value"] is None


def test_profiler_all_null_column_still_profiles(spark, tmp_path):
    """A column whose values are ALL NULL must keep its row (n_nonnull
    0, NULL min/max/mean, ndv 0.0) — in both the Spark plan and the
    DuckDB oracle (left join + coalesce), so the one-row-per-column
    contract survives degenerate data."""
    import duckdb

    from label_maker_dask_spark.queries_scale_ext import (
        _profile_oracle,
        profile_orders_columns,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    nulled = base.withColumn(
        "o_orderpriority", F.lit(None).cast("string")
    )
    nulled.write.parquet(str(tmp_path / "orders.parquet"))
    rows = {
        r["col_name"]: r
        for r in profile_orders_columns(spark, str(tmp_path)).collect()
    }
    r = rows["o_orderpriority"]
    assert r["n_nonnull"] == 0
    assert r["n_distinct_kmv"] == 0.0
    assert r["min_value"] is None and r["max_value"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * REPLACE (CAST(NULL AS VARCHAR) "
        "AS o_orderpriority) FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    odf = con.execute(_profile_oracle()).df().set_index("col_name")
    assert len(odf) == 6
    assert odf.loc["o_orderpriority", "n_distinct_kmv"] == 0.0


def test_hll_weekly_rollup_accuracy_and_losslessness(spark):
    """The merged-daily-sketch weekly estimate must (a) equal the
    direct weekly-sketch estimate (union is lossless) and (b) sit
    within the default HLL error band (~2.3% at lgK=12; allow 5%) of
    the exact distinct count."""
    from label_maker_dask_spark.queries import _t
    from label_maker_dask_spark.queries_scale_ext import (
        agg_hll_sketch_weekly_users,
    )

    sf = "/root/testdata/sf0.01"
    # the catalog entry now emits the bound verdict instead of the raw
    # estimate (so the driver's oracle can hash-gate it); every week
    # must clear its own 3-RSE envelope, and the raw merged estimate is
    # recomputed here for the losslessness check
    gated = agg_hll_sketch_weekly_users(spark, sf).collect()
    assert gated and all(r["hll_within_3rse"] for r in gated)
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = {
        r["week"]: r["est"]
        for r in daily.groupBy(F.date_trunc("week", "day").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    direct = {
        r["week"]: r["est"]
        for r in ev.groupBy(
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct  # lossless union
    for wk, n in exact.items():
        assert abs(merged[wk] - n) / max(n, 1) < 0.05


def test_distributed_ntile_equals_window_ntile(spark):
    """The distributed exact ntile (range repartition + offset ranks +
    closed-form buckets) must equal the single-window ntile for every
    bucket count and ordering direction, including remainders and
    duplicate sort values broken by a unique key."""
    from pyspark.sql import Window

    from label_maker_dask_spark.operators.rank import distributed_ntile

    rows = [(i, (i * 7919) % 50, float((i * 31) % 13)) for i in range(997)]
    df = spark.createDataFrame(rows, "id long, a long, v double")
    for n, order in [
        (16, ["v", "a", "id"]),
        (5, [F.desc("a"), F.asc("id")]),
        (7, ["a", "id"]),
        (1000, ["id"]),  # more buckets than... exactly near row count
    ]:
        w_order = order
        want = {
            r["id"]: r["b"]
            for r in df.select(
                "id", F.ntile(n).over(Window.orderBy(*w_order)).alias("b")
            ).collect()
        }
        got = {
            r["id"]: r["bucket"]
            for r in distributed_ntile(df, n, order).collect()
        }
        assert got == want, (n, order)


def test_global_cumsum_equals_window_form_and_avoids_single_task(spark):
    """with_global_cumsum must equal the unpartitioned-window prefix sum
    exactly (including duplicate order keys broken by the tiebreaker)
    and must plan a RANGE repartition, never a single-task global
    window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.rank import with_global_cumsum

    rows = [(i, (i * 7) % 5, (i * 13) % 9 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key long, v long")
    got = {
        r.id: r.cs
        for r in with_global_cumsum(
            df, [F.desc("key"), F.asc("id")], "v", cumsum_col="cs"
        ).collect()
    }
    w = W.orderBy(F.desc("key"), F.asc("id")).rowsBetween(
        W.unboundedPreceding, 0
    )
    want = {
        r.id: r.cs
        for r in df.withColumn("cs", F.sum("v").over(w)).collect()
    }
    assert got == want

    plan_df = with_global_cumsum(
        df, [F.desc("key"), F.asc("id")], "v", cumsum_col="cs"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    # the range exchange itself is hidden behind the materialize
    # (lineage-truncating localCheckpoint — same as with_global_rank);
    # what must be visible is that every window spec involves _pid —
    # either partitioned by it (the bounded per-row cumsum) or ordered
    # over it (the partition-count offsets window).  A regression back
    # to an unpartitioned Window.orderBy(key, id) (the single-task
    # 13x shape) would produce a spec WITHOUT _pid and fail here.
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition" in line
    ]
    assert specs, "expected window specs in the plan"
    assert all("_pid" in line for line in specs), specs


def test_global_cumsum_reserved_columns_raise(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.rank import with_global_cumsum

    df = spark.createDataFrame([(1, 2)], "id long, _pid long")
    with _pytest.raises(ValueError, match="reserves column names"):
        with_global_cumsum(df, [F.asc("id")], "id")


def test_global_cumsum_null_values_count_as_zero(spark):
    """NULLs in value_col count as 0 (the documented contract): the
    running total carries through NULL rows instead of going NULL."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.rank import with_global_cumsum

    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 7)], "id long, v long"
    )
    got = {
        r.id: r.cs
        for r in with_global_cumsum(df, [F.asc("id")], "v",
                                    cumsum_col="cs").collect()
    }
    assert got == {1: 0, 2: 5, 3: 5, 4: 12}
