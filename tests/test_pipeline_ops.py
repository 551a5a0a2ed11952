"""Training-data pipeline operators (SURVEY §2.B extensions): hash splits,
stratified sampling, PII scan/redaction, contamination, repetition, and
duplicate-component resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.dedup import (
    doc_shingles,
    duplicate_components,
)
from label_maker_dask_spark.operators.pipeline import (
    contamination_overlap,
    hash_split,
    pii_scan,
    redact_pii,
    repetition_scores,
    stratified_sample_hash,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i} body word{i % 7} word{i % 3}", "en" if i % 2 else "de")
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_split_deterministic_and_partitioned(docs):
    a = hash_split(docs).select("doc_id", "split").collect()
    b = hash_split(docs).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r["split"]: r["n"] for r in
              hash_split(docs).groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 200
    # roughly 80/10/10 — generous bounds for a 200-row sample
    assert counts["train"] > 120


def test_stratified_sample_deterministic_per_stratum(docs):
    s1 = {r["doc_id"] for r in stratified_sample_hash(docs, "lang", pct=30).collect()}
    s2 = {r["doc_id"] for r in stratified_sample_hash(docs, "lang", pct=30).collect()}
    assert s1 == s2
    assert 0 < len(s1) < 200
    # widening pct only adds rows (hash thresholding is monotone)
    s3 = {r["doc_id"] for r in stratified_sample_hash(docs, "lang", pct=60).collect()}
    assert s1 <= s3


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or x@y.io thanks"),
            (2, "call +1 555 0100 999 today"),
            (3, "see https://example.com/p?q=1 and http://a.b/c"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (got[1]["n_emails"], got[1]["has_pii"]) == (2, True)
    assert (got[2]["n_phones"], got[2]["has_pii"]) == (1, True)
    assert (got[3]["n_urls"], got[3]["has_pii"]) == (2, True)
    assert (got[4]["has_pii"], got[4]["n_emails"]) == (False, 0)
    red = df.select("doc_id", redact_pii(F.col("text")).alias("t")).collect()
    red = {r["doc_id"]: r["t"] for r in red}
    assert red[1] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert red[2] == "call <PHONE> today"
    assert red[3].count("<URL>") == 2
    assert red[4] == "clean text with no pii at all"


def test_contamination_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # shares 'alpha beta gamma' w/ bench
            (2, "one two three four five"),      # no overlap
            (3, "alpha beta gamma epsilon"),     # shares with bench too
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "zzz alpha beta gamma yyy xxx www")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bench_matched"], r["n_shared_shingles"])
        for r in contamination_overlap(
            doc_shingles(corpus), doc_shingles(bench)
        ).collect()
    }
    assert got == {1: (1, 1), 3: (1, 1)}  # doc 2 absent: no shared 3-gram


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),  # highly repetitive
            (2, "all words here are fully distinct tokens"),
            (3, "single"),                                # <2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert set(got) == {1, 2}
    # doc1 bigrams: 7 total, 2 distinct ('spam ham' x4, 'ham spam' x3)
    assert got[1]["max_bigram_count"] == 4
    assert got[1]["distinct_bigram_ratio"] == pytest.approx(2 / 7, abs=1e-6)
    assert got[2]["distinct_bigram_ratio"] == 1.0
    assert got[2]["max_bigram_count"] == 1


def test_duplicate_components_resolves_groups(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: (r["component"], r["component_size"])
           for r in duplicate_components(pairs).collect()}
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 2), 11: (10, 2),
        20: (20, 3), 21: (20, 3), 22: (20, 3),
    }


def test_duplicate_components_long_chain_converges(spark):
    # a 12-node path graph needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = duplicate_components(pairs).collect()
    assert all(r["component"] == 0 and r["component_size"] == 13 for r in got)
    assert len(got) == 13


def test_duplicate_components_matches_union_find(spark):
    """Batched 2-step propagation vs a driver-side union-find reference
    on a deterministic pseudo-random graph (stars, cliques, paths, and
    isolated pairs mixed)."""
    edges = []
    for i in range(60):  # hash-derived pseudo-random pairs, no rand()
        a = (i * 7919) % 97
        b = (i * 6271 + 13) % 97
        if a != b:
            edges.append((min(a, b), max(a, b)))
    edges += [(200 + i, 201 + i) for i in range(15)]  # a 16-node path
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = {x: find(x) for x in parent}
    from collections import Counter

    want_sizes = Counter(want_comp.values())
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # both paths must match the reference: the one-task union-find fast
    # path (default here — the graph is tiny) and the distributed
    # pointer-doubling loop (forced with small_graph_edges=0)
    for kw in ({}, {"small_graph_edges": 0}):
        got = duplicate_components(pairs, **kw).collect()
        assert {r["doc_id"]: r["component"] for r in got} == want_comp
        assert all(
            r["component_size"] == want_sizes[r["component"]] for r in got
        )


def test_duplicate_components_raises_past_max_iter(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_components(pairs, max_iter=4, small_graph_edges=0)


def test_pack_sequences_layout_invariants(spark):
    from label_maker_dask_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * (10 + i % 13)) for i in range(300)],
        "doc_id long, text string",
    )
    from label_maker_dask_spark.functions.text import tokens

    packed = pack_sequences(df, F.size(tokens(F.col("text"))), seq_len=64,
                            n_buckets=8).collect()
    assert len(packed) == 300
    # within a bucket, offsets are contiguous head-to-tail in doc_id order
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_offset"] == off
            assert r["pack_id"] == off // 64
            off += r["n_tok"]
    # deterministic across invocations
    again = pack_sequences(df, F.size(tokens(F.col("text"))), seq_len=64,
                           n_buckets=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, packed))


def test_kmv_distinct_is_exact_below_k_and_close_above(spark):
    from label_maker_dask_spark.operators.pipeline import kmv_distinct

    rows = [("small", f"u{i % 7}") for i in range(100)]
    rows += [("big", f"u{i % 500}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, user string")
    got = {r["grp"]: r["approx_distinct"]
           for r in kmv_distinct(df, "user", ["grp"], k=64).collect()}
    assert got["small"] == 7.0  # below k: exact
    assert abs(got["big"] - 500) / 500 < 0.35  # ~1/sqrt(64) error regime


def test_hash_unit_uniform_and_weighted_sample_rate(spark):
    """hash_unit must be uniform enough that weighted_sample's keep rate
    tracks the weight (the whole point of hash-thresholded sampling)."""
    from label_maker_dask_spark.operators.pipeline import (
        hash_unit,
        weighted_sample,
    )

    df = spark.range(0, 2000).select(F.col("id"))
    units = df.select(hash_unit(F.col("id")).alias("u"))
    stats = units.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")
    ).first()
    assert 0.0 <= stats.lo and stats.hi < 1.0
    assert abs(stats.m - 0.5) < 0.03
    kept = weighted_sample(df, F.col("id"), F.lit(0.3)).count()
    assert abs(kept / 2000 - 0.3) < 0.04
    # deterministic: same input -> identical sample
    a = weighted_sample(df, F.col("id"), F.lit(0.3)).collect()
    b = weighted_sample(df, F.col("id"), F.lit(0.3)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_merge_equals_direct_sketch(spark):
    """KMV mergeability is lossless: weekly estimates assembled from
    per-day bottom-k sketches must EQUAL the direct weekly sketch — not
    approximately, exactly (bottom-k of unioned bottom-k's is bottom-k of
    the union)."""
    from label_maker_dask_spark.operators.pipeline import (
        kmv_distinct,
        kmv_distinct_merged,
    )

    rows = [
        (f"w{i % 3}", f"d{i % 11}", f"u{(i * 7) % 400}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "week string, day string, user string")
    direct = sorted(
        map(tuple, kmv_distinct(df, "user", ["week"], k=32).collect())
    )
    merged = sorted(
        map(
            tuple,
            kmv_distinct_merged(df, "user", ["week"], ["day"], k=32).collect(),
        )
    )
    assert merged == direct and len(direct) == 3


def test_asof_join_tolerance_bounds_lookback(spark):
    from label_maker_dask_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2020-01-10"), (2, "2020-03-01")], "id long, lts string"
    ).select("id", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(10, "2020-01-01"), (11, "2020-01-08")], "rid long, rts string"
    ).select("rid", F.col("rts").cast("timestamp").alias("rts"), F.lit(1).alias("k"))
    left = left.withColumn("k", F.lit(1))
    unbounded = asof_join(left, right, on=["k"], left_time="lts",
                          right_time="rts", left_key=["id"], tie_break="rid")
    got = {r["id"]: r["rid"] for r in unbounded.collect()}
    assert got == {1: 11, 2: 11}
    bounded = asof_join(left, right, on=["k"], left_time="lts",
                        right_time="rts", left_key=["id"], tie_break="rid",
                        tolerance="INTERVAL 10 DAY")
    got = {r["id"]: r["rid"] for r in bounded.collect()}
    assert got == {1: 11}  # row 2's latest match is 53 days old: dropped


def test_asof_join_nearest_accepts_date_columns(spark):
    """direction='nearest' on DATE-typed time columns: dates can't cast
    to double (backward/forward accepted them fine while nearest raised
    an AnalysisException) — they route through the timestamp/epoch-
    micros branch instead."""
    from label_maker_dask_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2020-01-10"), (2, "2020-02-01")], "id long, ld string"
    ).select("id", F.col("ld").cast("date").alias("ld"), F.lit(1).alias("k"))
    right = spark.createDataFrame(
        [(10, "2020-01-01"), (11, "2020-01-13"), (12, "2020-02-03")],
        "rid long, rd string",
    ).select(
        "rid", F.col("rd").cast("date").alias("rd"), F.lit(1).alias("k")
    )
    got = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_time="ld", right_time="rd",
            left_key=["id"], tie_break="rid", direction="nearest",
            tolerance="INTERVAL 30 DAY",
        ).collect()
    }
    # id 1: |Jan10-Jan13|=3d beats |Jan10-Jan01|=9d; id 2: Feb03 (2d)
    assert got == {1: 11, 2: 12}


def test_sampled_percentiles_exact_below_k_and_close_above(spark):
    from label_maker_dask_spark.operators.pipeline import sampled_percentiles

    rows = [("small", i, float(i)) for i in range(9)] + [
        ("big", 100 + i, float(i % 1000)) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    got = {
        r["grp"]: r
        for r in sampled_percentiles(
            df, "v", ["grp"], "id", ps=(0.5, 0.9), k=64
        ).collect()
    }
    # below k the "sample" is the whole group: exact interpolated quantiles
    assert got["small"]["n_sampled"] == 9
    assert got["small"]["p5"] == 4.0 and got["small"]["p9"] == 7.2
    # above k: uniform-sample estimate lands in the right regime
    assert got["big"]["n_sampled"] == 64
    assert abs(got["big"]["p5"] - 499.5) < 150
    # deterministic: a second run returns identical values
    again = {
        r["grp"]: r
        for r in sampled_percentiles(
            df, "v", ["grp"], "id", ps=(0.5, 0.9), k=64
        ).collect()
    }
    assert again == got


def test_asof_merge_equals_range_join_incl_tolerance_and_skew(spark):
    """The merge-style as-of (union + carry, O(L+R) per key) must equal
    the range-join formulation row for row — plain, chunked, and with a
    lookback tolerance — including under a hot key owning most rows."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.asof import asof_join, asof_join_merge

    lrows = []
    rrows = []
    # hot key 1: 800 left rows, 200 right rows; keys 2..20 light
    for i in range(800):
        lrows.append((i, 1, i * 40_000_000))
    for j in range(200):
        rrows.append((10_000 + j, 1, j * 150_000_000 + 7))
    for k in range(2, 21):
        for i in range(10):
            lrows.append((k * 1000 + i, k, i * 500_000_000 + k))
        for j in range(4):
            rrows.append((20_000 + k * 10 + j, k, j * 900_000_000 + k))
    left = spark.createDataFrame(
        lrows, "lid long, k long, t_us long"
    ).select("lid", "k", F.timestamp_micros(F.col("t_us")).alias("lt"))
    right = spark.createDataFrame(
        rrows, "rid long, k long, t_us long"
    ).select("rid", "k", F.timestamp_micros(F.col("t_us")).alias("rt"))

    for tol in (None, "INTERVAL 90 SECOND"):
        a = sorted(map(tuple, asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            left_key=["lid"], tie_break="rid", tolerance=tol,
        ).select("lid", "k", "lt", "rid", "rt").collect()))
        for chunk in (None, 60):
            b = sorted(map(tuple, asof_join_merge(
                left, right, on=["k"], left_time="lt", right_time="rt",
                tie_break="rid", tolerance=tol, chunk_seconds=chunk,
            ).select("lid", "k", "lt", "rid", "rt").collect()))
            assert a == b, (tol, chunk)
        # tolerance drops left rows outside the 90s lookback
        assert len(a) > (700 if tol is None else 300)

    # forward and nearest must also match their range-join forms row
    # for row (the merge form is what the catalog entries now run —
    # the range form's band fan-out was quadratic in data density)
    fwd_a = sorted(map(tuple, asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        left_key=["lid"], tie_break="rid",
        tolerance="INTERVAL 120 SECOND", direction="forward",
    ).select("lid", "k", "lt", "rid", "rt").collect()))
    fwd_b = sorted(map(tuple, asof_join_merge(
        left, right, on=["k"], left_time="lt", right_time="rt",
        tie_break="rid", tolerance="INTERVAL 120 SECOND",
        direction="forward",
    ).select("lid", "k", "lt", "rid", "rt").collect()))
    assert fwd_a == fwd_b and len(fwd_a) > 300
    near_a = sorted(map(tuple, asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        left_key=["lid"], tie_break="rid",
        tolerance="INTERVAL 90 SECOND", direction="nearest",
    ).select("lid", "k", "lt", "rid", "rt").collect()))
    near_b = sorted(map(tuple, asof_join_merge(
        left, right, on=["k"], left_time="lt", right_time="rt",
        tie_break="rid", tolerance="INTERVAL 90 SECOND",
        direction="nearest",
    ).select("lid", "k", "lt", "rid", "rt").collect()))
    assert near_a == near_b and len(near_a) > 500


def test_asof_merge_nearest_tie_semantics(spark):
    """Hand-checked nearest edge cases: equal-distance ties prefer the
    backward candidate; equal right timestamps resolve to the LARGEST
    tie_break on either side (asof_join's ordering); out-of-band sides
    are nulled before comparison."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.asof import asof_join, asof_join_merge

    def ts(us):
        return F.timestamp_micros(F.lit(us))

    left = spark.createDataFrame(
        [(1, 100_000_000), (2, 500_000_000), (3, 900_000_000)],
        "lid long, t_us long",
    ).select("lid", F.lit(1).alias("k"),
             F.timestamp_micros(F.col("t_us")).alias("lt"))
    right = spark.createDataFrame(
        [
            (10, 90_000_000),   # 10s before left 1
            (11, 110_000_000),  # 10s after left 1 -> tie, backward wins
            (20, 499_000_000),  # 1s before left 2
            (21, 499_000_000),  # same instant: larger rid wins
            (30, 905_000_000),  # 5s after left 3 (nothing before in band)
        ],
        "rid long, t_us long",
    ).select("rid", F.lit(1).alias("k"),
             F.timestamp_micros(F.col("t_us")).alias("rt"))
    for fn, kw in (
        (asof_join, {"left_key": ["lid"]}),
        (asof_join_merge, {}),
    ):
        got = {
            r["lid"]: r["rid"]
            for r in fn(
                left, right, on=["k"], left_time="lt", right_time="rt",
                tie_break="rid", tolerance="INTERVAL 30 SECOND",
                direction="nearest", **kw,
            ).collect()
        }
        assert got == {1: 10, 2: 21, 3: 30}, fn.__name__


def test_trailing_spine_survives_daily_cut(spark):
    """The r18 one-fact-pass shape derives the day spine from the
    checkpointed daily sketch/sample instead of a second scan of the
    facts.  That is only sound because EVERY input day keeps >= 1 daily
    row (rn = 1 always survives the k-cut) — pin it with k smaller than
    a day's population, so the cut genuinely drops rows, and with a
    one-row day: both trailing operators must still emit every input
    day, and the sampled percentiles must equal a direct computation
    over the k-sample of each trailing window."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.pipeline import (
        kmv_distinct_trailing,
        sampled_percentiles_trailing,
    )

    rows = [(d, i, float(d * 100 + i)) for d in range(1, 9) for i in range(7)]
    rows.append((9, 99, 9.5))  # a one-row day
    df = spark.createDataFrame(
        rows, "dd long, event_id long, value double"
    ).select(
        F.to_timestamp(
            F.concat(F.lit("2024-02-"), F.lpad(F.col("dd"), 2, "0"))
        ).alias("day"),
        "event_id",
        F.col("event_id").alias("user_id"),
        "value",
    )
    kmv = kmv_distinct_trailing(df, "user_id", "day", 7, k=3)
    pct = sampled_percentiles_trailing(
        df, "value", "day", "event_id", window_days=7, ps=(0.5,), k=3
    )
    days_in = {str(r.day)[:10] for r in df.select("day").distinct().collect()}
    assert {str(r.day)[:10] for r in kmv.collect()} == days_in
    got_pct = {str(r.day)[:10]: (r.n_sampled, r.p5) for r in pct.collect()}
    assert set(got_pct) == days_in
    # every window's sample is capped at k and the one-row day exists
    assert all(n <= 3 for n, _ in got_pct.values())
    assert got_pct[max(days_in)][0] >= 1


def test_kmv_trailing_exact_below_k(spark):
    """With fewer than k distinct keys per window the trailing KMV
    estimate is EXACT — verify against countDistinct over the same
    trailing windows."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.pipeline import kmv_distinct_trailing

    rows = [
        (d, u)
        for d in range(1, 15)
        for u in range(d % 5 + 1)  # varying small daily populations
    ]
    df = spark.createDataFrame(rows, "dd long, user_id long").select(
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad(F.col("dd"), 2, "0"))
        ).alias("day"),
        "user_id",
    )
    got = {
        str(r.day)[:10]: r.approx_distinct
        for r in kmv_distinct_trailing(df, "user_id", "day", 7, k=64).collect()
    }
    s, x = df.alias("s"), df.alias("x")
    exact = {
        str(r.day)[:10]: r.n
        for r in s.select("day").distinct()
        .join(
            x,
            (F.col("x.day") <= F.col("s.day"))
            & (F.col("x.day") > F.col("s.day") - F.expr("INTERVAL 7 DAY")),
        )
        .groupBy(F.col("s.day").alias("day"))
        .agg(F.countDistinct("x.user_id").alias("n"))
        .collect()
    }
    assert got == {d: float(n) for d, n in exact.items()} and len(got) == 14


def test_duplicate_components_string_ids_both_paths(spark):
    """Non-integer doc ids (string keys are legal pair-graph nodes):
    both the one-task union-find fast path and the distributed loop
    must resolve them, with lexicographic min as the component label
    and the id type preserved in the output schema."""
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    for kw in ({}, {"small_graph_edges": 0}):
        out = duplicate_components(pairs, **kw)
        assert out.schema["doc_id"].dataType.simpleString() == "string"
        got = {r["doc_id"]: r["component"] for r in out.collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_asof_merge_drops_null_time_rows_like_range_form(spark):
    """NULL time values never satisfy a range inequality, so the range
    form drops them on both sides; the merge carry must agree in every
    direction (a null left time must not inherit a carry under the
    descending forward order, and a null right time must never be
    donated as a carry)."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.asof import asof_join, asof_join_merge

    left = spark.createDataFrame(
        [(1, 100), (2, None)], "lid long, t_us long"
    ).select("lid", F.lit(1).alias("k"),
             F.timestamp_micros(F.col("t_us") * 1_000_000).alias("lt"))
    right = spark.createDataFrame(
        [(10, 90), (11, None)], "rid long, t_us long"
    ).select("rid", F.lit(1).alias("k"),
             F.timestamp_micros(F.col("t_us") * 1_000_000).alias("rt"))
    for direction, tol in [
        ("backward", None), ("forward", None),
        ("backward", "INTERVAL 60 SECOND"),
        ("forward", "INTERVAL 60 SECOND"),
        ("nearest", "INTERVAL 60 SECOND"),
    ]:
        a = sorted(map(tuple, asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            left_key=["lid"], tie_break="rid", tolerance=tol,
            direction=direction,
        ).select("lid", "rid").collect()))
        b = sorted(map(tuple, asof_join_merge(
            left, right, on=["k"], left_time="lt", right_time="rt",
            tie_break="rid", tolerance=tol, direction=direction,
        ).select("lid", "rid").collect()))
        assert a == b, (direction, tol)
        assert all(lid != 2 for lid, _ in b), (direction, tol)
        assert all(rid != 11 for _, rid in b), (direction, tol)


def test_mixture_resample_hits_targets_and_is_deterministic(spark):
    """Target-mixture down-sampling (operators/pipeline.mixture_resample):
    the binding group keeps everything, every other group lands within
    hash granularity of its target share, the keep set is a pure
    function of (salt, group, id), and no row is ever up-sampled."""
    from label_maker_dask_spark.operators.pipeline import mixture_resample

    rows = [(i, "en" if i % 10 < 6 else ("de" if i % 10 < 8 else "fr"))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    w = F.when(F.col("lang") == "en", F.lit(2)).otherwise(F.lit(1))
    kept = mixture_resample(df, "lang", w)
    counts = dict(
        (r["lang"], r["n"])
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(counts.values())
    # binding group: fr has c/w = 1000/1 vs en 3000/2, de 1000/1 ->
    # fr and de tie as binding (rate 1): every fr/de row kept
    assert counts["fr"] == 1000 and counts["de"] == 1000
    # en target share 2/4 = 0.5 — within hash granularity
    assert abs(counts["en"] / total - 0.5) < 0.03
    assert counts["en"] < 3000  # actually down-sampled
    # deterministic: identical keep set on re-run
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_resample(df, "lang", w).select("doc_id").collect()
    )
    assert a == b
    # subset property: kept rows all exist in the input
    assert kept.join(df, ["doc_id", "lang"], "left_anti").count() == 0
