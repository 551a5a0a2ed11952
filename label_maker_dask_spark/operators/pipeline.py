"""Training-data pipeline operators beyond the reference surface
(SURVEY.md Part B): deterministic dataset splits, stratified sampling,
PII scanning, benchmark-contamination checks, and repetition scoring.

Everything here is pure Catalyst column algebra — no Python in the row
path — and every operator has a DuckDB SQL twin built from the same
cross-engine polynomial hash (functions/text.char_poly_hash), so results
hash-match the oracle bit-for-bit.

Scale posture: splits/sampling/PII/repetition are narrow per-row maps
(no shuffle at all); contamination is a broadcast-able semi-join on
shingle hashes (the benchmark side is small by definition).  All of it
survives a 1000-executor scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.text import (
    char_poly_hash,
    char_poly_hash_sql,
    tokens,
    word_shingles,
)

# regexes valid in BOTH Java (Spark) and RE2 (DuckDB) dialects — keep them
# free of backreferences and lookaround
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 \-]{7,}[0-9]"
URL_RE = r"https?://[^ ]+"


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Deterministic [0, 100) bucket from the row id — the split
    assignment is a pure function of (salt, id), so it is stable across
    runs, engines, and repartitioning (never ``rand()``, which breaks
    reproducibility and retry semantics)."""
    return char_poly_hash(F.concat(F.lit(salt + ":"), id_col.cast("string"))) % 100


def split_bucket_sql(id_expr: str, salt: str = "split") -> str:
    return f"{char_poly_hash_sql(f'''('{salt}:' || {id_expr}::VARCHAR)''')} % 100"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign train/val/test deterministically by hash bucket."""
    b = split_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    pct: int = 20,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~pct% sample within each stratum: the hash is salted
    with the stratum value so per-stratum selections are independent.
    Unlike ``df.sampleBy``, re-running (or re-trying a task) yields the
    identical sample."""
    b = split_bucket(
        F.concat(F.col(strata_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")),
        salt,
    )
    return df.where(b < pct)


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "mix",
    resolution: int = 1_000_000,
    thresholds: DataFrame | None = None,
) -> DataFrame:
    """Deterministic down-sampling to a TARGET MIXTURE over
    ``group_col`` — the data-mixing step of a pre-training pipeline
    (rebalance languages/sources to target proportions before
    training), as a pure function of the data.

    ``weight`` is an integer Column giving each group's target weight
    (e.g. ``when(col("lang") == "en", 2).otherwise(1)``); target share
    of group g is ``w_g / Σw``.  The output size is the LARGEST dataset
    achievable without up-sampling: the binding group (smallest
    ``c_g / w_g``) keeps everything, every other group down-samples to
    match the mixture.  All rates are computed in INTEGER arithmetic —
    ``K = min_g floor(c_g·Σw / w_g)`` rows out, per-group keep
    threshold ``floor(w_g·K·resolution / (Σw·c_g))`` — so a DuckDB
    oracle replays the thresholds exactly; the per-row keep decision is
    the salted content hash of ``(salt, group, id)`` against the
    threshold, stable across runs, engines, and repartitioning (the
    ``stratified_sample_hash`` contract, with data-dependent rates);
    the raw polynomial fold is cube-mixed (``(h²%p)·h%p``, the same
    avalanche step the KMV sketches use) before the modulus — the plain
    fold is near-affine in trailing decimal digits, which concentrated
    per-group keep rates far off target.

    Scale shape: one map-side-collapsing count per group, two 1-row
    aggregates, a broadcast of ``n_groups`` thresholds back onto the
    fact, and a narrow filter — no shuffle of the corpus itself.

    Pass ``thresholds`` (a :func:`mixture_thresholds` frame) to reuse
    an already-computed threshold table — a caller that also reports
    per-group counts would otherwise re-scan the corpus to re-derive
    numbers this operator just aggregated."""
    if thresholds is None:
        thresholds = mixture_thresholds(df, group_col, weight, resolution)
    g = F.col(group_col).cast("string")
    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash(
        F.concat(F.lit(salt + ":"), g, F.lit("|"), F.col(id_col).cast("string"))
    )
    h = (raw * raw % HASH_P) * raw % HASH_P % resolution
    return (
        df.join(F.broadcast(thresholds.select(group_col, "_thr")), group_col)
        .where(h < F.col("_thr"))
        .drop("_thr")
    )


def mixture_thresholds(
    df: DataFrame,
    group_col: str,
    weight: Column,
    resolution: int = 1_000_000,
) -> DataFrame:
    """The per-group threshold table behind :func:`mixture_resample`:
    ``(group, _c, _w, _thr)`` — counts, weights, and the integer keep
    threshold.  MATERIALIZED eagerly (n_groups rows): both the resample
    filter and any caller-side audit consume it, and left lazy each
    consumer would re-run the corpus count."""
    from label_maker_dask_spark.operators.materialize import materialize

    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_c"), F.max(weight).alias("_w")
    )
    s = counts.agg(F.sum("_w").alias("_sum_w"))
    with_s = counts.crossJoin(F.broadcast(s))
    k = with_s.agg(F.min(F.expr("_c * _sum_w div _w")).alias("_k"))
    return (
        with_s.crossJoin(F.broadcast(k))
        .withColumn(
            "_thr",
            F.expr(f"_w * _k * {resolution} div (_sum_w * _c)"),
        )
        .select(group_col, "_c", "_w", "_thr")
        .transform(materialize, eager=True)
    )


def mixture_resample_keep_sql(
    group_expr: str,
    weight_sql: str,
    id_expr: str = "doc_id",
    salt: str = "mix",
    resolution: int = 1_000_000,
    table: str = "documents",
) -> str:
    """DuckDB CTE prefix replaying :func:`mixture_resample`'s integer
    threshold math; exposes ``mix_kept`` = the kept rows of ``table``."""
    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash_sql(
        f"('{salt}:' || {group_expr}::VARCHAR || '|' || {id_expr}::VARCHAR)"
    )
    # bind the O(len)-per-row character fold ONCE as a column; the
    # cube-mix then references the bound value, not three copies of
    # the fold expression
    return f"""
    WITH mix_c AS (
      SELECT {group_expr} AS g, count(*) AS c, max({weight_sql}) AS w
      FROM {table} GROUP BY 1),
    mix_s AS (SELECT sum(w) AS sum_w FROM mix_c),
    mix_k AS (SELECT min(c * sum_w // w) AS k FROM mix_c, mix_s),
    mix_t AS (
      SELECT g, (w * k * {resolution}) // (sum_w * c) AS thr
      FROM mix_c, mix_s, mix_k),
    mix_h AS (SELECT d.*, ({raw}) AS mix_raw FROM {table} d),
    mix_kept AS (
      SELECT mix_h.* EXCLUDE (mix_raw) FROM mix_h
      JOIN mix_t ON mix_t.g = {group_expr}
      WHERE ((mix_raw * mix_raw % {HASH_P}) * mix_raw % {HASH_P})
            % {resolution} < thr)
    """


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row counts of email / phone / URL matches plus a combined flag —
    the triage pass before redaction.  Pure regexp_extract_all column
    algebra (JVM-side, no UDF)."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    n_url = F.size(F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0)))
    return df.withColumns(
        {
            "n_emails": n_email,
            "n_phones": n_phone,
            "n_urls": n_url,
            "has_pii": (n_email + n_phone + n_url) > 0,
        }
    )


def redact_pii(text: Column) -> Column:
    """Replace PII matches with typed placeholder tokens."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, URL_RE, "<URL>")


def contamination_overlap(
    shingled_corpus: DataFrame, shingled_bench: DataFrame
) -> DataFrame:
    """Benchmark-contamination check: for each corpus doc, how many
    benchmark docs share at least one word n-gram with it, and how many
    distinct shingles are shared.  Input frames are ``(doc_id, sh)``
    distinct pairs from :func:`operators.dedup.doc_shingles`.

    Scale shape: the benchmark side is small by definition (eval sets are
    thousands of docs), so Spark broadcasts it and the corpus streams —
    no corpus-sized shuffle.

    Corpus and benchmark are DIFFERENT datasets, so ids are not compared:
    a corpus doc and a bench doc that coincidentally share a numeric id
    are still a genuine overlap.  (Callers slicing the bench out of the
    corpus itself must exclude those ids from the corpus side, as the
    registered catalog query does.)"""
    bench = shingled_bench.select(
        F.col("doc_id").alias("bench_id"), F.col("sh").alias("bsh")
    )
    return (
        shingled_corpus.join(
            F.broadcast(bench), F.col("sh") == F.col("bsh")
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_matched"),
            F.countDistinct("sh").alias("n_shared_shingles"),
        )
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics over word bigrams: distinct/total ratio
    (low = repetitive boilerplate) and the count of the most frequent
    bigram.  Docs with fewer than two tokens are excluded (no bigrams).

    One pass: explode bigrams once, count per (doc, bigram), then derive
    BOTH metrics from the counts in a second agg on the same key —
    distinct = count of groups, total = sum of counts, max = max count.
    The explode stays within a map-side partial aggregation, so the
    shuffle carries one row per (doc, distinct bigram), not per
    occurrence, and the document text is scanned exactly once."""
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(toks, 2).alias("bigrams"),
    ).where(F.size("bigrams") > 0)
    return (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias(
                "distinct_bigram_ratio"
            ),
            F.max("c").alias("max_bigram_count"),
        )
    )


def derive_pack_buckets(
    n_rows: int,
    target_bucket_rows: int = 4_000_000,
    min_buckets: int = 32,
) -> int:
    """Bucket count for :func:`pack_sequences` sized from input volume.

    Each bucket is one window-sort task, so the bucket count bounds the
    per-reducer row count: ``ceil(n_rows / target_bucket_rows)`` keeps
    every sort task at or under ``target_bucket_rows`` rows (~40 B/row of
    (id, bucket, n_tok, offset) state ⇒ the 4M default is ~160 MB of sort
    input per task).  The ``min_buckets`` floor keeps small inputs wide
    enough to use a cluster's parallelism.  Formula documented in
    SCALE.md."""
    import math

    return max(min_buckets, math.ceil(max(n_rows, 1) / target_bucket_rows))


def pack_sequences(
    docs: DataFrame,
    token_count: Column,
    seq_len: int = 2048,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    target_bucket_rows: int = 4_000_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard pre-training layout):
    documents are laid head-to-tail in a deterministic order and cut into
    fixed ``seq_len`` token windows; a document's pack is the window its
    first token lands in.

    Determinism + scale come from the same trick as the splits: documents
    are first hash-bucketed (``n_buckets`` independent streams — in
    production, one per output shard), then ordered by id *within* the
    bucket, so the only window runs per-bucket, never globally, and the
    layout is reproducible under retries and repartitioning.  Returns
    per-doc ``(doc_id, bucket, start_offset, pack_id)``.

    ``n_buckets=None`` (default) sizes the bucket count from the input
    volume via :func:`derive_pack_buckets` — one ``count()`` job, then
    every window-sort task holds ≤ ``target_bucket_rows`` rows, so packing
    never degrades to a handful of multi-TB sort tasks at 100 TB.  Pass an
    explicit ``n_buckets`` for a fixed shard layout (or to keep the whole
    job one lazy plan); the bucket assignment is a pure function of
    (id, n_buckets) either way."""
    from pyspark.sql import Window

    if n_buckets is None:
        n_buckets = derive_pack_buckets(docs.count(), target_bucket_rows)

    b = (split_bucket(F.col(id_col), salt="pack") % n_buckets).alias("bucket")
    base = docs.select(F.col(id_col).alias("doc_id"), b, token_count.alias("n_tok"))
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_offset")
    return base.select(
        "doc_id",
        "bucket",
        "n_tok",
        start,
    ).withColumn("pack_id", F.floor(F.col("start_offset") / seq_len))


def sampled_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    ps: tuple = (0.5, 0.9, 0.99),
    k: int = 256,
    salt: str = "pct",
) -> DataFrame:
    """Deterministic approximate percentiles: a bottom-k-by-salted-hash
    uniform row sample per group, then EXACT interpolated percentiles over
    the sample.  Like :func:`kmv_distinct`, the estimate is a pure
    function of the data — no ``rand()``, no engine-specific sketch
    layout — so a SQL oracle replays it bit-for-bit.  Sampling error is
    the classic order-statistic bound ~1/sqrt(k) on the quantile rank.

    At 100 TB the bottom-k rank is a per-group top-k (partial agg keeps k
    rows per group per partition before one shuffle), and the final exact
    percentile touches only k rows per group — the full column is never
    sorted."""
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    # same cube scatter as kmv_distinct: the raw char fold is too
    # structured for order statistics
    raw = char_poly_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    h = ((raw * raw % HASH_P) * raw % HASH_P).alias("h")
    w = Window.partitionBy(*group_cols).orderBy("h", id_col)
    sample = (
        df.select(*group_cols, id_col, value_col, h)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    aggs = [
        F.round(F.percentile(value_col, p), 6).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in ps
    ]
    return sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sampled"), *aggs
    )


def hash_unit(id_col: Column, salt: str = "wsample") -> Column:
    """Deterministic uniform [0, 1) from the row id — the ``rand()``
    replacement for Bernoulli/weighted sampling: stable across runs,
    engines, retries, and repartitioning.  Same cube-scattered char fold
    as the KMV sketch (the raw fold is too structured for thresholding)."""
    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    h = (raw * raw % HASH_P) * raw % HASH_P
    return h / F.lit(float(HASH_P))


def weighted_sample(
    df: DataFrame, id_col: Column, weight: Column, salt: str = "wsample"
) -> DataFrame:
    """Keep each row with probability ``weight`` (a [0,1] Column) —
    importance sampling for curation (e.g. keep-probability = quality
    score), decided per row by ``hash_unit(id) < weight``.  Pure narrow
    filter: no shuffle, no state, exactly reproducible."""
    return df.where(hash_unit(id_col, salt) < weight)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch — the *deterministic*
    approximate-distinct: hash every key with the cross-engine polynomial
    fold, keep the k smallest distinct hash values per group, and estimate
    ``(k-1) * P / kth_smallest`` (exact count when a group has fewer than
    k distinct keys).  Unlike HLL sketches (engine-specific layouts), the
    estimate is a pure function of the data, so a SQL oracle reproduces it
    bit-for-bit.  KMV sketches are mergeable (union the sets, re-take the
    k smallest), so partial aggregation works at scale; error ~ 1/sqrt(k).
    """
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    # the char fold alone is too structured for order statistics (nearby
    # keys give nearby hashes, biasing the kth-minimum); the cube map
    # r -> r^3 mod P scatters it AND is injective (P prime with
    # gcd(3, P-1) = 1), preserving the exact-below-k guarantee.  Two
    # mod steps keep every intermediate < P^2 < 2^63.
    raw = char_poly_hash(F.concat(F.lit("kmv:"), F.col(key_col).cast("string")))
    h = ((raw * raw % HASH_P) * raw % HASH_P).alias("h")
    d = df.select(*group_cols, h).distinct()
    return _kmv_estimate(d, group_cols, k)


def _kmv_estimate(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Bottom-k cut + estimator over a distinct (groups, h) frame — shared
    by the one-shot sketch and the merge path so both use the identical
    formula."""
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return (
        ranked.groupBy(*group_cols)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_seen"))
        .select(
            *group_cols,
            F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
            .otherwise(F.round(F.lit((k - 1) * HASH_P) / F.col("kth"), 6))
            .alias("approx_distinct"),
        )
    )


def kmv_distinct_merged(
    df: DataFrame,
    key_col: str,
    coarse_cols: list[str],
    fine_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Two-level KMV rollup: build a bottom-k sketch per (coarse, fine)
    group, then MERGE the fine sketches into one estimate per coarse group
    — the pre-aggregated-sketch pattern a 100 TB pipeline uses (daily
    sketches stored once, any coarser rollup answered without rescanning
    the facts).

    KMV merge is exact: every member of bottom-k(S) lies in the bottom-k
    of whichever fine partition holds it, so bottom-k(union of per-fine
    bottom-k) == bottom-k(S) and the merged estimate EQUALS the direct
    coarse sketch — which is what the catalog oracle computes directly.
    Scale shape: the fine-level cut bounds intermediate state at
    k rows per fine group; the merge shuffles only those sketch rows."""
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash(F.concat(F.lit("kmv:"), F.col(key_col).cast("string")))
    h = ((raw * raw % HASH_P) * raw % HASH_P).alias("h")
    d = df.select(*coarse_cols, *fine_cols, h).distinct()
    wf = Window.partitionBy(*coarse_cols, *fine_cols).orderBy("h")
    fine_sketch = d.withColumn("rn", F.row_number().over(wf)).where(
        F.col("rn") <= k
    )
    merged = fine_sketch.select(*coarse_cols, "h").distinct()
    return _kmv_estimate(merged, coarse_cols, k)


def kmv_distinct_trailing(
    df: DataFrame,
    key_col: str,
    day_col: str,
    window_days: int = 7,
    k: int = 64,
) -> DataFrame:
    """Per-day TRAILING-window distinct estimate from merged daily KMV
    sketches — the "rolling 7-day uniques" dashboard query, answered
    without ever rescanning the facts per window.

    Daily bottom-k sketches are built once (k rows per day); each day of
    the spine then merges the sketches of its trailing ``window_days``
    (a bounded range self-join: <= window_days x k sketch rows per day)
    and re-takes the bottom k.  Lossless by the same argument as the
    grain rollup (``kmv_distinct_merged``): every member of the window
    union's true bottom-k survives its own day's cut, so the merged
    estimate EQUALS a direct sketch over the window — which is what the
    catalog oracle computes.  Scale shape: the only fact-sized work is
    the one distinct + per-day cut; everything after runs on k-row
    sketches."""
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash(F.concat(F.lit("kmv:"), F.col(key_col).cast("string")))
    h = ((raw * raw % HASH_P) * raw % HASH_P).alias("h")
    d = df.select(day_col, h).distinct()
    wf = Window.partitionBy(day_col).orderBy("h")
    # checkpoint the k-rows-per-day sketch and derive the day spine from
    # IT (every input day keeps >= 1 sketch row — rn = 1 always survives
    # the k-cut — so the spine is identical for ANY input): the
    # fact-sized distinct pass runs once instead of twice (r18)
    daily = (
        d.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= k)
        .select(day_col, "h")
        .localCheckpoint(eager=False)
    )
    spine = daily.select(day_col).distinct()
    s, x = spine.alias("s"), daily.alias("x")
    win = (
        s.join(
            x,
            (F.col(f"x.{day_col}") <= F.col(f"s.{day_col}"))
            & (
                F.col(f"x.{day_col}")
                > F.col(f"s.{day_col}") - F.expr(f"INTERVAL {window_days} DAY")
            ),
        )
        .select(F.col(f"s.{day_col}").alias(day_col), F.col("x.h").alias("h"))
        .distinct()
    )
    return _kmv_estimate(win, [day_col], k)


def sampled_percentiles_trailing(
    df: DataFrame,
    value_col: str,
    day_col: str,
    id_col: str,
    window_days: int = 7,
    ps: tuple = (0.5, 0.9),
    k: int = 256,
    salt: str = "pct",
) -> DataFrame:
    """Per-day TRAILING-window percentiles from merged daily hash-samples
    — the rolling-latency-p90 dashboard query without a per-window fact
    rescan, the order-statistic twin of :func:`kmv_distinct_trailing`.

    Daily bottom-k-by-hash row samples are built once; each spine day
    merges its trailing days' samples (<= window_days x k rows) and
    re-takes the bottom k.  Lossless: a row in the window union's true
    bottom-k ranks at least as well within its own day, so it survived
    the daily cut — the merged sample EQUALS the direct window sample
    and the oracle computes the latter.  Exact interpolated percentiles
    then touch k rows per day."""
    from pyspark.sql import Window

    from label_maker_dask_spark.functions.text import HASH_P

    raw = char_poly_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    h = ((raw * raw % HASH_P) * raw % HASH_P).alias("h")
    wf = Window.partitionBy(day_col).orderBy("h", id_col)
    # checkpoint the k-rows-per-day sample and derive the day spine from
    # IT (rn = 1 always survives the cut, so every input day has a
    # sample row — spine identical for ANY input): one fact pass, not
    # two (r18, same reasoning as kmv_distinct_trailing)
    daily = (
        df.select(day_col, id_col, value_col, h)
        .withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= k)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    spine = daily.select(day_col).distinct()
    s, x = spine.alias("s"), daily.alias("x")
    win = s.join(
        x,
        (F.col(f"x.{day_col}") <= F.col(f"s.{day_col}"))
        & (
            F.col(f"x.{day_col}")
            > F.col(f"s.{day_col}") - F.expr(f"INTERVAL {window_days} DAY")
        ),
    ).select(
        F.col(f"s.{day_col}").alias(day_col),
        F.col(f"x.{id_col}").alias(id_col),
        F.col(f"x.{value_col}").alias(value_col),
        F.col("x.h").alias("h"),
    )
    wd = Window.partitionBy(day_col).orderBy("h", id_col)
    sample = win.withColumn("rn", F.row_number().over(wd)).where(
        F.col("rn") <= k
    )
    aggs = [
        F.round(F.percentile(value_col, p), 6).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in ps
    ]
    return sample.groupBy(day_col).agg(
        F.count(F.lit(1)).alias("n_sampled"), *aggs
    )
