"""Fail-fast scale guards for deliberately-quadratic exactness baselines.

The catalog keeps a few exact-but-O(n²) operators (all-pairs cosine,
exact-Jaccard over shared shingles) because they are the verification and
oracle mirrors of the scalable LSH/banded twins.  Correct at any size,
affordable only at verification size — so, like the brute-force top-k's
query-side cap (``similarity._collect_queries``), they refuse large inputs
up front with an error naming the scale path, instead of silently
launching a job that would run for days on a 100 TB corpus.

The guard is cheap but not free: Spark plans ``limit(n).count()`` as a
per-partition LocalLimit followed by a single-partition exchange feeding
GlobalLimit, so up to ``n`` rows *per input partition* cross that
exchange.  The guard therefore projects the input down to a single
constant column first — the exchange then moves 1-byte rows, not
full-width shingle/vector rows — and moves one scalar to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_small_input(
    df: DataFrame, max_rows: int, op: str, scale_path: str
) -> DataFrame:
    """Raise unless ``df`` has at most ``max_rows`` rows; returns ``df``
    unchanged for chaining.  ``scale_path`` names the operator to use
    instead at scale — the error is a signpost, not a dead end."""
    n = df.select(F.lit(1).alias("one")).limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{op}: input exceeds max_rows={max_rows}. This is the exact "
            "quadratic baseline, kept for verification/oracle use on small "
            f"corpora; at scale use {scale_path}, or raise max_rows "
            "explicitly if the quadratic cost is intended."
        )
    return df


def parallelism_floor(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default
    parallelism — ONLY when its current partition count is below it.

    Why: a compute-bound stage (an Arrow ``mapInPandas`` pass, an
    all-pairs nested-loop join) inherits the SCAN's partitioning, and a
    small input — one parquet file, one row group — scans as ONE
    partition, serializing the whole stage through one core / one Python
    worker regardless of cluster size (guide §2: partitioning must be
    scale-adaptive, and byte-based sizing cannot see compute-bound
    work).  The floor is derived from the cluster
    (``defaultParallelism``), never a constant; on a real corpus the
    scan already exceeds it and this is the identity — no payload is
    ever reshuffled at scale.  Results are unaffected: callers apply it
    only in front of row-wise/pair-wise stages whose output is
    partitioning-independent."""
    sc = df.sparkSession.sparkContext
    floor = sc.defaultParallelism
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(floor)
    return df


def pin_group_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition ``df`` on ``keys`` with an EXPLICIT partition
    count so a following ``groupBy(*keys).applyInPandas`` (or cogroup)
    stage keeps cluster-wide parallelism.

    Why: the grouped-map stage's cost is per-GROUP Python compute, which
    AQE's byte-based partition coalescing cannot see — a small post-
    shuffle byte size folds the exchange to ONE partition and serializes
    every group through a single Python worker (measured on the
    segmentation rasterize: 5.2-6.8 s with coalescing vs 1.5-2.9 s
    without, sf0.1; same failure mode as the cogroup reconcile, 22 s ->
    3.3 s).  ``repartition(n, *keys)`` plans as REPARTITION_BY_NUM,
    which AQE never coalesces, and the grouped-map reuses the hash
    partitioning so no second exchange is added.

    The count is derived from the cluster (2x ``defaultParallelism``,
    nudged off the session shuffle-partition count so physical planning
    cannot elide the node as redundant) — scale-adaptive, not a local
    constant.  Results are unaffected: grouped-map output is
    partitioning-independent."""
    spark = df.sparkSession
    nparts = spark.sparkContext.defaultParallelism * 2
    if nparts == int(spark.conf.get("spark.sql.shuffle.partitions")):
        nparts += 1
    return df.repartition(nparts, *keys)


__all__ = ["ensure_small_input", "parallelism_floor", "pin_group_parallelism"]
