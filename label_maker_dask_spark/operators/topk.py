"""Per-group and global top-k (SURVEY.md Part B: sort/limit/top-k).

Per-group top-k is a window ``row_number`` + filter — Spark plans this as a
partial top-k per partition before the shuffle (WindowGroupLimit), so only
k rows per group per partition cross the exchange; total order within a
group must include a tie-break key to be deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the first k rows of each group under ``order_cols`` (include a
    unique tie-break column for determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def salted_topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-resilient per-group top-k, identical results to
    :func:`topk_per_group`.

    A hot group funnels all its rows through one window task; salting
    splits phase 1 across ``salt`` sub-groups keyed by the row's physical
    partition id (free to compute — no extra shuffle to assign, and rows
    of a hot group arriving from many input partitions spread evenly), so
    the hot group's sort handles ~n/salt rows per task.  Phase 2 re-ranks
    only the ≤ k·salt survivors per group — bounded, never skewed.

    Correct for any row→salt assignment: every true top-k row is in its
    sub-group's top-k, so phase 2 sees it (same argument as the
    per-partition cut in cosine_topk).
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % salt)
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    return topk_per_group(survivors, group_cols, order_cols, k, rank_col)
