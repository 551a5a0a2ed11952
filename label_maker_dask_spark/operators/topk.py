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
