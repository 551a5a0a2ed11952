"""Distributed exact global ranks and ntile — the scalable form of an
unpartitioned ranking window.

``Window.orderBy(...)`` with no partition key plans as a SINGLE TASK
holding the entire sorted input (the round-9 scaling probe measured a
13x top-decade blowup on exactly this shape before
``analytics_equidepth_histogram_price`` was rewritten onto this
module).  The scalable equivalent: range-repartition on the sort key (a
sampled-boundary DISTRIBUTED sort), per-partition local ``row_number``
(bounded windows), and a broadcast of per-partition row counts turning
local ranks into exact global ranks; ``ntile`` is then closed-form
integer arithmetic on the global rank.  Output is bit-identical to the
single-window form for any STRICT total order (make the last order
column a unique tiebreaker), regardless of where the sampled range
boundaries land — ranks derive from offsets + within-partition order,
which together reproduce the global order exactly.

No counterpart in the reference (no ranking of any kind); Part-B
engine surface used by the equi-depth histogram and the RFM
segmentation catalog entries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window

from label_maker_dask_spark.operators.materialize import materialize
from pyspark.sql import functions as F


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor-div for nonnegative longs: remove the
    remainder first so the double division is always exact (a plain
    a/b cast can mis-floor near integer boundaries)."""
    return ((a - a % b) / b).cast("long")


def _range_partitioned_offsets(
    df: DataFrame, order_cols: Sequence, agg_col
):
    """Shared prologue of the distributed rank/prefix-sum pair: range-
    repartition on the order (a sampled-boundary distributed sort), tag
    rows with their partition id, and compute per-partition exclusive
    offsets + the grand total of ``agg_col`` over a partition-count-sized
    window.

    The partitioned frame is MATERIALIZED once (lazy checkpoint) before
    either consumer reads it: the offsets branch and the per-row branch
    both consume it, and evaluated independently each would re-run
    repartitionByRange with a DIFFERENT RangePartitioner boundary draw
    (its seed varies per RDD instance), silently applying one
    partitioning's offsets to another's local positions — observed as
    unequal ntile buckets at sf1 while every small-data test stayed
    green.  Returns ``(d, offs, cols)``: the pinned frame, the
    broadcastable (_pid, _off, _n) frame, and the normalized sort
    columns."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.transform(materialize, eager=False)
    sizes = d.groupBy("_pid").agg(agg_col.alias("_c"))
    wo = Window.orderBy("_pid")  # partition-count rows: tiny window
    offs = sizes.select(
        "_pid",
        F.coalesce(
            F.sum("_c").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
        F.sum("_c")
        .over(
            wo.rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_n"),
    )
    return d, offs, cols


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence,
    rank_col: str = "global_rank",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` plus its exact 1-based global rank under ``order_cols``
    (strings or Column sort expressions, e.g. ``F.desc("x")``; include
    a unique tiebreaker for a deterministic total order), computed
    without any single task holding the full order.  ``total_col``
    optionally also attaches the total row count (needed by ntile).

    One range exchange + one tiny broadcast: Catalyst reuses the range
    exchange between the offsets pass and the rank pass
    (ReusedExchange), so the input is shuffled once."""
    reserved = {"_pid", "_rn", "_off", "_n", rank_col} | (
        {total_col} if total_col else set()
    )
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"with_global_rank reserves column names {sorted(reserved)}; "
            f"rename the clashing input columns ({sorted(clash)})"
        )
    d, offs, cols = _range_partitioned_offsets(
        df, order_cols, F.count(F.lit(1))
    )
    wl = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        d.withColumn("_rn", F.row_number().over(wl))
        .join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_rn"))
    )
    keep = [*df.columns, rank_col] + ([total_col] if total_col else [])
    if total_col:
        ranked = ranked.withColumn(total_col, F.col("_n"))
    return ranked.select(*keep)


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """``ntile(n)``'s bucket as closed-form integer arithmetic on an
    exact 1-based global rank: the first ``total mod n`` buckets take
    ``base + 1`` rows (the standard remainder rule), so the result is
    bit-identical to the window function at any scale."""
    base = _idiv(total, F.lit(n))
    rem = total % n
    cut = rem * (base + 1)
    return (
        F.when(rank <= cut, _idiv(rank - 1, base + 1) + 1)
        .otherwise(rem + _idiv(rank - 1 - cut, base) + 1)
        .cast("int")
    )


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence,
    bucket_col: str = "bucket",
) -> DataFrame:
    """``df`` plus the exact ``ntile(n)`` bucket under ``order_cols`` —
    :func:`with_global_rank` composed with :func:`ntile_from_rank`."""
    ranked = with_global_rank(
        df, order_cols, rank_col="_grank", total_col="_gtotal"
    )
    return ranked.withColumn(
        bucket_col,
        ntile_from_rank(F.col("_grank"), F.col("_gtotal"), n),
    ).drop("_grank", "_gtotal")


def with_global_cumsum(
    df: DataFrame,
    order_cols: Sequence,
    value_col: str,
    cumsum_col: str = "global_cumsum",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` plus the exact running total of ``value_col`` under the
    global ``order_cols`` order (include a unique tiebreaker), computed
    without any single task holding the full order — the prefix-sum
    behind budget-constrained selection ("keep best docs until B
    tokens"), quota assignment, and exact CDFs.

    Same shape as :func:`with_global_rank`: range-repartition on the
    order (a distributed sort), per-partition local cumsum (bounded
    windows), and a broadcast of per-partition VALUE TOTALS turning
    local prefixes into global ones.  ``value_col`` must be integral
    (long) — integer addition is order-free, so the result is exact and
    engine-independent; quantize floats first (the catalog convention).
    NULL values count as 0 (documented divergence from the
    unpartitioned-window form, whose prefix stays NULL until the first
    non-null value globally — a quirk no budget consumer wants and one
    a partitioned prefix-sum cannot reproduce).
    ``total_col`` optionally attaches the grand total (the budget
    denominator) to every row."""
    reserved = {"_pid", "_lcs", "_off", "_n", cumsum_col} | (
        {total_col} if total_col else set()
    )
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"with_global_cumsum reserves column names {sorted(reserved)}; "
            f"rename the clashing input columns ({sorted(clash)})"
        )
    # NULL contract: treat NULL values as 0 (coalesce BEFORE both the
    # offsets agg and the local cumsum) — the unpartitioned-window form
    # would instead leave a NULL prefix until the first non-null value
    # globally, a quirk no budget/quota consumer wants, and one the
    # partitioned form cannot reproduce anyway (a partition of all-NULL
    # prefix rows cannot know the global carry was NULL vs 0)
    v = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    d, offs, cols = _range_partitioned_offsets(df, order_cols, F.sum(v))
    wl = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    summed = (
        d.withColumn("_lcs", F.sum(v).over(wl))
        .join(F.broadcast(offs), "_pid")
        .withColumn(cumsum_col, F.col("_off") + F.col("_lcs"))
    )
    keep = [*df.columns, cumsum_col] + ([total_col] if total_col else [])
    if total_col:
        summed = summed.withColumn(total_col, F.col("_n"))
    return summed.select(*keep)
