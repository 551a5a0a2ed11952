"""Heavy hitters (frequent items) with a candidate sketch pass and an
exact verification pass — EXACT results at a sketch's shuffle cost.

A plain ``groupBy(item).count()`` is *correct* at any scale (Spark's
hash aggregate spills), but it shuffles one row per DISTINCT item —
at corpus scale, billions of rows crossing the exchange to find the
handful above threshold.  The classic fix (Misra-Gries / space-saving)
keeps at most ``m`` counters per data chunk; the pigeonhole guarantee
is that any item with GLOBAL frequency > n/(m+1) must exceed the local
threshold in at least one chunk (if it were at or below n_c/(m+1) in
every chunk, summing gives <= n/(m+1)).  So the union of per-chunk
survivors is a SUPERSET of the true heavy hitters, with at most
``m+1`` survivors per chunk crossing the shuffle — O(chunks x m), not
O(distinct).

Pass 2 re-scans the fact filtered to the (broadcast-small) candidate
set and counts exactly — so the output is EXACT and order-independent
(any chunking yields the same final rows), which is what makes the
DuckDB oracle a plain ``HAVING count(*) * k > n`` query.

No counterpart in the reference (`/root/reference/` has no
aggregations at all); Part-B engine surface.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from label_maker_dask_spark.operators.materialize import materialize
from pyspark.sql import functions as F


def heavy_hitter_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """One Arrow-batched scan emitting, per batch, the items whose
    batch frequency exceeds batch_n/k (the survivors, <= k-1 of them)
    plus one ``(NULL, batch_n)`` tally row.  Returns a frame with
    ``(item, n)``: the distinct non-null items are the candidate
    superset; ``sum(n) where item is null`` is the exact total count.

    Within a batch the counts are exact (vectorized ``value_counts``
    over rows already materialized in the Arrow buffer — the streaming
    Misra-Gries counter array would bound state tighter but the batch
    is in memory either way); across batches only survivors travel."""
    import pandas as pd

    item_type = df.schema[col].dataType.simpleString()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            counts = pdf[col].value_counts()
            keep = counts[counts * k > n]
            yield pd.DataFrame(
                {
                    "item": list(keep.index) + [None],
                    "n": list(keep.to_numpy()) + [n],
                }
            )

    return df.select(col).mapInPandas(gen, f"item {item_type}, n long")


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT frequent items: every value of ``col`` occurring in more
    than 1/k of ``df``'s rows, with its exact count — via the
    candidate-sketch + verify shape (module docstring).  Returns
    ``(item, n_rows, total_rows)``; the threshold test is pure integer
    arithmetic (``n_rows * k > total_rows``), so both engines agree
    bit-for-bit."""
    # materialized once (it is referenced twice: total + items) — the
    # survivors frame is O(chunks x k), tiny by construction
    cand = heavy_hitter_candidates(df, col, k).transform(materialize, eager=True)
    total = cand.where(F.col("item").isNull()).agg(
        F.sum("n").alias("total_rows")
    )
    items = cand.where(F.col("item").isNotNull()).select(
        F.col("item")
    ).distinct()
    exact = (
        df.join(
            F.broadcast(items),
            df[col] == items["item"],
            "left_semi",
        )
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_rows") * k > F.col("total_rows"))
        .select("item", "n_rows", "total_rows")
    )


__all__ = ["heavy_hitter_candidates", "heavy_hitters"]
