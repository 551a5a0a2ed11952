"""As-of join (point-in-time join): for each left row, the latest right row
whose time key is <= the left row's time key, within an equi-key group.

Spark has no native as-of join; the scalable composition is equi-join on the
group key with the range predicate, then one window ``row_number`` over the
left row's unique key to keep the most recent match.  The shuffle key is the
equi key, so skew behaves like any keyed join (salt if a key dominates); the
window partitions by left primary key and is thus bounded.  (DuckDB's native
``ASOF JOIN`` replays the same semantics for the oracle.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    left_key: Sequence[str],
    tie_break: str,
    how: str = "inner",
    tolerance: str | None = None,
) -> DataFrame:
    """Latest right row with ``right_time <= left_time`` per left row.

    ``left_key`` is the left side's unique key (window partition);
    ``tie_break`` a unique right-side column so equal right timestamps
    resolve deterministically (largest wins).  ``tolerance`` (an INTERVAL
    expression string, e.g. ``"INTERVAL 30 DAY"``) bounds the lookback:
    matches older than ``left_time - tolerance`` are ignored — pandas
    ``merge_asof(tolerance=...)`` semantics.  Bounding the lookback also
    bounds the join fan-out at scale: without it, one left row can pair
    with the key's entire right-side history before the window cut.
    """
    lt = F.col(f"__l.{left_time}")
    rt = F.col(f"__r.{right_time}")
    cond = rt <= lt
    if tolerance is not None:
        cond = cond & (rt >= lt - F.expr(tolerance))
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    joined = left.alias("__l").join(right.alias("__r"), cond, how)
    left_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    right_cols = [
        F.col(f"__r.{c}").alias(c) for c in right.columns if c not in set(on)
    ]
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in left_key]).orderBy(
        rt.desc(), F.col(f"__r.{tie_break}").desc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*left_cols, *right_cols)
    )
