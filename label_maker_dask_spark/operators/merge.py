"""CDC merge / upsert (SCD type 1) as a composition of built-in DataFrame ops.

The reference pipeline is append-only (results gathered once,
``main.py:109-111``); a production training-data store needs the other half
— applying a change stream (updates + inserts + deletes) onto a base table.
Without a transactional table format in this environment, the merge is
expressed as the standard Spark pattern: a single **full outer join** on the
merge keys, then one ``when`` cascade per output column.  That is exactly
the shuffle shape Delta/Iceberg MERGE compiles to (minus the file-level
transaction log), so the plan survives scale-up: one shuffle of each side on
the key, no driver materialization, and the small change-set side is
broadcast when it fits.

Semantics (deterministic, order-free):
- key in both      -> ``when_matched``  (update: source column wins)
- key only in src  -> ``when_not_matched`` (insert)
- key only in tgt  -> carried through unchanged (or dropped if the source
  row carries ``delete_col = true``)
Duplicate keys on the source side are rejected up front — SQL MERGE raises
on multi-row matches, and silently joining them would fan out the target.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    broadcast_source: bool = False,
    action_col: Optional[str] = None,
) -> DataFrame:
    """Apply ``source`` onto ``target`` by ``keys``; returns the merged table.

    ``update_cols`` defaults to every non-key column the two frames share.
    ``delete_col`` names a boolean column on the source marking deletions.
    ``broadcast_source`` hints the typical CDC shape (small change batch vs
    huge base): the outer join then needs no shuffle of the target at all.
    ``action_col`` (optional) appends a column with 'update'/'insert'/
    'keep'/'delete' for audit sinks; deleted rows are filtered out either
    way.

    100 TB posture: one equi-join on the merge key (broadcast when the
    change set is small, sort-merge otherwise — AQE picks); column updates
    are pure projections.  Nothing is collected.
    """
    if update_cols is None:
        shared = set(target.columns) & set(source.columns)
        update_cols = [c for c in target.columns if c in shared and c not in keys]
    dup = source.groupBy(*keys).count().where(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(
            "merge_upsert: source has duplicate merge keys; "
            "MERGE semantics require at most one source row per key"
        )

    # presence markers, not key-isNotNull: a legitimately-NULL key value on
    # one side must not read as "row absent"
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s0 = source.withColumn("_s_present", F.lit(True))
    s = (F.broadcast(s0) if broadcast_source else s0).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, on=cond, how="full_outer")

    t_hit = F.col("t._t_present").isNotNull()
    s_hit = F.col("s._s_present").isNotNull()
    deleted = (
        (s_hit & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False)))
        if delete_col
        else F.lit(False)
    )

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            out_cols.append(
                F.when(s_hit, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    if action_col:
        out_cols.append(
            F.when(deleted, F.lit("delete"))
            .when(t_hit & s_hit, F.lit("update"))
            .when(s_hit, F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias(action_col)
        )
    return joined.where(~deleted).select(*out_cols)


__all__ = ["merge_upsert"]
