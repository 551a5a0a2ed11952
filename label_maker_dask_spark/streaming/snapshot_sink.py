"""Snapshot-versioned maintenance sinks: every micro-batch publishes the
maintained table as a new immutable snapshot version.

The rename-aside sinks (:mod:`streaming.upsert`, :mod:`streaming.bucketed`)
destroy history — after a bad batch (upstream bug, poisoned CDC feed) the
previous state is gone.  These variants publish each batch's merged result
through :func:`sources.snapshots.write_snapshot` instead:

- **pinned reads**: a training run reads ``v=N`` forever while
  maintenance keeps publishing;
- **O(1) rollback**: ``sources.snapshots.rollback`` repoints ``_latest``
  at any retained version — no data rewritten;
- **exactly-once, folded into the snapshot**: the batch marker
  (run id + batch id) is written INTO the version directory before its
  atomic rename, so marker and data publish together.  On replay the
  highest version's marker decides: an already-published batch is
  skipped (and ``_latest`` re-pointed at it, healing a crash between the
  version rename and the pointer move).

Maintenance lineage follows the HIGHEST version, not the ``_latest``
pointer — a consumer-facing rollback must not silently fork the
maintained state.  The rollback-and-replay contract is therefore: roll
back, replay the stream, and the replayed batches re-point ``_latest``
forward onto the same lineage (tested in tests/test_snapshot_sink.py).

Storage: each version is a full copy (the price of O(1) rollback without
a table-format transaction log); ``keep`` bounds retained versions via
``expire_snapshots`` after each publish.  For base tables where the
per-batch full write itself is the bottleneck, the bucketed sink is the
scale path and this sink is the auditability path — the two trade a
knob the user picks per table.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.merge import merge_upsert
from label_maker_dask_spark.sources.snapshots import (
    _point_latest,
    _versions,
    expire_snapshots,
    read_snapshot,
    snapshot_metadata,
    write_snapshot,
)
from label_maker_dask_spark.streaming.bucketed import _additive_merge
from label_maker_dask_spark.streaming.upsert import (
    compact_last_per_key,
    ensure_run_id,
)


def _lineage_state(table_path: str) -> Tuple[Optional[int], Optional[str], int]:
    """(highest version, its run id, its batch id) — the maintenance
    lineage tip, independent of where ``_latest`` points."""
    vs = _versions(table_path)
    if not vs:
        return None, None, -1
    meta = snapshot_metadata(table_path, vs[-1]) or {}
    return vs[-1], meta.get("run"), int(meta.get("batch", -1))


def _check_replay(
    table_path: str, run_id: Optional[str], batch_id: int
) -> Tuple[Optional[int], bool]:
    """→ (lineage-tip version, already_applied).  Raises on a foreign run
    id; heals a crash between version rename and pointer move by
    re-pointing ``_latest`` at an already-published batch."""
    tip, stored_run, applied = _lineage_state(table_path)
    if (
        run_id is not None
        and stored_run is not None
        and stored_run != run_id
    ):
        raise ValueError(
            f"snapshot sink: table {table_path!r} was maintained by a "
            f"different stream run ({stored_run!r}, this run {run_id!r}); "
            "batch ids are only comparable within one checkpoint lifetime. "
            "Recreate table and checkpoint together."
        )
    if tip is not None and applied >= batch_id:
        _point_latest(table_path, tip)
        return tip, True
    return tip, False


def upsert_snapshot_batch(
    batch: DataFrame,
    table_path: str,
    keys: Sequence[str],
    seq_col: str,
    batch_id: int,
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    run_id: Optional[str] = None,
    keep: Optional[int] = None,
) -> Optional[int]:
    """Apply one CDC micro-batch, publishing the merged table as the next
    snapshot version; returns the published version (None if the batch
    was an already-applied replay)."""
    spark = batch.sparkSession
    tip, applied = _check_replay(table_path, run_id, batch_id)
    if applied:
        return None
    compacted = compact_last_per_key(batch, keys, seq_col).drop(seq_col)
    if tip is not None:
        base = read_snapshot(spark, table_path, version=tip)
        merged = merge_upsert(
            base,
            compacted,
            keys=keys,
            update_cols=update_cols,
            delete_col=delete_col,
            broadcast_source=True,
            assume_unique_source=True,  # compact_last_per_key guarantees it
        )
    else:
        merged = compacted
        if delete_col:
            merged = merged.where(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
    v = write_snapshot(
        merged, table_path, metadata={"run": run_id, "batch": batch_id}
    )
    if keep is not None:
        expire_snapshots(table_path, keep=keep)
    return v


def accumulate_snapshot_batch(
    batch: DataFrame,
    table_path: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    batch_id: int,
    run_id: Optional[str] = None,
    keep: Optional[int] = None,
) -> Optional[int]:
    """Additive twin of :func:`upsert_snapshot_batch`: per-key running
    sums, one snapshot version per batch.  The in-snapshot marker is what
    makes the non-idempotent addition exactly-once under replay."""
    spark = batch.sparkSession
    tip, applied = _check_replay(table_path, run_id, batch_id)
    if applied:
        return None
    agg = batch.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in sum_cols])
    if tip is not None:
        base = read_snapshot(spark, table_path, version=tip)
        merged = _additive_merge(base, agg, keys, sum_cols)
    else:
        merged = agg
    v = write_snapshot(
        merged, table_path, metadata={"run": run_id, "batch": batch_id}
    )
    if keep is not None:
        expire_snapshots(table_path, keep=keep)
    return v


def stream_upsert_to_snapshots(
    changes: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: Sequence[str],
    seq_col: str,
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    keep: Optional[int] = None,
    available_now: bool = True,
):
    """:func:`streaming.upsert.stream_upsert_to_parquet` semantics, but
    every batch publishes a snapshot version (pinned reads + O(1)
    rollback) instead of overwriting the base in place.  ``keep`` bounds
    retained versions (None = keep all)."""
    run_id = ensure_run_id(checkpoint)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_snapshot_batch(
            batch, table_path, keys, seq_col, batch_id,
            update_cols=update_cols, delete_col=delete_col,
            run_id=run_id, keep=keep,
        )

    writer = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_accumulate_to_snapshots(
    deltas: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    keep: Optional[int] = None,
    available_now: bool = True,
):
    """:func:`streaming.upsert.stream_accumulate_to_parquet` semantics
    with snapshot-versioned publishes."""
    run_id = ensure_run_id(checkpoint)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        accumulate_snapshot_batch(
            batch, table_path, keys, sum_cols, batch_id,
            run_id=run_id, keep=keep,
        )

    writer = (
        deltas.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "upsert_snapshot_batch",
    "accumulate_snapshot_batch",
    "stream_upsert_to_snapshots",
    "stream_accumulate_to_snapshots",
]
