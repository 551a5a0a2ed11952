"""Streaming CDC apply: maintain an upserted parquet table from a change
stream — the materialized-view-maintenance half of Structured Streaming
that plain append sinks can't express.

Each micro-batch is (1) compacted to its LAST change per key (a CDC batch
legitimately carries several changes for one key; ``seq_col`` orders them),
then (2) merged onto the base table with
:func:`operators.merge.merge_upsert` (the batch is already key-unique, so
the merge skips its duplicate-key scan), and (3) the merged table swaps in
via write-to-temp + rename-aside — reading and overwriting the same path
in one job would corrupt the base mid-scan.

Crash safety: the swap is ``rename(base, base._old); rename(tmp, base);
rmtree(._old)`` — the base directory is never deleted before its
replacement exists.  ``_recover`` runs before every batch and finishes any
interrupted swap: a leftover ``._old`` means the ``._applying`` write had
completed (the base is only set aside *after* the write succeeds), so the
tmp dir is promoted; a leftover ``._applying`` with no ``._old`` is an
incomplete write and is discarded.  Without this, a crash between delete
and rename would make the next batch see "no base table" and silently
rebuild it from that one batch.

Exactly-once: the sink is idempotent by construction — re-applying a batch
after a failure merges the same keys to the same values — and the
checkpointed foreachBatch epoch log skips batches that fully committed.

Scale posture: per batch, the merge is the broadcast-left-join +
keys-only-anti shape (base table never shuffles); the rewrite cost is the
base table scan+write, which is the honest price of upsert-on-parquet —
at real scale the same operator targets a table format whose MERGE commits
file-level deltas instead of a full rewrite (the plan shape is identical).
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import uuid
import contextlib
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.merge import merge_upsert

_LOCK_NAME = "_lmds_writer_lock"


def break_writer_lock(base_path: str) -> bool:
    """Manually remove a maintained table's writer lock.  ONLY for
    operator intervention after verifying the writer named in the lock
    file is dead — breaking a live writer's lock reintroduces exactly
    the concurrent-publish corruption the lock exists to prevent.
    Returns True if a lock was removed."""
    path = os.path.join(base_path, _LOCK_NAME)
    if os.path.exists(path):
        os.remove(path)
        return True
    return False


def _holder_is_dead(holder: dict) -> bool:
    """Whether a lock file's recorded holder is verifiably dead.  Same
    pid on the same host is THIS process (its own crash leftover from an
    earlier batch).  A different pid on the same host is probed with
    ``os.kill(pid, 0)`` — only ``ProcessLookupError`` proves death
    (``PermissionError`` means alive-but-other-user).  A holder on
    another host, or one with no usable pid/host, is unverifiable and
    treated as alive — the caller must fail rather than guess."""
    pid, host = holder.get("pid"), holder.get("host")
    if not isinstance(pid, int) or host != socket.gethostname():
        return False
    if pid == os.getpid():
        return True
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except OSError:
        pass
    return False


@contextlib.contextmanager
def writer_lock(base_path: str, run_id: Optional[str]) -> Iterator[None]:
    """Single-writer guard for maintained tables (bucketed / versioned
    maintenance): a create-exclusive lock file under the table root so a
    SECOND CONCURRENT WRITER fails fast instead of corrupting a publish
    (two interleaved apply calls could rename bucket directories over
    each other and publish manifests that reference half of each).

    The run-id markers catch checkpoint resets *between* batches; they
    cannot catch two writers racing *within* one — hence the lock.

    Semantics:

    - acquisition is ``open(path, 'x')`` — atomic on a local/POSIX
      filesystem (on object stores, a table format's optimistic commit
      protocol replaces this file);
    - a lock left behind by OUR OWN run (same non-None ``run_id``) is
      reclaimed ONLY when the recorded holder is verifiably dead: same
      process (a crash leftover from an earlier batch of this writer),
      or same host with ``os.kill(pid, 0)`` reporting no such process.
      "One writer per run" holds within one driver (``foreachBatch``
      executes batches serially) but NOT across drivers — a second
      driver started from the same checkpoint carries the same run id,
      and reclaiming its live lock would let both interleave bucket
      swaps, the exact corruption the lock prevents;
    - a matching-run lock whose holder is alive, or on another host
      (liveness unverifiable), raises like any foreign lock;
    - any other lock raises, naming the holder and the
      :func:`break_writer_lock` escape hatch for a verified-dead
      holder.  With ``run_id=None`` (direct batch calls) every leftover
      lock is treated as foreign — fail-loud beats guessing."""
    os.makedirs(base_path, exist_ok=True)
    path = os.path.join(base_path, _LOCK_NAME)
    token = {
        "run": run_id,
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "nonce": uuid.uuid4().hex,
    }
    payload = json.dumps(token)
    try:
        with open(path, "x") as fh:
            fh.write(payload)
    except FileExistsError:
        try:
            with open(path) as fh:
                holder = json.loads(fh.read() or "{}")
        except (OSError, ValueError):
            holder = {}
        if (
            run_id is not None
            and holder.get("run") == run_id
            and _holder_is_dead(holder)
        ):
            # our own run's verified-dead crash leftover — reclaim
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(payload)
            os.replace(tmp, path)
        else:
            raise ValueError(
                f"writer_lock: table {base_path!r} is locked by another "
                f"writer (holder {holder!r}). Concurrent maintenance of "
                "one base table is not supported — stop the other "
                "writer, or if it is verified dead, remove the lock "
                "with streaming.upsert.break_writer_lock()."
            )
    try:
        yield
    finally:
        # release only if we still hold it (a broken+re-acquired lock
        # belongs to someone else now)
        try:
            with open(path) as fh:
                holder = json.loads(fh.read() or "{}")
            if holder.get("nonce") == token["nonce"]:
                os.remove(path)
        except (OSError, ValueError):
            pass


def compact_last_per_key(
    batch: DataFrame, keys: Sequence[str], seq_col: str
) -> DataFrame:
    """Keep each key's LAST change by ``seq_col`` (ties impossible when
    ``seq_col`` is unique per key, e.g. a CDC log offset)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _recover(base_path: str) -> None:
    """Finish an interrupted base-table swap (idempotent; see module
    docstring).  ``._old`` present means the tmp write had completed:
    promote tmp if the swap died between the two renames, then drop the
    set-aside copy.  A tmp dir with no ``._old`` is an incomplete write."""
    tmp = base_path + "._applying"
    old = base_path + "._old"
    if os.path.exists(old):
        if not os.path.exists(base_path):
            if os.path.exists(tmp):
                os.rename(tmp, base_path)
            else:  # unreachable by the swap's ordering, but restore anyway
                os.rename(old, base_path)
        if os.path.exists(old):
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def stream_upsert_to_parquet(
    changes: DataFrame,
    base_path: str,
    checkpoint: str,
    keys: Sequence[str],
    seq_col: str,
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    available_now: bool = True,
    evolve_schema: bool = False,
):
    """Start a streaming query applying ``changes`` onto the parquet table
    at ``base_path``; returns the StreamingQuery.  The base table need not
    exist yet — the first batch creates it (minus ``seq_col``/
    ``delete_col``, which are change-log metadata, not table columns).

    ``evolve_schema`` passes through to :func:`merge_upsert`: a NEW
    column appearing in the change feed (the rolling-upgrade shape — the
    stream restarts with a widened source schema) widens the base with
    typed NULLs instead of being silently dropped.  Safe here because
    this sink REWRITES the base each batch, so the stored table always
    has exactly one schema; the bucket-pruned sink rewrites only touched
    buckets and deliberately does NOT offer this knob."""

    # the stored table's schema, cached after the first read/write so later
    # batches skip the footer-inference job a bare read pays every time
    base_schema = [None]

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        _recover(base_path)
        spark = batch.sparkSession
        compacted = compact_last_per_key(batch, keys, seq_col).drop(seq_col)
        meta = [c for c in ([delete_col] if delete_col else [])]
        tmp = base_path + "._applying"
        if os.path.exists(base_path):
            reader = spark.read
            if base_schema[0] is not None:
                reader = reader.schema(base_schema[0])
            base = reader.parquet(base_path)
            merged = merge_upsert(
                base,
                compacted,
                keys=keys,
                update_cols=update_cols,
                delete_col=delete_col,
                broadcast_source=True,
                assume_unique_source=True,  # compact_last_per_key guarantees it
                evolve_schema=evolve_schema,
            )
        else:
            first = compacted
            if delete_col:
                first = first.where(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                )
            merged = first.drop(*meta)
        merged.write.mode("overwrite").parquet(tmp)
        base_schema[0] = merged.schema
        _swap_in(tmp, base_path)

    writer = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_BATCH_MARKER = "_lmds_applied_batch"


def _swap_in(tmp: str, base_path: str) -> None:
    """Rename-aside swap (see module docstring): the base is only set
    aside once ``tmp`` is complete, so every crash point leaves a state
    :func:`_recover` can finish."""
    old = base_path + "._old"
    if os.path.exists(base_path):
        os.rename(base_path, old)
    os.rename(tmp, base_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _applied_state(base_path: str) -> tuple:
    """Read the in-table marker → ``(run_id, batch_id)``.  The marker is
    JSON ``{"run": ..., "batch": N}``; a legacy plain-int marker parses as
    ``(None, N)``."""
    marker = os.path.join(base_path, _BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            raw = fh.read().strip()
        try:
            state = json.loads(raw)
            if isinstance(state, dict):
                return state.get("run"), int(state.get("batch", -1))
        except ValueError:
            pass
        return None, int(raw)
    return None, -1


def _write_marker(dir_path: str, run_id: Optional[str], batch_id: int) -> None:
    with open(os.path.join(dir_path, _BATCH_MARKER), "w") as fh:
        fh.write(json.dumps({"run": run_id, "batch": batch_id}))


def ensure_run_id(checkpoint: str) -> str:
    """The sink's run identity, stored inside the checkpoint directory so
    base table and checkpoint age together.  Batch ids restart from 0
    whenever a checkpoint is recreated — so a bare batch-id marker would
    silently skip every delta of a fresh stream pointed at an existing
    base table (or of two streams sharing one base).  A run id minted once
    per checkpoint turns that silent data loss into a loud error at the
    first batch."""
    os.makedirs(checkpoint, exist_ok=True)
    path = os.path.join(checkpoint, "_lmds_run_id")
    if os.path.exists(path):
        with open(path) as fh:
            return fh.read().strip()
    run_id = uuid.uuid4().hex
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(run_id)
    os.replace(tmp, path)
    return run_id


def accumulate_batch(
    batch: DataFrame,
    base_path: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    batch_id: int,
    run_id: Optional[str] = None,
) -> None:
    """Apply one micro-batch of ADDITIVE deltas onto the parquet table at
    ``base_path``: stored row = running sum of every delta seen per key.

    Unlike last-write upsert, accumulation is NOT idempotent on replay —
    re-adding a batch double-counts — so exactly-once needs more than the
    checkpoint log (which only skips batches whose COMMIT completed): the
    applied batch id rides inside the swapped table directory itself
    (``_lmds_applied_batch``, written into the tmp dir before the swap).
    A batch that applied but crashed before the checkpoint commit is
    replayed by the engine and skipped here by the marker — the
    table-and-marker pair changes atomically with the rename-aside swap.

    Plan shape per batch: deltas pre-aggregate map-side to one row per
    key, the matched path is a broadcast left join (base never shuffles),
    inserts anti-join against the base's key columns only — the
    merge_upsert posture, with addition instead of replacement.
    """
    spark = batch.sparkSession
    stored_run, applied = _applied_state(base_path)
    if run_id is not None and stored_run is not None and stored_run != run_id:
        raise ValueError(
            f"accumulate_batch: base table {base_path!r} was built by a "
            f"different stream run ({stored_run!r}, this run {run_id!r}). "
            "Batch ids are only comparable within one checkpoint lifetime; "
            "applying this stream would silently drop or double-count "
            "deltas. Recreate base table and checkpoint together, or point "
            "this stream at a fresh base path."
        )
    if applied >= batch_id:
        return  # replay of an applied-but-uncommitted batch
    agg = batch.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    if os.path.exists(base_path):
        # the marker is an underscore-prefixed data file — Spark's parquet
        # listing ignores it, like _SUCCESS
        base = spark.read.parquet(base_path)
        d = F.broadcast(agg).alias("d")
        t = base.alias("t")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
        matched = t.join(d, on=cond, how="left").select(
            *[F.col(f"t.{k}").alias(k) for k in keys],
            *[
                (
                    F.col(f"t.{c}")
                    + F.coalesce(F.col(f"d.{c}"), F.lit(0))
                ).alias(c)
                for c in sum_cols
            ],
        )
        tk = base.select(*keys).alias("tk")
        ins = (
            agg.alias("i")
            .join(
                tk,
                on=[F.col(f"i.{k}").eqNullSafe(F.col(f"tk.{k}")) for k in keys],
                how="left_anti",
            )
        )
        merged = matched.unionByName(ins.select(*keys, *sum_cols))
    else:
        merged = agg
    tmp = base_path + "._applying"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, run_id if run_id is not None else stored_run, batch_id)
    _swap_in(tmp, base_path)


def stream_accumulate_to_parquet(
    deltas: DataFrame,
    base_path: str,
    checkpoint: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    available_now: bool = True,
):
    """Maintain a parquet table of per-key RUNNING SUMS from a stream of
    additive deltas (counts, totals) — the sink for incrementally-built
    aggregates like the stateful transition-graph edge list
    (``streaming.stateful.streaming_transition_counts``): drain the edge
    deltas through this and the stored table equals the batch edge
    counts, ready for e.g. PageRank over a continuously-updated graph.

    Exactly-once via the in-table batch marker (see
    :func:`accumulate_batch`); same crash-recoverable swap as the upsert
    sink."""

    run_id = ensure_run_id(checkpoint)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _recover(base_path)
        accumulate_batch(
            batch, base_path, keys, sum_cols, batch_id, run_id=run_id
        )

    # append mode: every delta row is emitted exactly once and then added
    # into the base — matching the stateful edge-builder's output mode
    writer = (
        deltas.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "compact_last_per_key",
    "stream_upsert_to_parquet",
    "stream_accumulate_to_parquet",
    "accumulate_batch",
    "ensure_run_id",
    "_recover",
]
