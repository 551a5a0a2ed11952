"""Bucket-pruned maintenance sinks: per-batch cost scales with the DELTA,
not the base table.

The plain sinks in :mod:`streaming.upsert` rewrite the whole base table
every micro-batch — crash-safe and simple, but at 100 TB a batch touching
1% of keys pays a 100% rewrite.  This module stores the maintained table
hash-bucketed by its merge key:

    <base>/_lmds_table.json          table metadata (n_buckets, keys,
                                     cached data schema)
    <base>/lmdsb=0/part-*.parquet    one directory per key bucket,
    <base>/lmdsb=1/...               each carrying a ``_lmds_state``
    ...                              marker (run id + highest applied
                                     batch id for THAT bucket)

and per micro-batch rewrites ONLY the bucket directories whose keys
appear in the delta: one Spark job reads exactly the touched directories
(path-listed, explicit cached schema — no footer inference, no listing of
untouched buckets), merges the delta, and writes the replacements
partitioned by bucket to a scratch directory; each touched bucket then
swaps in with the same rename-aside dance the plain sink uses, per
bucket directory.  Expected touched buckets for a k-key delta over n
buckets is ``n·(1-(1-1/n)^k) ≈ k`` when k ≪ n, so batch cost follows
delta size while the base grows without bound (measured:
``tools/scaling_probe.py`` bucketed-maintenance cell, SCALE.md).

Crash safety mirrors the plain sink, bucket-wise.  All scratch buckets
are fully written BEFORE any rename starts, so a set-aside directory
under ``<base>._old/`` proves its replacement under ``<base>._scratch/``
is complete; :func:`_recover_bucketed` finishes any torn swap and
discards leftover scratch.  A bucket's marker is written into its
scratch directory before the swap, so marker and data change atomically.

Exactly-once under partial application: a crash mid-batch leaves some
buckets swapped (marker == batch id) and some not.  The engine replays
the batch; the delta and its key→bucket hash are deterministic, so
already-applied buckets are skipped by their marker and the rest apply —
additive accumulation never double-counts.  Markers also carry the run
id minted per checkpoint (:func:`streaming.upsert.ensure_run_id`):
pointing a FRESH stream (batch ids restarted at 0) at an existing base
raises instead of silently dropping deltas.

A plain ``spark.read.parquet(base)`` still works — the bucket directories
are partition-discovery style, surfacing ``lmdsb`` as an int partition
column with pruning on key-bucket point lookups for free;
:func:`read_maintained_table` hides the column and skips schema
inference via the cached metadata.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructType

from label_maker_dask_spark.operators.merge import merge_upsert
from label_maker_dask_spark.streaming.upsert import (
    _BATCH_MARKER,
    _write_marker,
    compact_last_per_key,
    ensure_run_id,
)

#: The partition-column name for the key-hash bucket.  NOT
#: underscore-prefixed — parquet readers skip underscore-prefixed paths,
#: and the bucket directories must remain visible to a plain read.
BUCKET_COL = "lmdsb"

_TABLE_META = "_lmds_table.json"


def _bucket_expr(keys: Sequence[str], n_buckets: int):
    """Deterministic key→bucket hash; stable across batches, replays and
    sessions (xxhash64 is seed-fixed), which the partial-replay skip
    depends on."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        IntegerType()
    )


def _read_table_meta(base_path: str) -> Optional[dict]:
    path = os.path.join(base_path, _TABLE_META)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _write_table_meta(base_path: str, meta: dict) -> None:
    tmp = os.path.join(base_path, _TABLE_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(base_path, _TABLE_META))


def _bucket_dir(base_path: str, i: int) -> str:
    return os.path.join(base_path, f"{BUCKET_COL}={i}")


def _bucket_state(base_path: str, i: int) -> Tuple[Optional[str], int]:
    marker = os.path.join(_bucket_dir(base_path, i), _BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            state = json.load(fh)
        return state.get("run"), int(state.get("batch", -1))
    return None, -1


def _recover_bucketed(base_path: str) -> None:
    """Finish any torn per-bucket swap (idempotent; module docstring).
    A directory under ``._old`` means the scratch write had completed, so
    a missing base bucket is promoted from scratch; leftover scratch is
    then discarded — the checkpoint replays the batch and the markers of
    already-swapped buckets keep the replay exactly-once."""
    scratch = base_path + "._scratch"
    oldd = base_path + "._old"
    if os.path.isdir(oldd):
        for name in sorted(os.listdir(oldd)):
            if not name.startswith(BUCKET_COL + "="):
                continue
            tgt = os.path.join(base_path, name)
            src = os.path.join(scratch, name)
            kept = os.path.join(oldd, name)
            if not os.path.exists(tgt):
                if os.path.isdir(src):
                    os.rename(src, tgt)
                else:  # unreachable by the swap ordering; restore set-aside
                    os.rename(kept, tgt)
            if os.path.exists(kept):
                shutil.rmtree(kept)
        shutil.rmtree(oldd, ignore_errors=True)
    if os.path.isdir(scratch):
        shutil.rmtree(scratch)


def _schema_with_bucket(meta: dict) -> StructType:
    schema = StructType.fromJson(json.loads(meta["schema"]))
    return schema.add(BUCKET_COL, IntegerType())


def read_maintained_table(
    spark: SparkSession, base_path: str, with_bucket: bool = False
) -> DataFrame:
    """Read a maintained table, bucketed or plain.  For bucketed tables
    the cached metadata schema skips footer inference and the bucket
    partition column is hidden unless asked for."""
    meta = _read_table_meta(base_path)
    if meta is None:
        return spark.read.parquet(base_path)
    df = (
        spark.read.schema(_schema_with_bucket(meta))
        .option("basePath", base_path)
        .parquet(base_path)
    )
    return df if with_bucket else df.drop(BUCKET_COL)


def key_lookup(spark: SparkSession, base_path: str, **key_values) -> DataFrame:
    """Point lookup on a bucketed maintained table with PARTITION pruning:
    the key's bucket is computed driver-side (same xxhash64 the writer
    used, evaluated by a 1-row Spark expression so the hash is
    bit-identical), and the scan filters on BOTH the bucket partition
    column and the key — so only ONE bucket directory's files are listed
    and read, no matter how many buckets the table has (asserted in
    tests/test_plans.py).  A plain ``where(k = v)`` would still scan
    every bucket: Spark cannot derive ``lmdsb = hash(k)`` on its own."""
    meta = _read_table_meta(base_path)
    if meta is None:
        raise ValueError(f"{base_path!r} is not a bucketed maintained table")
    keys = list(meta["keys"])
    if sorted(key_values) != sorted(keys):
        raise ValueError(
            f"key_lookup needs exactly the table keys {keys}, "
            f"got {sorted(key_values)}"
        )
    n = int(meta["n_buckets"])
    # cast each literal to the STORED key type before hashing — xxhash64
    # is type-sensitive, so hashing an int literal against a long column's
    # buckets would silently land in the wrong (usually empty) bucket
    schema = StructType.fromJson(json.loads(meta["schema"]))
    ktype = {f.name: f.dataType for f in schema.fields}
    typed = {
        k: F.lit(key_values[k]).cast(ktype[k]) for k in keys
    }
    one = spark.range(1).select(*[typed[k].alias(k) for k in keys])
    bucket = one.select(_bucket_expr(keys, n).alias("b")).collect()[0]["b"]
    df = read_maintained_table(spark, base_path, with_bucket=True)
    cond = F.col(BUCKET_COL) == int(bucket)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(typed[k])
    return df.where(cond).drop(BUCKET_COL)


def _apply_bucketed(
    delta: DataFrame,
    base_path: str,
    keys: Sequence[str],
    n_buckets: int,
    batch_id: int,
    run_id: Optional[str],
    merge_fn: Callable[[Optional[DataFrame], DataFrame], DataFrame],
) -> None:
    """Merge one (key-unique or key-aggregated) delta into the bucketed
    base, rewriting only touched buckets, under the single-writer lock
    (see :func:`streaming.upsert.writer_lock`: a second concurrent
    writer raises instead of interleaving bucket swaps).
    ``merge_fn(base_part, delta)`` returns the replacement rows for the
    touched buckets; ``base_part`` is None when none of them exist
    yet."""
    from label_maker_dask_spark.streaming.upsert import writer_lock

    with writer_lock(base_path, run_id):
        _apply_bucketed_locked(
            delta, base_path, keys, n_buckets, batch_id, run_id, merge_fn
        )


def _apply_bucketed_locked(
    delta: DataFrame,
    base_path: str,
    keys: Sequence[str],
    n_buckets: int,
    batch_id: int,
    run_id: Optional[str],
    merge_fn: Callable[[Optional[DataFrame], DataFrame], DataFrame],
) -> None:
    if BUCKET_COL in delta.columns:
        raise ValueError(
            f"bucketed maintenance reserves column name {BUCKET_COL!r}"
        )
    spark = delta.sparkSession
    meta = _read_table_meta(base_path)
    if meta is not None:
        n_buckets = int(meta["n_buckets"])  # creation-time value wins
        if list(meta["keys"]) != list(keys):
            raise ValueError(
                f"bucketed table at {base_path!r} is keyed on "
                f"{meta['keys']}, not {list(keys)}"
            )
    delta = delta.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
    delta.persist()
    try:
        touched = sorted(
            r[0] for r in delta.select(BUCKET_COL).distinct().collect()
        )
        work: List[int] = []
        for i in touched:
            stored_run, applied = _bucket_state(base_path, i)
            if (
                run_id is not None
                and stored_run is not None
                and stored_run != run_id
            ):
                raise ValueError(
                    f"bucketed maintenance: base table {base_path!r} was "
                    f"built by a different stream run ({stored_run!r}, this "
                    f"run {run_id!r}); recreate base table and checkpoint "
                    "together."
                )
            if applied < batch_id:
                work.append(i)
        if not work:
            return  # full replay of an applied batch
        existing = [i for i in work if os.path.isdir(_bucket_dir(base_path, i))]
        base_part = None
        if existing:
            reader = spark.read.option("basePath", base_path)
            if meta is not None:
                reader = reader.schema(_schema_with_bucket(meta))
            base_part = reader.parquet(
                *[_bucket_dir(base_path, i) for i in existing]
            ).drop(BUCKET_COL)
        delta_work = delta.where(F.col(BUCKET_COL).isin(work)).drop(BUCKET_COL)
        merged = merge_fn(base_part, delta_work)
        out = merged.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        # one shuffle of the touched rows (only — never the untouched base)
        # so each bucket is written by exactly one task: without it every
        # write task emits a file into every touched bucket, and the
        # small-file count grows as tasks x buckets x batches
        out = out.repartition(F.col(BUCKET_COL))
        scratch = base_path + "._scratch"
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(scratch)

        os.makedirs(base_path, exist_ok=True)
        # (re)write the metadata whenever the stored schema changes, not
        # just at creation — a later batch that evolves the schema (new
        # update column) would otherwise leave the cached read schema
        # stale and silently drop the new column from every read
        if meta is None or meta.get("schema") != merged.schema.json():
            _write_table_meta(
                base_path,
                {
                    "n_buckets": n_buckets,
                    "keys": list(keys),
                    "bucket_col": BUCKET_COL,
                    "schema": merged.schema.json(),
                },
            )
        oldd = base_path + "._old"
        os.makedirs(oldd, exist_ok=True)
        for i in work:
            sdir = os.path.join(scratch, f"{BUCKET_COL}={i}")
            if not os.path.isdir(sdir):
                os.makedirs(sdir)  # bucket emptied by deletes: keep marker
            _write_marker(sdir, run_id, batch_id)
            tgt = _bucket_dir(base_path, i)
            kept = os.path.join(oldd, f"{BUCKET_COL}={i}")
            if os.path.exists(tgt):
                os.rename(tgt, kept)
            os.rename(sdir, tgt)
            if os.path.exists(kept):
                shutil.rmtree(kept)
        shutil.rmtree(oldd, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
    finally:
        delta.unpersist()


def stream_upsert_to_parquet_bucketed(
    changes: DataFrame,
    base_path: str,
    checkpoint: str,
    keys: Sequence[str],
    seq_col: str,
    n_buckets: int = 64,
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    available_now: bool = True,
):
    """:func:`streaming.upsert.stream_upsert_to_parquet` semantics over a
    bucketed base table: per batch, only buckets containing delta keys
    are re-merged and swapped.  ``n_buckets`` matters only at creation;
    size it so base_size/n_buckets fits one comfortable write task (a few
    hundred MB) at the target scale."""
    run_id = ensure_run_id(checkpoint)

    def merge_fn(base_part: Optional[DataFrame], delta: DataFrame) -> DataFrame:
        if base_part is None:
            first = delta
            if delete_col:
                first = first.where(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            return first
        return merge_upsert(
            base_part,
            delta,
            keys=keys,
            update_cols=update_cols,
            delete_col=delete_col,
            broadcast_source=True,
            assume_unique_source=True,  # compact_last_per_key guarantees it
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _recover_bucketed(base_path)
        compacted = compact_last_per_key(batch, keys, seq_col).drop(seq_col)
        _apply_bucketed(
            compacted, base_path, keys, n_buckets, batch_id, run_id, merge_fn
        )

    writer = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _additive_merge(
    base: DataFrame,
    agg: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Broadcast-left-join additive apply (the
    :func:`streaming.upsert.accumulate_batch` plan shape): matched keys
    add, unmatched delta keys insert, the base never shuffles."""
    d = F.broadcast(agg).alias("d")
    t = base.alias("t")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    matched = t.join(d, on=cond, how="left").select(
        *[F.col(f"t.{k}").alias(k) for k in keys],
        *[
            (F.col(f"t.{c}") + F.coalesce(F.col(f"d.{c}"), F.lit(0))).alias(c)
            for c in sum_cols
        ],
    )
    tk = base.select(*keys).alias("tk")
    ins = agg.alias("i").join(
        tk,
        on=[F.col(f"i.{k}").eqNullSafe(F.col(f"tk.{k}")) for k in keys],
        how="left_anti",
    )
    return matched.unionByName(ins.select(*keys, *sum_cols))


def stream_accumulate_to_parquet_bucketed(
    deltas: DataFrame,
    base_path: str,
    checkpoint: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    n_buckets: int = 64,
    available_now: bool = True,
):
    """:func:`streaming.upsert.stream_accumulate_to_parquet` semantics
    (per-key running sums, exactly-once via in-table markers) over a
    bucketed base; per-bucket markers keep partial-crash replays
    exactly-once — see module docstring."""
    run_id = ensure_run_id(checkpoint)

    def merge_fn(base_part: Optional[DataFrame], delta: DataFrame) -> DataFrame:
        if base_part is None:
            return delta
        return _additive_merge(base_part, delta, keys, sum_cols)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _recover_bucketed(base_path)
        agg = batch.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        _apply_bucketed(
            agg, base_path, keys, n_buckets, batch_id, run_id, merge_fn
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
    "BUCKET_COL",
    "read_maintained_table",
    "key_lookup",
    "stream_upsert_to_parquet_bucketed",
    "stream_accumulate_to_parquet_bucketed",
    "_recover_bucketed",
]
