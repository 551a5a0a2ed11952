"""Snapshot-versioned BUCKETED maintenance: per-batch cost proportional
to the delta AND full table history — the intersection of
:mod:`streaming.bucketed` (bucket-pruned rewrites) and
:mod:`streaming.snapshot_sink` (immutable versions, O(1) rollback).

This is the minimal shape every production table format (Iceberg/Delta/
Hudi) builds on: immutable data files + a tiny manifest naming which
files make up each table version.

Layout::

    <table>/_v/1.json          manifest: {"batch", "run",
    <table>/_v/2.json                     "buckets": {"0": 1, "5": 2, ...},
    ...                                   "n_buckets", "keys", "schema"}
    <table>/_latest            text file: current version number
    <table>/b=0/v=1/part-*.parquet   immutable once renamed in
    <table>/b=5/v=1/...  b=5/v=2/...

Per micro-batch: the delta's key-hash buckets are computed, ONLY the
touched buckets are re-merged (one partition-pruned job, as the
in-place bucketed sink), each touched bucket's replacement lands as a
NEW immutable ``v=<n>`` directory, and a new manifest — copying the
previous bucket→version map with just the touched entries bumped — is
published atomically (tmp + rename), then the ``_latest`` pointer moves.
Untouched buckets are never read, written, or copied: a version costs
O(delta), yet every historical version remains fully readable.

Crash safety falls out of immutability: data directories are never
mutated after their rename, the manifest write is atomic, and a crash
anywhere leaves at worst orphan bucket-version directories no manifest
references (garbage-collected by :func:`expire_table_versions`).  There
is no recovery dance — replays are decided by the newest manifest's
batch marker (run id + batch id, same contract as the other sinks), and
a crash between manifest publish and pointer move is healed by the
replay re-pointing ``_latest``.

Reads: :func:`read_table_version` assembles the manifest's directory
list with an explicit schema (no footer inference, no listing of
unreferenced versions); :func:`rollback_table` is a pointer move.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructType

from label_maker_dask_spark.operators.merge import merge_upsert
from label_maker_dask_spark.streaming.bucketed import (
    BUCKET_COL,
    _additive_merge,
    _bucket_expr,
)
from label_maker_dask_spark.streaming.upsert import (
    compact_last_per_key,
    ensure_run_id,
    writer_lock,
)

_VERSION_COL = "lmdsv"


def _manifest_dir(table: str) -> str:
    return os.path.join(table, "_v")


def _versions(table: str) -> List[int]:
    d = _manifest_dir(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n[:-5])
        for n in os.listdir(d)
        if n.endswith(".json") and n[:-5].isdigit()
    )


def _read_manifest(table: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table), f"{version}.json")) as fh:
        return json.load(fh)


def _write_manifest(table: str, version: int, manifest: dict) -> None:
    d = _manifest_dir(table)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(d, f"{version}.json"))


def _point_latest(table: str, version: int) -> None:
    tmp = os.path.join(table, "_latest.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table, "_latest"))


def latest_table_version(table: str) -> Optional[int]:
    ptr = os.path.join(table, "_latest")
    if os.path.exists(ptr):
        with open(ptr) as fh:
            return int(fh.read().strip())
    vs = _versions(table)
    return vs[-1] if vs else None


def rollback_table(table: str, version: int) -> None:
    """Repoint ``_latest`` at an older version — O(1), nothing rewritten."""
    if version not in _versions(table):
        raise FileNotFoundError(
            f"cannot roll back to missing version {version} at {table!r}"
        )
    _point_latest(table, version)


def read_table_version(
    spark: SparkSession,
    table: str,
    version: Optional[int] = None,
    with_bucket: bool = False,
) -> DataFrame:
    """Read a pinned ``version`` (or the ``_latest`` one).  The scan lists
    exactly the manifest's bucket-version directories with the cached
    schema — other versions of the same buckets are invisible to it."""
    v = version if version is not None else latest_table_version(table)
    if v is None:
        raise FileNotFoundError(f"no versions published at {table!r}")
    m = _read_manifest(table, v)
    schema = (
        StructType.fromJson(json.loads(m["schema"]))
        .add(BUCKET_COL, IntegerType())
        .add(_VERSION_COL, IntegerType())
    )
    paths = [
        os.path.join(table, f"{BUCKET_COL}={b}", f"{_VERSION_COL}={bv}")
        for b, bv in sorted(m["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    df = (
        spark.read.schema(schema)
        .option("basePath", table)
        .parquet(*paths)
        .drop(_VERSION_COL)
    )
    return df if with_bucket else df.drop(BUCKET_COL)


def _tip_state(table: str) -> Tuple[Optional[int], Optional[str], int]:
    vs = _versions(table)
    if not vs:
        return None, None, -1
    m = _read_manifest(table, vs[-1])
    return vs[-1], m.get("run"), int(m.get("batch", -1))


def _apply_versioned(
    delta: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    batch_id: int,
    run_id: Optional[str],
    merge_fn,
) -> Optional[int]:
    """Publish one delta as the table's next version under the
    single-writer lock (see :func:`streaming.upsert.writer_lock`: a
    second concurrent writer raises instead of corrupting a publish);
    returns the new version (None on an applied replay)."""
    with writer_lock(table, run_id):
        return _apply_versioned_locked(
            delta, table, keys, n_buckets, batch_id, run_id, merge_fn
        )


def _apply_versioned_locked(
    delta: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    batch_id: int,
    run_id: Optional[str],
    merge_fn,
) -> Optional[int]:
    if BUCKET_COL in delta.columns:
        raise ValueError(
            f"versioned maintenance reserves column name {BUCKET_COL!r}"
        )
    spark = delta.sparkSession
    tip, stored_run, applied = _tip_state(table)
    if (
        run_id is not None
        and stored_run is not None
        and stored_run != run_id
    ):
        raise ValueError(
            f"versioned maintenance: table {table!r} was maintained by a "
            f"different stream run ({stored_run!r}, this run {run_id!r}); "
            "recreate table and checkpoint together."
        )
    if tip is not None and applied >= batch_id:
        _point_latest(table, tip)  # heal a torn publish on replay
        return None
    prev: Dict[str, int] = {}
    if tip is not None:
        m = _read_manifest(table, tip)
        prev = dict(m["buckets"])
        n_buckets = int(m["n_buckets"])
        if list(m["keys"]) != list(keys):
            raise ValueError(
                f"versioned table at {table!r} is keyed on {m['keys']}, "
                f"not {list(keys)}"
            )

    delta = delta.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
    delta.persist()
    try:
        touched = sorted(
            int(r[0]) for r in delta.select(BUCKET_COL).distinct().collect()
        )
        existing = [b for b in touched if str(b) in prev]
        base_part = None
        if existing:
            m = _read_manifest(table, tip)
            schema = (
                StructType.fromJson(json.loads(m["schema"]))
                .add(BUCKET_COL, IntegerType())
                .add(_VERSION_COL, IntegerType())
            )
            paths = [
                os.path.join(
                    table, f"{BUCKET_COL}={b}", f"{_VERSION_COL}={prev[str(b)]}"
                )
                for b in existing
            ]
            base_part = (
                spark.read.schema(schema)
                .option("basePath", table)
                .parquet(*paths)
                .drop(_VERSION_COL, BUCKET_COL)
            )
        delta_work = delta.drop(BUCKET_COL)
        merged = merge_fn(base_part, delta_work)
        out = merged.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        out = out.repartition(F.col(BUCKET_COL))  # one file per bucket
        scratch = os.path.join(table, "_publishing")
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(scratch)

        new_version = (tip or 0) + 1
        buckets = dict(prev)
        for b in touched:
            src = os.path.join(scratch, f"{BUCKET_COL}={b}")
            if not os.path.isdir(src):
                os.makedirs(src)  # bucket emptied by deletes
            bdir = os.path.join(table, f"{BUCKET_COL}={b}")
            os.makedirs(bdir, exist_ok=True)
            dst = os.path.join(bdir, f"{_VERSION_COL}={new_version}")
            if os.path.exists(dst):
                # orphan from a crash between renames and the manifest
                # write (no manifest references it — a published version
                # would have made this replay a no-op above)
                import shutil

                shutil.rmtree(dst)
            os.rename(src, dst)
            buckets[str(b)] = new_version
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
        _write_manifest(
            table,
            new_version,
            {
                "run": run_id,
                "batch": batch_id,
                "buckets": buckets,
                "n_buckets": n_buckets,
                "keys": list(keys),
                "schema": merged.schema.json(),
            },
        )
        _point_latest(table, new_version)
        return new_version
    finally:
        delta.unpersist()


def expire_table_versions(table: str, keep: int = 2) -> List[int]:
    """Drop all but the newest ``keep`` manifests (never the pinned
    ``_latest``), then garbage-collect bucket-version directories no
    retained manifest references; returns the removed manifest
    versions."""
    import shutil

    vs = _versions(table)
    pinned = latest_table_version(table)
    removable = [v for v in (vs[:-keep] if keep > 0 else vs) if v != pinned]
    for v in removable:
        os.remove(os.path.join(_manifest_dir(table), f"{v}.json"))
    live = set()
    for v in _versions(table):
        m = _read_manifest(table, v)
        for b, bv in m["buckets"].items():
            live.add((str(b), int(bv)))
    for name in os.listdir(table):
        if not name.startswith(BUCKET_COL + "="):
            continue
        b = name.split("=", 1)[1]
        bdir = os.path.join(table, name)
        for vd in os.listdir(bdir):
            if vd.startswith(_VERSION_COL + "="):
                bv = int(vd.split("=", 1)[1])
                if (b, bv) not in live:
                    shutil.rmtree(os.path.join(bdir, vd))
    return removable


def stream_upsert_to_versioned_table(
    changes: DataFrame,
    table: str,
    checkpoint: str,
    keys: Sequence[str],
    seq_col: str,
    n_buckets: int = 64,
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    keep: Optional[int] = None,
    available_now: bool = True,
):
    """CDC upsert where each micro-batch publishes a new table version at
    O(delta) cost: only delta-touched buckets get new files, the manifest
    carries everything else forward by reference.  ``keep`` bounds
    retained versions."""
    run_id = ensure_run_id(checkpoint)

    def merge_fn(base_part, delta):
        if base_part is None:
            first = delta
            if delete_col:
                first = first.where(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            return first
        return merge_upsert(
            base_part, delta, keys=keys, update_cols=update_cols,
            delete_col=delete_col, broadcast_source=True,
            assume_unique_source=True,
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        compacted = compact_last_per_key(batch, keys, seq_col).drop(seq_col)
        v = _apply_versioned(
            compacted, table, keys, n_buckets, batch_id, run_id, merge_fn
        )
        if v is not None and keep is not None:
            expire_table_versions(table, keep=keep)

    writer = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_accumulate_to_versioned_table(
    deltas: DataFrame,
    table: str,
    checkpoint: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    n_buckets: int = 64,
    keep: Optional[int] = None,
    available_now: bool = True,
):
    """Additive running sums with versioned O(delta) publishes; the
    manifest's batch marker keeps the non-idempotent addition
    exactly-once under replay."""
    run_id = ensure_run_id(checkpoint)

    def merge_fn(base_part, delta):
        if base_part is None:
            return delta
        return _additive_merge(base_part, delta, keys, sum_cols)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        agg = batch.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        v = _apply_versioned(
            agg, table, keys, n_buckets, batch_id, run_id, merge_fn
        )
        if v is not None and keep is not None:
            expire_table_versions(table, keep=keep)

    writer = (
        deltas.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def table_version_diff(
    spark: SparkSession,
    table: str,
    v_from: int,
    v_to: Optional[int] = None,
) -> DataFrame:
    """Row-level diff between two published versions — the change-data
    feed a maintained table owes its consumers: one row per key whose
    state differs, with ``change`` in ``insert | update | delete`` and
    the full ``old`` / ``new`` payload structs.

    MANIFEST-PRUNED: versions share the immutable directories of
    untouched buckets, so two manifests agree on every bucket the
    interval never touched — those buckets are provably identical and
    are never read.  The scan lists only buckets whose version entry
    differs, making the diff O(changed buckets), not O(table): the same
    pruning that makes publishes O(delta) makes history QUERIES
    O(delta) too.  Within a changed bucket, unchanged rows are dropped
    by a null-safe struct comparison after a full-outer join on the
    table's keys (from the manifest — the caller names nothing).
    """
    v_to = v_to if v_to is not None else latest_table_version(table)
    if v_to is None:
        raise FileNotFoundError(f"no versions published at {table!r}")
    m_from = _read_manifest(table, v_from)
    m_to = _read_manifest(table, v_to)
    keys = m_from["keys"]
    if m_to["keys"] != keys:
        raise ValueError(
            f"version {v_from} keys {keys} != version {v_to} keys "
            f"{m_to['keys']}"
        )
    # Schema evolution across the interval is unsupported: the payload
    # structs below select m_to's value columns from BOTH versions, so an
    # added/renamed/dropped column would otherwise surface as an opaque
    # unresolved-column AnalysisException deep in the join.  Fail early
    # and name the drift instead.
    _shape = lambda m: [
        (f.name, f.dataType.simpleString())
        for f in StructType.fromJson(json.loads(m["schema"]))
    ]
    if _shape(m_from) != _shape(m_to):
        f_cols = [f.name for f in
                  StructType.fromJson(json.loads(m_from["schema"]))]
        t_cols = [f.name for f in
                  StructType.fromJson(json.loads(m_to["schema"]))]
        raise ValueError(
            f"table_version_diff: schema changed between version {v_from} "
            f"(columns {f_cols}) and version {v_to} (columns {t_cols}) — "
            "schema evolution is not supported across a diff interval; "
            "diff within each schema epoch separately."
        )
    schema = StructType.fromJson(json.loads(m_to["schema"]))
    val_cols = [f.name for f in schema.fields if f.name not in keys]
    if not val_cols:
        raise ValueError(
            f"table_version_diff: table {table!r} has no value columns "
            f"(all {len(keys)} columns are keys) — a keys-only table has "
            "no payload to diff; membership changes are visible as "
            "insert/delete rows in the bucket listings themselves."
        )
    bf, bt = m_from["buckets"], m_to["buckets"]
    changed = sorted(
        (b for b in set(bf) | set(bt) if bf.get(b) != bt.get(b)),
        key=int,
    )
    def read_side(m, buckets):
        present = [b for b in buckets if b in m["buckets"]]
        if not present:
            return None
        full = (
            StructType.fromJson(json.loads(m["schema"]))
            .add(BUCKET_COL, IntegerType())
            .add(_VERSION_COL, IntegerType())
        )
        paths = [
            os.path.join(
                table, f"{BUCKET_COL}={b}", f"{_VERSION_COL}={m['buckets'][b]}"
            )
            for b in present
        ]
        return (
            spark.read.schema(full)
            .option("basePath", table)
            .parquet(*paths)
            .drop(BUCKET_COL, _VERSION_COL)
        )

    empty = spark.createDataFrame([], schema)
    old = read_side(m_from, changed)
    new = read_side(m_to, changed)
    # a side with no changed-bucket directories (e.g. v_to only ADDED
    # brand-new buckets) diffs against the empty frame of the same
    # schema — every row then classifies as insert/delete naturally
    old = old if old is not None else empty
    new = new if new is not None else empty

    def payload(df):
        return F.struct(*[df[c] for c in val_cols])

    o = old.select(*keys, payload(old).alias("old"))
    n = new.select(*keys, payload(new).alias("new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old").isNull(), F.lit("insert"))
        .when(F.col("new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        j.where(~F.col("old").eqNullSafe(F.col("new")))
        .select(*keys, change.alias("change"), "old", "new")
    )


__all__ = [
    "read_table_version",
    "latest_table_version",
    "rollback_table",
    "expire_table_versions",
    "stream_upsert_to_versioned_table",
    "stream_accumulate_to_versioned_table",
    "table_version_diff",
]
