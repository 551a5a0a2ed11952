"""Materialize-once helper: localCheckpoint by default, with a cluster
fault-tolerance knob.

Several operators reference an intermediate frame from more than one
plan branch (band join both sides, every power iteration, BFS hops).
Left lazy, Spark re-executes the upstream plan per consumer; worse, a
frame containing a nondeterministic draw (sampling, ``repartitionByRange``
partition ids) may evaluate *differently* per branch.  EVERY such site
in the library routes through :func:`materialize` (chained sites use
``df.transform(materialize, eager=...)``), so the mode knob below
governs the whole engine — no operator hard-codes
``localCheckpoint`` (grep-enforceable: the only ``.localCheckpoint(``
call lives in this module).

Why ``localCheckpoint`` and not ``persist()`` by default:

* checkpoint blocks are released by the ContextCleaner when the frame is
  garbage-collected, while a bare ``persist()`` in a library path pins
  blocks in the cache manager for the session's lifetime (a leak when
  the caller never sees the frame to ``unpersist()`` it);
* ``eager=False`` materializes inside the first action, so benchmarks
  charge the cost to the query that incurs it.

The trade-off — Spark's own API warning — is FAULT TOLERANCE:
``localCheckpoint`` truncates lineage onto non-replicated executor-local
blocks, so on a real cluster the loss of an executor makes the job FAIL
instead of recomputing the lost partitions from lineage.  On
``local[*]`` (one JVM) the distinction is moot; on a 1000-executor
100 TB deployment you may prefer to pay the cache-manager pinning (or a
reliable checkpoint directory) for restartability.

The knob: set the Spark conf

    spark.labelMakerSpark.materialize.mode = localCheckpoint | persist | checkpoint

* ``localCheckpoint`` (default) — lineage-truncating executor-local
  blocks, GC-released, NOT executor-loss tolerant.
* ``persist`` — MEMORY_AND_DISK cache; lineage retained, so lost blocks
  recompute.  Blocks stay pinned until the frame is garbage-collected
  AND the session's cache manager drops them; prefer for long-lived
  cluster jobs where executor churn is expected.
* ``checkpoint`` — reliable checkpoint to ``SparkContext.setCheckpointDir``
  (must be configured, typically HDFS/S3); survives executor loss AND
  truncates lineage.  Always eager (Spark's reliable checkpoint API has
  no lazy form).

Plan-shape note: ``localCheckpoint``/``checkpoint`` surface as
``Scan ExistingRDD`` in explain output and the resulting ``LogicalRDD``
carries NO stats (stats-based auto-broadcast is lost — call sites that
need a broadcast carry an explicit ``F.broadcast()`` hint); ``persist``
surfaces as ``InMemoryTableScan`` and retains stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MODE_CONF = "spark.labelMakerSpark.materialize.mode"


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Pin ``df``'s current contents for multi-branch reuse (module
    docstring: semantics, fault-tolerance trade-off, and the
    ``spark.labelMakerSpark.materialize.mode`` knob).

    ``eager=True`` materializes now (required when the caller must pin a
    nondeterministic draw *before* two branches diverge inside one
    action); ``eager=False`` defers to the first action (bench-honest).
    ``checkpoint`` mode is always eager.

    ``persist`` + ``eager=True`` forces population NOW with a
    ``count()`` over the persisted frame (the standard eager-persist
    idiom: one JVM-side job that materializes every cached partition —
    unlike ``foreachPartition``, which would pickle every row through
    Python workers just to discard it): Spark persists lazily, and a
    lazily-populated cache is NOT a pin for nondeterministic draws —
    two downstream branches racing to populate (or a block lost to
    executor churn and recomputed from lineage per consumer) can each
    re-draw differently, which is the exact inconsistency the eager
    call sites exist to prevent.  The pin is best-effort under churn
    either way (a lost block still recomputes from lineage); sites
    needing a durable pin on a churning cluster should use
    ``checkpoint`` mode.
    """
    mode = df.sparkSession.conf.get(MODE_CONF, "localCheckpoint")
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    if mode != "localCheckpoint":
        raise ValueError(
            f"{MODE_CONF}={mode!r}: expected localCheckpoint|persist|checkpoint"
        )
    return df.localCheckpoint(eager=eager)
