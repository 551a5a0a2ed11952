"""Distributed spherical k-means — semantic clustering for dataset curation.

SemDeDup-style curation (prune near-duplicate *meaning*, not just near-
duplicate text) needs embeddings clustered so that pruning/sampling can act
per cluster.  This operator is Lloyd's algorithm on the unit sphere
(cosine k-means), built entirely from Catalyst expressions — no Python row
path — and engineered so a DuckDB oracle can replay it bit-for-bit:

- **Deterministic init**: centroids seed from the ``k`` lowest-id vectors
  (the same convention as the IVF coarse quantizer,
  ``similarity.py:372``), not from random sampling.
- **Sequential float folds**: every dot product and norm is a
  left-to-right ``F.aggregate`` fold, the exact order DuckDB's
  ``list_reduce`` uses — never a BLAS/pairwise summation whose grouping
  differs by backend.
- **Exact mean accumulation**: the only place partial-aggregation merge
  order could leak float noise is the per-cluster mean.  Components are
  quantized to integers (``round(x * quant)`` as BIGINT) and summed
  exactly — integer addition is order-free — then divided back once.
  Quantization error only nudges centroids (every engine/partitioning
  nudges them identically); assignments stay exact replicas.

Scale shape per iteration: one broadcast cross-join against k centroid
rows folded to an argmax by map-side partial ``max(struct)`` (the shuffle
carries one row per vector), then a (cluster, dim) integer-sum shuffle of
k*d rows post-combine.  Nothing is collected to the driver; iterations
deepen one lazy plan over the normalized working set, which is persisted
once (``persist=True`` default) so the seed scan and every Lloyd pass read
the cache instead of re-deriving unit vectors from the source — the
standard iterative-algorithm working-set cache.  Pass ``persist=False``
for a fully-lazy one-shot plan (e.g. when the caller already cached
upstream or will never materialize twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.materialize import materialize


def _unit(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Append ``out_col``: the L2-normalized double copy of ``vec_col``.

    Two-step (norm column, then scale) so codegen computes the fold once
    per row, not once per element.  Vectors must be nonzero."""
    v = F.col(vec_col).cast("array<double>")
    df = df.withColumn(
        "_nrm", F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    )
    return df.withColumn(
        out_col, F.transform(v, lambda x: x / F.col("_nrm"))
    ).drop("_nrm")


def _assign(unitv: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid (max cosine) assignment; ties break to the lowest
    cell id.  Argmax rides ``max(struct(dot, -cell, u))`` so the shuffle
    after the broadcast cross-join carries one partially-aggregated row
    per vector."""
    dot = F.aggregate(
        F.zip_with(F.col("u"), F.col("cu"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    j = unitv.crossJoin(F.broadcast(cents)).withColumn("dot", dot)
    best = j.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("dot").alias("d"),
                (-F.col("cell")).alias("nc"),
                F.col("u").alias("u"),
            )
        ).alias("b")
    )
    return best.select(
        id_col,
        (-F.col("b.nc")).cast("int").alias("cluster"),
        F.col("b.d").alias("dot"),
        F.col("b.u").alias("u"),
    )


def _recompute(assigned: DataFrame, quant: int) -> DataFrame:
    """Exact per-cluster means via integer quantization, re-normalized to
    unit centroids.  Empty clusters simply vanish (no rows, no group) —
    identically in the oracle."""
    ex = assigned.select(
        F.col("cluster").alias("cell"), F.posexplode("u").alias("pos", "val")
    )
    q = ex.withColumn("q", F.round(F.col("val") * quant, 0).cast("long"))
    sums = q.groupBy("cell", "pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    m = sums.withColumn("m", F.col("s") / (F.col("n") * float(quant)))
    vecs = m.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
    )
    vecs = vecs.withColumn("cv", F.transform(F.col("pm"), lambda s: s["m"]))
    return _unit(vecs, "cv", "cu").select("cell", "cu")


def _assign_arrow(unitv: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Arrow-vectorized twin of :func:`_assign` — bit-identical output.

    Centroids (k rows) collect to the driver and ride the closure; per
    Arrow batch, dots accumulate with the same left-to-right dim fold the
    expression path and the SQL oracle use (``_dots_exact``, never BLAS),
    and ``np.argmax``'s first-max rule reproduces the lowest-cell
    tie-break because centroids are ordered by cell.  This is the 100 TB
    hot path: the expression fold evaluates an interpreted lambda per
    element, the Arrow path ~one numpy op per dimension per batch."""
    import numpy as np
    import pandas as pd

    from label_maker_dask_spark.operators.similarity import _dots_exact

    cpd = cents.orderBy("cell").toPandas()
    cell_ids = cpd["cell"].to_numpy()
    cm = np.stack(cpd["cu"].to_numpy()).astype(np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            um = np.stack(pdf["u"].to_numpy()).astype(np.float64)
            dots = _dots_exact(um, cm)
            best = np.argmax(dots, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cell_ids[best].astype(np.int32),
                    "dot": dots[np.arange(len(um)), best],
                    "u": pdf["u"],
                }
            )

    id_type = unitv.schema[id_col].dataType.simpleString()
    return unitv.mapInPandas(
        assign, f"{id_col} {id_type}, cluster int, dot double, u array<double>"
    )


def spherical_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1_000_000,
    use_arrow: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Cluster embeddings on the unit sphere; returns one row per vector:
    (``id_col``, ``cluster`` int, ``sim`` double = round(cosine-to-
    centroid, 6)).

    ``iters`` counts Lloyd refinements: 0 = plain seed-centroid
    assignment (the IVF coarse quantizer), each further iteration is
    recompute-means -> reassign.  Deterministic under any partitioning —
    see the module docstring for the replay contract.

    ``use_arrow`` switches assignment to the vectorized twin
    (:func:`_assign_arrow`, bit-identical by construction and by test):
    the expression path is the oracle mirror and stays fully lazy; the
    Arrow path is the throughput path, at the cost of one driver-side
    k-row centroid collect per iteration (the classic distributed-k-means
    driver state, k*d doubles).

    ``persist`` materializes the normalized working set via a lazy
    ``localCheckpoint`` (module docstring) — values are identical either
    way; it only changes how many times the source is scanned.  A
    checkpoint rather than ``persist()``: the returned (lazy) result
    still reads the blocks, and checkpoint blocks are released when the
    frame is garbage-collected, while a bare persist pins them in the
    cache manager for the session's lifetime."""
    unitv = _unit(embeddings.select(id_col, vec_col), vec_col, "u").select(
        id_col, "u"
    )
    if persist:
        # Default localCheckpoint is NOT executor-loss tolerant on a real
        # cluster — see operators/materialize.py for the fault-tolerance
        # trade-off and the mode knob (persist / reliable checkpoint).
        unitv = materialize(unitv, eager=False)
    w = Window.orderBy(id_col)
    cents = (
        unitv.orderBy(id_col)
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cell"), F.col("u").alias("cu"))
    )
    assign = _assign_arrow if use_arrow else _assign
    assigned = assign(unitv, cents, id_col)
    for _ in range(iters):
        cents = _recompute(assigned, quant)
        assigned = assign(unitv, cents, id_col)
    return assigned.select(
        id_col,
        "cluster",
        F.round(F.col("dot"), 6).alias("sim"),
    )


__all__ = ["spherical_kmeans"]
