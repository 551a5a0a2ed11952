"""Similarity search over embedding columns (SURVEY.md Part B).

Two paths:

- **Brute-force cosine top-k** (the exactness baseline): broadcast the query
  set against the corpus — a narrow map-side join, one window for per-query
  top-k.  Cost is O(|queries| * |corpus|) dot products, all JVM-side via
  higher-order functions; correct at any scale where the *query set* is
  broadcastable (the corpus streams, never collects).
- **LSH-bucketed ANN** (the scale path): deterministic signed-random-
  projection bucketing; only same-bucket pairs are compared.  Probe cost
  follows bucket occupancy instead of corpus size.  The projection
  coefficients are arithmetic (index-derived), so the operator needs no
  stored model and both engines can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.vectors import cosine_rounded, dot, norm


def normalized(df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str) -> DataFrame:
    """Project each vector onto the unit sphere once, so the per-pair cost
    later is a single dot product (three folds per pair otherwise)."""
    n = norm(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(id_alias),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n).alias(vec_alias),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query row, the k nearest corpus rows by cosine (self-matches
    excluded).  ``queries`` is broadcast; ties break on neighbor id so the
    result is total-ordered and cross-engine stable."""
    q = normalized(queries, id_col, vec_col, "query_id", "qv")
    c = normalized(embeddings, id_col, vec_col, "neighbor_id", "cv")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def projection_coeff(j: int, d: int) -> float:
    """Deterministic pseudo-random coefficient for hyperplane j, dim d —
    integer arithmetic mapped into [-0.5, 0.5), replayable in SQL."""
    return ((j * 2654435761 + d * 40503) % 1024) / 1024.0 - 0.5


def srp_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Signed-random-projection bucket id: bit j = sign of <vec, r_j>."""
    bits = []
    for j in range(n_planes):
        coeffs = F.array(*[F.lit(projection_coeff(j, d)) for d in range(dim)])
        dot_j = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, r: x.cast("double") * r),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bits.append(F.when(dot_j > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits, F.lit(0)).cast("int")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: compare only pairs sharing an SRP bucket.  Recall < 1 by
    construction (ANN contract); bucket join shuffles on the small int
    bucket id.  Increase recall with multi-probe (flip one bit) if needed."""
    nrm_c = norm(F.col(vec_col))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm_c).alias("cv"),
        srp_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm_c).alias("qv"),
        srp_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, bucketed by SRP
    so only same-bucket pairs are scored (high-cosine pairs land in the same
    bucket with high probability)."""
    nrm = norm(F.col(vec_col))
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm).alias("v"),
        srp_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
