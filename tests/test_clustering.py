"""Spherical k-means: convergence on separated blobs + the replay contract
(identical output under different partitionings — the property the DuckDB
oracle hash-match certifies at catalog level)."""

import math

from pyspark.sql import functions as F

from label_maker_dask_spark.operators.clustering import spherical_kmeans


def _blobs(spark, n_per=30, dim=8):
    """Three well-separated direction blobs on the unit sphere, built with
    deterministic jitter (no RNG).  Ids interleave the blobs (vec_id % 3 is
    the blob) so the lowest-id seeds span all three — with clean seeds,
    Lloyd's must keep them separated; clustered seeds would legitimately
    land in a local minimum."""
    rows = []
    axes = [0, 3, 6]
    for i in range(n_per):
        for b, axis in enumerate(axes):
            vid = i * 3 + b
            v = [0.0] * dim
            v[axis] = 10.0
            # small deterministic jitter on the other coordinates
            for d in range(dim):
                v[d] += math.sin(0.7 * (vid + 1) * (d + 1)) * 0.3
            rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    out = spherical_kmeans(df, k=3, iters=3).collect()
    assert len(out) == 90
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.vec_id % 3, set()).add(r.cluster)
    # each blob lands in exactly one cluster, and the three are distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set().union(*by_blob.values())) == 3
    # members sit close to their centroid on the sphere
    assert min(r.sim for r in out) > 0.9


def test_kmeans_iter0_is_seed_assignment(spark):
    df = _blobs(spark, n_per=5)
    out = spherical_kmeans(df, k=2, iters=0)
    # seeds are the two lowest ids -> those vectors match their own cell
    own = {r.vec_id: (r.cluster, r.sim) for r in out.collect()}
    assert own[0] == (0, 1.0)
    assert own[1] == (1, 1.0)


def test_kmeans_partition_order_independent(spark):
    df = _blobs(spark)
    a = sorted(
        map(tuple, spherical_kmeans(df.repartition(7), k=3, iters=2).collect())
    )
    b = sorted(
        map(tuple, spherical_kmeans(df.coalesce(1), k=3, iters=2).collect())
    )
    assert a == b


def test_kmeans_arrow_twin_bit_identical(spark):
    df = _blobs(spark)
    expr = sorted(
        map(tuple, spherical_kmeans(df, k=3, iters=2).collect())
    )
    arrow = sorted(
        map(
            tuple,
            spherical_kmeans(df, k=3, iters=2, use_arrow=True).collect(),
        )
    )
    assert expr == arrow


def test_kmeans_no_python_row_path(spark):
    df = _blobs(spark, n_per=4)
    plan = (
        spherical_kmeans(df, k=2, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pure Catalyst: no Arrow/pandas eval nodes anywhere in the plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_persist_caches_working_set(spark):
    """persist=True (default) routes every Lloyd pass through one
    materialized normalized working set — a lazy localCheckpoint, so the
    plan reads Scan ExistingRDD instead of re-deriving unit vectors from
    the source (and the blocks are GC-released, unlike a bare persist);
    persist=False stays materialization-free; both produce identical
    assignments."""
    cached = spherical_kmeans(_blobs(spark), k=3, iters=2)
    # an independent frame so nothing is shared between the two plans
    plain = spherical_kmeans(_blobs(spark), k=3, iters=2, persist=False)
    # the source frame is itself an ExistingRDD (createDataFrame), so the
    # discriminating marker is the unit-normalization expression: the
    # checkpoint swallows it (it runs once, into the materialized RDD),
    # while persist=False re-derives it in-plan for every reference
    cached_plan = cached._jdf.queryExecution().executedPlan().toString()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in cached_plan
    # centroid re-normalization keeps ONE legitimate copy of the
    # expression in the cached plan; the working-set copies (one per
    # unitv reference) only survive when persist=False
    assert plain_plan.count("SQRT(aggregate(") > cached_plan.count(
        "SQRT(aggregate("
    )
    key = lambda df: sorted((r.vec_id, r.cluster, r.sim) for r in df.collect())  # noqa: E731
    assert key(cached) == key(plain)
