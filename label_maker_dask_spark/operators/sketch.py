"""Count-min sketch: a fixed-size, MERGEABLE frequency summary —
point-queryable approximate counts whose cells are plain additive
counters, so sketches built per partition, per day, or per stream
micro-batch union by element-wise addition into the sketch of the
union, with no rescan of the fact.

Structure: ``depth`` hash rows x ``width`` buckets.  Every item
increments one cell per row (``h_j(item) % width``); a point estimate
reads its ``depth`` cells and takes the MIN.  Collisions only ever ADD
counts, so the estimate is a guaranteed OVER-estimate
(``n_cms >= n_exact`` always) with error bounded by ``e*n/width`` at
confidence ``1 - e^-depth`` — the classic Cormode-Muthukrishnan bound.

Determinism discipline: the row hashes are cross-engine arithmetic —
integer items take a j-shifted affine-cube mix mod a prime (pure
whole-stage-codegen column math, the same family as the column
profiler's fold), strings take the repo's polynomial char hash salted
with the row index — so the identical sketch — every cell, every
estimate — is computable in plain SQL, and the catalog entry is
value-hash gated like any exact query (most sketches can't do this;
see the HLL entry's docstring for the class that can't).

Scale shape: the build explodes each fact row into ``depth`` narrow
``(j, bucket)`` rows, but the following hash aggregate partial-
aggregates map-side onto at most ``depth x width`` cells per task —
the shuffle moves O(depth x width) rows per task regardless of fact
size, and the merged sketch is a broadcast-size table.  Estimation
broadcasts the sketch to the items side: no shuffle of the item set.

No counterpart in the reference (`/root/reference/` has no
aggregations); Part-B engine surface alongside heavy.py (exact heavy
hitters), the KMV distinct sketch, and the native HLL rollup.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.text import (
    HASH_P,
    char_poly_hash,
    char_poly_hash_sql,
)


# affine premix constants for the integer row hashes (same family as
# the column profiler's fold, queries_scale_ext.py): per row j the
# multiplier shifts by j, giving depth distinct affine bijections mod
# the prime P; the cube is a bijection too (3 does not divide P-1), so
# distinct values keep distinct mixed hashes within a row
_A, _B = 236_887_691, 1_013_904_223

_INT_KINDS = ("tinyint", "smallint", "int", "bigint", "long")


def _is_int_kind(simple_type: str) -> bool:
    return simple_type in _INT_KINDS


def cms_bucket(item: Column, j: int, width: int, kind: str = "str") -> Column:
    """Row-``j`` bucket of ``item``, mod ``width``.  Integer items
    (``kind='int'``) take a pure-codegen affine-cube mix — whole-stage-
    codegen column math, the fast path that keeps the sketch build
    JVM-side; everything else takes the cross-engine polynomial char
    hash over ``"cms<j>:<item>"`` (interpreted HOF, the honest cost of
    hashing arbitrary strings deterministically in both engines).
    Either way the salt/multiplier varies with ``j``, giving ``depth``
    distinct hash functions without a second hash family."""
    if kind == "int":
        m = (F.pmod(item, F.lit(HASH_P)) * (_A + j) + _B) % HASH_P
        h = (m * m % HASH_P) * m % HASH_P
        return (h % width).cast("int")
    salted = F.concat(F.lit(f"cms{j}:"), item.cast("string"))
    return (char_poly_hash(salted) % width).cast("int")


def cms_bucket_sql(item_expr: str, j: int, width: int,
                   kind: str = "str") -> str:
    """DuckDB rendering of :func:`cms_bucket` (pass the same ``kind``)."""
    if kind == "int":
        m = (f"((((({item_expr}) % {HASH_P}) + {HASH_P}) % {HASH_P}"
             f" * {_A + j} + {_B}) % {HASH_P})")
        h = f"(({m} * {m} % {HASH_P}) * {m} % {HASH_P})"
        return f"CAST(({h}) % {width} AS INT)"
    h = char_poly_hash_sql(f"('cms{j}:' || {item_expr}::VARCHAR)")
    return f"CAST(({h}) % {width} AS INT)"


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Build one sketch per ``group_cols`` group (or one global sketch)
    over ``df[col]``.  Returns sketch CELLS as rows:
    ``(*group_cols, j, bucket, n)`` — at most ``depth x width`` rows
    per group, the storable/mergeable representation.

    The per-row explode is a literal array of ``depth`` structs (no
    join, no UDF); the groupBy that follows partial-aggregates map-side
    onto the bounded cell space before anything shuffles."""
    kind = (
        "int"
        if _is_int_kind(df.schema[col].dataType.simpleString())
        else "str"
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(F.col(col), j, width, kind).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    g = list(group_cols or [])
    return (
        df.select(*g, F.explode(cells).alias("c"))
        .groupBy(*g, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_increments(
    df: DataFrame, col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Per-row cell increments ``(j, bucket, n=1)`` — the STREAMING form
    of :func:`cms_build`: a narrow stateless projection safe on an
    unbounded stream, whose per-batch sum-by-(j, bucket) is exactly the
    batch's sketch.  Feed it to
    ``streaming.bucketed.stream_accumulate_to_parquet_bucketed(keys=
    ["j", "bucket"], sum_cols=["n"])`` and the maintained base table IS
    the running sketch of everything ingested — cells are additive, so
    the sink's exactly-once additive merge maintains it with no rescan
    and no custom state store."""
    kind = (
        "int"
        if _is_int_kind(df.schema[col].dataType.simpleString())
        else "str"
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(F.col(col), j, width, kind).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return df.select(F.explode(cells).alias("c")).select(
        F.col("c.j").alias("j"),
        F.col("c.bucket").alias("bucket"),
        F.lit(1).cast("long").alias("n"),
    )


def cms_merge(
    sketches: DataFrame, group_cols: Optional[Sequence[str]] = None
) -> DataFrame:
    """Merge sketch cells by element-wise addition — daily sketches in,
    the union's sketch out (``group_cols`` names the OUTPUT grain; any
    finer build-grain columns are simply not grouped on and their cells
    sum).  Lossless: addition is exactly what the build's global count
    would have produced."""
    g = list(group_cols or [])
    return sketches.groupBy(*g, "j", "bucket").agg(
        F.sum("n").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for every row of ``items``: min over the item's
    ``depth`` cells.  The sketch (<= depth x width rows) broadcasts;
    the item set never shuffles.  An item none of whose cells exist in
    the sketch (possible only if the sketch saw no items at all in
    those buckets) estimates 0 via the left join + coalesce.

    Output: ``items``'s columns plus ``n_cms`` (long)."""
    kind = (
        "int"
        if _is_int_kind(items.schema[col].dataType.simpleString())
        else "str"
    )
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(F.col(col), j, width, kind).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    exploded = items.select(*items.columns, F.explode(probes).alias("p"))
    joined = exploded.join(
        F.broadcast(sketch),
        (F.col("p.j") == sketch["j"]) & (F.col("p.bucket") == sketch["bucket"]),
        "left",
    )
    return (
        joined.groupBy(*[F.col(c) for c in items.columns])
        .agg(
            F.min(F.coalesce(sketch["n"], F.lit(0)))
            .cast("long")
            .alias("n_cms")
        )
    )
