"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits oversized
*partitions* after the fact; explicit salting is the plan-level tool when a
single join key is hot enough that even a split partition is one key's
rows.  The pattern: append a salt in [0, n) to the big side's key, replicate
the small side once per salt value, join on (key, salt).  Results are
identical to the unsalted join — the salt only spreads one hot key across n
reducers — so the catalog query's oracle is the plain join.

Cost model: the small side is replicated n times (broadcast-sized sides
make this free — the broadcast already goes everywhere); the big side gets
one extra int column.  Worth it when max-key-rows / rows-per-partition ≫ 1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    broadcast_small: bool = True,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with an n-way salt on the hot side.

    The salt is a deterministic hash of the big side's whole row modulo
    ``n_salts`` (never ``rand()`` — retried tasks must re-derive the same
    salt or a retry duplicates/loses rows).  The small side is exploded
    against ``sequence(0, n-1)``; with ``broadcast_small`` (default) the
    replication is absorbed by the broadcast.

    Join type support: 'inner' and 'left' (big side preserved).  Right/full
    would need the small side NOT exploded on the null-extension path;
    callers with those shapes want the plain join + AQE instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join: inputs must not already carry a '_salt' column"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if broadcast_small:
        exploded = F.broadcast(exploded)
    out = salted_big.join(exploded, on=[*keys, "_salt"], how=how)
    return out.drop("_salt")


__all__ = ["salted_join"]
