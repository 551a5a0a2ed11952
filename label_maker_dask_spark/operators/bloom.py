"""Runtime bloom-filter join pruning: filter the probe (fact) side of a
join *before* its shuffle, using a bloom filter built from the build
(dim) side's join keys.

The classic 100 TB shuffle-reduction technique: when a selective dim
predicate keeps only a sliver of join keys, the fact table still pays a
full shuffle under a plain shuffled join — every fact row crosses the
exchange only to be dropped by the join.  A bloom filter over the
surviving dim keys, evaluated fact-side *in the scan stage*, drops the
doomed rows before they are ever shuffled.  False positives are removed
by the exact join that follows, so the operator is **result-invariant**:
the output equals the plain join bit-for-bit (the DuckDB oracle for the
catalog query is the plain join).

Spark's own runtime-filter injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers the same
idea for plans Catalyst can see end-to-end; this operator makes the
technique available explicitly — e.g. inside ``foreachBatch`` sinks,
across separately-materialized stages, or when the optimizer declines
the rewrite — and keeps the probe entirely in JVM column algebra.

Representation: the bit array travels as a **hex-string literal** in the
plan (one nibble = 4 bits), probed with ``substring``/``conv`` — pure
built-in expressions, no UDF, no Python on the probe path.  The build is
one aggregation over the (small) build side: positions -> nibble index
-> ``bit_or`` of nibble masks -> at most ``m/4`` tiny rows to the
driver, bounded by the filter size, never by data volume.

Hash functions are ``xxhash64(key, seed_i)`` — k independent seeds, all
JVM-side.  Sizing is automatic: the build hashes at the maximum size and
the driver folds the sparse bitset down (OR-ing halves) until the fill
fraction reaches the design point (~1/4 at k=3 → ~1.6% false-positive
rate), so no separate distinct-count job is needed.  At the cap the
filter degrades gracefully (higher fpp = less pruning, same results).

No counterpart exists in the reference (`/root/reference/` has no joins
at all, main.py:90-97); this is Part-B engine surface.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hard cap on filter bits: 2**22 bits = 1 MiB hex literal in the plan
_MAX_BITS = 1 << 22
_MIN_BITS = 1 << 10


#: fold the driver-side bitset down while the fill fraction stays under
#: this bound — folding roughly doubles fill, so stopping at 1/8 keeps
#: the final fill <= ~1/4 (fpp ~ fill**k ~ 1.6% at k=3)
_FOLD_FILL = 0.125


def build_bloom_hex(
    build_side: DataFrame,
    key: str,
    num_hashes: int = 3,
) -> Tuple[str, int]:
    """Build a bloom filter over ``build_side[key]``; returns
    ``(hex_bits, m)`` for :func:`bloom_might_contain`.

    ONE Spark job on the build side: positions are hashed at the maximum
    filter size and aggregated to (nibble, mask) rows — at most
    ``3 * n_keys`` of them, tiny for a dim — then the driver FOLDS the
    sparse bitset down by OR-ing halves (``bits[i % m] |= bits[i]``,
    valid because every smaller m divides the power-of-two maximum)
    until the fill fraction would exceed the design point.  Folding
    needs no second pass over the data, so sizing requires no separate
    distinct-count job — runtime filters should cost the probe side
    nothing and the build side one aggregation.
    """
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(_MAX_BITS))
        for i in range(num_hashes)
    ]
    nibbles = (
        build_side.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (p / 4).cast("int").alias("nib"),
                            F.pmod(p, F.lit(4)).cast("int").alias("bit"),
                        )
                        for p in pos
                    ]
                )
            ).alias("pb")
        )
        .groupBy(F.col("pb.nib").alias("nib"))
        .agg(
            F.bit_or(
                F.when(F.col("pb.bit") == 0, 1)
                .when(F.col("pb.bit") == 1, 2)
                .when(F.col("pb.bit") == 2, 4)
                .otherwise(8)
            ).alias("mask")
        )
        .collect()
    )
    sparse = {row["nib"]: row["mask"] for row in nibbles}
    m = _MAX_BITS
    while m > _MIN_BITS:
        half = m // 2
        folded: dict = {}
        for nib, mask in sparse.items():
            j = nib % (half // 4)
            folded[j] = folded.get(j, 0) | mask
        fill = sum(bin(v).count("1") for v in folded.values()) / half
        if fill > _FOLD_FILL:
            break
        sparse, m = folded, half
    chars = ["0"] * (m // 4)
    for nib, mask in sparse.items():
        chars[nib] = format(mask, "x")
    return "".join(chars), m


def bloom_might_contain(
    hex_bits: str, m: int, key: Column, num_hashes: int = 3
) -> Column:
    """Probe predicate: True iff ``key`` *might* be in the filter (never
    a false negative).  Pure column algebra — ``substring`` into the
    hex literal, ``conv`` nibble -> int, bitwise test — so it runs inside
    whole-stage codegen in the probe side's scan stage, before any
    exchange.  NULL keys probe to NULL, which ``filter`` drops — matching
    the inner equi-join, which drops NULL keys too."""
    lit_bits = F.lit(hex_bits)
    pred = None
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
        nib = F.conv(
            F.substring(lit_bits, (pos / 4).cast("int") + 1, 1), 16, 10
        ).cast("int")
        bit = F.pmod(pos, F.lit(4))
        mask = (
            F.when(bit == 0, 1)
            .when(bit == 1, 2)
            .when(bit == 2, 4)
            .otherwise(8)
        )
        hit = nib.bitwiseAND(mask) != 0
        pred = hit if pred is None else (pred & hit)
    return pred


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    how: str = "inner",
    num_hashes: int = 3,
) -> DataFrame:
    """Equi-join ``probe`` to ``build`` with a bloom pre-filter on the
    probe side.  Result-invariant vs the plain join for ``inner`` and
    ``left_semi`` (the only hows accepted): bloom false positives are
    removed by the exact join; false negatives cannot occur."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_pruned_join: how={how!r} is not result-invariant "
            "under a probe-side pre-filter; use 'inner' or 'left_semi'."
        )
    hex_bits, m = build_bloom_hex(
        build, build_key, num_hashes=num_hashes
    )
    if probe_key == build_key:
        raise ValueError(
            "bloom_pruned_join: probe_key and build_key must be distinct "
            "names so the join condition resolves unambiguously."
        )
    pruned = probe.where(
        bloom_might_contain(hex_bits, m, F.col(probe_key), num_hashes)
    )
    return pruned.join(
        build, F.col(probe_key) == F.col(build_key), how
    )


__all__ = ["build_bloom_hex", "bloom_might_contain", "bloom_pruned_join"]
