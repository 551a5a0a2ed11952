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

Representation: the bit array is produced as a hex string (stable,
driver-side, easy to log/store) but enters the plan through ``unhex``
of that literal, which Catalyst CONSTANT-FOLDS into a single **binary
literal** — so the probe is ``substring`` into a byte array (O(1)
arraycopy per probe) + ``hex``/``conv`` of ONE byte + a bitmask test,
all inside whole-stage codegen.  Probing a *string* literal instead
(the round-9 form) was the measured scale defect: ``substring`` on
StringType walks char boundaries from the start of the string, so each
probe into a 1 MiB hex literal scanned ~0.5 MB — linear in filter
size, exp 0.83 over the probe's top decade.  The binary form is
position-arithmetic, independent of filter size.  The build is one
aggregation over the (small) build side: positions -> byte index ->
``bit_or`` of byte masks -> at most ``3 * n_keys`` tiny rows to the
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

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: hard cap on filter bits: 2**22 bits = 1 MiB hex literal in the plan
_MAX_BITS = 1 << 22
_MIN_BITS = 1 << 10


#: fold the driver-side bitset down while the fill fraction stays under
#: this bound — folding roughly doubles fill, so stopping at 1/8 keeps
#: the final fill <= ~1/4 (fpp ~ fill**k ~ 1.6% at k=3)
_FOLD_FILL = 0.125


#: integral types that may be hashed under a common ``bigint`` cast:
#: Spark widens them losslessly, so probe/build sides agree on the hash
#: input even when their declared widths differ (int fk vs bigint pk).
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _hash_cast(probe_type: T.DataType, build_type: T.DataType) -> Optional[str]:
    """Common type both key columns must be cast to *before hashing*.

    ``xxhash64`` is type-sensitive: int 5 and bigint 5 hash to different
    values, so hashing mismatched key dtypes raw would turn every true
    match into a bloom false negative — silently wrong results, while the
    plain join still matches via implicit cast.  Returns ``None`` when the
    dtypes already agree (no cast needed), a cast target when they can be
    reconciled losslessly (integral family -> ``bigint``), and raises for
    anything else.
    """
    if probe_type == build_type:
        return None
    if isinstance(probe_type, _INTEGRAL) and isinstance(build_type, _INTEGRAL):
        return "bigint"
    raise ValueError(
        "bloom_pruned_join: probe/build key dtypes differ "
        f"({probe_type.simpleString()} vs {build_type.simpleString()}) and "
        "cannot be reconciled for hashing; xxhash64 is type-sensitive, so "
        "mismatched dtypes would produce bloom false negatives. Cast the "
        "keys to a common type first."
    )


def _bit_mask(bit: Column) -> Column:
    """``1 << bit`` for ``bit`` in 0..7 as a when-chain (``shiftleft``
    only takes a literal shift amount)."""
    mask = F.when(bit == 0, 1)
    for b in range(1, 8):
        mask = mask.when(bit == b, 1 << b)
    return mask


def build_bloom_hex(
    build_side: DataFrame,
    key: str,
    num_hashes: int = 3,
    hash_cast: Optional[str] = None,
) -> Tuple[str, int]:
    """Build a bloom filter over ``build_side[key]``; returns
    ``(hex_bits, m)`` for :func:`bloom_might_contain`.

    ONE Spark job on the build side: positions are hashed at the maximum
    filter size and aggregated to (byte index, byte mask) rows — at most
    ``3 * n_keys`` of them, tiny for a dim — then the driver FOLDS the
    sparse bitset down by OR-ing halves (``bits[i % m] |= bits[i]``,
    valid because every smaller m divides the power-of-two maximum)
    until the fill fraction would exceed the design point.  Folding
    needs no second pass over the data, so sizing requires no separate
    distinct-count job — runtime filters should cost the probe side
    nothing and the build side one aggregation.

    The returned hex string encodes the byte array in byte order (two
    hex chars per byte, byte 0 first) — exactly what ``unhex`` parses —
    with bit ``b`` of byte ``j`` holding position ``j*8 + b``
    (LSB-first).

    ``hash_cast``: cast the key to this type before hashing (must match
    the cast used in :func:`bloom_might_contain` — xxhash64 is
    type-sensitive).
    """
    key_col = F.col(key)
    if hash_cast is not None:
        key_col = key_col.cast(hash_cast)
    pos = [
        F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(_MAX_BITS))
        for i in range(num_hashes)
    ]
    byte_rows = (
        build_side.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (p / 8).cast("int").alias("byte"),
                            F.pmod(p, F.lit(8)).cast("int").alias("bit"),
                        )
                        for p in pos
                    ]
                )
            ).alias("pb")
        )
        .groupBy(F.col("pb.byte").alias("byte"))
        .agg(F.bit_or(_bit_mask(F.col("pb.bit"))).alias("mask"))
        .collect()
    )
    sparse = {row["byte"]: row["mask"] for row in byte_rows}
    m = _MAX_BITS
    while m > _MIN_BITS:
        half = m // 2
        folded: dict = {}
        for byte, mask in sparse.items():
            j = byte % (half // 8)
            folded[j] = folded.get(j, 0) | mask
        fill = sum(bin(v).count("1") for v in folded.values()) / half
        if fill > _FOLD_FILL:
            break
        sparse, m = folded, half
    chars = ["00"] * (m // 8)
    for byte, mask in sparse.items():
        chars[byte] = format(mask, "02x")
    return "".join(chars), m


def bloom_might_contain(
    hex_bits: str, m: int, key: Column, num_hashes: int = 3,
    hash_cast: Optional[str] = None,
) -> Column:
    """Probe predicate: True iff ``key`` *might* be in the filter (never
    a false negative).  Pure column algebra, O(1) per probe: the hex
    literal enters through ``unhex``, which constant-folds to a single
    BINARY literal, so ``substring`` is a one-byte arraycopy at a
    computed offset (position arithmetic — StringType substring would
    instead walk the literal from the start, linear in filter size);
    ``hex``/``conv`` turn that byte into an int for the bitmask test.
    Everything runs inside whole-stage codegen in the probe side's scan
    stage, before any exchange.

    NULL keys: Spark's ``xxhash64`` *skips* null children, so
    ``xxhash64(NULL, seed)`` is a non-null constant — all NULL keys would
    hash to the same positions and could pass the bit test.  The
    predicate therefore carries an explicit ``isNotNull`` conjunct so
    NULL probe rows are pruned pre-shuffle, matching the inner equi-join
    (which drops NULL keys anyway)."""
    bin_bits = F.unhex(F.lit(hex_bits))  # foldable -> one binary literal
    if hash_cast is not None:
        key = key.cast(hash_cast)
    pred = key.isNotNull()
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
        byte = F.conv(
            F.hex(
                F.substring(bin_bits, (pos / 8).cast("int") + 1, F.lit(1))
            ),
            16,
            10,
        ).cast("int")
        hit = byte.bitwiseAND(_bit_mask(F.pmod(pos, F.lit(8)))) != 0
        pred = pred & hit
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
    if probe_key == build_key:
        raise ValueError(
            "bloom_pruned_join: probe_key and build_key must be distinct "
            "names so the join condition resolves unambiguously."
        )
    # dtype reconciliation BEFORE the (job-running) build, so a bad call
    # fails fast without wasting a build-side aggregation
    cast = _hash_cast(
        probe.schema[probe_key].dataType, build.schema[build_key].dataType
    )
    hex_bits, m = build_bloom_hex(
        build, build_key, num_hashes=num_hashes, hash_cast=cast
    )
    pruned = probe.where(
        bloom_might_contain(
            hex_bits, m, F.col(probe_key), num_hashes, hash_cast=cast
        )
    )
    return pruned.join(
        build, F.col(probe_key) == F.col(build_key), how
    )


__all__ = ["build_bloom_hex", "bloom_might_contain", "bloom_pruned_join"]
