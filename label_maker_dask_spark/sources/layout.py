"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

A single-column sort gives parquet min/max statistics that prune scans on
that column only — a predicate on any OTHER column overlaps every file.
Interleaving the bits of several columns into one Morton key and
range-partitioning + sorting on it gives every file a tight bounding box
in ALL the clustered dimensions, so bbox-style predicates (tile lookups,
time × user slices, embedding-cell probes) prune files and row groups on
each dimension independently.  This is the layout half of the same idea
as :func:`sources.io.write_bucketed_table` for equi-joins.

Scale posture (100 TB):

- The key is pure Catalyst column math (shift/and/or — whole-stage
  codegen); the only extra work vs a plain sorted write is one tiny
  min/max aggregate (2 scalars per clustered column) when ranges are not
  supplied by the caller.
- ``repartitionByRange`` on the key samples the key distribution (AQE
  handles skew), so files cover disjoint Morton ranges — file-level
  pruning works in any engine that reads footer statistics, row-group
  pruning within files comes from ``sortWithinPartitions``.
- Linear scaling of values to the grid keeps heavy skew in few cells;
  for skewed columns pass quantile-based ``ranges`` (e.g. from
  ``approxQuantile``) to equalize cell occupancy.

Measured (tests/test_layout.py, 200k rows, 16 files): a 1/8-of-domain
slice on the SECOND clustered dimension overlaps 16/16 files under a
plain first-column sort (zero pruning) and 4/16 under Z-order (12 files
skipped), identical row results.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grid_index(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a value linearly onto the ``[0, 2**bits)`` integer grid,
    clamping out-of-range values into the edge cells (order-preserving)."""
    if hi <= lo:  # degenerate range: everything in cell 0
        return F.lit(0).cast("long")
    cells = 1 << bits
    scaled = F.floor(
        (c.cast("double") - float(lo)) / (float(hi) - float(lo)) * cells
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells - 1), scaled))


def zorder_key(
    ranges: Dict[str, Tuple[float, float]], bits: int = 16
) -> Column:
    """Morton key interleaving the bits of each column's grid index:
    bit ``i`` of column ``j`` lands at position ``i * n_cols + j``.
    ``bits * n_cols`` must fit a signed 64-bit key (≤ 62)."""
    cols = list(ranges)
    if bits * len(cols) > 62:
        raise ValueError(
            f"{len(cols)} columns at {bits} bits exceed a 63-bit key; "
            "lower bits= or cluster fewer columns"
        )
    grids = [
        _grid_index(F.col(c), lo, hi, bits) for c, (lo, hi) in ranges.items()
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, g in enumerate(grids):
            bit = F.shiftright(g, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(grids) + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 16,
    ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> Dict[str, Tuple[float, float]]:
    """Write ``df`` clustered on the Morton key of ``cols``: range
    partition into ``n_files`` disjoint key ranges, sort rows by the key
    within each, write with the schema UNCHANGED (the key exists only in
    the exchange/sort expressions).  Returns the per-column ranges used,
    so readers / later incremental writes can rebuild the same key."""
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = df.agg(*aggs).first()
        ranges = {
            c: (float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in cols
        }
    z = zorder_key(ranges, bits=bits)
    (
        df.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
    return ranges


def write_zordered_fixed(
    df: DataFrame,
    path: str,
    ranges: Dict[str, Tuple[float, float]],
    bits: int = 8,
    n_files: int = 16,
    bucket_col: str = "zb",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Deterministic-boundary Z-order write: the file (bucket) a row
    lands in is the TOP bits of its Morton key — pure arithmetic, no
    ``RangePartitioner`` sampling — written as one directory per bucket
    (``partitionBy``), one file per occupied bucket.

    Two production reasons to prefer fixed boundaries over
    :func:`write_zordered`'s sampled ranges:

    - **incremental writes**: later appends bucket by the SAME
      arithmetic (given the same ``ranges``), so new files join existing
      buckets instead of overlapping them — sampled boundaries drift
      run-to-run;
    - **derivable pruning manifest**: a file's key range is a closed
      form of its bucket id, so any engine (or an oracle) can compute
      which files a bbox predicate must read without footer access —
      the observable ``layout_zorder_file_pruning`` hash-gates.

    The trade: sampled boundaries equalize file SIZE under key skew;
    fixed boundaries equalize file KEY-SPAN and inherit the data's
    skew (pass quantile-based ``ranges`` to re-equalize).  ``n_files``
    must be a power of two dividing the ``bits * len(ranges)``-bit key
    space."""
    total_bits = bits * len(ranges)
    shift = total_bits - (n_files.bit_length() - 1)
    # n_files <= 0 must be caught explicitly: 0 & -1 == 0 passes the
    # power-of-two test and (0).bit_length()-1 == -1 makes shift large
    if n_files <= 0 or n_files & (n_files - 1) or shift < 0:
        raise ValueError(
            f"n_files={n_files} must be a power of two in "
            f"[1, 2**{total_bits}]"
        )
    z = zorder_key(ranges, bits=bits)
    (
        df.withColumn(bucket_col, F.shiftright(z, shift))
        .repartition(n_files, F.col(bucket_col))
        .sortWithinPartitions(z)
        .write.partitionBy(bucket_col)
        .format(fmt)
        .mode(mode)
        .save(path)
    )


def compact_small_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite a table directory into ~``target_file_mb``-sized files —
    the maintenance half of any streaming/incremental sink, whose
    per-batch commits otherwise accumulate thousands of KB-scale files
    that throttle every later scan on task-scheduling overhead.

    File count derives from the CURRENT on-disk byte size (cheap driver
    listing, no data scan); the rewrite itself is one narrow
    ``coalesce`` job (no shuffle — coalesce only unions input splits)
    through a temp directory, then a rename-aside swap
    (``rename(path, ._old); rename(tmp, path); rmtree(._old)``): the
    table directory is never deleted before its replacement exists, so a
    crash at any point is recoverable (a leftover ``._old`` proves the
    tmp write completed — promote it; a tmp with no ``._old`` is an
    incomplete write — discard it; ``_recover_compaction`` does both and
    runs on entry).  NOT a concurrent-reader guarantee: a reader listing
    the path between the two renames sees it briefly absent, and one
    mid-scan across the swap sees old files vanish — compaction assumes a
    single writer and quiesced readers, as plain-parquet OPTIMIZE must
    (a snapshot/table format lifts that; see sources/snapshots.py).
    Returns the resulting file count.

    At real scale this is the OPTIMIZE/bin-packing job a table format
    schedules; on plain parquet it must rewrite the partition wholesale —
    run it per partition directory, not per table, when partitions exist.
    """
    import os
    import shutil

    _recover_compaction(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "._compacting"
    old = path.rstrip("/") + "._old"
    (
        spark.read.format(fmt)
        .load(path)
        .coalesce(n_files)
        .write.format(fmt)
        .mode("overwrite")
        .save(tmp)
    )
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def _recover_compaction(path: str) -> None:
    """Finish an interrupted :func:`compact_small_files` swap (idempotent).
    Mirrors ``streaming.upsert._recover``: ``._old`` present means the
    ``._compacting`` write completed (the table is only set aside after the
    write succeeds), so promote tmp if the table path is missing; then drop
    leftovers."""
    import os
    import shutil

    tmp = path.rstrip("/") + "._compacting"
    old = path.rstrip("/") + "._old"
    if os.path.exists(old):
        if not os.path.exists(path):
            if os.path.exists(tmp):
                os.rename(tmp, path)
            else:  # unreachable by the swap's ordering, but restore anyway
                os.rename(old, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
