"""Materialize a larger scale factor by replicating sf0.1 with key shifts.

The driver ships sf0.001/0.01/0.1 only; at sf0.1 the headline queries run
in 0.3-3 s, which is overhead-dominated enough that a linear plan and an
accidentally-quadratic one can time alike.  This tool builds an
sf1-equivalent (10 copies of sf0.1) for scaling probes:

- fact/entity keys are shifted per copy by a disjoint 2^32 stride, so
  joins, sessionization, and group-bys keep within-copy cardinalities —
  the same shape a genuinely larger generator would produce;
- document text gets a per-copy vowel substitution (length-preserving),
  so cross-copy rows are NOT near-duplicates and the corpus keeps the
  sf0.1 duplicate *rate* instead of acquiring a 10-way duplicate for
  every doc (which would inflate LSH pair output superlinearly and
  invalidate the probe);
- dimension tables (region, nation) stay single-copy, as in TPC-H;
- embeddings replicate as-is: an ANN corpus 10x bigger with the same
  vector distribution is exactly the scale-up shape.

Output is scratch data for perf probes only — never an oracle input.

Usage: PYTHONPATH=/root/repo python tools/make_scaled.py [K] [dst]
       (defaults: K=10, dst=/root/repo/.scratch/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 1 << 32

# per-table bigint key columns to shift by copy * STRIDE
_SHIFT = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
}
_DIMS = ["region", "nation"]

# 5-char vowel image per copy (copy 0 = identity); consonant targets keep
# token lengths and whitespace identical so per-doc work is unchanged.
# The map is the copy index written base-21 over the consonant alphabet, so
# every copy up to 21**5 gets a DISTINCT substitution — a fixed table would
# wrap and silently emit byte-identical text across copies, which is exactly
# the K-way-duplicate inflation this perturbation exists to prevent.
_CONSONANTS = "bcdfghjklmnpqrstvwxyz"


def _vowel_map(i: int) -> str:
    if i >= len(_CONSONANTS) ** 5:
        raise ValueError(f"copy index {i} exceeds the distinct-map space")
    digits = []
    for _ in range(5):
        digits.append(_CONSONANTS[i % len(_CONSONANTS)])
        i //= len(_CONSONANTS)
    return "".join(digits)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lmds-make-scaled")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # events carries TIMESTAMP(NANOS); read as long like queries._t does.
    # The copy keeps ts as raw nanos bigint — the loader converts on read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for table in _DIMS:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{table}.parquet")
        print(f"{table}: dim copied")

    for table, keys in _SHIFT.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for i in range(k):
            cp = base
            for key in keys:
                cp = cp.withColumn(key, F.col(key) + F.lit(i * STRIDE))
            if table == "documents" and i > 0:
                cp = cp.withColumn(
                    "text", F.translate("text", "aeiou", _vowel_map(i))
                )
            parts.append(cp)
        out = parts[0]
        for cp in parts[1:]:
            out = out.unionByName(cp)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        n = spark.read.parquet(f"{dst}/{table}.parquet").count()
        print(f"{table}: {n} rows ({k} copies)")

    spark.stop()


if __name__ == "__main__":
    main()
