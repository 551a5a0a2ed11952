"""Embedding-COUNT axis probe for the quantized ANN tier (round 14).

The sf ladder (tools/scaling_probe.py) grows corpus AND query set
together — the by-construction quadratic regime for SRP-candidate rows.
This probe isolates the corpus-linear path: the QUERY SET IS FIXED
(sf0.1's original vec_id % 25 rows) while the corpus inflates x1 / x4 /
x16 with circularly-rotated copies (rotation decorrelates SRP buckets,
so bucket occupancy grows linearly and uniformly, never as stacked
duplicates), and the SQ8 / PQ paths are timed per phase.  Linear-or-
better is the pass bar: with fixed queries, candidates grow with bucket
occupancy (~linear in corpus), training and encode are linear scans,
and the index write is a linear encode + partitioned write.

Usage: PYTHONPATH=/root/repo python tools/embedding_axis_probe.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/embeddings.parquet"
DIM = 64


def inflated(spark, factor: int):
    """x``factor`` corpus: copy k gets ids offset by k*stride and its
    vector circularly rotated by (7*k) % DIM positions — same value
    distribution, decorrelated SRP buckets."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(BASE).select("vec_id", "embedding")
    stride = 10_000_000
    parts = [emb]
    v = F.col("embedding")
    for kk in range(1, factor):
        rot = (7 * kk) % DIM
        rotated = F.concat(
            F.slice(v, rot + 1, DIM - rot), F.slice(v, 1, rot)
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + kk * stride).alias("vec_id"),
                rotated.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from label_maker_dask_spark.operators.similarity import (
        pq_adc_topk,
        pq_adc_topk_join,
        pq_adc_topk_stored,
        sq8_rescore_topk,
        write_pq_index,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lmds-embedding-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_max = spark.read.parquet(BASE).agg(
        F.max("vec_id")
    ).collect()[0][0]
    fixed_pred = (F.col("vec_id") % 25 == 0) & (F.col("vec_id") <= base_max)

    scratch = tempfile.mkdtemp(prefix="lmds_embprobe_")
    factors = [1, 4, 16]
    corpora = {}
    for f in factors:
        path = os.path.join(scratch, f"emb_x{f}.parquet")
        inflated(spark, f).write.mode("overwrite").parquet(path)
        corpora[f] = path

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    phases = []

    def run(factor: int) -> dict:
        emb = spark.read.parquet(corpora[factor])
        queries = emb.where(fixed_pred)
        cells = {}
        cells["sq8_rescore"] = timed(
            lambda: noop(sq8_rescore_topk(emb, fixed_pred, k=5))
        )
        cells["pq_adc_onthefly"] = timed(
            lambda: noop(pq_adc_topk(emb, fixed_pred, k=5))
        )
        idx = os.path.join(scratch, f"idx_x{factor}")
        t0 = time.time()
        write_pq_index(emb, idx)
        cells["pq_index_build"] = time.time() - t0  # build once, not best-of-2
        cells["pq_stored_read"] = timed(
            lambda: noop(pq_adc_topk_stored(spark, idx, queries, k=5))
        )
        cells["pq_join_read"] = timed(
            lambda: noop(pq_adc_topk_join(spark, idx, queries, k=5))
        )
        return cells

    # warm codegen/Arrow once on the base corpus
    run(1)
    results = {f: run(f) for f in factors}
    shutil.rmtree(scratch, ignore_errors=True)

    phases = list(results[1].keys())
    print(
        f"{'phase':18s} {'x1':>8s} {'x4':>8s} {'x16':>8s}"
        f" {'x(top4x)':>9s} {'exp':>6s}"
    )
    for p in phases:
        c = [results[f][p] for f in factors]
        ratio = c[2] / c[1] if c[1] > 0 else float("nan")
        exp = math.log(ratio, 4) if ratio > 0 else float("nan")
        print(
            f"{p:18s} {c[0]:8.2f} {c[1]:8.2f} {c[2]:8.2f}"
            f" {ratio:9.2f} {exp:6.2f}"
        )


if __name__ == "__main__":
    main()
