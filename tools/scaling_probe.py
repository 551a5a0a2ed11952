"""Scaling probe: run representative operators at sf0.001 / sf0.01 / sf0.1
(100x data growth end-to-end) and print per-query times + growth ratios.

A plan whose runtime grows ~linearly (or sublinearly, while fixed overhead
dominates) across two decades of data is evidence the shape survives
scale-up; anything superlinear is a red flag to investigate with
`.explain("formatted")`.  Results are recorded in SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    # shuffle-heavy relational
    "q9_product_profit",
    "q21_suppliers_who_shipped_last",
    # window
    "window_running_order_total",
    # flagship narrow agg
    "classification_labels_flagship",
    # LLM pipeline
    "dedup_minhash_lsh_pairs",
    "similarity_lsh_topk_ann",
    "text_repetition_bigrams",
    "dedup_components_minhash",
    "contamination_3gram_overlap",
    # rasterize (pandas-UDF path)
    "segmentation_raster_class_areas",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from pyspark.sql import SparkSession

    import label_maker_dask_spark.queries as Q

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lmds-scaling-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # warm every probe once (JIT/codegen/Arrow worker startup)
    for name in PROBES:
        Q.QUERIES[name](spark, SFS[0]).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    print(f"{'query':38s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'x(10x)':>7s} {'x(100x)':>8s}")
    for name in PROBES:
        ts = []
        for sf_dir in SFS:
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name:38s} {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f} "
            f"{ts[2] / max(ts[1], 1e-9):7.1f} {ts[2] / max(ts[0], 1e-9):8.1f}"
        )


if __name__ == "__main__":
    main()
