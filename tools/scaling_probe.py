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
    "segmentation_buffered_ring_areas",
    # round-5 operators
    "merge_upsert_orders_cdc",
    "join_skew_salted_brand_revenue",
    "timeseries_ohlc_hourly_by_type",
    "embedding_kmeans_clusters_arrow",
    "agg_kmv_merged_weekly_users",
    # round-6 operators
    "graph_pagerank_transitions",
    "anomaly_zscore_daily_events",
    # round-7 operators
    "dedup_containment_lsh_pairs",
    "graph_event_transitions_chunked",
    "events_sessionize_30m_chunked",
    "similarity_ivf_join_topk_ann",
    "anomaly_mad_daily_events",
    "join_asof_latest_order_merge",
    "attribution_last_touch",
    "timeseries_trailing_p90_value",
    "agg_kmv_trailing7_users",
    "scd2_user_state_history",
    # round-7 scale-technique operators
    "join_bloom_pruned_order_revenue",
    "graph_khop_reachability",
    "timeseries_gapfill_interpolated",
    "profile_orders_columns",
    "timeseries_rolling_corr_views_purchases",
    # round-8 operators
    "multimodal_phash_neardup_pairs",
    "agg_heavy_hitters_users",
    "analytics_event_path_trigrams",
    "graph_triangle_copurchase",
    "join_asof_forward_next_event",
    "analytics_chi2_event_type_by_hour",
    "join_asof_nearest_order_event",
    "agg_winsorized_mean_price",
    "spatial_grid_bbox_join",
    "timeseries_ema30_daily_revenue",
    "agg_mode_priority_by_status",
    # round-9 operators
    "agg_cms_daily_merged_user_counts",
    "curation_leakage_safe_split",
    "analytics_equidepth_histogram_price",
    "dedup_components_simhash60",
    "analytics_rfm_customer_segments",
    "agg_kmv_setops_weekday_weekend",
    "analytics_market_basket_part_pairs",
    "text_feature_hashing_vectors",
    "window_ratio_to_report_nation_share",
    "attribution_linear",
    # round-10 operators: exact trailing distinct counts, the HLL bound
    # gate, and the streaming batch-replay twins (their cells time the
    # full 3-batch sink drive, not just a read)
    "window_trailing7_distinct_users_exact",
    "agg_hll_sketch_weekly_users",
    "stream_upsert_orders_replay",
    "stream_scd2_user_state_replay",
    "stream_accumulate_supplier_replay",
    "stream_versioned_diff_replay",
    "stream_upsert_bucketed_orders_replay",
    "stream_neardup_index_replay",
    "stream_scd2_bucketed_user_state_replay",
    "stream_ohlc_hourly_replay",
    "stream_session_30m_replay",
    "stream_interval_join_replay",
    "stream_dedup_replay",
    "stream_sliding_1h30m_replay",
    "stream_late_data_drop_replay",
    "anomaly_cusum_daily_events",
    "text_bm25_top_docs",
    "text_vocab_coverage_top30",
    "profile_join_key_skew_lineitem",
    # round-11 operators
    "stream_interval_join_outer_replay",
    "layout_zorder_file_pruning",
    "stream_transitions_stateful_replay",
    "stream_running_stats_replay",
    "join_skew_salted_hotkey_adversarial",
    "sessionize_hotuser_adversarial",
    "snapshot_time_travel_read",
    "layout_compaction_rewrite",
    "stream_transitions_hotkey_replay",
    "layout_zorder_incremental_append",
    "transitions_chunked_hotuser_adversarial",
    "stream_interval_join_semi_replay",
    "asof_merge_hotuser_adversarial",
    "stream_session_timeout_replay",
    "stream_interval_join_full_replay",
    "stream_static_join_enrich_replay",
    "stream_tile_source_replay",
    "stream_tile_source_partitioned_replay",
    # round-12: the hot-key interval-join twin (streaming state skew)
    "stream_interval_join_hotuser_replay",
    # round-12: checkpoint-restart exactly-once for the upsert sink
    "stream_upsert_restart_replay",
    "stream_session_restart_replay",
    "stream_interval_join_restart_replay",
    # round-13: giant-dup-component adversarial curation gate,
    # target-mixture resampling, HTML boilerplate extraction
    "curation_hotcomponent_adversarial",
    "curation_mixture_resample",
    "text_html_boilerplate_strip",
    "curation_repeat_upsample",
    "curation_quality_funnel",
    "stream_transitions_restart_replay",
    # round-13: quantized ANN rescore, bigram LM, char entropy, seasonal LOO
    "similarity_sq8_rescore_ann",
    "text_bigram_logprob_interp",
    "text_char_entropy",
    "anomaly_seasonal_dow_residual",
    "similarity_pq_adc_topk_ann",
    "text_source_kl_divergence",
    "stream_pq_index_replay",
    "profile_srp_bucket_skew",
    "similarity_hotbucket_dedup_adversarial",
    "curation_token_budget_select",
    "stream_upsert_schema_evolution_replay",
    "spatial_tile_pyramid_rollup",
    # round-14: PQ phase split + join twin, detection e2e, BPE training
    # and application.  (The COG/MVT round-trip gates are fixed-size
    # synthetic fixtures — sf-independent by construction, not probed.)
    "similarity_pq_index_build",
    "similarity_pq_stored_topk_ann",
    "similarity_pq_join_topk_ann",
    "detection_labels_e2e",
    "text_bpe_train_merges",
    "text_bpe_tokenize_corpus",
    # round-15: type-widening restart replay (the WMS/UTM/JPEG fixture
    # gates are sf-independent by construction, like the COG/MVT round
    # trips — not probed) and the ANN recall observables (exact side is
    # the corpus-scale pass; candidate sides are bucket/probe joins)
    "stream_upsert_type_widening_replay",
    "similarity_recall_srp_vs_exact",
    "similarity_recall_ivf_vs_exact",
    "similarity_lsh_multiprobe_topk_ann",
    "similarity_recall_srp_multiprobe_vs_exact",
    # round-16: the multi-table high-recall tier (L-times index rows in
    # one Arrow pass + candidate-pair dedup), the TMS transport gate is
    # fixture-fixed and not probed, and the planted recall observables
    # (exact side corpus-scale; planted corpus derives 1:1 from
    # embeddings so it scales with sf)
    "similarity_lsh_multitable_topk_ann",
    "similarity_recall_multitable_planted_vs_exact",
    "similarity_recall_sq8_rescored_planted_vs_exact",
    "similarity_recall_pq_planted_vs_exact",
    "similarity_recall_pq_rescored_planted_vs_exact",
    "profile_multitable_candidate_volume",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# sf1-equivalent built by tools/make_scaled.py (10x sf0.1, key-shifted,
# cross-copy text perturbed) — included automatically when present, giving
# the probe three decades of growth with the top decade past the
# overhead-dominated regime
_SF1 = "/root/repo/.scratch/sf1"


def main() -> None:
    from pyspark.sql import SparkSession

    import label_maker_dask_spark.queries as Q

    # optional argv name filter: probe just the named queries (the
    # bespoke streaming probes run only on a full, unfiltered sweep)
    only = set(sys.argv[1:])
    unknown = only - set(PROBES)
    if unknown:
        sys.exit(
            f"unknown probe names (not in PROBES): {sorted(unknown)}"
        )
    probes = [n for n in PROBES if not only or n in only]

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
    dirs = list(SFS)
    if os.path.isdir(_SF1):
        dirs.append(_SF1)

    for name in probes:
        Q.QUERIES[name](spark, dirs[0]).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    labels = [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    header = f"{'query':38s} " + " ".join(f"{lb:>8s}" for lb in labels)
    if len(dirs) == 4:
        # growth over the top decade, and its exponent: a linear plan has
        # e<=1 (e<1 while fixed overhead still amortizes), quadratic ~2
        header += f" {'x(top10x)':>9s} {'exp':>5s}"
    print(header)
    import math

    for name in probes:
        ts = []
        for sf_dir in dirs:
            # best-of-2: single runs in a shared JVM see multi-second GC /
            # page-cache interference spikes that fake a superlinear point
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            ts.append(best)
        line = f"{name:38s} " + " ".join(f"{t:8.2f}" for t in ts)
        if len(ts) == 4:
            growth = ts[3] / max(ts[2], 1e-9)
            line += f" {growth:9.1f} {math.log10(max(growth, 1e-9)):5.2f}"
        print(line)

    if only:
        return  # targeted run: catalog probes only

    # streaming-upsert maintenance: not a catalog query (it drives a
    # StreamingQuery + on-disk base table), probed bespoke below.
    # Warm the streaming machinery first — an unwarmed first drain carries
    # several seconds of one-time JIT/codegen that fakes a superlinear
    # sf0.1 cell (observed: 6.1 s unwarmed vs 1.8 s warmed best-of-2)
    _stream_upsert_probe(spark, dirs[0])
    _stream_accumulate_probe(spark, dirs[0])
    ts = [
        min(_stream_upsert_probe(spark, d) for _ in range(2)) for d in dirs
    ]
    line = f"{'stream_upsert_maintenance_3batch':38s} " + " ".join(
        f"{t:8.2f}" for t in ts
    )
    if len(ts) == 4:
        growth = ts[3] / max(ts[2], 1e-9)
        line += f" {growth:9.1f} {math.log10(max(growth, 1e-9)):5.2f}"
    print(line)

    ts = [
        min(_stream_accumulate_probe(spark, d) for _ in range(2))
        for d in dirs
    ]
    line = f"{'stream_accumulate_maintenance_3batch':38s} " + " ".join(
        f"{t:8.2f}" for t in ts
    )
    if len(ts) == 4:
        growth = ts[3] / max(ts[2], 1e-9)
        line += f" {growth:9.1f} {math.log10(max(growth, 1e-9)):5.2f}"
    print(line)

    ts = [
        min(_neardup_stream_probe(spark, d) for _ in range(2))
        for d in dirs
    ]
    line = f"{'neardup_index_3batch_ingest':38s} " + " ".join(
        f"{t:8.2f}" for t in ts
    )
    if len(ts) == 4:
        growth = ts[3] / max(ts[2], 1e-9)
        line += f" {growth:9.1f} {math.log10(max(growth, 1e-9)):5.2f}"
    print(line)

    _bucketed_maintenance_probe(spark)
    _scd2_bucketed_probe(spark)
    _skewed_lag_probe(spark)
    _vrt_mosaic_probe()


def _neardup_stream_probe(spark, sf_dir: str) -> float:
    """Seconds to ingest the documents table into the incremental
    MinHash-LSH index as 3 micro-batches (streaming/neardup.py): batch
    0 seeds ~80% of the corpus, batches 1-2 each add ~10% and emit
    their verified pairs vs everything stored — the per-ingest cost
    that must scale with the delta, not the corpus."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from label_maker_dask_spark.streaming.neardup import (
        stream_neardup_index,
    )

    d = tempfile.mkdtemp()
    src = f"{d}/src"
    index = f"{d}/index"
    pairs = f"{d}/pairs"
    ckpt = f"{d}/ckpt"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.where(F.col("doc_id") % 10 <= 7).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for i in (8, 9):
        docs.where(F.col("doc_id") % 10 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    t0 = _time.perf_counter()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_neardup_index(stream, index, pairs, ckpt, threshold=0.5)
    q.awaitTermination(600)
    dt = _time.perf_counter() - t0
    shutil.rmtree(d, ignore_errors=True)
    return dt


def _stream_accumulate_probe(spark, sf_dir: str) -> float:
    """Seconds to drain a 3-micro-batch additive stream into the
    accumulate sink: batch 0 creates the per-(user, event_type) count
    table from the full events table, batches 1-2 each add deltas for
    ~10% of events — the continuously-maintained aggregate shape
    (`stream_accumulate_to_parquet`, in-table exactly-once marker)."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from label_maker_dask_spark.streaming.upsert import (
        stream_accumulate_to_parquet,
    )

    d = tempfile.mkdtemp(prefix="lmds_probe_accum_")
    deltas, base, ckpt = f"{d}/chg", f"{d}/base", f"{d}/ckpt"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    ev.select("user_id", "event_type", F.lit(1).alias("n")).coalesce(
        1
    ).write.mode("append").parquet(deltas)
    for i in (1, 2):
        ev.where(F.col("event_id") % 10 == i).select(
            "user_id", "event_type", F.lit(1).alias("n")
        ).coalesce(1).write.mode("append").parquet(deltas)
    t0 = _time.perf_counter()
    stream = (
        spark.readStream.schema("user_id long, event_type string, n int")
        .option("maxFilesPerTrigger", 1)
        .parquet(deltas)
    )
    q = stream_accumulate_to_parquet(
        stream, base, ckpt, keys=["user_id", "event_type"], sum_cols=["n"]
    )
    q.awaitTermination(600)
    dt = _time.perf_counter() - t0
    shutil.rmtree(d, ignore_errors=True)
    return dt


def _vrt_mosaic_probe() -> None:
    """Native VRT read path vs mosaic size: read the same 25 map tiles
    from a 4-file and a 1024-file mosaic of the same raster.  The
    windowed reader opens only DstRect-intersecting members, so per-tile
    latency must stay flat as the member count grows 256x — the property
    that makes a continent-scale mosaic readable tile-by-tile."""
    import pathlib
    import sys as _sys
    import tempfile
    import time as _time

    import numpy as np

    _sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from test_tiff import _write_vrt_mosaic  # the test-grade GeoTIFF writer

    from label_maker_dask_spark.sources.tiff import (
        _tile_bounds_4326,
        tif_image_fetcher,
    )

    z0, x0, y0 = 10, 515, 340
    bounds = _tile_bounds_4326(z0, x0, y0)
    arr = (
        (np.add.outer(np.arange(2048) * 3, np.arange(2048) * 7) % 251)
        .astype(np.uint8)
        .reshape(2048, 2048, 1)
    )
    print()
    print("vrt-mosaic tile reads (same raster, 25 tiles @ z15):")
    for n_split in (2, 32):  # 4 vs 1024 member files
        tmp = pathlib.Path(tempfile.mkdtemp(prefix="lmds_probe_vrt_"))
        vrt_path = _write_vrt_mosaic(tmp, arr, bounds, n_split=n_split)
        fetch = tif_image_fetcher(str(vrt_path))
        zz = z0 + 5
        t0 = _time.perf_counter()
        n_read = 0
        for dx in range(5):
            for dy in range(5):
                blob = fetch(zz, x0 * 32 + 3 + dx * 5, y0 * 32 + 3 + dy * 5)
                n_read += len(blob)
        dt = _time.perf_counter() - t0
        print(f"  {n_split * n_split:5d} files {dt:8.2f}  ({n_read} bytes)")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _skewed_lag_probe(spark) -> None:
    """Hot-user straggler measurement: one bot user owns 20% of a 6M-row
    event table.  The plain per-user lag window serializes that user's
    1.2M rows into ONE task; the chunked build
    (queries_graph_ext.transition_edges_chunked) time-slices the user
    across tasks and stitches boundaries with a tiny second window.
    Run with few shuffle partitions to make the straggler visible the way
    it would be on a real cluster (one executor pinned while the rest
    idle)."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import Window, functions as F

    from label_maker_dask_spark.queries_graph_ext import (
        transition_edges_chunked,
    )

    d = tempfile.mkdtemp(prefix="lmds_probe_skew_")
    # the bot owns HALF the events: on local[32] the regular users' work
    # spreads across all threads and finishes early, so the stage's wall
    # time is the bot partition — the same situation a 1000-executor
    # cluster is in as soon as the hot user's task outweighs the rest
    n_reg, n_bot = 2_000_000, 2_000_000
    reg = spark.range(n_reg).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000 + 2).alias("user_id"),
        F.timestamp_micros(F.col("id") * 250_000).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias(
            "event_type"
        ),
    )
    bot = spark.range(n_bot).select(
        (F.col("id") + n_reg).alias("event_id"),
        F.lit(1).alias("user_id"),
        F.timestamp_micros(F.col("id") * 120_000).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
    )
    reg.unionByName(bot).repartition(32).write.parquet(f"{d}/events")
    ev = spark.read.parquet(f"{d}/events")

    def plain():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.select(
                F.lag("event_type").over(w).alias("src"),
                F.col("event_type").alias("dst"),
            )
            .where(F.col("src").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )

    print()
    print("skewed-lag (4M events, one user owns 50%):")
    for label, build in (
        ("plain per-user window", plain),
        ("chunked (1h slices)", lambda: transition_edges_chunked(
            ev, chunk_seconds=3600
        )),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:42s} {best:8.2f}")
    shutil.rmtree(d, ignore_errors=True)


def _bucketed_maintenance_probe(spark) -> None:
    """The bucket-pruning claim, measured: with a FIXED-size delta (2
    micro-batches x 40 keys — the hot-key CDC shape), per-batch apply time
    should stay ~flat for the bucketed sink while the base table grows
    10x per row, whereas the plain sink's full rewrite grows with the
    base.  Prints its own cell: seconds for the two delta batches at each
    base size, per sink."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from label_maker_dask_spark.streaming.bucketed import (
        stream_upsert_to_parquet_bucketed,
    )
    from label_maker_dask_spark.streaming.upsert import stream_upsert_to_parquet
    from label_maker_dask_spark.streaming.versioned import (
        stream_upsert_to_versioned_table,
    )

    schema = "k long, v double, seq int"

    def run(base_rows: int, mode: str) -> float:
        d = tempfile.mkdtemp(prefix="lmds_probe_bucketed_")
        changes, base, ckpt = f"{d}/chg", f"{d}/base", f"{d}/ckpt"
        full = spark.range(base_rows).select(
            F.col("id").alias("k"),
            (F.col("id") * 0.5).alias("v"),
            F.lit(0).alias("seq"),
        )
        full.coalesce(8).write.mode("append").parquet(changes)

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 8)
                .parquet(changes)
            )
            if mode == "bucketed":
                q = stream_upsert_to_parquet_bucketed(
                    stream, base, ckpt, keys=["k"], seq_col="seq",
                    n_buckets=256,
                )
            elif mode == "versioned":
                q = stream_upsert_to_versioned_table(
                    stream, base, ckpt, keys=["k"], seq_col="seq",
                    n_buckets=256,
                )
            else:
                q = stream_upsert_to_parquet(
                    stream, base, ckpt, keys=["k"], seq_col="seq"
                )
            q.awaitTermination(600)

        drain()  # batch 0: create the base (untimed)
        for i in (1, 2):  # two 40-key point-update batches, one file each
            spark.range(40).select(
                ((F.col("id") * 977 + i) % base_rows).alias("k"),
                F.lit(float(i)).alias("v"),
                F.lit(i).alias("seq"),
            ).coalesce(1).write.mode("append").parquet(changes)
        t0 = _time.perf_counter()
        drain()  # timed: delta batches only
        dt = _time.perf_counter() - t0
        shutil.rmtree(d, ignore_errors=True)
        return dt

    sizes = [100_000, 1_000_000, 10_000_000]
    modes = (
        ("plain full-rewrite", "plain"),
        ("bucket-pruned", "bucketed"),
        ("versioned (bucket + history)", "versioned"),
    )
    for _, mode in modes:  # warm all code paths (JIT/codegen)
        run(50_000, mode)
    print()
    print(
        f"{'bucketed-maintenance (fixed 40-key delta x2)':46s} "
        + " ".join(f"{n//1000:>7d}k" for n in sizes)
    )
    for label, mode in modes:
        ts = [run(n, mode) for n in sizes]
        print(f"{label:46s} " + " ".join(f"{t:8.2f}" for t in ts))


def _scd2_bucketed_probe(spark) -> None:
    """Streaming SCD-2 x bucketed composition (round-8): maintain an
    SCD-2 history as a BUCKETED base.  With a FIXED 40-key change batch
    (x2) applied after a base history that grows 10x per column, the
    bucket-pruned sink's per-batch wall time should stay ~flat (only
    touched buckets re-historize) while a full-rewrite SCD-2 sink grows
    with the history.  Also asserts, at the smallest size, that the
    bucketed history equals the one-pass historization of the full
    change log (the correctness twin of tests/test_scd.py at probe
    scale)."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.scd import (
        historize_changes,
        stream_scd2_to_parquet,
        stream_scd2_to_parquet_bucketed,
    )
    from label_maker_dask_spark.streaming.bucketed import (
        read_maintained_table,
    )

    schema = "k long, seq long, ts_us long, v double"

    def run(base_rows: int, mode: str, check: bool = False) -> float:
        d = tempfile.mkdtemp(prefix="lmds_probe_scd2_")
        changes, base, ckpt = f"{d}/chg", f"{d}/hist", f"{d}/ckpt"
        spark.range(base_rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("seq"),
            (F.col("id") % 1000).cast("long").alias("ts_us"),
            (F.col("id") * 0.5).alias("v"),
        ).coalesce(8).write.mode("append").parquet(changes)

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 8)
                .parquet(changes)
            ).select(
                "k", "seq",
                F.timestamp_micros(F.col("ts_us")).alias("ts"), "v",
            )
            if mode == "bucketed":
                q = stream_scd2_to_parquet_bucketed(
                    stream, base, ckpt, keys=["k"], ts_col="ts",
                    tie_break="seq", n_buckets=256,
                )
            else:
                q = stream_scd2_to_parquet(
                    stream, base, ckpt, keys=["k"], ts_col="ts",
                    tie_break="seq",
                )
            q.awaitTermination(600)

        drain()  # batch 0: create the history (untimed)
        for i in (1, 2):  # two 40-key change batches, one file each
            spark.range(40).select(
                ((F.col("id") * 977 + i) % base_rows).alias("k"),
                F.lit(i).cast("long").alias("seq"),
                F.lit(10_000_000 * i).cast("long").alias("ts_us"),
                F.lit(float(i)).alias("v"),
            ).coalesce(1).write.mode("append").parquet(changes)
        t0 = _time.perf_counter()
        drain()  # timed: delta batches only
        dt = _time.perf_counter() - t0
        if check:
            full = historize_changes(
                spark.read.parquet(changes).select(
                    "k", "seq",
                    F.timestamp_micros(F.col("ts_us")).alias("ts"), "v",
                ),
                ["k"], "ts", "seq",
            )
            a = sorted(map(tuple, full.collect()))
            got = read_maintained_table(spark, base).select(*full.columns)
            b = sorted(map(tuple, got.collect()))
            assert a == b, (
                f"scd2-bucketed probe: history != full historize "
                f"({len(a)} vs {len(b)} rows)"
            )
        shutil.rmtree(d, ignore_errors=True)
        return dt

    run(50_000, "bucketed", check=True)  # warm + equals-full-historize
    run(50_000, "plain")
    sizes = [100_000, 1_000_000, 10_000_000]
    print()
    print(
        f"{'scd2-maintenance (fixed 40-key delta x2)':46s} "
        + " ".join(f"{n//1000:>7d}k" for n in sizes)
    )
    for label, mode in (
        ("plain full-rewrite scd2", "plain"),
        ("bucket-pruned scd2 (history slice only)", "bucketed"),
    ):
        ts = [run(n, mode) for n in sizes]
        print(f"{label:46s} " + " ".join(f"{t:8.2f}" for t in ts))


def _stream_upsert_probe(spark, sf_dir: str) -> float:
    """Seconds to drain a 3-micro-batch CDC stream into a parquet base
    table: batch 0 creates the base from the full orders table, batches
    1-2 each update ~10% of keys — so the timed work is dominated by the
    per-batch base rewrite (the honest cost of upsert-on-parquet; a table
    format would commit deltas but run the identical merge plan shape).
    """
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from label_maker_dask_spark.streaming.upsert import stream_upsert_to_parquet

    d = tempfile.mkdtemp(prefix="lmds_probe_upsert_")
    changes, base, ckpt = f"{d}/chg", f"{d}/base", f"{d}/ckpt"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    # one file per change batch so maxFilesPerTrigger=1 maps files to
    # micro-batches 1:1
    orders.withColumn("seq", F.lit(0)).coalesce(1).write.mode(
        "append"
    ).parquet(changes)
    for i in (1, 2):
        orders.where(F.col("o_orderkey") % 10 == i).withColumn(
            "o_totalprice", F.col("o_totalprice") + i
        ).withColumn("seq", F.lit(i)).coalesce(1).write.mode(
            "append"
        ).parquet(changes)
    t0 = _time.perf_counter()
    stream = (
        spark.readStream.schema("o_orderkey long, o_totalprice double, seq int")
        .option("maxFilesPerTrigger", 1)
        .parquet(changes)
    )
    q = stream_upsert_to_parquet(
        stream, base, ckpt, keys=["o_orderkey"], seq_col="seq"
    )
    q.awaitTermination(600)
    dt = _time.perf_counter() - t0
    shutil.rmtree(d, ignore_errors=True)
    return dt


if __name__ == "__main__":
    main()
