"""Driver-contract tests over the whole query catalog: every entry must
survive the driver's oracle compare, which (a) canonicalizes results with a
pandas sort — array/map/struct cells are unsortable and crash it — and
(b) hashes values under columns *sorted by name*, so Spark and oracle
column names must match exactly.  The oracle side is checked with a
DuckDB DESCRIBE (parse+bind only, no execution), so this stays fast."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import label_maker_dask_spark.queries as Q

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_every_oracle_key_has_a_query():
    assert set(Q.ORACLES) <= set(Q.QUERIES)


# The driver's correctness gate checks exactly the first 50 registered
# queries; queries.py curates that window explicitly (_DRIVER_WINDOW).
# This pin makes any reordering an INTENTIONAL edit of both lists, never
# a side effect of moving a registration between modules.
PINNED_DRIVER_WINDOW = [
    "similarity_sq8_rescore_ann",
    "text_bigram_logprob_interp",
    "text_char_entropy",
    "anomaly_seasonal_dow_residual",
    "similarity_pq_adc_topk_ann",
    "text_source_kl_divergence",
    "similarity_pq_index_build",
    "similarity_pq_stored_topk_ann",
    "similarity_pq_join_topk_ann",
    "stream_pq_index_replay",
    "profile_srp_bucket_skew",
    "similarity_hotbucket_dedup_adversarial",
    "curation_token_budget_select",
    "stream_upsert_schema_evolution_replay",
    "spatial_tile_pyramid_rollup",
    "detection_labels_e2e",
    "raster_cog_window_channel_sums",
    "agg_distinct_nations_per_segment",
    "dedup_containment_pairs",
    "dedup_jaccard_exact_pairs",
    "set_intersect_customer_supplier_nations",
    "dedup_simhash_signatures",
    "distinct_user_event_types",
    "set_except_customer_only_nations",
    "similarity_neardup_cosine",
    "text_fingerprints",
    "text_quality_by_source",
    "text_token_stats_by_lang",
    "union_by_name_parties",
    "window_lag_value_delta",
    "join_asof_tolerance_90d",
    "split_hash_train_val_test",
    "agg_grouping_sets",
    "agg_rollup_region_nation",
    "anomaly_mad_daily_events",
    "contamination_3gram_overlap",
    "dedup_simhash_neardup_pairs",
    "events_tumbling_hourly",
    "graph_pagerank_transitions",
    "join_anti_customers_without_orders",
    "join_left_order_item_counts",
    "join_semi_customers_with_orders",
    "join_skew_salted_brand_revenue",
    "multimodal_image_channel_stats",
    "profile_orders_columns",
    "q10_returned_items",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "scalar_array_map_json",
    "scalar_string_date_funcs",
]


def test_driver_window_is_pinned():
    assert list(Q.QUERIES)[:50] == PINNED_DRIVER_WINDOW
    Q.validate_driver_window()


def test_driver_window_entries_all_have_value_hash_oracles():
    # rows-only entries would waste a driver-gate slot
    assert all(n in Q.ORACLES for n in PINNED_DRIVER_WINDOW)


def test_catalog_outputs_are_scalar_and_oracle_columns_match(spark, oracle_con):
    failures = []
    for name in sorted(Q.QUERIES):
        df = Q.QUERIES[name](spark, SF)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            failures.append(f"{name}: non-scalar output columns {complex_cols}")
        sql = Q.ORACLES.get(name)
        if sql:
            ocols = [
                r[0] for r in oracle_con.execute(f"DESCRIBE {sql}").fetchall()
            ]
            if sorted(ocols) != sorted(df.columns):
                failures.append(
                    f"{name}: spark cols {sorted(df.columns)} != "
                    f"oracle cols {sorted(ocols)}"
                )
    assert not failures, "\n".join(failures)


# ---------------------------------------------------------------------------
# Driver-evidence coverage ledger (round 10).  The driver only ever gates
# the 50-slot window, so catalog entries accumulate driver-side evidence
# through window ROTATION.  This ledger makes that coverage a tested
# invariant: every catalog entry must be (a) already gated in a committed
# CORRECTNESS_r*.json, (b) scheduled in the current window, or (c) listed
# below as awaiting rotation.  Adding a new query without either putting
# it in the window or consciously appending it here fails the test —
# silent evidence gaps can no longer appear.  Entries leave this list as
# rotation gates them (a gated name lingering here also fails, keeping
# the ledger honest).
ROTATION_BACKLOG: list = [
    # Added after the round-14 window was pinned: awaiting the round-15
    # rotation (judge-replayable locally via tools/check_oracle.py).
    "mvt_roundtrip_feature_stats",
    "raster_cog_window_channel_sums_3857",
    "text_bpe_train_merges",
    "text_bpe_tokenize_corpus",
    "text_bpe_vocab",
    "stream_bpe_word_freq_replay",
    "raster_geotiff_striped_channel_sums",
]


def _driver_gated_ever() -> set:
    import glob
    import json
    import os

    gated: set = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            gated |= set(json.load(open(f)).keys())
        except Exception:
            pass
    return gated


def test_every_catalog_entry_has_a_driver_evidence_path():
    gated = _driver_gated_ever()
    window = set(PINNED_DRIVER_WINDOW)
    backlog = set(ROTATION_BACKLOG)
    uncovered = [
        n for n in Q.QUERIES
        if n not in gated and n not in window and n not in backlog
    ]
    assert not uncovered, (
        "catalog entries with no driver-evidence path (not gated, not in "
        f"the window, not in the rotation backlog): {uncovered} — rotate "
        "them into _DRIVER_WINDOW or add them to ROTATION_BACKLOG "
        "deliberately"
    )
    stale = sorted(backlog & gated)
    assert not stale, (
        f"rotation backlog entries already driver-gated: {stale} — remove "
        "them so the ledger reflects reality"
    )
    overlap = sorted(backlog & window)
    assert not overlap, (
        f"entries in both the window and the backlog: {overlap}"
    )


def _last_gated_round() -> dict:
    import glob
    import json
    import os
    import re

    last: dict = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            for name in json.load(open(f)):
                last[name] = max(last.get(name, 0), rnd)
        except Exception:
            pass
    return last


def test_window_retirement_discipline():
    """Steady-state rotation invariant (round 13, backlog now empty):
    every driver-window seat must EARN its slot — it is either a
    never-gated entry (first evidence) or an entry whose newest
    committed driver evidence is at least 2 rounds stale (re-confirm).
    Entries gated in the latest or previous round may not re-occupy a
    seat, so future rounds can't silently re-gate the same 50 and
    starve fresh entries of evidence.

    Evidence produced by the CURRENT window's own driver gate is
    excluded (a correctness file whose key set matches the pinned
    window): the invariant judges the rotation DECISION, which was made
    before that file existed — without the exclusion the test would
    flip red the moment the driver records the very gate the window was
    built for."""
    import glob
    import json
    import os

    last = _last_gated_round()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            if set(json.load(open(f))) == set(PINNED_DRIVER_WINDOW):
                # this window has already been gated: its seats are spent
                # evidence, not a rotation decision to re-judge
                last = {
                    n: r for n, r in last.items()
                    if n not in set(PINNED_DRIVER_WINDOW)
                }
                break
        except Exception:
            pass
    if not last:
        pytest.skip("no committed CORRECTNESS_r*.json yet")
    latest = max(last.values())
    fresh = [
        f"{n} (last gated r{last[n]})"
        for n in PINNED_DRIVER_WINDOW
        if n in last and last[n] > latest - 2
    ]
    assert not fresh, (
        "driver-window seats wasted on entries with fresh evidence "
        f"(gated after r{latest - 2}): {fresh} — rotate in never-gated "
        "or stalest-evidence entries instead"
    )
