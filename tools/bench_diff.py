"""Compare two bench JSON files (BENCH_LOCAL.json snapshots — the
driver's BENCH_r*.json wraps its record differently and is not
parsed here): per-query ratios classified against the recorded pass
spread (noise vs regression), median drift, and the BASELINE.md floor
subset — the per-round regression triage this repo otherwise re-derives
inline every time.

Usage:
  PYTHONPATH=/root/repo python tools/bench_diff.py NEW.json [OLD.json]

With one argument, compares against the committed BENCH_LOCAL.json at
HEAD (via `git show`).  Ratio = new/old; >1 is slower.

Noise classification (round 15, r14 verdict item 5): bench.py records
each query's relative spread between its two passes.  A drift counts as
a REGRESSION only when the ratio exceeds ``1 + band`` where ``band =
max(0.25, 2 * (spread_new + spread_old))`` — within the band it is
reported as drift-within-noise, so driver-side machine noise (the r14
streaming ~1.3x that was flat locally) is classifiable without manually
cross-checking two files.  Old files without a "spread" key degrade to
the flat 25% band.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

#: the round-1 BASELINE.md floor (22 queries at sf0.1) — kept in sync
#: with the JSON block in BASELINE.md
FLOOR = {
    "q1_pricing_summary": 0.497, "q3_shipping_priority": 0.817,
    "q5_region_revenue": 1.026, "q9_product_profit": 1.018,
    "q10_returned_items": 0.802, "q13_customer_order_distribution": 0.477,
    "q21_suppliers_who_shipped_last": 1.315,
    "join_left_order_item_counts": 0.977, "agg_rollup_region_nation": 0.445,
    "agg_pivot_status_by_priority": 0.38, "window_running_order_total": 0.583,
    "window_top3_orders_per_customer": 0.472, "events_tumbling_hourly": 0.438,
    "events_sessionize_30m": 0.669, "glfilter_select_events": 0.686,
    "classification_labels_flagship": 0.786,
    "segmentation_raster_class_areas": 2.343, "dedup_exact_sha256": 0.292,
    "dedup_minhash_lsh_pairs": 1.413, "similarity_cosine_topk": 0.547,
    "text_stats_per_doc": 0.619, "text_tfidf_top_terms": 1.434,
}


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _band(k: str, new_spread: dict, old_spread: dict) -> float:
    """Per-query noise band.  The floor is 25%, calibrated from measured
    CROSS-RUN drift on identical code (three same-day 244-query runs:
    296.4 s / 311.2 s / 320.5 s suite totals, individual queries moving
    1.1-1.2x between runs): a run's two back-to-back passes share JVM +
    page-cache state, so the recorded within-run spread UNDERESTIMATES
    the run-to-run variance a diff actually faces.  Anything beyond
    1.25x (or beyond the recorded spread when that is larger) is a real
    candidate; below it, cross-check before treating as a regression."""
    return max(0.25, 2.0 * (new_spread.get(k, 0.0) + old_spread.get(k, 0.0)))


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    new_rec = _load(sys.argv[1])
    if len(sys.argv) > 2:
        old_rec = _load(sys.argv[2])
        old_name = sys.argv[2]
    else:
        out = subprocess.run(
            ["git", "-C", "/root/repo", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        if not out.strip():
            sys.exit("no committed BENCH_LOCAL.json at HEAD to diff against")
        old_rec = json.loads(out)
        old_name = "HEAD:BENCH_LOCAL.json"
    new, old = new_rec["queries"], old_rec["queries"]
    new_spread = new_rec.get("spread", {})
    old_spread = old_rec.get("spread", {})

    print(f"new: {sys.argv[1]} ({len(new)} queries, {sum(new.values()):.1f}s)")
    print(f"old: {old_name} ({len(old)} queries, {sum(old.values()):.1f}s)")

    # sub-0.3s cells are noise-band (BASELINE.md's own caveat)
    ratios = {
        k: new[k] / old[k] for k in new if k in old and old[k] > 0.3
    }
    if ratios:
        print(f"median ratio {statistics.median(ratios.values()):.3f} "
              f"over {len(ratios)} comparable queries")
        regressions = {
            k: r for k, r in ratios.items()
            if r > 1.0 + _band(k, new_spread, old_spread)
        }
        if regressions:
            print(f"REGRESSIONS beyond noise band ({len(regressions)}):")
            for k, r in sorted(regressions.items(), key=lambda kv: -kv[1]):
                print(f"  {r:5.2f}x  {new[k]:6.2f} vs {old[k]:6.2f}  "
                      f"(band ±{_band(k, new_spread, old_spread):.0%})  {k}")
        else:
            print("no regressions beyond the per-query noise band")
        drift = sorted(
            ((k, r) for k, r in ratios.items() if k not in regressions),
            key=lambda kv: -kv[1],
        )[:5]
        print("largest drifts within noise:")
        for k, r in drift:
            print(f"  {r:5.2f}x  {new[k]:6.2f} vs {old[k]:6.2f}  "
                  f"(band ±{_band(k, new_spread, old_spread):.0%})  {k}")
        print("best improvements:")
        for k, r in sorted(ratios.items(), key=lambda kv: kv[1])[:4]:
            print(f"  {r:5.2f}x  {new[k]:6.2f} vs {old[k]:6.2f}  {k}")

    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only queries ({len(only_new)}):",
              ", ".join(only_new))

    have = [k for k in FLOOR if k in new]
    if not have:
        print("BASELINE floor subset: no floor-subset queries present "
              "in the new bench JSON")
        return
    ours = sum(new[k] for k in have)
    floor = sum(FLOOR[k] for k in have)
    print(f"BASELINE floor subset ({len(have)}/22): "
          f"{ours:.2f}s vs {floor:.2f}s = {ours / floor:.2f}x")
    worst = max(have, key=lambda k: new[k] / FLOOR[k])
    print(f"  worst per-query {new[worst] / FLOOR[worst]:.2f}x ({worst}); "
          f"the 2x per-query gate "
          f"{'HOLDS' if all(new[k] / FLOOR[k] < 2 for k in have) else 'FAILS'}")


if __name__ == "__main__":
    main()
