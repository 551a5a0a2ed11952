"""Compare two bench JSON files (BENCH_LOCAL.json snapshots — the
driver's BENCH_r*.json wraps its record differently and is not
parsed here): per-query ratios classified against the recorded pass
spread (noise vs regression), median drift, and the BASELINE.md floor
subset — the per-round regression triage this repo otherwise re-derives
inline every time.

Usage:
  PYTHONPATH=/root/repo python tools/bench_diff.py NEW.json [OLD.json] [--recheck]

With one positional argument, compares against the committed
BENCH_LOCAL.json at HEAD (via `git show`).  Ratio = new/old; >1 is slower.

Noise classification (round 15, r14 verdict item 5): bench.py records
each query's relative spread between its passes.  A drift counts as
a REGRESSION only when the ratio exceeds ``1 + band`` where ``band =
min(max(0.25, 2 * (spread_new + spread_old)), 1.0)`` — within the band
it is reported as drift-within-noise, so driver-side machine noise (the
r14 streaming ~1.3x that was flat locally) is classifiable without
manually cross-checking two files.  The 1.0 cap (round 16) keeps a
first-pass warmup outlier in the recorded spread from inflating the
band to ±1000%+ and blinding the classifier permanently for that query.
Old files without a "spread" key degrade to the flat 25% band.

``--recheck`` (round 16, r15 verdict item 3): automates the manual
best-of-3 standalone re-measure SCALE.md's drift calibration performed
by hand — every beyond-band cell is re-run in a FRESH JVM (one
``bench.py --only <flagged> --passes 3`` subprocess, so the re-measure
shares none of the original run's GC/page-cache state), and each cell
gets a ``rechecked`` verdict: "noise" when the fresh best-of-3 lands
back inside the band against OLD, "regression" when it stays out.  The
verdicts are printed per cell and written to BENCH_RECHECK.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import FLOOR  # noqa: E402  (single source for the floor table)


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _band(k: str, new_spread: dict, old_spread: dict) -> float:
    """Per-query noise band.  The floor is 25%, calibrated from measured
    CROSS-RUN drift on identical code (three same-day 244-query runs:
    296.4 s / 311.2 s / 320.5 s suite totals, individual queries moving
    1.1-1.2x between runs): a run's two back-to-back passes share JVM +
    page-cache state, so the recorded within-run spread UNDERESTIMATES
    the run-to-run variance a diff actually faces.  The 1.0 cap keeps a
    warmup outlier in the recorded spread (BENCH_LOCAL has recorded
    spreads of 5-15 for first-pass stragglers) from widening the band
    past any signal — a >2x drift is ALWAYS a recheck candidate."""
    return min(
        max(0.25, 2.0 * (new_spread.get(k, 0.0) + old_spread.get(k, 0.0))),
        1.0,
    )


def _recheck(flagged: dict, old: dict, bands: dict) -> dict:
    """Re-measure each flagged cell best-of-3 in a fresh JVM and classify
    noise vs regression against OLD with the same per-query band.

    A flagged STORED-INDEX READER (bench.PRECEDENCE) gets its builder
    prepended to the --only list: in a fresh JVM the process-shared
    index doesn't exist yet, so without the builder the reader's first
    pass would rebuild it inside its own timing and inflate the recheck
    ratio toward a false "regression".  The builder's time is measured
    but excluded from the verdicts — only the flagged names are judged,
    matching the baseline's cost attribution."""
    from bench import PRECEDENCE  # noqa: E402  (same map bench.py orders by)

    names = sorted(flagged)
    builders = sorted(
        {PRECEDENCE[k] for k in names if k in PRECEDENCE} - set(names)
    )
    out_path = os.path.join(REPO, "BENCH_RECHECK.json")
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--only", ",".join(builders + names), "--passes", "3",
        "--out", out_path,
    ]
    print(f"\nrechecking {len(names)} flagged cell(s) in a fresh JVM: "
          f"{' '.join(cmd)}")
    subprocess.run(cmd, check=True, cwd=REPO,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    fresh = _load(out_path)["queries"]
    verdicts = {}
    for k in names:
        ratio = fresh[k] / old[k]
        verdict = "noise" if ratio <= 1.0 + bands[k] else "regression"
        verdicts[k] = {
            "original_ratio": round(flagged[k], 3),
            "recheck_best_of_3": fresh[k],
            "recheck_ratio": round(ratio, 3),
            "band": round(bands[k], 3),
            "rechecked": verdict,
        }
        print(f"  {verdict:10s} {k}: fresh best-of-3 {fresh[k]:.2f}s vs "
              f"old {old[k]:.2f}s = {ratio:.2f}x (band ±{bands[k]:.0%}, "
              f"was {flagged[k]:.2f}x)")
    with open(out_path, "w") as fh:
        json.dump({"queries": fresh, "verdicts": verdicts}, fh, indent=1)
    print(f"recheck verdicts written to {out_path}")
    return verdicts


def _embed_referee(
    new_queries: dict, verdicts: dict, snapshot_path: str | None = None
) -> bool:
    """Fold the fresh-JVM referee verdicts INTO the committed snapshot
    (round-16 verdict item 8): BENCH_RECHECK.json is gitignored, so
    without this the adjudication of a beyond-band cell lives only in
    prose — a reader of BENCH_LOCAL.json alone would take an in-suite
    transient (e.g. a 3x environment spike on one cell, measured at
    0.96x in a fresh JVM) at face value.

    The verdicts are embedded ONLY when the snapshot carries the exact
    per-query map of the record that was just diffed and rechecked —
    embedding another run's verdicts would mislabel the snapshot.
    Returns True when the snapshot was updated."""
    path = snapshot_path or os.path.join(REPO, "BENCH_LOCAL.json")
    try:
        with open(path) as fh:
            snap = json.load(fh)
    except (OSError, ValueError):
        return False
    if snap.get("queries") != new_queries:
        return False
    snap["referee"] = verdicts
    with open(path, "w") as fh:
        fh.write(json.dumps(snap) + "\n")
    print(f"referee verdicts embedded into {path}")
    return True


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--recheck"]
    do_recheck = "--recheck" in sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    new_rec = _load(args[0])
    if len(args) > 1:
        old_rec = _load(args[1])
        old_name = args[1]
    else:
        out = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        if not out.strip():
            sys.exit("no committed BENCH_LOCAL.json at HEAD to diff against")
        old_rec = json.loads(out)
        old_name = "HEAD:BENCH_LOCAL.json"
    new, old = new_rec["queries"], old_rec["queries"]
    new_spread = new_rec.get("spread", {})
    old_spread = old_rec.get("spread", {})

    print(f"new: {args[0]} ({len(new)} queries, {sum(new.values()):.1f}s)")
    print(f"old: {old_name} ({len(old)} queries, {sum(old.values()):.1f}s)")

    # sub-0.3s cells are noise-band (BASELINE.md's own caveat)
    ratios = {
        k: new[k] / old[k] for k in new if k in old and old[k] > 0.3
    }
    regressions: dict = {}
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
    if have:
        ours = sum(new[k] for k in have)
        floor = sum(FLOOR[k] for k in have)
        print(f"BASELINE floor subset ({len(have)}/22): "
              f"{ours:.2f}s vs {floor:.2f}s = {ours / floor:.2f}x")
        worst = max(have, key=lambda k: new[k] / FLOOR[k])
        print(f"  worst per-query {new[worst] / FLOOR[worst]:.2f}x ({worst}); "
              f"the 2x per-query gate "
              f"{'HOLDS' if all(new[k] / FLOOR[k] < 2 for k in have) else 'FAILS'}")
    else:
        print("BASELINE floor subset: no floor-subset queries present "
              "in the new bench JSON")

    if do_recheck:
        if regressions:
            bands = {
                k: _band(k, new_spread, old_spread) for k in regressions
            }
            verdicts = _recheck(regressions, old, bands)
            _embed_referee(new, verdicts)
        else:
            print("\n--recheck: nothing flagged, no re-measure needed")


if __name__ == "__main__":
    main()
