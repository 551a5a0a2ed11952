"""Data-quality expectations: declarative row constraints checked in ONE pass.

A training-data pipeline gates every ingest on constraint checks
(positivity, referential ranges, enum membership, non-null) — the
Deequ/Great-Expectations surface.  The engine form: each rule is a boolean
``Column``; all rules fold into a single aggregate over one scan (one
conditional-sum per rule — map-side partial, constant state), then the
1-row result unpivots into a (rule, n_violations) report.  A NULL rule
evaluation counts as a violation: a constraint that cannot be proven true
is not satisfied (three-valued logic resolved conservatively).

Scale: the cost is the scan itself, regardless of rule count; no shuffle
beyond the 1-row final aggregate.  Compose with ``df.filter`` on the same
rule expressions to quarantine violating rows.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One report row per rule: (rule, n_rows, n_violations, violation_rate).

    ``rules`` maps rule name -> boolean Column expected true for every row.
    Rates round at 6 dp (exact integer counts divided once)."""
    if not rules:
        raise ValueError("check_expectations: at least one rule is required")
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(F.count(F.lit(1)).alias("_n_rows"), *aggs)
    report = row.unpivot(
        ids=["_n_rows"],
        values=list(rules.keys()),
        variableColumnName="rule",
        valueColumnName="n_violations",
    )
    return report.select(
        "rule",
        F.col("_n_rows").alias("n_rows"),
        "n_violations",
        F.round(F.col("n_violations") / F.col("_n_rows"), 6).alias(
            "violation_rate"
        ),
    )


__all__ = ["check_expectations"]
