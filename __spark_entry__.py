"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's core operator —
GL-filter classification labels, label.py:15-23 — over the events table) at
sf0.001.  ``queries()``/``oracle_sql()`` expose the full catalog from
``label_maker_dask_spark.queries``: one entry per implemented operator from
SURVEY.md section 2, each with a DuckDB oracle replaying identical semantics
(column aliases match; fp aggregates rounded; hashes computed with the
cross-engine polynomial fold).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import label_maker_dask_spark.queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.QUERIES["classification_labels_flagship"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only entries omitted)."""
    return dict(Q.ORACLES)
