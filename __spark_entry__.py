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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import label_maker_dask_spark.queries as Q  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make ``label_maker_dask_spark`` importable on executor Python workers.

    The driver process may import it via sys.path, but workers spawn with
    their own PYTHONPATH — any mapInPandas/applyInPandas stage that pickles
    a module-level reference needs the package shipped.  ``addPyFile`` with
    a zip of the package distributes it once per session (idempotent)."""
    import hashlib
    import zipfile

    marker = "_lmds_pkg_shipped"
    if getattr(spark, marker, False):
        return
    pkg_dir = os.path.join(_REPO, "label_maker_dask_spark")
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fname in sorted(files):
            if fname.endswith(".py"):
                sources.append(os.path.join(root, fname))
    # content-addressed zip name: a stale cached zip must never ship old
    # module code to executors after a source edit
    digest = hashlib.sha256()
    for full in sorted(sources):
        digest.update(full.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zip_path = os.path.join(
        "/tmp", f"label_maker_dask_spark_pkg_{digest.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sorted(sources):
                zf.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zip_path)
    setattr(spark, marker, True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    Q.session_defaults(spark)
    return Q.QUERIES["classification_labels_flagship"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            Q.session_defaults(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only entries omitted)."""
    return dict(Q.ORACLES)
