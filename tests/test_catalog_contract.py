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
