"""Property-based cross-engine checks for the arithmetic-hash primitives
every curation oracle rests on: the polynomial char fold, the salted split
bucket, and word n-gram shingles must agree value-for-value between the
Catalyst expression form (engine path) and the DuckDB SQL rendering
(oracle path) on arbitrary inputs — not just on the synthetic corpus.

Each hypothesis example ships a whole batch of strings through one Spark
job and one DuckDB query, so example counts stay small while input
coverage stays wide."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.text import (
    char_poly_hash,
    char_poly_hash_sql,
    tokens,
    word_shingles,
    word_shingles_sql,
)
from label_maker_dask_spark.operators.pipeline import (
    split_bucket,
    split_bucket_sql,
)

# printable ASCII without backslash/quote headaches for inline SQL; the
# fold itself is codepoint arithmetic so ASCII coverage exercises it fully
_CHARS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="'\\"),
    max_size=24,
)
_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _duck_over(rows: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", rows)
    return con.execute(sql).df()


@_SETTINGS
@given(st.lists(_CHARS, min_size=1, max_size=16))
def test_char_poly_hash_matches_sql(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", char_poly_hash(F.col("s")).alias("h"))
        .toPandas()
        .sort_values("i")["h"]
        .tolist()
    )
    want = _duck_over(
        pdf, f"SELECT {char_poly_hash_sql('s')} AS h FROM t ORDER BY i"
    )["h"].tolist()
    assert got == want


@_SETTINGS
@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=16))
def test_split_bucket_matches_sql_and_is_in_range(spark, ids):
    pdf = pd.DataFrame({"i": range(len(ids)), "id": ids})
    got = (
        spark.createDataFrame(pdf)
        .select("i", split_bucket(F.col("id")).alias("b"))
        .toPandas()
        .sort_values("i")["b"]
        .tolist()
    )
    want = _duck_over(
        pdf, f"SELECT {split_bucket_sql('id')} AS b FROM t ORDER BY i"
    )["b"].tolist()
    assert got == want
    assert all(0 <= b < 100 for b in got)


@_SETTINGS
@given(st.lists(_CHARS.map(lambda s: " ".join(s.split())), min_size=1,
                max_size=8),
       st.integers(min_value=2, max_value=4))
def test_word_shingles_match_sql(spark, texts, n):
    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", word_shingles(tokens(F.col("s")), n).alias("sh"))
        .toPandas()
        .sort_values("i")["sh"]
        .map(list)
        .tolist()
    )
    toks_sql = "list_filter(string_split_regex(trim(s), '\\s+'), t -> t != '')"
    want = _duck_over(
        pdf,
        f"SELECT {word_shingles_sql(toks_sql, n)} AS sh FROM t ORDER BY i",
    )["sh"].map(list).tolist()
    assert got == want
