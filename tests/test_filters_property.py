"""Property-based three-way cross-check of the GL-filter compiler.

For randomly generated filter s-expressions over a fixed adversarial
feature corpus, the three implementations must agree row-for-row:

1. ``compile_filter``   — the Catalyst Column compiler (the engine path)
2. ``feature_passes``   — the pure-Python twin used inside pandas UDFs
3. ``filter_sql``       — the ANSI-SQL rendering executed by DuckDB
                          (the oracle path)

This is the engine's one real query compiler (SURVEY.md §2 A4); the
corpus bakes in the documented null semantics: missing keys, non-numeric
values under numeric comparison, boolean spellings, $type/$id refs.
"""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from label_maker_dask_spark.filters import compile_filter, filter_sql
from label_maker_dask_spark.filters_local import feature_passes

FEATURES = []
_id = 0
for gtype in ["Point", "Polygon", "LineString"]:
    for props in [
        {},
        {"k1": "5"},
        {"k1": "50", "k2": "abc"},
        {"k1": "abc"},
        {"k2": "true"},
        {"k2": "True"},
        {"k1": "-3.5", "k3": ""},
        {"k3": "Point"},
        {"k1": "5.0"},
        {"k1": "05"},
    ]:
        FEATURES.append(
            {
                "id": _id,
                "geometry_type": gtype,
                "properties": props,
            }
        )
        _id += 1

_keys = st.sampled_from(["k1", "k2", "k3", "k9", "$type", "$id"])
_literals = st.one_of(
    st.integers(-5, 60),
    st.sampled_from(["5", "abc", "Point", "Polygon", "true", "", "05", "5.0"]),
    st.booleans(),
    st.floats(min_value=-10, max_value=60, allow_nan=False, width=32),
)
_comparison = st.tuples(
    st.sampled_from(["==", "!=", "<", ">", "<=", ">="]), _keys, _literals
).map(list)
_membership = st.tuples(
    st.sampled_from(["in", "!in"]), _keys, _literals, _literals
).map(list)
_existence = st.tuples(st.sampled_from(["has", "!has"]), _keys).map(list)
_bare = st.sampled_from([[], ["any"], ["all"], ["none"], ["zorp", "k1", 1]])
_base = st.one_of(_comparison, _membership, _existence, _bare)
_filters = st.recursive(
    _base,
    lambda children: st.tuples(
        st.sampled_from(["any", "all", "none"]), children, children
    ).map(list),
    max_leaves=5,
)


@pytest.fixture(scope="module")
def features_df(spark):
    df = spark.createDataFrame(
        [
            (f["id"], f["geometry_type"], f["properties"])
            for f in FEATURES
        ],
        "id long, geometry_type string, properties map<string,string>",
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "id": [f["id"] for f in FEATURES],
            "geometry_type": [f["geometry_type"] for f in FEATURES],
            "props": [json.dumps(f["properties"]) for f in FEATURES],
        }
    )
    con.register("features", pdf)
    return con


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filt=_filters)
def test_three_implementations_agree(spark, features_df, duck, filt):
    pred = compile_filter(filt)
    got_spark = {
        r["id"]
        for r in features_df.select("id").where(pred).collect()
    }
    got_local = {
        f["id"]
        for f in FEATURES
        if feature_passes(filt, {**f, "geometry": {"type": f["geometry_type"]}})
    }
    sql = filter_sql(
        filt,
        properties="props",
        geometry_type="geometry_type",
        feature_id="id",
        map_lookup="json_extract_string({props}, '$.' || {key})",
    )
    got_duck = {
        r[0] for r in duck.sql(f"SELECT id FROM features WHERE {sql}").fetchall()
    }
    assert got_spark == got_local, (filt, got_spark ^ got_local)
    assert got_spark == got_duck, (filt, got_spark ^ got_duck)
