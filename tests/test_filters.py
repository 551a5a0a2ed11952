"""GL-filter compiler truth tables (reference filter.py:34-57 semantics) and
three-way parity: Catalyst compiler vs pure-Python interpreter vs (when the
reference checkout is present) the reference's own create_filter."""

import importlib.util
import os

import pytest
from pyspark.sql import Row

from label_maker_dask_spark.filters import compile_filter, filter_sql
from label_maker_dask_spark.filters_local import feature_passes

FEATURES = [
    {"id": 1, "geometry_type": "Point",
     "properties": {"highway": "residential", "lanes": "2", "name": "First St"}},
    {"id": 2, "geometry_type": "Polygon",
     "properties": {"building": "yes", "height": "12.5"}},
    {"id": 3, "geometry_type": "LineString", "properties": {}},
    {"id": 4, "geometry_type": "Point",
     "properties": {"highway": "primary", "height": "30"}},
]

FILTERS = [
    ["==", "highway", "residential"],
    ["!=", "highway", "residential"],
    ["==", "$type", "Point"],
    ["!=", "$type", "Point"],
    ["==", "$id", 2],
    ["in", "highway", "residential", "primary"],
    ["!in", "highway", "residential", "primary"],
    ["in", "highway"],
    ["!in", "highway"],
    ["has", "building"],
    ["!has", "building"],
    ["has", "$id"],
    ["any", ["==", "highway", "primary"], ["has", "building"]],
    ["all", ["==", "$type", "Point"], ["has", "highway"]],
    ["none", ["has", "highway"], ["has", "building"]],
    [],
    None,
    ["any"],
    ["all"],
    ["none"],
    ["totally-unknown-op", 1, 2],
    ["<", "height", 20],
    [">", "height", 20],
    ["<=", "height", 12.5],
    [">=", "height", 30],
    ["==", "height", 12.5],
    ["all", ["any", ["has", "highway"], ["has", "building"]],
     ["none", ["==", "$type", "LineString"]]],
]


def _spark_eval(spark, filt):
    df = spark.createDataFrame(
        [Row(id=f["id"], geometry_type=f["geometry_type"], properties=f["properties"])
         for f in FEATURES],
        schema="id long, geometry_type string, properties map<string,string>",
    )
    rows = df.select("id", compile_filter(filt).alias("pass")).collect()
    return {r["id"]: r["pass"] for r in rows}


def _local_eval(filt):
    return {
        f["id"]: feature_passes(
            filt,
            {"properties": f["properties"],
             "geometry": {"type": f["geometry_type"]},
             "id": f["id"]},
        )
        for f in FEATURES
    }


@pytest.mark.parametrize("filt", FILTERS, ids=[repr(f) for f in FILTERS])
def test_compiler_matches_interpreter(spark, filt):
    assert _spark_eval(spark, filt) == _local_eval(filt)


@pytest.mark.parametrize("filt", FILTERS, ids=[repr(f) for f in FILTERS])
def test_sql_rendering_matches(spark, filt):
    """filter_sql must agree with the Column compiler — it generates the
    DuckDB oracle side of every GL-filter correctness query."""
    import json

    import duckdb

    con = duckdb.connect()
    expected = _local_eval(filt)
    sql = filter_sql(filt, properties="props", geometry_type="gt", feature_id="fid",
                     map_lookup="json_extract_string({props}, '$.' || {key})")
    for f in FEATURES:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS props, ? AS gt, ? AS fid)",
            [json.dumps(f["properties"]), f["geometry_type"], f["id"]],
        ).fetchone()[0]
        assert got == expected[f["id"]], (filt, f["id"])


REF_FILTER = "/root/reference/label_maker_dask/filter.py"


@pytest.mark.skipif(not os.path.exists(REF_FILTER), reason="reference not present")
@pytest.mark.parametrize(
    "filt",
    # subset where the reference doesn't crash / typed-vs-string doesn't differ:
    # string equality, membership, has, $type/$id, logical ops, edge cases
    [f for f in FILTERS if f is None or not (f and f[0] in ("<", ">", "<=", ">=", "==") and
                                             isinstance(f[-1], (int, float)) and f[1] != "$id")],
    ids=lambda f: "ref-" + repr(f),
)
def test_reference_parity(filt):
    spec = importlib.util.spec_from_file_location("ref_filter", REF_FILTER)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    for f in FEATURES:
        feature = {
            "properties": f["properties"],
            "geometry": {"type": f["geometry_type"]},
            "id": f["id"],
        }
        assert bool(ref.create_filter(filt)(feature)) == feature_passes(filt, feature), (
            filt, f["id"])
