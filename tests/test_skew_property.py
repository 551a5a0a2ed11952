"""Property-based check: salted_join is result-invariant vs the plain join
for random data shapes, salt counts, and join types."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.skew import salted_join

_big_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=40
)
_small_rows = st.dictionaries(
    st.integers(0, 7), st.text(alphabet="pqr", max_size=3), max_size=6
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big=_big_rows,
    small=_small_rows,
    n_salts=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain(spark, big, small, n_salts, how):
    bdf = spark.createDataFrame(
        big or [(None, None)], "k long, v long"
    )
    if not big:
        bdf = bdf.where("k IS NOT NULL")
    sdf = spark.createDataFrame(
        [(k, s) for k, s in small.items()] or [(None, None)],
        "k long, label string",
    )
    if not small:
        sdf = sdf.where("k IS NOT NULL")
    salted = salted_join(bdf, sdf, ["k"], n_salts=n_salts, how=how)
    plain = bdf.join(sdf, on=["k"], how=how)
    cols = ["k", "v", "label"]
    assert sorted(
        map(tuple, salted.select(*cols).collect())
    ) == sorted(map(tuple, plain.select(*cols).collect()))
