"""Property-based check of merge_upsert against a pure-Python reference.

For randomly generated target/source tables (unique keys per side, random
update values, random delete flags), the distributed two-join merge must
produce exactly what the obvious dict-based MERGE produces: source wins on
matched update columns, unmatched source rows insert, deletes drop, and
everything else passes through untouched.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from label_maker_dask_spark.operators.merge import merge_upsert

_keys = st.integers(min_value=0, max_value=9)
_vals = st.text(alphabet="abcxyz", min_size=0, max_size=4)

_target_rows = st.dictionaries(_keys, _vals, max_size=8)
_source_rows = st.dictionaries(
    _keys.map(lambda k: k + 5),  # overlap ~half the key range
    st.tuples(_vals, st.booleans()),
    max_size=8,
)


def _reference_merge(target, source):
    out = dict(target)
    for k, (v, is_del) in source.items():
        if is_del:
            out.pop(k, None)
        else:
            out[k] = v
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=_target_rows, source=_source_rows)
def test_merge_matches_reference(spark, target, source):
    tgt = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)],
        "k long, v string",
    )
    if not target:
        tgt = tgt.where("k IS NOT NULL")  # empty frame with schema
    src = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in source.items()] or [(None, None, None)],
        "k long, v string, is_del boolean",
    )
    if not source:
        src = src.where("k IS NOT NULL")
    got = {
        r.k: r.v
        for r in merge_upsert(tgt, src, ["k"], delete_col="is_del").collect()
    }
    assert got == _reference_merge(target, source)


def test_assume_unique_source_builds_plan_without_jobs(spark):
    """With assume_unique_source the duplicate-key guard is skipped, so
    merge_upsert is pure plan construction — proven by handing it a source
    whose key column detonates on ANY evaluation: the default path raises
    at call time (the guard scans the source), the streaming path returns
    a lazy plan untouched."""
    import pytest

    def _boom():
        raise RuntimeError("source must not be evaluated at plan time")

    bomb = F.udf(_boom, "long")
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    ghost = spark.range(1).select(
        bomb().alias("k"), F.lit("x").alias("v")
    )
    from label_maker_dask_spark.operators.merge import merge_upsert

    with pytest.raises(Exception):  # eager guard scans the source
        merge_upsert(target, ghost, keys=["k"])
    merged = merge_upsert(
        target, ghost, keys=["k"], assume_unique_source=True
    )  # no job launched — constructing the plan must not touch the data
    assert set(merged.columns) == {"k", "v"}


def test_assume_unique_source_same_result_when_unique(spark):
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    source = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    expect = {(1, "a"), (2, "B"), (3, "C")}
    for flag in (False, True):
        got = {
            (r.k, r.v)
            for r in merge_upsert(
                target, source, keys=["k"], assume_unique_source=flag
            ).collect()
        }
        assert got == expect


def test_type_mismatch_raises_without_evolve(spark):
    """A shared-column type drift in the feed must be loud, not a silent
    union-coerced stored-schema rewrite."""
    import pytest

    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10)], "k long, v int")
    source = spark.createDataFrame([(2, 20)], "k long, v long")
    with pytest.raises(ValueError, match="type mismatch"):
        merge_upsert(target, source, keys=["k"])


def test_type_widening_int_to_bigint(spark):
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v int")
    source = spark.createDataFrame(
        [(2, 10_000_000_000), (3, 30)], "k long, v long"
    )
    out = merge_upsert(target, source, keys=["k"], evolve_schema=True)
    assert dict(out.dtypes)["v"] == "bigint"
    assert {(r.k, r.v) for r in out.collect()} == {
        (1, 10), (2, 10_000_000_000), (3, 30)
    }


def test_type_widening_narrow_source_upcasts(spark):
    """Old producer still emitting int into an already-widened bigint
    table: the batch up-casts; the stored schema never narrows."""
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10_000_000_000)], "k long, v long"
    )
    source = spark.createDataFrame([(1, 7), (2, 8)], "k long, v int")
    out = merge_upsert(target, source, keys=["k"], evolve_schema=True)
    assert dict(out.dtypes)["v"] == "bigint"
    assert {(r.k, r.v) for r in out.collect()} == {(1, 7), (2, 8)}


def test_narrow_source_merges_without_evolve_flag(spark):
    """An int feed into a long stored column is the implicit coercion
    every SQL MERGE performs: the source-side up-cast is lossless and
    never touches the stored schema, so it applies WITHOUT
    evolve_schema — existing callers with benign narrow-type drift
    keep merging (round-15 advice item)."""
    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10_000_000_000)], "k long, v long")
    source = spark.createDataFrame([(1, 7), (2, 8)], "k long, v int")
    out = merge_upsert(target, source, keys=["k"])
    assert dict(out.dtypes)["v"] == "bigint"
    assert {(r.k, r.v) for r in out.collect()} == {(1, 7), (2, 8)}


def test_lossy_type_change_refused_even_with_evolve(spark):
    import pytest

    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10)], "k long, v long")
    source = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="not a lossless widening"):
        merge_upsert(target, source, keys=["k"], evolve_schema=True)


def test_widening_lattice():
    from pyspark.sql import types as T

    from label_maker_dask_spark.operators.merge import _is_widening

    assert _is_widening(T.IntegerType(), T.LongType())
    assert _is_widening(T.ShortType(), T.IntegerType())
    assert _is_widening(T.FloatType(), T.DoubleType())
    assert _is_widening(T.IntegerType(), T.DoubleType())
    assert _is_widening(T.ShortType(), T.FloatType())
    assert _is_widening(T.DecimalType(12, 2), T.DecimalType(18, 4))
    assert _is_widening(T.IntegerType(), T.DecimalType(12, 2))
    # lossy directions stay out
    assert not _is_widening(T.LongType(), T.IntegerType())
    assert not _is_widening(T.IntegerType(), T.FloatType())     # 2^31 > 2^24
    assert not _is_widening(T.LongType(), T.DoubleType())       # 2^63 > 2^53
    assert not _is_widening(T.DecimalType(18, 4), T.DecimalType(12, 2))
    assert not _is_widening(T.DecimalType(12, 2), T.DecimalType(13, 4))
    assert not _is_widening(T.LongType(), T.DecimalType(12, 2))
    assert not _is_widening(T.StringType(), T.LongType())


def test_nested_nullability_difference_is_not_a_type_mismatch(spark):
    """array<string> with containsNull=false (F.array of literals) must
    keep merging into a parquet-style containsNull=true target exactly
    as before the type-drift gate existed — nullability is not drift."""
    from pyspark.sql import functions as F

    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, ["a", "b"])], "k long, tags array<string>"
    )
    source = spark.createDataFrame([(1,), (2,)], "k long").select(
        "k", F.array(F.lit("x")).alias("tags")
    )
    assert dict(source.dtypes)["tags"] == "array<string>"
    for flag in (False, True):
        out = merge_upsert(target, source, keys=["k"], evolve_schema=flag)
        got = {(r.k, tuple(r.tags)) for r in out.collect()}
        assert got == {(1, ("x",)), (2, ("x",))}


def test_narrow_source_coercion_has_a_strict_opt_out(spark):
    """coerce_narrow_source=False restores the pre-coercion contract: a
    feed whose column type regressed (long stored, int feed) raises
    loudly instead of being silently (if losslessly) up-cast — the
    round-16 advice item's opt-out for callers that treat narrow drift
    as a malformed change feed."""
    import pytest

    from label_maker_dask_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10_000_000_000)], "k long, v long")
    source = spark.createDataFrame([(1, 7), (2, 8)], "k long, v int")
    with pytest.raises(ValueError, match="type mismatch"):
        merge_upsert(
            target, source, keys=["k"], coerce_narrow_source=False
        )
    # the default stays coercing (round-15 contract unchanged)
    out = merge_upsert(target, source, keys=["k"])
    assert dict(out.dtypes)["v"] == "bigint"
