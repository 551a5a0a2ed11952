"""Runtime bloom-filter join pruning (operators/bloom.py).

Contract under test:
- no false negatives ever (every build-side key passes the probe);
- the pruned join equals the plain join exactly (result invariance);
- the filter actually prunes (false-positive rate near the design
  point, so ~99% of a fact probed against a 1% dim sliver is dropped
  before the shuffle);
- the probe predicate evaluates in the scan stage, before any
  Exchange, so the pruning happens pre-shuffle where it pays off.
"""

from pyspark.sql import functions as F

from label_maker_dask_spark.operators.bloom import (
    bloom_might_contain,
    bloom_pruned_join,
    build_bloom_hex,
)


def _dim(spark, n=50, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_no_false_negatives(spark):
    dim = _dim(spark, 200)
    hex_bits, m = build_bloom_hex(dim, "k")
    hits = dim.where(bloom_might_contain(hex_bits, m, F.col("k"))).count()
    assert hits == 200


def test_pruned_join_equals_plain_join(spark):
    fact = spark.range(0, 20000).select(
        F.pmod(F.col("id"), F.lit(5000)).alias("fk"),
        (F.col("id") % 97).alias("x"),
    )
    dim = _dim(spark, 40, offset=100)  # keys 100..139 of 5000
    got = (
        bloom_pruned_join(fact, dim, "fk", "k")
        .groupBy("fk")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    )
    want = (
        fact.join(dim, fact["fk"] == dim["k"])
        .groupBy("fk")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_false_positive_rate_near_design_point(spark):
    dim = _dim(spark, 1000)
    hex_bits, m = build_bloom_hex(dim, "k")
    # probe 20k keys guaranteed absent (disjoint range)
    absent = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = absent.where(bloom_might_contain(hex_bits, m, F.col("k"))).count()
    # fold stops at fill ≤ 1/4, k=3 → fpp ≈ fill³ ≤ ~2%; generous slack
    assert fp / 20_000 < 0.10


def test_probe_filter_runs_before_exchange(spark):
    fact = spark.range(0, 5000).select(F.col("id").alias("fk"))
    dim = _dim(spark, 20)
    joined = bloom_pruned_join(fact, dim, "fk", "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the byte-probe (conv(hex(substring into the folded BINARY literal)
    # must sit in the fact branch's scan-side Filter: between the probe
    # expression and the fact leaf there is no Exchange (i.e. pruning
    # happens before any shuffle/broadcast of the fact), and the fact
    # leaf follows the filter directly in the tree
    probe_at = plan.find("conv(hex(substring(0x")
    assert probe_at != -1, plan
    fact_leaf = plan.find("Range (0, 5000", probe_at)
    assert fact_leaf != -1, plan
    between = plan[probe_at:fact_leaf]
    assert "Exchange" not in between, plan


def test_null_probe_keys_are_dropped_like_inner_join(spark):
    fact = spark.createDataFrame(
        [(1,), (None,), (2,)], "fk: bigint"
    )
    dim = spark.createDataFrame([(1, "a")], "k: bigint, nm: string")
    got = bloom_pruned_join(fact, dim, "fk", "k").select("fk", "nm").collect()
    assert [(r["fk"], r["nm"]) for r in got] == [(1, "a")]


def test_mixed_integral_key_widths_match_plain_join(spark):
    # int fk vs bigint k: xxhash64 is type-sensitive, so without a common
    # hash cast every true match would be a bloom false negative
    fact = spark.createDataFrame(
        [(i,) for i in range(100)], "fk: int"
    )
    dim = spark.createDataFrame(
        [(i, i * 10) for i in range(0, 100, 2)], "k: bigint, v: bigint"
    )
    got = bloom_pruned_join(fact, dim, "fk", "k").count()
    want = fact.join(dim, fact["fk"] == dim["k"]).count()
    assert got == want == 50


def test_irreconcilable_key_dtypes_raise_before_build(spark):
    fact = spark.createDataFrame([("1",)], "fk: string")
    dim = spark.createDataFrame([(1, "a")], "k: bigint, nm: string")
    try:
        bloom_pruned_join(fact, dim, "fk", "k")
    except ValueError as e:
        assert "dtypes differ" in str(e)
    else:
        raise AssertionError("string-vs-bigint keys must be rejected")


def test_null_probe_keys_pruned_pre_join(spark):
    # xxhash64 skips null children, so NULLs hash to a constant; the
    # explicit isNotNull conjunct must drop them at the filter itself
    dim = _dim(spark, 10)
    hex_bits, m = build_bloom_hex(dim, "k")
    probe = spark.createDataFrame(
        [(None,), (3,), (None,)], "k: bigint"
    )
    kept = probe.where(bloom_might_contain(hex_bits, m, F.col("k"))).collect()
    assert [r["k"] for r in kept] == [3]


def test_rejects_non_invariant_join_types(spark):
    fact = spark.range(5).select(F.col("id").alias("fk"))
    dim = _dim(spark, 5)
    try:
        bloom_pruned_join(fact, dim, "fk", "k", how="left")
    except ValueError as e:
        assert "result-invariant" in str(e)
    else:
        raise AssertionError("left join must be rejected")
