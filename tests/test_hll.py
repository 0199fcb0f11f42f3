"""HLL sketch (functions/hll.py): merge-equals-union, estimator
accuracy against exact distinct, determinism, and the small-range
linear-counting branch."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.hll import (
    M,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _vals(spark, lo, hi, key="a"):
    return spark.range(lo, hi).select(
        F.lit(key).alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_merge_equals_union(spark):
    a = _vals(spark, 0, 3000)
    b = _vals(spark, 2000, 6000)  # overlapping shards
    merged = hll_merge(
        hll_registers(a, "v", keys=["k"]), hll_registers(b, "v", keys=["k"])
    )
    union = hll_registers(a.unionByName(b), "v", keys=["k"])
    got = {(r["k"], r["bucket"]): r["mj"] for r in merged.collect()}
    want = {(r["k"], r["bucket"]): r["mj"] for r in union.collect()}
    assert got == want
    # and therefore identical estimates
    em = hll_estimate(merged, keys=["k"]).collect()[0]["est_distinct"]
    eu = hll_estimate(union, keys=["k"]).collect()[0]["est_distinct"]
    assert em == eu


def test_estimate_within_hll_error_band(spark):
    # standard error ~ 1.04/sqrt(m) ≈ 3.25% at m=1024; allow 4 sigma
    n = 20_000
    est = hll_estimate(
        hll_registers(_vals(spark, 0, n), "v", keys=["k"]), keys=["k"]
    ).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 0.13


def test_duplicates_do_not_move_the_estimate(spark):
    once = _vals(spark, 0, 5000)
    thrice = once.unionByName(once).unionByName(once)
    e1 = hll_estimate(hll_registers(once, "v", keys=["k"]), keys=["k"])
    e3 = hll_estimate(hll_registers(thrice, "v", keys=["k"]), keys=["k"])
    assert e1.collect()[0]["est_distinct"] == e3.collect()[0]["est_distinct"]


def test_small_range_uses_linear_counting(spark):
    # 50 distinct values leave most registers empty: the estimator must
    # take the m*ln(m/zeros) branch and land very close to exact
    row = hll_estimate(
        hll_registers(_vals(spark, 0, 50), "v", keys=["k"]), keys=["k"]
    ).collect()[0]
    assert row["zeros"] > M * 0.9
    assert abs(row["est_distinct"] - 50) < 5


def test_merge_invariant_under_random_splits(spark):
    """sketch(A ∪ B ∪ C) == merge(sketch(A), sketch(B), sketch(C)) for a
    3-way split by value hash — the register algebra is a max-fold, so
    ANY partition of the corpus merges to the same registers."""
    from pyspark.sql import functions as F

    vals = spark.range(0, 8000).select(
        F.lit("k").alias("k"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    shards = [vals.filter(F.crc32("v") % 3 == i) for i in range(3)]
    merged = hll_merge(*[hll_registers(s, "v", keys=["k"]) for s in shards])
    union = hll_registers(vals, "v", keys=["k"])
    assert {
        (r["k"], r["bucket"]): r["mj"] for r in merged.collect()
    } == {(r["k"], r["bucket"]): r["mj"] for r in union.collect()}
    em = hll_estimate(merged, keys=["k"]).collect()[0]["est_distinct"]
    eu = hll_estimate(union, keys=["k"]).collect()[0]["est_distinct"]
    assert em == eu
