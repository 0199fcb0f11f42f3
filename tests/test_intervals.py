"""Bin-bucketed interval join (functions/intervals.py) and label-noise
detection (functions/labelnoise.py)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.intervals import interval_join
from data_pipeline_platform_spark.functions.labelnoise import label_disagreement


def test_interval_join_matches_nested_loop(spark):
    pts = spark.createDataFrame([(i,) for i in range(0, 50)], "p long")
    ivs = spark.createDataFrame(
        [(1, 0, 9), (2, 5, 6), (3, 40, 49), (4, 100, 110)],
        "iv long, s long, e long",
    )
    got = sorted(
        (r["p"], r["iv"])
        for r in interval_join(pts, ivs, "p", "s", "e", bin_size=4).collect()
    )
    want = sorted(
        (r["p"], r["iv"])
        for r in pts.crossJoin(ivs)
        .filter((F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
        .collect()
    )
    assert got == want and len(got) == 10 + 2 + 10
    # overlapping intervals yield one row per covering interval
    assert (5, 1) in got and (5, 2) in got


def test_interval_join_bin_boundary_exact(spark):
    # interval ends exactly on a bin edge; points at both edges included,
    # point one past the end excluded even though it shares the end's bin
    pts = spark.createDataFrame([(7,), (8,), (9,)], "p long")
    ivs = spark.createDataFrame([(1, 4, 8)], "iv long, s long, e long")
    got = sorted(
        r["p"] for r in interval_join(pts, ivs, "p", "s", "e", bin_size=4).collect()
    )
    assert got == [7, 8]


def test_interval_join_plan_has_no_nested_loop(spark):
    pts = spark.createDataFrame([(1,)], "p long")
    ivs = spark.createDataFrame([(1, 0, 9)], "iv long, s long, e long")
    plan = (
        interval_join(pts, ivs, "p", "s", "e", bin_size=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label int, vec array<double>")


def test_label_disagreement_flags_planted_error(spark):
    # two tight clusters; vec 10 sits in cluster B but carries label 0
    a = [(i, 0, [0.0 + i * 0.001, 0.0]) for i in range(5)]
    b = [(100 + i, 1, [5.0 + i * 0.001, 0.0]) for i in range(5)]
    planted = [(10, 0, [5.002, 0.001])]
    emb = _emb(spark, a + b + planted)
    out = {
        r["vec_id"]: r
        for r in label_disagreement(emb, emb, k=3, suspect_at=3).collect()
    }
    assert out[10]["n_diff"] == 3 and out[10]["suspected"]
    # clean points keep their neighborhoods: nothing else flags
    assert all(not r["suspected"] for v, r in out.items() if v != 10)
    # the planted point also poisons ONE neighbor's count at most
    assert out[100]["n_diff"] <= 1


def test_interval_join_left_keeps_uncovered_points(spark):
    pts = spark.createDataFrame([(1,), (5,), (50,)], "p long")
    ivs = spark.createDataFrame([(0, 2, "a"), (4, 6, "b"), (5, 9, "c")],
                                "s long, e long, tag string")
    out = interval_join(pts, ivs, "p", "s", "e", bin_size=4, how="left")
    rows = sorted((r["p"], r["tag"]) for r in out.collect())
    # 1 -> a; 5 -> b and c (two rows); 50 -> uncovered, ONE null row
    assert rows == [(1, "a"), (5, "b"), (5, "c"), (50, None)]
    nulls = out.filter("tag IS NULL").collect()
    assert len(nulls) == 1 and nulls[0]["s"] is None and nulls[0]["e"] is None


def test_interval_join_left_no_duplicate_null_extension(spark):
    # a bin containing intervals that all FAIL the exact check must
    # still yield exactly one null-extended row for the point
    pts = spark.createDataFrame([(3,)], "p long")
    ivs = spark.createDataFrame([(0, 1, "a"), (0, 2, "b")],
                                "s long, e long, tag string")
    out = interval_join(pts, ivs, "p", "s", "e", bin_size=4, how="left")
    assert [(r["p"], r["tag"]) for r in out.collect()] == [(3, None)]


def test_interval_join_rejects_unknown_how(spark):
    pts = spark.createDataFrame([(1,)], "p long")
    ivs = spark.createDataFrame([(0, 2)], "s long, e long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        interval_join(pts, ivs, "p", "s", "e", bin_size=4, how="full")
