"""Data-quality expectations: one-pass rule evaluation, null handling,
referential orphans."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.quality import (
    check_expectations,
    orphan_count,
)


def test_check_expectations_counts_and_null_policy(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, 200.0)], "id long, v double"
    )
    report = check_expectations(
        df,
        [
            ("v_positive", F.col("v") > 0),          # null v -> violation
            ("v_under_100", F.col("v") < 100),        # null v -> violation
            ("id_not_null", F.col("id").isNotNull()),
        ],
    )
    got = {r["rule"]: (r["checked"], r["violations"]) for r in report.collect()}
    assert got == {
        "v_positive": (4, 2),   # None and -5.0
        "v_under_100": (4, 2),  # None and 200.0
        "id_not_null": (4, 0),
    }


def test_orphan_count(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    row = orphan_count(child, parent, ["k"], "fk").collect()[0]
    assert (row["rule"], row["checked"], row["violations"]) == ("fk", 4, 2)


def test_quality_report_single_scan(spark):
    """All row-level rules must evaluate in ONE pass over lineitem (the
    FK check adds its own pruned anti-join branch)."""
    from data_pipeline_platform_spark.functions.quality import q_data_quality_report

    df = q_data_quality_report(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # row-level branch + FK checked-count + FK orphan side = 3 scans max
    assert plan.count("lineitem.parquet") <= 3
    assert "EvalPython" not in plan
    # rule evaluation is partially aggregated before any exchange
    assert "partial_count" in plan or "partial_sum" in plan
