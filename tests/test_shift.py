"""r8e wave: KS/Wasserstein source shift + DOW seasonality
(functions/shift.py)."""


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def test_ks_identical_distributions_zero(spark, tmp_path):
    from data_pipeline_platform_spark.functions.shift import (
        q_ks_wasserstein_sources,
    )

    rows = [(i, "t", "en", "sA", 100 + (i % 3) * 10) for i in range(9)]
    rows += [(100 + i, "t", "en", "sB", 100 + (i % 3) * 10) for i in range(9)]
    _write_docs(spark, tmp_path, rows)
    for r in q_ks_wasserstein_sources(spark, str(tmp_path)).collect():
        assert r["ks_d"] == 0.0 and r["wasserstein"] == 0.0


def test_ks_disjoint_distributions(spark, tmp_path):
    """Completely separated supports: KS D = 1; W1 = distance between
    the two point masses."""
    from data_pipeline_platform_spark.functions.shift import (
        q_ks_wasserstein_sources,
    )

    rows = [(i, "t", "en", "sA", 100) for i in range(5)]
    rows += [(100 + i, "t", "en", "sB", 170) for i in range(5)]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in
           q_ks_wasserstein_sources(spark, str(tmp_path)).collect()}
    assert out["sA"]["ks_d"] == 1.0 and out["sB"]["ks_d"] == 1.0
    # all mass moves 70: W1 = 70 for both directions
    assert out["sA"]["wasserstein"] == 70.0
    assert out["sB"]["wasserstein"] == 70.0


def test_ks_hand_case_scipy_style(spark, tmp_path):
    """sA = {1,2}, sB = {2,3}: D = 1/2, W1 = 1 (scipy.stats values)."""
    from data_pipeline_platform_spark.functions.shift import (
        q_ks_wasserstein_sources,
    )

    _write_docs(spark, tmp_path, [(1, "t", "en", "sA", 1), (2, "t", "en", "sA", 2),
                                  (3, "t", "en", "sB", 2), (4, "t", "en", "sB", 3)])
    out = {r["source"]: r for r in
           q_ks_wasserstein_sources(spark, str(tmp_path)).collect()}
    assert out["sA"]["n_docs"] == 2
    assert out["sA"]["ks_d"] == 0.5
    assert out["sA"]["wasserstein"] == 1.0


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(path / "orders.parquet"))


def test_dow_flat_week_index_one(spark, tmp_path):
    import datetime as dt

    from data_pipeline_platform_spark.functions.shift import q_dow_seasonality

    base = dt.date(1995, 1, 2)  # a Monday
    _write_orders(spark, tmp_path,
                  [(i, base + dt.timedelta(days=i), 100.0) for i in range(14)])
    rows = q_dow_seasonality(spark, str(tmp_path)).collect()
    assert len(rows) == 7
    assert all(r["seasonal_index"] == 1.0 and r["n_orders"] == 2 for r in rows)


def test_dow_monday_is_zero_and_index_scales(spark, tmp_path):
    import datetime as dt

    from data_pipeline_platform_spark.functions.shift import q_dow_seasonality

    base = dt.date(1995, 1, 2)  # Monday -> dow 0
    # Monday orders are worth 300, the other six days 100
    rows = [(0, base, 300.0)]
    rows += [(i, base + dt.timedelta(days=i), 100.0) for i in range(1, 7)]
    _write_orders(spark, tmp_path, rows)
    out = {r["dow"]: r for r in q_dow_seasonality(spark, str(tmp_path)).collect()}
    grand_mean = 900.0 / 7
    assert out[0]["revenue_cents"] == 30000
    assert abs(out[0]["seasonal_index"] - 300.0 / grand_mean) < 1e-12
    assert abs(out[3]["seasonal_index"] - 100.0 / grand_mean) < 1e-12
