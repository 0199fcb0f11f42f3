"""r8e wave: JSD source drift + calibration/ECE (functions/diverge.py)."""

import math


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def test_jsd_identical_sources_is_zero(spark, tmp_path):
    from data_pipeline_platform_spark.functions.diverge import (
        q_js_divergence_sources,
    )

    text = "alpha beta gamma alpha beta gamma"
    _write_docs(spark, tmp_path, [(1, text, "en", "sA", 1), (2, text, "en", "sB", 1)])
    rows = q_js_divergence_sources(spark, str(tmp_path)).collect()
    assert {r["source"] for r in rows} == {"sA", "sB"}
    assert all(abs(r["jsd"]) < 1e-9 for r in rows)


def test_jsd_disjoint_sources_is_ln2(spark, tmp_path):
    """Zero token overlap is the JSD maximum, exactly ln 2."""
    from data_pipeline_platform_spark.functions.diverge import (
        q_js_divergence_sources,
    )

    _write_docs(spark, tmp_path, [(1, "aa bb cc aa", "en", "sA", 1),
                                  (2, "xx yy zz zz", "fr", "sB", 1)])
    rows = q_js_divergence_sources(spark, str(tmp_path)).collect()
    for r in rows:
        assert abs(r["jsd"] - math.log(2)) < 1e-9


def test_jsd_matches_scipy_style_replay(spark, tmp_path):
    """Hand-computed JSD for a small overlapping pair of sources."""
    from data_pipeline_platform_spark.functions.diverge import (
        q_js_divergence_sources,
    )

    _write_docs(spark, tmp_path, [(1, "a a a b", "en", "sA", 1),
                                  (2, "a b b b c", "en", "sB", 1)])
    rows = {r["source"]: r for r in
            q_js_divergence_sources(spark, str(tmp_path)).collect()}

    def jsd(p, q):
        tot = 0.0
        for t in set(p) | set(q):
            pi, qi = p.get(t, 0.0), q.get(t, 0.0)
            m = (pi + qi) / 2
            if pi:
                tot += pi * math.log(pi / m)
            if qi:
                tot += qi * math.log(qi / m)
        return tot / 2

    pa = {"a": 3 / 4, "b": 1 / 4}
    pb = {"a": 1 / 5, "b": 3 / 5, "c": 1 / 5}
    assert abs(rows["sA"]["jsd"] - jsd(pa, pb)) < 1e-9
    assert rows["sA"]["n_tokens"] == 4
    assert abs(rows["sB"]["jsd"] - jsd(pb, pa)) < 1e-9


def _write_li(spark, path, rows):
    spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))


def test_calibration_perfectly_calibrated_score_has_zero_ece(spark, tmp_path):
    """bin=10 -> pred 0.2, exactly 1 of 5 returned; bin=25 -> pred 0.5,
    exactly 2 of 4 returned. ECE must be exactly 0."""
    from data_pipeline_platform_spark.functions.diverge import (
        q_calibration_returns,
    )

    rows = [(i, 10.0, "R" if i == 0 else "N") for i in range(5)]
    rows += [(10 + i, 25.0, "R" if i < 2 else "N") for i in range(4)]
    _write_li(spark, tmp_path, rows)
    out = {r["bin"]: r for r in q_calibration_returns(spark, str(tmp_path)).collect()}
    assert out[10]["pred_prob"] == 0.2 and out[10]["actual_rate"] == 0.2
    assert out[25]["pred_prob"] == 0.5 and out[25]["actual_rate"] == 0.5
    assert all(r["ece"] == 0.0 for r in out.values())


def test_calibration_ece_hand_case(spark, tmp_path):
    """One bin, pred 0.5, actual 1.0 -> ECE = 0.5 exactly."""
    from data_pipeline_platform_spark.functions.diverge import (
        q_calibration_returns,
    )

    _write_li(spark, tmp_path, [(1, 25.0, "R"), (2, 25.0, "R")])
    row = q_calibration_returns(spark, str(tmp_path)).collect()[0]
    assert row["actual_rate"] == 1.0
    assert row["ece"] == 0.5
