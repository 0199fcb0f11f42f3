"""r8e wave: Zipf fit, Dunning G² keyness (functions/keyness.py) and
the rank-correlation trio (functions/rankcorr.py)."""

import math


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def test_zipf_fit_recovers_planted_exponent(spark, tmp_path):
    """A corpus whose token counts follow c(r) = round(C / r) exactly
    must fit a slope near -1."""
    from data_pipeline_platform_spark.functions.keyness import q_zipf_fit

    C = 600
    words = []
    for r in range(1, 41):
        words.extend([f"w{r:03d}"] * max(1, round(C / r)))
    _write_docs(spark, tmp_path, [(1, " ".join(words), "en", "s0", 1)])
    row = q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 40
    assert -1.1 < row["slope"] < -0.9
    # intercept ~ ln(C)
    assert abs(row["intercept"] - math.log(C)) < 0.2


def test_zipf_fit_flat_corpus_slope_zero(spark, tmp_path):
    from data_pipeline_platform_spark.functions.keyness import q_zipf_fit

    words = [f"w{r}" for r in range(30)] * 25  # every type equally frequent
    _write_docs(spark, tmp_path, [(1, " ".join(words), "en", "s0", 1)])
    row = q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["slope"] == 0.0


def test_keyness_flags_the_planted_marker(spark, tmp_path):
    """'marker' is all-but-exclusive to the en slice; 'common' is
    rate-balanced. marker must rank first and point at the target."""
    from data_pipeline_platform_spark.functions.keyness import q_keyness_dunning

    en = ("marker " * 30 + "common " * 30).strip()
    fr = ("autre " * 30 + "common " * 30).strip()
    _write_docs(spark, tmp_path, [(1, en, "en", "s0", 1), (2, fr, "fr", "s0", 1)])
    rows = q_keyness_dunning(spark, str(tmp_path)).collect()
    assert rows[0]["tok"] in ("marker", "autre")
    by_tok = {r["tok"]: r for r in rows}
    assert by_tok["marker"]["enriched_in"] == "target"
    assert by_tok["autre"]["enriched_in"] == "reference"
    # the balanced token carries (near-)zero keyness
    assert by_tok["common"]["g2"] < by_tok["marker"]["g2"]
    assert abs(by_tok["common"]["g2"]) < 1e-6
    # exact G2 replay for the marker cell: a=30, b=0, n1=n2=60
    a, n1, n2, t = 30, 60, 60, 30
    e1 = n1 * t / (n1 + n2)
    expected = 2.0 * a * math.log(a / e1)
    assert abs(by_tok["marker"]["g2"] - expected) < 1e-5


def test_keyness_respects_min_total_cut(spark, tmp_path):
    from data_pipeline_platform_spark.functions.keyness import (
        MIN_TOTAL,
        q_keyness_dunning,
    )

    rare = "rare " * (MIN_TOTAL - 1)
    filler = "pad " * MIN_TOTAL
    _write_docs(spark, tmp_path, [(1, rare + filler, "en", "s0", 1),
                                  (2, filler.strip(), "fr", "s0", 1)])
    toks = {r["tok"] for r in q_keyness_dunning(spark, str(tmp_path)).collect()}
    assert "rare" not in toks
    assert "pad" in toks


def test_spearman_perfect_monotone(spark, tmp_path):
    """A strictly monotone price↔balance relation (with repeated value
    pairs, exercising midranks) gives rho exactly 1."""
    from data_pipeline_platform_spark.functions.rankcorr import (
        q_spearman_price_balance,
    )

    # 70 orders over 7 customers; total price is a monotone function of
    # the customer's balance, repeated 10x -> heavy ties, still rho=1
    spark.createDataFrame(
        [(i, i % 7 + 1, float((i % 7 + 1) * 11.5)) for i in range(70)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(c, float(c * 3 + 0.25)) for c in range(1, 8)],
        "c_custkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    row = q_spearman_price_balance(spark, str(tmp_path)).collect()[0]
    assert row["n"] == 70
    assert abs(row["spearman_rho"] - 1.0) < 1e-6
