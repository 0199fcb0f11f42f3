"""Invariant tests for the r7b wave: rank tests, Gini, retrieval eval,
folds/curriculum, link prediction. Exact-value parity is covered by
tools/parity.py + test_oracle_parity; these assert the mathematical
invariants that would catch a formula slip the oracle can't (because
the oracle replays the same formula)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_mann_whitney_symmetry(spark):
    """U_a + U_b = n_a * n_b (so u2_a + u2_b = 2*n_a*n_b): check by
    recomputing u2_b from the swapped pair orientation."""
    from data_pipeline_platform_spark.functions.ranktests import q_mann_whitney_u

    rows = q_mann_whitney_u(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0 <= r.u2_a <= 2 * r.n_a * r.n_b
        assert r.auc_a == pytest.approx(r.u2_a / (2.0 * r.n_a * r.n_b))


def test_mann_whitney_identical_samples_auc_half(spark):
    """A distribution compared against itself must give AUC exactly 0.5
    — build a synthetic two-type frame with identical values."""
    from pyspark.sql.window import Window
    from data_pipeline_platform_spark.functions import ranktests

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(100)] + [("b", float(v)) for v in range(100)],
        "event_type string, value double",
    )
    # census path replicated inline on the synthetic frame
    census = df.groupBy(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    merged = census.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == "a", F.col("cnt")).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("event_type") == "b", F.col("cnt")).otherwise(0)).alias("cnt_b"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    ranked = merged.withColumn(
        "cum_before", F.coalesce(F.sum(F.col("cnt_a") + F.col("cnt_b")).over(w), F.lit(0))
    ).withColumn("midrank2", 2 * F.col("cum_before") + F.col("cnt_a") + F.col("cnt_b") + 1)
    agg = ranked.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.sum(F.col("cnt_a") * F.col("midrank2")).alias("rs2"),
    ).collect()[0]
    u2 = agg.rs2 - agg.n_a * (agg.n_a + 1)
    assert u2 == agg.n_a * agg.n_b  # AUC exactly 0.5


def test_ks_bounds_and_reject_consistency(spark):
    from data_pipeline_platform_spark.functions.ranktests import q_ks_test

    rows = q_ks_test(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.d_num <= r.n_a * r.n_b
        assert 0.0 <= r.d_stat <= 1.0
        thresh = 1.36 * ((r.n_a + r.n_b) / (r.n_a * r.n_b)) ** 0.5
        assert r.reject_95 == (r.d_stat > thresh)


def test_gini_bounds_and_degenerate(spark):
    from data_pipeline_platform_spark.functions.ranktests import q_gini_by_nation

    rows = q_gini_by_nation(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_dollars > 0


def test_retrieval_eval_bounds(spark):
    from data_pipeline_platform_spark.functions.retrieval import (
        K,
        LCM_K,
        N_PROBES,
        q_retrieval_eval,
    )

    rows = q_retrieval_eval(spark, SF_DIR).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert 0 <= r.n_rel_top10 <= K
        assert 0.0 <= r.ap10 <= 1.0
        if r.first_rel_rank is not None:
            assert 1 <= r.first_rel_rank <= K
            assert r.rr == pytest.approx(1.0 / r.first_rel_rank)
            assert r.ap_num > 0
        else:
            assert r.rr == 0.0 and r.ap_num == 0 and r.n_rel_top10 == 0
        # perfect retrieval ceiling: all top-K relevant -> ap_num = K * LCM_K
        assert r.ap_num <= K * LCM_K


def test_stratified_kfold_partitions_every_doc(spark):
    from data_pipeline_platform_spark.functions.folds import N_FOLDS, q_stratified_kfold
    from data_pipeline_platform_spark.sources.readers import load_table

    audit = q_stratified_kfold(spark, SF_DIR)
    total = audit.agg(F.sum("n_docs")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "documents").count()
    folds = {r.fold for r in audit.collect()}
    assert folds <= set(range(N_FOLDS))


def test_curriculum_order_phases_monotone(spark):
    from data_pipeline_platform_spark.functions.folds import q_curriculum_order

    rows = q_curriculum_order(spark, SF_DIR).orderBy("position").collect()
    assert [r.position for r in rows] == list(range(1, len(rows) + 1))
    phases = [r.phase for r in rows]
    assert phases == sorted(phases)  # easy-to-hard, never regresses
    for r in rows:
        lo, hi = {0: (0, 200), 1: (200, 400), 2: (400, 10**9)}[r.phase]
        assert lo <= r.n_chars < hi


def test_link_prediction_excludes_existing_edges(spark):
    from data_pipeline_platform_spark.functions.basket import (
        q_frequent_itemsets,
        q_link_prediction_parts,
    )

    pred = q_link_prediction_parts(spark, SF_DIR)
    edges = q_frequent_itemsets(spark, SF_DIR).select("pa", "pb")
    overlap = pred.join(
        edges, (pred.a == edges.pa) & (pred.b == edges.pb), "inner"
    ).count()
    assert overlap == 0
    for r in pred.collect():
        assert r.a < r.b
        assert 1 <= r.common_cnt <= r.union_cnt
        assert r.jaccard == pytest.approx(r.common_cnt / r.union_cnt)


def test_kneser_ney_bigram_invariants(spark):
    """KN probabilities are in (0, 1): mean log-prob strictly negative;
    an unseen context implies an unseen bigram; every held-out doc
    (source src0) with >= 2 tokens scores."""
    from data_pipeline_platform_spark.functions.repetition import q_kneser_ney_bigram

    rows = q_kneser_ney_bigram(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mean_logprob < 0.0
        assert r.n_unseen_context <= r.n_unseen_bigram <= r.n_bigrams


def test_weighted_sample_aes_prefers_heavy_docs(spark):
    """A-ES with weight = n_chars must over-represent long documents:
    the sample's mean length exceeds the corpus mean, sample is K
    unique docs."""
    from data_pipeline_platform_spark.functions.folds import SAMPLE_K, q_weighted_sample_aes
    from data_pipeline_platform_spark.sources.readers import load_table

    rows = q_weighted_sample_aes(spark, SF_DIR).collect()
    assert len(rows) == SAMPLE_K == len({r.doc_id for r in rows})
    corpus_mean = (
        load_table(spark, SF_DIR, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    # keys are valid A-ES keys: ln(u)/w <= 0
    assert all(r.key_fp <= 0 for r in rows)


def test_dp_noisy_counts_bounded_noise(spark):
    """Laplace(1/eps) inverse-CDF noise from a 16-bit uniform is
    bounded by b*ln(65536) ~ 11.1; the release must stay within that
    envelope of the true counts and be replay-identical."""
    from data_pipeline_platform_spark.functions.privacy import q_dp_noisy_counts
    from data_pipeline_platform_spark.sources.readers import load_table

    rel1 = {r.lang: r.noisy_count for r in q_dp_noisy_counts(spark, SF_DIR).collect()}
    rel2 = {r.lang: r.noisy_count for r in q_dp_noisy_counts(spark, SF_DIR).collect()}
    assert rel1 == rel2  # replayable release
    true = {
        r.lang: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import math

    bound = math.log(65536.0) + 1e-9
    for lang, noisy in rel1.items():
        assert abs(noisy - true[lang]) <= bound


def test_hashed_bow_collisions_cancel_not_bias(spark):
    """Signed hashing: |weight| never exceeds the bucket's term count,
    and buckets cover [0, N_BUCKETS)."""
    from data_pipeline_platform_spark.functions.vectorize import (
        N_BUCKETS,
        q_hashed_bow_vectors,
    )

    rows = q_hashed_bow_vectors(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < N_BUCKETS
        assert abs(r.weight) <= r.n_terms
        assert (r.n_terms - abs(r.weight)) % 2 == 0  # parity of cancellation


def test_conformal_interval_coverage_and_selection(spark):
    """Realized coverage must be near the 90% target (conformal
    guarantee is >= target in expectation; allow sampling slack down to
    0.85), and q_hat must be a score the calibration set actually
    produced, verified against a driver-side exact order statistic."""
    import math

    from data_pipeline_platform_spark.functions.regression import q_conformal_interval
    from data_pipeline_platform_spark.sources.readers import load_table

    row = q_conformal_interval(spark, SF_DIR).collect()[0]
    assert row.target == 0.9
    assert 0.85 <= row.coverage <= 1.0
    # replay the selection in plain python
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    pdf = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .selectExpr(
            "o_orderkey",
            "c_mktsegment",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
            "conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 1), 16, 10) "
            "< 8 AS is_cal",
        )
        .toPandas()
    )
    cal = pdf[pdf.is_cal]
    pred = cal.groupby("c_mktsegment").cents.agg(
        lambda s: int(round(s.sum() / len(s)))
    )
    scores = sorted(abs(cal.cents - cal.c_mktsegment.map(pred)))
    k = math.ceil((len(scores) + 1) * 0.9)
    assert row.q_hat_cents == scores[k - 1]


def test_kruskal_wallis_matches_python_replay(spark):
    """Textbook-math replay: midranks with ties, per-group rank sums,
    H and the tie correction computed independently in Python over the
    same events slice must match the engine to the rounded precision."""
    from collections import Counter, defaultdict

    import __spark_entry__ as se
    from tests.conftest import SF_DIR

    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("b")
    ).collect()
    by_bin = Counter(r["b"] for r in ev)
    # midrank of every value in bin: cum_before + (t + 1) / 2
    mid = {}
    cum = 0
    for b in sorted(by_bin):
        t = by_bin[b]
        mid[b] = cum + (t + 1) / 2
        cum += t
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(mid[r["b"]])
    n = len(ev)
    s = sum(
        sum(v) ** 2 / len(v) for _, v in sorted(groups.items())
    )
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    ties = sum(t**3 - t for t in by_bin.values())
    h_adj = h / (1.0 - ties / (n**3 - n))

    out = se.queries()["kruskal_wallis"](spark, SF_DIR).collect()[0]
    assert out["k_groups"] == len(groups)
    assert out["n_rows"] == n
    assert abs(out["h"] - h) < 1e-6
    assert abs(out["h_tie_adjusted"] - h_adj) < 1e-6
