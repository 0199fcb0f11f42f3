"""Independent-model checks for the r8b feature-engineering wave:
ACF vs numpy, WOE/IV vs a pandas reimplementation, class rebalance
invariants. These verify SEMANTICS against a third implementation —
the DuckDB oracle handles engine parity separately."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_acf_matches_numpy(spark):
    """The exact-integer ACF must agree with a straight float numpy
    computation of the same estimator to ~1e-6 (the output rounding)."""
    from data_pipeline_platform_spark.functions.changepoint import (
        ACF_MAX_LAG,
        q_acf_daily_revenue,
    )

    out = {r["lag"]: (r["n_pairs"], r["acf"]) for r in q_acf_daily_revenue(spark, SF).collect()}
    daily = (
        pd.read_parquet(f"{SF}/orders.parquet")
        .assign(day=lambda d: pd.to_datetime(d["o_orderdate"]).dt.floor("D"),
                cents=lambda d: (d["o_totalprice"] * 100).round().astype("int64"))
        .groupby("day")["cents"].sum().sort_index().to_numpy(dtype=np.float64)
    )
    n = len(daily)
    c = daily - daily.mean()
    den = float((c * c).sum())
    for k in range(1, ACF_MAX_LAG + 1):
        expect = float((c[:-k] * c[k:]).sum()) / den
        n_pairs, acf = out[k]
        assert n_pairs == n - k
        assert acf == pytest.approx(expect, abs=2e-6)


def test_woe_iv_matches_pandas(spark):
    """WOE/IV per priority vs a pandas reimplementation of the
    encoder, and sanity: total IV is nonnegative."""
    from data_pipeline_platform_spark.functions.vectorize import q_woe_iv_priority

    out = q_woe_iv_priority(spark, SF).toPandas().set_index("priority")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    bad_keys = set(li.loc[li["l_returnflag"] == "R", "l_orderkey"])
    orders["is_bad"] = orders["o_orderkey"].isin(bad_keys).astype(int)
    bins = orders.groupby("o_orderpriority")["is_bad"].agg(["count", "sum"])
    bins["n_good"] = bins["count"] - bins["sum"]
    good_t, bad_t = bins["n_good"].sum(), bins["sum"].sum()
    iv_total = 0.0
    for prio, row in bins.iterrows():
        g, b = row["n_good"], row["sum"]
        woe = np.log((g / good_t) / (b / bad_t))
        iv = ((g / good_t) - (b / bad_t)) * round(woe, 6)
        assert out.loc[prio, "n_good"] == g
        assert out.loc[prio, "n_bad"] == b
        assert out.loc[prio, "woe"] == pytest.approx(woe, abs=2e-6)
        assert out.loc[prio, "iv_term"] == pytest.approx(iv, abs=2e-6)
        iv_total += iv
    assert iv_total >= 0


def test_class_rebalance_reaches_parity(spark):
    """Every class lands at EXACTLY the majority count, and the
    replication is deterministic across runs."""
    from data_pipeline_platform_spark.functions.folds import q_class_rebalance

    a = q_class_rebalance(spark, SF).toPandas().sort_values("lang").reset_index(drop=True)
    maj = a["n_before"].max()
    assert (a["n_after"] == maj).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert dict(zip(a["lang"], a["n_before"])) == docs["lang"].value_counts().to_dict()
    b = q_class_rebalance(spark, SF).toPandas().sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_textrank_hub_word_ranks_first(spark):
    """A synthetic corpus where one word is adjacent to everything:
    the hub must out-rank the leaves (importance flows to it)."""
    from data_pipeline_platform_spark.functions.graph import pagerank_fixed_point
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("hub alpha hub beta hub gamma hub delta",), ("alpha beta",)], ["text"]
    )
    toks = docs.select(F.split("text", " ").alias("t"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (a, b) -> struct(a, b))"
            )
        ).alias("p")
    ).select(F.least("p.a", "p.b").alias("w1"), F.greatest("p.a", "p.b").alias("w2"))
    e0 = pairs.filter(F.col("w1") != F.col("w2")).distinct()
    edges = e0.select(F.col("w1").alias("src"), F.col("w2").alias("dst")).unionByName(
        e0.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    )
    out = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(edges).collect()}
    assert max(out, key=out.get) == "hub"


def test_matryoshka_recall_bounds_and_self_consistency(spark):
    """recall in [0,1]; 20 probes at sf0.001; and the truncated ranking
    of an UNTRUNCATED prefix (dim=64 == full) would be recall 1 — here
    we check the weaker invariant that overlap counts are <= k."""
    from data_pipeline_platform_spark.functions.similarity import (
        MATRYOSHKA_K,
        q_matryoshka_recall,
    )

    rows = q_matryoshka_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_overlap"] <= MATRYOSHKA_K
        assert r["recall_at_k"] == r["n_overlap"] / MATRYOSHKA_K


def test_rrf_fusion_contains_consensus_docs(spark):
    """A doc in both top-10 lists must out-score a doc in neither; the
    fused list is exactly RRF_TOP per probe with dense ranks 1..top."""
    from data_pipeline_platform_spark.functions.similarity import (
        RRF_TOP,
        q_rrf_fusion,
    )

    pdf = q_rrf_fusion(spark, "/root/testdata/sf0.001").toPandas()
    assert set(pdf.groupby("probe_id")["fused_rank"].apply(
        lambda s: tuple(sorted(s))
    )) == {tuple(range(1, RRF_TOP + 1))}
    # rrf scores decrease with fused_rank within a probe
    for _, grp in pdf.groupby("probe_id"):
        srt = grp.sort_values("fused_rank")["rrf"].tolist()
        assert srt == sorted(srt, reverse=True)


def test_decision_stump_matches_sklearn_free_reimpl(spark):
    """The chosen split must equal an independent numpy scan over every
    candidate threshold (entropy gain, same 100-dollar grid)."""
    import numpy as np
    import pandas as pd

    from data_pipeline_platform_spark.functions.vectorize import (
        STUMP_BIN_CENTS,
        q_decision_stump_price,
    )

    out = q_decision_stump_price(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    bad_keys = set(li.loc[li["l_returnflag"] == "R", "l_orderkey"])
    is_bad = orders["o_orderkey"].isin(bad_keys).to_numpy(dtype=int)
    bins = ((orders["o_totalprice"] * 100).round().astype("int64") // STUMP_BIN_CENTS).to_numpy()

    def H(g, b):
        if g == 0 or b == 0:
            return 0.0
        n = g + b
        return -(g / n) * np.log(g / n) - (b / n) * np.log(b / n)

    best = None
    G, B = int((is_bad == 0).sum()), int(is_bad.sum())
    for t in np.unique(bins):
        left = bins <= t
        gl, bl = int(((is_bad == 0) & left).sum()), int((is_bad[left] == 1).sum())
        if gl + bl == 0 or gl + bl == G + B:
            continue
        gain = H(G, B) - ((gl + bl) / (G + B)) * H(gl, bl) - (
            (G + B - gl - bl) / (G + B)
        ) * H(G - gl, B - bl)
        key = (round(gain, 6), -(t + 1))
        if best is None or key > best[0]:
            best = (key, t, gl + bl, gain)
    assert out["threshold"] == (best[1] + 1) * STUMP_BIN_CENTS / 100.0
    assert out["n_left"] == best[2]
    assert out["gain"] == round(best[3], 6)
