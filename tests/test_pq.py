"""Product quantization (functions/pq.py): code-shape invariants, the
exact-integer ADC contract, and retrieval recall vs the exact scan.
The synthetic embeddings are near-uniform — the HARD case for any
coarse codec — so the pinned recall is the honest floor, not a
showcase; real clustered corpora do better and PQ_CAND trades recall
linearly."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.pq import (
    PQ_KS,
    PQ_M,
    pq_encode,
    pq_train,
)
from data_pipeline_platform_spark.functions.similarity import _as_double, _emb
from tests.conftest import SF_DIR


def _vecs(spark):
    return _emb(spark, SF_DIR).select(
        "vec_id", _as_double("embedding").alias("vec")
    )


def test_codes_shape_and_domain(spark):
    vecs = _vecs(spark)
    cents = pq_train(vecs)
    codes = pq_encode(vecs, cents)
    n = vecs.count()
    # exactly M codes per vector, every code inside the sub-codebook
    per_vec = codes.groupBy("vec_id").agg(F.count(F.lit(1)).alias("m"))
    assert per_vec.filter(F.col("m") != PQ_M).count() == 0
    assert per_vec.count() == n
    bad = codes.filter(
        (F.col("code") < 1) | (F.col("code") > PQ_KS)
    ).count()
    assert bad == 0
    # the codebook is M x <=Ks rows (a seed cell can starve) — tiny,
    # broadcastable at any corpus size
    assert cents.count() <= PQ_M * PQ_KS
    assert cents.count() >= PQ_M * (PQ_KS - 2)


def test_recall_vs_exact_scan(spark):
    import __spark_entry__ as se

    q = se.queries()
    pq_top = {
        r["vec_id"] for r in q["cosine_topk_pq"](spark, SF_DIR).collect()
    }
    exact_top = {
        r["vec_id"] for r in q["cosine_topk"](spark, SF_DIR).collect()
    }
    assert len(pq_top) == 10
    # measured 0.4 on the near-uniform synthetic corpus with a 50-row
    # candidate budget over 500 vectors; deterministic, so a drop means
    # the codec regressed
    assert len(pq_top & exact_top) / 10 >= 0.4


def test_ivfpq_recall_matches_ivf_exact(spark):
    """Residual PQ inside probed cells: the 4-bit codec must not cost
    recall vs the exact-rerank IVF on this corpus (both measured 0.8
    against the exhaustive scan — the IVF probe, not the codec, is the
    recall bound; deterministic, so a drop means regression)."""
    import __spark_entry__ as se

    q = se.queries()
    ivfpq = {
        r["vec_id"] for r in q["ann_ivfpq_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        r["vec_id"]
        for r in q["cosine_topk_ivf_exact"](spark, SF_DIR).collect()
    }
    exact = {
        r["vec_id"] for r in q["cosine_topk"](spark, SF_DIR).collect()
    }
    assert len(ivfpq & exact) / 10 >= 0.8
    assert len(ivfpq & exact) >= len(ivf & exact)
