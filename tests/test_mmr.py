"""MMR diversified re-ranking (functions/mmr.py) and hard-negative
mining (functions/similarity.py)."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.mmr import mmr_select
from data_pipeline_platform_spark.functions.similarity import hard_negatives


def _cand(spark, rows):
    # (vec_id, vec, rel)
    return spark.createDataFrame(
        rows, "vec_id long, vec array<double>, rel double"
    )


def test_mmr_prefers_diverse_over_redundant(spark):
    # three near-identical high-relevance vectors and one orthogonal
    # medium-relevance vector: plain top-2 takes two clones; MMR's
    # second pick must be the orthogonal one
    clones = [
        (1, [1.0, 0.0], 0.95),
        (2, [0.999, 0.01], 0.94),
        (3, [0.998, 0.02], 0.93),
    ]
    ortho = [(4, [0.0, 1.0], 0.60)]
    sel = mmr_select(_cand(spark, clones + ortho), k=2, lam=0.7)
    assert [v for _, v, _, _ in sel] == [1, 4]
    # scores: first = rel; second = 0.7*0.60 - 0.3*cos(ortho, clone1)=0.42
    assert sel[0][3] == 0.95
    assert abs(sel[1][3] - 0.42) < 1e-9


def test_mmr_k_exceeds_candidates(spark):
    sel = mmr_select(_cand(spark, [(1, [1.0, 0.0], 0.9)]), k=5)
    assert len(sel) == 1 and sel[0][1] == 1


def test_hard_negatives_excludes_anchor_label(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),  # anchor, label 7
            (1, [0.99, 0.01], 7),  # same label: most similar but excluded
            (2, [0.9, 0.1], 3),
            (3, [0.0, 1.0], 3),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = hard_negatives(emb, query_vec_id=0, k=2).collect()
    assert [r["vec_id"] for r in out] == [2, 3]
    assert all(r["label"] != 7 for r in out)
    # hardest (most similar) negative ranks first
    assert out[0]["cosine"] > out[1]["cosine"]
