"""Greedy k-center coreset selection (functions/coreset.py)."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.coreset import kcenter_select
from data_pipeline_platform_spark.functions.similarity import FP_SCALE


def _emb(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, vec array<double>",
    )


def test_farthest_first_order_and_radii(spark):
    # seed is min vec_id (0 at origin); 1 is farthest; then the max-min
    # tie between 2 and 3 breaks to the smaller vec_id
    emb = _emb(spark, [(0.0, 0.0), (10.0, 0.0), (0.0, 1.0), (9.0, 0.0)])
    sel = kcenter_select(emb, 4)
    assert [(o, i) for o, i, _ in sel] == [(0, 0), (1, 1), (2, 2), (3, 3)]
    radii = {i: r for _, i, r in sel}
    assert radii[0] == 0
    assert radii[1] == 100 * FP_SCALE * FP_SCALE  # d^2((0,0),(10,0))
    assert radii[2] == 1 * FP_SCALE * FP_SCALE  # min(1, 101) = 1
    assert radii[3] == 1 * FP_SCALE * FP_SCALE  # min(81, 1) = 1


def test_duplicates_zero_radius_id_order(spark):
    emb = _emb(spark, [(1.0, 1.0)] * 4)
    sel = kcenter_select(emb, 3)
    # all distances 0 -> pure vec_id tie-break, radii all 0
    assert [(o, i, r) for o, i, r in sel] == [(0, 0, 0), (1, 1, 0), (2, 2, 0)]


def test_k_larger_than_corpus_stops(spark):
    emb = _emb(spark, [(0.0, 0.0), (1.0, 0.0)])
    sel = kcenter_select(emb, 10)
    assert len(sel) == 2


def test_empty_corpus(spark):
    emb = _emb(spark, []).filter(F.col("vec_id") > 0)
    assert kcenter_select(emb, 3) == []
