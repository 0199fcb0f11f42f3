"""Record linkage (functions/linkage.py): blocking, distinct-token
Jaccard scoring, thresholding."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.linkage import blocked_link


def _side(spark, rows):
    df = spark.createDataFrame(rows, "id long, name string")
    toks = F.split(F.col("name"), " ")
    return df.select("id", toks.alias("toks"), F.element_at(toks, 1).alias("bk"))


def test_blocking_limits_candidates_and_scores(spark):
    left = _side(
        spark,
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha only")],
    )
    right = _side(
        spark,
        [
            (101, "alpha beta gamma"),  # exact duplicate of 1
            (102, "alpha beta theta"),  # 2-of-4 overlap with 1
            (103, "omega psi chi"),  # different block entirely
        ],
    )
    out = {
        (r["left_id"], r["right_id"]): r
        for r in blocked_link(left, right, threshold=0.5).collect()
    }
    assert out[(1, 101)]["jaccard"] == 1.0 and out[(1, 101)]["n_common"] == 3
    assert out[(1, 102)]["n_common"] == 2 and out[(1, 102)]["jaccard"] == 0.5
    # id 2 shares no block key with any right record; id 103 unmatched
    assert all(l != 2 for l, _ in out)
    assert all(r != 103 for _, r in out)
    # (3, 101): same block 'alpha', 1 common of 4 -> 0.25 < threshold
    assert (3, 101) not in out


def test_duplicate_tokens_collapse_before_jaccard(spark):
    left = _side(spark, [(1, "a a a b")])
    right = _side(spark, [(9, "a b")])
    row = blocked_link(left, right, threshold=0.0).collect()[0]
    # distinct tokens {a,b} on both sides -> perfect match, not diluted
    assert row["jaccard"] == 1.0


def test_threshold_is_inclusive(spark):
    left = _side(spark, [(1, "a b")])
    right = _side(spark, [(2, "a c")])
    assert blocked_link(left, right, threshold=0.34).count() == 0
    hits = blocked_link(left, right, threshold=1 / 3).collect()
    assert len(hits) == 1 and hits[0]["n_common"] == 1
