"""Coreset selection over the embeddings table (extension; no reference
counterpart — data pruning for training sets).

``kcenter_coreset`` is greedy k-center (Gonzalez 1985; the selection
rule behind "active learning / core-set" data pruning, Sener & Savarese
2018): start from a deterministic seed, then repeatedly pick the point
FARTHEST from the selected set (max over points of min over centers).
The selected points cover the corpus with the smallest max-distance ball
any greedy scheme achieves (2-approximation of the optimal k-center
radius) — i.e. the most geometrically diverse k examples, the opposite
end of the spectrum from `semantic_dedup`'s near-duplicate pruning.

Scale shape: each of the k-1 rounds is ONE corpus scan computing the
running min-distance against the (driver-held, k-bounded) center list
and a `TakeOrderedAndProject` argmax — O(k·n) distance kernels total,
never a pairwise matrix.  The driver only ever holds k rows.  Distances
use the package's fixed-point BIGINT kernel (`_dist_fp_sql`,
functions/similarity.py:58) — selection is an argmax over distances, and
a 1-ulp double divergence at a near-tie would silently flip which point
enters the coreset, so every compared quantity is exact integer
arithmetic and the DuckDB oracle (an unrolled CTE chain replaying every
round) matches bitwise.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.similarity import (
    _as_double,
    _dist_fp_sql,
    _duck_dist_fp,
)

K_SELECT = 6


def kcenter_select(emb: DataFrame, k: int) -> List[Tuple[int, int, int]]:
    """Greedy k-center over (vec_id, vec array<double>); returns
    [(sel_order, vec_id, radius_fp)] — radius_fp is the squared
    fixed-point distance that made the point the farthest (0 for the
    seed).  Each round: one scan, one argmax; min-distances fold
    incrementally into a running column via localCheckpoint so round r
    adds ONE new distance kernel, not r of them."""
    seed = emb.agg(F.min("vec_id")).collect()[0][0]
    if seed is None:
        return []
    seed_vec_row = emb.filter(F.col("vec_id") == seed).select("vec").collect()[0]
    selected = [(0, int(seed), 0)]
    # remaining points with running min distance to the selected set
    rem = (
        emb.filter(F.col("vec_id") != seed)
        .withColumn("cvec", F.lit(seed_vec_row["vec"]).cast("array<double>"))
        .withColumn("mind", F.expr(_dist_fp_sql("vec", "cvec")))
        .drop("cvec")
        .localCheckpoint()  # truncate lineage: k rounds, not 2^k plan
    )
    for step in range(1, k):
        far = (
            rem.orderBy(F.col("mind").desc(), F.col("vec_id"))
            .limit(1)
            .select("vec_id", "mind", "vec")
            .collect()
        )
        if not far:
            break
        fid, radius, fvec = int(far[0]["vec_id"]), int(far[0]["mind"]), far[0]["vec"]
        selected.append((step, fid, radius))
        rem = (
            rem.filter(F.col("vec_id") != fid)
            .withColumn("cvec", F.lit(fvec).cast("array<double>"))
            .withColumn("mind", F.least("mind", F.expr(_dist_fp_sql("vec", "cvec"))))
            .drop("cvec")
            .localCheckpoint()
        )
    return selected


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    rows = kcenter_select(emb, K_SELECT)
    return spark.createDataFrame(
        rows, "sel_order int, vec_id bigint, radius_fp bigint"
    )


def _oracle_kcenter(k: int) -> str:
    dist_bc = _duck_dist_fp("b.vec", "c.vec")
    parts = [
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),",
        "sel0 AS (SELECT MIN(vec_id) AS id FROM base),",
        # round 1 distances: every non-seed point vs the seed
        f"""d1 AS (
  SELECT b.vec_id, b.vec, {dist_bc} AS mind
  FROM base b, base c, sel0
  WHERE c.vec_id = sel0.id AND b.vec_id <> sel0.id
),""",
    ]
    for step in range(1, k):
        parts.append(
            f"sel{step} AS (SELECT vec_id AS id, mind AS r FROM d{step} "
            f"ORDER BY mind DESC, vec_id LIMIT 1),"
        )
        if step < k - 1:
            parts.append(
                f"""d{step + 1} AS (
  SELECT b.vec_id, b.vec, LEAST(b.mind, {_duck_dist_fp("b.vec", "c.vec")}) AS mind
  FROM d{step} b, base c, sel{step}
  WHERE c.vec_id = sel{step}.id AND b.vec_id <> sel{step}.id
),"""
            )
    selects = [
        "SELECT 0 AS sel_order, CAST(id AS BIGINT) AS vec_id, "
        "CAST(0 AS BIGINT) AS radius_fp FROM sel0"
    ] + [
        f"SELECT {s}, CAST(id AS BIGINT), CAST(r AS BIGINT) FROM sel{s}"
        for s in range(1, k)
    ]
    sql = "\n".join(parts)
    # strip the trailing comma of the last CTE
    sql = sql.rstrip().rstrip(",")
    return sql + "\n" + "\nUNION ALL\n".join(selects)


register("kcenter_coreset", q_kcenter_coreset, _oracle_kcenter(K_SELECT))
