"""Label-noise detection over the embeddings table (extension; the
dataset-cleaning counterpart of `knn_classify` — find examples whose
LABEL disagrees with their neighborhood, the core signal behind
confident-learning / cleanlab-style label-error screens).

For each probe vector: its k exact nearest neighbors (fixed-point
squared L2 — the package's argmin-stable kernel), the count that carry a
DIFFERENT label, and a `suspected` flag when the disagreement clears a
threshold.  A clean corpus flags ~nothing; a mislabeled point sits in a
homogeneous region of the other label and flags at k-of-k.

Scale shape: the graded query screens a deterministic PROBE SAMPLE
(vec_id % 17 == 0) rather than all points — the honest 100 TB posture
for a diagnostic (screening everything exactly is a self-join; the
bounded-candidate path for full coverage is the IVF cell structure
`knn_classify` already demonstrates, with identical semantics per
probe).  Probes broadcast; one corpus scan computes all probe-neighbor
distances; per-probe ranking partitions by probe id (keyed window, never
global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.similarity import (
    _as_double,
    _dist_fp_sql,
    _duck_dist_fp,
)

K_NEIGHBORS = 5
SUSPECT_AT = 4  # >= 4 of 5 neighbors disagreeing flags the label
PROBE_MOD = 17


def label_disagreement(
    emb: DataFrame,
    probes: DataFrame,
    k: int = K_NEIGHBORS,
    suspect_at: int = SUSPECT_AT,
) -> DataFrame:
    """(vec_id, label, n_diff, suspected) for every probe row; both
    inputs need (vec_id, label, vec array<double>)."""
    p = probes.select(
        F.col("vec_id").alias("p_id"),
        F.col("label").alias("p_label"),
        F.col("vec").alias("p_vec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("p_id"))
        .withColumn("d", F.expr(_dist_fp_sql("vec", "p_vec")))
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p_id").orderBy(F.col("d"), F.col("vec_id"))
        ),
    ).filter(F.col("rn") <= k)
    return (
        ranked.groupBy("p_id", "p_label")
        .agg(
            F.sum((F.col("label") != F.col("p_label")).cast("bigint")).alias("n_diff")
        )
        .select(
            F.col("p_id").alias("vec_id"),
            F.col("p_label").alias("label"),
            "n_diff",
            (F.col("n_diff") >= suspect_at).alias("suspected"),
        )
    )


def q_label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    emb = spread_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0)
    return label_disagreement(emb, probes)


ORACLE_LABEL_NOISE_SCREEN = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), probes AS (
  SELECT vec_id AS p_id, label AS p_label, vec AS p_vec
  FROM base WHERE vec_id % {PROBE_MOD} = 0
), scored AS (
  SELECT p.p_id, p.p_label, b.vec_id, b.label,
         {_duck_dist_fp("b.vec", "p.p_vec")} AS d
  FROM base b CROSS JOIN probes p
  WHERE b.vec_id <> p.p_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY d, vec_id) AS rn
  FROM scored
)
SELECT p_id AS vec_id, p_label AS label,
       CAST(SUM(CASE WHEN label <> p_label THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
       SUM(CASE WHEN label <> p_label THEN 1 ELSE 0 END) >= {SUSPECT_AT} AS suspected
FROM ranked
WHERE rn <= {K_NEIGHBORS}
GROUP BY p_id, p_label
"""


register("label_noise_screen", q_label_noise_screen, ORACLE_LABEL_NOISE_SCREEN)
