"""Distributed exact-moment regression (extension; no reference
counterpart — SURVEY.md §2.11).

`feature_correlations` fits, for each document-quality feature, the
one-variable least-squares line against the corpus LM's fluency score
(mean unigram log-probability) and reports slope / intercept /
Pearson r — the screening pass that tells a curation owner WHICH cheap
row-local features actually track the expensive fluency signal before
they train a fasttext-style gate on them.

Determinism: both variables quantize to 1e-6 fixed point; all five
moment sums are exact (BIGINT / DECIMAL(38,0) — the HUGEINT twin on
the DuckDB side); the closed-form estimators divide exact integers in
ONE fixed expression shape per engine and round to 6dp. The only
fact-sized work is the stats/fluency join (doc-keyed); per-feature
moments are a map-side-combinable 3-group aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.repetition import (
    ORACLE_UNIGRAM_LOGPROB,
    q_unigram_logprob,
)
from data_pipeline_platform_spark.functions.text import (
    ORACLE_TEXT_STATS,
    q_text_stats,
)

_FP = 1_000_000
_FEATURES = ("token_count", "type_token_ratio", "stopword_ratio")


def q_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(feature, n, slope, intercept, pearson_r) of each quality
    feature against mean unigram log-probability."""
    stats = q_text_stats(spark, sf_dir).select(
        "doc_id", "token_count", "type_token_ratio", "stopword_ratio"
    )
    flu = q_unigram_logprob(spark, sf_dir).select(
        "doc_id", F.expr(f"CAST(round(mean_logprob * {_FP}) AS BIGINT)").alias("y_fp")
    )
    pairs_expr = ", ".join(
        f"named_struct('feature', '{f}', "
        f"'x_fp', CAST(round({f} * {_FP}) AS BIGINT))"
        for f in _FEATURES
    )
    exploded = (
        stats.join(flu, "doc_id")
        .select(F.explode(F.expr(f"array({pairs_expr})")).alias("p"), "y_fp")
        .select("p.feature", "p.x_fp", "y_fp")
    )
    sums = exploded.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_fp").alias("sx"),
        F.sum("y_fp").alias("sy"),
        F.sum(F.expr("CAST(x_fp AS DECIMAL(38,0)) * x_fp")).alias("sxx"),
        F.sum(F.expr("CAST(y_fp AS DECIMAL(38,0)) * y_fp")).alias("syy"),
        F.sum(F.expr("CAST(x_fp AS DECIMAL(38,0)) * y_fp")).alias("sxy"),
    )
    return sums.select(
        "feature",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "round(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) "
            "/ CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE), 6)"
        ).alias("slope"),
        F.expr(
            f"round((CAST(sy AS DOUBLE) / n "
            f"- CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) "
            f"/ CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) "
            f"* (CAST(sx AS DOUBLE) / n)) / {_FP}, 6)"
        ).alias("intercept"),
        F.expr(
            "round(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) "
            "/ sqrt(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) "
            "* CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)), 6)"
        ).alias("pearson_r"),
    )


_DUCK_MOMENT_FORMULAS = """
SELECT feature, CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       round((CAST(sy AS DOUBLE) / n
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * (CAST(sx AS DOUBLE) / n)) / 1000000.0, 6) AS intercept,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
FROM sums
"""

ORACLE_FEATURE_CORRELATIONS = f"""
WITH ts AS MATERIALIZED ({ORACLE_TEXT_STATS}),
ul AS MATERIALIZED ({ORACLE_UNIGRAM_LOGPROB}),
j AS (
  SELECT ts.doc_id, ts.token_count, ts.type_token_ratio, ts.stopword_ratio,
         CAST(round(ul.mean_logprob * {_FP}) AS BIGINT) AS y_fp
  FROM ts JOIN ul USING (doc_id)
), unp AS (
  {" UNION ALL ".join(
    f"SELECT '{f}' AS feature, CAST(round({f} * {_FP}) AS BIGINT) AS x_fp, y_fp FROM j"
    for f in _FEATURES)}
), sums AS (
  SELECT feature, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x_fp AS HUGEINT)) AS sx,
         SUM(CAST(y_fp AS HUGEINT)) AS sy,
         SUM(CAST(x_fp AS HUGEINT) * x_fp) AS sxx,
         SUM(CAST(y_fp AS HUGEINT) * y_fp) AS syy,
         SUM(CAST(x_fp AS HUGEINT) * y_fp) AS sxy
  FROM unp GROUP BY 1
)
{_DUCK_MOMENT_FORMULAS}
"""

register("feature_correlations", q_feature_correlations, ORACLE_FEATURE_CORRELATIONS)


_CAL_QS = tuple(round(0.1 * i, 1) for i in range(1, 10))


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of the hashed linear classifier against the
    rule-based Gopher gate: bucket documents into classifier-score
    deciles (exact-percentile boundaries broadcast — the rfm_segments
    posture, no global NTILE) and report each decile's gate pass rate.
    A monotone curve means the cheap classifier ranks documents the
    way the expensive rules do; a flat one means it learned nothing
    the gate cares about.

    Shape: both inputs ride their own single-pass plans; the decile
    assignment is a row-local comparison chain against 9 broadcast
    scalars; one 10-group aggregation ends it."""
    from data_pipeline_platform_spark.functions.repetition import (
        q_gopher_quality_filter,
    )
    from data_pipeline_platform_spark.functions.text import q_quality_classifier

    cls = q_quality_classifier(spark, sf_dir).select("doc_id", "score")
    gate = q_gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    j = cls.join(gate, "doc_id")
    qlist = ", ".join(str(q) for q in _CAL_QS)
    bounds = j.agg(F.expr(f"percentile(score, array({qlist}))").alias("qb"))
    exceed = " + ".join(
        f"CAST(score > element_at(qb, {i + 1}) AS INT)" for i in range(len(_CAL_QS))
    )
    return (
        j.crossJoin(F.broadcast(bounds))
        .withColumn("decile", F.expr(f"1 + ({exceed})"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6)").alias(
                "mean_score"
            ),
            F.expr(
                "round(CAST(SUM(CAST(keep AS INT)) AS DOUBLE) / COUNT(*), 6)"
            ).alias("gate_pass_rate"),
        )
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_docs",
            "mean_score",
            "gate_pass_rate",
        )
    )


def _oracle_score_calibration() -> str:
    from data_pipeline_platform_spark.functions.repetition import (
        ORACLE_GOPHER_QUALITY_FILTER,
    )
    from data_pipeline_platform_spark.functions.text import (
        ORACLE_QUALITY_CLASSIFIER,
    )

    qlist = ", ".join(str(q) for q in _CAL_QS)
    exceed = " + ".join(
        f"CAST(score > qb[{i + 1}] AS INT)" for i in range(len(_CAL_QS))
    )
    return f"""
WITH cls AS MATERIALIZED ({ORACLE_QUALITY_CLASSIFIER}),
gate AS MATERIALIZED ({ORACLE_GOPHER_QUALITY_FILTER}),
j AS (
  SELECT c.doc_id, c.score, g.keep FROM cls c JOIN gate g USING (doc_id)
), bounds AS (
  SELECT quantile_cont(score, [{qlist}]) AS qb FROM j
)
SELECT CAST(1 + ({exceed}) AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS mean_score,
       round(CAST(SUM(CAST(keep AS INT)) AS DOUBLE) / COUNT(*), 6)
         AS gate_pass_rate
FROM j, bounds
GROUP BY 1
"""


ORACLE_SCORE_CALIBRATION = _oracle_score_calibration()

register("score_calibration", q_score_calibration, ORACLE_SCORE_CALIBRATION)
