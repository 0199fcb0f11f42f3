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


_CONF_ALPHA = 0.1  # 90% target coverage


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al. 2018) for
    order value from a per-segment mean predictor: the distribution-free
    calibration every deployed regression needs.

    Split: content-addressed md5(o_orderkey) halves (cal = hex 0-7,
    test = 8-f). Predictor: rounded per-segment calibration mean
    (any predictor keeps conformal validity). q_hat is the EXACT
    k = ceil((n_cal+1)*(1-alpha))-th order statistic of the integer
    cent nonconformity scores, found by TWO-LEVEL distributed
    selection: a dollar-bin census narrows k to one bin, then a cent
    census inside that bin alone — the ordered windows span
    |price range|/100 and <= 100 rows, never the fact table or the
    full cent domain. Output: one audit row with q_hat and realized
    test coverage (>= 1-alpha in expectation).
    """
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            (
                F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1), 16, 10)
                .cast("bigint")
                < 8
            ).alias("is_cal"),
        )
    )
    pred = (
        base.filter("is_cal")
        .groupBy("c_mktsegment")
        .agg(
            F.expr("CAST(round(CAST(SUM(cents) AS DOUBLE) / COUNT(*)) AS BIGINT)").alias(
                "pred_cents"
            )
        )
    )
    scored = base.join(F.broadcast(pred), "c_mktsegment").withColumn(
        "score", F.abs(F.col("cents") - F.col("pred_cents"))
    )
    cal = scored.filter("is_cal")
    kf = F.broadcast(
        cal.agg(
            F.expr(
                f"CAST(ceil((COUNT(*) + 1) * {1.0 - _CONF_ALPHA}) AS BIGINT)"
            ).alias("k")
        )
    )
    # two-level exact selection (distributed k-th order statistic):
    # a dollar-bin census narrows k to ONE dollar bin, then the cent
    # census runs inside that bin only — the ordered windows span
    # |price range|/100 and <= 100 rows respectively, never the
    # cent-domain (or fact-table) width
    wd = Window.orderBy("dollar").rowsBetween(Window.unboundedPreceding, 0)
    dollar = (
        cal.groupBy(F.expr("score DIV 100").alias("dollar"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(wd))
        .crossJoin(kf)
    )
    sel = F.broadcast(
        dollar.filter(F.col("cum") >= F.col("k")).agg(
            F.min("dollar").alias("bin"), F.max("k").alias("k")
        )
    )
    # rank consumed by bins strictly below the target (bins are sparse,
    # so "the previous bin" is a max-below, not bin - 1)
    before = dollar.join(sel, F.col("dollar") < F.col("bin")).agg(
        F.coalesce(F.max("cum"), F.lit(0)).alias("cum_before")
    )
    target_bin = F.broadcast(
        sel.crossJoin(F.broadcast(before)).select(
            "bin", (F.col("k") - F.col("cum_before")).alias("k_in")
        )
    )
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    q_hat = (
        cal.join(target_bin, F.expr("score DIV 100 = bin"))
        .groupBy("score", "k_in")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(wc))
        .filter(F.col("cum") >= F.col("k_in"))
        .agg(F.min("score").alias("q_hat_cents"))
    )
    test = scored.filter("NOT is_cal").crossJoin(F.broadcast(q_hat))
    return test.agg(
        F.max("q_hat_cents").alias("q_hat_cents"),
        F.count(F.lit(1)).alias("n_test"),
        (
            F.sum((F.col("score") <= F.col("q_hat_cents")).cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("coverage"),
        F.lit(1.0 - _CONF_ALPHA).alias("target"),
    )


ORACLE_CONFORMAL_INTERVAL = f"""
WITH base AS (
  SELECT o.o_orderkey, c.c_mktsegment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
         ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 1))::BIGINT < 8
           AS is_cal
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), pred AS (
  SELECT c_mktsegment,
         CAST(round(CAST(SUM(cents) AS DOUBLE) / COUNT(*)) AS BIGINT) AS pred_cents
  FROM base WHERE is_cal GROUP BY 1
), scored AS (
  SELECT b.*, ABS(b.cents - p.pred_cents) AS score
  FROM base b JOIN pred p USING (c_mktsegment)
), kval AS (
  SELECT CAST(ceil((COUNT(*) + 1) * {1.0 - _CONF_ALPHA}) AS BIGINT) AS k
  FROM scored WHERE is_cal
), dollar AS (
  SELECT score // 100 AS dollar, COUNT(*) AS c FROM scored WHERE is_cal GROUP BY 1
), dranked AS (
  SELECT dollar,
         SUM(c) OVER (ORDER BY dollar
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dollar
), sel AS (
  SELECT MIN(dollar) AS bin, MAX(k) AS k FROM dranked, kval WHERE cum >= k
), before AS (
  SELECT COALESCE(MAX(d.cum), 0) AS cum_before
  FROM dranked d, sel WHERE d.dollar < sel.bin
), target_bin AS (
  SELECT sel.bin, sel.k - before.cum_before AS k_in FROM sel, before
), cent AS (
  SELECT s.score, t.k_in, COUNT(*) AS c
  FROM scored s, target_bin t
  WHERE s.is_cal AND s.score // 100 = t.bin
  GROUP BY 1, 2
), cranked AS (
  SELECT score, k_in,
         SUM(c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM cent
), qh AS (
  SELECT MIN(score) AS q_hat_cents FROM cranked WHERE cum >= k_in
)
SELECT MAX(qh.q_hat_cents) AS q_hat_cents,
       COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN s.score <= qh.q_hat_cents THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS coverage,
       {1.0 - _CONF_ALPHA} AS target
FROM scored s, qh WHERE NOT s.is_cal
"""

register("conformal_interval", q_conformal_interval, ORACLE_CONFORMAL_INTERVAL)
