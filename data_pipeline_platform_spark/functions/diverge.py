"""Distribution-shift and calibration diagnostics (extension; no
reference counterpart — the reference has no analytics ops, see
SURVEY.md §2.11).

- ``js_divergence_sources``: Jensen-Shannon divergence between each
  source's unigram token distribution and the REST of the corpus —
  the mixture-weights dashboard ("which provider drifted?") that
  complements DSIR/DoReMi importance weighting. JSD is symmetric and
  bounded by ln 2, so scores are comparable across sources.
- ``calibration_returns``: reliability diagram + expected calibration
  error (ECE) for a quantity-derived return-probability score — the
  eval that ``roc_auc_returns``/``pr_curve_returns`` don't give
  (ranking quality != probability quality).

Scale shape:

- ``js_divergence_sources``: ONE (source, token)-keyed census shuffle
  over the corpus; the token-marginal census derives from it by a
  second vocab-sized agg; the join back is token-keyed (co-located at
  100 TB by the same key), totals are a 1-row broadcast, and the
  output is |sources| rows. Never a per-row rank or window.
- ``calibration_returns``: one groupBy on the VALUE-DOMAIN-bounded
  quantity bin (50 bins); ECE folds over the 50-row census.

Determinism: JSD per-token contributions round on the 1e12 grid
AFTER the ln (the round-after-ln idiom — absolute contributions are
<= ln 2 so a 1-ulp libm divergence sits ~1e-8 rounding units below
the grid), making the per-source sum an order-free exact BIGINT; the
absent-token residual mass is an exact integer ratio times one
ln(2) evaluation, rounded on the same grid. ``calibration_returns``
needs NO transcendental at all: |rate - pred| = |50*pos - bin*n| /
(50*n) is exact rational arithmetic, so ECE = sum(|50*pos_b -
bin*n_b|) / (50*N) is an exact integer sum with ONE closing IEEE
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.utils.cache import tracked_persist

_JSD_S = 1_000_000_000_000  # 1e12 fixed-point grid for ln contributions

# per-(source-present) token JSD contribution, shared verbatim by both
# engines. p = a/ns (source rate), q = b/nr (rest rate); m = (p+q)/2.
# a > 0 on every joined row; the b = 0 branch drops the q term (x ln x
# -> 0). ln(2p/(p+q)) form avoids computing m separately.
_JSD_TERM = (
    "CAST(round(("
    "  (CAST(a AS DOUBLE) / ns) * ln(2.0 * (CAST(a AS DOUBLE) / ns) /"
    "    (CAST(a AS DOUBLE) / ns + CAST(b AS DOUBLE) / nr))"
    "  + CASE WHEN b > 0 THEN (CAST(b AS DOUBLE) / nr) * ln(2.0 *"
    "      (CAST(b AS DOUBLE) / nr) /"
    "      (CAST(a AS DOUBLE) / ns + CAST(b AS DOUBLE) / nr)) ELSE 0.0 END"
    f") * {_JSD_S}) AS BIGINT)"
)


def q_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, jsd) per source vs the rest of the corpus;
    jsd in nats, 0 <= jsd <= ln 2."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            "source", F.split(F.trim("text"), r"\s+").alias("toks")
        )
    )
    # ONE fact-sized shuffle: the (source, token) census
    st = (
        docs.select("source", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    st = tracked_persist(st)
    tok_tot = st.groupBy("tok").agg(F.sum("a").alias("ct"))
    src_tot = st.groupBy("source").agg(F.sum("a").alias("ns"))
    grand = src_tot.agg(F.sum("ns").alias("n"))
    joined = (
        st.join(tok_tot, "tok")  # token-keyed, co-located with the census
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "a",
            F.expr("ct - a").alias("b"),
            "ns",
            F.expr("n - ns").alias("nr"),
        )
    )
    per_src = joined.groupBy("source", "ns", "nr").agg(
        F.sum(F.expr(_JSD_TERM)).alias("present_fp"),
        F.sum("b").alias("covered_b"),
    )
    # tokens ABSENT from the source: p = 0, so each contributes
    # q * ln 2; their total rest-mass is (nr - covered_b) / nr exactly.
    return per_src.select(
        "source",
        F.col("ns").alias("n_tokens"),
        F.expr(
            "CAST(present_fp + CAST(round((CAST(nr - covered_b AS DOUBLE) / nr)"
            f" * ln(2.0) * {_JSD_S}) AS BIGINT) AS DOUBLE) / {_JSD_S} / 2.0"
        ).alias("jsd"),
    )


ORACLE_JS_DIVERGENCE_SOURCES = f"""
WITH st AS MATERIALIZED (
  SELECT source, tok, COUNT(*) AS a
  FROM (SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents)
  GROUP BY 1, 2
), tok_tot AS (SELECT tok, SUM(a) AS ct FROM st GROUP BY 1),
src_tot AS (SELECT source, SUM(a) AS ns FROM st GROUP BY 1),
grand AS (SELECT SUM(ns) AS n FROM src_tot),
joined AS (
  SELECT st.source, st.a, tok_tot.ct - st.a AS b,
         src_tot.ns, grand.n - src_tot.ns AS nr
  FROM st
  JOIN tok_tot USING (tok)
  JOIN src_tot USING (source), grand
), per_src AS (
  SELECT source, ns, nr,
         SUM({_JSD_TERM}) AS present_fp,
         SUM(b) AS covered_b
  FROM joined GROUP BY 1, 2, 3
)
SELECT source, ns AS n_tokens,
       CAST(present_fp + CAST(round((CAST(nr - covered_b AS DOUBLE) / nr)
         * ln(2.0) * {_JSD_S}) AS BIGINT) AS DOUBLE) / {_JSD_S} / 2.0 AS jsd
FROM per_src
"""

register("js_divergence_sources", q_js_divergence_sources, ORACLE_JS_DIVERGENCE_SOURCES)


def q_calibration_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for pred = l_quantity / 50 as the return
    probability: (bin, pred_prob, n, n_pos, actual_rate, ece). ECE is
    identical on every row (the diagram's scalar summary); quantity's
    1..50 integer domain is the binning, so the census is bounded by
    the VALUE DOMAIN regardless of corpus size."""
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    census = li.groupBy(
        F.expr("CAST(l_quantity AS BIGINT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_pos"),
    )
    totals = census.agg(
        F.sum("n").alias("nt"),
        # exact integer calibration-gap mass: |50*pos_b - bin*n_b|
        F.sum(F.expr("abs(50 * n_pos - bin * n)")).alias("gap"),
    )
    return census.crossJoin(F.broadcast(totals)).select(
        "bin",
        F.expr("CAST(bin AS DOUBLE) / 50").alias("pred_prob"),
        "n",
        "n_pos",
        F.expr("CAST(n_pos AS DOUBLE) / n").alias("actual_rate"),
        F.expr("CAST(gap AS DOUBLE) / (50 * nt)").alias("ece"),
    )


ORACLE_CALIBRATION_RETURNS = """
WITH census AS (
  SELECT CAST(l_quantity AS BIGINT) AS bin, COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_pos
  FROM lineitem GROUP BY 1
), totals AS (
  SELECT SUM(n) AS nt, SUM(abs(50 * n_pos - bin * n)) AS gap FROM census
)
SELECT bin, CAST(bin AS DOUBLE) / 50 AS pred_prob, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS actual_rate,
       CAST(gap AS DOUBLE) / (50 * nt) AS ece
FROM census, totals
"""

register("calibration_returns", q_calibration_returns, ORACLE_CALIBRATION_RETURNS)
