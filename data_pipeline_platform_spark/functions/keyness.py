"""Corpus keyness analysis (extension; no reference counterpart — the
reference has no text ops, see SURVEY.md §2.11).

Two standard corpus-linguistics diagnostics a curation pipeline runs
before mixing data sources:

- ``zipf_fit``: OLS fit of ln(frequency) against ln(rank) over the
  top-K token census — the Zipf exponent. A natural-language corpus
  sits near slope -1; a slope far from it (or one that drifts between
  snapshots) flags boilerplate floods, template spam, or tokenizer
  breakage before they reach training.
- ``keyness_dunning``: Dunning (1993) log-likelihood G² keyness of the
  target subcorpus (lang = TARGET_LANG) against the rest — the tokens
  whose frequencies most distinguish the slice. The screen that
  answers "what is actually different about this source" when
  deciding mixture weights.

Scale shape (both):

- ONE token-keyed census shuffle over the corpus (map-side
  combinable); everything downstream is vocab-bounded or smaller;
- ``zipf_fit`` bounds the fit frame with TakeOrderedAndProject
  (orderBy + limit TOP_K) BEFORE its rank window, so the only
  unpartitioned window runs over <= TOP_K rows — constant at any
  corpus scale (the plan-gate's GlobalLimit bounding rule);
- ``keyness_dunning`` is census + broadcast 1-row totals + row-local
  G² arithmetic + TakeOrderedAndProject top-N. No window at all.

Determinism: ln() enters through the shared fixed-point convention
(see ``repetition.py``) — per-term contributions round to integers
coarse enough that a 1-ulp Math.log-vs-libm divergence cannot flip
the rounding. ``zipf_fit``'s regression runs entirely on exact BIGINT
sums of those fixed-point values (all magnitudes < 2^53, so the final
double division is exact-input IEEE and bitwise-stable across
engines); the scale factor cancels in the slope and is divided back
out of the intercept. ``keyness_dunning`` orders by the fixed-point
integer score with a token tiebreak, so the top-N cut is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register

TOP_K = 1000  # zipf: fit on the census head (the Zipf regime)
_ZIPF_S = 1000  # fixed-point scale for ln(rank), ln(freq)

TARGET_LANG = "en"
MIN_TOTAL = 20  # keyness: tokens rarer than this carry no stable G²
TOP_N = 50
_G2_S = 1_000_000  # fixed-point scale for the G² score


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_terms, slope, intercept) of the ln-ln OLS fit over
    the TOP_K most frequent tokens (count desc, token asc tiebreak)."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            F.split(F.trim("text"), r"\s+").alias("toks")
        )
    )
    census = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # TakeOrderedAndProject bounds the frame BEFORE the rank window
    top = census.orderBy(F.desc("c"), "tok").limit(TOP_K)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok")))
    )
    fp = ranked.select(
        F.expr(
            f"CAST(round(ln(CAST(r AS DOUBLE)) * {_ZIPF_S}) AS BIGINT)"
        ).alias("x"),
        F.expr(
            f"CAST(round(ln(CAST(c AS DOUBLE)) * {_ZIPF_S}) AS BIGINT)"
        ).alias("y"),
    )
    sums = fp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    # slope is scale-invariant (x and y share _ZIPF_S); intercept needs
    # one divide-back. All integer terms < 2^53 -> exact doubles.
    return sums.select(
        F.col("n").alias("n_terms"),
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
        ).alias("slope"),
        F.expr(
            "(CAST(sy AS DOUBLE) / n - (CAST(n * sxy - sx * sy AS DOUBLE) /"
            " CAST(n * sxx - sx * sx AS DOUBLE)) * (CAST(sx AS DOUBLE) / n))"
            f" / {_ZIPF_S}"
        ).alias("intercept"),
    )


ORACLE_ZIPF_FIT = f"""
WITH census AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents)
  GROUP BY 1
), top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
  FROM census ORDER BY c DESC, tok LIMIT {TOP_K}
), fp AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * {_ZIPF_S}) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * {_ZIPF_S}) AS BIGINT) AS y
  FROM top
), sums AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM fp
)
SELECT n AS n_terms,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope,
       (CAST(sy AS DOUBLE) / n - (CAST(n * sxy - sx * sy AS DOUBLE) /
        CAST(n * sxx - sx * sx AS DOUBLE)) * (CAST(sx AS DOUBLE) / n))
         / {_ZIPF_S} AS intercept
FROM sums
"""

register("zipf_fit", q_zipf_fit, ORACLE_ZIPF_FIT)


# Dunning G² per token, shared verbatim by both engines. a/b are the
# target/reference counts, n1/n2 the subcorpus token totals; expected
# counts under the pooled rate are e_i = n_i * (a+b) / (n1+n2). Zero
# cells contribute zero (lim x->0 of x ln x).
_G2_EXPR = (
    "CAST(round(2.0 * ("
    "  CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) /"
    "    (CAST(n1 AS DOUBLE) * (a + b) / (n1 + n2))) ELSE 0.0 END"
    "  + CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE) /"
    "    (CAST(n2 AS DOUBLE) * (a + b) / (n1 + n2))) ELSE 0.0 END"
    f") * {_G2_S}) AS BIGINT)"
)

# exact integer cross-product test for enrichment direction: a/n1 >
# b/n2 <=> a*n2 > b*n1, evaluated in DECIMAL(38,0) so it stays exact
# past BIGINT range at corpus scale
_DIR_EXPR = (
    "CASE WHEN CAST(a AS DECIMAL(38,0)) * n2 > CAST(b AS DECIMAL(38,0)) * n1"
    " THEN 'target' ELSE 'reference' END"
)


def q_keyness_dunning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N tokens by Dunning G² between lang=TARGET_LANG and the rest:
    (tok, cnt_target, cnt_reference, g2, enriched_in)."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            (F.col("lang") == TARGET_LANG).alias("is_t"),
            F.split(F.trim("text"), r"\s+").alias("toks"),
        )
    )
    census = (
        docs.select("is_t", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.expr("CASE WHEN is_t THEN 1 ELSE 0 END")).alias("a"),
            F.sum(F.expr("CASE WHEN is_t THEN 0 ELSE 1 END")).alias("b"),
        )
    )
    totals = census.agg(
        F.sum("a").alias("n1"), F.sum("b").alias("n2")
    )
    scored = (
        census.filter(F.expr(f"a + b >= {MIN_TOTAL}"))
        .crossJoin(F.broadcast(totals))
        .select(
            "tok",
            "a",
            "b",
            F.expr(_G2_EXPR).alias("g2_fp"),
            F.expr(_DIR_EXPR).alias("enriched_in"),
        )
    )
    return (
        scored.orderBy(F.desc("g2_fp"), "tok")
        .limit(TOP_N)
        .select(
            "tok",
            F.col("a").alias("cnt_target"),
            F.col("b").alias("cnt_reference"),
            F.expr(f"CAST(g2_fp AS DOUBLE) / {_G2_S}").alias("g2"),
            "enriched_in",
        )
    )


ORACLE_KEYNESS_DUNNING = f"""
WITH census AS (
  SELECT tok,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS b
  FROM (SELECT lang = '{TARGET_LANG}' AS is_t,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents)
  GROUP BY 1
), totals AS (
  SELECT SUM(a) AS n1, SUM(b) AS n2 FROM census
), scored AS (
  SELECT tok, a, b,
         {_G2_EXPR} AS g2_fp,
         {_DIR_EXPR} AS enriched_in
  FROM census, totals
  WHERE a + b >= {MIN_TOTAL}
)
SELECT tok, a AS cnt_target, b AS cnt_reference,
       CAST(g2_fp AS DOUBLE) / {_G2_S} AS g2, enriched_in
FROM scored
ORDER BY g2_fp DESC, tok
LIMIT {TOP_N}
"""

register("keyness_dunning", q_keyness_dunning, ORACLE_KEYNESS_DUNNING)
