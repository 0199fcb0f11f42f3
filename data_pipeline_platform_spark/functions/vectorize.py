"""Feature-hashing (hashing-trick) vectorizer (extension; no reference
counterpart — SURVEY.md §2.11): signed hashed bag-of-words per document
(Weinberger et al. 2009), the vectorizer that needs NO vocabulary
build, no broadcast dictionary, and no second pass — the only BoW
representation that survives an unbounded vocabulary at 100 TB.

Bucket and sign both derive from md5(token): bucket = u16 % N_BUCKETS,
sign = +1/-1 from the parity of the 5th hex nibble (the signed trick
that makes collisions cancel in expectation instead of biasing up).

Output is the LONG form (doc_id, bucket, weight) with zero entries
absent — the sparse layout downstream joins actually want; densifying
to arrays is a row-local collect_list away. Shape: one explode + one
map-side-combinable groupBy; everything else is row-local hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

N_BUCKETS = 16


def q_hashed_bow_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashed BoW of the first 100 documents (bounded output
    grain for grading; the plan is identical unbounded): (doc_id,
    bucket, weight, n_terms) rows, weight = sum of signs, n_terms =
    collision census of the bucket."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(r"split(trim(text), '\\s+')")).alias("token"),
    )
    hashed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("bigint")
            % N_BUCKETS
        ).alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5("token"), 5, 1), 16, 10).cast("bigint") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(
            F.sum("sign").cast("bigint").alias("weight"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .filter(F.col("weight") != 0)
    )


ORACLE_HASHED_BOW_VECTORS = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents WHERE doc_id < 100
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 4))::BIGINT % {N_BUCKETS} AS bucket,
         CASE WHEN ('0x' || substr(md5(token), 5, 1))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT doc_id, bucket,
       CAST(SUM(sign) AS BIGINT) AS weight,
       COUNT(*) AS n_terms
FROM hashed GROUP BY 1, 2
HAVING CAST(SUM(sign) AS BIGINT) <> 0
"""


register("hashed_bow_vectors", q_hashed_bow_vectors, ORACLE_HASHED_BOW_VECTORS)


def q_woe_iv_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value encoding of the order
    priority against the "order had a returned item" outcome — the
    standard supervised categorical encoder (credit-scoring lineage)
    for turning high-cardinality categories into monotone risk scores
    before model training.

    Determinism: all counts are exact; the odds cross-products
    good_i*badT and bad_i*goodT evaluate in DECIMAL(38,0) (the
    keyness.py idiom — raw BIGINT would wrap silently in non-ANSI
    Spark beyond ~9.2e18 while DuckDB errors), the ratio feeding ln()
    is one double division, ln applied per output row and rounded to
    6 dp (the round-after-transcendental rule); the IV term reuses
    the ROUNDED woe so both engines multiply identical doubles.

    Scale: label derivation is a semi-join shape (distinct returned
    orderkeys onto orders), the encoder itself is one groupBy over the
    category — bin stats are category-bounded, totals a broadcast
    1-row frame."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("is_bad", F.lit(1))
    )
    labeled = orders.join(returned, "o_orderkey", "left").select(
        "o_orderpriority", F.coalesce("is_bad", F.lit(0)).alias("is_bad")
    )
    bins = labeled.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.sum(F.expr("1 - is_bad")).alias("n_good"),
        F.sum("is_bad").alias("n_bad"),
    )
    tot = bins.agg(
        F.sum("n_good").alias("good_t"), F.sum("n_bad").alias("bad_t")
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .withColumn(
            "woe",
            F.expr(
                "CASE WHEN n_good > 0 AND n_bad > 0 THEN "
                "round(ln(CAST(CAST(n_good AS DECIMAL(38,0)) * bad_t AS DOUBLE)"
                " / CAST(CAST(n_bad AS DECIMAL(38,0)) * good_t AS DOUBLE)), 6) "
                "END"
            ),
        )
        .select(
            "priority",
            "n_good",
            "n_bad",
            "woe",
            F.expr(
                "round((CAST(n_good AS DOUBLE) / good_t"
                " - CAST(n_bad AS DOUBLE) / bad_t) * woe, 6)"
            ).alias("iv_term"),
        )
    )


ORACLE_WOE_IV_PRIORITY = """
WITH labeled AS (
  SELECT o.o_orderpriority,
         CASE WHEN r.o_orderkey IS NULL THEN 0 ELSE 1 END AS is_bad
  FROM orders o
  LEFT JOIN (SELECT DISTINCT l_orderkey AS o_orderkey
             FROM lineitem WHERE l_returnflag = 'R') r
    ON o.o_orderkey = r.o_orderkey
), bins AS (
  SELECT o_orderpriority AS priority,
         SUM(1 - is_bad) AS n_good,
         SUM(is_bad) AS n_bad
  FROM labeled GROUP BY 1
), tot AS (
  SELECT SUM(n_good) AS good_t, SUM(n_bad) AS bad_t FROM bins
), woed AS (
  SELECT b.priority, b.n_good, b.n_bad, t.good_t, t.bad_t,
         CASE WHEN b.n_good > 0 AND b.n_bad > 0 THEN
           round(ln(CAST(CAST(b.n_good AS DECIMAL(38,0)) * t.bad_t AS DOUBLE)
                    / CAST(CAST(b.n_bad AS DECIMAL(38,0)) * t.good_t AS DOUBLE)), 6)
         END AS woe
  FROM bins b, tot t
)
SELECT priority, n_good, n_bad, woe,
       round((CAST(n_good AS DOUBLE) / good_t
              - CAST(n_bad AS DOUBLE) / bad_t) * woe, 6) AS iv_term
FROM woed
"""


register("woe_iv_priority", q_woe_iv_priority, ORACLE_WOE_IV_PRIORITY)


STUMP_BIN_CENTS = 10_000  # 100-dollar candidate-split grid


def q_decision_stump_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single split of order price predicting "order had a
    returned item" by information gain — the decision-stump / tree-node
    primitive. The distributed-training shape: candidate splits live on
    a VALUE-DOMAIN-bounded bin census (100-dollar grid over the price
    domain), so finding the best split is one fact pass + a census
    cumulative — exactly how large-scale tree learners (XGBoost-style
    histogram split finding) evaluate thresholds at 100 TB.

    Determinism: bin counts and cumulative good/bad are exact BIGINTs
    (ordered window over the bin census only); each candidate's gain is
    computed from those integers with an IDENTICAL double expression in
    both engines (ln per candidate — round-after-transcendental),
    rounded to 6 dp, argmax tie-broken on the smaller threshold."""
    from pyspark.sql import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("is_bad", F.lit(1))
    )
    labeled = orders.join(returned, "o_orderkey", "left").select(
        F.expr(
            f"CAST(round(o_totalprice * 100) AS BIGINT) div {STUMP_BIN_CENTS}"
        ).alias("bin"),
        F.coalesce("is_bad", F.lit(0)).alias("is_bad"),
    )
    census = labeled.groupBy("bin").agg(
        F.sum(F.expr("1 - is_bad")).alias("g"), F.sum("is_bad").alias("b")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = census.agg(F.sum("g").alias("gt"), F.sum("b").alias("bt"))
    cum = (
        census.withColumn("gl", F.sum("g").over(w))
        .withColumn("bl", F.sum("b").over(w))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("gl") + F.col("bl") < F.col("gt") + F.col("bt"))
    )
    ent = (
        "CASE WHEN {x} > 0 AND {y} > 0 THEN "
        "-(CAST({x} AS DOUBLE) / ({x} + {y})) * ln(CAST({x} AS DOUBLE) / ({x} + {y}))"
        " - (CAST({y} AS DOUBLE) / ({x} + {y})) * ln(CAST({y} AS DOUBLE) / ({x} + {y}))"
        " ELSE CAST(0.0 AS DOUBLE) END"
    )
    gain_sql = (
        f"round({ent.format(x='gt', y='bt')}"
        f" - (CAST(gl + bl AS DOUBLE) / (gt + bt)) * ({ent.format(x='gl', y='bl')})"
        f" - (CAST(gt - gl + bt - bl AS DOUBLE) / (gt + bt))"
        f" * ({ent.format(x='(gt - gl)', y='(bt - bl)')}), 6)"
    )
    scored = cum.select(
        (F.expr(f"(bin + 1) * {STUMP_BIN_CENTS}") / 100.0).alias("threshold"),
        (F.col("gl") + F.col("bl")).alias("n_left"),
        (F.col("gt") - F.col("gl") + F.col("bt") - F.col("bl")).alias("n_right"),
        F.expr(gain_sql).alias("gain"),
    )
    return scored.orderBy(F.col("gain").desc(), "threshold").limit(1)


def _duck_ent(x: str, y: str) -> str:
    return (
        f"CASE WHEN {x} > 0 AND {y} > 0 THEN "
        f"-(CAST({x} AS DOUBLE) / ({x} + {y})) * ln(CAST({x} AS DOUBLE) / ({x} + {y}))"
        f" - (CAST({y} AS DOUBLE) / ({x} + {y})) * ln(CAST({y} AS DOUBLE) / ({x} + {y}))"
        f" ELSE CAST(0.0 AS DOUBLE) END"
    )


ORACLE_DECISION_STUMP_PRICE = f"""
WITH labeled AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) // {STUMP_BIN_CENTS} AS bin,
         CASE WHEN r.o_orderkey IS NULL THEN 0 ELSE 1 END AS is_bad
  FROM orders o
  LEFT JOIN (SELECT DISTINCT l_orderkey AS o_orderkey
             FROM lineitem WHERE l_returnflag = 'R') r
    ON o.o_orderkey = r.o_orderkey
), census AS (
  SELECT bin, SUM(1 - is_bad) AS g, SUM(is_bad) AS b FROM labeled GROUP BY 1
), tot AS (
  SELECT SUM(g) AS gt, SUM(b) AS bt FROM census
), cum AS (
  SELECT bin,
         SUM(g) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS gl,
         SUM(b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS bl,
         t.gt, t.bt
  FROM census, tot t
), cand AS (
  SELECT * FROM cum WHERE gl + bl < gt + bt
)
SELECT (bin + 1) * {STUMP_BIN_CENTS} / 100.0 AS threshold,
       CAST(gl + bl AS BIGINT) AS n_left,
       CAST(gt - gl + bt - bl AS BIGINT) AS n_right,
       round({_duck_ent('gt', 'bt')}
             - (CAST(gl + bl AS DOUBLE) / (gt + bt)) * ({_duck_ent('gl', 'bl')})
             - (CAST(gt - gl + bt - bl AS DOUBLE) / (gt + bt))
               * ({_duck_ent('(gt - gl)', '(bt - bl)')}), 6) AS gain
FROM cand
ORDER BY gain DESC, threshold
LIMIT 1
"""


register("decision_stump_price", q_decision_stump_price, ORACLE_DECISION_STUMP_PRICE)
