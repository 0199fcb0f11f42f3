"""Vocabulary-growth (Heaps' law) analysis (extension; no reference
counterpart — the reference has no text ops, see SURVEY.md §2.11).

`vocab_growth` answers the collection-saturation question "is new data
still contributing new vocabulary, or are we re-crawling the same
material?" — the Heaps-law curve V(n) of cumulative distinct word
types against corpus position, reported at 100 fixed corpus-percentile
checkpoints.

Scale shape:

- each type's FIRST occurrence position is one min() groupBy keyed on
  the token (the one fact-sized, map-side-combinable shuffle — the
  corpus must meet itself by token once);
- positions quantize to 100 ingest-order buckets via the broadcast max
  doc id — a pure row-local projection, NOT a global NTILE (the
  rfm_segments lesson: percentile membership from a broadcast bound
  beats a global ordered window);
- new-type counts per bucket and the running total run over the
  100-row bucket frame. The only unpartitioned ordered window in the
  plan is over those 100 rows — constant-size at any corpus scale, so
  it is NOT the single-task scale-killer the packing family had to
  shard.

Doc ids are the ingest order (the driver's generator assigns them
monotonically); a deployment with opaque ids would key on an ingest
timestamp instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register

N_BUCKETS = 100


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps curve checkpoints: (bucket, n_docs, n_token_occurrences,
    new_types, cum_types) — cum_types is V(n) after that corpus slice."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    bound = docs.agg((F.max("doc_id") + 1).alias("hi"))
    bucketed = docs.crossJoin(F.broadcast(bound)).select(
        (F.col("doc_id") * N_BUCKETS / F.col("hi")).cast("bigint").alias("bucket"),
        "doc_id",
        "toks",
    )
    # per-bucket volume: docs + raw token occurrences (row-local)
    vol = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("n_token_occurrences"),
    )
    # first-occurrence census: ONE token-keyed shuffle over the corpus
    firsts = (
        bucketed.select("bucket", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("bucket").alias("first_bucket"))
        .groupBy(F.col("first_bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket")  # 100-row frame: constant at any scale
    return (
        vol.join(firsts, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)).cast("bigint"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
        .select("bucket", "n_docs", "n_token_occurrences", "new_types", "cum_types")
    )


ORACLE_VOCAB_GROWTH = f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), hi AS (SELECT MAX(doc_id) + 1 AS hi FROM docs),
bucketed AS (
  SELECT CAST(trunc(doc_id * {N_BUCKETS} / hi) AS BIGINT) AS bucket, doc_id, toks
  FROM docs, hi
), vol AS (
  SELECT bucket, COUNT(*) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_token_occurrences
  FROM bucketed GROUP BY 1
), firsts AS (
  SELECT first_bucket AS bucket, COUNT(*) AS new_types FROM (
    SELECT tok, MIN(bucket) AS first_bucket
    FROM (SELECT bucket, unnest(toks) AS tok FROM bucketed)
    GROUP BY 1
  ) GROUP BY 1
)
SELECT v.bucket, v.n_docs, v.n_token_occurrences,
       CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(COALESCE(f.new_types, 0))
            OVER (ORDER BY v.bucket) AS BIGINT) AS cum_types
FROM vol v LEFT JOIN firsts f USING (bucket)
"""

register("vocab_growth", q_vocab_growth, ORACLE_VOCAB_GROWTH)


DRIFT_MIN_COUNT = 20


def q_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical drift monitor: split the corpus into two content-
    addressed halves (md5 of doc_id — the split_drift posture) and
    report, for every term frequent in BOTH halves, the log-ratio of
    its usage share. Near-zero everywhere means the halves are
    exchangeable (healthy ingest); fat tails mean the vocabulary is
    shifting — topic drift, a new source, or a scraper change.

    Shape: one token census keyed on (term, half) — map-side
    combinable; totals broadcast; the log-ratio is one fixed-point ln
    on exact ratios over the vocabulary-sized frame."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8")
        .cast("int")
        .alias("half"),
        F.split(F.trim("text"), r"\s+").alias("toks"),
    )
    cells = (
        docs.select("half", F.explode("toks").alias("term"))
        .groupBy("term", "half")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.groupBy("half").agg(F.sum("c").alias("t"))
    a = (
        cells.filter(F.col("half") == 1)
        .join(F.broadcast(tot.filter(F.col("half") == 1)), "half")
        .select("term", F.col("c").alias("ca"), F.col("t").alias("ta"))
    )
    b = (
        cells.filter(F.col("half") == 0)
        .join(F.broadcast(tot.filter(F.col("half") == 0)), "half")
        .select("term", F.col("c").alias("cb"), F.col("t").alias("tb"))
    )
    return (
        a.join(b, "term")
        .filter((F.col("ca") >= DRIFT_MIN_COUNT) & (F.col("cb") >= DRIFT_MIN_COUNT))
        .select(
            "term",
            F.col("ca").cast("bigint").alias("count_a"),
            F.col("cb").cast("bigint").alias("count_b"),
            F.expr(
                "CAST(round(ln((CAST(ca AS DOUBLE) / ta) / "
                "(CAST(cb AS DOUBLE) / tb)) * 1000000) AS BIGINT)"
            ).alias("log_ratio_fp"),
        )
    )


ORACLE_TERM_DRIFT = f"""
WITH docs AS (
  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS half,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), cells AS (
  SELECT term, half, COUNT(*) AS c
  FROM (SELECT half, unnest(toks) AS term FROM docs)
  GROUP BY 1, 2
), tot AS (SELECT half, SUM(c) AS t FROM cells GROUP BY 1)
SELECT a.term, CAST(a.c AS BIGINT) AS count_a, CAST(b.c AS BIGINT) AS count_b,
       CAST(round(ln((CAST(a.c AS DOUBLE) / ta.t) /
                     (CAST(b.c AS DOUBLE) / tb.t)) * 1000000) AS BIGINT)
         AS log_ratio_fp
FROM cells a
JOIN cells b ON a.term = b.term AND a.half = 1 AND b.half = 0
JOIN tot ta ON ta.half = 1
JOIN tot tb ON tb.half = 0
WHERE a.c >= {DRIFT_MIN_COUNT} AND b.c >= {DRIFT_MIN_COUNT}
"""

register("term_drift", q_term_drift, ORACLE_TERM_DRIFT)
