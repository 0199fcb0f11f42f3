"""Dataset-split utilities for training pipelines (extension; no
reference counterpart — SURVEY.md §2.11): stratified k-fold assignment
and curriculum ordering. Companions to `train_val_test_split` and
`deterministic_sample` in `functions/corpus.py` — the same
content-addressed md5 uniform drives all of them, so folds are stable
under reruns, partitioning, and engine (the DuckDB oracle replays the
hash bit-for-bit).

Scale: fold assignment is a row-local hash (zero shuffle beyond the
audit rollup); curriculum ordering is orderBy().limit(K) —
TakeOrderedAndProject, parallel partial top-K per partition, never a
global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register

N_FOLDS = 5
CURRICULUM_HEAD = 50


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to N_FOLDS folds via md5(doc_id) % N_FOLDS and
    report the per-(lang, fold) balance audit: doc count, char mass,
    min/max doc_id. Stratification is free: the hash is independent of
    lang, so each stratum splits ~uniformly; the audit frame is what a
    training pipeline checks before trusting the folds."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    u16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    )
    return (
        docs.withColumn("fold", (u16 % N_FOLDS).cast("bigint"))
        .groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


ORACLE_STRATIFIED_KFOLD = f"""
SELECT lang,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % {N_FOLDS}
         AS fold,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY 1, 2
"""


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First CURRICULUM_HEAD documents of a curriculum schedule:
    easy-to-hard phases by length (short < 200 chars, mid < 400, long),
    deterministically shuffled WITHIN each phase by md5(doc_id) so no
    source/lang ordering bias leaks into the schedule. The global
    (phase, hash) order compiles to TakeOrderedAndProject; positions
    are a window over the already-bounded head only."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    phased = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 400, 1)
        .otherwise(2)
        .cast("bigint")
        .alias("phase"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    head = phased.orderBy("phase", "h", "doc_id").limit(CURRICULUM_HEAD)
    w = Window.orderBy("phase", "h", "doc_id")
    return head.withColumn("position", F.row_number().over(w).cast("bigint")).select(
        "position", "doc_id", "lang", "n_chars", "phase"
    )


ORACLE_CURRICULUM_ORDER = f"""
WITH phased AS (
  SELECT doc_id, lang, n_chars,
         CAST(CASE WHEN n_chars < 200 THEN 0
                   WHEN n_chars < 400 THEN 1 ELSE 2 END AS BIGINT) AS phase,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), head AS (
  SELECT * FROM phased ORDER BY phase, h, doc_id LIMIT {CURRICULUM_HEAD}
)
SELECT CAST(row_number() OVER (ORDER BY phase, h, doc_id) AS BIGINT) AS position,
       doc_id, lang, n_chars, phase
FROM head
"""


register("stratified_kfold", q_stratified_kfold, ORACLE_STRATIFIED_KFOLD)
register("curriculum_order", q_curriculum_order, ORACLE_CURRICULUM_ORDER)


SAMPLE_K = 50
_AES_SCALE = 1_000_000_000


def q_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-ES (2006): each doc draws u from its content-addressed md5
    uniform and ranks by key = ln(u)/w (monotone in u^(1/w)), weight
    w = n_chars; the top-K keys ARE a weighted sample without
    replacement. The distributed-sampling workhorse: no sequential
    pass, no rejection loop, one TakeOrderedAndProject.

    Determinism: u = (u16+1)/65536 is a dyadic rational (exact double),
    keys land on a 1e-9 grid that absorbs cross-engine ln() ulps, and
    grid ties break by doc_id."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    u16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    )
    keyed = docs.withColumn("u16", u16).select(
        "doc_id",
        "lang",
        "n_chars",
        # CAST to DOUBLE is load-bearing: a bare 65536.0 literal parses
        # as DECIMAL in Spark SQL (7-digit division!) but DOUBLE in
        # DuckDB — the engines would quietly diverge in the 8th digit
        F.expr(
            f"CAST(round(ln(CAST(u16 + 1 AS DOUBLE) / 65536) / n_chars "
            f"* {_AES_SCALE}) AS BIGINT)"
        ).alias("key_fp"),
    )
    return keyed.orderBy(F.col("key_fp").desc(), "doc_id").limit(SAMPLE_K)


ORACLE_WEIGHTED_SAMPLE_AES = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT + 1
              AS DOUBLE) / 65536) / n_chars * {_AES_SCALE}) AS BIGINT) AS key_fp
  FROM documents
)
SELECT doc_id, lang, n_chars, key_fp
FROM keyed ORDER BY key_fp DESC, doc_id LIMIT {SAMPLE_K}
"""


register("weighted_sample_aes", q_weighted_sample_aes, ORACLE_WEIGHTED_SAMPLE_AES)
