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


def q_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic minority-class oversampling to parity: every
    language class in the corpus is replicated up to EXACTLY the
    majority-class count — the classic class-imbalance fix for
    training-mix construction, made replayable.

    Mechanics: per class, every row gets floor(maj/n) replicas and the
    md5-first (maj mod n) rows get one extra — content-addressed
    ordering (the deterministic_sample technique), so replica
    assignment is stable under partitioning, corpus order, and engine.
    The replication itself is explode(sequence(1, replicas)) — a
    narrow, shuffle-free row multiplier.

    Scale: the ranking window partitions BY CLASS (never global); class
    sizes and the majority count are a category-bounded broadcast
    frame. Output is the per-class census proving n_after == majority
    for every class."""
    from pyspark.sql import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    per = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    maj = per.agg(F.max("n_before").alias("maj"))
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    reps = (
        ranked.join(F.broadcast(per), "lang")
        .crossJoin(F.broadcast(maj))
        .withColumn(
            "replicas",
            F.expr("maj div n_before + CASE WHEN rk <= maj % n_before THEN 1 ELSE 0 END"),
        )
    )
    exploded = reps.select(
        "lang", "n_before", F.explode(F.expr("sequence(1, replicas)")).alias("i")
    )
    return exploded.groupBy("lang", "n_before").agg(
        F.count(F.lit(1)).alias("n_after")
    )


ORACLE_CLASS_REBALANCE = """
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents GROUP BY 1
), maj AS (
  SELECT MAX(n_before) AS maj FROM per
), ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
), reps AS (
  SELECT r.lang, p.n_before,
         m.maj // p.n_before
           + CASE WHEN r.rk <= m.maj % p.n_before THEN 1 ELSE 0 END AS replicas
  FROM ranked r JOIN per p USING (lang) CROSS JOIN maj m
), exploded AS (
  SELECT lang, n_before, unnest(generate_series(1, CAST(replicas AS BIGINT))) AS i
  FROM reps
)
SELECT lang, n_before, CAST(COUNT(*) AS BIGINT) AS n_after
FROM exploded GROUP BY 1, 2
"""


register("class_rebalance", q_class_rebalance, ORACLE_CLASS_REBALANCE)
