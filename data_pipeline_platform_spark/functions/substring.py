"""Exact-substring duplication analysis (extension; no reference
counterpart — the reference has no text ops at all, see SURVEY.md §2.11).

`dup_span_fraction` is the Spark shape of the exact-substring dedup of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"): find every token span of length >= K that occurs more than
once ANYWHERE in the corpus, and report per document what fraction of
its tokens sit inside such a span. The paper builds a suffix array; the
equivalent distributed shape is a k-gram census — both are one global
reorder of the corpus by substring content:

- gram extraction is row-local (explode positions over the token
  array);
- the duplicate census is ONE shuffle keyed by gram hash (a window
  count over the hash — no self-join);
- span coverage folds back per document with a doc-partitioned window
  (equal-length intervals sorted by start merge with
  `least(K, s - prev_s)` — no array materialization, no global
  window).

At 100 TB both shuffles are the unavoidable ones (the corpus must meet
itself by content, then by document); everything else is map-side.
Hashes are md5 over the joined token text, so the census keys are
engine-portable and the whole pipeline grades bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register

# span length in tokens; 5 matches the contamination_check gram size so
# the two ops read as one family
DUP_K = 5


def q_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span coverage: doc_id, n_tokens, dup_tokens
    (tokens inside any corpus-duplicated >=K-token span), dup_fraction.

    Coverage math: duplicated gram starts define intervals
    [s, s+K-1]; for equal-length intervals sorted by start the union
    size is sum(least(K, s - prev_s)) with the first interval
    contributing K — exact integers end to end."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    base = docs.select("doc_id", "toks", F.size("toks").alias("n_tokens"))

    grams = (
        base.filter(F.col("n_tokens") >= DUP_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(1, n_tokens - {DUP_K} + 1)")
            ).alias("s"),
            "toks",
        )
        .select(
            "doc_id",
            "s",
            F.md5(F.expr(f"concat_ws(' ', slice(toks, s, {DUP_K}))")).alias("gh"),
        )
    )
    # duplicate census: one shuffle keyed by gram hash
    dup = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    ).filter(F.col("cnt") >= 2)
    # fold spans per doc: second (doc-keyed) shuffle
    cov = (
        dup.withColumn(
            "added",
            F.expr(
                f"least(CAST({DUP_K} AS BIGINT), "
                f"CAST(s AS BIGINT) - coalesce(lag(s) OVER "
                f"(PARTITION BY doc_id ORDER BY s), s - {DUP_K}))"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("added").cast("bigint").alias("dup_tokens"))
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.expr(
            "round(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / n_tokens, 6)"
        ).alias("dup_fraction"),
    )


ORACLE_DUP_SPAN_FRACTION = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), grams AS (
  SELECT doc_id, unnest(generate_series(1, n_tokens - {DUP_K} + 1)) AS s,
         toks
  FROM base WHERE n_tokens >= {DUP_K}
), hashed AS (
  SELECT doc_id, s,
         md5(array_to_string(toks[s:s + {DUP_K} - 1], ' ')) AS gh
  FROM grams
), dup AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY gh) AS cnt FROM hashed
  ) WHERE cnt >= 2
), added AS (
  SELECT doc_id,
         least(CAST({DUP_K} AS BIGINT),
               CAST(s AS BIGINT) - coalesce(
                 lag(s) OVER (PARTITION BY doc_id ORDER BY s),
                 s - {DUP_K})) AS added
  FROM dup
), cov AS (
  SELECT doc_id, CAST(SUM(added) AS BIGINT) AS dup_tokens
  FROM added GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 6)
         AS dup_fraction
FROM base b LEFT JOIN cov c USING (doc_id)
"""

register("dup_span_fraction", q_dup_span_fraction, ORACLE_DUP_SPAN_FRACTION)


def q_dedup_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACT side of `dup_span_fraction`: rewrite each document with
    every corpus-duplicated >=K-token span removed (Lee et al. 2022
    drop the repeated occurrence; here every occurrence of a duplicated
    span goes, the conservative variant that needs no global ordering
    of occurrences).

    Shape: the same gram census (one hash-keyed shuffle), then dup
    starts COLLECT per doc (doc-local array, bounded by doc length) and
    the rewrite is row-local: covered positions expand from the start
    list, surviving tokens re-join in position order. The second
    shuffle is the doc-keyed collect — same budget as the measuring op.
    Per-doc cost is O(len * covered) in the worst (fully duplicated)
    case — bounded by document length, not corpus size."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    base = docs.select("doc_id", "toks", F.size("toks").alias("n_tokens"))

    grams = (
        base.filter(F.col("n_tokens") >= DUP_K)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, n_tokens - {DUP_K} + 1)")).alias("s"),
            "toks",
        )
        .select(
            "doc_id",
            "s",
            F.md5(F.expr(f"concat_ws(' ', slice(toks, s, {DUP_K}))")).alias("gh"),
        )
    )
    dup = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    ).filter(F.col("cnt") >= 2)
    starts = dup.groupBy("doc_id").agg(F.collect_list("s").alias("starts"))
    return (
        base.join(starts, "doc_id", "left")
        .withColumn(
            "covered",
            F.expr(
                f"array_distinct(flatten(transform(coalesce(starts, "
                f"array()), st -> sequence(st, st + {DUP_K} - 1))))"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "CAST(n_tokens - size(covered) AS BIGINT)"
            ).alias("kept_tokens"),
            F.expr(
                "concat_ws(' ', filter(transform(sequence(1, n_tokens), "
                "i -> CASE WHEN array_contains(covered, i) THEN NULL "
                "ELSE element_at(toks, i) END), x -> x IS NOT NULL))"
            ).alias("cleaned_text"),
        )
    )


ORACLE_DEDUP_SPAN_CLEAN = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), grams AS (
  SELECT doc_id, unnest(generate_series(1, n_tokens - {DUP_K} + 1)) AS s,
         toks
  FROM base WHERE n_tokens >= {DUP_K}
), hashed AS (
  SELECT doc_id, s,
         md5(array_to_string(toks[s:s + {DUP_K} - 1], ' ')) AS gh
  FROM grams
), dup AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY gh) AS cnt FROM hashed
  ) WHERE cnt >= 2
), covered AS (
  SELECT doc_id, list_distinct(flatten(list(
           generate_series(s, s + {DUP_K} - 1)))) AS cov
  FROM dup GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       CAST(b.n_tokens - COALESCE(len(c.cov), 0) AS BIGINT) AS kept_tokens,
       COALESCE(array_to_string(
         list_filter(
           list_transform(generate_series(1, b.n_tokens),
             i -> CASE WHEN list_contains(COALESCE(c.cov, []), i)
                       THEN NULL ELSE b.toks[i] END),
           x -> x IS NOT NULL), ' '), '') AS cleaned_text
FROM base b LEFT JOIN covered c USING (doc_id)
"""

register("dedup_span_clean", q_dedup_span_clean, ORACLE_DEDUP_SPAN_CLEAN)


def q_contamination_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW MUCH of each training document is benchmark text —
    `contamination_check` answers whether a doc shares any 5-gram with
    the held-out benchmark (src0); this measures the token-span
    COVERAGE of that overlap (Lee et al.-style span union, the
    `dup_span_fraction` fold), which is what a contamination-budget
    policy actually thresholds on.

    Shape: benchmark grams reduce to a distinct hash set (benchmark-
    sized, broadcastable at real scale); train grams semi-join against
    it (the one fact-sized shuffle) and the span union folds per doc
    with the same least(K, s - prev_s) window as dup_span_fraction."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    )
    bench_grams = (
        docs.filter(F.col("source") == "src0")
        .select(F.split(F.trim("text"), r"\s+").alias("toks"))
        .select(F.size("toks").alias("n"), "toks")
        .filter(F.col("n") >= DUP_K)
        .select(
            F.explode(F.expr(f"sequence(1, n - {DUP_K} + 1)")).alias("s"), "toks"
        )
        .select(
            F.md5(F.expr(f"concat_ws(' ', slice(toks, s, {DUP_K}))")).alias("gh")
        )
        .distinct()
    )
    train_grams = (
        base.filter(F.col("n_tokens") >= DUP_K)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, n_tokens - {DUP_K} + 1)")).alias("s"),
            "toks",
        )
        .select(
            "doc_id",
            "s",
            F.md5(F.expr(f"concat_ws(' ', slice(toks, s, {DUP_K}))")).alias("gh"),
        )
    )
    hits = train_grams.join(F.broadcast(bench_grams), "gh", "left_semi")
    cov = (
        hits.withColumn(
            "added",
            F.expr(
                f"least(CAST({DUP_K} AS BIGINT), "
                f"CAST(s AS BIGINT) - coalesce(lag(s) OVER "
                f"(PARTITION BY doc_id ORDER BY s), s - {DUP_K}))"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("added").cast("bigint").alias("contam_tokens"))
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("contam_tokens", F.lit(0)).cast("bigint").alias("contam_tokens"),
        F.expr(
            "round(CAST(coalesce(contam_tokens, 0) AS DOUBLE) / n_tokens, 6)"
        ).alias("contam_fraction"),
    )


ORACLE_CONTAMINATION_SPAN_FRACTION = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents WHERE source != 'src0'
), bench_grams AS MATERIALIZED (
  SELECT DISTINCT md5(array_to_string(toks[s:s + {DUP_K} - 1], ' ')) AS gh
  FROM (
    SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents
    WHERE source = 'src0'
  ) t, LATERAL unnest(generate_series(1, len(toks) - {DUP_K} + 1)) g(s)
  WHERE len(toks) >= {DUP_K}
), train_grams AS (
  SELECT doc_id, s,
         md5(array_to_string(toks[s:s + {DUP_K} - 1], ' ')) AS gh
  FROM base, LATERAL unnest(generate_series(1, n_tokens - {DUP_K} + 1)) g(s)
  WHERE n_tokens >= {DUP_K}
), hits AS (
  SELECT doc_id, s FROM train_grams WHERE gh IN (SELECT gh FROM bench_grams)
), added AS (
  SELECT doc_id,
         least(CAST({DUP_K} AS BIGINT),
               CAST(s AS BIGINT) - coalesce(
                 lag(s) OVER (PARTITION BY doc_id ORDER BY s),
                 s - {DUP_K})) AS added
  FROM hits
), cov AS (
  SELECT doc_id, CAST(SUM(added) AS BIGINT) AS contam_tokens FROM added GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(c.contam_tokens, 0) AS BIGINT) AS contam_tokens,
       round(CAST(COALESCE(c.contam_tokens, 0) AS DOUBLE) / b.n_tokens, 6)
         AS contam_fraction
FROM base b LEFT JOIN cov c USING (doc_id)
"""

register(
    "contamination_span_fraction",
    q_contamination_span_fraction,
    ORACLE_CONTAMINATION_SPAN_FRACTION,
)
