"""Corpus-curation operators for training-data pipelines (M8 extension,
beyond the reference's surface — BASELINE.json north_star): deterministic
sampling, pattern scrubbing, sequence packing, n-gram statistics,
benchmark decontamination, length bucketing, and mixture reporting.

Like `functions/text.py`, every hot path is built-in JVM expressions
(split / transform / windows / joins) — no Python UDFs — so each operator
stays inside whole-stage codegen. Oracles mirror the logic with DuckDB
list lambdas and identical window framing.

Scale notes per operator are on the functions; the common theme is that
each is one scan plus at most one key-partitioned shuffle, and the only
join (decontamination) is a shingle equi-join bounded by the eval set's
size — the candidates→verify shape shared with `functions/dedup.py`.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.dedup import (
    STOP_SHINGLE_DF as _STOP_SHINGLE_DF,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    # spread: single-row-group scans serialize the per-row token/regex
    # kernels in this module. Outputs are per-doc rows, integer-sum
    # aggregates, hash-based samples, or total-order windows — all
    # partitioning-independent.
    return spread_scan(load_table(spark, sf_dir, "documents"))


def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


# -- deterministic hash sampling ---------------------------------------------
def deterministic_sample(df: DataFrame, key_col: str = "doc_id", hex_prefix: str = "a") -> DataFrame:
    """Content-addressed ~1/16 sample: keep rows whose md5(key) starts
    with ``hex_prefix``. Unlike ``df.sample()`` this is reproducible
    across engines, runs, and cluster sizes (no RNG, no partition
    dependence), which is what a training-data pipeline needs for
    held-out splits and A/B corpus experiments. The predicate is a pure
    row-local expression — no shuffle, prunes at scan speed."""
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, len(hex_prefix))
        == hex_prefix
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return deterministic_sample(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "source", "n_chars"
    )


ORACLE_DETERMINISTIC_SAMPLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'a'
"""


# -- pattern scrubbing (PII-redaction machinery) -----------------------------
# the demo pattern targets tokens that actually occur in the synthetic
# corpus so the graded output discriminates; production swaps in e-mail/
# phone/SSN patterns — the plan is identical (one scan, two regex ops)
SCRUB_PATTERN = r"\b(key|hash|merge)\b"


def scrub_patterns(
    df: DataFrame, pattern: str = SCRUB_PATTERN, replacement: str = "[REDACTED]"
) -> DataFrame:
    """Regex redaction with an audit count — the PII-scrub building
    block. Row-local (regexp_replace + regexp_extract_all), so it
    composes into any scan without a shuffle; at 100 TB this is purely
    map-side work."""
    return df.withColumn(
        "scrubbed", F.regexp_replace(F.col("text"), pattern, replacement)
    ).withColumn(
        "n_redactions",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0)).cast("long"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scrub_patterns(_docs(spark, sf_dir))
        .filter(F.col("n_redactions") > 0)
        .select("doc_id", "scrubbed", "n_redactions")
    )


ORACLE_PII_SCRUB = r"""
SELECT doc_id,
       regexp_replace(text, '\b(key|hash|merge)\b', '[REDACTED]', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, '\b(key|hash|merge)\b')) AS BIGINT) AS n_redactions
FROM documents
WHERE len(regexp_extract_all(text, '\b(key|hash|merge)\b')) > 0
"""


# -- sequence packing --------------------------------------------------------
PACK_BUDGET = 2048


def pack_sequences(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget bins for training-batch
    construction: documents are laid out in ``order_col`` order and a
    document starts a new bin when the running total passes a budget
    boundary (bin = exclusive-prefix-sum // budget — contiguous, fully
    deterministic, one window pass).

    This is the streaming/concatenation packing used for LLM pretraining
    shards, not optimal bin-packing (NP-hard, and a global optimum would
    serialize). ``shard_col`` is the scale lever: with it set, the
    running sum is computed per shard (``Window.partitionBy(shard_col)``)
    so the window parallelizes across the cluster and ``bin_id`` is
    per-shard — exactly how packing is done in practice, because global
    document order across shards has no training meaning. With
    ``shard_col=None`` the window is a total order, which collapses to a
    single task — acceptable only for small corpora / per-partition
    post-shuffle use; at 100 TB always pass a shard."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    if shard_col is not None:
        w = (
            Window.partitionBy(shard_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    return (
        df.withColumn("token_count", F.size(_tokens()).cast("long"))
        .withColumn("prior_tokens", F.coalesce(F.sum("token_count").over(w), F.lit(0)))
        .withColumn("bin_id", (F.col("prior_tokens") / budget).cast("long"))
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = pack_sequences(_docs(spark, sf_dir))
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
), p AS (
  SELECT doc_id, token_count,
         COALESCE(SUM(token_count) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prior_tokens
  FROM t
)
SELECT CAST(prior_tokens // {PACK_BUDGET} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(token_count) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM p GROUP BY 1
"""


def q_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of packing: running-sum window partitioned by
    ``lang`` so every shard packs independently in parallel — no
    single-task exchange anywhere in the plan (asserted in
    tests/test_plan_quality.py). ``bin_id`` is per-shard; (lang, bin_id)
    is the global bin key."""
    packed = pack_sequences(_docs(spark, sf_dir), shard_col="lang")
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PACK_SEQUENCES_SHARDED = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
), p AS (
  SELECT doc_id, lang, token_count,
         COALESCE(SUM(token_count) OVER (
           PARTITION BY lang
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prior_tokens
  FROM t
)
SELECT lang, CAST(prior_tokens // {PACK_BUDGET} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(token_count) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM p GROUP BY 1, 2
"""


# -- n-gram corpus statistics ------------------------------------------------
def with_ngrams(df: DataFrame, n: int, out_col: str = "ngram") -> DataFrame:
    """Explode word n-grams (space-joined) — higher-order functions only,
    guarded for docs shorter than n tokens."""
    expr = (
        f"CASE WHEN size(__toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) END"
    )
    return (
        df.withColumn("__toks", _tokens())
        .withColumn(out_col, F.explode(F.expr(expr)))
        .drop("__toks")
    )


def q_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams (count desc, bigram asc tie-break) — the corpus
    health report that surfaces boilerplate before it poisons training.
    One scan + one partial-agg shuffle; the top-k is a TakeOrdered, not
    a full sort."""
    return (
        with_ngrams(_docs(spark, sf_dir), 2, "bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(20)
    )


ORACLE_BIGRAM_STATS = """
WITH t AS (SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents),
g AS (
  SELECT unnest(list_transform(range(1, len(toks)), i ->
           toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
)
SELECT bigram, COUNT(*) AS freq
FROM g GROUP BY bigram
ORDER BY freq DESC, bigram
LIMIT 20
"""


# -- benchmark decontamination ----------------------------------------------
CONTAM_NGRAM = 5


def contamination_check(
    train: DataFrame,
    evalset: DataFrame,
    n: int = CONTAM_NGRAM,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Find training documents sharing any word ``n``-gram with an
    evaluation/benchmark set (decontamination, the step every serious
    pretraining pipeline runs).

    Shape (r13, guide §3.2 — reduce the big side first): the small
    eval side is distinct-aggregated and broadcast; every RAW train
    (doc, n-gram) occurrence probes that membership relation BEFORE
    any train-side aggregation, so the (doc, n-gram) hash-dedup — the
    measured whale of the old distinct-then-join plan, a string-keyed
    aggregate over every n-gram of the corpus (132s of task time
    inside training_data_pipeline at sf0.1) — now sees only the
    n-grams that actually occur in the benchmark. join-then-distinct
    equals distinct-then-join here exactly: both yield each (doc,
    shared n-gram) pair once. The cost stays bounded by the EVAL side
    (benchmarks are small — thousands of docs against 100 TB of
    train), and a document-frequency cutoff on train shingles (the
    `functions/dedup.py` stop-shingle trick) applies unchanged if the
    train side has boilerplate."""
    tg = with_ngrams(train, n, "ng").select(doc_col, "ng")
    eg = with_ngrams(evalset, n, "ng").select("ng").distinct()
    # explicit hint (r13 advisor): the docstring's whole argument rests on
    # the eval side being the broadcast build side — if auto-broadcast
    # misestimated, the plan would shuffle the raw UNdeduplicated train
    # (doc, n-gram) stream, strictly worse than the old distinct-first plan
    return (
        tg.join(F.broadcast(eg), "ng")
        .dropDuplicates([doc_col, "ng"])
        .groupBy(doc_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    evalset = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return contamination_check(train, evalset)


FUZZY_CONTAM_THRESHOLD = 0.8


def fuzzy_contamination(
    train: DataFrame, benchmark: DataFrame, threshold: float = FUZZY_CONTAM_THRESHOLD
) -> DataFrame:
    """Near-duplicate decontamination: training docs whose shingle-set
    Jaccard against any benchmark doc is >= ``threshold`` — the fuzzy
    complement of `contamination_check`'s exact n-gram overlap (catches
    paraphrased/reformatted benchmark leakage that shares few exact
    5-grams).

    Shape is the cross-corpus variant of MinHash LSH dedup: both sides
    get banded signature keys, candidates come from a band equi-join
    (cost ~ collisions, and the benchmark side is small, so the join
    broadcasts at scale), and every candidate is verified with the
    exact Jaccard — same 32x2 banding, so P(missing a pair at j >= 0.8)
    ~ 5e-15 and the output equals the brute-force oracle."""
    from data_pipeline_platform_spark.functions.dedup import (
        lsh_band_keys,
        nonempty_shingled,
    )
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    t_sh = tracked_persist(
        nonempty_shingled(train).select("doc_id", "shingles")
    )
    b_sh = tracked_persist(
        nonempty_shingled(benchmark).select(
            F.col("doc_id").alias("bench_id"), "shingles"
        )
    )
    cand = (
        lsh_band_keys(t_sh)
        .join(F.broadcast(lsh_band_keys(b_sh, id_col="bench_id")), ["band", "sig"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    return (
        cand.join(t_sh, "doc_id")
        .join(
            b_sh.select("bench_id", F.col("shingles").alias("b_shingles")),
            "bench_id",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("shingles", "b_shingles"))
            * F.lit(1.0)
            / F.size(F.array_union("shingles", "b_shingles")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "bench_id", "jaccard")
    )


def q_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return fuzzy_contamination(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
    )


ORACLE_FUZZY_CONTAMINATION = f"""
WITH sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3 THEN
    list_transform(generate_series(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
  ELSE [] END) AS shingles
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
), ne AS (SELECT * FROM sh WHERE len(shingles) > 0),
bench AS (SELECT * FROM ne WHERE doc_id % 7 = 0),
corpus AS (SELECT * FROM ne WHERE doc_id % 7 != 0)
SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
       len(list_intersect(c.shingles, b.shingles)) * 1.0 /
       len(list_distinct(list_concat(c.shingles, b.shingles))) AS jaccard
FROM corpus c JOIN bench b ON
  len(list_intersect(c.shingles, b.shingles)) * 1.0 /
  len(list_distinct(list_concat(c.shingles, b.shingles)))
    >= {FUZZY_CONTAM_THRESHOLD}
"""


ORACLE_CONTAMINATION_CHECK = f"""
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), g AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(1, len(toks) - {CONTAM_NGRAM - 2}), i ->
           list_aggregate(toks[i:i + {CONTAM_NGRAM - 1}], 'string_agg', ' '))) AS ng
  FROM t WHERE len(toks) >= {CONTAM_NGRAM}
)
SELECT a.doc_id, COUNT(*) AS n_shared_ngrams
FROM (SELECT DISTINCT doc_id, ng FROM g WHERE source <> 'src0') a
JOIN (SELECT DISTINCT ng FROM g WHERE source = 'src0') b ON a.ng = b.ng
GROUP BY a.doc_id
"""


# -- length bucketing --------------------------------------------------------
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(8) over token count (doc_id tie-break), partitioned by
    ``lang``: equal-population length buckets for batch shaping /
    curriculum schedules. Curriculum buckets are per-language in
    practice (length distributions differ wildly across languages), and
    partitioning the NTILE is also what keeps the window parallel — a
    global NTILE serializes the whole corpus through one task. One
    key-partitioned window pass + one aggregation; no single-partition
    exchange (asserted in tests/test_plan_quality.py)."""
    df = _docs(spark, sf_dir).withColumn("token_count", F.size(_tokens()).cast("long"))
    w = Window.partitionBy("lang").orderBy("token_count", "doc_id")
    return (
        df.withColumn("bucket", F.ntile(8).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("token_count").alias("min_tokens"),
            F.max("token_count").alias("max_tokens"),
            F.sum("token_count").alias("total_tokens"),
        )
    )


ORACLE_LENGTH_BUCKETS = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
), b AS (
  SELECT lang,
         CAST(NTILE(8) OVER (PARTITION BY lang ORDER BY token_count, doc_id) AS BIGINT) AS bucket,
         token_count
  FROM t
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       MIN(token_count) AS min_tokens,
       MAX(token_count) AS max_tokens,
       CAST(SUM(token_count) AS BIGINT) AS total_tokens
FROM b GROUP BY lang, bucket
"""


# -- corpus mixture report ---------------------------------------------------
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) doc/token counts and token share of the whole
    corpus — the mixture table a data-recipe owner reads before weighting
    sources. Grouped agg + a scalar total via a window over the grouped
    result (tiny), NOT a second scan of the corpus."""
    df = _docs(spark, sf_dir).withColumn("token_count", F.size(_tokens()).cast("long"))
    grouped = df.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
    )
    w = Window.partitionBy()
    return grouped.withColumn(
        "token_share",
        F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w),
    )


ORACLE_CORPUS_MIXTURE = """
WITH t AS (
  SELECT lang, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
), g AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(token_count) AS BIGINT) AS total_tokens
  FROM t GROUP BY lang, source
)
SELECT lang, source, n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE) / SUM(total_tokens) OVER () AS token_share
FROM g
"""


# -- the flagship: full training-data pipeline -------------------------------
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pretraining-data job, composed from the operator
    family as ONE lazy plan: benchmark split -> quality filter -> exact
    dedup -> near-dedup (candidates->verify) -> 5-gram decontamination
    -> sequence packing.

    Catalyst sees the whole chain, so the quality predicates push into
    the scan and every later stage works on the shrinking survivor set
    — the quality filter runs once, not per stage. The only heavy
    exchanges are the three the semantics require (fingerprint groupBy,
    shingle posting lists, pack window), each keyed differently because
    each answers a different question. Stage order is the cheap-first
    order a 100 TB run wants: row-local quality scoring prunes before
    anything shuffles.
    """
    from data_pipeline_platform_spark.functions.dedup import _jaccard_pairs
    from data_pipeline_platform_spark.functions.text import with_text_stats

    docs = _docs(spark, sf_dir)
    # src0 is the held-out benchmark: never trained on, used raw as the
    # decontamination reference
    evalset = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    kept = with_text_stats(train).filter(
        (F.col("token_count") >= 20)
        & (F.col("type_token_ratio") >= 0.15)
        & (F.col("stopword_ratio") <= 0.5)
        & (F.col("char_count") >= 100)
    )

    # exact dedup: keep the lowest doc_id per content fingerprint.
    # tracked_persist: `uniq` feeds FOUR sibling branches (shingle pair
    # generation, the anti-join back, decontamination, final packing) and
    # Spark re-executes an uncached subtree per branch — without the
    # persist the scan + text-stats + fingerprint window run 4x
    # (measured ~18-23s -> ~9s steady-state at sf0.1, together with the
    # deduped persist below). The survivor set is the smallest frame in
    # the chain, so this is the cheapest point to pin.
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    uniq = tracked_persist(
        kept.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
        .withColumn("__rn", F.row_number().over(w_fp))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )

    # near-dedup at jaccard >= 0.8: drop the higher id of each pair.
    # deduped is persisted too: its two consumers (decontamination and
    # the final pack) would otherwise each re-run the shingle pair
    # join behind dup_b
    pairs = _jaccard_pairs(uniq.select("doc_id", "text"), threshold=0.8)
    dup_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = tracked_persist(uniq.join(dup_b, "doc_id", "left_anti"))

    # decontamination against the raw benchmark
    dirty = contamination_check(
        deduped.select("doc_id", "text"), evalset.select("text"), n=CONTAM_NGRAM
    )
    clean = deduped.join(dirty.select("doc_id"), "doc_id", "left_anti")

    # pack survivors into token-budget bins, sharded by lang so the
    # running-sum window parallelizes (an orderBy-only window would
    # collapse the whole survivor set onto ONE task — the single worst
    # thing a 100 TB plan can contain). bin_id is per-lang; (lang,
    # bin_id) is the global bin key.
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        clean.withColumn(
            "prior", F.coalesce(F.sum("token_count").over(w_pack), F.lit(0))
        )
        .withColumn("bin_id", (F.col("prior") / PACK_BUDGET).cast("long"))
        .select("doc_id", "lang", "source", "token_count", "bin_id")
    )


ORACLE_TRAINING_DATA_PIPELINE = f"""
WITH train AS (
  SELECT doc_id, lang, source, text,
         CAST(length(text) AS BIGINT) AS char_count,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE source <> 'src0'
), scored AS (
  SELECT doc_id, lang, source, text, char_count, toks,
         CAST(len(toks) AS BIGINT) AS token_count,
         CAST(len(list_distinct(toks)) AS BIGINT) * 1.0 / len(toks) AS ttr,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
           * 1.0 / len(toks) AS swr
  FROM train
), kept AS (
  SELECT * FROM scored
  WHERE token_count >= 20 AND ttr >= 0.15 AND swr <= 0.5 AND char_count >= 100
), uniq AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1
), sh AS (
  SELECT doc_id, list_distinct(
           CASE WHEN len(toks) >= 3 THEN
             list_transform(generate_series(1, len(toks) - 2),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [] END) AS shingles
  FROM uniq
), sh_ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sh_live AS (
  -- same stop-shingle df cutoff as _jaccard_pairs: candidates must
  -- share >= 1 shingle with 1 < df <= cutoff; Jaccard verified on the
  -- full sets (non-binding at test SF, exact when it binds)
  SELECT s FROM sh_ex GROUP BY s
  HAVING COUNT(*) > 1 AND COUNT(*) <= {_STOP_SHINGLE_DF}
), dup_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh_ex a JOIN sh_ex b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM sh_live)
), dup_pairs AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
         (len(sa.shingles) + len(sb.shingles)
          - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
  FROM dup_cand
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
), deduped AS (
  SELECT * FROM uniq
  WHERE doc_id NOT IN (SELECT doc_b FROM dup_pairs WHERE jaccard >= 0.8)
), train_ng AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - {CONTAM_NGRAM - 2}), i ->
           list_aggregate(toks[i:i + {CONTAM_NGRAM - 1}], 'string_agg', ' '))) AS ng
  FROM deduped WHERE len(toks) >= {CONTAM_NGRAM}
), eval_ng AS (
  SELECT DISTINCT
         unnest(list_transform(range(1, len(toks) - {CONTAM_NGRAM - 2}), i ->
           list_aggregate(toks[i:i + {CONTAM_NGRAM - 1}], 'string_agg', ' '))) AS ng
  FROM (SELECT string_split_regex(trim(text), '\\s+') AS toks
        FROM documents WHERE source = 'src0')
  WHERE len(toks) >= {CONTAM_NGRAM}
), clean AS (
  SELECT * FROM deduped WHERE doc_id NOT IN (
    SELECT DISTINCT t.doc_id FROM train_ng t JOIN eval_ng e ON t.ng = e.ng)
), packed AS (
  SELECT doc_id, lang, source, token_count,
         COALESCE(SUM(token_count) OVER (
           PARTITION BY lang
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prior
  FROM clean
)
SELECT doc_id, lang, source, token_count,
       CAST(prior // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM packed
"""


register("deterministic_sample", q_deterministic_sample, ORACLE_DETERMINISTIC_SAMPLE)
register("training_data_pipeline", q_training_data_pipeline, ORACLE_TRAINING_DATA_PIPELINE)
register("pii_scrub", q_pii_scrub, ORACLE_PII_SCRUB)
register("pack_sequences", q_pack_sequences, ORACLE_PACK_SEQUENCES)
register("pack_sequences_sharded", q_pack_sequences_sharded, ORACLE_PACK_SEQUENCES_SHARDED)
register("bigram_stats", q_bigram_stats, ORACLE_BIGRAM_STATS)
register("contamination_check", q_contamination_check, ORACLE_CONTAMINATION_CHECK)
register("fuzzy_contamination", q_fuzzy_contamination, ORACLE_FUZZY_CONTAMINATION)
register("length_buckets", q_length_buckets, ORACLE_LENGTH_BUCKETS)
register("corpus_mixture", q_corpus_mixture, ORACLE_CORPUS_MIXTURE)


# -- stratified sampling -----------------------------------------------------
STRATUM_K = 5


def stratified_sample(
    df: DataFrame, stratum_col: str = "source", k: int = STRATUM_K, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum
    by md5(key) and keep the first k — a balanced cross-source slice
    that is reproducible across engines and cluster sizes (``sampleBy``
    is seeded RNG: different engines, different rows). One window
    shuffle keyed on the stratum; the hash ranking needs no global
    sort."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(_docs(spark, sf_dir)).select(
        "doc_id", "source", "lang", "n_chars"
    )


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, source, lang, n_chars
FROM (
  SELECT doc_id, source, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {STRATUM_K}
"""

register("stratified_sample", q_stratified_sample, ORACLE_STRATIFIED_SAMPLE)


# -- temperature rebalancing (multilingual corpus sampling) ------------------

TEMP_SAMPLE_C = 8.0  # expected kept docs per lang ~ C * sqrt(n_lang)


def temperature_sample(
    df: DataFrame, group_col: str = "lang", key_col: str = "doc_id",
    c: float = TEMP_SAMPLE_C,
) -> DataFrame:
    """sqrt-temperature corpus rebalancing: keep each group's rows with
    probability min(1, c/sqrt(n_g)), so kept docs per group ~ c*sqrt(n_g)
    — rare languages are oversampled relative to their share, the
    standard alpha=0.5 temperature flattening for multilingual
    pretraining mixes.

    Determinism contract (same reasons as deterministic_sample): the
    per-row uniform is 4 hex digits of md5(key) (u16 in [0, 65536)),
    and the keep test `u16 * sqrt(n_g) < c * 65536` uses only IEEE
    operations with exactly-rounded results (sqrt, mul) — no pow(), no
    cross-group float sums — so every engine selects the identical doc
    set. alpha=0.5 (sqrt) rather than the also-common 0.7 is chosen
    BECAUSE pow(x, 0.7) is not bitwise-portable across engines.

    Plan: one count aggregation (group-grain, broadcast back) + one
    row-local predicate — no shuffle of the corpus itself."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_g"))
    u16 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(u16 * F.sqrt(F.col("__n_g")) < F.lit(c * 65536.0))
        .drop("__n_g")
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded as the per-lang balance report: input share vs kept share
    shows the flattening (kept counts ~ sqrt of input counts)."""
    docs = _docs(spark, sf_dir)
    kept = temperature_sample(docs)
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


ORACLE_TEMPERATURE_SAMPLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang
), kept AS (
  SELECT d.lang, COUNT(*) AS n_kept
  FROM documents d JOIN counts USING (lang)
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT * sqrt(n_g)
        < {TEMP_SAMPLE_C} * 65536.0
  GROUP BY d.lang
)
SELECT lang, n_g AS n_docs, COALESCE(n_kept, 0) AS n_kept
FROM counts LEFT JOIN kept USING (lang)
"""


register("temperature_sample", q_temperature_sample, ORACLE_TEMPERATURE_SAMPLE)


# -- token-window chunking (long doc -> training chunks) ---------------------

CHUNK_SIZE = 64      # tokens per chunk
CHUNK_OVERLAP = 16   # tokens shared with the previous chunk
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_documents(
    df: DataFrame, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    long-document -> training-chunks op (context-window packing's
    upstream): chunk i starts at token i*stride (stride = size-overlap),
    spans up to `size` tokens, and shares `overlap` tokens with its
    predecessor so no span of text loses cross-boundary context.

    Tail rule: a candidate start is kept iff it is the first chunk or
    extends at least one token past the previous chunk's overlap
    (start + overlap <= n). Dropping a tail start never loses tokens:
    the previous chunk ends at start + overlap - 1 >= n. Only the last
    start can be dropped, so chunk_ids are gapless 0..k and derivable
    arithmetically as (start-1) div stride — both engines compute them
    without window functions.

    Plan: one scan, one row-local explode — zero shuffles, zero Python.
    At 100 TB chunking rides the ingest scan; output rows ~ n_tokens /
    stride per doc, each chunk's text re-materialized from the token
    array (array_join), so downstream ops see plain string columns."""
    stride = size - overlap
    starts = (
        f"filter(sequence(1, __n, {stride}), "
        f"s -> s = 1 OR s + {overlap} <= __n)"
    )
    return (
        df.filter(F.trim(F.col("text")) != "")
        .withColumn("__toks", _tokens())
        .withColumn("__n", F.size("__toks"))
        .withColumn("__start", F.explode(F.expr(starts)))
        .select(
            "doc_id",
            F.expr(f"CAST((__start - 1) div {stride} AS INT)").alias("chunk_id"),
            F.least(F.lit(size), F.col("__n") - F.col("__start") + 1)
            .cast("long")
            .alias("n_tokens"),
            F.expr(f"array_join(slice(__toks, __start, {size}), ' ')").alias(
                "chunk_text"
            ),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_docs(spark, sf_dir))


ORACLE_CHUNK_DOCUMENTS = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
  WHERE trim(text) <> ''
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(list_filter(generate_series(1, len(toks), {CHUNK_STRIDE}),
                            s -> s = 1 OR s + {CHUNK_OVERLAP} <= len(toks))) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(least({CHUNK_SIZE}, n - start + 1) AS BIGINT) AS n_tokens,
       array_to_string(toks[start : start + {CHUNK_SIZE} - 1], ' ') AS chunk_text
FROM s
"""


register("chunk_documents", q_chunk_documents, ORACLE_CHUNK_DOCUMENTS)


# -- n-gram novelty (self-information / redundancy signal) -------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct 3-gram
    shingles whose FIRST corpus occurrence (min doc_id, ingestion order)
    is this doc. Boilerplate-heavy and templated docs score near 0 —
    their grams were all seen before — while genuinely new content
    scores high; the redundancy twin of `repetition_stats` (which is
    intra-doc) and the streaming analog of what a dedup pass removes.

    Docs with fewer than 3 tokens have no grams and no row (documented;
    the oracle agrees by construction).

    Plan shape at 100 TB: explode distinct grams -> ONE gram-keyed
    window (min doc_id per gram — same key family as the
    token_frequency shuffle, partial-combine applies to the
    min) -> ONE doc-keyed aggregation. No joins, no second corpus
    scan: the first-occurrence test rides the gram window as
    doc_id = min(doc_id) OVER (PARTITION BY gram)."""
    from data_pipeline_platform_spark.functions.dedup import with_shingles

    grams = (
        with_shingles(_docs(spark, sf_dir))
        .select("doc_id", F.explode("shingles").alias("gram"))
    )
    w = Window.partitionBy("gram")
    return (
        grams.withColumn("__first", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("__first")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novelty_rate", F.col("n_novel").cast("double") / F.col("n_grams")
        )
    )


from data_pipeline_platform_spark.functions.dedup import _DUCK_SHINGLES

ORACLE_NGRAM_NOVELTY = rf"""
WITH sh AS ({_DUCK_SHINGLES}),
g AS (
  SELECT doc_id, unnest(shingles) AS gram FROM sh
), firsts AS (
  SELECT doc_id, gram, MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
  FROM g
)
SELECT doc_id, COUNT(*) AS n_grams,
       SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS n_novel,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty_rate
FROM firsts
GROUP BY doc_id
"""


register("ngram_novelty", q_ngram_novelty, ORACLE_NGRAM_NOVELTY)


# -- deterministic train/val/test split --------------------------------------

SPLIT_VAL_LO = 58982   # 0.90 * 65536 — [0.90, 0.95) -> val
SPLIT_TEST_LO = 62259  # 0.95 * 65536 — [0.95, 1.00) -> test


def with_split(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Label every row train/val/test (90/5/5) from a content-addressed
    uniform: u16 = first 4 hex digits of md5(key). The split is a pure
    row-local projection — reproducible across engines, runs, partition
    layouts, and cluster sizes, and STABLE UNDER CORPUS GROWTH: a doc's
    split never changes when other docs are added or removed, which is
    the property that keeps eval sets uncontaminated across corpus
    versions (a random split reshuffles membership every run; a
    row_number split reshuffles on every insert). Stratification comes
    free: any subpopulation keyed independently of md5 lands ~90/5/5
    within itself."""
    u16 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    return df.withColumn(
        "split",
        F.when(u16 >= SPLIT_TEST_LO, F.lit("test"))
        .when(u16 >= SPLIT_VAL_LO, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded as the per-(source, split) census with token counts — the
    report a pipeline checks before training: does every source
    contribute to every band at ~90/5/5, and how many tokens land in
    each. One scan + one group-agg shuffle."""
    docs = with_split(_docs(spark, sf_dir))
    return (
        docs.withColumn("token_count", F.size(_tokens()).cast("long"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


ORACLE_TRAIN_VAL_TEST_SPLIT = f"""
WITH labeled AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   >= {SPLIT_TEST_LO} THEN 'test'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   >= {SPLIT_VAL_LO} THEN 'val'
              ELSE 'train' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(token_count) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM labeled
GROUP BY source, split
"""


register("train_val_test_split", q_train_val_test_split, ORACLE_TRAIN_VAL_TEST_SPLIT)


BOTTOMK_PER_GROUP = 8


def q_bottomk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP deterministic uniform sample: the k smallest
    md5(doc_id) hashes per source — the per-domain eyeball/QA sample
    every corpus pipeline needs (inspect k docs from EVERY domain, not
    k docs global where one giant domain crowds out the rest). Content-
    addressed like `deterministic_sample` and the KMV sketch
    (functions/sketches.py): re-running reproduces the same rows
    bit-for-bit, no RNG seed plumbing.

    100 TB posture: one scan + ONE hash-partitioned window keyed by
    source (never a global window); with rank <= k the window is a
    running top-k per partition. Skewed sources cost their row count,
    not a cross-partition sort."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h")
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= BOTTOMK_PER_GROUP)
        .select("source", "sample_rank", "doc_id", "h")
    )


ORACLE_BOTTOMK_PER_SOURCE = f"""
SELECT source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY h) AS BIGINT)
         AS sample_rank,
       doc_id, h
FROM (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
QUALIFY sample_rank <= {BOTTOMK_PER_GROUP}
"""

register("bottomk_per_source", q_bottomk_per_source, ORACLE_BOTTOMK_PER_SOURCE)


def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a Bloom pre-filter on the CORPUS side —
    the 100 TB shape of `contamination_check`: the exact version
    shuffles every distinct (train doc, 5-gram) pair into the
    benchmark join; here a 64 Kbit Bloom filter of the benchmark's
    5-grams broadcasts to every scan task and drops non-candidate
    corpus n-grams ROW-LOCAL before anything shuffles — only the
    (tiny) maybe-matching sliver plus bounded false positives reach
    the exact join, which removes the false positives. No false
    negatives by construction (Bloom), so the result is value-
    identical to the unfiltered exact check — which is literally the
    oracle this twin is graded against."""
    from data_pipeline_platform_spark.functions.scale import (
        bloom_prune,
        build_bloom,
    )

    docs = _docs(spark, sf_dir)
    evalset = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    eg = with_ngrams(evalset, CONTAM_NGRAM, "ng").select("ng").distinct()
    bloom = build_bloom(eg, "ng")
    tg = with_ngrams(train, CONTAM_NGRAM, "ng").select("doc_id", "ng").distinct()
    survivors = bloom_prune(tg, "ng", bloom)
    return (
        survivors.join(eg, "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


register(
    "bloom_decontamination",
    q_bloom_decontamination,
    ORACLE_CONTAMINATION_CHECK,
)


# ---------------------------------------------------------------------------
# C4 / FineWeb-style LINE-level cleaning (r12)
# ---------------------------------------------------------------------------

#: line-level rules, after C4 (Raffel et al. 2020 §2.2) and FineWeb:
#: a retained line needs >= C4_MIN_WORDS words, terminal punctuation,
#: and none of the blocked boilerplate phrases; any line whose exact
#: text appears in >= C4_DUP_DOCS distinct documents is corpus
#: boilerplate and is dropped from EVERY document.
C4_MIN_WORDS = 3
C4_DUP_DOCS = 2
C4_BLOCKED = ("cookie policy", "javascript", "lorem ipsum")


def c4_rule_ok():
    """The row-local C4 line rules as one Column expression (shared by
    the one-shot pass and the incremental cleaner in
    streaming/corpus.py)."""
    rule_ok = (
        (F.size(F.split(F.trim("line"), r"\s+")) >= C4_MIN_WORDS)
        & F.col("line").rlike(r"[.!?]$")
    )
    for phrase in C4_BLOCKED:
        rule_ok = rule_ok & ~F.contains(F.lower("line"), F.lit(phrase))
    return rule_ok


def clean_lines_c4(lines: DataFrame,
                   salt_buckets: Optional[int] = None) -> DataFrame:
    """(doc_id, line_no, line) -> per-document cleaning summary +
    reassembled clean text.

    Scale shape: the per-line rules are row-local Column expressions;
    the ONLY shuffle is the global duplicate-line census — a groupBy on
    the line text (at 100 TB: hash-partitioned by line content, partial
    countDistinct map-side) joined back onto the lines. Nothing
    collects; the reassembly is one doc-keyed aggregate.

    Skew (r12 verdict #5): the census AGGREGATION is structurally
    skew-safe — count_distinct's first exchange keys on (line, doc_id)
    so a boilerplate line in 60% of documents still spreads across
    reducers, and the final per-line exchange carries one partial row
    per (line, mapper). The JOIN-BACK is the vulnerable shuffle: when
    the census is too big to broadcast, the sort-merge join keys on the
    raw line and the hot line lands on ONE reducer (measured 20x
    max/median at 60% hot share — tools/census_skew_stress.py; AQE's
    byte-threshold skew split did not engage on this shape at test
    scale). ``salt_buckets`` > 1 routes the join-back through
    ``salted_join`` — dup-line marks replicate per salt, rows spread —
    with identical output. Size it with scale.choose_salt_buckets from
    a diagnose_skew profile."""
    from data_pipeline_platform_spark.functions.scale import salted_join

    flagged = lines.withColumn("rule_ok", c4_rule_ok())
    dup_lines = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= C4_DUP_DOCS)
        .select("line", F.lit(True).alias("is_dup"))
    )
    if salt_buckets and salt_buckets > 1:
        joined = salted_join(flagged, dup_lines, "line", how="left",
                             salt_buckets=salt_buckets)
    else:
        joined = flagged.join(dup_lines, "line", "left")
    judged = joined.withColumn(
        "kept", F.col("rule_ok") & F.col("is_dup").isNull()
    )
    return summarize_judged_lines(judged)


def summarize_judged_lines(judged: DataFrame) -> DataFrame:
    """(doc_id, line_no, line, rule_ok, is_dup true/NULL, kept) -> the
    per-document summary + reassembled clean text. Shared by the
    one-shot pass and the incremental cleaner so both produce
    byte-identical output."""
    return (
        judged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
            F.sum((~F.col("rule_ok")).cast("bigint")).alias("n_dropped_rules"),
            F.sum(
                (F.col("rule_ok") & F.col("is_dup").isNotNull()).cast("bigint")
            ).alias("n_dropped_dup"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .withColumn("clean_chars", F.length("clean_text").cast("bigint"))
    )


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleaning under the correctness gate. The corpus
    fixture synthesizes deterministic multi-line documents from the
    single-line testdata: a newline after every 7th word, terminal
    punctuation planted on 3 of every 4 lines (keyed on doc_id*31 +
    line_no), a corpus-wide boilerplate line injected as line 0 of
    every 5th document (must be removed EVERYWHERE by the duplicate
    census), and a 'cookie policy' phrase prepended to line 1 of every
    7th document (must fail the phrase rule). The oracle rebuilds the
    identical lines in DuckDB and replays the identical rules — counts
    and the reassembled clean text must match bitwise."""
    return clean_lines_c4(_c4_fixture_lines(spark, sf_dir)).select(
        "doc_id", "n_lines", "n_kept", "n_dropped_rules", "n_dropped_dup",
        "clean_chars", "clean_text",
    )


def _c4_fixture_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic multi-line fixture shared by the one-shot and
    incremental graded twins (see q_c4_line_filter's docstring for the
    planting scheme)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    multiline = docs.withColumn(
        "text", F.regexp_replace("text", r"((?:\S+ ){6}\S+) ", "$1\n")
    )
    d, ln = F.col("doc_id"), F.col("line_no")
    return (
        multiline.select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
        )
        .withColumn(
            "line",
            F.when((d % 5 == 0) & (ln == 0),
                   F.lit("subscribe to our newsletter today."))
            .when((d % 7 == 0) & (ln == 1),
                  F.concat(F.lit("cookie policy "), F.col("line")))
            .otherwise(F.col("line")),
        )
        .withColumn(
            "line",
            F.when(
                ((d * 31 + ln) % 4 != 0)
                & ~F.endswith("line", F.lit(".")),
                F.concat(F.col("line"), F.lit(".")),
            ).otherwise(F.col("line")),
        )
    )


ORACLE_C4_LINE_FILTER = r"""
WITH ml AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){6}\S+) ', '\1' || chr(10), 'g')
           AS t
  FROM documents
), splitted AS (
  SELECT doc_id, string_split(t, chr(10)) AS ls FROM ml
), raw_lines AS (
  SELECT doc_id,
         generate_subscripts(ls, 1) - 1 AS line_no,
         unnest(ls) AS line
  FROM splitted
), planted AS (
  SELECT doc_id, line_no,
         CASE
           WHEN doc_id % 5 = 0 AND line_no = 0
             THEN 'subscribe to our newsletter today.'
           WHEN doc_id % 7 = 0 AND line_no = 1
             THEN 'cookie policy ' || line
           ELSE line
         END AS line
  FROM raw_lines
), lines AS (
  SELECT doc_id, line_no,
         CASE
           WHEN (doc_id * 31 + line_no) % 4 <> 0
                AND NOT line LIKE '%.'
             THEN line || '.'
           ELSE line
         END AS line
  FROM planted
), judged AS (
  SELECT doc_id, line_no, line,
         (len(regexp_extract_all(trim(line), '\S+')) >= 3
          AND regexp_matches(line, '[.!?]$')
          AND NOT contains(lower(line), 'cookie policy')
          AND NOT contains(lower(line), 'javascript')
          AND NOT contains(lower(line), 'lorem ipsum')) AS rule_ok,
         COUNT(DISTINCT doc_id) OVER (PARTITION BY line) >= 2 AS is_dup
  FROM lines
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN rule_ok AND NOT is_dup THEN 1 ELSE 0 END)
         AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN NOT rule_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_rules,
       CAST(SUM(CASE WHEN rule_ok AND is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_dup,
       CAST(length(COALESCE(
         string_agg(CASE WHEN rule_ok AND NOT is_dup THEN line END,
                    chr(10) ORDER BY line_no), '')) AS BIGINT)
         AS clean_chars,
       COALESCE(
         string_agg(CASE WHEN rule_ok AND NOT is_dup THEN line END,
                    chr(10) ORDER BY line_no), '') AS clean_text
FROM judged
GROUP BY doc_id
"""


register("c4_line_filter", q_c4_line_filter, ORACLE_C4_LINE_FILTER)


def q_c4_line_filter_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of c4_line_filter (r12 verdict #6): the same
    fixture lines arrive as three doc-partitioned micro-batches; the
    duplicate-line census is maintained INCREMENTALLY (additive
    MaterializedAgg fold, marker inside the fold commit), with batch 1
    REDELIVERED to prove the replay skip. The final summaries — judged
    against the accumulated census, so boilerplate that crossed the
    duplicate threshold in a LATER batch retroactively drops from
    earlier documents — must match the one-shot oracle bitwise."""
    import tempfile

    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalLineCleaner,
    )

    lines = _c4_fixture_lines(spark, sf_dir)
    cleaner = IncrementalLineCleaner(
        spark,
        tempfile.mkdtemp(prefix="c4inc_lines_"),
        tempfile.mkdtemp(prefix="c4inc_census_"),
    )
    for i in range(3):
        batch = lines.filter(F.col("doc_id") % 3 == i)
        cleaner.process_batch(batch, batch_id=i)
        if i == 1:  # duplicate delivery: both sides must skip
            cleaner.process_batch(batch, batch_id=i)
    return cleaner.summaries().select(
        "doc_id", "n_lines", "n_kept", "n_dropped_rules", "n_dropped_dup",
        "clean_chars", "clean_text",
    )


register(
    "c4_line_filter_incremental", q_c4_line_filter_incremental,
    ORACLE_C4_LINE_FILTER,
)


def q_c4_line_filter_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-hardened census join-back under the correctness gate:
    identical fixture and oracle to c4_line_filter, with the dup-line
    marks joined back through salted_join (salt_buckets=8) — the path
    a 60%-hot boilerplate line takes at 100 TB (SCALE.md r13 balance
    numbers). Output must stay bitwise identical to the unsalted
    oracle."""
    return clean_lines_c4(
        _c4_fixture_lines(spark, sf_dir), salt_buckets=8
    ).select(
        "doc_id", "n_lines", "n_kept", "n_dropped_rules", "n_dropped_dup",
        "clean_chars", "clean_text",
    )


register(
    "c4_line_filter_salted", q_c4_line_filter_salted, ORACLE_C4_LINE_FILTER
)


# ---------------------------------------------------------------------------
# URL / domain-level filtering (r12) — RefinedWeb-style curation
# ---------------------------------------------------------------------------

#: exact-host blocklist (the UT1-blocklist role) and blocked TLDs
URL_BLOCKED_HOSTS = ("ads.tracker.com", "blogspam.net")
URL_BLOCKED_TLDS = (".info",)
#: hosts contributing more docs than this are over-represented and
#: down-filtered (the FineWeb domain-balance rule)
URL_HOST_CAP = 15


def filter_by_url(docs_with_url: DataFrame,
                  salt_buckets: Optional[int] = None) -> DataFrame:
    """(doc_id, url, ...) -> per-doc URL verdict columns + keep flag.

    Host parsing (r12 advisor): scheme is http OR https, case-
    insensitive; the host capture stops at '/', ':', '?' or '#' so
    ports and path-less URLs parse; the host is lower-cased before the
    census and the blocklist checks so 'Example.COM' folds with
    'example.com'. A URL that yields no host gets ``parseable=false``
    and ``keep=false`` — an unparseable URL must never slip past the
    blocklists.

    Scale shape: host/TLD extraction and the block rules are row-local
    Column expressions; the ONLY shuffle is the per-host census
    (groupBy host — partial counts map-side), joined back onto the
    docs. The blocklists are literal arrays (broadcast by value inside
    the plan), never a driver collect.

    Skew (r12 verdict #5): one host can dominate a crawl; the census
    groupBy itself ships one partial row per (host, mapper), but the
    join-back concentrates the hot host on one reducer when the census
    outgrows broadcast. ``salt_buckets`` > 1 routes it through
    ``salted_join`` (census rows replicate per salt) with identical
    output — see clean_lines_c4 for the measured balance numbers."""
    from data_pipeline_platform_spark.functions.scale import salted_join

    parsed = parse_url_host(docs_with_url)
    census = parsed.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_host")
    )
    if salt_buckets and salt_buckets > 1:
        joined = salted_join(parsed, census, "host", how="inner",
                             salt_buckets=salt_buckets)
    else:
        joined = parsed.join(census, "host")
    return url_verdicts(joined)


def parse_url_host(docs_with_url: DataFrame) -> DataFrame:
    """Row-local host/TLD extraction (see filter_by_url's parsing
    contract) — shared with the incremental filter in
    streaming/corpus.py."""
    return docs_with_url.withColumn(
        "host",
        F.lower(F.regexp_extract("url", r"(?i)^https?://([^/:?#]+)", 1)),
    ).withColumn("tld", F.regexp_extract("host", r"(\.[a-z]+)$", 1))


def url_verdicts(joined: DataFrame) -> DataFrame:
    """Blocklist / over-representation / parseability verdicts over
    rows that already carry (host, tld, n_docs_host) — shared by the
    one-shot and incremental paths so both produce identical output."""
    judged = (
        joined
        .withColumn(
            "blocked_host",
            F.array_contains(
                F.array(*[F.lit(h) for h in URL_BLOCKED_HOSTS]), F.col("host")
            ),
        )
        .withColumn(
            "blocked_tld",
            F.array_contains(
                F.array(*[F.lit(t) for t in URL_BLOCKED_TLDS]), F.col("tld")
            ),
        )
        .withColumn("over_represented", F.col("n_docs_host") > URL_HOST_CAP)
        .withColumn("parseable", F.col("host") != F.lit(""))
    )
    return judged.withColumn(
        "keep",
        F.col("parseable") & ~F.col("blocked_host") & ~F.col("blocked_tld")
        & ~F.col("over_represented"),
    )


def q_url_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL curation under the correctness gate: deterministic URLs are
    synthesized from doc_id (6 domains x 4 TLDs, with every 11th doc
    pointed at a blocklisted host, every 13th at an uppercase
    HTTP://...:8080 variant, every 17th at a path-less URL, every 19th
    at a non-URL string), then judged by the host/TLD blocklists and
    the per-host over-representation census. The hard parse cases
    grade the r12-advisor hardening: scheme-insensitive host capture,
    port stripping, lowercase fold, unparseable -> keep=false. The
    oracle rebuilds the identical URLs and replays the identical
    rules — every verdict column compared bitwise."""
    return filter_by_url(_url_fixture(spark, sf_dir)).select(
        "doc_id", "url", "host", "tld", "n_docs_host", "parseable",
        "blocked_host", "blocked_tld", "over_represented", "keep",
    )


def _url_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (doc_id, url) fixture shared by the plain and
    salted graded twins (see q_url_host_filter's docstring)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    domains = F.array(*[F.lit(x) for x in (
        "news-site", "blogcorp", "example", "shop", "wiki", "forum")])
    tlds = F.array(*[F.lit(x) for x in (".com", ".org", ".net", ".info")])
    return docs.withColumn(
        "url",
        F.when(
            d % 11 == 0,
            F.concat(F.lit("https://ads.tracker.com/p/"), d),
        )
        .when(
            d % 13 == 0,
            F.concat(F.lit("HTTP://News-Site.COM:8080/p/"), d),
        )
        .when(d % 17 == 0, F.lit("https://wiki.org"))
        .when(d % 19 == 0, F.concat(F.lit("doc:"), d))
        .otherwise(
            F.concat(
                F.lit("https://"),
                F.element_at(domains, (d % 6).cast("int") + 1),
                F.element_at(tlds, (d % 4).cast("int") + 1),
                F.lit("/p/"), d,
            )
        ),
    )


def q_url_host_filter_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened twin of url_host_filter: the host census joins
    back through salted_join (salt_buckets=8) — the dominant-crawl-host
    path at 100 TB. Same fixture, same oracle, bitwise."""
    return filter_by_url(
        _url_fixture(spark, sf_dir), salt_buckets=8
    ).select(
        "doc_id", "url", "host", "tld", "n_docs_host", "parseable",
        "blocked_host", "blocked_tld", "over_represented", "keep",
    )


ORACLE_URL_HOST_FILTER = r"""
WITH u AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 11 = 0
             THEN 'https://ads.tracker.com/p/' || doc_id
           WHEN doc_id % 13 = 0
             THEN 'HTTP://News-Site.COM:8080/p/' || doc_id
           WHEN doc_id % 17 = 0 THEN 'https://wiki.org'
           WHEN doc_id % 19 = 0 THEN 'doc:' || doc_id
           ELSE 'https://' ||
             (['news-site','blogcorp','example','shop','wiki','forum']
              )[doc_id % 6 + 1] ||
             (['.com','.org','.net','.info'])[doc_id % 4 + 1] ||
             '/p/' || doc_id
         END AS url
  FROM documents
), parsed AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1)) AS host
  FROM u
), tldd AS (
  SELECT doc_id, url, host,
         regexp_extract(host, '(\.[a-z]+)$', 1) AS tld,
         CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n_docs_host
  FROM parsed
)
SELECT doc_id, url, host, tld, n_docs_host,
       host <> '' AS parseable,
       host IN ('ads.tracker.com', 'blogspam.net') AS blocked_host,
       tld IN ('.info') AS blocked_tld,
       n_docs_host > 15 AS over_represented,
       (host <> ''
        AND host NOT IN ('ads.tracker.com', 'blogspam.net')
        AND tld NOT IN ('.info')
        AND n_docs_host <= 15) AS keep
FROM tldd
"""


register("url_host_filter", q_url_host_filter, ORACLE_URL_HOST_FILTER)
register(
    "url_host_filter_salted", q_url_host_filter_salted,
    ORACLE_URL_HOST_FILTER,
)


def q_url_host_filter_incremental(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Streaming twin of url_host_filter: the fixture docs arrive as
    three doc-partitioned micro-batches; the host census is maintained
    incrementally (additive MaterializedAgg COUNT fold, marker inside
    the fold commit), with batch 1 REDELIVERED to prove the replay
    skip. A host that crosses the over-representation cap only once a
    later batch folds must retroactively flip keep=false on earlier
    docs — the final verdicts must match the one-shot oracle
    bitwise."""
    import tempfile

    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalUrlFilter,
    )

    docs = _url_fixture(spark, sf_dir)
    flt = IncrementalUrlFilter(
        spark,
        tempfile.mkdtemp(prefix="urlinc_docs_"),
        tempfile.mkdtemp(prefix="urlinc_census_"),
    )
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i)
        flt.process_batch(batch, batch_id=i)
        if i == 1:  # duplicate delivery: both sides must skip
            flt.process_batch(batch, batch_id=i)
    return flt.verdicts().select(
        "doc_id", "url", "host", "tld", "n_docs_host", "parseable",
        "blocked_host", "blocked_tld", "over_represented", "keep",
    )


register(
    "url_host_filter_incremental", q_url_host_filter_incremental,
    ORACLE_URL_HOST_FILTER,
)
