"""Repetition / quality-rule / LM-scoring curation operators (M8
extension, beyond the reference's surface — the reference has no text
curation at all; these are the document-quality gates a training-data
pipeline runs before dedup, per the published Gopher (Rae et al. 2021,
§A1.1) and CCNet (Wenzek et al. 2019) recipes).

Three operators:

- `repetition_stats`: per-doc repetition diagnostics (top-word fraction,
  duplicate bigram/trigram fractions) as pure array higher-order
  functions — row-local, zero shuffle, whole-stage codegen.
- `gopher_quality_filter`: the composite keep/drop gate built from those
  diagnostics plus length / word-length / stopword rules, emitting one
  boolean per rule so a pipeline can audit WHY a document was dropped
  (the reject-reason column the curation literature insists on).
- `unigram_logprob`: corpus-self-trained unigram LM score per document
  (the cheap stand-in for CCNet's KenLM perplexity). Two-pass: a token
  frequency table (one shuffle, map-side partial agg), then a broadcast
  join back onto the exploded corpus. Per-doc sums use fixed-point
  BIGINT at 1e-6 resolution so the aggregation is accumulation-order
  free and the DuckDB oracle replays it bitwise (ln() may differ by an
  ulp across engines; the 1e-6 grid absorbs that).

Scale posture (100 TB): repetition/gopher are per-row Column exprs — no
shuffle, linear in executors. unigram_logprob's frequency table is
vocab-sized (millions of rows, tens of MB), far below the corpus, so it
broadcasts; the only corpus-sized shuffle is the per-doc re-aggregation,
keyed on doc_id (well-distributed). Nothing is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.text import STOPWORDS, _docs

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Spark-side token array (Java regex) and its DuckDB mirror (RE2); \s+ on
# trimmed text behaves identically in both for this corpus (no leading
# empty token).
_TOKS = r"split(trim(text), '\\s+')"
_DUCK_TOKS = r"string_split_regex(trim(text), '\s+')"


def _with_repetition(df: DataFrame) -> DataFrame:
    """Add repetition diagnostic columns via array higher-order fns.

    top_word_count is O(distinct * n) per row — fine for documents
    (n <= a few thousand tokens); it never leaves the row, so the cost
    is embarrassingly parallel and there is no shuffle at any scale.
    """
    return (
        df.withColumn("toks", F.expr(_TOKS))
        .withColumn("token_count", F.expr("CAST(size(toks) AS BIGINT)"))
        .withColumn(
            # max token multiplicity via a longest-run fold over the
            # sorted array: O(n log n) per row, vs the O(distinct*n)
            # count-each-distinct form this replaced (measured 7.8x at
            # the 20x scale probe, the module's CPU hotspot). Same
            # value, so the count-each-distinct DuckDB oracle still
            # grades it bitwise.
            "top_word_count",
            F.expr(
                "aggregate(array_sort(toks), "
                "named_struct('prev', CAST(NULL AS STRING), "
                "'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), "
                "(acc, x) -> named_struct("
                "'prev', x, "
                "'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)), "
                "'best', greatest(acc.best, "
                "IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))), "
                "acc -> acc.best)"
            ),
        )
        .withColumn(
            "top_word_frac",
            F.col("top_word_count").cast("double") / F.col("token_count"),
        )
        .withColumn(
            "bigrams",
            F.expr(
                "zip_with(slice(toks, 1, greatest(0, size(toks) - 1)), "
                "slice(toks, 2, greatest(0, size(toks) - 1)), "
                "(a, b) -> concat(a, ' ', b))"
            ),
        )
        .withColumn(
            "dup_bigram_frac",
            F.when(
                F.col("token_count") >= 2,
                (F.expr("size(bigrams)") - F.expr("size(array_distinct(bigrams))"))
                .cast("double")
                / F.expr("size(bigrams)"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "trigrams",
            F.expr(
                "zip_with(zip_with(slice(toks, 1, greatest(0, size(toks) - 2)), "
                "slice(toks, 2, greatest(0, size(toks) - 2)), (a, b) -> concat(a, ' ', b)), "
                "slice(toks, 3, greatest(0, size(toks) - 2)), (ab, c) -> concat(ab, ' ', c))"
            ),
        )
        .withColumn(
            "dup_trigram_frac",
            F.when(
                F.col("token_count") >= 3,
                (F.expr("size(trigrams)") - F.expr("size(array_distinct(trigrams))"))
                .cast("double")
                / F.expr("size(trigrams)"),
            ).otherwise(F.lit(0.0)),
        )
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition diagnostics."""
    return _with_repetition(_docs(spark, sf_dir)).select(
        "doc_id",
        "token_count",
        "top_word_count",
        "top_word_frac",
        "dup_bigram_frac",
        "dup_trigram_frac",
    )


# DuckDB list slices are 1-based and end-inclusive: toks[1:n-1] zip
# toks[2:n] = the bigram pairs; the fractions mirror the Spark lambdas
# one-to-one.
_DUCK_REP = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks, lang, source, text FROM documents
), r AS (
  SELECT doc_id, lang, source, text, toks,
         CAST(len(toks) AS BIGINT) AS token_count,
         CAST(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, x -> x = w)))) AS BIGINT) AS top_word_count,
         list_transform(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)]),
              p -> p[1] || ' ' || p[2]) AS bigrams,
         list_transform(list_zip(toks[1:len(toks) - 2], toks[2:len(toks) - 1],
              toks[3:len(toks)]),
              p -> p[1] || ' ' || p[2] || ' ' || p[3]) AS trigrams
  FROM t
), m AS (
  SELECT doc_id, lang, source, text, toks, token_count, top_word_count,
         CAST(top_word_count AS DOUBLE) / token_count AS top_word_frac,
         CASE WHEN token_count >= 2 THEN
           CAST(len(bigrams) - len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
         ELSE 0.0 END AS dup_bigram_frac,
         CASE WHEN token_count >= 3 THEN
           CAST(len(trigrams) - len(list_distinct(trigrams)) AS DOUBLE) / len(trigrams)
         ELSE 0.0 END AS dup_trigram_frac
  FROM r
)
"""

ORACLE_REPETITION_STATS = (
    _DUCK_REP
    + """
SELECT doc_id, token_count, top_word_count, top_word_frac,
       dup_bigram_frac, dup_trigram_frac
FROM m
"""
)


# Gopher-adapted rule bounds (token bounds / word-length band / >= 2
# distinct stopwords per Rae et al. A1.1; repetition cutoffs tightened
# to this corpus's observed distribution so the gate discriminates).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 1000
GOPHER_MIN_WORD_LEN = 3.0
GOPHER_MAX_WORD_LEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_TOP_WORD_FRAC = 0.15
GOPHER_MAX_DUP_BIGRAM_FRAC = 0.05


def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality gate with per-rule audit booleans. All five
    rules are row-local Column exprs — the gate is a single codegen'd
    projection over the scan, the cheapest possible 100 TB pass."""
    rep = _with_repetition(_docs(spark, sf_dir))
    out = (
        rep.withColumn(
            "mean_word_len",
            F.expr("length(concat_ws('', toks))").cast("double")
            / F.col("token_count"),
        )
        .withColumn(
            "n_stopwords",
            F.expr(
                "CAST(size(array_distinct(filter(toks, "
                f"x -> x IN ({_STOP_SQL})))) AS BIGINT)"
            ),
        )
        .withColumn(
            "r_tokens",
            (F.col("token_count") >= GOPHER_MIN_TOKENS)
            & (F.col("token_count") <= GOPHER_MAX_TOKENS),
        )
        .withColumn(
            "r_word_len",
            (F.col("mean_word_len") >= GOPHER_MIN_WORD_LEN)
            & (F.col("mean_word_len") <= GOPHER_MAX_WORD_LEN),
        )
        .withColumn("r_stopwords", F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
        .withColumn("r_top_word", F.col("top_word_frac") <= GOPHER_MAX_TOP_WORD_FRAC)
        .withColumn(
            "r_dup_bigram", F.col("dup_bigram_frac") <= GOPHER_MAX_DUP_BIGRAM_FRAC
        )
        .withColumn(
            "keep",
            F.col("r_tokens")
            & F.col("r_word_len")
            & F.col("r_stopwords")
            & F.col("r_top_word")
            & F.col("r_dup_bigram"),
        )
    )
    return out.select(
        "doc_id",
        "token_count",
        "mean_word_len",
        "n_stopwords",
        "top_word_frac",
        "dup_bigram_frac",
        "r_tokens",
        "r_word_len",
        "r_stopwords",
        "r_top_word",
        "r_dup_bigram",
        "keep",
    )


ORACLE_GOPHER_QUALITY_FILTER = (
    _DUCK_REP
    + f"""
, g AS (
  SELECT *,
         CAST(length(array_to_string(toks, '')) AS DOUBLE) / token_count
           AS mean_word_len,
         CAST(len(list_distinct(list_filter(toks,
              x -> x IN ({_STOP_SQL})))) AS BIGINT) AS n_stopwords
  FROM m
)
SELECT doc_id, token_count, mean_word_len, n_stopwords, top_word_frac,
       dup_bigram_frac,
       (token_count >= {GOPHER_MIN_TOKENS} AND token_count <= {GOPHER_MAX_TOKENS})
         AS r_tokens,
       (mean_word_len >= {GOPHER_MIN_WORD_LEN} AND mean_word_len <= {GOPHER_MAX_WORD_LEN})
         AS r_word_len,
       (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS r_stopwords,
       (top_word_frac <= {GOPHER_MAX_TOP_WORD_FRAC}) AS r_top_word,
       (dup_bigram_frac <= {GOPHER_MAX_DUP_BIGRAM_FRAC}) AS r_dup_bigram,
       (token_count >= {GOPHER_MIN_TOKENS} AND token_count <= {GOPHER_MAX_TOKENS}
        AND mean_word_len >= {GOPHER_MIN_WORD_LEN}
        AND mean_word_len <= {GOPHER_MAX_WORD_LEN}
        AND n_stopwords >= {GOPHER_MIN_STOPWORDS}
        AND top_word_frac <= {GOPHER_MAX_TOP_WORD_FRAC}
        AND dup_bigram_frac <= {GOPHER_MAX_DUP_BIGRAM_FRAC}) AS keep
FROM g
"""
)


# fixed-point resolution for per-token ln() contributions: coarse enough
# that a 1-ulp Math.log-vs-libm divergence cannot flip the rounding,
# fine enough that the mean is meaningful to 6 decimals
_LP_SCALE = 1_000_000


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under a LM estimated
    from the corpus itself (CCNet's perplexity gate, with a unigram LM
    standing in for KenLM — the Spark plumbing is identical).

    Plan: token frequencies are one explode + groupBy (map-side partial
    agg); the frequency table is vocab-sized, so it is explicitly
    broadcast back onto the exploded corpus — the scoring join is
    shuffle-free. Per-doc sums are fixed-point BIGINTs (order-free);
    the single corpus-sized shuffle is the final doc_id re-aggregation.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("total"))
    scored = (
        tok.join(F.broadcast(counts), "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp_fp",
            F.expr(
                f"CAST(round(ln(CAST(freq AS DOUBLE) / total) * {_LP_SCALE}) AS BIGINT)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.sum("lp_fp").cast("double") / F.lit(float(_LP_SCALE)) / F.count(F.lit(1))
        ).alias("mean_logprob"),
    )


ORACLE_UNIGRAM_LOGPROB = f"""
WITH t AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), c AS (
  SELECT token, COUNT(*) AS freq FROM t GROUP BY token
), tot AS (
  SELECT SUM(freq) AS total FROM c
), s AS (
  SELECT doc_id,
         CAST(round(ln(CAST(freq AS DOUBLE) / total) * {_LP_SCALE}) AS BIGINT) AS lp_fp
  FROM t JOIN c USING (token) CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(lp_fp) AS DOUBLE) / {_LP_SCALE} / COUNT(*) AS mean_logprob
FROM s GROUP BY doc_id
"""


register("repetition_stats", q_repetition_stats, ORACLE_REPETITION_STATS)
register("gopher_quality_filter", q_gopher_quality_filter, ORACLE_GOPHER_QUALITY_FILTER)
register("unigram_logprob", q_unigram_logprob, ORACLE_UNIGRAM_LOGPROB)


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus health report: the one-glance rollup a
    curation run ends with — volume (docs/tokens), quality-gate pass
    rate, and how much of the language's volume is bag-of-words-
    duplicated. Composes the gopher gate and the BOW dedup key, both
    graded standalone above.

    Plan: the gate is row-local; the BOW duplicate flag is one
    uniformly-keyed groupBy + a broadcast-back join of the (tiny)
    dup-key set; the final rollup is one lang-keyed aggregation. Three
    shuffles total at any scale, all on well-distributed keys."""
    gate = q_gopher_quality_filter(spark, sf_dir)
    docs = _docs(spark, sf_dir).withColumn(
        "bow_key",
        F.md5(
            F.expr(
                "concat_ws(' ', array_sort(array_distinct(split(trim(text), '\\\\s+'))))"
            )
        ),
    )
    dup_keys = (
        docs.groupBy("bow_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("bow_key")
    )
    enriched = (
        docs.select("doc_id", "lang", "bow_key")
        .join(F.broadcast(dup_keys).withColumn("is_dup", F.lit(1)), "bow_key", "left")
        .join(gate.select("doc_id", "token_count", "keep"), "doc_id")
    )
    return enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
        F.sum(F.col("keep").cast("bigint")).alias("n_keep"),
        (
            F.sum(F.col("keep").cast("bigint")).cast("double") / F.count(F.lit(1))
        ).alias("keep_rate"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0)).cast("bigint")).alias(
            "n_bow_dup_docs"
        ),
    )


ORACLE_CORPUS_REPORT = (
    _DUCK_REP
    + f"""
, g AS (
  SELECT doc_id, lang, token_count,
         CAST(length(array_to_string(toks, '')) AS DOUBLE) / token_count
           AS mean_word_len,
         CAST(len(list_distinct(list_filter(toks,
              x -> x IN ({_STOP_SQL})))) AS BIGINT) AS n_stopwords,
         top_word_frac, dup_bigram_frac,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bow_key
  FROM m
), gk AS (
  SELECT *,
         (token_count >= {GOPHER_MIN_TOKENS} AND token_count <= {GOPHER_MAX_TOKENS}
          AND mean_word_len >= {GOPHER_MIN_WORD_LEN}
          AND mean_word_len <= {GOPHER_MAX_WORD_LEN}
          AND n_stopwords >= {GOPHER_MIN_STOPWORDS}
          AND top_word_frac <= {GOPHER_MAX_TOP_WORD_FRAC}
          AND dup_bigram_frac <= {GOPHER_MAX_DUP_BIGRAM_FRAC}) AS keep
  FROM g
), dups AS (
  SELECT bow_key FROM gk GROUP BY bow_key HAVING COUNT(*) > 1
)
SELECT lang, COUNT(*) AS n_docs,
       SUM(token_count) AS total_tokens,
       SUM(CAST(keep AS BIGINT)) AS n_keep,
       CAST(SUM(CAST(keep AS BIGINT)) AS DOUBLE) / COUNT(*) AS keep_rate,
       SUM(CASE WHEN bow_key IN (SELECT bow_key FROM dups) THEN 1 ELSE 0 END)
         AS n_bow_dup_docs
FROM gk GROUP BY lang
"""
)


register("corpus_report", q_corpus_report, ORACLE_CORPUS_REPORT)


# interpolation weights for the bigram LM (Jelinek-Mercer smoothing)
_BI_LAMBDA = 0.9


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram
    LM estimated from the corpus (one rung above unigram_logprob on the
    CCNet-style fluency ladder): p(w2|w1) = 0.9·c(w1 w2)/c(w1) +
    0.1·c(w2)/T, and the document's first token scores p(w) = c(w)/T.

    Plan shapes, in scale order: bigram counts are one explode +
    groupBy (map-side combinable, keys uniform); the per-occurrence
    scoring join against the bigram table is a SHUFFLE join — at web
    scale the bigram vocabulary outgrows broadcast range, unlike the
    unigram table which stays broadcast on both of its uses. Per-doc
    sums are fixed-point BIGINT (order-free; the 1e-6 grid absorbs
    cross-engine ln() ulps). Final re-aggregation keys on doc_id.
    """
    docs = _docs(spark, sf_dir).withColumn("toks", F.expr(_TOKS))
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, greatest(0, size(toks) - 1)), "
                "slice(toks, 2, greatest(0, size(toks) - 1)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = (
        docs.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    total = uni.agg(F.sum("c1").alias("t"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))

    scored_bi = (
        big.join(c2, ["w1", "w2"])
        .join(
            F.broadcast(uni.select(F.col("token").alias("w1"), F.col("c1").alias("c1w1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("token").alias("w2"), F.col("c1").alias("c1w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                f"CAST(round(ln({_BI_LAMBDA} * (CAST(c2 AS DOUBLE) / c1w1) "
                f"+ {1.0 - _BI_LAMBDA} * (CAST(c1w2 AS DOUBLE) / t)) "
                f"* {_LP_SCALE}) AS BIGINT)"
            ).alias("lp_fp"),
        )
    )
    first = (
        docs.select("doc_id", F.expr("element_at(toks, 1)").alias("token"))
        .join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                f"CAST(round(ln(CAST(c1 AS DOUBLE) / t) * {_LP_SCALE}) AS BIGINT)"
            ).alias("lp_fp"),
        )
    )
    return (
        scored_bi.unionByName(first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum("lp_fp").cast("double")
                / F.lit(float(_LP_SCALE))
                / F.count(F.lit(1))
            ).alias("mean_logprob"),
        )
    )


ORACLE_BIGRAM_LOGPROB = f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), big AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS p
        FROM d)
), uni AS (
  SELECT token, COUNT(*) AS c1
  FROM (SELECT unnest(toks) AS token FROM d) GROUP BY token
), tot AS (
  SELECT SUM(c1) AS t FROM uni
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
), sb AS (
  SELECT b.doc_id,
         CAST(round(ln({_BI_LAMBDA} * (CAST(c.c2 AS DOUBLE) / u1.c1)
              + {1.0 - _BI_LAMBDA} * (CAST(u2.c1 AS DOUBLE) / tot.t))
              * {_LP_SCALE}) AS BIGINT) AS lp_fp
  FROM big b
  JOIN c2 c USING (w1, w2)
  JOIN uni u1 ON b.w1 = u1.token
  JOIN uni u2 ON b.w2 = u2.token
  CROSS JOIN tot
), fi AS (
  SELECT d.doc_id,
         CAST(round(ln(CAST(u.c1 AS DOUBLE) / tot.t) * {_LP_SCALE}) AS BIGINT)
           AS lp_fp
  FROM d JOIN uni u ON d.toks[1] = u.token CROSS JOIN tot
), s AS (
  SELECT * FROM sb UNION ALL SELECT * FROM fi
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(lp_fp) AS DOUBLE) / {_LP_SCALE} / COUNT(*) AS mean_logprob
FROM s GROUP BY doc_id
"""


register("bigram_logprob", q_bigram_logprob, ORACLE_BIGRAM_LOGPROB)


_GOPHER_RULES = ("r_tokens", "r_word_len", "r_stopwords", "r_top_word", "r_dup_bigram")


def q_quality_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule ablation of the Gopher gate: how many documents each
    rule rejects, and how many it UNIQUELY rejects (fails that rule,
    passes the other four) — the number that tells a curation owner
    which gates are load-bearing and which are redundant before they
    tune thresholds.

    Shape: rides the gate's single codegen'd projection, unpivots the
    five audit booleans row-locally, and reduces to a 5-row frame in
    one map-side-combinable agg."""
    g = q_gopher_quality_filter(spark, sf_dir)
    per_rule = []
    for r in _GOPHER_RULES:
        others = " AND ".join(x for x in _GOPHER_RULES if x != r)
        per_rule.append(
            f"named_struct('rule', '{r}', "
            f"'fail', CAST(NOT {r} AS INT), "
            f"'uniq', CAST((NOT {r}) AND {others} AS INT))"
        )
    return (
        g.select(F.explode(F.expr(f"array({', '.join(per_rule)})")).alias("x"))
        .select("x.rule", "x.fail", "x.uniq")
        .groupBy("rule")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fail").cast("bigint").alias("n_fail"),
            F.sum("uniq").cast("bigint").alias("n_unique_fail"),
        )
        .select(
            "rule",
            "n_docs",
            "n_fail",
            "n_unique_fail",
            F.expr("round(CAST(n_fail AS DOUBLE) / n_docs, 6)").alias("fail_rate"),
            F.expr("round(CAST(n_unique_fail AS DOUBLE) / n_docs, 6)").alias(
                "unique_fail_rate"
            ),
        )
    )


def _oracle_quality_ablation() -> str:
    per_rule = []
    for r in _GOPHER_RULES:
        others = " AND ".join(x for x in _GOPHER_RULES if x != r)
        per_rule.append(
            f"SELECT '{r}' AS rule, CAST(NOT {r} AS INT) AS fail, "
            f"CAST((NOT {r}) AND {others} AS INT) AS uniq FROM g2"
        )
    return (
        "WITH g2 AS MATERIALIZED (\n"
        + ORACLE_GOPHER_QUALITY_FILTER
        + "\n), unp AS (\n"
        + "\nUNION ALL\n".join(per_rule)
        + """
)
SELECT rule, COUNT(*) AS n_docs,
       CAST(SUM(fail) AS BIGINT) AS n_fail,
       CAST(SUM(uniq) AS BIGINT) AS n_unique_fail,
       round(CAST(SUM(fail) AS DOUBLE) / COUNT(*), 6) AS fail_rate,
       round(CAST(SUM(uniq) AS DOUBLE) / COUNT(*), 6) AS unique_fail_rate
FROM unp GROUP BY rule
"""
    )


ORACLE_QUALITY_ABLATION_REPORT = _oracle_quality_ablation()

register(
    "quality_ablation_report",
    q_quality_ablation_report,
    ORACLE_QUALITY_ABLATION_REPORT,
)


def q_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization check for the corpus LM: train the unigram model
    on the TRAINING sources (everything but src0, the held-out split
    `training_data_pipeline` also uses) and score the held-out docs
    under add-one smoothing — the train/test discipline that catches a
    model memorizing its own corpus. Per held-out doc: token count,
    OOV count, and the smoothed mean log-probability.

    Same plan as `unigram_logprob`: vocab-sized count table broadcast,
    scalars (N, V) broadcast, per-doc sums are exact fixed-point
    BIGINTs; the smoothing ratio (c+1)/(N+V+1) is exact integers into
    one ln."""
    docs = _docs(spark, sf_dir)
    train_tok = docs.filter(F.col("source") != "src0").select(
        F.explode(F.expr(_TOKS)).alias("token")
    )
    counts = train_tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    scalars = counts.agg(
        F.sum("freq").alias("n_train"), F.count(F.lit(1)).alias("v_train")
    )
    held = docs.filter(F.col("source") == "src0").select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("token")
    )
    scored = (
        held.join(F.broadcast(counts), "token", "left")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "lp_fp",
            F.expr(
                f"CAST(round(ln(CAST(coalesce(freq, 0) + 1 AS DOUBLE) "
                f"/ (n_train + v_train + 1)) * {_LP_SCALE}) AS BIGINT)"
            ),
        )
        .withColumn("oov", (F.col("freq").isNull()).cast("int"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("oov_tokens"),
        (
            F.sum("lp_fp").cast("double") / F.lit(float(_LP_SCALE)) / F.count(F.lit(1))
        ).alias("mean_logprob"),
    )


ORACLE_HELDOUT_PERPLEXITY = f"""
WITH train_tok AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents WHERE source != 'src0'
), c AS (
  SELECT token, COUNT(*) AS freq FROM train_tok GROUP BY 1
), s AS (
  SELECT SUM(freq) AS n_train, COUNT(*) AS v_train FROM c
), held AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents WHERE source = 'src0'
), scored AS (
  SELECT h.doc_id,
         CAST(round(ln(CAST(COALESCE(c.freq, 0) + 1 AS DOUBLE)
                       / (s.n_train + s.v_train + 1)) * {_LP_SCALE}) AS BIGINT) AS lp_fp,
         CASE WHEN c.freq IS NULL THEN 1 ELSE 0 END AS oov
  FROM held h LEFT JOIN c USING (token) CROSS JOIN s
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS oov_tokens,
       CAST(SUM(lp_fp) AS DOUBLE) / {_LP_SCALE} / COUNT(*) AS mean_logprob
FROM scored GROUP BY doc_id
"""

register("heldout_perplexity", q_heldout_perplexity, ORACLE_HELDOUT_PERPLEXITY)


_KN_D = 0.75  # absolute discount; 3/4 is exactly representable in binary


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out scoring under a Kneser-Ney bigram LM — the standard LM
    smoothing (Kneser & Ney 1995; Chen & Goodman 1999), one rung above
    `bigram_logprob`'s naive interpolation: the backoff distribution is
    the CONTINUATION distribution (in how many contexts does w2 appear)
    rather than raw frequency, which stops high-count-but-fixed-context
    tokens from leaking probability mass.

        p(w2|w1) = max(c(w1w2) - D, 0)/c(w1.) + D*N1+(w1,.)/c(w1.) * Pc(w2)
        Pc(w2)   = (N1+(.,w2) + 1) / (n_bigram_types + V + 1)

    The +1 on continuation counts (documented deviation) keeps held-out
    OOV tokens at finite log-prob — the same add-one discipline as
    `heldout_perplexity`. Unseen contexts back off to Pc alone.

    Train/test split: trained on every source but src0, scored on src0
    (the house held-out split). Exactness: all model inputs are integer
    counts; D = 0.75 is a dyadic rational; each probability is one
    fixed IEEE expression evaluated identically in both engines, and
    per-doc sums use the 1e-6 fixed-point ln grid that absorbs
    cross-engine ln() ulps.

    Scale: bigram stat tables are one explode + groupBy each (map-side
    combinable); scoring joins the held-out bigrams against them —
    broadcast here, shuffle joins at web scale where the bigram
    vocabulary outgrows broadcast range (the bigram_logprob note).
    """
    docs = _docs(spark, sf_dir).withColumn("toks", F.expr(_TOKS))
    train = docs.filter(F.col("source") != "src0")
    big_expr = (
        "zip_with(slice(toks, 1, greatest(0, size(toks) - 1)), "
        "slice(toks, 2, greatest(0, size(toks) - 1)), "
        "(a, b) -> struct(a AS w1, b AS w2))"
    )
    train_big = train.select(F.explode(F.expr(big_expr)).alias("p")).select(
        "p.w1", "p.w2"
    )
    c2 = train_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1ctx"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    scalars = c2.agg(F.count(F.lit(1)).alias("n_types")).crossJoin(
        train.select(F.explode("toks").alias("t")).agg(
            F.countDistinct("t").alias("v_train")
        )
    )
    held = docs.filter(F.col("source") == "src0").select(
        "doc_id", F.explode(F.expr(big_expr)).alias("p")
    ).select("doc_id", "p.w1", "p.w2")
    prob = (
        "CASE WHEN c1ctx IS NULL THEN "
        "CAST(coalesce(n1b, 0) + 1 AS DOUBLE) / (n_types + v_train + 1) "
        "ELSE greatest(CAST(coalesce(c2, 0) AS DOUBLE) - 0.75, 0.0) / c1ctx "
        "+ (0.75 * n1f / c1ctx) "
        "* (CAST(coalesce(n1b, 0) + 1 AS DOUBLE) / (n_types + v_train + 1)) END"
    )
    scored = (
        held.join(c2, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(bwd), "w2", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            F.expr(f"CAST(round(ln({prob}) * {_LP_SCALE}) AS BIGINT)").alias("lp_fp"),
            F.col("c2").isNull().cast("int").alias("unseen_bigram"),
            F.col("c1ctx").isNull().cast("int").alias("unseen_context"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("unseen_bigram").cast("bigint").alias("n_unseen_bigram"),
        F.sum("unseen_context").cast("bigint").alias("n_unseen_context"),
        (
            F.sum("lp_fp").cast("double") / F.lit(float(_LP_SCALE)) / F.count(F.lit(1))
        ).alias("mean_logprob"),
    )


ORACLE_KNESER_NEY_BIGRAM = f"""
WITH d AS (
  SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
), train_big AS (
  SELECT p[1] AS w1, p[2] AS w2
  FROM (SELECT unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS p
        FROM d WHERE source <> 'src0')
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM train_big GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1ctx, COUNT(*) AS n1f
  FROM c2 GROUP BY 1
), bwd AS (
  SELECT w2, COUNT(*) AS n1b FROM c2 GROUP BY 1
), scalars AS (
  SELECT (SELECT COUNT(*) FROM c2) AS n_types,
         (SELECT COUNT(DISTINCT t)
          FROM (SELECT unnest(toks) AS t FROM d WHERE source <> 'src0'))
           AS v_train
), held AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS p
        FROM d WHERE source = 'src0')
), scored AS (
  SELECT h.doc_id,
         CAST(round(ln(
           CASE WHEN ctx.c1ctx IS NULL THEN
             CAST(COALESCE(bwd.n1b, 0) + 1 AS DOUBLE) / (s.n_types + s.v_train + 1)
           ELSE greatest(CAST(COALESCE(c.c2, 0) AS DOUBLE) - 0.75, 0.0) / ctx.c1ctx
             + (0.75 * ctx.n1f / ctx.c1ctx)
             * (CAST(COALESCE(bwd.n1b, 0) + 1 AS DOUBLE) / (s.n_types + s.v_train + 1)) END
         ) * {_LP_SCALE}) AS BIGINT) AS lp_fp,
         CASE WHEN c.c2 IS NULL THEN 1 ELSE 0 END AS unseen_bigram,
         CASE WHEN ctx.c1ctx IS NULL THEN 1 ELSE 0 END AS unseen_context
  FROM held h
  LEFT JOIN c2 c ON h.w1 = c.w1 AND h.w2 = c.w2
  LEFT JOIN ctx ON h.w1 = ctx.w1
  LEFT JOIN bwd ON h.w2 = bwd.w2
  CROSS JOIN scalars s
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(unseen_bigram) AS BIGINT) AS n_unseen_bigram,
       CAST(SUM(unseen_context) AS BIGINT) AS n_unseen_context,
       CAST(SUM(lp_fp) AS DOUBLE) / {_LP_SCALE} / COUNT(*) AS mean_logprob
FROM scored GROUP BY doc_id
"""

register("kneser_ney_bigram", q_kneser_ney_bigram, ORACLE_KNESER_NEY_BIGRAM)


def q_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-perplexity filtering (Wenzek et al. 2020): score
    the held-out corpus slice under the Kneser-Ney bigram LM
    (`q_kneser_ney_bigram` — trained on the other sources) and gate on
    rank: the WORST-scoring 10% of documents (lowest mean log-prob =
    highest perplexity) are dropped, the rest keep a kept=true flag
    with their percentile rank. Deterministic thresholding: the cut is
    the exact order statistic over (mean_logprob, doc_id) — no
    approximate-percentile boundary conventions to disagree across
    engines; mean_logprob itself is the 1e-6 fixed-point fold both
    engines already reproduce bitwise.

    SCALE: the held-out slice is data-scaled (a fixed corpus share),
    so the global rank is NOT a bare orderBy window (the registry-wide
    plan gate rejects those) — it rides the same two-phase distributed
    prefix sum as sequence packing (`packing.with_global_offsets`,
    composite (mean_logprob, doc_id) order): range partitions, one
    #partitions-row driver hop, per-partition windows. The corpus-
    sized work is the LM scoring join, the already-gated
    kneser_ney_bigram plan."""
    from data_pipeline_platform_spark.functions.packing import (
        with_global_offsets,
    )

    scored = q_kneser_ney_bigram(spark, sf_dir).select(
        "doc_id", "n_bigrams", "mean_logprob", F.lit(1).alias("__one")
    )
    ranked = with_global_offsets(
        scored, ["mean_logprob", "doc_id"], "__one"
    ).withColumn("rnk", F.col("global_offset") + 1)
    n_docs = ranked.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        ranked.crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "n_bigrams",
            "mean_logprob",
            (F.col("rnk") > F.ceil(F.col("n_docs") * 0.10)).alias("kept"),
            (F.col("rnk") * 1.0 / F.col("n_docs")).alias("quality_pctile"),
        )
    )


ORACLE_PERPLEXITY_GATE = f"""
WITH scored AS ({ORACLE_KNESER_NEY_BIGRAM}),
r AS (
  SELECT doc_id, n_bigrams, mean_logprob,
         row_number() OVER (ORDER BY mean_logprob, doc_id) AS rnk,
         COUNT(*) OVER () AS n_docs
  FROM scored
)
SELECT doc_id, n_bigrams, mean_logprob,
       rnk > CEIL(n_docs * 0.10) AS kept,
       rnk * 1.0 / n_docs AS quality_pctile
FROM r
"""

register("perplexity_gate", q_perplexity_gate, ORACLE_PERPLEXITY_GATE)
