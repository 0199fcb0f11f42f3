"""Text analysis operators over the `documents` table (M8 extension,
beyond the reference's surface — BASELINE.json north_star).

All hot-path logic is built-in JVM functions (split/transform/filter/
aggregate) — no Python UDFs — so the operators stay inside whole-stage
codegen and scale linearly with executors. Oracles: DuckDB list lambdas
mirror Spark's higher-order functions one-to-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# tiny embedded stopword list for quality scoring (language-agnostic demo)
STOPWORDS = ("the", "a", "of", "and", "to")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    # spread: the small-SF documents table is one row-group = one task,
    # which would serialize every per-row text kernel below. All outputs
    # in this module are per-doc rows or integer-sum aggregates, so the
    # repartition cannot change results.
    return spread_scan(load_table(spark, sf_dir, "documents"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token/char/quality statistics columns (pure Column exprs)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.withColumn("char_count", F.length(text_col).cast("long"))
        .withColumn("token_count", F.size(tokens).cast("long"))
        .withColumn("distinct_tokens", F.size(F.array_distinct(tokens)).cast("long"))
        .withColumn(
            "stopword_count",
            F.expr(
                f"CAST(size(filter(split(trim({text_col}), '\\\\s+'), "
                f"x -> x IN ({_STOP_SQL}))) AS BIGINT)"
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.col("stopword_count") * F.lit(1.0) / F.col("token_count"),
        )
        .withColumn(
            "type_token_ratio",
            F.col("distinct_tokens") * F.lit(1.0) / F.col("token_count"),
        )
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_text_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        "char_count",
        "token_count",
        "distinct_tokens",
        "stopword_count",
        "stopword_ratio",
        "type_token_ratio",
    )


ORACLE_TEXT_STATS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS char_count,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, char_count,
       CAST(len(toks) AS BIGINT) AS token_count,
       CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tokens,
       CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS BIGINT) AS stopword_count,
       CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS BIGINT) * 1.0 / len(toks) AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS BIGINT) * 1.0 / len(toks) AS type_token_ratio
FROM t
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (group-agg over derived stats)."""
    stats = with_text_stats(_docs(spark, sf_dir))
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("char_count").alias("total_chars"),
        F.sum("token_count").alias("total_tokens"),
        (F.sum("token_count").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


ORACLE_LANG_PROFILE = """
WITH t AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS char_count,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(char_count) AS BIGINT) AS total_chars,
       CAST(SUM(token_count) AS BIGINT) AS total_tokens,
       CAST(SUM(token_count) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY lang
"""


# GPT-2-style pre-tokenizer alternation, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB) implement identically: no
# lookahead, explicit ASCII classes. Order matters — contraction
# suffixes first, then space-prefixed word/number/punct runs, then
# whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under BOTH tokenizer models a data pipeline needs:
    whitespace tokens (cheap budget estimate) and a BPE-ish pre-token
    count (what a subword tokenizer would see). Pure Column exprs —
    regexp_count runs in codegen, one scan, no shuffle; the per-token
    char rate is a single division of exact BIGINTs."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).cast("long").alias(
            "bpe_tokens"
        ),
        F.length("text").cast("long").alias("char_count"),
    ).withColumn(
        "chars_per_bpe_token",
        F.col("char_count") * F.lit(1.0) / F.col("bpe_tokens"),
    )


_BPE_SQL = BPE_PATTERN.replace("'", "''")

ORACLE_BPE_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS char_count,
       CAST(length(text) AS BIGINT) * 1.0 /
         len(regexp_extract_all(text, '{_BPE_SQL}')) AS chars_per_bpe_token
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized text (stable
    content hash for exact-dup detection and incremental pipelines)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
       sha256(text) AS sha256
FROM documents
"""


# winnowing parameters: char k-grams, window of w consecutive hashes.
# Guarantee (Schleimer/Wilkerson/Aiken): any shared substring of length
# >= k + w - 1 produces at least one shared fingerprint.
WINNOW_K = 8
WINNOW_W = 4
WINNOW_MOD = 1_000_000_007
WINNOW_BASE = 31


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash family): Rabin-Karp
    polynomial hashes over char k-grams, one fingerprint per w-window
    minimum, distinct per doc — the local-fingerprint scheme used for
    substring-level duplicate detection (MOSS-style), vs the whole-doc
    md5 of `fingerprint`.

    All arithmetic is exact BIGINT mod a prime, expressed with
    higher-order functions (no Python, no UDF), so the DuckDB oracle
    replays every hash bitwise. The text is split into a char-code
    array ONCE (per-char `substring(text, i, 1)` would be an O(i) seek
    each — O(len^2 k) per doc, measured 3.5x slower); gram hashing then
    slices that array, O(len * k) total in one scan stage. The output
    is doc-grain (id, counts, checksum) so nothing heavy shuffles."""
    docs = _docs(spark, sf_dir)
    # Explicit size guards, not `sequence(1, greatest(0, ...))`: Spark's
    # sequence(1, 0) is the DESCENDING range [1, 0] — not empty — so the
    # ungated form feeds slice() a start of 0 on any doc shorter than
    # k + w - 1 chars and crashes (INVALID_PARAMETER_VALUE.START). The
    # DuckDB oracle's generate_series(1, 0) IS empty, so the guard also
    # restores engine agreement on short docs: zero grams, zero prints.
    hashes = (
        f"CASE WHEN size(__codes) >= {WINNOW_K} THEN "
        f"transform(sequence(1, size(__codes) - {WINNOW_K} + 1), "
        f"i -> aggregate(slice(__codes, i, {WINNOW_K}), CAST(0 AS BIGINT), "
        f"(acc, ch) -> (acc * {WINNOW_BASE} + ch) % {WINNOW_MOD})) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    fps = (
        f"CASE WHEN size(__h) >= {WINNOW_W} THEN "
        f"array_distinct(transform(sequence(1, size(__h) - {WINNOW_W} + 1), "
        f"j -> array_min(slice(__h, j, {WINNOW_W})))) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return (
        docs.withColumn(
            "__codes",
            F.expr("transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"),
        )
        .withColumn("__h", F.expr(hashes))
        .withColumn("__fps", F.expr(fps))
        .select(
            "doc_id",
            F.size("__h").cast("long").alias("n_grams"),
            F.size("__fps").cast("long").alias("n_fingerprints"),
            F.expr("aggregate(__fps, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
                "fp_checksum"
            ),
        )
    )


ORACLE_WINNOW_FINGERPRINTS = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(0, length(text) - {WINNOW_K} + 1)),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(0, {WINNOW_K - 1}),
                                   c -> CAST(ascii(text[i+c]) AS BIGINT))),
                  (acc, ch) -> (acc * {WINNOW_BASE} + ch) % {WINNOW_MOD})) AS hashes
  FROM documents
), f AS (
  SELECT doc_id, len(hashes) AS n_grams,
         list_distinct(list_transform(
           generate_series(1, greatest(0, len(hashes) - {WINNOW_W} + 1)),
           j -> list_min(hashes[j : j + {WINNOW_W} - 1]))) AS fps
  FROM g
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       -- coalesce: list_sum([]) is NULL in DuckDB, but Spark's
       -- aggregate() zero-seed yields 0 on a fingerprint-less short doc
       CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_checksum
FROM f
"""


def q_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency via explode + group (the canonical
    shuffle-then-aggregate text op; partial aggregation is map-side)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


ORACLE_TOKEN_FREQUENCY = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents)
GROUP BY token
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: score each doc against per-language marker
    token sets and pick argmax (deterministic tie-break by language name).

    A real n-gram model would be a broadcast-joined profile table; the
    plumbing (per-language score columns -> greatest -> argmax) is the
    same shape. The declared `lang` column is the ground truth the
    heuristic is compared against downstream."""
    markers = {
        "en": ("the", "and", "of"),
        "de": ("der", "und", "die"),
        "fr": ("le", "et", "la"),
        "es": ("el", "y", "de"),
        "zh": ("shi", "de_", "le_"),
    }
    docs = _docs(spark, sf_dir)
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    df = docs.withColumn("__toks", tokens)
    score_cols = []
    for lang, words in sorted(markers.items()):
        in_list = ", ".join(f"'{w}'" for w in words)
        col_name = f"__score_{lang}"
        df = df.withColumn(
            col_name, F.expr(f"size(filter(__toks, x -> x IN ({in_list})))")
        )
        score_cols.append((lang, col_name))
    # argmax with name tie-break: fold over (score, lang) structs
    struct_arr = F.array(
        *[F.struct(F.col(c).alias("s"), F.lit(lang).alias("l")) for lang, c in score_cols]
    )
    df = df.withColumn("__cands", struct_arr).withColumn(
        "predicted_lang",
        F.expr(
            "aggregate(__cands, __cands[0], (acc, x) -> "
            "CASE WHEN x.s > acc.s OR (x.s = acc.s AND x.l < acc.l) THEN x ELSE acc END).l"
        ),
    )
    return df.select("doc_id", "lang", "predicted_lang")


# language_id oracle: the same argmax is expressible in DuckDB but the
# marker tokens don't occur in the synthetic corpus (all scores 0 -> ties
# resolve to 'de' everywhere); keep the oracle to lock the tie-break
# semantics.
ORACLE_LANGUAGE_ID = """
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), scored AS (
  SELECT doc_id, lang,
    [
      {'s': len(list_filter(toks, x -> x IN ('der','und','die'))), 'l': 'de'},
      {'s': len(list_filter(toks, x -> x IN ('the','and','of'))), 'l': 'en'},
      {'s': len(list_filter(toks, x -> x IN ('el','y','de'))), 'l': 'es'},
      {'s': len(list_filter(toks, x -> x IN ('le','et','la'))), 'l': 'fr'},
      {'s': len(list_filter(toks, x -> x IN ('shi','de_','le_'))), 'l': 'zh'}
    ] AS cands
  FROM t
)
SELECT doc_id, lang,
       list_reduce(cands, (acc, x) ->
         CASE WHEN x.s > acc.s OR (x.s = acc.s AND x.l < acc.l) THEN x ELSE acc END).l
       AS predicted_lang
FROM scored
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (the LLM-data flagship): compute
    quality signals, filter to the keep-set, attach a dedup fingerprint,
    and emit the curated slice. One pass, no Python, fully pushed down —
    the shape of a 100 TB pretraining-data filter job."""
    docs = _docs(spark, sf_dir)
    scored = with_text_stats(docs)
    kept = scored.filter(
        (F.col("token_count") >= 20)
        & (F.col("type_token_ratio") >= 0.15)
        & (F.col("stopword_ratio") <= 0.5)
        & (F.col("char_count") >= 100)
    )
    return kept.select(
        "doc_id",
        "lang",
        "token_count",
        F.round("type_token_ratio", 6).alias("ttr"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    )


ORACLE_CURATION_PIPELINE = f"""
WITH t AS (
  SELECT doc_id, lang, text,
         CAST(length(text) AS BIGINT) AS char_count,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang, text, char_count,
         CAST(len(toks) AS BIGINT) AS token_count,
         CAST(len(list_distinct(toks)) AS BIGINT) * 1.0 / len(toks) AS ttr_raw,
         CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS BIGINT) * 1.0 / len(toks) AS swr
  FROM t
)
SELECT doc_id, lang, token_count, round(ttr_raw, 6) AS ttr,
       md5(lower(trim(text))) AS fingerprint
FROM scored
WHERE token_count >= 20 AND ttr_raw >= 0.15 AND swr <= 0.5 AND char_count >= 100
"""


# hashed linear classifier: D buckets, weights derived from the bucket
# index by a Knuth multiplicative mix — a stand-in for trained fasttext
# weights with the same inference shape (hash token -> bucket -> weight,
# sum, threshold). All arithmetic is nonnegative BIGINT mod, so the
# DuckDB oracle replays every score bitwise.
CLS_BUCKETS = 1024
CLS_HASH_MOD = 1_000_000_007
CLS_MIX = 2654435761
CLS_WRANGE = 2001  # weights in [-1000, 1000]


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fasttext-style hashed linear classifier inference over documents.

    Each token hashes (char-code polyhash) into one of CLS_BUCKETS
    buckets; the bucket's integer weight is summed over the doc and the
    sign is the keep/drop label. Pure projection: zero shuffle, no
    Python — at 100 TB classifier scoring rides the scan exactly like
    `curation_pipeline`'s heuristic filters. Swapping the derived
    weights for trained ones changes one expression, not the plan."""
    score = (
        "aggregate(split(lower(trim(text)), '\\\\s+'), CAST(0 AS BIGINT), "
        "(acc, tok) -> acc + ((aggregate(split(tok, ''), CAST(0 AS BIGINT), "
        f"(a, ch) -> (a * 31 + ascii(ch)) % {CLS_HASH_MOD}) % {CLS_BUCKETS}) "
        f"* {CLS_MIX}) % {CLS_WRANGE} - {(CLS_WRANGE - 1) // 2})"
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.expr(score).cast("long").alias("score"),
        (F.expr(score) > 0).alias("keep"),
    )


ORACLE_QUALITY_CLASSIFIER = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, len(toks) AS n_tokens,
    list_sum(list_transform(toks, tok ->
      ((list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(generate_series(1, length(tok)), i -> CAST(ascii(tok[i]) AS BIGINT))),
        (acc, ch) -> (acc * 31 + ch) % {CLS_HASH_MOD}) % {CLS_BUCKETS}) * {CLS_MIX})
      % {CLS_WRANGE} - {(CLS_WRANGE - 1) // 2}
    )) AS score
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(score AS BIGINT) AS score, score > 0 AS keep
FROM s
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by raw-ratio TF-IDF
    (score = tf * N/df — no logarithm, so both engines compute the
    identical double from exact integers and the grade stays bitwise;
    the ranking is monotone in the log form anyway).

    Shape at scale: token explode feeds ONE (doc, term) count shuffle;
    document frequencies aggregate from that frame (map-side combine);
    the corpus size N joins in as a broadcast scalar, never a driver
    round-trip; top-k is a rank-pushed window per doc."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * (F.col("n_docs") * F.lit(1.0) / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


ORACLE_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (n.n_docs * 1.0 / df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 3
"""


register("text_stats", q_text_stats, ORACLE_TEXT_STATS)
register("curation_pipeline", q_curation_pipeline, ORACLE_CURATION_PIPELINE)
register("lang_profile", q_lang_profile, ORACLE_LANG_PROFILE)
register("fingerprint", q_fingerprint, ORACLE_FINGERPRINT)
register("token_frequency", q_token_frequency, ORACLE_TOKEN_FREQUENCY)
register("language_id", q_language_id, ORACLE_LANGUAGE_ID)
register("bpe_token_stats", q_bpe_token_stats, ORACLE_BPE_TOKEN_STATS)
register("winnow_fingerprints", q_winnow_fingerprints, ORACLE_WINNOW_FINGERPRINTS)
register("quality_classifier", q_quality_classifier, ORACLE_QUALITY_CLASSIFIER)
register("tfidf_top_terms", q_tfidf_top_terms, ORACLE_TFIDF_TOP_TERMS)


# -- out-of-vocabulary rate (fluency / junk-document signal) -----------------

OOV_VOCAB_K = 1000  # corpus vocabulary = top-K tokens by frequency


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document: the share of a doc's tokens
    absent from the corpus's top-K frequency vocabulary — the classic
    cheap fluency filter (gibberish, wrong-language, and boilerplate
    docs score high; fluent prose scores low).

    Vocabulary selection is deterministic: rank by (freq DESC, token
    ASC) and keep row_number <= K, so the K-boundary tie-break replays
    identically in both engines. The rate itself is reported as exact
    BIGINT numerator/denominator plus ONE final double division —
    single IEEE ops are bitwise-portable; only float accumulation
    order is not.

    Plan shape at 100 TB: the vocabulary is a token-keyed aggregate of
    the exploded corpus (one shuffle, partial-agg map-side) reduced to
    K rows on the driver side of a window — then BROADCAST back, so
    the per-doc miss count is a broadcast left-anti join + one doc-keyed
    aggregation. The corpus itself shuffles once, keyed on doc_id."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    # top-K by (freq desc, token asc) — a total order, so orderBy+limit
    # (parallel TakeOrderedAndProject) is exactly row_number() <= K
    # without serializing the vocab census through one window task
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(OOV_VOCAB_K)
        .select("token")
    )
    oov = (
        toks.join(F.broadcast(vocab), "token", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .join(oov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            (
                F.coalesce("n_oov", F.lit(0)).cast("double") / F.col("n_tokens")
            ).alias("oov_rate"),
        )
    )


ORACLE_OOV_RATE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents
), vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS freq,
           row_number() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
    FROM toks GROUP BY token
  ) WHERE rk <= {OOV_VOCAB_K}
), oov AS (
  SELECT doc_id, COUNT(*) AS n_oov
  FROM toks ANTI JOIN vocab USING (token)
  GROUP BY doc_id
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       COALESCE(ANY_VALUE(o.n_oov), 0) AS n_oov,
       CAST(COALESCE(ANY_VALUE(o.n_oov), 0) AS DOUBLE) / COUNT(*) AS oov_rate
FROM toks t LEFT JOIN oov o ON t.doc_id = o.doc_id
GROUP BY t.doc_id
"""


register("oov_rate", q_oov_rate, ORACLE_OOV_RATE)


_ENT_SCALE = 1_000_000


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish detector: base64 blobs and hex dumps sit far above
    natural text (~4.0-4.3 bits vs ~2.5-3.2), runs of one character
    far below. RefinedWeb-class pipelines gate on exactly this signal.

    ZERO shuffle: the char census, the probability terms, and the
    entropy fold are all higher-order expressions over the row's own
    text (distinct chars per doc is alphabet-bounded, so the
    O(|alphabet| * len) row-local scan is cheap). ln enters as the
    usual fixed-point rounding (DETERMINISM.md #2), the per-char terms
    sum as exact BIGINTs, and the final bits-conversion divides once.
    """
    docs = _docs(spark, sf_dir)
    # chars: the bpe.py split pattern keeps no empties
    expr = f"""
    CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
      round(
        -CAST(aggregate(
          transform(array_distinct(filter(split(text, '(?!^)'), x -> x != '')),
                    ch -> CAST(size(filter(split(text, '(?!^)'), x -> x = ch)) AS BIGINT)),
          CAST(0 AS BIGINT),
          (acc, c) -> acc + c * CAST(round(
            ln(CAST(c AS DOUBLE) / length(text)) * {_ENT_SCALE}) AS BIGINT)
        ) AS DOUBLE) / length(text) / {_ENT_SCALE} / ln(2.0), 6)
    END
    """
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_text"),
        F.expr(expr).alias("entropy_bits"),
    )


ORACLE_CHAR_ENTROPY = f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n,
         list_transform(generate_series(1, length(text)), i -> text[i:i]) AS chars
  FROM documents
), counted AS (
  SELECT doc_id, n,
         list_transform(list_distinct(chars),
           ch -> CAST(len(list_filter(chars, x -> x = ch)) AS BIGINT)) AS counts
  FROM base
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_text,
       CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         round(
           -CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(counts, c -> c * CAST(round(
               ln(CAST(c AS DOUBLE) / n) * {_ENT_SCALE}) AS BIGINT))),
             (acc, t) -> acc + t) AS DOUBLE) / n / {_ENT_SCALE} / ln(2.0), 6)
       END AS entropy_bits
FROM counted
"""

register("char_entropy", q_char_entropy, ORACLE_CHAR_ENTROPY)


def q_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-as-data: the language-ID confusion matrix (true lang x
    predicted lang with counts, per-cell share of the true class) plus
    per-class precision/recall — what a model-quality dashboard ingests
    after every classifier change. Composes the verified `language_id`
    op; the oracle nests its SQL verbatim (DETERMINISM.md #9).

    Shape: the classifier rides the scan (row-local argmax); the matrix
    is one map-side-combinable count keyed on (lang, predicted);
    per-class totals broadcast back onto the |langs|² frame."""
    pred = q_language_id(spark, sf_dir)
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    true_tot = cells.groupBy("lang").agg(F.sum("n").alias("n_true"))
    pred_tot = cells.groupBy("predicted_lang").agg(F.sum("n").alias("n_pred"))
    return (
        cells.join(F.broadcast(true_tot), "lang")
        .join(F.broadcast(pred_tot), "predicted_lang")
        .select(
            "lang",
            "predicted_lang",
            "n",
            F.expr("round(CAST(n AS DOUBLE) / n_true, 6)").alias("recall_share"),
            F.expr("round(CAST(n AS DOUBLE) / n_pred, 6)").alias("precision_share"),
        )
    )


ORACLE_LANGUAGE_CONFUSION = f"""
WITH pred AS MATERIALIZED ({ORACLE_LANGUAGE_ID}),
cells AS (
  SELECT lang, predicted_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
), true_tot AS (
  SELECT lang, SUM(n) AS n_true FROM cells GROUP BY 1
), pred_tot AS (
  SELECT predicted_lang, SUM(n) AS n_pred FROM cells GROUP BY 1
)
SELECT c.lang, c.predicted_lang, c.n,
       round(CAST(c.n AS DOUBLE) / t.n_true, 6) AS recall_share,
       round(CAST(c.n AS DOUBLE) / p.n_pred, 6) AS precision_share
FROM cells c
JOIN true_tot t ON t.lang = c.lang
JOIN pred_tot p ON p.predicted_lang = c.predicted_lang
"""

register("language_confusion", q_language_confusion, ORACLE_LANGUAGE_CONFUSION)
