"""DSIR-style importance weighting (extension; no reference
counterpart): score every document by how much more likely its hashed
n-gram features are under a TARGET domain than under the RAW corpus —
the data-selection estimator of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling").

Distributed shape, in scale order:
- features are row-local (unigrams + bigrams hashed into DSIR_BUCKETS
  buckets via md5 — no vocabulary table, which is the point of hashed
  DSIR: the feature space is fixed-width no matter how large the
  corpus);
- the two bucket censuses (target, raw) are map-side-combinable
  groupBys whose results are <= DSIR_BUCKETS rows — they BROADCAST;
- per-doc scoring is one explode + broadcast-join + doc-keyed sum of
  fixed-point BIGINTs (order-free; the 1e-6 grid absorbs ln() ulps,
  the same discipline as bigram_logprob).

So the corpus is scanned twice and shuffled once (by doc_id) — nothing
scales with vocabulary. Target here is lang='en' (a quality/domain
proxy the test tables support); real deployments pass a curated corpus
as the target frame via `dsir_log_ratios`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

DSIR_BUCKETS = 256
_LP_SCALE = 1_000_000  # fixed-point grid for ln() sums

_TOKS = "split(trim(text), '\\\\s+')"

# all gram features of a doc: unigrams ++ bigrams, one array expression
_GRAMS = (
    f"concat({_TOKS}, "
    f"zip_with(slice({_TOKS}, 1, greatest(0, size({_TOKS}) - 1)), "
    f"slice({_TOKS}, 2, greatest(0, size({_TOKS}) - 1)), "
    "(a, b) -> concat(a, ' ', b)))"
)

# md5 -> 16-bit prefix value -> bucket. The Spark side decodes the hex
# prefix with the native conv() expression (exact for 4 hex digits:
# max 65535); the DuckDB oracle keeps the equivalent char fold — both
# are the integer value of the same 4 hex chars, so parity is bitwise.
# (A regex-split + aggregate() lambda fold computed the same value
# interpreted, ~4 lambda steps + a regex per gram — guide §4.)
_BUCKET_SPARK = (
    f"CAST(conv(substring(md5(g), 1, 4), 16, 10) AS BIGINT) % {DSIR_BUCKETS}"
)


def _bucketed(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.explode(F.expr(_GRAMS)).alias("g")
    ).select("doc_id", "lang", F.expr(_BUCKET_SPARK).alias("b"))


def dsir_log_ratios(bucketed: DataFrame, target: DataFrame) -> DataFrame:
    """Per-bucket smoothed log importance ratio
    ln( p_target(b) / p_raw(b) ) as fixed-point BIGINT. Both inputs are
    (.., b) occurrence frames; outputs <= DSIR_BUCKETS rows."""
    raw_c = bucketed.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_c = target.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    raw_t = bucketed.agg(F.count(F.lit(1)).alias("tr"))
    tgt_t = target.agg(F.count(F.lit(1)).alias("tt"))
    return (
        raw_c.join(tgt_c, "b", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(raw_t))
        .crossJoin(F.broadcast(tgt_t))
        .select(
            "b",
            F.expr(
                f"CAST(round(ln("
                f"(CAST(ct + 1 AS DOUBLE) / CAST(tt + {DSIR_BUCKETS} AS DOUBLE)) "
                f"/ (CAST(cr + 1 AS DOUBLE) / CAST(tr + {DSIR_BUCKETS} AS DOUBLE))"
                f") * {_LP_SCALE}) AS BIGINT)"
            ).alias("lr_fp"),
        )
    )


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DSIR importance weight toward the lang='en' target:
    doc_id, lang, n_grams, avg_logweight (mean per-gram log ratio).
    Positive = the doc's features look more target-like than the corpus
    average; resampling keeps docs proportional to exp(weight)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    from data_pipeline_platform_spark.utils.cache import tracked_persist

    docs = load_table(spark, sf_dir, "documents")
    # three consumers (raw census, target census, scoring join) — pin
    # the hashed occurrence frame once; it is the expensive projection
    # (two md5+fold evaluations per token)
    bucketed = tracked_persist(_bucketed(docs))
    lr = dsir_log_ratios(bucketed, bucketed.filter(F.col("lang") == "en"))
    return (
        bucketed.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_fp").cast("bigint").alias("sum_fp"),
        )
        .select(
            "doc_id",
            "lang",
            "n_grams",
            F.expr(
                f"round(CAST(sum_fp AS DOUBLE) / {_LP_SCALE}.0 / n_grams, 6)"
            ).alias("avg_logweight"),
        )
    )


_BUCKET_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, 4), "
    "i -> CAST(strpos('0123456789abcdef', md5(g)[i:i]) - 1 AS BIGINT))), "
    f"(acc, c) -> acc * 16 + c) % {DSIR_BUCKETS}"
)

ORACLE_DSIR_IMPORTANCE_WEIGHTS = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), bigidx AS (
  SELECT doc_id, lang, toks,
         unnest(generate_series(1, len(toks) - 1)) AS i
  FROM base
), grams AS (
  SELECT doc_id, lang, unnest(toks) AS g FROM base
  UNION ALL
  SELECT doc_id, lang, toks[i] || ' ' || toks[i + 1] AS g FROM bigidx
), bucketed AS MATERIALIZED (
  SELECT doc_id, lang, {_BUCKET_DUCK} AS b FROM grams
), raw_c AS (
  SELECT b, COUNT(*) AS cr FROM bucketed GROUP BY 1
), tgt_c AS (
  SELECT b, COUNT(*) AS ct FROM bucketed WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT (SELECT COUNT(*) FROM bucketed) AS tr,
         (SELECT COUNT(*) FROM bucketed WHERE lang = 'en') AS tt
), lr AS (
  SELECT r.b,
         CAST(round(ln(
           (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / CAST(tot.tt + {DSIR_BUCKETS} AS DOUBLE))
           / (CAST(r.cr + 1 AS DOUBLE) / CAST(tot.tr + {DSIR_BUCKETS} AS DOUBLE))
         ) * {_LP_SCALE}) AS BIGINT) AS lr_fp
  FROM raw_c r LEFT JOIN tgt_c t USING (b), tot
)
SELECT s.doc_id, s.lang, COUNT(*) AS n_grams,
       round(CAST(CAST(SUM(l.lr_fp) AS BIGINT) AS DOUBLE)
             / {_LP_SCALE}.0 / COUNT(*), 6) AS avg_logweight
FROM bucketed s JOIN lr l USING (b)
GROUP BY s.doc_id, s.lang
"""

register(
    "dsir_importance_weights",
    q_dsir_importance_weights,
    ORACLE_DSIR_IMPORTANCE_WEIGHTS,
)
