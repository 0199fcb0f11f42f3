"""Deterministic text augmentation (extension; the generation-side
sibling of the curation ops — augmentation multiplies training data,
curation prunes it).

``token_dropout`` implements seeded random token deletion (the EDA
baseline, Wei & Zou 2019): token at position p of doc d survives iff
``md5(d:p:seed) mod 100 >= rate_pct``.  The hash-per-(doc, position,
seed) construction is the package's standard engine-portable uniform
(same as `deterministic_sample` / `train_val_test_split`): no RNG state,
fully replayable — the same (doc, seed) always yields the same
augmented text, so augmented corpora are content-addressed and a rerun
produces byte-identical shards (critical for cache-addressed training
data).  Different seeds give independent augmentation epochs.

Everything is a row-local array lambda (JVM higher-order functions, no
UDF, no shuffle); the graded query emits per-doc token counts plus an
md5 fingerprint of the augmented text rather than the text itself, so
the oracle verifies the EXACT augmented content without megabytes of
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

RATE_PCT = 20  # drop ~20% of tokens
SEED = 7


def token_dropout(
    docs: DataFrame, rate_pct: int = RATE_PCT, seed: int = SEED
) -> DataFrame:
    """(doc_id, n_tokens, n_kept, aug_text) with seeded per-position
    dropout; pure Column expressions, safe on batch or streaming frames."""
    toks = "split(trim(text), '\\\\s+')"
    keep = (
        f"filter({toks}, (x, i) -> "
        f"pmod(CAST(conv(substring(md5(concat(doc_id, ':', i + 1, ':', {seed})), 1, 12), 16, 10) AS BIGINT), 100) >= {rate_pct})"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
        F.expr(f"size({keep})").cast("bigint").alias("n_kept"),
        F.expr(f"concat_ws(' ', {keep})").alias("aug_text"),
    )


def q_augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    return token_dropout(docs).select(
        "doc_id",
        "n_tokens",
        "n_kept",
        F.md5("aug_text").alias("aug_fingerprint"),
    )


ORACLE_AUGMENT_TOKEN_DROPOUT = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), kept AS (
  SELECT doc_id, t,
         list_filter(t, (x, i) ->
           ('0x' || substr(md5(doc_id || ':' || i || ':' || {SEED}), 1, 12))::BIGINT % 100 >= {RATE_PCT}
         ) AS k
  FROM toks
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(k) AS BIGINT) AS n_kept,
       md5(array_to_string(k, ' ')) AS aug_fingerprint
FROM kept
"""


register("augment_token_dropout", q_augment_token_dropout, ORACLE_AUGMENT_TOKEN_DROPOUT)
