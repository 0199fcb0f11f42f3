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
