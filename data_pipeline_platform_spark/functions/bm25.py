"""BM25 lexical retrieval (extension): the other half of the search
story next to the vector/ANN family — Okapi BM25 scoring of every
document against a query term set, as one broadcast-joined scan.

Query here is "more like doc 0": its top-3 tokens by in-doc frequency
(deterministic tie-break). Real deployments pass arbitrary term lists
to `bm25_scores`.

Scale shape: the term statistics (df per query term — QUERY-sized, not
vocab-sized) and the scalar corpus stats broadcast; scoring touches
only the (doc, query-term) postings via one broadcast semi-structure
join; per-doc sums are fixed-point BIGINTs so the 2-3-term additions
are order-free (DETERMINISM.md #2/#6 — a plain double sum over a
groupBy would be partition-order-dependent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

BM25_K1 = 1.2
BM25_B = 0.75
_SCALE = 1_000_000
TOP_DOCS = 20


def _postings(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))


def bm25_scores(docs: DataFrame, query_terms: DataFrame) -> DataFrame:
    """Score every doc against `query_terms` (a one-column `token`
    frame). Returns (doc_id, n_hit_terms, score)."""
    post = _postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    df_t = (
        post.join(F.broadcast(query_terms), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    hits = (
        post.join(F.broadcast(query_terms), "token")
        .join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    contrib = hits.select(
        "doc_id",
        F.expr(
            f"CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) "
            f"* (tf * ({BM25_K1} + 1.0)) "
            f"/ (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl "
            f"/ (CAST(total_len AS DOUBLE) / n_docs))) "
            f"* {_SCALE}) AS BIGINT)"
        ).alias("c_fp"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("c_fp").alias("s_fp"),
        )
        .select(
            "doc_id",
            "n_hit_terms",
            F.expr(f"round(CAST(s_fp AS DOUBLE) / {_SCALE}, 6)").alias("score"),
        )
    )


def q_bm25_more_like_doc0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by BM25 against doc 0's top-3 tokens (doc 0 itself
    excluded — the more-like-this query)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    post = _postings(docs)
    # (tf desc, token asc) is a total order over doc 0's postings, so
    # orderBy+limit (TakeOrderedAndProject) replaces the global window
    qterms = (
        post.filter(F.col("doc_id") == 0)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(3)
        .select("token")
    )
    scored = bm25_scores(docs, qterms).filter(F.col("doc_id") != 0)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(TOP_DOCS)


ORACLE_BM25_MORE_LIKE_DOC0 = f"""
WITH post AS MATERIALIZED (
  SELECT doc_id, token, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
  ) WHERE token != '' GROUP BY 1, 2
), qterms AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY tf DESC, token ASC) AS rk
    FROM post WHERE doc_id = 0
  ) WHERE rk <= 3
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
), df_t AS (
  SELECT token, COUNT(*) AS df FROM post JOIN qterms USING (token) GROUP BY 1
), contrib AS (
  SELECT p.doc_id,
         CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * ({BM25_K1} + 1.0))
           / (p.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl
              / (CAST(s.total_len AS DOUBLE) / s.n_docs)))
           * {_SCALE}) AS BIGINT) AS c_fp
  FROM post p
  JOIN qterms USING (token)
  JOIN df_t d USING (token)
  JOIN dl l ON l.doc_id = p.doc_id, stats s
)
SELECT doc_id, COUNT(*) AS n_hit_terms,
       round(CAST(CAST(SUM(c_fp) AS BIGINT) AS DOUBLE) / {_SCALE}, 6) AS score
FROM contrib
WHERE doc_id != 0
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_DOCS}
"""

register("bm25_more_like_doc0", q_bm25_more_like_doc0, ORACLE_BM25_MORE_LIKE_DOC0)
