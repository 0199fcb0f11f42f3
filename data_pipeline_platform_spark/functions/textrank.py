"""TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
the word co-occurrence graph. Where RAKE (rake.py) scores phrases by
degree/frequency heuristics, TextRank lets importance FLOW — a word
ranks high when its neighbors rank high — which is the standard
unsupervised keyword baseline next to tf-idf and RAKE.

Spark-first shape:
- the co-occurrence graph derives relationally: adjacent-token pairs
  per document (zip_with over the token array — narrow, no shuffle),
  made undirected + distinct. The node set is VOCABULARY-bounded, so
  everything after the one fact-sized tokenize pass runs on a frame
  that does not grow with the corpus.
- ranking reuses pagerank_fixed_point (graph.py): exact BIGINT
  fixed-point PageRank, Pregel-as-joins, every iteration keyed on the
  word — the oracle replays the identical iterations as a CTE chain
  (the round-replay technique), so the output is bitwise including
  rank ties (broken on the word).

Reference parity: none (new capability, SURVEY.md §6 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_fixed_point,
)

TR_ITERATIONS = 3
TR_TOP = 20


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TR_TOP corpus keywords by TextRank over the adjacency
    co-occurrence graph (window = 1, unweighted, undirected — the
    original paper's configuration)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.split(F.col("text"), " ").alias("t"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (a, b) -> struct(a, b))"
            )
        ).alias("p")
    ).select(
        F.least("p.a", "p.b").alias("w1"), F.greatest("p.a", "p.b").alias("w2")
    )
    e0 = pairs.filter(F.col("w1") != F.col("w2")).distinct()
    edges = e0.select(F.col("w1").alias("src"), F.col("w2").alias("dst")).unionByName(
        e0.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    )
    ranks = pagerank_fixed_point(edges, iterations=TR_ITERATIONS)
    return (
        ranks.select(F.col("node").alias("word"), "rank_fp")
        .orderBy(F.col("rank_fp").desc(), "word")
        .limit(TR_TOP)
    )


def _tr_round_sql(i: int) -> str:
    prev = f"r{i - 1}"
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    return f"""
, r{i} AS MATERIALIZED (
  SELECT e.dst AS node,
         {base} + ({PR_DAMP_NUM} * SUM({prev}.r // d.deg)) // {PR_DAMP_DEN} AS r
  FROM e JOIN deg d ON e.src = d.src JOIN {prev} ON e.src = {prev}.node
  GROUP BY e.dst
)"""


ORACLE_TEXTRANK_KEYWORDS = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), adj AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
  FROM toks
), e0 AS (
  SELECT DISTINCT least(p.a, p.b) AS w1, greatest(p.a, p.b) AS w2
  FROM adj WHERE p.a != p.b
), e AS (
  SELECT w1 AS src, w2 AS dst FROM e0
  UNION ALL
  SELECT w2 AS src, w1 AS dst FROM e0
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg
){''.join(_tr_round_sql(i) for i in range(1, TR_ITERATIONS + 1))}
SELECT node AS word, CAST(r AS BIGINT) AS rank_fp
FROM r{TR_ITERATIONS}
ORDER BY rank_fp DESC, word
LIMIT {TR_TOP}
"""


register("textrank_keywords", q_textrank_keywords, ORACLE_TEXTRANK_KEYWORDS)
