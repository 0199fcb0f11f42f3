"""RAKE keyword extraction (Rose et al. 2010) — the keyword-mining
member of the text family (tf-idf, BM25, and PMI collocations ship;
RAKE is the stopword-delimited PHRASE scorer they don't cover).

Candidate phrases are maximal runs of non-stopword tokens (the
gaps-and-islands trick on token positions, window partitioned per
document); word degree = sum of the lengths of phrases containing the
word, word frequency = its occurrence count across phrases, word score
= degree/frequency kept in 1e-6 FIXED POINT integer floor division so
both engines sum identical BIGINTs (float score sums would be
order-dependent); phrase score = sum of member word scores (with
multiplicity). Identical phrase texts always score identically, so the
final frame groups by phrase with an occurrence count.

Scale shape: one positional explode (row-local), one doc-partitioned
window for the islands, two combinable groupBys (phrase stats, word
stats), one w-keyed join of phrase words to word scores (AQE picks
broadcast only when the vocab side is actually small — at corpus scale
word scores are vocabulary-sized and must shuffle), and a
TakeOrderedAndProject head. No global window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sources.readers import load_table

#: function words of the synthetic corpus (articles + bare adjectives)
_STOP = ("the", "a", "fast", "slow", "big", "small")
_FP = 1_000_000
_TOP_K = 15


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
    )
    ns = tok.filter(~F.col("token").isin(*_STOP))
    w = Window.partitionBy("doc_id").orderBy("pos")
    g = ns.withColumn("grp", F.col("pos") - F.row_number().over(w))
    phrases = g.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(pos, token))), x -> x.token)"),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    pw = phrases.select(
        "doc_id", "grp", "phrase", "plen",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wscore = (
        pw.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
        .select("w", F.expr(f"deg * {_FP} DIV freq").alias("score_fp"))
    )
    # no broadcast hint: word scores are VOCABULARY-sized (unbounded at
    # corpus scale) — AQE broadcasts when the actual build side is small
    # and shuffles on w otherwise
    psc = (
        pw.join(wscore, "w")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("score_fp").alias("fp"))
    )
    return (
        psc.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min("fp").alias("fp"))
        .orderBy(F.col("fp").desc(), "phrase")
        .limit(_TOP_K)
        .select(
            "phrase",
            "n_occ",
            (F.col("fp") / float(_FP)).alias("score"),
        )
    )


ORACLE_RAKE_KEYWORDS = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS token
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
), ns AS (
  SELECT * FROM tok
  WHERE token NOT IN ('the', 'a', 'fast', 'slow', 'big', 'small')
), g AS (
  SELECT doc_id, pos, token,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM ns
), ph AS (
  SELECT doc_id, grp, string_agg(token, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM g GROUP BY 1, 2
), pw AS (
  SELECT doc_id, grp, phrase, plen, unnest(string_split(phrase, ' ')) AS w
  FROM ph
), wsc AS (
  SELECT w, CAST(CAST(SUM(plen) AS BIGINT) * {_FP} // COUNT(*) AS BIGINT)
           AS score_fp
  FROM pw GROUP BY w
), psc AS (
  SELECT p.doc_id, p.grp, p.phrase, CAST(SUM(score_fp) AS BIGINT) AS fp
  FROM pw p JOIN wsc USING (w)
  GROUP BY 1, 2, 3
)
SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
       MIN(fp) / {_FP}.0 AS score
FROM psc
GROUP BY phrase
ORDER BY MIN(fp) DESC, phrase
LIMIT {_TOP_K}
"""

register("rake_keywords", q_rake_keywords, ORACLE_RAKE_KEYWORDS)
