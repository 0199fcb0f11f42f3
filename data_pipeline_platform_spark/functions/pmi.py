"""Skip-gram PMI co-occurrence census (extension; no reference
counterpart — the reference has no text ops, see SURVEY.md §2.11).

`pmi_cooccurrence` is the association-mining pass under word2vec /
GloVe-style preprocessing: count unordered token pairs within a ±W
token window, then score each pair by pointwise mutual information
PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ). High-PMI pairs are collocations
("new york"); near-zero pairs co-occur by chance — the signal a
phrase-mining or stop-phrase pass feeds on.

Scale shape:

- pair generation is ROW-LOCAL over each doc's token array (the same
  upper-triangle-by-offset trick the basket census uses) — no
  positions self-join, no fact-fact shuffle;
- the pair census and the unigram census are the two map-side-
  combinable shuffles (pair keys are vocabulary², bounded far below
  corpus size after the min-count cut);
- totals broadcast back onto the dimension-sized census frame.

PMI itself is one ln over a ratio of exact counts (products taken in
DOUBLE with a fixed association order so both engines evaluate the
identical expression), rounded to 6dp — the same ln-portability
posture as `unigram_logprob` / `dsir_importance_weights`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

WINDOW = 2  # pair tokens up to this many positions apart
MIN_PAIR = 10  # census cut: pairs seen fewer times carry no stable PMI


def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(wa, wb, pair_count, pmi) for unordered within-±2 pairs seen
    >= MIN_PAIR times; wa <= wb canonicalizes the pair."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            F.split(F.trim("text"), r"\s+").alias("toks")
        )
    )
    pair_expr = (
        f"flatten(transform(sequence(1, size(toks)), i -> "
        f"  filter(transform(sequence(1, {WINDOW}), d -> "
        f"    CASE WHEN i + d <= size(toks) THEN named_struct("
        f"      'wa', least(element_at(toks, i), element_at(toks, i + d)), "
        f"      'wb', greatest(element_at(toks, i), element_at(toks, i + d))) "
        f"    ELSE NULL END), x -> x IS NOT NULL)))"
    )
    pairs = docs.select(F.explode(F.expr(pair_expr)).alias("p")).select(
        "p.wa", "p.wb"
    )
    pair_counts = (
        pairs.groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= MIN_PAIR)
    )
    n_pairs = pairs.groupBy().agg(F.count(F.lit(1)).alias("np"))
    uni = docs.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_tokens = uni.agg(F.sum("c").alias("nt"))
    return (
        pair_counts.join(
            F.broadcast(uni.select(F.col("tok").alias("wa"), F.col("c").alias("ca"))),
            "wa",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("wb"), F.col("c").alias("cb"))),
            "wb",
        )
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "wa",
            "wb",
            "pair_count",
            F.expr(
                "round(ln((CAST(pair_count AS DOUBLE) * nt * nt) / "
                "(CAST(np AS DOUBLE) * ca * cb)), 6)"
            ).alias("pmi"),
        )
    )


ORACLE_PMI_COOCCURRENCE = f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), pos AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM docs, LATERAL unnest(generate_series(1, len(toks))) t(i)
), pairs AS MATERIALIZED (
  SELECT least(a.tok, b.tok) AS wa, greatest(a.tok, b.tok) AS wb
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND {WINDOW}
), pair_counts AS (
  SELECT wa, wb, COUNT(*) AS pair_count FROM pairs GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_PAIR}
), np_t AS (SELECT COUNT(*) AS np FROM pairs),
uni AS (SELECT tok, COUNT(*) AS c FROM pos GROUP BY 1),
nt_t AS (SELECT SUM(c) AS nt FROM uni)
SELECT p.wa, p.wb, p.pair_count,
       round(ln((CAST(p.pair_count AS DOUBLE) * nt * nt) /
                (CAST(np AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
FROM pair_counts p
JOIN uni ua ON ua.tok = p.wa
JOIN uni ub ON ub.tok = p.wb, np_t, nt_t
"""

register("pmi_cooccurrence", q_pmi_cooccurrence, ORACLE_PMI_COOCCURRENCE)
