"""Record linkage / entity resolution (extension; no reference
counterpart — the dedup family in functions/dedup.py finds duplicates
WITHIN one corpus; linkage matches records ACROSS two sources whose
identifiers don't line up, the classic Fellegi-Sunter setting).

The canonical at-scale shape (Christen, "Data Matching", 2012):

1. **Blocking** — never score the |L| x |R| cross product.  Each side
   emits a deterministic block key (here: the record's first name
   token); only pairs sharing a key are candidates.  This is ONE
   equi-join shuffle; candidate count is the sum of per-block products,
   bounded by the blocking key's selectivity, not |L| x |R|.
2. **Comparison** — a row-local similarity on each candidate pair (here:
   Jaccard over distinct name tokens via array_intersect — JVM
   built-ins, no UDF).
3. **Decision** — threshold the score.

``blocked_link`` is the generic engine; the graded query links part
names against a deterministically perturbed copy of themselves (every
record whose key is not divisible by 3 loses its second name token, ids
offset into a disjoint range), so precision/recall behavior is exactly
reproducible and the DuckDB oracle replays the whole pipeline —
blocking, set-Jaccard, threshold — bitwise.

At 100 TB: blocking keys with heavy skew (a block holding 1% of each
side still yields 10^14 pairs) are the known failure mode — pair the op
with `skew_diagnosis` (functions/scale.py) and use a composite or
salted block key; the engine takes any Column expression as the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register


def blocked_link(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_cols: tuple = ("left_id", "right_id"),
) -> DataFrame:
    """Link two sides prepared as (id, toks array<string>, bk string);
    returns (left_id, right_id, n_common, jaccard) for candidate pairs
    sharing a block key with distinct-token Jaccard >= threshold."""
    l = left.select(
        F.col("id").alias(id_cols[0]),
        F.array_distinct("toks").alias("lt"),
        F.col("bk"),
    )
    r = right.select(
        F.col("id").alias(id_cols[1]),
        F.array_distinct("toks").alias("rt"),
        F.col("bk"),
    )
    inter = F.size(F.array_intersect("lt", "rt"))
    union = F.size("lt") + F.size("rt") - inter
    return (
        l.join(r, "bk")  # the ONE shuffle; candidates = same-block pairs
        .select(
            id_cols[0],
            id_cols[1],
            inter.cast("bigint").alias("n_common"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def q_record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link part names to a perturbed copy of themselves: right-side
    records keep their name only when p_partkey % 3 == 0, otherwise the
    second token is dropped (a one-token typo/omission); right ids are
    offset by 10^7 so the id spaces are disjoint like real systems.

    Block key = (first token, last token) — COMPOSITE blocking, the
    standard selectivity lever: first-token-only blocks average
    |parts|/|vocab| rows and the candidate set grows quadratically in
    block size (measured 14x slower at sf0.1), while both the first and
    the last token survive the drop-one-middle-token perturbation, so
    recall on true matches is unchanged and candidates shrink by ~vocab
    size."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    part = spread_scan(load_table(spark, sf_dir, "part"))
    toks = F.split(F.col("p_name"), " ")
    bk = F.concat_ws("|", F.element_at(toks, 1), F.element_at(toks, -1))
    left = part.select(
        F.col("p_partkey").alias("id"),
        toks.alias("toks"),
        bk.alias("bk"),  # block key from the RAW order
    )
    right = part.select(
        (F.col("p_partkey") + 10_000_000).alias("id"),
        F.when(F.col("p_partkey") % 3 == 0, toks)
        .otherwise(
            F.concat(
                F.slice(toks, 1, 1),
                F.expr("slice(split(p_name, ' '), 3, size(split(p_name, ' ')))"),
            )
        )
        .alias("toks"),
        bk.alias("bk"),
    )
    return blocked_link(left, right, threshold=0.5)


ORACLE_RECORD_LINKAGE_PARTS = """
WITH l AS (
  SELECT p_partkey AS left_id,
         list_distinct(string_split(p_name, ' ')) AS lt,
         string_split(p_name, ' ')[1] || '|' || string_split(p_name, ' ')[-1] AS bk
  FROM part
), r0 AS (
  SELECT p_partkey + 10000000 AS right_id,
         string_split(p_name, ' ') AS t,
         p_partkey % 3 = 0 AS keep
  FROM part
), r AS (
  SELECT right_id,
         list_distinct(CASE WHEN keep THEN t
                            ELSE list_concat(t[1:1], t[3:]) END) AS rt,
         t[1] || '|' || t[-1] AS bk
  FROM r0
), cand AS (
  SELECT left_id, right_id,
         len(list_intersect(lt, rt)) AS n_common,
         len(lt) + len(rt) - len(list_intersect(lt, rt)) AS n_union
  FROM l JOIN r USING (bk)
)
SELECT left_id, right_id,
       CAST(n_common AS BIGINT) AS n_common,
       n_common / n_union AS jaccard
FROM cand
WHERE n_common / n_union >= 0.5
"""


register("record_linkage_parts", q_record_linkage_parts, ORACLE_RECORD_LINKAGE_PARTS)
