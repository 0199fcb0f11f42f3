"""Market-basket analysis (extension): frequent part pairs with lift —
the level-2 A-priori census, shaped for scale.

The naive shape self-joins the (order, part) table on order — a
fact-fact shuffle join whose output is quadratic in basket size and
whose join key (order) is fact-cardinality. Here baskets collapse to
one sorted-distinct array per order (one shuffle, map-side combinable),
pair generation is ROW-LOCAL over the array's upper triangle (bounded
by basket size, the same slice-transform trick as the PCA covariance),
and the pair census is a second map-side-combinable count whose keys
are item pairs — dimension-, not fact-, cardinality. Lift derives from
exact integer supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

MIN_SUPPORT = 3  # pair must co-occur in >= this many orders


def q_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in >= MIN_SUPPORT orders, with
    support counts and lift (co-occurrence vs independence)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (a, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "b -> named_struct('pa', a, 'pb', b))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pair_sup = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= MIN_SUPPORT)
    )
    single = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pair_sup.join(
            F.broadcast(single.select(F.col("l_partkey").alias("pa"), F.col("sup").alias("sup_a"))),
            "pa",
        )
        .join(
            F.broadcast(single.select(F.col("l_partkey").alias("pb"), F.col("sup").alias("sup_b"))),
            "pb",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "support_ab",
            F.expr(
                "round(CAST(support_ab * n_orders AS DOUBLE) / (sup_a * sup_b), 6)"
            ).alias("lift"),
        )
    )


ORACLE_FREQUENT_ITEMSETS = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pair_sup AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb, COUNT(*) AS support_ab
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), single AS (
  SELECT l_partkey, COUNT(*) AS sup FROM b GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem
)
SELECT p.pa, p.pb, p.support_ab,
       round(CAST(p.support_ab * n.n_orders AS DOUBLE) / (sa.sup * sb.sup), 6)
         AS lift
FROM pair_sup p
JOIN single sa ON sa.l_partkey = p.pa
JOIN single sb ON sb.l_partkey = p.pb, n
"""

register("frequent_itemsets", q_frequent_itemsets, ORACLE_FREQUENT_ITEMSETS)
