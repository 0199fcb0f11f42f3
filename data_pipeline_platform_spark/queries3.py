"""Query suite, batch 4: TPC-H classic shapes adapted to the driver
schema (Q7 volume between nations, Q10 returned items, Q14 promo
revenue, Q19 bracket predicates, Q22 balance cohorts). Same bitwise-
parity conventions as queries.py (integer-cents money arithmetic).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.queries import _cents, _t


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue volume customer-nation x supplier-nation
    by year (two dim joins on different keys + fact-fact join)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.cn_key)
        .join(F.broadcast(n2), supp.s_nationkey == n2.sn_key)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg((F.sum(revenue_c) / 10000.0).alias("volume"))
    )


ORACLE_NATION_VOLUME = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returns."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg((F.sum(revenue_c) / 10000.0).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_ITEMS = """
SELECT c_custkey, c_name, c_mktsegment,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey LIMIT 20
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from one part type family —
    conditional aggregate over a join, exact integer arithmetic until the
    final ratio."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type").contains("BRASS"), revenue_c).otherwise(F.lit(0)))
            .cast("double")
            / F.sum(revenue_c).cast("double")
            * 100.0
        ).alias("brass_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_PROMO_REVENUE_SHARE = """
WITH j AS (
  SELECT p_type,
         CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rc
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT CAST(SUM(CASE WHEN p_type LIKE '%BRASS%' THEN rc ELSE 0 END) AS DOUBLE)
         / CAST(SUM(rc) AS DOUBLE) * 100.0 AS brass_revenue_pct,
       COUNT(*) AS n_items
FROM j
"""


def q_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs bracket predicate (brand x size x
    quantity bands) — the disjunctive-pushdown stress case."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 50)))
    )
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return joined.filter(cond).agg(
        (F.sum(revenue_c) / 10000.0).alias("bracket_revenue"),
        F.count(F.lit(1)).alias("n_matched"),
    )


ORACLE_BRACKET_PREDICATES = """
SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS bracket_revenue,
       COUNT(*) AS n_matched
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q_balance_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with below-
    threshold order activity, by cohort (scalar subquery + join +
    HAVING-style post-filter)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_cents("c_acctbal")) / 100.0 / F.count(F.lit(1))).alias("a"))
    )
    rich = cust.crossJoin(F.broadcast(avg_pos)).filter(F.col("c_acctbal") > F.col("a"))
    order_counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    quiet_rich = (
        rich.join(order_counts, rich.c_custkey == order_counts.o_custkey, "left")
        .withColumn("n_orders", F.coalesce(F.col("n_orders"), F.lit(0)))
        .filter(F.col("n_orders") <= 5)
    )
    return (
        quiet_rich.withColumn("cohort", (F.col("c_nationkey") % 5).cast("long"))
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("total_balance"),
        )
    )


ORACLE_BALANCE_COHORTS = """
WITH counts AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT CAST(c_nationkey % 5 AS BIGINT) AS cohort,
       COUNT(*) AS n_customers,
       SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_balance
FROM customer
LEFT JOIN counts ON o_custkey = c_custkey
WHERE c_acctbal > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND COALESCE(n_orders, 0) <= 5
GROUP BY 1
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregate: per-label centroid components (posexplode +
    group-by, exact decimal sums so the float accumulation order can't
    produce engine-divergent results). The long (label, dim, value)
    output format is itself the scale-friendly layout — reassembling
    arrays is a downstream collect_list away."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "component")
    )
    return (
        exploded.withColumn("dim", F.col("dim").cast("long"))
        .groupBy("label", "dim")
        .agg(
            (
                # fixed-point BIGINT sum, not a decimal cast: round() is
                # half-away-from-zero in BOTH engines, while Spark's
                # double->decimal cast is HALF_UP vs DuckDB's half-even —
                # a dyadic component like 0.1494140625 is a TRUE tie at
                # the 9th decimal and the casts disagree by 1e-9
                F.sum(
                    F.expr(
                        "CAST(round(CAST(component AS DOUBLE) * 1000000000) AS BIGINT)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000000.0)
            ).alias("centroid_component"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .filter(F.col("dim") < 8)  # keep the oracle comparison compact
    )


ORACLE_LABEL_CENTROIDS = """
WITH ex AS (
  SELECT label, i - 1 AS dim, embedding[i] AS component
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(round(CAST(component AS DOUBLE) * 1000000000) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000000.0 AS centroid_component,
       COUNT(*) AS n_vectors
FROM ex WHERE dim < 8
GROUP BY label, dim
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup -> click -> purchase per user, ordered by
    event time (first-touch per stage via conditional min). One shuffle
    on user_id; the canonical product-analytics shape."""
    ev = _t(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_click") > F.col("first_signup"), 1
            ).otherwise(0)
        ).cast("long").alias("n_clicked_after_signup"),
        F.sum(
            F.when(
                (F.col("first_purchase") > F.col("first_signup"))
                & (F.col("first_click") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_full_funnel"),
    )


ORACLE_FUNNEL_CONVERSION = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(first_signup) AS n_signed_up,
       CAST(SUM(CASE WHEN first_click > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_signup,
       CAST(SUM(CASE WHEN first_purchase > first_signup AND first_click > first_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM stages
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping_id: per-status, per-priority,
    and grand-total aggregates in one pass (generalizes rollup/cube)."""
    from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer

    t = SQLTransformer(spark)
    return t.transform(
        _t(spark, sf_dir, "orders"),
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n,
               -- 100.0 in Spark SQL text is a DECIMAL literal (unlike
               -- F.lit(100.0) or DuckDB, where it's double) — cast it
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS total
        FROM input_data
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Determinism note: the
    input values are exact 2-decimal doubles and both engines use the
    (n-1)*q linear interpolation over the sorted values, so the
    arithmetic is bitwise-reproducible."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value"),
        F.expr("percentile(value, 0.9)").alias("p90_value"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_MEDIAN_BY_TYPE = """
SELECT event_type,
       quantile_cont(value, 0.5) AS median_value,
       quantile_cont(value, 0.9) AS p90_value,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


BATCH4_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "nation_volume": q_nation_volume,
    "returned_items": q_returned_items,
    "promo_revenue_share": q_promo_revenue_share,
    "bracket_predicates": q_bracket_predicates,
    "balance_cohorts": q_balance_cohorts,
    "label_centroids": q_label_centroids,
    "funnel_conversion": q_funnel_conversion,
    "grouping_sets": q_grouping_sets,
    "median_by_type": q_median_by_type,
}

BATCH4_ORACLES: Dict[str, str] = {
    "nation_volume": ORACLE_NATION_VOLUME,
    "returned_items": ORACLE_RETURNED_ITEMS,
    "promo_revenue_share": ORACLE_PROMO_REVENUE_SHARE,
    "bracket_predicates": ORACLE_BRACKET_PREDICATES,
    "balance_cohorts": ORACLE_BALANCE_COHORTS,
    "label_centroids": ORACLE_LABEL_CENTROIDS,
    "funnel_conversion": ORACLE_FUNNEL_CONVERSION,
    "grouping_sets": ORACLE_GROUPING_SETS,
    "median_by_type": ORACLE_MEDIAN_BY_TYPE,
}
