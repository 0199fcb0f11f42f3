"""Query suite, batch 5: the remaining TPC-H shapes expressible on the
driver schema (no partsupp table, no commit/receipt dates — Q9/Q12/Q16
are adapted as documented per query). Same bitwise-parity conventions as
queries.py: money stays in integer cents until the final division, sums
of integral-valued doubles (l_quantity) go through BIGINT.

Q5  local_supplier_volume      Q8  market_share
Q9  product_profit (adapted)   Q12 priority_ship_delay (adapted)
Q13 customer_order_distribution Q15 top_supplier
Q16 supplier_part_coverage (adapted) Q18 large_orders
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.queries import _cents, _t


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from intra-nation trade (customer and supplier
    share a nation) within one region and year. Plan: dims broadcast,
    ONE fact-fact join, c_nationkey = s_nationkey applied as a join-time
    filter, single agg exchange."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(revenue_c) / 10000.0).alias("revenue"))
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
GROUP BY n_name
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3 suppliers' share of PROMO-part revenue sold to
    AMERICA-region customers, by order year. The share is a ratio of two
    integer-cents sums — one conditional — so both engines divide the
    same exact integers."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.sn_key)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol_c).otherwise(F.lit(0))).cast("double")
                / F.sum(vol_c)
            ).alias("mkt_share")
        )
    )


ORACLE_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END) AS DOUBLE)
       / SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
GROUP BY 1
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp): profit per supplier nation and
    year with cost proxied by half the part's retail price —
    amount = extprice*(1-discount) - 0.5*p_retailprice*quantity, all in
    1e-4-dollar integer units so the sums are exact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    nation = _t(spark, sf_dir, "nation")
    qty = F.round(F.col("l_quantity")).cast("long")
    amount = (
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
        - F.lit(50) * _cents("p_retailprice") * qty
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg((F.sum(amount) / 10000.0).alias("profit"))
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS order_year,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
           - 50 * CAST(round(p_retailprice * 100) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


def q_priority_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no commit/receipt dates): order-to-ship delay
    buckets x order priority — counts of urgent (1/2) vs other
    priorities per delay bucket."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "under_30d")
        .when(delay < 60, "30_to_60d")
        .otherwise("over_60d")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("urgent_lines"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("normal_lines"),
        )
    )


ORACLE_PRIORITY_SHIP_DELAY = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'under_30d'
            WHEN datediff('day', o_orderdate, l_shipdate) < 60 THEN '30_to_60d'
            ELSE 'over_60d' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS urgent_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS normal_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer including the
    zero-order customers (LEFT join, count of the right key)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue over a shipping
    quarter — aggregate once, compare to the scalar max of the SAME
    aggregate (Spark reuses the exchange under AQE)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue_c).alias("total_c"))
    max_c = rev.agg(F.max("total_c").alias("m"))
    return (
        rev.join(F.broadcast(max_c), rev.total_c == max_c.m)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c") / 10000.0).alias("total_revenue"),
        )
    )


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_c
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_c / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_c = (SELECT MAX(total_c) FROM rev)
"""


def q_supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp; lineitem is the part-supplier
    relation, acctbal threshold models the excluded-supplier list):
    distinct supplier count per (p_brand, p_type, p_size), excluding
    low-balance suppliers, top 20."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part")
    excluded = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1500).select(
        "s_suppkey"
    )
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(20)
    )


ORACLE_SUPPLIER_PART_COVERAGE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 150 — groupBy
    pre-aggregates lineitem before joining order/customer details, so
    the join input is the qualifying keys only."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    qty = F.round(F.col("l_quantity")).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("order_date"),
            (_cents("o_totalprice") / 100.0).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(20)
    )


ORACLE_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS order_date,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS total_price,
       sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
"""


BATCH5_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "local_supplier_volume": q_local_supplier_volume,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "priority_ship_delay": q_priority_ship_delay,
    "customer_order_distribution": q_customer_order_distribution,
    "top_supplier": q_top_supplier,
    "supplier_part_coverage": q_supplier_part_coverage,
    "large_orders": q_large_orders,
}

BATCH5_ORACLES: Dict[str, str] = {
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "market_share": ORACLE_MARKET_SHARE,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "priority_ship_delay": ORACLE_PRIORITY_SHIP_DELAY,
    "customer_order_distribution": ORACLE_CUSTOMER_ORDER_DISTRIBUTION,
    "top_supplier": ORACLE_TOP_SUPPLIER,
    "supplier_part_coverage": ORACLE_SUPPLIER_PART_COVERAGE,
    "large_orders": ORACLE_LARGE_ORDERS,
}


def q_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation: high-value customers (acctbal >
    5000) vs customers holding urgent orders — either side may be
    missing; COALESCE folds the key, null counts classify the side."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("hv_key"), "c_acctbal")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("ur_key"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    joined = cust.join(urgent, cust.hv_key == urgent.ur_key, "full_outer")
    return joined.select(
        F.coalesce("hv_key", "ur_key").alias("custkey"),
        F.when(F.col("hv_key").isNotNull() & F.col("ur_key").isNotNull(), "both")
        .when(F.col("hv_key").isNotNull(), "high_value_only")
        .otherwise("urgent_only")
        .alias("side"),
        F.coalesce("n_urgent", F.lit(0)).cast("long").alias("n_urgent"),
    )


ORACLE_FULL_OUTER_RECON = """
WITH cust AS (
  SELECT c_custkey AS hv_key, c_acctbal FROM customer WHERE c_acctbal > 5000
), urgent AS (
  SELECT o_custkey AS ur_key, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
)
SELECT COALESCE(hv_key, ur_key) AS custkey,
       CASE WHEN hv_key IS NOT NULL AND ur_key IS NOT NULL THEN 'both'
            WHEN hv_key IS NOT NULL THEN 'high_value_only'
            ELSE 'urgent_only' END AS side,
       COALESCE(n_urgent, 0) AS n_urgent
FROM cust FULL OUTER JOIN urgent ON hv_key = ur_key
"""


def q_unpivot_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): one wide conditional-agg row per year melted to
    (year, priority, n) long form — the inverse of pivot_segments."""
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).cast("long").alias("urgent"),
        F.sum(F.when(F.col("o_orderpriority") == "3-MEDIUM", 1).otherwise(0)).cast("long").alias("medium"),
        F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)).cast("long").alias("low"),
    )
    return wide.select(
        "order_year",
        F.expr(
            "stack(3, 'urgent', urgent, 'medium', medium, 'low', low) AS (priority, n)"
        ),
    )


ORACLE_UNPIVOT_PRIORITIES = """
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
         CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
  FROM orders GROUP BY 1
)
SELECT order_year, priority, n
FROM wide UNPIVOT (n FOR priority IN (urgent, medium, low))
"""


def q_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer order totals summed over a
    30-day event-time window (RANGE BETWEEN 30 PRECEDING on
    days-since-epoch) — the value-based frame ROWS frames can't express
    when orders per day vary."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("order_day").cast("long").alias("order_day"),
        F.sum(_cents("o_totalprice")).over(w).alias("rolling_30d_cents"),
    )


ORACLE_ROLLING_30D_REVENUE = """
SELECT o_custkey, o_orderkey,
       CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS order_day,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS rolling_30d_cents
FROM orders
"""

BATCH5_QUERIES.update({
    "full_outer_recon": q_full_outer_recon,
    "unpivot_priorities": q_unpivot_priorities,
    "rolling_30d_revenue": q_rolling_30d_revenue,
})
BATCH5_ORACLES.update({
    "full_outer_recon": ORACLE_FULL_OUTER_RECON,
    "unpivot_priorities": ORACLE_UNPIVOT_PRIORITIES,
    "rolling_30d_revenue": ORACLE_ROLLING_30D_REVENUE,
})
