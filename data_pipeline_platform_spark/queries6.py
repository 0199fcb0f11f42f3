"""Query suite, batch 7: the remaining classic TPC-H shapes adapted to
the driver schema (no partsupp, no shipmode/commitdate/comment columns
— each adaptation documented per query):

Q7  nation_trade_volume     Q8  nation_market_share
Q9  product_type_profit     Q15 top_revenue_suppliers
Q14 promo_share_monthly (monthly grain; the global-share Q14 shape is
    queries3.promo_revenue_share)
Q16 supplier_part_variety   Q19 disjunctive_bracket_revenue

Q13 is NOT re-registered here: queries4.customer_order_distribution
already covers the identical LEFT-join zero-bucket histogram.

Parity conventions match queries.py: money stays in integer cents
until the final division; shares/ratios close with ONE double division
of exact BIGINT cent sums, so both engines divide identical integers.

Scale notes: every query is dims-broadcast + one fact aggregation; the
only fact-fact join (Q7/Q8/Q9's lineitem ⋈ orders) is the unavoidable
key join both engines shuffle-hash on the same key. No windows over
fact input (Q15's max-revenue cut is a 1-row broadcast crossJoin).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.queries import _cents, _t

BATCH7_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
BATCH7_ORACLES: Dict[str, str] = {}


def _rev_cents():
    # revenue = extendedprice * (1 - discount), kept exact: price cents
    # (integer) times discount-complement in basis points / 10000 stays
    # a whole number of 1e-4 cents — sum as BIGINT, divide once
    return F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) "
        "* (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
    )


_DUCK_REV = (
    "CAST(round(l_extendedprice * 100) AS BIGINT) "
    "* (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Q7 (adapted): trade volume between supplier and customer nations.
# Reference Q7 filters two named nations and ships by l_shipdate year;
# kept, but over ALL ordered nation pairs (the dashboard wants the full
# matrix) for 1995-1996.
# ---------------------------------------------------------------------------
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1996-12-31")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                      F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_cents()) / 1000000.0).alias("revenue"))
    )


ORACLE_NATION_TRADE_VOLUME = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       SUM({_DUCK_REV}) / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate <= DATE '1996-12-31'
GROUP BY 1, 2, 3
"""

BATCH7_QUERIES["nation_trade_volume"] = q_nation_trade_volume
BATCH7_ORACLES["nation_trade_volume"] = ORACLE_NATION_TRADE_VOLUME


# ---------------------------------------------------------------------------
# Q8 (adapted): a nation's market share inside its own region's market
# per year. Reference Q8 fixes one part type and one nation; adapted to
# the share of EVERY nation within its region (p_type filter kept on
# 'STANDARD'). The share is one division of two exact cent sums.
# ---------------------------------------------------------------------------
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name", "o_year")
        .agg(F.sum(_rev_cents()).alias("nat_c"))
    )
    market = vol.groupBy("r_name", "o_year").agg(F.sum("nat_c").alias("mkt_c"))
    return (
        vol.join(market, ["r_name", "o_year"])
        .select(
            "r_name",
            "n_name",
            "o_year",
            (F.col("nat_c") / 1000000.0).alias("revenue"),
            (F.col("nat_c").cast("double") / F.col("mkt_c").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


ORACLE_NATION_MARKET_SHARE = f"""
WITH vol AS (
  SELECT r.r_name, n.n_name, year(o.o_orderdate) AS o_year,
         SUM({_DUCK_REV}) AS nat_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
), market AS (
  SELECT r_name, o_year, SUM(nat_c) AS mkt_c FROM vol GROUP BY 1, 2
)
SELECT v.r_name, v.n_name, v.o_year,
       CAST(v.nat_c AS BIGINT) / 1000000.0 AS revenue,
       CAST(v.nat_c AS DOUBLE) / CAST(m.mkt_c AS DOUBLE) AS mkt_share
FROM vol v JOIN market m USING (r_name, o_year)
"""

BATCH7_QUERIES["nation_market_share"] = q_nation_market_share
BATCH7_ORACLES["nation_market_share"] = ORACLE_NATION_MARKET_SHARE


# ---------------------------------------------------------------------------
# Q9 (adapted): product-line profit by supplier nation and year.
# No partsupp, so cost = p_retailprice * quantity (the retail-cost
# proxy); parts filtered by name containing 'widget' like Q9's
# green-parts filter. profit = revenue − cost, all in exact cents.
# ---------------------------------------------------------------------------
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit_c = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) "
        "* (10000 - CAST(round(l_discount * 10000) AS BIGINT)) "
        "- CAST(round(p_retailprice * 100) AS BIGINT) "
        "* CAST(round(l_quantity * 10000) AS BIGINT)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg((F.sum(profit_c) / 1000000.0).alias("profit"))
    )


ORACLE_PRODUCT_TYPE_PROFIT = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
           - CAST(round(p.p_retailprice * 100) AS BIGINT)
             * CAST(round(l.l_quantity * 10000) AS BIGINT)) / 1000000.0 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""

BATCH7_QUERIES["product_type_profit"] = q_product_type_profit
BATCH7_ORACLES["product_type_profit"] = ORACLE_PRODUCT_TYPE_PROFIT




# ---------------------------------------------------------------------------
# Q14: promo revenue share per month — 100 * promo revenue / total
# revenue, both exact cent sums, ONE closing division.
# ---------------------------------------------------------------------------
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_cents()
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("l_year"),
            F.month("l_shipdate").alias("l_month"),
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_c"
            ),
            F.sum(rev).alias("total_c"),
        )
    )
    return monthly.select(
        "l_year",
        "l_month",
        (F.lit(100.0) * F.col("promo_c").cast("double")
         / F.col("total_c").cast("double")).alias("promo_share"),
        (F.col("total_c") / 1000000.0).alias("revenue"),
    )


ORACLE_PROMO_REVENUE_SHARE = f"""
SELECT year(l_shipdate) AS l_year, month(l_shipdate) AS l_month,
       100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DUCK_REV}
                             ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_DUCK_REV}) AS DOUBLE) AS promo_share,
       CAST(SUM({_DUCK_REV}) AS BIGINT) / 1000000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2
"""

BATCH7_QUERIES["promo_share_monthly"] = q_promo_revenue_share
BATCH7_ORACLES["promo_share_monthly"] = ORACLE_PROMO_REVENUE_SHARE


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by 1996-H1 revenue — the classic view + max
# pattern. The max-revenue cut compares exact BIGINT cent sums against
# a broadcast 1-row max (never a window over fact input); ties all
# surface, deterministically.
# ---------------------------------------------------------------------------
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("rev_c"))
    )
    top = rev.agg(F.max("rev_c").alias("max_c"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            (F.col("rev_c") / 1000000.0).alias("total_revenue"),
        )
    )


ORACLE_TOP_REVENUE_SUPPLIERS = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_DUCK_REV}) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY 1
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST(r.rev_c AS BIGINT) / 1000000.0 AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_c = (SELECT MAX(rev_c) FROM rev)
"""

BATCH7_QUERIES["top_revenue_suppliers"] = q_top_revenue_suppliers
BATCH7_ORACLES["top_revenue_suppliers"] = ORACLE_TOP_REVENUE_SUPPLIERS


# ---------------------------------------------------------------------------
# Q16 (adapted): supplier variety per (brand, type, size bracket) —
# distinct suppliers that actually shipped the parts (lineitem stands
# in for partsupp), excluding one brand like the reference.
# ---------------------------------------------------------------------------
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#13")
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", (F.col("p_size") % 10).alias("size_bracket"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_PART_VARIETY = """
SELECT p.p_brand, p.p_type, p.p_size % 10 AS size_bracket,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
GROUP BY 1, 2, 3
"""

BATCH7_QUERIES["supplier_part_variety"] = q_supplier_part_variety
BATCH7_ORACLES["supplier_part_variety"] = ORACLE_SUPPLIER_PART_VARIETY


# ---------------------------------------------------------------------------
# Q19: disjunctive bracket revenue — three OR'd (brand, size, quantity)
# brackets; the optimizer must push the common part-join key and
# evaluate the disjunction row-locally.
# ---------------------------------------------------------------------------
def q_disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#7") & (F.col("p_size") <= 30)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 35))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size") <= 50)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (F.sum(_rev_cents()) / 1000000.0).alias("revenue"),
        )
    )


ORACLE_DISJUNCTIVE_BRACKET_REVENUE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       SUM({_DUCK_REV}) / 1000000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#7' AND p.p_size <= 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#20' AND p.p_size <= 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""

BATCH7_QUERIES["disjunctive_bracket_revenue"] = q_disjunctive_bracket_revenue
BATCH7_ORACLES["disjunctive_bracket_revenue"] = ORACLE_DISJUNCTIVE_BRACKET_REVENUE
