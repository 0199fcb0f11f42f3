"""Rank-correlation statistics (extension; no reference counterpart —
SURVEY.md §2.11): tie-corrected Spearman rho via cent-census midranks,
Kendall tau-b on a dimension-bounded series pair, and degree
assortativity of the co-purchase graph (Pearson on endpoint degrees —
the Newman mixing coefficient).

Determinism posture (the ranktests.py conventions): every rank is a
doubled midrank (exact BIGINT — no halves), every moment sum is exact
(BIGINT / DECIMAL(38,0), HUGEINT on the DuckDB side), and the single
float division per statistic happens once, in one fixed expression
shape per engine, rounded to 6dp.

Scale posture: Spearman never materializes per-row ranks — marginal
cent censuses (bounded by the value DOMAIN, not row count) carry the
doubled midranks, and the moment sums are weighted by the joint-census
multiplicities, so the only fact-sized work is the initial join +
group-agg. Kendall runs its all-pairs classification on the 25-row
nation frame; assortativity's edge list is the basket-census-bounded
co-purchase graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.basket import MIN_SUPPORT, q_frequent_itemsets
from data_pipeline_platform_spark.queries import _cents, _t

_DEC = "DECIMAL(38,0)"


def _midrank2(census: DataFrame, bin_col: str) -> DataFrame:
    """(bin, doubled midrank) from a (bin, cnt) marginal census.

    Ranks of a value occupying positions [c+1, c+t] have midrank
    c + (t+1)/2; doubling keeps it integral: 2c + t + 1. The
    unpartitioned window runs over the CENSUS (bounded by the cent
    domain), never the fact table."""
    w = Window.orderBy(bin_col).rowsBetween(Window.unboundedPreceding, -1)
    return census.select(
        bin_col,
        (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1).alias(
            "midrank2"
        ),
    )


def q_spearman_price_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, rho) — tie-corrected Spearman rank correlation between an
    order's total price and its customer's account balance. Midranks
    come from the two marginal cent censuses; the Pearson-on-ranks
    moments are weighted by the joint census, so no per-row rank
    column ever exists. Doubling both rank vectors scales every
    centered moment by 4 and cancels in rho."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rows = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        _cents("o_totalprice").alias("x_bin"),
        _cents("c_acctbal").alias("y_bin"),
    )
    joint = rows.groupBy("x_bin", "y_bin").agg(F.count(F.lit(1)).alias("cnt"))
    cx = joint.groupBy("x_bin").agg(F.sum("cnt").alias("cnt"))
    cy = joint.groupBy("y_bin").agg(F.sum("cnt").alias("cnt"))
    rx = _midrank2(cx, "x_bin").withColumnRenamed("midrank2", "rx2")
    ry = _midrank2(cy, "y_bin").withColumnRenamed("midrank2", "ry2")
    m = joint.join(rx, "x_bin").join(ry, "y_bin")
    sums = m.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr(f"CAST(cnt AS {_DEC}) * rx2")).alias("sx"),
        F.sum(F.expr(f"CAST(cnt AS {_DEC}) * ry2")).alias("sy"),
        F.sum(F.expr(f"CAST(cnt AS {_DEC}) * rx2 * rx2")).alias("sxx"),
        F.sum(F.expr(f"CAST(cnt AS {_DEC}) * ry2 * ry2")).alias("syy"),
        F.sum(F.expr(f"CAST(cnt AS {_DEC}) * rx2 * ry2")).alias("sxy"),
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "round(CAST(n * sxy - sx * sy AS DOUBLE) "
            "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
            "* CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("spearman_rho"),
    )


ORACLE_SPEARMAN_PRICE_BALANCE = """
WITH rows_ AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS x_bin,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS y_bin
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), joint AS MATERIALIZED (
  SELECT x_bin, y_bin, COUNT(*) AS cnt FROM rows_ GROUP BY 1, 2
), rx AS (
  SELECT x_bin,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY x_bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS rx2
  FROM (SELECT x_bin, SUM(cnt) AS cnt FROM joint GROUP BY 1)
), ry AS (
  SELECT y_bin,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY y_bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS ry2
  FROM (SELECT y_bin, SUM(cnt) AS cnt FROM joint GROUP BY 1)
), sums AS (
  SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
         SUM(CAST(cnt AS HUGEINT) * rx2) AS sx,
         SUM(CAST(cnt AS HUGEINT) * ry2) AS sy,
         SUM(CAST(cnt AS HUGEINT) * rx2 * rx2) AS sxx,
         SUM(CAST(cnt AS HUGEINT) * ry2 * ry2) AS syy,
         SUM(CAST(cnt AS HUGEINT) * rx2 * ry2) AS sxy
  FROM joint j JOIN rx USING (x_bin) JOIN ry USING (y_bin)
)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
FROM sums
"""


def q_kendall_nation_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nations, concordant, discordant, tau_b) — Kendall tau-b
    between each nation's 1995 and 1996 customer-order revenue (exact
    cents). Answers "did the nation ranking persist year-over-year?"
    with a statistic robust to the revenue scale. The all-pairs
    classification runs on the 25-row nation aggregate (dimension-
    bounded — never the fact table); tie pairs are counted exactly and
    enter the tau-b denominator."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_nation = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1995, 1996))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("yr") == 1995, _cents("o_totalprice"))), F.lit(0)
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("yr") == 1996, _cents("o_totalprice"))), F.lit(0)
            ).alias("y"),
        )
    )
    a = per_nation.select(
        F.col("n_name").alias("na"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = per_nation.select(
        F.col("n_name").alias("nb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(F.broadcast(b), F.col("na") < F.col("nb"))
    counts = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(
            (
                (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0
            ).cast("bigint")
        ).alias("concordant"),
        F.sum(
            (
                (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0
            ).cast("bigint")
        ).alias("discordant"),
        F.sum((F.col("xa") == F.col("xb")).cast("bigint")).alias("tie_x"),
        F.sum((F.col("ya") == F.col("yb")).cast("bigint")).alias("tie_y"),
    )
    n_nations = per_nation.agg(F.count(F.lit(1)).alias("n_nations"))
    return F.broadcast(n_nations).crossJoin(counts).select(
        F.col("n_nations").cast("bigint").alias("n_nations"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.expr(
            "round(CAST(concordant - discordant AS DOUBLE) "
            "/ sqrt(CAST(n0 - tie_x AS DOUBLE) * CAST(n0 - tie_y AS DOUBLE)), 6)"
        ).alias("tau_b"),
    )


ORACLE_KENDALL_NATION_TREND = """
WITH per_nation AS MATERIALIZED (
  SELECT n.n_name,
         COALESCE(SUM(CASE WHEN year(o.o_orderdate) = 1995
           THEN CAST(round(o.o_totalprice * 100) AS BIGINT) END), 0) AS x,
         COALESCE(SUM(CASE WHEN year(o.o_orderdate) = 1996
           THEN CAST(round(o.o_totalprice * 100) AS BIGINT) END), 0) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE year(o.o_orderdate) IN (1995, 1996)
  GROUP BY 1
), pairs AS (
  SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
  FROM per_nation a JOIN per_nation b ON a.n_name < b.n_name
), counts AS (
  SELECT COUNT(*) AS n0,
         SUM(CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END) AS concordant,
         SUM(CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END) AS discordant,
         SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS tie_x,
         SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS tie_y
  FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_nation) AS n_nations,
       CAST(concordant AS BIGINT) AS concordant,
       CAST(discordant AS BIGINT) AS discordant,
       round(CAST(concordant - discordant AS DOUBLE)
             / sqrt(CAST(n0 - tie_x AS DOUBLE) * CAST(n0 - tie_y AS DOUBLE)), 6)
         AS tau_b
FROM counts
"""


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_edges, assortativity) — Newman degree assortativity of the
    co-purchase graph (Pearson correlation of endpoint degrees over
    every edge, both orientations). Negative values mean hubs attach
    to leaves (a hub-and-spoke catalog); positive means a rich-club.
    Runs entirely on the basket-census-bounded edge list; degree
    frames join back by part key."""
    edges = q_frequent_itemsets(spark, sf_dir).select("pa", "pb")
    deg = (
        edges.select(F.col("pa").alias("part"))
        .unionByName(edges.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    both = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    m = (
        both.join(deg.select(F.col("part").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("part").alias("v"), F.col("deg").alias("dv")), "v")
    )
    sums = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"CAST(du AS {_DEC})")).alias("sx"),
        F.sum(F.expr(f"CAST(dv AS {_DEC})")).alias("sy"),
        F.sum(F.expr(f"CAST(du AS {_DEC}) * du")).alias("sxx"),
        F.sum(F.expr(f"CAST(dv AS {_DEC}) * dv")).alias("syy"),
        F.sum(F.expr(f"CAST(du AS {_DEC}) * dv")).alias("sxy"),
    )
    return sums.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        F.expr(
            "round(CAST(n * sxy - sx * sy AS DOUBLE) "
            "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
            "* CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("assortativity"),
    )


ORACLE_DEGREE_ASSORTATIVITY = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), deg AS (
  SELECT part, COUNT(*) AS deg FROM (
    SELECT pa AS part FROM edges UNION ALL SELECT pb FROM edges
  ) GROUP BY 1
), both_ AS (
  SELECT pa AS u, pb AS v FROM edges UNION ALL SELECT pb, pa FROM edges
), m AS (
  SELECT d1.deg AS du, d2.deg AS dv
  FROM both_ e JOIN deg d1 ON e.u = d1.part JOIN deg d2 ON e.v = d2.part
), sums AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(du AS HUGEINT)) AS sx,
         SUM(CAST(dv AS HUGEINT)) AS sy,
         SUM(CAST(du AS HUGEINT) * du) AS sxx,
         SUM(CAST(dv AS HUGEINT) * dv) AS syy,
         SUM(CAST(du AS HUGEINT) * dv) AS sxy
  FROM m
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS assortativity
FROM sums
"""


register("spearman_price_balance", q_spearman_price_balance, ORACLE_SPEARMAN_PRICE_BALANCE)
register("kendall_nation_trend", q_kendall_nation_trend, ORACLE_KENDALL_NATION_TREND)
register("degree_assortativity", q_degree_assortativity, ORACLE_DEGREE_ASSORTATIVITY)
