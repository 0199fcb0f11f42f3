"""Order-statistic relational analytics: Pareto skyline, gaps-and-
islands streaks, and a MAD robust-outlier screen (extension wave r8).

All three are classic warehouse asks the reference's config pipeline
cannot express (its transform grammar stops at filter/map/agg —
src/pipeline/transformation/config_transformer.py), and all three are
built census-shaped so no window ever spans a data-scaled frame:

- ``skyline_parts``: the 2-D dominance frontier. The textbook plan is a
  quadratic NOT-EXISTS self-join (what the DuckDB oracle runs); here it
  is O(n) + two value-domain-bounded passes: keep per-cent minima
  (groupBy on the price-cent census), then cut against the running
  minimum over STRICTLY cheaper cents (a window over the cent census,
  never over parts).
- ``order_gap_islands``: day - row_number() constant-group trick, with
  the window partitioned by customer (parallel at any scale).
- ``mad_outliers``: median / median-absolute-deviation via two scalar
  percentile aggregates broadcast back (1-row frames) — deviations stay
  exact BIGINT half-units so the 3-MAD cut compares integers against an
  exact-half double identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (price, size) Pareto frontier — minimize both; A
    dominates B iff A<=B on both axes and strictly on one.

    Census shape: within one price cent, only the min-size rows can
    survive (equal price needs strictly smaller size to dominate, so
    min ties co-survive); across cents, a row is dominated iff any
    STRICTLY cheaper cent holds size <= its own — the exclusive running
    minimum over the cent census. Both passes are bounded by the price
    DOMAIN, not the part count."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
        "p_size",
    )
    per_cent = part.groupBy("cents").agg(F.min("p_size").alias("min_size"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    census = per_cent.withColumn("prefix_min", F.min("min_size").over(w))
    return (
        part.join(F.broadcast(census), "cents")
        .filter(
            (F.col("p_size") == F.col("min_size"))
            & (F.col("prefix_min").isNull() | (F.col("prefix_min") > F.col("p_size")))
        )
        .select(
            "p_partkey",
            (F.col("cents") / 100.0).alias("price"),
            "p_size",
        )
    )


ORACLE_SKYLINE_PARTS = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents, p_size
  FROM part
)
SELECT a.p_partkey, a.cents / 100.0 AS price, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.cents <= a.cents AND b.p_size <= a.p_size
    AND (b.cents < a.cents OR b.p_size < a.p_size)
)
"""

register("skyline_parts", q_skyline_parts, ORACLE_SKYLINE_PARTS)


# ---------------------------------------------------------------------------
# gaps and islands
# ---------------------------------------------------------------------------

def q_order_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer ordering streaks: consecutive-day runs of >=1 order
    (islands) via the day - row_number() constant-group trick; reports
    island count, longest streak, and total active days. The only
    window is partitioned by customer — parallel at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    days = orders.select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("day")
    isl = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    islands = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("len_days")
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len_days").alias("longest_streak"),
            F.sum("len_days").cast("bigint").alias("active_days"),
        )
        .filter(F.col("longest_streak") >= 2)  # streaks only: bounded, interesting
    )


ORACLE_ORDER_GAP_ISLANDS = """
WITH days AS (
  SELECT DISTINCT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
  FROM orders
), isl AS (
  SELECT o_custkey,
         day - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS grp
  FROM days
), islands AS (
  SELECT o_custkey, grp, COUNT(*) AS len_days FROM isl GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len_days) AS BIGINT) AS longest_streak,
       CAST(SUM(len_days) AS BIGINT) AS active_days
FROM islands
GROUP BY o_custkey
HAVING MAX(len_days) >= 2
"""

register("order_gap_islands", q_order_gap_islands, ORACLE_ORDER_GAP_ISLANDS)


# ---------------------------------------------------------------------------
# MAD outlier screen
# ---------------------------------------------------------------------------

def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust 3-MAD outlier screen on order value, per priority class.
    Median and MAD come from two scalar percentile aggregates (1-row
    frames broadcast back — never a global window); deviations are kept
    as |2x - 2*median| exact BIGINT half-cents, so the 3-MAD cut is an
    integer-vs-exact-half comparison both engines compute identically
    (the median_by_type percentile-interpolation precedent)."""
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    o = tracked_persist(
        load_table(spark, sf_dir, "orders").select(
            "o_orderpriority",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    med = o.agg(F.expr("percentile(cents, 0.5)").alias("med"))
    dev = o.crossJoin(F.broadcast(med)).withColumn(
        "dev2", F.expr("abs(cents * 2 - CAST(round(med * 2) AS BIGINT))")
    )
    mad = dev.agg(F.expr("percentile(dev2, 0.5)").alias("mad2"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(dev2 > 3 * mad2 AS INT)")).cast("bigint").alias(
                "n_outliers"
            ),
        )
    )


ORACLE_MAD_OUTLIERS = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), m AS (
  SELECT quantile_cont(cents, 0.5) AS med FROM o
), d AS (
  SELECT o_orderpriority,
         CAST(abs(cents * 2 - CAST(round(med * 2) AS BIGINT)) AS BIGINT) AS dev2
  FROM o, m
), md AS (
  SELECT quantile_cont(dev2, 0.5) AS mad2 FROM d
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN dev2 > 3 * mad2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d, md
GROUP BY o_orderpriority
"""

register("mad_outliers", q_mad_outliers, ORACLE_MAD_OUTLIERS)
