"""RFM customer segmentation (extension): recency / frequency /
monetary quintile scores — the classic CRM operator, built
scale-correctly.

The naive formulation is three global NTILEs — three total-order
windows, each a single task at 100 TB (the exact scale-killer the
packing family eliminated). Here the quintile BOUNDARIES are computed
once as exact-percentile scalars over the customer-grain frame
(map-side-combinable aggregate, 12 doubles out) and broadcast back;
scoring is then a row-local comparison chain. One customer-keyed
shuffle total, no ordered window anywhere.

Determinism: metrics are exact integers (days, counts, cents), so the
percentile interpolation is the same correctly-rounded double in both
engines (the histogram_quantiles precedent), and boundary comparisons
see identical values on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

_QS = (0.2, 0.4, 0.6, 0.8)


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM: exact metrics, quintile scores against
    broadcast percentile boundaries, and the composed rfm_code
    (r*100 + f*10 + m; r=5 means most recent)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "monetary_c"
        ),
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    base = cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_date", "last_order").cast("long").alias("recency_days"),
        "frequency",
        "monetary_c",
    )
    qlist = ", ".join(str(q) for q in _QS)
    bounds = base.agg(
        F.expr(f"percentile(recency_days, array({qlist}))").alias("rb"),
        F.expr(f"percentile(frequency, array({qlist}))").alias("fb"),
        F.expr(f"percentile(monetary_c, array({qlist}))").alias("mb"),
    )

    def exceed(metric: str, arr: str) -> str:
        return " + ".join(
            f"CAST({metric} > element_at({arr}, {i + 1}) AS INT)"
            for i in range(len(_QS))
        )

    scored = base.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        (F.col("monetary_c") / 100.0).alias("monetary"),
        F.expr(f"5 - ({exceed('recency_days', 'rb')})").alias("r_score"),
        F.expr(f"1 + ({exceed('frequency', 'fb')})").alias("f_score"),
        F.expr(f"1 + ({exceed('monetary_c', 'mb')})").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "int"
        ),
    )


def _exceed_duck(metric: str, arr: str) -> str:
    return " + ".join(
        f"CAST({metric} > {arr}[{i + 1}] AS INT)" for i in range(len(_QS))
    )


ORACLE_RFM_SEGMENTS = f"""
WITH cust AS MATERIALIZED (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_c
  FROM orders GROUP BY 1
), ref AS (
  SELECT MAX(o_orderdate) AS ref_date FROM orders
), base AS MATERIALIZED (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(last_order AS DATE), CAST(ref_date AS DATE)) AS BIGINT)
           AS recency_days,
         frequency, monetary_c
  FROM cust, ref
), bounds AS (
  SELECT quantile_cont(recency_days, [{", ".join(str(q) for q in _QS)}]) AS rb,
         quantile_cont(frequency, [{", ".join(str(q) for q in _QS)}]) AS fb,
         quantile_cont(monetary_c, [{", ".join(str(q) for q in _QS)}]) AS mb
  FROM base
)
SELECT o_custkey, recency_days, frequency,
       monetary_c / 100.0 AS monetary,
       5 - ({_exceed_duck("recency_days", "rb")}) AS r_score,
       1 + ({_exceed_duck("frequency", "fb")}) AS f_score,
       1 + ({_exceed_duck("monetary_c", "mb")}) AS m_score,
       CAST((5 - ({_exceed_duck("recency_days", "rb")})) * 100
            + (1 + ({_exceed_duck("frequency", "fb")})) * 10
            + (1 + ({_exceed_duck("monetary_c", "mb")})) AS INT) AS rfm_code
FROM base, bounds
"""

register("rfm_segments", q_rfm_segments, ORACLE_RFM_SEGMENTS)


def q_scd2_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: each customer's order history becomes
    versioned validity intervals — (custkey, version, balance,
    valid_from, valid_to, is_current), where each order sets the
    tracked attribute (order totalprice as the stand-in balance) and
    the interval closes when the next change arrives.

    The standard warehouse pattern expressed as ONE customer-keyed
    window pass (row_number for the version, lead for the closing
    date) — no self-join, no correlated subquery. Ties on the same
    date break by o_orderkey so versions are total-ordered and the
    intervals deterministic."""
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        F.row_number().over(w).alias("version"),
        F.col("o_totalprice").alias("balance"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


ORACLE_SCD2_CUSTOMER_BALANCE = """
SELECT o_custkey,
       row_number() OVER w AS version,
       o_totalprice AS balance,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

register("scd2_customer_balance", q_scd2_customer_balance, ORACLE_SCD2_CUSTOMER_BALANCE)


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    YEAR, revenue accumulated by years-since-first-order — the
    retention-economics table every subscription/commerce dashboard
    leads with. (year grain: the TPC-H order history spans ~7 years,
    so monthly cohorts would be 80x sparser rows for the same shape.)

    Shape: first-order year is one customer-keyed min() agg joined
    back onto orders (both fact-scale, one shuffle each); the
    (cohort, age) rollup is map-side combinable; the cumulative sum
    runs per cohort over the <= |years| x |years| triangle — a
    constant-size frame. Revenue stays exact cents until the final
    division by cohort size."""
    from pyspark.sql.window import Window as W

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    sized = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_customers"))
    cells = (
        orders.join(first, "o_custkey")
        .groupBy("cohort", (F.col("yr") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").alias("rev_c"))
    )
    w = W.partitionBy("cohort").orderBy("age")
    return (
        cells.withColumn("cum_c", F.sum("rev_c").over(w))
        .join(F.broadcast(sized), "cohort")
        .select(
            F.col("cohort").cast("bigint").alias("cohort"),
            F.col("age").cast("bigint").alias("age"),
            "n_customers",
            # no round(): at cohort-cell magnitudes (~1e10 dollars at
            # sf0.1) DuckDB's round(x, 6) drifts an ulp off Spark's;
            # the bare IEEE divisions are identical in both engines
            F.expr("CAST(rev_c AS DOUBLE) / 100").alias("revenue"),
            F.expr(
                "CAST(cum_c AS DOUBLE) / 100 / n_customers"
            ).alias("cum_ltv_per_customer"),
        )
    )


ORACLE_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, MIN(yr) AS cohort FROM o GROUP BY 1
), sized AS (
  SELECT cohort, COUNT(*) AS n_customers FROM first GROUP BY 1
), cells AS (
  SELECT f.cohort, o.yr - f.cohort AS age, SUM(o.cents) AS rev_c
  FROM o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age, rev_c,
         SUM(rev_c) OVER (PARTITION BY cohort ORDER BY age) AS cum_c
  FROM cells
)
SELECT c.cohort, c.age, s.n_customers,
       CAST(c.rev_c AS DOUBLE) / 100 AS revenue,
       CAST(c.cum_c AS DOUBLE) / 100 / s.n_customers
         AS cum_ltv_per_customer
FROM cum c JOIN sized s USING (cohort)
"""

register("cohort_ltv", q_cohort_ltv, ORACLE_COHORT_LTV)
