"""Time-series regularization: gap-fill an irregular event series onto
a dense calendar (the missing-day shape every monitoring/forecast
pipeline hits — seasonality_decompose, holt_forecast and acf_daily all
assume a dense index; this op is what makes that assumption true).

``gapfill_locf_daily``: per-priority daily order count/revenue on the
FULL day grid between the corpus' first and last order date; absent
(priority, day) cells carry the last observed revenue forward (LOCF —
exact by construction: no arithmetic is invented, so the fill grades
bitwise where interpolation schemes would round), with an ``observed``
flag and the staleness age ``days_since_obs``. Leading cells before a
priority's first observation stay NULL (there is nothing to carry).

SCALE: the fact table collapses to the (priority, day) census in ONE
map-side-combinable shuffle; the grid is |priorities| x |days| (a few
thousand rows at ANY corpus size — it grows with the time span, not
the row count), built from a 1-row broadcast bounds agg + an integer
``sequence`` explode, never a row-number over facts. The LOCF window
is partitioned by priority over that calendar-bounded frame — the
plan-gate-approved window posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sources.readers import load_table

_EPOCH = "1970-01-01"


def gapfill_locf(
    daily: DataFrame,
    group_col: str,
    day_col: str,
    value_cols: list,
    count_col: str,
) -> DataFrame:
    """Dense-calendar LOCF fill of a (group, day-index) census. The
    calendar spans the GLOBAL min..max day so every group shares one
    grid; per-group leading days stay NULL."""
    bounds = daily.agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    calendar = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias(day_col)
    )
    grid = calendar.crossJoin(daily.select(group_col).distinct())
    g = grid.join(daily, [group_col, day_col], "left")
    w = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    observed = F.col(count_col).isNotNull()
    return g.select(
        group_col,
        day_col,
        F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_locf")
            for c in value_cols
        ],
        observed.alias("observed"),
        (
            F.col(day_col)
            - F.last(
                F.when(observed, F.col(day_col)), ignorenulls=True
            ).over(w)
        ).alias("days_since_obs"),
    )


def q_gapfill_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(_EPOCH).cast("date")
        )
        .cast("bigint")
        .alias("d"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    daily = orders.groupBy("o_orderpriority", "d").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_c").alias("rev_c"),
    )
    return gapfill_locf(
        daily,
        group_col="o_orderpriority",
        day_col="d",
        value_cols=["rev_c"],
        count_col="n_orders",
    )


ORACLE_GAPFILL_LOCF_DAILY = """
WITH daily AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
         COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
calendar AS (SELECT unnest(range(lo, hi + 1)) AS d FROM bounds),
grid AS (
  SELECT p.o_orderpriority, c.d
  FROM (SELECT DISTINCT o_orderpriority FROM daily) p CROSS JOIN calendar c
)
SELECT g.o_orderpriority,
       g.d,
       COALESCE(dy.n_orders, 0) AS n_orders,
       last_value(dy.rev_c IGNORE NULLS) OVER w AS rev_c_locf,
       dy.n_orders IS NOT NULL AS observed,
       g.d - last_value(
         CASE WHEN dy.n_orders IS NOT NULL THEN g.d END IGNORE NULLS
       ) OVER w AS days_since_obs
FROM grid g LEFT JOIN daily dy USING (o_orderpriority, d)
WINDOW w AS (
  PARTITION BY g.o_orderpriority ORDER BY g.d
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
"""

register("gapfill_locf_daily", q_gapfill_locf_daily, ORACLE_GAPFILL_LOCF_DAILY)
