"""Distribution-shift tests on numeric marginals + calendar
seasonality (extension; no reference counterpart — the reference has
no analytics ops, see SURVEY.md §2.11).

- ``ks_wasserstein_sources``: per source, the two-sample
  Kolmogorov-Smirnov D and the 1-D Wasserstein (earth mover's)
  distance between the source's document-length distribution and the
  REST of the corpus — the numeric-marginal twin of
  ``js_divergence_sources`` (which tests the token distribution).
  KS answers "did the shape shift anywhere", W1 answers "by how much
  mass x distance" — the pair a curation dashboard wants per provider.
- ``dow_seasonality``: day-of-week seasonality indices of order
  revenue (per-day mean over grand mean) — the calendar screen before
  trusting any daily trend operator.

Scale shape:

- ``ks_wasserstein_sources``: ONE (source, length)-keyed census
  shuffle over documents; the evaluation grid is |sources| x
  |distinct lengths| (both value-domain bounded); every cumulative
  window is PARTITIONED BY source — the global ECDF at each grid
  point comes from cumulating the value-marginal column inside the
  same source partition, so no unpartitioned window exists anywhere.
- ``dow_seasonality``: one groupBy on a 7-value derived key; the
  grand totals are a 1-row broadcast.

Determinism — both queries are transcendental-free:

- both ECDF statistics clear denominators: at grid value v,
  |ECDF_s - ECDF_rest| = |cum_s*(N-ns) - (cum_all-cum_s)*ns| /
  (ns*(N-ns)), an exact integer (accumulated in DECIMAL(38,0) /
  HUGEINT so corpus-scale counts cannot overflow); KS is the integer
  max, W1 the integer sum weighted by exact grid gaps, each closed by
  ONE IEEE division.
- day-of-week comes from day-difference arithmetic against a fixed
  Monday epoch (pmod 7), NOT the engines' dayofweek() functions
  (Spark numbers Sunday=1, DuckDB Sunday=0); the seasonal index is a
  ratio of two exact DECIMAL products converted once to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.utils.cache import tracked_persist

_DEC = "DECIMAL(38,0)"


def q_ks_wasserstein_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, ks_d, wasserstein) per source vs the rest,
    over the n_chars marginal."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    # ONE fact-sized shuffle: the (source, length) census
    sv = docs.groupBy("source", F.col("n_chars").alias("len_bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    sv = tracked_persist(sv)
    vals = sv.groupBy("len_bin").agg(F.sum("c").alias("ct"))
    srcs = sv.groupBy("source").agg(F.sum("c").alias("ns"))
    grand = srcs.agg(F.sum("ns").alias("n"))
    # dense grid: every source sees every grid value (both domains
    # bounded), so the source-partitioned cumsum of ct IS the global
    # ECDF numerator at that value
    grid = srcs.crossJoin(F.broadcast(vals)).join(
        sv, ["source", "len_bin"], "left"
    ).select(
        "source",
        "ns",
        "len_bin",
        "ct",
        F.coalesce("c", F.lit(0)).alias("c0"),
    )
    w = Window.partitionBy("source").orderBy("len_bin")
    cums = grid.crossJoin(F.broadcast(grand)).select(
        "source",
        "ns",
        "n",
        "len_bin",
        F.sum("c0").over(w).alias("cum_s"),
        F.sum("ct").over(w).alias("cum_all"),
        (F.lead("len_bin").over(w) - F.col("len_bin")).alias("gap"),
    )
    # exact integer ECDF gap numerator at this grid value
    diff = cums.select(
        "source",
        "ns",
        "n",
        "gap",
        F.expr(
            f"abs(CAST(cum_s AS {_DEC}) * (n - ns)"
            f" - CAST(cum_all - cum_s AS {_DEC}) * ns)"
        ).alias("d_num"),
    )
    per_src = diff.groupBy("source", "ns", "n").agg(
        F.max("d_num").alias("ks_num"),
        F.sum(
            F.expr(f"CASE WHEN gap IS NULL THEN CAST(0 AS {_DEC})"
                   f" ELSE d_num * gap END")
        ).alias("w1_num"),
    )
    return per_src.select(
        "source",
        F.col("ns").alias("n_docs"),
        F.expr(
            f"CAST(ks_num AS DOUBLE) / CAST(CAST(ns AS {_DEC}) * (n - ns) AS DOUBLE)"
        ).alias("ks_d"),
        F.expr(
            f"CAST(w1_num AS DOUBLE) / CAST(CAST(ns AS {_DEC}) * (n - ns) AS DOUBLE)"
        ).alias("wasserstein"),
    )


ORACLE_KS_WASSERSTEIN_SOURCES = f"""
WITH sv AS MATERIALIZED (
  SELECT source, n_chars AS len_bin, COUNT(*) AS c
  FROM documents GROUP BY 1, 2
), vals AS (SELECT len_bin, SUM(c) AS ct FROM sv GROUP BY 1),
srcs AS (SELECT source, SUM(c) AS ns FROM sv GROUP BY 1),
grand AS (SELECT SUM(ns) AS n FROM srcs),
grid AS (
  SELECT srcs.source, srcs.ns, vals.len_bin, vals.ct,
         COALESCE(sv.c, 0) AS c0
  FROM srcs CROSS JOIN vals
  LEFT JOIN sv ON sv.source = srcs.source AND sv.len_bin = vals.len_bin
), cums AS (
  SELECT source, ns, n, len_bin,
         SUM(c0) OVER (PARTITION BY source ORDER BY len_bin) AS cum_s,
         SUM(ct) OVER (PARTITION BY source ORDER BY len_bin) AS cum_all,
         lead(len_bin) OVER (PARTITION BY source ORDER BY len_bin)
           - len_bin AS gap
  FROM grid, grand
), diff AS (
  SELECT source, ns, n, gap,
         abs(CAST(cum_s AS {_DEC}) * (n - ns)
             - CAST(cum_all - cum_s AS {_DEC}) * ns) AS d_num
  FROM cums
), per_src AS (
  SELECT source, ns, n, MAX(d_num) AS ks_num,
         SUM(CASE WHEN gap IS NULL THEN CAST(0 AS {_DEC})
             ELSE d_num * gap END) AS w1_num
  FROM diff GROUP BY 1, 2, 3
)
SELECT source, ns AS n_docs,
       CAST(ks_num AS DOUBLE)
         / CAST(CAST(ns AS {_DEC}) * (n - ns) AS DOUBLE) AS ks_d,
       CAST(w1_num AS DOUBLE)
         / CAST(CAST(ns AS {_DEC}) * (n - ns) AS DOUBLE) AS wasserstein
FROM per_src
"""

register(
    "ks_wasserstein_sources", q_ks_wasserstein_sources, ORACLE_KS_WASSERSTEIN_SOURCES
)

# Monday epoch for engine-portable day-of-week (0 = Monday)
_MONDAY = "1995-01-02"


def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dow, n_orders, revenue_cents, seasonal_index) — 7 rows;
    index = per-day mean revenue over grand mean, 1.0 = no effect."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(f"pmod(datediff(o_orderdate, DATE '{_MONDAY}'), 7)").alias("dow"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    days = orders.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )
    tot = days.agg(
        F.sum("n_orders").alias("n_tot"), F.sum("revenue_cents").alias("rev_tot")
    )
    return days.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_orders",
        "revenue_cents",
        F.expr(
            f"CAST(CAST(revenue_cents AS {_DEC}) * n_tot AS DOUBLE)"
            f" / CAST(CAST(n_orders AS {_DEC}) * rev_tot AS DOUBLE)"
        ).alias("seasonal_index"),
    )


ORACLE_DOW_SEASONALITY = f"""
WITH days AS (
  SELECT (date_diff('day', DATE '{_MONDAY}', CAST(o_orderdate AS DATE))
            % 7 + 7) % 7 AS dow,
         COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents
  FROM orders GROUP BY 1
), tot AS (
  SELECT SUM(n_orders) AS n_tot, SUM(revenue_cents) AS rev_tot FROM days
)
SELECT dow, n_orders, revenue_cents,
       CAST(CAST(revenue_cents AS {_DEC}) * n_tot AS DOUBLE)
         / CAST(CAST(n_orders AS {_DEC}) * rev_tot AS DOUBLE) AS seasonal_index
FROM days, tot
"""

register("dow_seasonality", q_dow_seasonality, ORACLE_DOW_SEASONALITY)
