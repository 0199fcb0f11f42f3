"""Bin-bucketed interval join (extension; completes the temporal-join
family next to `events_asof_join` and the streaming interval join).

A point-in-interval join (`p BETWEEN s AND e`) has no equi-key, and
Spark's only native plan for it is BroadcastNestedLoopJoin — O(|points|
x |intervals|) comparisons, the classic non-equi scale cliff.  The
standard fix (also what Databricks' range-join optimization does under
the hood): quantize both sides to fixed-width BINS — each interval
explodes to the bins it covers, each point maps to its one bin — then
run an ordinary hash equi-join on the bin id and re-check the exact
range predicate.  Comparisons drop from |P| x |I| to |P| x (avg
intervals per bin), and the join shuffles/broadcasts like any equi-join.

Choosing bin width: ~ the median interval length; wider bins raise
false candidates (more intervals per bin), narrower bins grow the
interval explosion (length / bin_size rows per interval).  Explosion is
row-local (`sequence` + `explode`), so it costs no shuffle.

The graded query counts events inside per-type "busy windows" (the
top-3 busiest days ± 1 day) — interval derivation, the binned join, and
the count all replay exactly in the DuckDB oracle, which expresses the
SAME join as a textbook non-equi BETWEEN (proving the binned rewrite's
semantics, the same proof pattern as the TPC-H Q21 rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: int,
    how: str = "inner",
) -> DataFrame:
    """Join points (BIGINT ``point_col``) to intervals (closed
    [start_col, end_col], BIGINT) via fixed-width binning + exact
    re-check.  Returns point rows joined to their covering interval
    rows; a point inside k overlapping intervals yields k rows (true
    join semantics).  ``how='left'`` keeps uncovered points with NULL
    interval columns (one row per uncovered point).

    Correctness of 'left' under binning: a point lives in exactly ONE
    bin, and an interval's exploded copy for that bin is unique, so a
    (point, interval) pair meets at most once — folding the exact range
    predicate into the join condition therefore gives textbook left-join
    semantics with no duplicate null-extension and no fan-out.  The bin
    equality stays the extractable equi-key (hash join, not BNLJ); the
    range predicate rides along as the join filter."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    binned_points = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_size).cast("bigint")
    ).alias("p")
    exploded = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size).cast("bigint"),
                F.floor(F.col(end_col) / bin_size).cast("bigint"),
            )
        ),
    ).alias("i")
    cond = (
        (F.col("p.__bin") == F.col("i.__bin"))  # the ONE equi-key
        & (F.col(f"p.{point_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{point_col}") <= F.col(f"i.{end_col}"))
    )
    return binned_points.join(exploded, cond, how).select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}") for c in intervals.columns],
    )


def q_events_in_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: its 3 busiest days (by event count, day
    tie-break) widened to ±1-day windows, then the count of the type's
    events falling inside each window via the binned interval join."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
    )
    census = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    top = (
        census.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("n").desc(), F.col("day")
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .select(
            F.col("event_type").alias("w_type"),
            (F.col("day") - 1).alias("win_start"),
            (F.col("day") + 1).alias("win_end"),
        )
    )
    joined = interval_join(
        ev, top, point_col="day", start_col="win_start", end_col="win_end", bin_size=3
    ).filter(F.col("event_type") == F.col("w_type"))
    return (
        joined.groupBy("event_type", "win_start")
        .agg(F.count(F.lit(1)).alias("n_in_win"))
        .select(
            "event_type",
            F.col("win_start").cast("bigint").alias("win_start"),
            "n_in_win",
        )
    )


ORACLE_EVENTS_IN_BUSY_WINDOWS = """
WITH ev AS (
  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events
), census AS (
  SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2
), top AS (
  SELECT event_type AS w_type, day - 1 AS win_start, day + 1 AS win_end
  FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, day) AS rn
    FROM census
  ) WHERE rn <= 3
)
SELECT e.event_type, CAST(t.win_start AS BIGINT) AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n_in_win
FROM ev e JOIN top t
  ON e.event_type = t.w_type
 AND e.day BETWEEN t.win_start AND t.win_end
GROUP BY 1, 2
"""


register(
    "events_in_busy_windows", q_events_in_busy_windows, ORACLE_EVENTS_IN_BUSY_WINDOWS
)
