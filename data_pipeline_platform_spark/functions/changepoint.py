"""CUSUM changepoint / drift detection over event streams (extension;
no reference counterpart — the reference has no time-series ops, see
SURVEY.md §2.11).

`events_burst` flags single anomalous hours; `cusum_changepoints` is
its complement for SLOW drift — a rate change too small to trip a
per-hour threshold but persistent enough to accumulate. The classic
one-sided CUSUM recursion S_t = max(0, S_{t-1} + (x_t - mu)) looks
sequential, but it has a closed form as pure window algebra:

    S_t = P_t - min_{j<=t} P_j,   P_t = running sum of (x_t - mu)

so the whole detector is a per-type hourly rollup (the ONE fact-sized
shuffle) followed by two ordered windows over the tiny hourly frame —
running sum, then running min. No recursion, no UDF, no iteration.

Exactness: with n hours and T total events, x_t - mu is scaled by n to
the integer D_t = n*x_t - T (the same multiply-through trick
`events_burst` uses), so P, its running min, and S are all exact
BIGINTs and the flag comparison `S > 2*T` (cumulative excess beyond two
mean-hours, in the same scaled units) is integer-exact in both engines.

At 100 TB the hourly rollup shuffle is unavoidable (and map-side
combinable); the windows run over |types x hours| rows — the already
reduced frame — partitioned by type, so no single-task global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register


def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly CUSUM: (event_type, hour_start, n_events,
    cusum_scaled, drifting). cusum_scaled = n*S_t in the scaled-integer
    domain; drifting = cumulative excess exceeded two mean-hours."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    per_type = Window.partitionBy("event_type")
    ordered = Window.partitionBy("event_type").orderBy("hour_start")
    return (
        hourly.withColumn("__t", F.sum("n_events").over(per_type))
        .withColumn("__n", F.count(F.lit(1)).over(per_type))
        .withColumn("__d", F.col("__n") * F.col("n_events") - F.col("__t"))
        .withColumn("__p", F.sum("__d").over(ordered))
        # S_t = P_t - min prefix so far; least(P, 0) folds in the empty
        # prefix (j = 0), which the pure running min misses at t = 1
        .withColumn("__m", F.least(F.min("__p").over(ordered), F.lit(0)))
        .withColumn("cusum_scaled", (F.col("__p") - F.col("__m")).cast("bigint"))
        .withColumn("drifting", F.col("cusum_scaled") > 2 * F.col("__t"))
        .select("event_type", "hour_start", "n_events", "cusum_scaled", "drifting")
    )


ORACLE_CUSUM_CHANGEPOINTS = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), scaled AS (
  SELECT *,
         SUM(n_events) OVER (PARTITION BY event_type) AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
), prefixed AS (
  SELECT *,
         SUM(n * n_events - t) OVER
           (PARTITION BY event_type ORDER BY hour_start) AS p
  FROM scaled
), cusum AS (
  SELECT *,
         p - least(MIN(p) OVER
               (PARTITION BY event_type ORDER BY hour_start), 0) AS s
  FROM prefixed
)
SELECT event_type, hour_start, n_events,
       CAST(s AS BIGINT) AS cusum_scaled,
       s > 2 * t AS drifting
FROM cusum
"""

register("cusum_changepoints", q_cusum_changepoints, ORACLE_CUSUM_CHANGEPOINTS)


TOP_PATHS = 10


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the TOP_PATHS most common 3-step
    event-type sequences WITHIN a session (>30-min silence = session
    boundary, the `events_sessionize` contract) — the funnel-discovery
    complement of `events_markov`, which only sees single transitions.

    Shape: one user-keyed window pass assigns sessions and pulls the
    two following event types (lag/lead over the same sort — no
    self-join); the path census is a map-side-combinable count keyed on
    the 3-path; top-k is a rank over the tiny |distinct paths| frame
    (deterministic: count desc, then path lexicographic). The only
    fact-sized shuffle is the user-keyed sort the sessionization
    already pays."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_secs = F.unix_timestamp(F.col("ts"))
    with_sid = (
        ev.withColumn(
            "new_session",
            F.when(gap_secs - F.lag(gap_secs).over(w_user) > 1800, 1)
            .otherwise(0)
            .cast("long"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    triples = (
        with_sid.withColumn("e2", F.lead("event_type", 1).over(w_sess))
        .withColumn("e3", F.lead("event_type", 2).over(w_sess))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
    )
    counted = triples.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    w_rank = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_PATHS)
        .select("path", "n", F.col("rank").cast("bigint").alias("rank"))
    )


ORACLE_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sid AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), triples AS (
  SELECT event_type || ' > ' ||
         lead(event_type, 1) OVER w || ' > ' ||
         lead(event_type, 2) OVER w AS path,
         lead(event_type, 2) OVER w AS e3
  FROM sid
  WINDOW w AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
), counted AS (
  SELECT path, COUNT(*) AS n FROM triples WHERE e3 IS NOT NULL GROUP BY 1
)
SELECT path, n, CAST(rank AS BIGINT) AS rank FROM (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path ASC) AS rank
  FROM counted
) WHERE rank <= {TOP_PATHS}
"""

register("session_paths", q_session_paths, ORACLE_SESSION_PATHS)
