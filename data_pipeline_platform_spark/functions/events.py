"""Event-stream analytics over `events` (M8 extension): the batch twins
of the streaming operators in streaming/windows.py — identical window
semantics, verifiable against the DuckDB oracle (a streaming sink can't
be oracle-compared, so the batch forms carry the correctness evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

DEC = "decimal(12,2)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "events")


def q_events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch twin of the streaming
    version; date_trunc == window(ts, '1 hour').start)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_EVENTS_TUMBLING_HOUR = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a >30-min silence starts a new session. Classic
    gaps-and-islands via lag + running sum — one shuffle on user_id."""
    ev = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast("long"): valid on both TIMESTAMP and
    # TIMESTAMP_NTZ inputs (defense in depth on top of the load_table
    # contract; CAST(ntz AS BIGINT) is an AnalysisException)
    gap_secs = F.unix_timestamp(F.col("ts"))
    with_gap = ev.withColumn(
        "new_session",
        F.when(gap_secs - F.lag(gap_secs).over(w_user) > 1800, 1)
        .otherwise(0)
        .cast("long"),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sid AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sid GROUP BY user_id, session_seq
"""


def q_events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile: counts by type via pivot-style conditional aggs
    + first/last seen (the shape of a feature-extraction job)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


ORACLE_EVENTS_USER_ACTIVITY = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       MIN(ts) AS first_seen, MAX(ts) AS last_seen,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (semi-structured path)."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


ORACLE_EVENTS_JSON_PROPS = """
WITH t AS (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
SELECT event_type, COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max
FROM t GROUP BY event_type
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (beyond-reference operator the platform lacks): for
    each purchase, the user's most recent prior signup/click. Expressed
    as a union + window trick: one shuffle on user_id, no range
    explosion — the scalable as-of pattern (vs. an inequality join).
    """
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    # union-tag approach: sort by time within user, carry last click forward
    tagged = purchases.select(
        "user_id",
        F.col("pts").alias("ts"),
        F.col("purchase_id").alias("pid"),
        F.lit(None).cast("long").alias("cid"),
        F.col("purchase_id").alias("tiebreak"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("cts").alias("ts"),
            F.lit(None).cast("long").alias("pid"),
            F.col("click_id").alias("cid"),
            F.col("click_id").alias("tiebreak"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tiebreak")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("last_click_id", F.last("cid", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("pid").isNotNull())
        .select(
            "user_id",
            F.col("pid").alias("purchase_id"),
            "last_click_id",
        )
    )


ORACLE_EVENTS_ASOF_JOIN = """
WITH tagged AS (
  SELECT user_id, ts, event_id AS tiebreak,
         CASE WHEN event_type = 'purchase' THEN event_id END AS pid,
         CASE WHEN event_type = 'click' THEN event_id END AS cid
  FROM events WHERE event_type IN ('purchase', 'click')
), carried AS (
  SELECT user_id, pid,
         last_value(cid IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, tiebreak
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
  FROM tagged
)
SELECT user_id, pid AS purchase_id, last_click_id
FROM carried WHERE pid IS NOT NULL
"""


register("events_tumbling_hour", q_events_tumbling_hour, ORACLE_EVENTS_TUMBLING_HOUR)
register("events_sessionize", q_events_sessionize, ORACLE_EVENTS_SESSIONIZE)
register("events_user_activity", q_events_user_activity, ORACLE_EVENTS_USER_ACTIVITY)
register("events_json_props", q_events_json_props, ORACLE_EVENTS_JSON_PROPS)
register("events_asof_join", q_events_asof_join, ORACLE_EVENTS_ASOF_JOIN)


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted as active per week offset — the standard growth-analytics
    matrix. Two aggregations over one scan subtree (first-seen per user,
    distinct active weeks per user) joined on user_id; the join input is
    already user-grain, so it is orders of magnitude smaller than the
    event stream at 100 TB."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


ORACLE_EVENTS_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT user_id) AS active_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""

register("events_retention", q_events_retention, ORACLE_EVENTS_RETENTION)


def q_events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the minute, hour, and day
    resolutions of the events stream materialized in ONE fact pass via
    GROUPING SETS — the multi-resolution rollup a time-series store
    (e.g. a hypertable) maintains as separate materialized views.

    Plan: one scan, Expand (3 grouping sets) feeding a single
    partial-aggregated exchange; n_users stays an exact distinct per
    set. At 100 TB this replaces three separate rollup jobs with one,
    and the output is partition-friendly (resolution, bucket_start)."""
    from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer

    t = SQLTransformer(spark)
    return t.transform(
        _events(spark, sf_dir),
        """
        SELECT CASE WHEN grouping(m) = 0 THEN 'minute'
                    WHEN grouping(h) = 0 THEN 'hour'
                    ELSE 'day' END AS resolution,
               coalesce(m, h, d) AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM (SELECT date_trunc('minute', ts) AS m, date_trunc('hour', ts) AS h,
                     date_trunc('day', ts) AS d, event_type, value, user_id
              FROM input_data)
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
        """,
    )


ORACLE_EVENTS_MULTIRES_ROLLUP = """
SELECT CASE WHEN grouping(m) = 0 THEN 'minute'
            WHEN grouping(h) = 0 THEN 'hour'
            ELSE 'day' END AS resolution,
       coalesce(m, h, d) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM (SELECT date_trunc('minute', ts) AS m, date_trunc('hour', ts) AS h,
             date_trunc('day', ts) AS d, event_type, value, user_id
      FROM events)
GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
"""

register("events_multires_rollup", q_events_multires_rollup, ORACLE_EVENTS_MULTIRES_ROLLUP)


def q_events_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: user-hours whose event count exceeds 1.5x the
    user's mean hourly rate — the anomaly screen for bot traffic /
    scraper storms in an event firehose. (The synthetic stream is
    near-uniform per user — max observed ratio 2-3.8x across SFs — so
    1.5x keeps the flagged set non-vacuous at every shipped SF while
    still selecting ~5%; production would raise the ratio.)

    The threshold is evaluated in EXACT integer arithmetic
    (2 * c * n_hours > 3 * total) rather than comparing against a float
    mean, so both engines flag the identical user-hour set — the same
    integer-comparison trick the Q11/Q22 adaptations use for their
    aggregate thresholds.

    Plan: one (user, hour) aggregation, then the per-user totals ride
    a user-keyed window over that already-reduced frame — no second
    scan of the fact table, no join. At 100 TB the window frame is
    |users x active-hours| of the aggregate, not raw events."""
    ev = _events(spark, sf_dir)
    per_hour = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("user_id")
    return (
        per_hour.withColumn("__total", F.sum("n_events").over(w))
        .withColumn("__hours", F.count(F.lit(1)).over(w))
        .filter(2 * F.col("n_events") * F.col("__hours") > 3 * F.col("__total"))
        .select("user_id", "hour_start", "n_events")
    )


ORACLE_EVENTS_BURST = """
WITH per_hour AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT *, SUM(n_events) OVER (PARTITION BY user_id) AS total,
         COUNT(*) OVER (PARTITION BY user_id) AS n_hours
  FROM per_hour
)
SELECT user_id, hour_start, n_events
FROM tot WHERE 2 * n_events * n_hours > 3 * total
"""


register("events_burst", q_events_burst, ORACLE_EVENTS_BURST)


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: for each day, distinct daily actives over
    distinct trailing-7-day actives — the canonical engagement ratio.

    Exact-by-construction: both counts are COUNT(DISTINCT) integers and
    the ratio is one double division. The trailing-week count uses a
    self-contained day x user frame joined over a 7-day range — at the
    (day, user) aggregate grain, which is tiny relative to raw events
    (the fact table reduces before anything joins). Two shuffles total:
    the day-user reduction and the day-keyed final aggregation."""
    ev = _events(spark, sf_dir)
    day_user = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    daily = day_user.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = daily.select("day")
    weekly = (
        days.join(
            day_user.select(F.col("day").alias("d2"), "user_id"),
            (F.col("d2") <= F.col("day"))
            & (F.col("d2") > F.date_sub(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        daily.join(weekly, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


ORACLE_EVENTS_STICKINESS = """
WITH day_user AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), daily AS (
  SELECT day, COUNT(*) AS dau FROM day_user GROUP BY day
), weekly AS (
  SELECT d.day, COUNT(DISTINCT du.user_id) AS wau
  FROM (SELECT day FROM daily) d
  JOIN day_user du
    ON du.day <= d.day AND du.day > d.day - INTERVAL 7 DAY
  GROUP BY d.day
)
SELECT day, dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
FROM daily JOIN weekly USING (day)
"""


register("events_stickiness", q_events_stickiness, ORACLE_EVENTS_STICKINESS)


# fixed-point scale for event values in the anomaly op: values are
# dollars-ish doubles (two-decimal magnitude); 1e6 keeps the scaled
# square within DECIMAL(38,0) at any realistic per-user volume
_Z_SCALE = 1_000_000
_Z_THRESHOLD = 2.5


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection over event values (the
    monitoring primitive a pipeline runs on metric streams; batch twin
    of a streaming applyInPandasWithState detector).

    Determinism: per-user moments are exact integers — value is scaled
    to a BIGINT at 1e-6 resolution, the first moment sums as BIGINT,
    the second as DECIMAL(38,0) — so mean/variance are order-free and
    the double z-score derives from identical exact inputs in both
    engines (no accumulation-order drift, the same fixed-point trick as
    kmeans_lloyd_step).

    Plan: one shuffle for the per-user stats (map-side partial agg),
    then the user-count-sized stats frame broadcasts back onto the
    events scan — the flagging pass is shuffle-free. At 100 TB the
    stats frame is |users| rows, far below the fact table.
    """
    ev = _events(spark, sf_dir).withColumn(
        "v_fp", F.expr(f"CAST(round(value * {_Z_SCALE}) AS BIGINT)")
    )
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_fp").alias("sum_fp"),
        F.sum(
            F.expr("CAST(v_fp AS DECIMAL(18,0)) * CAST(v_fp AS DECIMAL(18,0))")
        ).alias("sumsq_fp"),
    )
    flagged = (
        ev.join(F.broadcast(stats), "user_id")
        .withColumn("mean_fp", F.col("sum_fp").cast("double") / F.col("n_events"))
        .withColumn(
            "var_fp",
            F.col("sumsq_fp").cast("double") / F.col("n_events")
            - F.col("mean_fp") * F.col("mean_fp"),
        )
        .filter(F.col("var_fp") > 0)
        .withColumn(
            "z",
            (F.col("v_fp") - F.col("mean_fp")) / F.sqrt(F.col("var_fp")),
        )
        .filter(F.abs(F.col("z")) >= _Z_THRESHOLD)
    )
    return flagged.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.round("z", 6).alias("z"),
        "n_events",
    )


ORACLE_EVENTS_ANOMALY = f"""
WITH e AS (
  SELECT *, CAST(round(value * {_Z_SCALE}) AS BIGINT) AS v_fp FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(v_fp) AS sum_fp,
         SUM(CAST(v_fp AS HUGEINT) * v_fp) AS sumsq_fp
  FROM e GROUP BY user_id
), z AS (
  SELECT e.event_id, e.user_id, e.event_type, e.value, s.n_events,
         CAST(s.sum_fp AS DOUBLE) / s.n_events AS mean_fp,
         CAST(s.sumsq_fp AS DOUBLE) / s.n_events
           - (CAST(s.sum_fp AS DOUBLE) / s.n_events)
             * (CAST(s.sum_fp AS DOUBLE) / s.n_events) AS var_fp,
         e.v_fp
  FROM e JOIN s USING (user_id)
)
SELECT event_id, user_id, event_type, value,
       round((v_fp - mean_fp) / sqrt(var_fp), 6) AS z,
       n_events
FROM z
WHERE var_fp > 0 AND abs((v_fp - mean_fp) / sqrt(var_fp)) >= {_Z_THRESHOLD}
"""


register("events_anomaly", q_events_anomaly, ORACLE_EVENTS_ANOMALY)


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    with alpha = 1/2 — the smoothing primitive for metric monitoring.

    alpha = 1/2 is chosen deliberately: s_t = (v_t + s_{t-1}) / 2
    divides by two, which only decrements the double's exponent —
    EXACT, no rounding — so the whole sequential chain is
    deterministic and the oracle replays it bitwise with a list_reduce
    over the same event order (ts, event_id). A general alpha
    multiplies by inexact constants whose accumulation is
    engine-order-fragile.

    Plan: one shuffle (groupBy user_id with collect_list); the fold is
    a row-local sequential lambda over the user's ordered events —
    state bounded by per-user event count, the same bound sessionize
    already carries. Output grain: (user_id, n_events, ewma, last_value).
    """
    ev = _events(spark, sf_dir)
    grouped = ev.groupBy("user_id").agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'ts', ts, 'event_id', event_id, 'value', value)))"
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return grouped.select(
        "user_id",
        "n_events",
        F.expr(
            "round(aggregate(slice(seq, 2, size(seq) - 1), "
            "element_at(seq, 1).value, "
            "(acc, e) -> (e.value + acc) / 2), 6)"
        ).alias("ewma"),
        F.expr("element_at(seq, -1).value").alias("last_value"),
    )


ORACLE_EVENTS_EWMA = """
WITH g AS (
  SELECT user_id,
         list({'ts': ts, 'event_id': event_id, 'value': value}
              ORDER BY ts, event_id) AS seq,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       round(list_reduce(list_transform(seq, e -> e.value),
             (acc, v) -> (v + acc) / 2), 6) AS ewma,
       seq[len(seq)].value AS last_value
FROM g
"""


register("events_ewma", q_events_ewma, ORACLE_EVENTS_EWMA)


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next_type | type), the sequence-analytics primitive
    behind funnel discovery and anomalous-flow detection.

    One user-keyed window (lead over (ts, event_id) order) then a
    transition-keyed count — both map-side-combinable aggregations;
    |event_types|² output rows regardless of scale. Probabilities are
    exact-BIGINT count ratios cast to double (deterministic division,
    no accumulation)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("event_type").agg(F.sum("n").alias("row_total"))
    return trans.join(totals, "event_type").select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("row_total")).alias("p"),
    )


ORACLE_EVENTS_MARKOV = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), trans AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
), totals AS (
  SELECT event_type, SUM(n) AS row_total FROM trans GROUP BY 1
)
SELECT t.event_type, t.next_type, t.n,
       CAST(t.n AS DOUBLE) / tot.row_total AS p
FROM trans t JOIN totals tot USING (event_type)
"""


register("events_markov", q_events_markov, ORACLE_EVENTS_MARKOV)


def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` over an irregular
    series: each reading holds until the next one, so TWA =
    sum(value_i * dt_i) / sum(dt_i) — the step-function integral that
    plain AVG gets wrong whenever sampling is burst-y (the standard
    IoT/pricing estimator).

    Determinism: dt in exact integer microseconds (unix_micros), value
    in exact cents; products sum as DECIMAL(38,0) (cents x micros
    reaches ~1e18 per term — BIGINT sums would overflow), one double
    division at the end. One user-keyed shuffle; users with a single
    event have no holding interval and drop out (sum(dt) = 0)."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    stepped = ev.withColumn(
        "dt_us",
        F.expr("unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - unix_micros(ts)"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(
                F.expr(
                    "CAST(CAST(round(value * 100) AS BIGINT) * dt_us AS DECIMAL(38,0))"
                )
            ).alias("wsum"),
            F.sum(F.expr("CAST(dt_us AS DECIMAL(38,0))")).alias("dsum"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.expr(
                "round(CAST(wsum AS DOUBLE) / CAST(dsum AS DOUBLE) / 100.0, 6)"
            ).alias("twa_value"),
        )
    )


ORACLE_EVENTS_TIME_WEIGHTED_AVG = """
WITH stepped AS (
  SELECT user_id,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us,
         value
  FROM events
), kept AS (
  SELECT * FROM stepped WHERE dt_us IS NOT NULL
)
SELECT user_id, COUNT(*) AS n_intervals,
       round(CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT) * dt_us AS HUGEINT)) AS DOUBLE)
             / CAST(SUM(CAST(dt_us AS HUGEINT)) AS DOUBLE) / 100.0, 6) AS twa_value
FROM kept GROUP BY user_id
"""

register(
    "events_time_weighted_avg",
    q_events_time_weighted_avg,
    ORACLE_EVENTS_TIME_WEIGHTED_AVG,
)


ATTRIB_WINDOW_SEC = 3600  # last-touch lookback


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the latest click by
    the same user within the preceding hour — the canonical
    marketing-analytics interval join.

    Shape: equi-join on user_id (the interval predicate filters inside
    the join — no cross product; user activity bounds the pair count),
    then a purchase-keyed window picks the last touch with a
    deterministic (c_ts, click_id) tie-break. Latency is exact integer
    seconds from microsecond arithmetic."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    pairs = purchases.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & F.expr(f"c_ts >= p_ts - INTERVAL {ATTRIB_WINDOW_SEC} SECOND")
    )
    last = pairs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("purchase_id").orderBy(
                F.desc("c_ts"), F.desc("click_id")
            )
        ),
    ).filter(F.col("rn") == 1)
    return last.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.expr(
            "CAST((unix_micros(p_ts) - unix_micros(c_ts)) div 1000000 AS BIGINT)"
        ).alias("latency_sec"),
    )


ORACLE_EVENTS_ATTRIBUTION = f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT p.purchase_id, c.click_id, p.user_id, p.p_ts, c.c_ts
  FROM purchases p JOIN clicks c USING (user_id)
  WHERE c.c_ts <= p.p_ts
    AND c.c_ts >= p.p_ts - INTERVAL {ATTRIB_WINDOW_SEC} SECOND
), last AS (
  SELECT *, row_number() OVER (
    PARTITION BY purchase_id ORDER BY c_ts DESC, click_id DESC
  ) AS rn
  FROM pairs
)
SELECT purchase_id, click_id, user_id,
       CAST((epoch_us(p_ts) - epoch_us(c_ts)) // 1000000 AS BIGINT)
         AS latency_sec
FROM last WHERE rn = 1
"""

register("events_attribution", q_events_attribution, ORACLE_EVENTS_ATTRIBUTION)


def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature-store row for churn/engagement models: volume,
    span, cadence, monetary stats, and a within-user momentum signal
    (second half of the user's own active interval vs the first —
    positive means accelerating).

    Shape: one user-keyed agg for the interval bounds, join back (the
    same key, so AQE reuses the exchange), then a single conditional
    agg — all exact integers; means divide once at the end. Output is
    user-grain, the natural feature-table contract."""
    ev = _events(spark, sf_dir)
    bounds = ev.groupBy("user_id").agg(
        F.expr("CAST(min(unix_timestamp(ts)) AS BIGINT)").alias("t0"),
        F.expr("CAST(max(unix_timestamp(ts)) AS BIGINT)").alias("t1"),
    )
    joined = ev.join(bounds, "user_id").withColumn(
        "second_half",
        # strictly-after-midpoint in exact integer arithmetic:
        # 2*ts > t0 + t1 avoids the fractional midpoint
        (2 * F.expr("CAST(unix_timestamp(ts) AS BIGINT)")) > (F.col("t0") + F.col("t1")),
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.expr("CAST(ts AS DATE)")).alias("active_days"),
        F.expr("CAST((max(t1) - min(t0)) div 3600 AS BIGINT)").alias("span_hours"),
        F.expr(
            "round(CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) "
            "/ 1000000 / COUNT(*), 6)"
        ).alias("mean_value"),
        F.sum(F.expr("CAST(second_half AS INT)")).cast("bigint").alias("late_events"),
        F.expr(
            "round(CAST(2 * SUM(CAST(second_half AS INT)) - COUNT(*) AS DOUBLE) "
            "/ COUNT(*), 6)"
        ).alias("momentum"),
    )


ORACLE_USER_FEATURES = """
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS t0,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS t1
  FROM events GROUP BY 1
), j AS (
  SELECT e.user_id, e.ts, e.value, b.t0, b.t1,
         (2 * CAST(floor(epoch(e.ts)) AS BIGINT)) > (b.t0 + b.t1) AS second_half
  FROM events e JOIN b USING (user_id)
)
SELECT user_id, COUNT(*) AS n_events,
       COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
       CAST((MAX(t1) - MIN(t0)) // 3600 AS BIGINT) AS span_hours,
       round(CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*), 6) AS mean_value,
       CAST(SUM(CASE WHEN second_half THEN 1 ELSE 0 END) AS BIGINT) AS late_events,
       round(CAST(2 * SUM(CASE WHEN second_half THEN 1 ELSE 0 END) - COUNT(*) AS DOUBLE)
             / COUNT(*), 6) AS momentum
FROM j GROUP BY user_id
"""

register("user_features", q_user_features, ORACLE_USER_FEATURES)


def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy of the user's
    event-type distribution — the segmentation feature that separates
    single-action bots (H = 0) from organic multi-surface users
    (H -> log2 |types|). Companion feature to `user_features`.

    Shape: one (user, type) census (map-side combinable), one user
    rollup; the entropy fold applies the char_entropy posture — exact
    integer counts into fixed-point ln terms summed as BIGINTs, one
    final division. Both shuffles key on user/dimension columns."""
    ev = _events(spark, sf_dir)
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_u = Window.partitionBy("user_id")
    return (
        cells.withColumn("n", F.sum("c").over(w_u))
        .withColumn(
            "term_fp",
            F.expr(
                "c * CAST(round(ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.expr(
                "round(-CAST(SUM(term_fp) AS DOUBLE) / MAX(n) / 1000000 / ln(2.0), 6)"
            ).alias("entropy_bits"),
        )
    )


ORACLE_USER_TYPE_ENTROPY = """
WITH cells AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
), with_n AS (
  SELECT *, SUM(c) OVER (PARTITION BY user_id) AS n FROM cells
), terms AS (
  SELECT user_id, n,
         c * CAST(round(ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT) AS term_fp
  FROM with_n
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       round(-CAST(SUM(term_fp) AS DOUBLE) / MAX(n) / 1000000 / ln(2.0), 6)
         AS entropy_bits
FROM terms GROUP BY user_id
"""

register("user_type_entropy", q_user_type_entropy, ORACLE_USER_TYPE_ENTROPY)


def q_arrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queueing diagnostics per event type: inter-arrival gap moments
    and the coefficient of variation across the type's per-user event
    streams. CV ~ 1 is memoryless (Poisson) traffic; CV >> 1 is bursty
    (retry storms, scrapers); CV << 1 is scheduled/heartbeat traffic.

    Shape: gaps come from one lag over the (user, type)-keyed sort
    (the sessionize exchange); gap moments are exact integer seconds
    (DECIMAL(38,0) squares) in one map-side-combinable agg; CV/mean
    evaluate on the |types|-row frame with sqrt over exact-integer
    variance — the ab_ttest posture."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    secs = F.expr("CAST(unix_timestamp(ts) AS BIGINT)")
    gaps = (
        ev.withColumn("gap", secs - F.lag(secs).over(w))
        .filter(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").alias("s"),
            F.sum(F.expr("CAST(gap AS DECIMAL(38,0)) * gap")).alias("s2"),
        )
        .select(
            "event_type",
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            F.expr("round(CAST(s AS DOUBLE) / n_gaps, 6)").alias("mean_gap_s"),
            F.expr(
                "round(sqrt(CAST(n_gaps * s2 - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)) "
                "/ CAST(s AS DOUBLE), 6)"
            ).alias("cv"),
        )
    )


ORACLE_ARRIVAL_BURSTINESS = """
WITH gaps AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
             (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
), g AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       round(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_s,
       round(sqrt(CAST(COUNT(*) * SUM(CAST(gap AS HUGEINT) * gap)
                       - CAST(SUM(gap) AS HUGEINT) * SUM(gap) AS DOUBLE))
             / CAST(SUM(gap) AS DOUBLE), 6) AS cv
FROM g GROUP BY event_type
"""

register("arrival_burstiness", q_arrival_burstiness, ORACLE_ARRIVAL_BURSTINESS)


def q_events_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-planning heatmap: event volume by (day-of-week, hour),
    with each cell's share of total traffic — the 168-row table every
    on-call dashboard starts from. Day-of-week via datediff%7 against
    the Monday epoch (engine dayofweek conventions differ — the
    seasonality_decompose convention). One map-side-combinable census;
    the share divides by a broadcast total."""
    ev = _events(spark, sf_dir)
    cells = ev.groupBy(
        F.expr("pmod(datediff(CAST(ts AS DATE), DATE'1970-01-05'), 7)").alias("dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = cells.agg(F.sum("n_events").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("hour").cast("bigint").alias("hour"),
        "n_events",
        F.expr("round(CAST(n_events AS DOUBLE) / t, 6)").alias("share"),
    )


ORACLE_EVENTS_LOAD_PROFILE = """
WITH cells AS (
  SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), tot AS (SELECT SUM(n_events) AS t FROM cells)
SELECT dow, hour, n_events,
       round(CAST(n_events AS DOUBLE) / t, 6) AS share
FROM cells, tot
"""

register("events_load_profile", q_events_load_profile, ORACLE_EVENTS_LOAD_PROFILE)


def q_conversion_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: for users who both viewed and purchased, the
    distribution of first-view -> first-purchase lag — the number a
    growth team watches after every onboarding change. One row:
    audience size, conversion rate, mean and exact-median lag.

    Shape: first-touch timestamps are one (user x 2-type) min() agg;
    the lag frame is user-grain; mean comes from exact integer-second
    sums, the median from one exact percentile over integer seconds
    (broadcast scalar, rfm posture). Negative-lag users (purchased
    before ever viewing — gift flows) are excluded row-locally."""
    ev = _events(spark, sf_dir)
    firsts = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.expr("CAST(min(unix_timestamp(ts)) AS BIGINT)").alias("t0"))
    )
    v = firsts.filter(F.col("event_type") == "view").select(
        "user_id", F.col("t0").alias("tv")
    )
    p = firsts.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t0").alias("tp")
    )
    lags = v.join(p, "user_id", "left").withColumn(
        "lag_s",
        F.expr("CASE WHEN tp IS NOT NULL AND tp >= tv THEN tp - tv END"),
    )
    return lags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_viewers"),
        F.sum(F.expr("CAST(lag_s IS NOT NULL AS INT)"))
        .cast("bigint")
        .alias("n_converted"),
        F.expr(
            "round(CAST(SUM(CAST(lag_s IS NOT NULL AS INT)) AS DOUBLE) "
            "/ COUNT(*), 6)"
        ).alias("conversion_rate"),
        F.expr("round(CAST(SUM(lag_s) AS DOUBLE) / "
               "SUM(CAST(lag_s IS NOT NULL AS INT)) / 3600, 6)").alias("mean_lag_h"),
        F.expr("round(percentile(lag_s, 0.5) / 3600, 6)").alias("median_lag_h"),
    )


ORACLE_CONVERSION_LAG_STATS = """
WITH firsts AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS t0
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
), v AS (SELECT user_id, t0 AS tv FROM firsts WHERE event_type = 'view'),
p AS (SELECT user_id, t0 AS tp FROM firsts WHERE event_type = 'purchase'),
lags AS (
  SELECT v.user_id,
         CASE WHEN p.tp IS NOT NULL AND p.tp >= v.tv THEN p.tp - v.tv END AS lag_s
  FROM v LEFT JOIN p USING (user_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers,
       CAST(SUM(CASE WHEN lag_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       round(CAST(SUM(CASE WHEN lag_s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS conversion_rate,
       round(CAST(SUM(lag_s) AS DOUBLE)
             / SUM(CASE WHEN lag_s IS NOT NULL THEN 1 ELSE 0 END) / 3600, 6)
         AS mean_lag_h,
       round(quantile_cont(lag_s, 0.5) / 3600, 6) AS median_lag_h
FROM lags
"""

register("conversion_lag_stats", q_conversion_lag_stats, ORACLE_CONVERSION_LAG_STATS)


def q_stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics under the correctness gate: the
    events table is delivered as three deliberately OUT-OF-ORDER
    micro-batches (event_id % 3 — each batch spans the full time
    range, so after batch 0 the watermark sits 30 minutes behind max
    event time and most of batches 1-2 arrive late), folded with
    `streaming/windows.py::watermark_fold_tumbling` — the exact
    batch replay of Structured Streaming's append-mode drop/emit rules
    (watermark = running max event time - 30min, updated at batch end;
    a row whose window end <= watermark drops; only windows whose end
    <= final watermark emit). The fold is the documented GUARANTEE
    boundary — the engine's best-effort drop filter keeps a superset,
    which the hypothesis property suite brackets exactly against the
    real engine on shuffled deliveries; THIS twin value-grades the
    fold against a DuckDB replay of the same watermark recurrence —
    exact integer cents, bitwise."""
    from data_pipeline_platform_spark.streaming.windows import (
        watermark_fold_tumbling,
    )

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value"
    )
    batches = [ev.filter(F.col("event_id") % 3 == b) for b in range(3)]
    return watermark_fold_tumbling(batches, "1 hour", 30)


ORACLE_STREAM_WATERMARK_LATE_DROP = """
WITH e AS (
  SELECT event_id % 3 AS b, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS val_c,
         date_trunc('hour', ts) AS ws,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS we
  FROM events
), bm AS (
  SELECT b, max(ts) - INTERVAL 30 MINUTE AS bwm FROM e GROUP BY b
), wms AS (
  SELECT b,
         max(bwm) OVER (ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_before,
         max(bwm) OVER () AS wm_final
  FROM bm
), kept AS (
  SELECT e.*, w.wm_final FROM e JOIN wms w USING (b)
  WHERE w.wm_before IS NULL OR e.we > w.wm_before
)
SELECT ws AS window_start, we AS window_end, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(val_c) / 100.0 AS total_value
FROM kept
WHERE we <= wm_final
GROUP BY ws, we, event_type
"""

register(
    "stream_watermark_late_drop",
    q_stream_watermark_late_drop,
    ORACLE_STREAM_WATERMARK_LATE_DROP,
)
