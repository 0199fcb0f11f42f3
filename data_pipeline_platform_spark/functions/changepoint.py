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
    # select the top-K paths with orderBy+limit (parallel
    # TakeOrderedAndProject); the rank column is then a row_number over
    # the bounded K-row frame, where it equals the global rank because
    # (n desc, path asc) is a total order and rank depends only on the
    # rows above — the path census never serializes through one task
    top = counted.orderBy(F.desc("n"), F.asc("path")).limit(TOP_PATHS)
    w_rank = Window.orderBy(F.desc("n"), F.asc("path"))
    return top.select(
        "path", "n", F.row_number().over(w_rank).cast("bigint").alias("rank")
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


_SEAS_FP = 100  # cents x 100 -> 1e-4-dollar fixed point


def q_seasonality_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of daily order revenue: centered 7-day
    moving-average trend, day-of-week seasonal component from the
    detrended series, residual — the demand-planning baseline view.

    Determinism: daily revenue is exact cents; the trend is the window
    SUM (exact BIGINT) divided once and rounded into 1e-4-dollar
    fixed point; detrended values are then exact BIGINTs, the seasonal
    means round the same way, and residuals are BIGINT subtractions —
    no double ever aggregates. Day-of-week comes from day arithmetic
    against a fixed Monday epoch (engine dayofweek() conventions
    differ; datediff % 7 does not).

    Scale: the fact-sized work is one date-keyed rollup; both windows
    run over the daily frame, which is CALENDAR-bounded (a decade is
    ~3.7k rows) — the vocab_growth constant-frame argument, not a
    data-sized global window."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("DAY", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev_c")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    dow = F.expr("pmod(datediff(CAST(day AS DATE), DATE'1970-01-05'), 7)")
    stepped = (
        daily.withColumn("win_sum", F.sum("rev_c").over(w7))
        .withColumn("win_n", F.count(F.lit(1)).over(w7))
        .withColumn("value_fp", F.col("rev_c") * _SEAS_FP)
        .withColumn(
            "trend_fp",
            F.expr(
                f"CAST(round(CAST(win_sum AS DOUBLE) / win_n * {_SEAS_FP}) AS BIGINT)"
            ),
        )
        .withColumn("detr_fp", F.col("value_fp") - F.col("trend_fp"))
        .withColumn("dow", dow)
    )
    seasonal = stepped.groupBy("dow").agg(
        F.expr("CAST(round(CAST(SUM(detr_fp) AS DOUBLE) / COUNT(*)) AS BIGINT)").alias(
            "seasonal_fp"
        )
    )
    denom = float(_SEAS_FP * 100)
    return (
        stepped.join(F.broadcast(seasonal), "dow")
        .select(
            "day",
            F.expr(f"CAST(value_fp AS DOUBLE) / {denom}").alias("revenue"),
            F.expr(f"CAST(trend_fp AS DOUBLE) / {denom}").alias("trend"),
            F.expr(f"CAST(seasonal_fp AS DOUBLE) / {denom}").alias("seasonal"),
            F.expr(
                f"CAST(value_fp - trend_fp - seasonal_fp AS DOUBLE) / {denom}"
            ).alias("residual"),
        )
    )


ORACLE_SEASONALITY_DECOMPOSE = f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), stepped AS (
  SELECT day, rev_c,
         rev_c * {_SEAS_FP} AS value_fp,
         CAST(round(CAST(SUM(rev_c) OVER w AS DOUBLE)
                    / COUNT(*) OVER w * {_SEAS_FP}) AS BIGINT) AS trend_fp,
         CAST((CAST(day AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), detr AS (
  SELECT *, value_fp - trend_fp AS detr_fp FROM stepped
), seasonal AS (
  SELECT dow,
         CAST(round(CAST(SUM(detr_fp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS seasonal_fp
  FROM detr GROUP BY 1
)
SELECT d.day,
       CAST(d.value_fp AS DOUBLE) / {float(_SEAS_FP * 100)} AS revenue,
       CAST(d.trend_fp AS DOUBLE) / {float(_SEAS_FP * 100)} AS trend,
       CAST(s.seasonal_fp AS DOUBLE) / {float(_SEAS_FP * 100)} AS seasonal,
       CAST(d.value_fp - d.trend_fp - s.seasonal_fp AS DOUBLE)
         / {float(_SEAS_FP * 100)} AS residual
FROM detr d JOIN seasonal s USING (dow)
"""

register("seasonality_decompose", q_seasonality_decompose, ORACLE_SEASONALITY_DECOMPOSE)


FORECAST_H = 7


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of daily order revenue, 7 days out —
    the demand-planning companion to `seasonality_decompose`.

    Determinism: alpha = beta = 1/2 (the events_ewma posture — both
    engines execute the IDENTICAL sequential recursion over the same
    day order, so the doubles agree bitwise; the halving constants also
    keep early terms exponent-exact). Inits: level = first day's
    revenue, trend = 0.

    Scale: the fold runs over the collected daily series — CALENDAR-
    bounded (a decade is ~3.7k points), the same constant-frame
    argument as seasonality_decompose; the fact-sized work is the one
    date-keyed rollup. Forecast output is FORECAST_H rows."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("DAY", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev_c"))
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "rev_c"))).alias("arr")
    )
    lvl = (
        "aggregate(slice(arr, 2, size(arr) - 1), "
        "named_struct('l', CAST(arr[0].rev_c AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), "
        "(acc, x) -> named_struct("
        "'l', 0.5 * CAST(x.rev_c AS DOUBLE) + 0.5 * (acc.l + acc.b), "
        "'b', 0.5 * ((0.5 * CAST(x.rev_c AS DOUBLE) + 0.5 * (acc.l + acc.b)) - acc.l)"
        " + 0.5 * acc.b))"
    )
    return (
        series.withColumn("st", F.expr(lvl))
        .select(
            F.explode(F.expr(f"sequence(1, {FORECAST_H})")).alias("horizon"),
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
        )
        .select(
            F.col("horizon").cast("bigint").alias("horizon"),
            F.expr("round((l + horizon * b) / 100, 6)").alias("forecast"),
        )
    )


ORACLE_HOLT_FORECAST = f"""
WITH RECURSIVE daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), idx AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY day) AS i, rev_c FROM daily
), hw AS (
  SELECT 1 AS i, CAST(rev_c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM idx WHERE i = 1
  UNION ALL
  SELECT d.i,
         0.5 * CAST(d.rev_c AS DOUBLE) + 0.5 * (h.l + h.b),
         0.5 * ((0.5 * CAST(d.rev_c AS DOUBLE) + 0.5 * (h.l + h.b)) - h.l)
           + 0.5 * h.b
  FROM hw h JOIN idx d ON d.i = h.i + 1
), fin AS (
  SELECT l, b FROM hw ORDER BY i DESC LIMIT 1
)
SELECT CAST(h AS BIGINT) AS horizon, round((l + h * b) / 100, 6) AS forecast
FROM fin, range(1, {FORECAST_H + 1}) r(h)
"""

register("holt_forecast", q_holt_forecast, ORACLE_HOLT_FORECAST)


_WINS_LO, _WINS_HI = 0.01, 0.99


def q_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust value capping: clip event values to the exact [p1, p99]
    percentile band and audit what was clipped — the standard
    outlier-taming pass before value-weighted aggregation.

    The rfm_segments posture: percentile BOUNDARIES are two scalars
    from one map-side-combinable aggregate over fixed-point values
    (exact integers, so interpolation is the same correctly-rounded
    double in both engines), broadcast back; capping is a row-local
    comparison chain. No ordered window anywhere."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("v_fp"),
    )
    bounds = ev.agg(
        F.expr(f"percentile(v_fp, {_WINS_LO})").alias("lo"),
        F.expr(f"percentile(v_fp, {_WINS_HI})").alias("hi"),
    )
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "value",
        F.expr(
            "round(CASE WHEN v_fp < lo THEN lo WHEN v_fp > hi THEN hi "
            "ELSE CAST(v_fp AS DOUBLE) END / 1000000, 6)"
        ).alias("winsorized"),
        (F.col("v_fp") < F.col("lo")).alias("clipped_low"),
        (F.col("v_fp") > F.col("hi")).alias("clipped_high"),
    )


ORACLE_WINSORIZE_EVENTS = f"""
WITH ev AS (
  SELECT event_id, value,
         CAST(round(value * 1000000) AS BIGINT) AS v_fp
  FROM events
), bounds AS (
  SELECT quantile_cont(v_fp, {_WINS_LO}) AS lo,
         quantile_cont(v_fp, {_WINS_HI}) AS hi
  FROM ev
)
SELECT event_id, value,
       round(CASE WHEN v_fp < lo THEN lo WHEN v_fp > hi THEN hi
             ELSE CAST(v_fp AS DOUBLE) END / 1000000, 6) AS winsorized,
       v_fp < lo AS clipped_low,
       v_fp > hi AS clipped_high
FROM ev, bounds
"""

register("winsorize_events", q_winsorize_events, ORACLE_WINSORIZE_EVENTS)


AB_GROUP_A, AB_GROUP_B = "purchase", "view"
_AB_SCALE = 1_000_000


def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test on event values between two event
    types (the A/B-readout shape: does `purchase` carry a different
    mean value than `view`?). Emits the exact moment inputs plus the
    t statistic and Welch–Satterthwaite degrees of freedom; the p-value
    lookup belongs to the caller's stats library (a t CDF is not
    bitwise-portable, the statistic is).

    Moments are exact fixed-point integers (the events_anomaly
    posture, DECIMAL(38,0) for the squares); the t/df doubles compute
    in ONE fixed expression shape per engine and round to 6dp. One
    map-side-combinable aggregation; the 2-row moments frame pivots
    row-locally."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(AB_GROUP_A, AB_GROUP_B)
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"CAST(round(value * {_AB_SCALE}) AS BIGINT)")).alias("s"),
        F.sum(
            F.expr(
                f"CAST(CAST(round(value * {_AB_SCALE}) AS BIGINT) AS DECIMAL(38,0)) "
                f"* CAST(round(value * {_AB_SCALE}) AS BIGINT)"
            )
        ).alias("s2"),
    )
    a = m.filter(F.col("event_type") == AB_GROUP_A).select(
        F.col("n").alias("na"), F.col("s").alias("sa"), F.col("s2").alias("s2a")
    )
    b = m.filter(F.col("event_type") == AB_GROUP_B).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"), F.col("s2").alias("s2b")
    )
    sc = float(_AB_SCALE)
    # sample variance / n, in doubles with one fixed association order
    va = f"((CAST(s2a AS DOUBLE) / {sc} / {sc} - CAST(sa AS DOUBLE) / {sc} * (CAST(sa AS DOUBLE) / {sc}) / na) / (na - 1)) / na"
    vb = f"((CAST(s2b AS DOUBLE) / {sc} / {sc} - CAST(sb AS DOUBLE) / {sc} * (CAST(sb AS DOUBLE) / {sc}) / nb) / (nb - 1)) / nb"
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            F.lit(AB_GROUP_A).alias("group_a"),
            F.lit(AB_GROUP_B).alias("group_b"),
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.expr(f"round(CAST(sa AS DOUBLE) / {sc} / na, 6)").alias("mean_a"),
            F.expr(f"round(CAST(sb AS DOUBLE) / {sc} / nb, 6)").alias("mean_b"),
            F.expr(
                f"round((CAST(sa AS DOUBLE) / {sc} / na - CAST(sb AS DOUBLE) / {sc} / nb) "
                f"/ sqrt({va} + {vb}), 6)"
            ).alias("t_stat"),
            F.expr(
                f"round(({va} + {vb}) * ({va} + {vb}) "
                f"/ ({va} * ({va}) / (na - 1) + {vb} * ({vb}) / (nb - 1)), 6)"
            ).alias("welch_df"),
        )
    )


ORACLE_AB_TTEST = f"""
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(round(value * {_AB_SCALE}) AS BIGINT)) AS s,
         SUM(CAST(CAST(round(value * {_AB_SCALE}) AS BIGINT) AS HUGEINT)
             * CAST(round(value * {_AB_SCALE}) AS BIGINT)) AS s2
  FROM events WHERE event_type IN ('{AB_GROUP_A}', '{AB_GROUP_B}')
  GROUP BY 1
), a AS (SELECT n AS na, s AS sa, s2 AS s2a FROM m WHERE event_type = '{AB_GROUP_A}'),
b AS (SELECT n AS nb, s AS sb, s2 AS s2b FROM m WHERE event_type = '{AB_GROUP_B}')
SELECT '{AB_GROUP_A}' AS group_a, '{AB_GROUP_B}' AS group_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(CAST(sa AS DOUBLE) / {float(_AB_SCALE)} / na, 6) AS mean_a,
       round(CAST(sb AS DOUBLE) / {float(_AB_SCALE)} / nb, 6) AS mean_b,
       round((CAST(sa AS DOUBLE) / {float(_AB_SCALE)} / na - CAST(sb AS DOUBLE) / {float(_AB_SCALE)} / nb)
             / sqrt({{va}} + {{vb}}), 6) AS t_stat,
       round(({{va}} + {{vb}}) * ({{va}} + {{vb}})
             / ({{va}} * ({{va}}) / (na - 1) + {{vb}} * ({{vb}}) / (nb - 1)), 6) AS welch_df
FROM a, b
""".replace(
    "{va}",
    f"((CAST(s2a AS DOUBLE) / {float(_AB_SCALE)} / {float(_AB_SCALE)} - CAST(sa AS DOUBLE) / {float(_AB_SCALE)} * (CAST(sa AS DOUBLE) / {float(_AB_SCALE)}) / na) / (na - 1)) / na",
).replace(
    "{vb}",
    f"((CAST(s2b AS DOUBLE) / {float(_AB_SCALE)} / {float(_AB_SCALE)} - CAST(sb AS DOUBLE) / {float(_AB_SCALE)} * (CAST(sb AS DOUBLE) / {float(_AB_SCALE)}) / nb) / (nb - 1)) / nb",
)

register("ab_ttest", q_ab_ttest, ORACLE_AB_TTEST)


BOOT_B = 100  # resamples
# Poisson(1) inverse-CDF thresholds on a u16 uniform, precomputed in
# Python (cum pmf * 65536, k = 0..7) — embedded identically in both
# engines so every resample weight is content-addressed
_POIS_CUM = (24109, 48219, 60273, 64292, 65296, 65497, 65531)
# CI order-statistic ranks: ceil(0.025 B) and ceil(0.975 B)
BOOT_LO_RK, BOOT_HI_RK = 3, 98


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CUM)
    )
    return f"CASE {branches} ELSE 7 END"


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    the POISSON bootstrap (Chamandy et al., Google 2012) — the
    bootstrap that distributes: instead of drawing n rows with
    replacement (impossible without a global index), every row draws
    its own Poisson(1) multiplicity per resample, independent across
    rows, giving each resample the right marginal distribution.

    Determinism: the Poisson draw is content-addressed — u16 from
    md5(orderkey : b) through a precomputed inverse-CDF CASE — so both
    engines materialize the IDENTICAL B resamples; per-resample sums
    are exact cents x weights; the CI bounds are order statistics of
    the B means (ranks ceil(0.025 B) and ceil(0.975 B), ties by
    resample id). ONE pass over the fact table (the B-way expansion is
    row-local and collapses map-side to B rows)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    u = (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':', "
        "CAST(b AS STRING))), 1, 4), 16, 10) AS BIGINT)"
    )
    weighted = orders.select(
        "o_orderkey",
        "cents",
        F.explode(F.expr(f"sequence(1, {BOOT_B})")).alias("b"),
    ).select("b", "cents", F.expr(_pois_case(u)).alias("w"))
    per_b = weighted.groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).alias("swc"),
        F.sum("w").alias("sw"),
    )
    ranked = per_b.select(
        "b", F.expr("CAST(swc AS DOUBLE) / sw / 100").alias("mean_b")
    ).withColumn(
        "rk",
        F.row_number().over(Window.orderBy("mean_b", "b")),
    )
    lo_rk, hi_rk = BOOT_LO_RK, BOOT_HI_RK
    point = orders.agg(
        F.expr("round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6)").alias(
            "mean_value"
        )
    )
    lo = ranked.filter(F.col("rk") == lo_rk).select(
        F.round("mean_b", 6).alias("ci_lo")
    )
    hi = ranked.filter(F.col("rk") == hi_rk).select(
        F.round("mean_b", 6).alias("ci_hi")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select("mean_value", "ci_lo", "ci_hi", F.lit(BOOT_B).cast("bigint").alias("n_resamples"))
    )


ORACLE_BOOTSTRAP_CI = f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), weighted AS (
  SELECT b, cents,
         {_pois_case("(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 4))::BIGINT)")} AS w
  FROM o, range(1, {BOOT_B + 1}) r(b)
), per_b AS (
  SELECT b, SUM(w * cents) AS swc, SUM(w) AS sw FROM weighted GROUP BY b
), ranked AS (
  SELECT b, CAST(swc AS DOUBLE) / sw / 100 AS mean_b,
         row_number() OVER (ORDER BY CAST(swc AS DOUBLE) / sw / 100, b) AS rk
  FROM per_b
), point AS (
  SELECT round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6) AS mean_value
  FROM o
)
SELECT p.mean_value,
       (SELECT round(mean_b, 6) FROM ranked WHERE rk = {BOOT_LO_RK}) AS ci_lo,
       (SELECT round(mean_b, 6) FROM ranked WHERE rk = {BOOT_HI_RK}) AS ci_hi,
       CAST({BOOT_B} AS BIGINT) AS n_resamples
FROM point p
"""

register("bootstrap_ci", q_bootstrap_ci, ORACLE_BOOTSTRAP_CI)


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user engagement lifetimes (hours
    between a user's first and last event; right-CENSORED when the
    user was still active in the final 24h of the window — their true
    lifetime is only known to exceed the observation).

    The estimator's sequential product S(t) = prod(1 - d_i/n_i)
    becomes a cumulative SUM of fixed-point ln terms (ln of exact
    integer ratios, the unigram_logprob posture), emitted as
    log_survival — exp() is not bitwise-portable, and downstream
    consumers exponentiate at display time.

    Scale: per-user lifetimes are one user-keyed agg; everything after
    groups by lifetime-in-hours — a CALENDAR-bounded frame (a 30-day
    window has <= 720 rows), so the at-risk reverse cumsum and the KM
    cumsum are constant-size ordered windows."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    glob = ev.agg(F.max("ts").alias("t_end"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(glob))
        .select(
            F.expr(
                "CAST((unix_timestamp(t1) - unix_timestamp(t0)) div 3600 AS BIGINT)"
            ).alias("life_h"),
            (
                F.expr("unix_timestamp(t_end) - unix_timestamp(t1)") < 86400
            ).alias("censored"),
        )
    )
    per_h = users.groupBy("life_h").agg(
        F.sum(F.expr("CAST(NOT censored AS INT)")).alias("deaths"),
        F.sum(F.expr("CAST(censored AS INT)")).alias("censored_n"),
    )
    w_desc = Window.orderBy(F.desc("life_h")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("life_h")
    return (
        per_h.withColumn(
            "at_risk", F.sum(F.col("deaths") + F.col("censored_n")).over(w_desc)
        )
        .withColumn(
            "lnterm_fp",
            F.expr(
                "CASE WHEN deaths = 0 THEN CAST(0 AS BIGINT) ELSE "
                "CAST(round(ln(CAST(at_risk - deaths AS DOUBLE) / at_risk) "
                "* 1000000) AS BIGINT) END"
            ),
        )
        .withColumn(
            "log_survival",
            F.expr(
                "round(CAST(SUM(lnterm_fp) OVER "
                "(ORDER BY life_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "AS DOUBLE) / 1000000, 6)"
            ),
        )
        .select(
            "life_h",
            F.col("at_risk").cast("bigint").alias("at_risk"),
            F.col("deaths").cast("bigint").alias("deaths"),
            F.col("censored_n").cast("bigint").alias("censored_n"),
            "log_survival",
        )
    )


ORACLE_KM_SURVIVAL = """
WITH gend AS (SELECT MAX(ts) AS t_end FROM events),
users AS (
  SELECT CAST((CAST(floor(epoch(MAX(e.ts))) AS BIGINT) - CAST(floor(epoch(MIN(e.ts))) AS BIGINT)) // 3600 AS BIGINT) AS life_h,
         (CAST(floor(epoch((SELECT t_end FROM gend))) AS BIGINT) - CAST(floor(epoch(MAX(e.ts))) AS BIGINT)) < 86400 AS censored
  FROM events e GROUP BY e.user_id
), per_h AS (
  SELECT life_h,
         SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS deaths,
         SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS censored_n
  FROM users GROUP BY 1
), risk AS (
  SELECT *,
         SUM(deaths + censored_n) OVER
           (ORDER BY life_h DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS at_risk
  FROM per_h
), terms AS (
  SELECT *,
         CASE WHEN deaths = 0 THEN CAST(0 AS BIGINT) ELSE
           CAST(round(ln(CAST(at_risk - deaths AS DOUBLE) / at_risk)
                * 1000000) AS BIGINT) END AS lnterm_fp
  FROM risk
)
SELECT life_h, CAST(at_risk AS BIGINT) AS at_risk,
       CAST(deaths AS BIGINT) AS deaths,
       CAST(censored_n AS BIGINT) AS censored_n,
       round(CAST(SUM(lnterm_fp) OVER
         (ORDER BY life_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) / 1000000, 6) AS log_survival
FROM terms
"""

register("km_survival", q_km_survival, ORACLE_KM_SURVIVAL)


def q_seasonal_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift detection on the DESEASONALIZED revenue series — the
    composition that makes both parents honest: raw CUSUM fires on
    every weekend (the seasonal component IS a drift to it), so the
    production detector runs on seasonality_decompose's residual+trend
    deviation instead. Flags days whose cumulative deseasonalized
    deviation exceeds two mean-days of revenue.

    Shape: the decompose pipeline (one date-keyed rollup, calendar-
    bounded windows) plus the same prefix-minus-running-min algebra as
    `cusum_changepoints`, in the decompose's exact 1e-4-dollar fixed
    point. Oracle nests the decompose SQL verbatim."""
    dec = q_seasonality_decompose(spark, sf_dir)
    # back to fixed point: the decompose emitted /10000-scaled doubles
    # that are exact multiples of 1e-4, so the round-trip is lossless
    base = dec.select(
        "day",
        F.expr("CAST(round(revenue * 10000) AS BIGINT)").alias("v_fp"),
        F.expr(
            "CAST(round(revenue * 10000) AS BIGINT) "
            "- CAST(round(seasonal * 10000) AS BIGINT)"
        ).alias("deseason_fp"),
    )
    tot = base.agg(
        F.sum("deseason_fp").alias("t"), F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    return (
        base.crossJoin(F.broadcast(tot))
        .withColumn("d", F.col("n") * F.col("deseason_fp") - F.col("t"))
        .withColumn("p", F.sum("d").over(w))
        .withColumn("m", F.least(F.min("p").over(w), F.lit(0)))
        .select(
            "day",
            F.expr("round(CAST(deseason_fp AS DOUBLE) / 10000, 6)").alias(
                "deseasonalized"
            ),
            (F.col("p") - F.col("m")).cast("bigint").alias("cusum_scaled"),
            ((F.col("p") - F.col("m")) > 2 * F.col("t")).alias("drifting"),
        )
    )


ORACLE_SEASONAL_CUSUM = f"""
WITH dec AS MATERIALIZED ({ORACLE_SEASONALITY_DECOMPOSE}),
base AS (
  SELECT day,
         CAST(round(revenue * 10000) AS BIGINT)
           - CAST(round(seasonal * 10000) AS BIGINT) AS deseason_fp
  FROM dec
), tot AS (
  SELECT SUM(deseason_fp) AS t, COUNT(*) AS n FROM base
), pre AS (
  SELECT day, deseason_fp,
         SUM(n * deseason_fp - t) OVER (ORDER BY day) AS p, t
  FROM base, tot
), cs AS (
  SELECT day, deseason_fp, p - least(MIN(p) OVER (ORDER BY day), 0) AS s, t
  FROM pre
)
SELECT day,
       round(CAST(deseason_fp AS DOUBLE) / 10000, 6) AS deseasonalized,
       CAST(s AS BIGINT) AS cusum_scaled,
       s > 2 * t AS drifting
FROM cs
"""

register("seasonal_cusum", q_seasonal_cusum, ORACLE_SEASONAL_CUSUM)


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily order revenue: the MEDIAN of all
    pairwise day-to-day slopes (and the median intercept at that
    slope) — the estimator that shrugs off the outlier days that drag
    an OLS fit (`feature_correlations` is the OLS counterpart).

    Scale shape: the fact table reduces ONCE to the daily revenue
    census (calendar-bounded: ~2.4k rows for the 7-year span,
    independent of row count), the O(days^2) pair frame (~3M) builds
    from the census self-join, and both medians use the winsorize
    posture — exact `percentile` over fixed-point BIGINT slopes, no
    ordered window. Grows with calendar span squared, never with SF.

    Exactness: slopes are rounded onto a 1e-6 cents/day grid before the
    median (the fixed-point trick that absorbs division ulps);
    intercept residuals are exact BIGINTs in the same scaled domain."""
    from data_pipeline_platform_spark.sources.readers import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev"))
        .select(F.datediff("day", F.lit("1970-01-01").cast("date")).alias("d"), "rev")
    )
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("da") < F.col("db"))
    slope_med = pairs.select(
        F.expr(
            "CAST(round(CAST(rb - ra AS DOUBLE) / (db - da) * 1000000) AS BIGINT)"
        ).alias("s_fp")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(s_fp, 0.5)").alias("slope_fp"),
    )
    resid = daily.crossJoin(F.broadcast(slope_med)).select(
        "n_pairs",
        "slope_fp",
        # residual on the same 1e-6-cents grid; slope_fp is the
        # percentile's double — re-grid it so the product is exact
        F.expr(
            "rev * 1000000 - CAST(round(slope_fp) AS BIGINT) * d"
        ).alias("ic_fp"),
    )
    return resid.groupBy("n_pairs", "slope_fp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("percentile(ic_fp, 0.5)").alias("ic_med_fp"),
    ).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        (F.col("slope_fp") / 1000000.0 / 100.0).alias("slope_dollars_per_day"),
        (F.col("ic_med_fp") / 1000000.0 / 100.0).alias("intercept_dollars"),
    )


ORACLE_THEIL_SEN_TREND = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), pairs AS (
  SELECT CAST(round(CAST(b.rev - a.rev AS DOUBLE) / (b.d - a.d) * 1000000)
              AS BIGINT) AS s_fp
  FROM daily a JOIN daily b ON a.d < b.d
), sm AS (
  SELECT COUNT(*) AS n_pairs, quantile_cont(s_fp, 0.5) AS slope_fp FROM pairs
), resid AS (
  SELECT sm.n_pairs, sm.slope_fp,
         rev * 1000000 - CAST(round(sm.slope_fp) AS BIGINT) * d AS ic_fp
  FROM daily, sm
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       slope_fp / 1000000.0 / 100.0 AS slope_dollars_per_day,
       quantile_cont(ic_fp, 0.5) / 1000000.0 / 100.0 AS intercept_dollars
FROM resid GROUP BY n_pairs, slope_fp
"""

register("theil_sen_trend", q_theil_sen_trend, ORACLE_THEIL_SEN_TREND)


ACF_MAX_LAG = 7


def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily-revenue series at lags
    1..ACF_MAX_LAG — the standard seasonality/forecastability probe
    (a weekly cycle shows up as a spike at lag 7) that sits upstream
    of seasonality_decompose's model choice.

    Determinism: the classic estimator r_k = sum_t((x_t-mu)(x_{t+k}-mu))
    / sum_t((x_t-mu)^2) is computed with the mean CLEARED OF DIVISION —
    multiply through by n^2 so every centered term is the exact integer
    n*x_t - S (cents). The cross-products live in DECIMAL(38,0) on
    Spark / HUGEINT in DuckDB (~1e24 per term, past BIGINT), both
    order-free exact sums; the single final num/den division happens in
    doubles converted from exact integers, rounded to 6 dp (the one
    deterministic-division rule).

    Scale: one fact-sized date rollup; everything after runs on the
    CALENDAR-BOUNDED daily frame (~3.7k rows/decade — the
    seasonality_decompose constant-frame argument). The lag pairing is
    an idx equi-join of that small frame against itself, never a
    window over fact data."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("DAY", "o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("x")
    )
    idx = daily.withColumn(
        "idx", F.row_number().over(Window.orderBy("day"))
    ).select("idx", "x")
    tot = idx.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    # centered term scaled by n: c_t = n*x_t - S, exact BIGINT
    cent = idx.crossJoin(F.broadcast(tot)).select(
        "idx", (F.col("n") * F.col("x") - F.col("s")).alias("c")
    )
    den = cent.agg(
        F.sum(F.expr("CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))")).alias(
            "den"
        )
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = cent.select(F.col("idx").alias("ia"), F.col("c").alias("ca"))
    b = cent.select(F.col("idx").alias("ib"), F.col("c").alias("cb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ib") == F.col("ia") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(
                F.expr("CAST(ca AS DECIMAL(19,0)) * CAST(cb AS DECIMAL(19,0))")
            ).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return pairs.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.expr("round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)").alias("acf"),
    )


ORACLE_ACF_DAILY_REVENUE = f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
), idx AS (
  SELECT row_number() OVER (ORDER BY day) AS idx, x FROM daily
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s FROM idx
), cent AS (
  SELECT idx, tot.n * x - tot.s AS c FROM idx, tot
), den AS (
  SELECT SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS den FROM cent
), lags AS (
  SELECT CAST(range AS INT) AS lag FROM range(1, {ACF_MAX_LAG + 1})
), pairs AS (
  SELECT l.lag,
         SUM(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS num,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM cent a CROSS JOIN lags l
  JOIN cent b ON b.idx = a.idx + l.lag
  GROUP BY 1
)
SELECT p.lag, p.n_pairs,
       round(CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS acf
FROM pairs p, den d
"""


register("acf_daily_revenue", q_acf_daily_revenue, ORACLE_ACF_DAILY_REVENUE)
