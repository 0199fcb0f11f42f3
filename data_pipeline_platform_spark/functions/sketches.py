"""Sketch operators (M8 extension): approximate distinct counting with
a bitwise-replayable HyperLogLog (Flajolet et al. 2007).

Why it matters at 100 TB: COUNT(DISTINCT key) shuffles every distinct
key; an HLL register set is ``m`` small integers that merge with MAX —
the aggregation is map-side combinable and the shuffle payload is the
register array, not the key space. This module grades the full
estimator pipeline (bucketing, rho, harmonic mean, small-range
correction) bitwise against DuckDB.

Determinism across engines:
- the hash is md5 hex (identical text both sides); bucket and rho are
  derived by STRING operations (hex prefix -> integer via a char fold;
  leading-zero count via ltrim) — no engine-specific bit intrinsics;
- the harmonic-mean sum folds exact powers of two as BIGINTs
  (2^(SHIFT - rho) is an exact integer; integer sums are order-free,
  where a double sum of 2^-rho terms would round order-dependently);
- the only transcendental (ln in the small-range correction) lands in
  a 6dp round, which absorbs cross-engine ulps.

Estimates are graded per event_type next to the exact distinct count,
so the output carries its own error audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

HLL_B = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_B
# alpha_64 per the HLL paper (m >= 64 branch)
HLL_ALPHA = 0.709
_SHIFT = 50  # fixed-point exponent for the harmonic-mean fold
# hex chars after the bucket prefix used for rho (48 bits is plenty:
# P(rho > 49) ~ 2^-49)
_RHO_HEX = 12

# hex prefix length that covers HLL_B bits (6 bits -> 2 hex chars = 8
# bits; the bucket is the value modulo m, identical both engines)
_BUCKET_HEX = 2

# native hex decode of the bucket prefix: conv() is exact far beyond 2
# hex digits, and the value equals the char fold the DuckDB oracle
# keeps (both are the integer value of the same hex prefix) — the
# former regex-split + aggregate() lambda fold computed it interpreted,
# per hashed row (guide §4)
_HEX_FOLD = "CAST(conv(substring({h}, 1, %d), 16, 10) AS BIGINT)" % _BUCKET_HEX

# extra leading zero bits contributed by the first non-zero hex digit
_DIGIT_ZEROS = (
    "CASE WHEN {d} = '1' THEN 3 "
    "WHEN {d} IN ('2', '3') THEN 2 "
    "WHEN {d} IN ('4', '5', '6', '7') THEN 1 "
    "ELSE 0 END"
)


def hll_registers(ev: DataFrame) -> DataFrame:
    """Derive HLL registers (event_type, bucket, r) from an events
    frame with (event_type, user_id). Works on batch AND streaming
    frames up to the final MAX aggregation; registers from disjoint
    slices merge with MAX — the property the streaming twin
    (streaming/sketches.py) builds on."""
    hashed = (
        ev.select(
            "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
        )
        .select(
            "event_type",
            "h",
            (F.expr(_HEX_FOLD.format(h="h")) % HLL_M).alias("bucket"),
            F.expr(f"substring(h, {_BUCKET_HEX + 1}, {_RHO_HEX})").alias("tail"),
        )
        .withColumn("stripped", F.expr("regexp_replace(tail, '^0+', '')"))
        .withColumn(
            "rho",
            F.expr(f"CAST(({_RHO_HEX} - length(stripped)) * 4 AS INT)")
            + F.expr(_DIGIT_ZEROS.format(d="substring(stripped, 1, 1)"))
            + F.lit(1),
        )
    )
    return hashed.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Fold registers into the per-group HLL estimate (harmonic mean of
    exact power-of-two BIGINTs + small-range linear counting)."""
    return (
        regs.groupBy("event_type")
        .agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SHIFT} - r)")
            ).alias("z_fp"),
            F.count(F.lit(1)).alias("nonzero"),
        )
        .select(
            "event_type",
            "nonzero",
            F.expr(
                f"CAST(z_fp AS DOUBLE) / {float(1 << _SHIFT)} + ({HLL_M} - nonzero)"
            ).alias("z"),
        )
        .select(
            "event_type",
            "nonzero",
            F.expr(f"{HLL_ALPHA} * {HLL_M} * {HLL_M} / z").alias("e_raw"),
        )
        .select(
            "event_type",
            F.expr(
                f"round(CASE WHEN e_raw <= 2.5 * {HLL_M} AND nonzero < {HLL_M} "
                f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - nonzero)) "
                "ELSE e_raw END, 6)"
            ).alias("hll_estimate"),
        )
    )


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user estimate per event_type, next to the exact
    count and the relative error. One scan; the register build is a
    (event_type, bucket) MAX aggregation — map-side combinable, shuffle
    payload = m registers per group, independent of user cardinality."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(hll_registers(ev))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "hll_estimate",
        "exact_distinct",
        F.expr(
            "round(abs(hll_estimate - exact_distinct) / exact_distinct, 6)"
        ).alias("rel_error"),
    )


ORACLE_HLL_DISTINCT_USERS = f"""
WITH ev AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
), hashed AS (
  SELECT event_type, h,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(
             generate_series(1, {_BUCKET_HEX}),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT))),
           (acc, c) -> acc * 16 + c) % {HLL_M} AS bucket,
         h[{_BUCKET_HEX + 1}:{_BUCKET_HEX + _RHO_HEX}] AS tail
  FROM ev
), rho AS (
  SELECT event_type, bucket,
         CAST(({_RHO_HEX} - length(ltrim(tail, '0'))) * 4 AS INT)
         + ({_DIGIT_ZEROS.format(d="ltrim(tail, '0')[1:1]")})
         + 1 AS rho
  FROM hashed
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << ({_SHIFT} - r)) AS z_fp,
         COUNT(*) AS nonzero
  FROM regs GROUP BY 1
), est AS (
  SELECT event_type, nonzero,
         {HLL_ALPHA} * {HLL_M} * {HLL_M}
           / (CAST(z_fp AS DOUBLE) / {float(1 << _SHIFT)} + ({HLL_M} - nonzero))
           AS e_raw
  FROM agg
), corrected AS (
  SELECT event_type,
         round(CASE WHEN e_raw <= 2.5 * {HLL_M} AND nonzero < {HLL_M}
               THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - nonzero))
               ELSE e_raw END, 6) AS hll_estimate
  FROM est
), exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT c.event_type, c.hll_estimate, x.exact_distinct,
       round(abs(c.hll_estimate - x.exact_distinct) / x.exact_distinct, 6)
         AS rel_error
FROM corrected c JOIN exact x USING (event_type)
"""


register("hll_distinct_users", q_hll_distinct_users, ORACLE_HLL_DISTINCT_USERS)


# fixed-grid histogram quantiles: bucket width in value units. Exact
# quantiles need a full sort (or exact percentile agg) — at 100 TB
# that's the expensive path. A fixed-resolution histogram is ONE
# map-side-combinable count pass whose shuffle payload is the bucket
# census, and the quantile interpolates deterministically inside the
# bucket — integer counts + one exact division, bitwise-replayable
# (the t-digest alternative trades determinism for adaptivity).
HQ_BUCKET = 0.25
HQ_PROBS = (0.5, 0.9, 0.99)


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate quantiles from a fixed-grid
    histogram, graded next to the exact percentile with the relative
    error — the sketch-with-audit pattern (see hll_distinct_users).

    Estimator: bucket = floor(value / w); the q-quantile lands in the
    first bucket whose cumulative count reaches ceil(q * n), and the
    estimate interpolates linearly inside that bucket by the exact
    integer position — every input to the final double expression is an
    exact BIGINT, so both engines produce the identical double."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.expr(f"CAST(floor(value / {HQ_BUCKET}) AS BIGINT)").alias("b")
    )
    hist = ev.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("b")
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("event_type"))
    )
    outs = []
    for q in HQ_PROBS:
        qname = f"p{int(q * 100)}"
        # target rank (1-based): ceil(q * n) as exact integer arithmetic
        picked = (
            cum.withColumn("rank_target", F.expr(f"CAST(ceil({q} * n) AS BIGINT)"))
            .filter(F.col("cum") >= F.col("rank_target"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("event_type").orderBy("b")
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "event_type",
                F.lit(qname).alias("quantile"),
                # position inside the bucket: (target - (cum - c)) / c
                (
                    F.col("b").cast("double") * HQ_BUCKET
                    + (
                        (F.col("rank_target") - (F.col("cum") - F.col("c")))
                        .cast("double")
                        / F.col("c")
                    )
                    * HQ_BUCKET
                ).alias("estimate"),
            )
        )
        outs.append(picked)
    est = outs[0]
    for o in outs[1:]:
        est = est.unionByName(o)
    exacts = []
    for q in HQ_PROBS:
        exacts.append(
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.expr(f"percentile(value, {q})").alias("exact"))
            .select("event_type", F.lit(f"p{int(q * 100)}").alias("quantile"), "exact")
        )
    ex = exacts[0]
    for o in exacts[1:]:
        ex = ex.unionByName(o)
    return est.join(ex, ["event_type", "quantile"]).select(
        "event_type",
        "quantile",
        F.round("estimate", 6).alias("estimate"),
        F.round("exact", 6).alias("exact"),
        # round BEFORE differencing, mirroring the oracle exactly — the
        # unrounded forms agree anyway, but the expressions must match
        F.expr(
            "round(abs(round(estimate, 6) - round(exact, 6)) "
            "/ greatest(abs(round(exact, 6)), 1e-12), 6)"
        ).alias("rel_error"),
    )


def _oracle_hq() -> str:
    est_blocks = []
    for q in HQ_PROBS:
        qname = f"p{int(q * 100)}"
        est_blocks.append(
            f"""
  SELECT event_type, '{qname}' AS quantile,
         CAST(b AS DOUBLE) * {HQ_BUCKET}
           + (CAST(rank_target - (cum - c) AS DOUBLE) / c) * {HQ_BUCKET}
           AS estimate
  FROM (
    SELECT event_type, b, c, cum,
           CAST(ceil({q} * n) AS BIGINT) AS rank_target,
           row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn_pick
    FROM (
      SELECT event_type, b, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    )
    WHERE cum >= CAST(ceil({q} * n) AS BIGINT)
  ) WHERE rn_pick = 1"""
        )
    exact_blocks = []
    for q in HQ_PROBS:
        exact_blocks.append(
            f"""
  SELECT event_type, 'p{int(q * 100)}' AS quantile,
         quantile_cont(value, {q}) AS exact
  FROM events GROUP BY event_type"""
        )
    return f"""
WITH hist AS MATERIALIZED (
  SELECT event_type, CAST(floor(value / {HQ_BUCKET}) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
), est AS ({' UNION ALL '.join(est_blocks)}
), ex AS ({' UNION ALL '.join(exact_blocks)}
)
SELECT e.event_type, e.quantile,
       round(e.estimate, 6) AS estimate,
       round(x.exact, 6) AS exact,
       round(abs(round(e.estimate, 6) - round(x.exact, 6))
             / greatest(abs(round(x.exact, 6)), 1e-12), 6) AS rel_error
FROM est e JOIN ex x USING (event_type, quantile)
"""


ORACLE_HISTOGRAM_QUANTILES = _oracle_hq()

register("histogram_quantiles", q_histogram_quantiles, ORACLE_HISTOGRAM_QUANTILES)


# Count-Min Sketch (Cormode & Muthukrishnan 2005): frequency estimation
# whose state is a d x w integer grid, NOT the key space. At 100 TB the
# exact token census shuffles every distinct token; the CMS shuffle
# payload is <= d*w counters (here 4x16 = 64 cells) regardless of
# vocabulary size, cells merge by plain +, and the estimate for any key
# is MIN over its d row counters — never an undercount. The test-data
# vocabulary is small, so w=16 is chosen to FORCE collisions: the
# overcount audit column is exercised for real, and the min-over-rows
# selection does actual work.
CMS_D = 4
CMS_W = 16  # one hex digit addresses the row exactly
CMS_TOP_K = 10

# first hex char of md5("<row>:<token>") -> 0..15; identical expression
# shape both engines (instr/strpos are both 1-based)
_CMS_BUCKET_SPARK = (
    "CAST(instr('0123456789abcdef', "
    "substring(md5(concat(CAST({r} AS STRING), ':', {t})), 1, 1)) - 1 AS BIGINT)"
)


def cms_cells(toks: DataFrame) -> DataFrame:
    """Build the d x w counter grid from a (token) frame. Cells merge by
    plain + — the property the mergeability test locks down."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("row_i")
    return (
        toks.select("token", rows)
        .select(
            "row_i",
            F.expr(_CMS_BUCKET_SPARK.format(r="row_i", t="token")).alias("bucket"),
        )
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate_for(cand: DataFrame, cells: DataFrame) -> DataFrame:
    """Probe the broadcast sketch for a candidate frame with a `token`
    column (other columns pass through); MIN over the d row counters."""
    passthrough = [c for c in cand.columns]
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("row_i")
    probed = cand.select(*passthrough, rows).select(
        *passthrough,
        "row_i",
        F.expr(_CMS_BUCKET_SPARK.format(r="row_i", t="token")).alias("bucket"),
    )
    return (
        probed.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy(*passthrough)
        .agg(F.min("c").alias("cms_estimate"))
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K token frequencies estimated from a Count-Min sketch, graded
    next to the exact counts with the overcount audit (estimate is
    provably >= exact; collisions only ever inflate).

    Shape: one corpus scan explodes tokens x d rows, the sketch build is
    a (row, bucket) count — map-side combinable, <= d*w result rows. The
    candidate set (exact top-K, vocab-sized frame) probes the broadcast
    sketch; MIN over the d row counters is the estimate."""
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))

    # candidate selection: (count desc, token asc) is a total order, so
    # orderBy+limit compiles to TakeOrderedAndProject — parallel
    # per-partition top-K over the vocab census, no global window task
    top = exact.orderBy(F.desc("exact_count"), F.asc("token")).limit(CMS_TOP_K)
    return cms_estimate_for(top, cms_cells(toks)).select(
        "token",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
    )


_CMS_BUCKET_DUCK = (
    "CAST(strpos('0123456789abcdef', "
    "md5(CAST({r} AS VARCHAR) || ':' || {t})[1:1]) - 1 AS BIGINT)"
)

ORACLE_CMS_HEAVY_HITTERS = f"""
WITH toks AS MATERIALIZED (
  SELECT token FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
  ) WHERE token != ''
), exact AS (
  SELECT token, COUNT(*) AS exact_count FROM toks GROUP BY 1
), cells AS (
  SELECT row_i,
         {_CMS_BUCKET_DUCK.format(r="row_i", t="token")} AS bucket,
         COUNT(*) AS c
  FROM toks, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS row_i)
  GROUP BY 1, 2
), top AS (
  SELECT token, exact_count FROM (
    SELECT token, exact_count,
           row_number() OVER (ORDER BY exact_count DESC, token ASC) AS rk
    FROM exact
  ) WHERE rk <= {CMS_TOP_K}
), cand AS (
  SELECT t.token, t.exact_count, g.row_i,
         {_CMS_BUCKET_DUCK.format(r="g.row_i", t="t.token")} AS bucket
  FROM top t, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS row_i) g
)
SELECT c.token, c.exact_count, MIN(l.c) AS cms_estimate,
       MIN(l.c) - c.exact_count AS overcount
FROM cand c JOIN cells l USING (row_i, bucket)
GROUP BY c.token, c.exact_count
"""

register("cms_heavy_hitters", q_cms_heavy_hitters, ORACLE_CMS_HEAVY_HITTERS)


def q_hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical HLL application: audience overlap between event
    types WITHOUT ever materializing user sets. Per type pair,
    estimate |A|, |B| from each type's registers, |A∪B| from the
    element-wise MAX of the two register arrays (the HLL union
    property), and |A∩B| by inclusion-exclusion (floored at 0 — the
    estimator can go slightly negative for near-disjoint sets).

    At 100 TB each audience is a 64-register sketch regardless of user
    cardinality; the pairwise work is |types|² x m registers. The whole
    estimator — registers, union MAX, harmonic folds — replays bitwise
    in the oracle, like the single-set op it extends."""
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    ev = load_table(spark, sf_dir, "events")
    regs = tracked_persist(hll_registers(ev))

    def est_for(frame, keys):
        return (
            frame.groupBy(*keys)
            .agg(
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SHIFT} - r)")).alias(
                    "z_fp"
                ),
                F.count(F.lit(1)).alias("nonzero"),
            )
            .select(
                *keys,
                F.expr(
                    f"round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M} "
                    f"/ (CAST(z_fp AS DOUBLE) / {float(1 << _SHIFT)} + ({HLL_M} - nonzero))) "
                    f"<= 2.5 * {HLL_M} AND nonzero < {HLL_M} "
                    f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - nonzero)) "
                    f"ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M} "
                    f"/ (CAST(z_fp AS DOUBLE) / {float(1 << _SHIFT)} + ({HLL_M} - nonzero))) END, 6)"
                ).alias("est"),
            )
        )

    singles = est_for(regs, ["event_type"])
    types_a = regs.select(F.col("event_type").alias("ta")).distinct()
    types_b = regs.select(F.col("event_type").alias("tb")).distinct()
    pairs = types_a.crossJoin(types_b).filter(F.col("ta") < F.col("tb"))
    union_regs = (
        pairs.join(
            regs,
            (F.col("event_type") == F.col("ta")) | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("r").alias("r"))
    )
    union_est = est_for(union_regs, ["ta", "tb"]).withColumnRenamed("est", "est_union")
    ea = singles.select(F.col("event_type").alias("ta"), F.col("est").alias("est_a"))
    eb = singles.select(F.col("event_type").alias("tb"), F.col("est").alias("est_b"))
    return (
        union_est.join(ea, "ta")
        .join(eb, "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "est_a",
            "est_b",
            "est_union",
            F.expr(
                "round(greatest(CAST(0 AS DOUBLE), est_a + est_b - est_union), 6)"
            ).alias("est_intersection"),
        )
    )


ORACLE_HLL_AUDIENCE_OVERLAP = f"""
WITH ev AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
), hashed AS (
  SELECT event_type, h,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(
             generate_series(1, {_BUCKET_HEX}),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT))),
           (acc, c) -> acc * 16 + c) % {HLL_M} AS bucket,
         h[{_BUCKET_HEX + 1}:{_BUCKET_HEX + _RHO_HEX}] AS tail
  FROM ev
), rho AS (
  SELECT event_type, bucket,
         CAST(({_RHO_HEX} - length(ltrim(tail, '0'))) * 4 AS INT)
         + ({_DIGIT_ZEROS.format(d="ltrim(tail, '0')[1:1]")})
         + 1 AS rho
  FROM hashed
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2
), singles AS (
  SELECT event_type,
         round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}
           / (CAST(SUM(CAST(1 AS BIGINT) << ({_SHIFT} - r)) AS DOUBLE) / {float(1 << _SHIFT)}
              + ({HLL_M} - COUNT(*)))) <= 2.5 * {HLL_M} AND COUNT(*) < {HLL_M}
           THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - COUNT(*)))
           ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}
           / (CAST(SUM(CAST(1 AS BIGINT) << ({_SHIFT} - r)) AS DOUBLE) / {float(1 << _SHIFT)}
              + ({HLL_M} - COUNT(*)))) END, 6) AS est
  FROM regs GROUP BY 1
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM (SELECT DISTINCT event_type FROM regs) a,
       (SELECT DISTINCT event_type FROM regs) b
  WHERE a.event_type < b.event_type
), union_regs AS (
  SELECT p.ta, p.tb, g.bucket, MAX(g.r) AS r
  FROM pairs p JOIN regs g
    ON g.event_type = p.ta OR g.event_type = p.tb
  GROUP BY 1, 2, 3
), union_est AS (
  SELECT ta, tb,
         round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}
           / (CAST(SUM(CAST(1 AS BIGINT) << ({_SHIFT} - r)) AS DOUBLE) / {float(1 << _SHIFT)}
              + ({HLL_M} - COUNT(*)))) <= 2.5 * {HLL_M} AND COUNT(*) < {HLL_M}
           THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - COUNT(*)))
           ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}
           / (CAST(SUM(CAST(1 AS BIGINT) << ({_SHIFT} - r)) AS DOUBLE) / {float(1 << _SHIFT)}
              + ({HLL_M} - COUNT(*)))) END, 6) AS est_union
  FROM union_regs GROUP BY 1, 2
)
SELECT u.ta AS type_a, u.tb AS type_b,
       sa.est AS est_a, sb.est AS est_b, u.est_union,
       round(greatest(CAST(0 AS DOUBLE), sa.est + sb.est - u.est_union), 6)
         AS est_intersection
FROM union_est u
JOIN singles sa ON sa.event_type = u.ta
JOIN singles sb ON sb.event_type = u.tb
"""

register("hll_audience_overlap", q_hll_audience_overlap, ORACLE_HLL_AUDIENCE_OVERLAP)


# ---------------------------------------------------------------------------
# KMV / bottom-k sampling sketch (Bar-Yossef et al. 2002's k-minimum-
# values): keep the k smallest md5(key) hashes. Deterministic (content-
# addressed — no RNG state), UNIFORM over distinct keys (md5 is a fixed
# random permutation of the key space), and MERGEABLE: the bottom-k of
# a union is the bottom-k of the per-shard bottom-k's — the property
# that makes it a distributed sampling primitive (each executor ships k
# rows, never the partition).
# ---------------------------------------------------------------------------
BOTTOMK_K = 64


def bottomk_sketch(df: DataFrame, key_col: str, k: int = BOTTOMK_K) -> DataFrame:
    """The k DISTINCT keys with the smallest md5(key) — (key, h) sorted
    ascending. Dedup before the top-k matters: KMV is a sample over the
    distinct-key SET, and without it a hot key repeated r times would
    occupy up to r of the k slots (and bias any estimator built on the
    k-th hash).

    Plan shape: dropDuplicates is a map-side-combinable aggregation on
    the key; Spark compiles orderBy().limit(k) to TakeOrderedAndProject
    — each task keeps a k-row heap and the driver merges |tasks| x k
    rows; no global sort."""
    return (
        df.select(key_col)
        .dropDuplicates([key_col])
        .select(
            F.col(key_col),
            F.md5(F.col(key_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
    )


def bottomk_merge(sketches, k: int = BOTTOMK_K) -> DataFrame:
    """merge(sketch(A), sketch(B), ...) == sketch(A ∪ B): union the
    (tiny) per-shard sketches, dedup keys shared across shards, and
    re-take the bottom k."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    key = [c for c in out.columns if c != "h"]
    return out.dropDuplicates(key).orderBy("h").limit(k)


def q_bottomk_sample_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded merge-equals-union proof for the KMV sketch (the
    hll_distinct_sources_sharded discipline): customers split into two
    disjoint shards, each sketched independently, sketches merged — the
    result must bitwise-equal the one-shot bottom-k over the whole
    table, which is what the oracle computes. A deterministic uniform
    sample over distinct keys is the workhorse for data-quality
    eyeballing and estimator seeding at 100 TB: every executor
    contributes k candidate rows, the driver state is k rows, and
    re-running on the same corpus reproduces the same sample bit-for-
    bit (content-addressed, no RNG seed plumbing).

    100 TB posture: per-shard cost is a column-pruned scan + per-task
    k-heap (TakeOrderedAndProject); the merge handles S x k rows."""
    from pyspark.sql import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    shard_sketches = [
        bottomk_sketch(cust.filter(F.col("c_custkey") % 2 == i), "c_custkey")
        for i in (0, 1)
    ]
    merged = bottomk_merge(shard_sketches)
    # rank window runs over the k-row sketch, never the fact table
    w = Window.orderBy("h")
    return merged.select(
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
        "c_custkey",
        "h",
    )


ORACLE_BOTTOMK_SAMPLE_SHARDED = f"""
WITH hashed AS (
  SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS h FROM customer
), sample AS (
  SELECT * FROM hashed ORDER BY h LIMIT {BOTTOMK_K}
)
SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS sample_rank,
       c_custkey, h
FROM sample
"""

register(
    "bottomk_sample_sharded",
    q_bottomk_sample_sharded,
    ORACLE_BOTTOMK_SAMPLE_SHARDED,
)


def q_kmv_jaccard_audiences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard similarity between two user audiences FROM THE KMV
    SKETCH (Beyer et al. 2007): with S = bottom-k of md5(user) over
    A ∪ B, Ĵ = |{h ∈ S : h ∈ A ∧ h ∈ B}| / |S| — the classic
    sketch-space overlap estimator (the HLL inclusion-exclusion twin
    `hll_audience_overlap` estimates |A∩B| instead; KMV estimates the
    RATIO directly and needs no union-cardinality algebra). Exact
    Jaccard rides along as the audit column, so the output carries its
    own error.

    100 TB posture: two column-pruned scans to distinct (side, user)
    pairs, one bottom-|S| (per-task k-heap), membership join against
    k rows broadcast. At the test SFs the sketch may cover the whole
    audience (estimate == exact); at production scale it is k rows vs
    millions."""
    from data_pipeline_platform_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    ua = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct()
    )
    ub = (
        events.filter(F.col("event_type") == "view")
        .select("user_id").distinct()
    )
    both = ua.withColumn("in_a", F.lit(1)).join(
        ub.withColumn("in_b", F.lit(1)), "user_id", "full_outer"
    ).select(
        "user_id",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    sketch = (
        both.withColumn("h", F.md5(F.col("user_id").cast("string")))
        .orderBy("h")
        .limit(BOTTOMK_K)
    )
    est = sketch.agg(
        F.count(F.lit(1)).cast("bigint").alias("sketch_size"),
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("est_jaccard"),
    )
    exact = both.agg(
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("exact_jaccard")
    )
    return est.crossJoin(F.broadcast(exact))


ORACLE_KMV_JACCARD_AUDIENCES = f"""
WITH ua AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), ub AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
), flags AS (
  SELECT COALESCE(ua.user_id, ub.user_id) AS user_id,
         CASE WHEN ua.user_id IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN ub.user_id IS NULL THEN 0 ELSE 1 END AS in_b
  FROM ua FULL JOIN ub ON ua.user_id = ub.user_id
), sketch AS (
  SELECT in_a, in_b FROM (
    SELECT *, md5(CAST(user_id AS VARCHAR)) AS h FROM flags
  ) ORDER BY h LIMIT {BOTTOMK_K}
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sketch) AS sketch_size,
       (SELECT CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        FROM sketch) AS est_jaccard,
       (SELECT CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        FROM flags) AS exact_jaccard
"""

register(
    "kmv_jaccard_audiences",
    q_kmv_jaccard_audiences,
    ORACLE_KMV_JACCARD_AUDIENCES,
)
