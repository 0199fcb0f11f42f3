"""Privacy-risk analytics over tabular data (extension; no reference
counterpart — the reference has no privacy surface at all, and the
nearest op here, `pii_scrub` in functions/corpus.py, redacts free text
rather than measuring re-identification risk).

A training-data platform that ingests user-derived tables needs the
classic disclosure-risk measures BEFORE the data ships to a training
run:

- ``k_anonymity_classes``: group the table by its quasi-identifier (QI)
  columns into equivalence classes; a record in a class of size < k is
  re-identifiable by linking those QI values to an external source
  (Sweeney, "k-Anonymity: a model for protecting privacy", 2002).  Also
  reports each class's l-diversity (distinct sensitive values —
  Machanavajjhala et al. 2007): a large class whose sensitive column is
  constant still leaks by homogeneity.
- ``k_anonymize_ladder``: the enforcement half — walk a deterministic
  generalization ladder (coarser and coarser QI encodings) and publish
  the FIRST level whose minimum class size reaches k.  This is
  full-domain generalization with a fixed lattice path, the textbook
  baseline (Samarati 2001); level min-sizes are 1-row aggregates, so
  choosing the level costs |ladder| dimension-table scans and the
  driver only ever sees |ladder| integers.

Scale shape: everything is groupBy on the QI projection — map-side
partial aggregation collapses each task to |classes| rows before the
exchange, and |classes| is bounded by the QI domain product, not the
table.  All-integer/string arithmetic; the DuckDB oracles replay
bitwise.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register


def k_anonymity_classes(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive: str,
    k: int = 5,
) -> DataFrame:
    """One row per QI equivalence class: the QI values, class_size,
    l_diversity (distinct sensitive values in the class), and at_risk
    (class smaller than k)."""
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(F.col(sensitive)).alias("l_diversity"),
        )
        .select(
            *qi_cols,
            "class_size",
            "l_diversity",
            (F.col("class_size") < k).alias("at_risk"),
        )
    )


def k_anonymize_ladder(
    df: DataFrame,
    ladder: Sequence[Tuple[str, List[Column]]],
    k: int,
) -> DataFrame:
    """Publish the first generalization level whose min class size >= k.

    ``ladder`` is an ordered list of (level_name, [qi expression
    Columns aliased to stable names]) from finest to coarsest; the last
    level should be coarse enough to always qualify (e.g. a constant).
    Returns the qualifying level's classes as (level, qi1, qi2,
    class_size).  Raises if no level reaches k — publishing data that
    misses the target is the one thing this function must never do.
    """
    for level_name, exprs in ladder:
        classes = df.groupBy(*exprs).agg(F.count(F.lit(1)).alias("class_size"))
        # 1-row aggregate per level; the driver sees one integer
        min_size = classes.agg(F.min("class_size")).collect()[0][0]
        if min_size is not None and min_size >= k:
            qi_names = [c for c in classes.columns if c != "class_size"]
            return classes.select(
                F.lit(level_name).alias("level"), *qi_names, "class_size"
            )
    raise ValueError(f"no ladder level reaches k={k}")


# ---------------------------------------------------------------------------
# graded queries
# ---------------------------------------------------------------------------


def q_k_anonymity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QI = (nation, market segment); sensitive = account-balance
    kilobucket.  The per-class risk table a release gate would read."""
    from data_pipeline_platform_spark.sources.readers import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # exact integer bucketing: cents // 100000 (floor semantics for
        # negatives differ between engines' integer division, so bucket
        # on the cents value with explicit floor)
        F.floor(F.round(F.col("c_acctbal") * 100).cast("bigint") / 100000)
        .cast("bigint")
        .alias("bal_kb"),
    )
    return k_anonymity_classes(
        cust, ["c_nationkey", "c_mktsegment"], sensitive="bal_kb", k=5
    )


ORACLE_K_ANONYMITY_CUSTOMER = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT)
           AS bal_kb
  FROM customer
)
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT bal_kb) AS BIGINT) AS l_diversity,
       COUNT(*) < 5 AS at_risk
FROM c
GROUP BY c_nationkey, c_mktsegment
"""


def q_k_anonymize_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk the generalization ladder (nation, segment) -> (region,
    segment) -> (region) -> all until every class has >= 60 members and
    publish that level's classes.  60 is chosen so the finest levels
    FAIL at the driver's sf and the ladder genuinely walks."""
    from data_pipeline_platform_spark.sources.readers import load_table

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    ladder = [
        (
            "nation_segment",
            [
                F.col("c_nationkey").cast("bigint").alias("qi1"),
                F.col("c_mktsegment").alias("qi2"),
            ],
        ),
        (
            "region_segment",
            [
                F.col("n_regionkey").cast("bigint").alias("qi1"),
                F.col("c_mktsegment").alias("qi2"),
            ],
        ),
        (
            "region",
            [
                F.col("n_regionkey").cast("bigint").alias("qi1"),
                F.lit("*").alias("qi2"),
            ],
        ),
        (
            "all",
            [F.lit(-1).cast("bigint").alias("qi1"), F.lit("*").alias("qi2")],
        ),
    ]
    return k_anonymize_ladder(joined, ladder, k=60)


ORACLE_K_ANONYMIZE_CUSTOMER = """
WITH j AS (
  SELECT c.c_mktsegment, c.c_nationkey, n.n_regionkey
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), l1 AS (
  SELECT CAST(c_nationkey AS BIGINT) AS qi1, c_mktsegment AS qi2, COUNT(*) AS n
  FROM j GROUP BY 1, 2
), l2 AS (
  SELECT CAST(n_regionkey AS BIGINT) AS qi1, c_mktsegment AS qi2, COUNT(*) AS n
  FROM j GROUP BY 1, 2
), l3 AS (
  SELECT CAST(n_regionkey AS BIGINT) AS qi1, '*' AS qi2, COUNT(*) AS n
  FROM j GROUP BY 1, 2
), l4 AS (
  SELECT CAST(-1 AS BIGINT) AS qi1, '*' AS qi2, COUNT(*) AS n FROM j
), choice AS (
  SELECT CASE
    WHEN (SELECT MIN(n) FROM l1) >= 60 THEN 'nation_segment'
    WHEN (SELECT MIN(n) FROM l2) >= 60 THEN 'region_segment'
    WHEN (SELECT MIN(n) FROM l3) >= 60 THEN 'region'
    ELSE 'all' END AS level
)
SELECT level, qi1, qi2, CAST(n AS BIGINT) AS class_size
FROM choice, l1 WHERE level = 'nation_segment'
UNION ALL
SELECT level, qi1, qi2, CAST(n AS BIGINT) FROM choice, l2 WHERE level = 'region_segment'
UNION ALL
SELECT level, qi1, qi2, CAST(n AS BIGINT) FROM choice, l3 WHERE level = 'region'
UNION ALL
SELECT level, qi1, qi2, CAST(n AS BIGINT) FROM choice, l4 WHERE level = 'all'
"""


register("k_anonymity_customer", q_k_anonymity_customer, ORACLE_K_ANONYMITY_CUSTOMER)
register("k_anonymize_customer", q_k_anonymize_customer, ORACLE_K_ANONYMIZE_CUSTOMER)


_DP_EPS = 1.0
_DP_SCALE = 1_000_000


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-mechanism demo: per-language document
    counts released through the Laplace mechanism at epsilon = 1
    (sensitivity 1 for a unit-count query), with the noise drawn by
    inverse-CDF from the content-addressed md5 uniform of the group
    key:  lap = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|).

    Content-addressed noise makes the release REPLAYABLE (rerunning the
    pipeline republishes the identical noisy counts — republication
    would otherwise spend fresh privacy budget) and lets the oracle
    replay it bitwise. A production deployment would swap the md5
    uniform for a secret-seeded PRF: the mechanism, sensitivity
    accounting, and release shape are exactly this.

    Scale: one map-side-combinable count per group; noise is row-local
    arithmetic on the |groups|-sized frame."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    u16 = F.conv(F.substring(F.md5(F.concat(F.lit("dp|"), F.col("lang"))), 1, 4), 16, 10).cast(
        "bigint"
    )
    lap = (
        f"-1.0 / {_DP_EPS} * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END "
        f"* ln(1.0 - 2.0 * abs(u - 0.5))"
    )
    return (
        counts.withColumn("u16", u16)
        # CAST to DOUBLE: bare x.0/x.5 literals are DECIMAL in Spark
        # SQL (precision-losing division) but DOUBLE in DuckDB
        .withColumn("u", F.expr("(CAST(u16 AS DOUBLE) + 0.5) / 65536"))
        .select(
            "lang",
            (
                (F.col("n") * _DP_SCALE + F.expr(f"CAST(round(({lap}) * {_DP_SCALE}) AS BIGINT)"))
                / float(_DP_SCALE)
            ).alias("noisy_count"),
            F.lit(float(_DP_EPS)).alias("epsilon"),
        )
    )


ORACLE_DP_NOISY_COUNTS = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
), seeded AS (
  SELECT lang, n,
         (CAST(('0x' || substr(md5('dp|' || lang), 1, 4))::BIGINT AS DOUBLE) + 0.5)
           / 65536 AS u
  FROM counts
)
SELECT lang,
       (n * {_DP_SCALE} + CAST(round((-1.0 / {_DP_EPS}
          * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END
          * ln(1.0 - 2.0 * abs(u - 0.5))) * {_DP_SCALE}) AS BIGINT))
         / {float(_DP_SCALE)} AS noisy_count,
       {float(_DP_EPS)} AS epsilon
FROM seeded
"""


register("dp_noisy_counts", q_dp_noisy_counts, ORACLE_DP_NOISY_COUNTS)


_DP_CLIP_C = 200_000 * 100  # per-order contribution clip, in cents


def q_dp_noisy_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP SUM release with contribution clipping (the companion to
    dp_noisy_counts): per-priority total order value, each order's
    contribution CLIPPED to [0, C] (the clip bounds the sensitivity —
    without it one whale order makes the release useless or the noise
    unbounded), then Laplace(C/eps) noise by inverse-CDF from the
    content-addressed uniform of the group key. Round-after-ln fixed
    point, one closing division — the dp_noisy_counts determinism
    recipe applied to a bounded-sensitivity SUM.

    Scale: one clipped map-side-combinable sum per group; noise is
    row-local on the |groups| frame."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    clipped = orders.select(
        "o_orderpriority",
        F.least(
            F.greatest(
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
                F.lit(0),
            ),
            F.lit(_DP_CLIP_C),
        ).alias("c"),
    )
    sums = clipped.groupBy("o_orderpriority").agg(F.sum("c").alias("s"))
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dpsum|"), F.col("o_orderpriority"))), 1, 4
        ),
        16,
        10,
    ).cast("bigint")
    b = float(_DP_CLIP_C) / _DP_EPS  # Laplace scale, cents
    lap = (
        f"-{b} * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END "
        f"* ln(1.0 - 2.0 * abs(u - 0.5))"
    )
    return (
        sums.withColumn("u16", u16)
        .withColumn("u", F.expr("(CAST(u16 AS DOUBLE) + 0.5) / 65536"))
        .select(
            "o_orderpriority",
            (
                (
                    F.col("s") * _DP_SCALE
                    + F.expr(f"CAST(round(({lap}) * {_DP_SCALE}) AS BIGINT)")
                )
                / float(_DP_SCALE * 100)
            ).alias("noisy_total"),
            F.lit(float(_DP_EPS)).alias("epsilon"),
            F.lit(float(_DP_CLIP_C) / 100.0).alias("clip"),
        )
    )


ORACLE_DP_NOISY_SUM = f"""
WITH clipped AS (
  SELECT o_orderpriority,
         LEAST(GREATEST(CAST(round(o_totalprice * 100) AS BIGINT), 0),
               {_DP_CLIP_C}) AS c
  FROM orders
), sums AS (
  SELECT o_orderpriority, SUM(c) AS s FROM clipped GROUP BY 1
), seeded AS (
  SELECT o_orderpriority, s,
         (CAST(('0x' || substr(md5('dpsum|' || o_orderpriority), 1, 4))::BIGINT
            AS DOUBLE) + 0.5) / 65536 AS u
  FROM sums
)
SELECT o_orderpriority,
       (s * {_DP_SCALE} + CAST(round((-{float(_DP_CLIP_C) / _DP_EPS}
          * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END
          * ln(1.0 - 2.0 * abs(u - 0.5))) * {_DP_SCALE}) AS BIGINT))
         / {float(_DP_SCALE * 100)} AS noisy_total,
       {float(_DP_EPS)} AS epsilon,
       {float(_DP_CLIP_C) / 100.0} AS clip
FROM seeded
"""

register("dp_noisy_sum", q_dp_noisy_sum, ORACLE_DP_NOISY_SUM)
