"""Relational health profiling (extension; generalizes the reference's
single-constraint validation in
`src/pipeline/transformation/schema_validator.py` to whole-schema
audits): referential-integrity orphan profiling over every FK edge,
and join-key skew profiling — the two reports a platform operator
reads BEFORE running a 100 TB join.

Scale posture: every FK edge check is distinct-child-keys (one
map-side-combinable groupBy) anti-joined against the parent key set —
never row x row; the skew profile aggregates the per-key size frame
with scalar aggregates only (Spark's exact `percentile` buffers one
(value -> count) entry per DISTINCT group size, which is
multiplicity-bounded, not data-bounded). Outputs are one row per
edge/key — constant-size regardless of input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# (edge name, child table, child key, parent table, parent key)
_FK_EDGES = [
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_fk_orphan_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(edge, n_child_rows, n_null_keys, n_child_keys, n_orphan_keys,
    n_orphan_rows) for every FK edge in the schema — the whole-schema
    referential-integrity audit. Orphan = a non-NULL child key with no
    parent row; NULLs are counted separately (SQL's NOT IN trap made
    explicit)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    frames = []
    for edge, child_t, ck, parent_t, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, child_t).select(F.col(ck).alias("k"))
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(pk).alias("k")
        ).distinct()
        keyed = child.filter(F.col("k").isNotNull()).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        orphans = keyed.join(parent, "k", "left_anti").agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_orphan_keys"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_orphan_rows"),
        )
        totals = child.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(F.col("k").isNull().cast("bigint")).alias("n_null_keys"),
            F.count_distinct(F.col("k")).alias("n_child_keys"),
        )
        frames.append(
            totals.crossJoin(F.broadcast(orphans)).select(
                F.lit(edge).alias("edge"),
                F.col("n_child_rows").cast("bigint").alias("n_child_rows"),
                F.col("n_null_keys").cast("bigint").alias("n_null_keys"),
                F.col("n_child_keys").cast("bigint").alias("n_child_keys"),
                F.col("n_orphan_keys").cast("bigint").alias("n_orphan_keys"),
                F.col("n_orphan_rows").cast("bigint").alias("n_orphan_rows"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _duck_fk(edge: str, child_t: str, ck: str, parent_t: str, pk: str) -> str:
    return f"""
SELECT '{edge}' AS edge,
       (SELECT COUNT(*) FROM {child_t}) AS n_child_rows,
       (SELECT COUNT(*) FROM {child_t} WHERE {ck} IS NULL) AS n_null_keys,
       (SELECT COUNT(DISTINCT {ck}) FROM {child_t}) AS n_child_keys,
       COALESCE(COUNT(*), 0) AS n_orphan_keys,
       COALESCE(CAST(SUM(cnt) AS BIGINT), 0) AS n_orphan_rows
FROM (
  SELECT {ck} AS k, COUNT(*) AS cnt FROM {child_t}
  WHERE {ck} IS NOT NULL GROUP BY 1
) c
WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p WHERE p.{pk} = c.k)"""


ORACLE_FK_ORPHAN_PROFILE = " UNION ALL ".join(_duck_fk(*e) for e in _FK_EDGES)


# (profile name, table, key column)
_SKEW_KEYS = [
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("events.user_id", "events", "user_id"),
]


def q_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key_name, n_rows, n_keys, max_sz, p50_sz, p90_sz, p99_sz,
    top_key, skew_ratio) per join key — the pre-join skew report that
    decides salting / AQE skew-join hints. top_key is the largest key
    id among the max-size ties (deterministic); skew_ratio = max/p50.

    percentile() buffers one entry per DISTINCT group size (bounded by
    multiplicity, not data volume); at 100 TB the same report holds —
    the per-key size frame is the output of one map-side-combinable
    groupBy and every aggregate over it is scalar."""
    from data_pipeline_platform_spark.sources.readers import load_table

    frames = []
    for name, table, key in _SKEW_KEYS:
        sizes = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).cast("bigint").alias("k"))
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        stats = sizes.agg(
            F.sum("sz").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("sz").alias("max_sz"),
            F.expr("percentile(sz, 0.5)").alias("p50_sz"),
            F.expr("percentile(sz, 0.9)").alias("p90_sz"),
            F.expr("percentile(sz, 0.99)").alias("p99_sz"),
            F.max(F.struct(F.col("sz"), F.col("k"))).alias("top"),
        )
        frames.append(
            stats.select(
                F.lit(name).alias("key_name"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_keys").cast("bigint").alias("n_keys"),
                F.col("max_sz").cast("bigint").alias("max_sz"),
                "p50_sz",
                "p90_sz",
                "p99_sz",
                F.col("top.k").cast("bigint").alias("top_key"),
                (F.col("max_sz").cast("double") / F.col("p50_sz")).alias("skew_ratio"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _duck_skew(name: str, table: str, key: str) -> str:
    return f"""
SELECT '{name}' AS key_name,
       CAST(SUM(sz) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       CAST(MAX(sz) AS BIGINT) AS max_sz,
       quantile_cont(sz, 0.5) AS p50_sz,
       quantile_cont(sz, 0.9) AS p90_sz,
       quantile_cont(sz, 0.99) AS p99_sz,
       CAST((MAX({{'sz': sz, 'k': k}})).k AS BIGINT) AS top_key,
       CAST(MAX(sz) AS DOUBLE) / quantile_cont(sz, 0.5) AS skew_ratio
FROM (
  SELECT CAST({key} AS BIGINT) AS k, COUNT(*) AS sz FROM {table} GROUP BY 1
)"""


ORACLE_JOIN_SKEW_PROFILE = " UNION ALL ".join(_duck_skew(*s) for s in _SKEW_KEYS)


N_SALT = 8


def q_salted_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remediation `join_skew_profile` implies: a SALTED shuffle
    join + two-phase aggregation on the profile's fact-side key
    (events.user_id). Companion to `salted_skew_join`
    (functions/scale.py — event_type, the 5-value census key); THIS
    variant salts the profile's actual row key, forces the shuffle
    join (no broadcast escape), and is pinned by a plan-quality gate.
    A hot key funnels its whole row set through one reducer in a plain
    shuffle join; salting splits it N_SALT ways:

    - fact side gets a DETERMINISTIC salt (event_id % N_SALT — never a
      rand(): replays and retries must land rows on the same salt);
    - the dim side replicates N_SALT times (explode over the salt
      domain), so (key, salt) covers exactly the same matches;
    - the join is FORCED to a shuffle merge join (merge hint — at
      100 TB both sides are too big to broadcast, which is the only
      regime where salting matters), keyed on (user_id, salt): the hot
      key's rows now spread over N_SALT partitions
      (tests/test_plan_quality.py asserts the salt is in the join key);
    - phase-1 aggregates per (segment, salt), phase-2 folds the salt
      out — exact integer cents, so the result is BITWISE equal to the
      unsalted join+groupBy the oracle computes.

    Scale: shuffle volume is unchanged (each fact row still moves
    once; the dim pays x N_SALT replication — dim-sized, negligible),
    but the maximum reducer load drops by ~N_SALT on the hot keys —
    the difference between a straggler task and an even stage."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("val_c"),
        F.expr(f"pmod(event_id, {N_SALT})").alias("salt"),
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
        )
        .withColumn("salt", F.col("salt").cast("bigint"))
    )
    joined = ev.join(dim.hint("merge"), ["user_id", "salt"])
    partial = joined.groupBy("c_mktsegment", "salt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val_c").alias("s")
    )
    return partial.groupBy("c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        (F.sum("s") / 100.0).alias("total_value"),
    )


ORACLE_SALTED_SKEW_JOIN_EVENTS = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


register("fk_orphan_profile", q_fk_orphan_profile, ORACLE_FK_ORPHAN_PROFILE)
register("join_skew_profile", q_join_skew_profile, ORACLE_JOIN_SKEW_PROFILE)
register(
    "salted_skew_join_events",
    q_salted_skew_join_events,
    ORACLE_SALTED_SKEW_JOIN_EVENTS,
)
