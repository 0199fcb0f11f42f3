"""Scale techniques as first-class utilities: skew-salted joins,
partition-pruned layouts, approximate aggregates.

These are the knobs a 100 TB deployment turns when the defaults (AQE
skew handling, static partitioning) aren't enough. Each is exact-
semantics-preserving except the approx_* aggregates, which trade bounded
error for a sketch-sized shuffle.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    right_on: Optional[str] = None,
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small) right side into
    ``salt_buckets`` copies, salt the left side randomly, join on
    (key, salt).

    A hot key that would land 10% of the table on one reducer spreads
    across ``salt_buckets`` tasks instead. For the supported join types
    the semantics are exact: every left row carries one salt and meets
    every right row with its key exactly once (the right row is
    replicated per salt). AQE's skew-join splitting handles moderate
    skew without this; salting is for the pathological keys AQE can't
    split (single-key partitions).

    Only left-preserving ``how`` values are accepted (inner, left,
    left_semi, left_anti). right/full outer are rejected: the exploded
    right side would surface every UNMATCHED right row ``salt_buckets``
    times (one null-extended copy per salt) — salt the other side
    instead (swap the operands and use ``left``).

    ``right`` is replicated ``salt_buckets``x — use with a dimension-
    sized right side, not another fact table.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — unmatched right "
            f"rows would be duplicated {salt_buckets}x. Use one of "
            f"{sorted(allowed)}, or swap operands for a right-outer."
        )
    rk = right_on or on
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    if right_on is None:
        joined = salted_left.join(salted_right, on=[on, "__salt"], how=how)
    else:
        joined = salted_left.join(
            salted_right,
            (salted_left[on] == salted_right[rk])
            & (salted_left["__salt"] == salted_right["__salt"]),
            how=how,
        )
    return joined.drop("__salt")


def choose_salt_buckets(
    hot_rows: int,
    target_rows_per_task: int,
    max_buckets: int = 256,
) -> int:
    """Salt-count selection from a skew profile (`diagnose_skew` /
    `join_skew_profile` feed this): the smallest fan-out that caps the
    hottest key's per-task row load at ``target_rows_per_task``,
    clamped to [1, max_buckets].

    1 means "don't salt" — the key already fits one task's budget, and
    salting anyway would pay the dim-replication cost for nothing.
    The clamp bounds the dim explosion: past it, split the key out of
    the join instead (broadcast the hot key's dim row separately)."""
    if hot_rows < 0:
        raise ValueError(f"hot_rows must be >= 0, got {hot_rows}")
    if target_rows_per_task <= 0:
        raise ValueError(
            f"target_rows_per_task must be > 0, got {target_rows_per_task}"
        )
    if max_buckets < 1:
        raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")
    need = -(-hot_rows // target_rows_per_task)  # ceil
    return max(1, min(max_buckets, need))


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write with a derived event_date partition column — the layout that
    makes time-range queries prune to the touched days (PartitionFilters
    in the scan instead of reading 100 TB to filter 1 day)."""
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def diagnose_skew(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Key-frequency report: the operational first step before choosing
    AQE-skew-join vs salting vs key-splitting. Returns top keys with
    their share of total rows."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 4))
        .orderBy(F.col("n").desc(), F.col(key))
        .limit(top_n)
    )


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a table directory into
    ceil(bytes/target) files. Streaming sinks and incremental appends
    accumulate small files that poison scan parallelism (one task per
    tiny file) — compaction restores the intended partition geometry.
    Returns the new file count. Crash-safe via the same staged-swap
    healing as the upsert writer (a crash mid-swap leaves the backup as
    the only copy; recovery restores it before re-compacting)."""
    import math

    from data_pipeline_platform_spark.sinks.writers import recover_staged_swap

    recover_staged_swap(path)

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.format(fmt).load(path)
    staging = path + ".__compact__"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(staging)
    backup = path + ".__old__"
    if os.path.isdir(backup):
        shutil.rmtree(backup)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n_files


def approx_profile(
    df: DataFrame,
    group_cols: List[str],
    distinct_col: str,
    percentile_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Sketch-based profile: HLL distinct + approximate percentiles.

    At 100 TB an exact COUNT(DISTINCT) shuffles every distinct value;
    the HyperLogLog sketch shuffles ~1.5 KB per group at rsd=5%.
    Approximate by contract — callers needing exactness use the exact
    operators and pay the shuffle."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(f"approx_distinct_{distinct_col}"),
        F.percentile_approx(percentile_col, [0.5, 0.95, 0.99], 10_000).alias(
            f"{percentile_col}_p50_p95_p99"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# driver-graded: salting preserves exact join semantics
# ---------------------------------------------------------------------------

def q_salted_skew_join(spark, sf_dir: str) -> DataFrame:
    """The salted join under the correctness gate, on the most skewed
    key the dataset has: event_type (5 values — each key is 20% of the
    fact table, the single-key-partition case AQE cannot split). Events
    are enriched with their type's exact average value via salted_join,
    then re-aggregated; the oracle runs the PLAIN join, so the grade
    proves salting changes the physical plan and nothing else.

    The per-type average is computed as one division of exact integers
    (sum-of-cents / (100*n)) so the float compare is bitwise identical
    in both engines."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.groupBy("event_type").agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long"))
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("avg_value")
    )
    enriched = salted_join(ev, dim, on="event_type", salt_buckets=8)
    return enriched.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") > F.col("avg_value")).cast("long")).alias("n_above_avg"),
    )


ORACLE_SALTED_SKEW_JOIN = """
WITH dim AS (
  SELECT event_type,
         SUM(CAST(round(value * 100) AS BIGINT)) / (100.0 * COUNT(*)) AS avg_value
  FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n_events,
       SUM(CASE WHEN e.value > dim.avg_value THEN 1 ELSE 0 END) AS n_above_avg
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
"""


from data_pipeline_platform_spark.functions import register as _register

_register("salted_skew_join", q_salted_skew_join, ORACLE_SALTED_SKEW_JOIN)


# ---------------------------------------------------------------------------
# Bloom-filter join pruning: shrink the fact side BEFORE the join shuffle
# ---------------------------------------------------------------------------
# At 100 TB the expensive part of fact⋈filtered-dim is shuffling fact
# rows that will never match. A Bloom filter of the qualifying dim keys
# is a few KB of bits that broadcasts to every scan task and drops
# non-matching fact rows scan-side — no false negatives (pruning is
# semantics-free; the exact join still runs on the survivors), bounded
# false positives (they just ride along to the join). Spark's AQE has a
# runtime version (spark.sql.optimizer.runtime.bloomFilter.enabled);
# this is the explicit, engine-portable one, and the graded query
# proves the prune changes nothing: the oracle runs the PLAIN join.

BLOOM_M = 1 << 16  # bits; 4 md5 hex chars address them exactly
BLOOM_WORDS = BLOOM_M >> 6  # 1024 BIGINT words
BLOOM_K = 3  # hash functions


def _bloom_pos(j: int, key: str) -> str:
    """Bit position j for a key column: xxhash64 with the hash index
    mixed in as an extra column. JVM-native and codegen'd — the filter
    is internal plumbing (the graded result is the plain join's), so it
    needs run-to-run determinism, not cross-engine replayability, and
    xxhash64 is ~10x cheaper than an md5-hex fold per row."""
    return f"pmod(xxhash64({key}, {j}), {BLOOM_M})"


def build_bloom(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter as ONE row with a BLOOM_WORDS-long array<bigint>.

    Fully distributed: positions explode map-side, words OR-combine in
    a (word_idx) aggregation whose result is <= 1024 rows, and the final
    array assembles via a sorted collect inside an aggregate — the only
    single-row object is the filter itself, which is the point (it
    broadcasts)."""
    spark = keys.sparkSession
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos(j, key_col)) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    ors = (
        pos.select(
            F.expr("CAST(shiftright(pos, 6) AS INT)").alias("w_idx"),
            F.expr("CAST(pos % 64 AS INT)").alias("bit"),
        )
        .groupBy("w_idx")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("w"))
    )
    full = (
        spark.range(BLOOM_WORDS)
        .select(F.col("id").cast("int").alias("w_idx"))
        .join(ors, "w_idx", "left")
        .na.fill({"w": 0})
    )
    return full.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(w_idx, w))), x -> x.w)"
        ).alias("bloom")
    )


def bloom_prune(df: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (all BLOOM_K bits
    set); the caller's exact join removes the false positives.

    The one-row filter frame broadcasts (nested-loop join with a single
    build row); each row computes its BLOOM_K positions once and tests
    the word bits. A 1024-literal array expression was measured SLOWER
    (it falls out of whole-stage codegen); the broadcast row is the
    faster carrier."""
    out = df.crossJoin(F.broadcast(bloom))
    pos_cols = []
    for j in range(BLOOM_K):
        pc = f"_bloom_pos_{j}"
        out = out.withColumn(pc, F.expr(_bloom_pos(j, key_col)))
        pos_cols.append(pc)
    tests = [
        f"(element_at(bloom, CAST(shiftright({pc}, 6) AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST({pc} % 64 AS INT))) != 0"
        for pc in pos_cols
    ]
    return out.filter(F.expr(" AND ".join(tests))).drop("bloom", *pos_cols)


def q_bloom_prune_join(spark, sf_dir: str) -> DataFrame:
    """Monthly revenue of URGENT-priority orders, with the lineitem side
    Bloom-pruned before the join. The oracle is the plain join — the
    grade proves the prune is invisible to the result while the plan
    shuffles only the ~1/5 of lineitem that can match."""
    from data_pipeline_platform_spark.sources.readers import load_table

    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = build_bloom(urgent.select("o_orderkey"), "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", bloom)
    rev_c = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) "
        "* (100 - CAST(round(l_discount * 100) AS BIGINT))"
    )
    return (
        pruned.join(
            urgent.select("o_orderkey", "o_orderdate"),
            pruned.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            (F.sum(rev_c) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_BLOOM_PRUNE_JOIN = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1, 2
"""

_register("bloom_prune_join", q_bloom_prune_join, ORACLE_BLOOM_PRUNE_JOIN)


def assign_sequential_ids(
    df: DataFrame,
    order_by,
    id_col: str = "seq_id",
    start: int = 1,
    num_partitions: int = None,
):
    """Globally sequential, gap-free ids in ``order_by`` order WITHOUT a
    global window — the distributed substitute for
    ``row_number() OVER (ORDER BY ...)`` (which funnels every row
    through one task and is banned by this repo's plan gate):

    1. range-repartition on the order columns (equal keys co-locate,
       partition p holds strictly smaller keys than partition p+1) and
       PERSIST — the partitioning must be pinned, because the range
       partitioner samples and the two downstream jobs must see the
       same boundaries;
    2. one count-per-partition pass (|partitions| rows to the driver)
       gives each partition its exclusive prefix offset;
    3. a PARTITION-LOCAL row_number + the broadcast offset closes the
       global rank.

    The result is independent of the sampled boundaries: each row's id
    is its global rank in ``order_by`` order, provided the order
    columns form a TOTAL order (ties would make ranks arbitrary within
    the tie — pass a tie-breaking column; the census-style proof is in
    the graded twin's oracle, a literal ROW_NUMBER OVER (ORDER BY ..))."""
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.utils.cache import tracked_persist

    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = tracked_persist(
        df.repartitionByRange(n, *cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = [], start
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = df.sparkSession.createDataFrame(
        offsets, "__pid int, __off bigint"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        parts.join(F.broadcast(off), "__pid")
        .withColumn(
            id_col, F.row_number().over(w) + F.col("__off") - F.lit(1)
        )
        .drop("__pid", "__off")
    )


def q_sequential_ids_orders(spark, sf_dir: str) -> DataFrame:
    """Gap-free global ranks over orders by (o_orderdate, o_orderkey)
    with NO global window: range partitions + per-partition offsets.
    The oracle is the literal ROW_NUMBER() OVER (ORDER BY ...) — the
    operator must equal the thing its plan refuses to run."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").cast("string").alias("od"),
    )
    out = assign_sequential_ids(
        orders, ["od", "o_orderkey"], id_col="seq_id", num_partitions=8
    )
    return out.select("o_orderkey", "od", "seq_id")


ORACLE_SEQUENTIAL_IDS_ORDERS = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od,
       CAST(row_number() OVER (
         ORDER BY CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderkey
       ) AS BIGINT) AS seq_id
FROM orders
"""

_register(
    "sequential_ids_orders", q_sequential_ids_orders,
    ORACLE_SEQUENTIAL_IDS_ORDERS,
)


# ---------------------------------------------------------------------------
# Bucketed fact-fact join: the layout that deletes the 100 TB shuffle
# ---------------------------------------------------------------------------

def q_bucketed_fact_join(spark, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with BOTH sides bucketed on the join key —
    Spark matches bucket ids side to side, so the join executes with
    ZERO Exchange over either fact table (broadcast disabled to show
    it: at 100 TB neither side broadcasts; the bucketed-join plan gate
    is tests/test_bucketing.py). This graded twin proves the layout
    changes the PLAN, not the ANSWER: values are the plain-join
    aggregate the oracle computes. The bucketed tables carry a per-run
    token in their names (two sessions sharing a metastore, or
    interleaved runs against different sf_dirs, must not collide) and
    are DROPPED — with their temp directory removed — once the 3-row
    aggregate is materialized; at production scale they are written
    once and every orderkey-joined query reuses the layout."""
    import os
    import shutil
    import tempfile

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )
    base = tempfile.mkdtemp(prefix="bktjoin_")
    run = os.path.basename(base).replace("bktjoin_", "")
    t_orders = f"dpps_bkt_orders_{run}"
    t_lineitem = f"dpps_bkt_lineitem_{run}"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for df, name, col in (
            (orders, t_orders, "o_orderkey"),
            (li, t_lineitem, "l_orderkey"),
        ):
            (
                df.repartition(8, col)
                .write.mode("overwrite")
                .bucketBy(8, col)
                .sortBy(col)
                .option("path", f"{base}/{name}")
                .saveAsTable(name)
            )
        o = spark.table(t_orders)
        l = spark.table(t_lineitem)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                (F.sum("price_c") / 100.0).alias("total_price"),
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # self-auditing: the join inputs must come off the bucketed
        # layout with at most the final group-by exchanging
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        # materialize the (tiny) aggregate so the tables can be dropped
        # and the temp dir reclaimed before returning
        rows = out.collect()
        result = spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for name in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(base, ignore_errors=True)
    return result


ORACLE_BUCKETED_FACT_JOIN = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0
         AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""

_register("bucketed_fact_join", q_bucketed_fact_join, ORACLE_BUCKETED_FACT_JOIN)
