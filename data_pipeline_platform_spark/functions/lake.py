"""Graded surface for the ACID lake-table layer (sinks/acid.py).

``acid_merge_orders`` drives the full transaction path end-to-end —
write a base snapshot of orders as a multi-file AcidTable, MERGE a
deterministic update+insert batch (reference ON-CONFLICT semantics,
src/pipeline/persistence/batch_writer.py:230-276), and return the final
snapshot — while the DuckDB oracle expresses the same merge as a FULL
JOIN, so the copy-on-write machinery (log replay, footer-stats file
skipping, touched-file rewrite) is verified value-exact against plain
SQL semantics, not just unit-tested.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sources.readers import load_table


def q_acid_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # base snapshot: even orderkeys, written as 4 files so the merge has
    # files to prune; source: a deterministic update (every 100th base
    # key gets +1.00) plus inserts (odd keys divisible by 501)
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="acid_merge_orders_"))
    table.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    table.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    return table.read().select("o_orderkey", "o_custkey", "o_totalprice")


ORACLE_ACID_MERGE_ORDERS = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
),
src AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice
  FROM base WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
)
SELECT o_orderkey,
       COALESCE(s.o_custkey, b.o_custkey) AS o_custkey,
       COALESCE(s.o_totalprice, b.o_totalprice) AS o_totalprice
FROM base b FULL JOIN src s USING (o_orderkey)
"""

register("acid_merge_orders", q_acid_merge_orders, ORACLE_ACID_MERGE_ORDERS)


def q_acid_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change-data-feed between the base snapshot and the
    post-MERGE version (Delta CDF shape: insert / delete /
    update_preimage / update_postimage).  Exercises ``changes()``'s
    touched-files-only diff: COW survivor rows rewritten with identical
    values must NOT surface as updates."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="acid_change_feed_"))
    table.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    table.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    return table.changes(["o_orderkey"], v_from=1, v_to=2)


ORACLE_ACID_CHANGE_FEED = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
)
SELECT 'insert' AS change_type, o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
UNION ALL
SELECT 'update_preimage', o_orderkey, o_custkey, o_totalprice
FROM base WHERE o_orderkey % 100 = 0
UNION ALL
SELECT 'update_postimage', o_orderkey, o_custkey, o_totalprice + 1.0
FROM base WHERE o_orderkey % 100 = 0
"""


register("acid_change_feed", q_acid_change_feed, ORACLE_ACID_CHANGE_FEED)


def q_materialized_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained revenue-by-priority materialized view
    (sinks/matview.py): three fact batches folded forward through
    additive per-group state; the result must equal the one-shot groupBy
    over all of orders — which is exactly what the oracle computes."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="matview_orders_"),
        keys=["o_orderpriority"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("min_ok", "min", "o_orderkey"),
            ("max_ok", "max", "o_orderkey"),
        ],
    )
    for r in range(3):
        view.update(orders.filter(F.col("o_orderkey") % 3 == r))
    return view.read().select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
        (F.col("sum_price_c") / 100.0 / F.col("n_orders")).alias("avg_price"),
        "min_ok",
        "max_ok",
    )


ORACLE_MATERIALIZED_AGG_ORDERS = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       SUM(price_c) / 100.0 / COUNT(*) AS avg_price,
       MIN(o_orderkey) AS min_ok,
       MAX(o_orderkey) AS max_ok
FROM c
GROUP BY o_orderpriority
"""


register(
    "materialized_agg_orders",
    q_materialized_agg_orders,
    ORACLE_MATERIALIZED_AGG_ORDERS,
)


def q_cdf_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion bronze->silver hop end-to-end (streaming/cdf.py):
    a bronze AcidTable takes three commits — base write, ON-CONFLICT
    merge (updates + inserts), delete-matched merge — and after EACH
    commit a ChangeFeedConsumer folds the row-level change feed into a
    silver count/sum view WITH retraction (updates subtract their
    preimage, deletes subtract entirely). The silver state must equal
    the one-shot groupBy over the FINAL bronze snapshot — which is
    exactly what the oracle computes from plain SQL, so the whole chain
    (CDF diff, signed fold, atomic in-commit progress marker,
    zero-count drop) is value-graded, not just unit-tested."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    deletes = base.filter(F.col("o_orderkey") % 300 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="cdf_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="cdf_silver_"),
        keys=["o_orderpriority"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=view, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    consumer.process_available()
    bronze.merge(deletes, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    return consumer.state().select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
    )


ORACLE_CDF_INCREMENTAL_VIEW = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), kept AS (
  SELECT * FROM upd WHERE o_orderkey % 300 <> 0
), ins AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), final AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price
FROM final
GROUP BY o_orderpriority
"""

register("cdf_incremental_view", q_cdf_incremental_view, ORACLE_CDF_INCREMENTAL_VIEW)


def q_acid_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style predicate DELETE through the ACID layer: write orders
    as a multi-file snapshot, ``delete()`` every 7th key, return the
    surviving snapshot aggregated per status. Exercises the
    touched-file resolution (_metadata.file_path) and the COW rewrite —
    only files containing a matching row are rewritten, the rest carry
    over by reference — verified value-exact against plain NOT(pred)
    SQL. The right-to-be-forgotten path a lakehouse needs at 100 TB:
    cost scales with files TOUCHED, not table size."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="acid_delete_orders_"))
    table.write(orders.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    table.delete("o_orderkey % 7 = 0")
    return (
        table.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")) / 100.0
            ).alias("total_price"),
        )
    )


ORACLE_ACID_DELETE_ORDERS = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
WHERE NOT (o_orderkey % 7 = 0)
GROUP BY o_orderstatus
"""


register("acid_delete_orders", q_acid_delete_orders, ORACLE_ACID_DELETE_ORDERS)


def q_acid_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level statistics SERVED FROM THE TRANSACTION LOG: write
    orders as an AcidTable with footer stats on (o_orderkey,
    o_totalprice), then answer count/min/max from the commit log's
    add-action metadata alone — zero data files opened (the
    Delta/Iceberg metadata-only query path; at 100 TB this is the
    difference between a driver-side log read and a full scan). The
    oracle computes the same stats FROM THE DATA, so a footer/stats
    drift anywhere in the write path breaks the hash."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="acid_stats_orders_"))
    table.write(
        orders.repartition(4, "o_orderkey"),
        stats_cols=["o_orderkey", "o_totalprice"],
    )
    files = table.snapshot_files()
    # file-list-bounded driver frame (the Delta pattern): one row per
    # data file, aggregated to table stats without touching the files
    rows = [
        (
            int(a["rows"]),
            int(a["stats"]["o_orderkey"]["min"]),
            int(a["stats"]["o_orderkey"]["max"]),
            float(a["stats"]["o_totalprice"]["min"]),
            float(a["stats"]["o_totalprice"]["max"]),
        )
        for a in files
    ]
    per_file = spark.createDataFrame(
        rows, "rows bigint, k_min bigint, k_max bigint, p_min double, p_max double"
    )
    return per_file.agg(
        F.sum("rows").alias("n_rows"),
        F.min("k_min").alias("orderkey_min"),
        F.max("k_max").alias("orderkey_max"),
        F.min("p_min").alias("price_min"),
        F.max("p_max").alias("price_max"),
    )


ORACLE_ACID_STATS_ORDERS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS orderkey_min,
       MAX(o_orderkey) AS orderkey_max,
       MIN(o_totalprice) AS price_min,
       MAX(o_totalprice) AS price_max
FROM orders
"""


register("acid_stats_orders", q_acid_stats_orders, ORACLE_ACID_STATS_ORDERS)


def q_txn_atomic_upsert_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table atomic transactions under the gate (sinks/txn.py):
    each batch MERGEs the facts table AND appends its audit row in ONE
    transaction — visible together or not at all. Two transactions
    commit; a third stages a poison batch (every price negated) plus
    its audit row and ABORTS — the oracle replays only the committed
    batches, so any leakage of the aborted stage (into facts OR audit)
    is a value mismatch, and the audit count woven into every output
    row pins cross-table consistency.

    100 TB posture: the decide point is one put-if-absent of an empty
    marker regardless of staged volume; staging is the normal
    file-pruned MERGE machinery."""
    from data_pipeline_platform_spark.sinks.txn import MultiTableTxn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    batch1 = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    ).unionByName(
        orders.filter(
            (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
        )
    )
    root = tempfile.mkdtemp(prefix="txn_gate_")
    facts = AcidTable(spark, f"{root}/facts")
    audit = AcidTable(spark, f"{root}/audit")
    coord = f"{root}/_txns"
    facts.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    audit.write(
        spark.createDataFrame([("base", 1)], "event string, seq long")
    )
    t1 = MultiTableTxn(coord)
    t1.stage_merge(facts, batch1, keys=["o_orderkey"])
    t1.stage_write(
        audit,
        spark.createDataFrame([("batch1", 2)], "event string, seq long"),
        mode="append",
    )
    t1.commit()
    doomed = facts.read().filter(F.col("o_orderkey") % 300 == 0)
    t2 = MultiTableTxn(coord)
    t2.stage_merge(facts, doomed, keys=["o_orderkey"], delete_matched=True)
    t2.stage_write(
        audit,
        spark.createDataFrame([("batch2", 3)], "event string, seq long"),
        mode="append",
    )
    t2.commit()
    poison = facts.read().select(
        "o_orderkey", "o_orderpriority", (-F.col("price_c")).alias("price_c")
    )
    t3 = MultiTableTxn(coord)
    t3.stage_merge(facts, poison, keys=["o_orderkey"])
    t3.stage_write(
        audit,
        spark.createDataFrame([("poison", 4)], "event string, seq long"),
        mode="append",
    )
    t3.abort()
    agg = facts.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("price_c") / 100.0).alias("sum_price"),
    )
    audit_n = audit.read().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_audit_events"),
        F.max("seq").alias("last_seq"),
    )
    return agg.crossJoin(F.broadcast(audit_n))


ORACLE_TXN_ATOMIC_UPSERT_AUDIT = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), after1 AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), after2 AS (
  SELECT * FROM after1 WHERE o_orderkey % 300 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       CAST(3 AS BIGINT) AS n_audit_events,
       CAST(3 AS BIGINT) AS last_seq
FROM after2
GROUP BY o_orderpriority
"""


register(
    "txn_atomic_upsert_audit",
    q_txn_atomic_upsert_audit,
    ORACLE_TXN_ATOMIC_UPSERT_AUDIT,
)


def q_fk_enforced_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time FOREIGN KEY enforcement with the quarantine pattern:
    facts carry FK(o_custkey) -> dim(c_custkey) where the dim holds only
    2/3 of the customers, so the raw insert wave contains real orphans.
    The whole wave is REFUSED (ConstraintViolationError — atomicity:
    nothing partial lands), then the ingest splits it: referentially
    clean rows append to facts, orphans land in a quarantine table with
    the violated key. The oracle replays the same split, so both the
    refusal (no orphan leaked into facts) and the quarantine census are
    value-graded. Preventive twin of the fk_orphan_profile audit.

    100 TB posture: the probe is |batch distinct keys| anti-joined
    against the dim's column-pruned distinct — batch-sized, never a
    fact-table scan."""
    from data_pipeline_platform_spark.sinks.acid import ConstraintViolationError

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    dim_rows = cust.filter(F.col("c_custkey") % 3 != 0)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    base = orders.filter(
        (F.col("o_orderkey") % 2 == 0) & (F.col("o_custkey") % 3 != 0)
    )
    wave = orders.filter(F.col("o_orderkey") % 2 == 1)

    root = tempfile.mkdtemp(prefix="fk_gate_")
    dim = AcidTable(spark, f"{root}/dim")
    dim.write(dim_rows)
    facts = AcidTable(spark, f"{root}/facts")
    facts.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    facts.add_fk_constraint("fk_cust", ["o_custkey"], dim, ["c_custkey"])
    quarantine = AcidTable(spark, f"{root}/quarantine")
    try:
        facts.write(wave, mode="append")
        raise AssertionError("orphan wave must be refused")
    except ConstraintViolationError:
        pass  # atomic refusal: facts untouched
    clean = wave.filter(F.col("o_custkey") % 3 != 0)
    orphans = wave.filter(F.col("o_custkey") % 3 == 0)
    facts.write(clean, mode="append")
    quarantine.write(orphans)
    agg = facts.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("price_c") / 100.0).alias("sum_price"),
    )
    qn = quarantine.read().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quarantined"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_orphan_custs"),
    )
    return agg.crossJoin(F.broadcast(qn))


ORACLE_FK_ENFORCED_INGEST = """
WITH facts AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
  WHERE (o_orderkey % 2 = 0 AND o_custkey % 3 <> 0)
     OR (o_orderkey % 2 = 1 AND o_custkey % 3 <> 0)
), quarantined AS (
  SELECT o_custkey FROM orders
  WHERE o_orderkey % 2 = 1 AND o_custkey % 3 = 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM quarantined) AS n_quarantined,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM quarantined)
         AS n_orphan_custs
FROM facts
GROUP BY o_orderpriority
"""


register("fk_enforced_ingest", q_fk_enforced_ingest, ORACLE_FK_ENFORCED_INGEST)


def q_merge_conditional_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE (the full WHEN MATCHED AND <cond> clause set,
    sinks/acid.py::merge_conditional): a price-refresh batch lands on
    the orders snapshot with

    - WHEN MATCHED AND s.price_c > t.price_c THEN UPDATE (only price
      RAISES apply — the late-arriving-stale-update guard),
    - WHEN MATCHED AND t.o_orderpriority = '1-URGENT' AND
      s.price_c < t.price_c THEN DELETE (urgent orders with a price
      DROP leave the book),
    - WHEN NOT MATCHED AND s.o_orderpriority <> '3-MEDIUM' THEN INSERT
      (medium-priority newcomers are filtered at the gate),

    all in ONE atomic commit; matched rows firing no clause stay
    byte-identical. The oracle replays the clause algebra in plain SQL,
    so wrong precedence (update vs delete), a dropped keep-row, or a
    leaked filtered insert is a value mismatch.

    100 TB posture: resolution is batch-keys broadcast-semi against the
    snapshot (candidate rows only), then the normal file-pruned MERGE —
    one commit, no extra fact scans. Reference analog: ON CONFLICT DO
    UPDATE (src/pipeline/persistence/batch_writer.py:118) is the
    unconditional special case."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    src = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (
            F.col("price_c")
            + F.when(F.col("o_orderkey") % 3 == 0, F.lit(500)).otherwise(
                F.lit(-500)
            )
        ).alias("price_c"),
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="merge_cond_"))
    table.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    table.merge_conditional(
        src,
        keys=["o_orderkey"],
        update_when="s.price_c > t.price_c",
        delete_when="t.o_orderpriority = '1-URGENT' AND s.price_c < t.price_c",
        insert_when="s.o_orderpriority <> '3-MEDIUM'",
    )
    return table.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("price_c") / 100.0).alias("sum_price"),
        (F.min("price_c") / 100.0).alias("min_price"),
    )


ORACLE_MERGE_CONDITIONAL_ORDERS = """
WITH cents AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
), base AS (
  SELECT * FROM cents WHERE o_orderkey % 2 = 0
), src AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 3 = 0 THEN 500 ELSE -500 END AS price_c
  FROM cents WHERE o_orderkey % 10 = 0
), matched AS (
  SELECT b.o_orderkey,
         b.o_orderpriority AS t_prio, b.price_c AS t_price,
         s.o_orderpriority AS s_prio, s.price_c AS s_price
  FROM base b JOIN src s USING (o_orderkey)
), final AS (
  SELECT o_orderkey, o_orderpriority, price_c FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT o_orderkey,
         CASE WHEN s_price > t_price THEN s_prio ELSE t_prio END,
         CASE WHEN s_price > t_price THEN s_price ELSE t_price END
  FROM matched
  WHERE s_price > t_price
     OR NOT (t_prio = '1-URGENT' AND s_price < t_price)
  UNION ALL
  SELECT s.o_orderkey, s.o_orderpriority, s.price_c FROM src s
  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM base)
    AND s.o_orderpriority <> '3-MEDIUM'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       MIN(price_c) / 100.0 AS min_price
FROM final
GROUP BY o_orderpriority
"""

register(
    "merge_conditional_orders",
    q_merge_conditional_orders,
    ORACLE_MERGE_CONDITIONAL_ORDERS,
)


def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup through the per-file BLOOM INDEX
    (sinks/acid.py::point_lookup): orders land in 8 files keyed so
    every file's [min, max] o_orderkey range covers every key — footer
    ranges prune NOTHING — and the lookup of 5 scattered keys must
    still return exactly the SQL `WHERE o_orderkey IN (...)` rows while
    scanning only bloom-surviving files (the skip is conservative:
    false positives add scans, never rows).

    100 TB posture: this is the needle-in-haystack read path — without
    a bloom a single-key lookup on a non-clustered column scans the
    table; with it, |files with the key| + fpp x |files|."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="bloom_pl_"))
    # interleave: partition by key % 8, so each file spans the whole
    # key range and only the bloom can skip
    table.write(
        orders.withColumn("__p", (F.col("o_orderkey") % 8).cast("int"))
        .repartition(8, "__p")
        .drop("__p"),
        stats_cols=["o_orderkey"],
        bloom_cols=["o_orderkey"],
        binpack=False,
    )
    keys = [1, 7, 322, 961, 1383]
    return table.point_lookup("o_orderkey", keys).select(
        "o_orderkey", "o_orderpriority", (F.col("price_c") / 100.0).alias("price")
    )


ORACLE_BLOOM_POINT_LOOKUP = """
SELECT o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS price
FROM orders
WHERE o_orderkey IN (1, 7, 322, 961, 1383)
"""

register("bloom_point_lookup", q_bloom_point_lookup, ORACLE_BLOOM_POINT_LOOKUP)


def q_dv_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes under the gate (sinks/acid.py deletion
    vectors — the Delta DV / Iceberg position-delete shape): two
    selective DELETEs publish position sidecars and re-add the SAME
    data files (zero data rewritten — at 100 TB this is the difference
    between a metadata write and rewriting every touched 128 MiB file),
    the second wave ACCUMULATING onto the first's vectors; then a MERGE
    rides over the DV'd files — updated live keys take the source row,
    DV-deleted keys must NOT resurrect as survivors (the DV-aware merge
    scan), while source rows naming deleted keys re-insert. The oracle
    replays delete-delete-merge as plain SQL, so a positional miss
    anywhere (wrong row dead, dead row resurrected, stale read) is a
    value mismatch."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="dv_delete_orders_"))
    table.write(
        orders.repartition(4, "o_orderkey"),
        stats_cols=["o_orderkey"],
        binpack=False,
    )
    table.delete("o_orderkey % 10 = 3", mode="dv")
    table.delete("o_custkey % 7 = 2", mode="dv")
    src = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(2.0)).alias("o_totalprice"),
    )
    table.merge(src, keys=["o_orderkey"])
    return table.read().select("o_orderkey", "o_custkey", "o_totalprice")


ORACLE_DV_DELETE_ORDERS = """
WITH d2 AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE NOT (o_orderkey % 10 = 3) AND NOT (o_custkey % 7 = 2)
),
src AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 2.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey,
       COALESCE(s.o_custkey, b.o_custkey) AS o_custkey,
       COALESCE(s.o_totalprice, b.o_totalprice) AS o_totalprice
FROM d2 b FULL JOIN src s USING (o_orderkey)
"""

register("dv_delete_orders", q_dv_delete_orders, ORACLE_DV_DELETE_ORDERS)


def q_dv_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed ACROSS merge-on-read deletes: a DV delete
    re-publishes the same data path under a new sidecar, so the CDF
    diff must key on (path, deletion-vector) IDENTITY — a path-only
    diff would see "nothing changed" and emit an empty (or crashing)
    feed while rows died. Both DV waves land in one span; the feed must
    be exactly the union of the dead rows, tagged delete, with every
    surviving row suppressed."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="dv_change_feed_"))
    table.write(
        orders.repartition(4, "o_orderkey"),
        stats_cols=["o_orderkey"],
        binpack=False,
    )
    table.delete("o_orderkey % 10 = 3", mode="dv")
    table.delete("o_custkey % 7 = 2", mode="dv")
    return table.changes(["o_orderkey"], v_from=1, v_to=3)


ORACLE_DV_CHANGE_FEED = """
SELECT 'delete' AS change_type, o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderkey % 10 = 3
   OR (NOT (o_orderkey % 10 = 3) AND o_custkey % 7 = 2)
"""

register("dv_change_feed", q_dv_change_feed, ORACLE_DV_CHANGE_FEED)


def _cdc_events(spark: SparkSession, sf_dir: str):
    """Deterministic CDC event stream derived from orders: inserts for
    every key divisible by 3 (seq 10), updates for keys divisible by 6
    (seq 20, price+5), deletes for keys divisible by 12 (seq 30), and a
    STALE update wave (seq 5, price+99) for keys divisible by 9 — the
    events a correct sequence-keyed apply must suppress."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    k3 = orders.filter(F.col("o_orderkey") % 3 == 0)
    inserts = k3.select(
        "o_orderkey",
        F.lit(10).alias("seq"),
        F.lit("U").alias("op"),
        F.col("o_totalprice").alias("price"),
    )
    updates = k3.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        F.lit(20).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(5.0)).alias("price"),
    )
    deletes = k3.filter(F.col("o_orderkey") % 12 == 0).select(
        "o_orderkey",
        F.lit(30).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    stale = k3.filter(F.col("o_orderkey") % 9 == 0).select(
        "o_orderkey",
        F.lit(5).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(99.0)).alias("price"),
    )
    return inserts, updates, deletes, stale


def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES, physical-delete mode (sinks/cdc.py): three
    in-order batches fold into an AcidTable keyed on a sequence column
    — batch 3 delivers a LATE, STALE update wave (lower sequence than
    what the table already holds) that a naive last-write-wins apply
    would smear over live rows; the sequence-conditional merge must
    suppress every one of it. The stale wave is restricted to keys not
    physically deleted (the tombstone twin below covers that case).
    Oracle: per-key argmax by (seq, delete-wins) over ALL events,
    deletes dropped — the batch fold must equal the one-shot rule."""
    from data_pipeline_platform_spark.sinks.cdc import apply_changes

    inserts, updates, deletes, stale = _cdc_events(spark, sf_dir)
    stale = stale.filter(F.col("o_orderkey") % 12 != 0)
    table = AcidTable(spark, tempfile.mkdtemp(prefix="cdc_apply_orders_"))
    apply_changes(table, inserts, keys=["o_orderkey"], sequence_by="seq")
    apply_changes(
        table, updates.unionByName(deletes),
        keys=["o_orderkey"], sequence_by="seq",
    )
    apply_changes(table, stale, keys=["o_orderkey"], sequence_by="seq")
    return table.read().select("o_orderkey", "seq", "op", "price")


ORACLE_CDC_EVENTS = """
  SELECT o_orderkey, 10 AS seq, 'U' AS op, o_totalprice AS price
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 20, 'U', o_totalprice + 5.0
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, 30, 'D', NULL
  FROM orders WHERE o_orderkey % 12 = 0
  UNION ALL
  SELECT o_orderkey, 5, 'U', o_totalprice + 99.0
  FROM orders WHERE o_orderkey % 9 = 0 {stale_extra}
"""

ORACLE_CDC_APPLY_ORDERS = f"""
WITH events AS ({ORACLE_CDC_EVENTS.format(stale_extra="AND o_orderkey % 12 != 0")}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY seq DESC, (op = 'D') DESC
  ) AS rn
  FROM events
)
SELECT o_orderkey, seq, op, price
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

register("cdc_apply_orders", q_cdc_apply_orders, ORACLE_CDC_APPLY_ORDERS)


def q_cdc_tombstone_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES, tombstone mode, batches delivered OUT OF
    ORDER (deletes first, then inserts, then updates+stale): a
    physical apply would resurrect deleted keys when their insert
    arrives after the delete; tombstone rows carry the delete's
    sequence forever, so the final current state is independent of
    batching — pure per-key argmax by sequence, which is exactly what
    the oracle computes."""
    from data_pipeline_platform_spark.sinks.cdc import (
        apply_changes,
        read_current,
    )

    inserts, updates, deletes, stale = _cdc_events(spark, sf_dir)
    table = AcidTable(spark, tempfile.mkdtemp(prefix="cdc_tombstone_"))
    for batch in (deletes, inserts, updates.unionByName(stale)):
        apply_changes(
            table, batch, keys=["o_orderkey"], sequence_by="seq",
            tombstones=True,
        )
    return read_current(table).select("o_orderkey", "seq", "op", "price")


ORACLE_CDC_TOMBSTONE_ORDERS = f"""
WITH events AS ({ORACLE_CDC_EVENTS.format(stale_extra="")}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY seq DESC, (op = 'D') DESC
  ) AS rn
  FROM events
)
SELECT o_orderkey, seq, op, price
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

register(
    "cdc_tombstone_orders", q_cdc_tombstone_orders, ORACLE_CDC_TOMBSTONE_ORDERS
)


def q_keyindex_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary key index under the gate (sinks/keyindex.py): orders
    land range-clustered by o_orderkey (so footer stats on the probe
    column o_custkey are WIDE OPEN — every file spans the custkey
    domain and min/max pruning is useless, the exact case a secondary
    index exists for), a KeyIndex is built on o_custkey, a MERGE wave
    rewrites some files, the index refreshes INCREMENTALLY (only the
    delta files are re-scanned), and a custkey RANGE lookup — which a
    bloom cannot answer — must return exactly the post-merge rows the
    oracle's plain filter computes."""
    from data_pipeline_platform_spark.sinks.keyindex import KeyIndex

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="keyindex_")
    table = AcidTable(spark, base + "/data")
    table.write(
        orders.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey"),
        stats_cols=["o_orderkey"],
        binpack=False,
    )
    index = KeyIndex(table, "o_custkey", base + "/idx")
    index.build()
    src = orders.filter(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(3.0)).alias("o_totalprice"),
    )
    table.merge(src, keys=["o_orderkey"])
    index.refresh()
    return index.lookup_range(100, 150).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


ORACLE_KEYINDEX_RANGE_LOOKUP = """
WITH merged AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 200 = 0 THEN o_totalprice + 3.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM merged WHERE o_custkey >= 100 AND o_custkey <= 150
"""

register(
    "keyindex_range_lookup", q_keyindex_range_lookup,
    ORACLE_KEYINDEX_RANGE_LOOKUP,
)


def q_merge_sync_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN NOT MATCHED BY SOURCE (sinks/acid.py merge_conditional):
    the full-sync/mirror merge — matched rows take the source, new
    source keys insert, and TARGET rows absent from the source are
    deleted WHEN they satisfy a condition over the target row (here:
    only cheap orphans are purged; expensive ones survive the sync).
    One atomic commit; the oracle expresses the same resolution as a
    FULL JOIN with the orphan predicate."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    src = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    table = AcidTable(spark, tempfile.mkdtemp(prefix="merge_sync_"))
    table.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    table.merge_conditional(
        src,
        keys=["o_orderkey"],
        not_matched_by_source_delete_when="t.o_totalprice < 50000",
    )
    return table.read().select("o_orderkey", "o_custkey", "o_totalprice")


ORACLE_MERGE_SYNC_MIRROR = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderkey % 2 = 0
),
src AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT o_orderkey,
       COALESCE(s.o_custkey, b.o_custkey) AS o_custkey,
       COALESCE(s.o_totalprice, b.o_totalprice) AS o_totalprice
FROM base b FULL JOIN src s USING (o_orderkey)
WHERE s.o_custkey IS NOT NULL OR NOT (b.o_totalprice < 50000)
"""

register("merge_sync_mirror", q_merge_sync_mirror, ORACLE_MERGE_SYNC_MIRROR)


def q_wap_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish under the gate (sinks/wap.py): three ingest
    waves stage invisibly under single-table transactions; the DQ rule
    set audits EXACTLY the staged files and the atomic decide publishes
    or aborts. Wave B carries negated prices that violate the in_range
    rule — it must vanish without ever being readable; the oracle
    replays only the accepted waves, so any leakage of the aborted
    stage (or a lost accepted wave) is a value mismatch."""
    from data_pipeline_platform_spark.sinks.wap import write_audit_publish

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    rules = [
        {"rule": "in_range", "column": "o_totalprice",
         "min": 0.0, "max": 1e7},
        {"rule": "not_null", "column": "o_custkey"},
    ]
    table = AcidTable(spark, tempfile.mkdtemp(prefix="wap_gated_"))
    coord = tempfile.mkdtemp(prefix="wap_coord_")
    wave_a = orders.filter(F.col("o_orderkey") % 3 == 0)
    wave_b = orders.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_custkey") % 5 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    wave_c = orders.filter(F.col("o_orderkey") % 3 == 2)
    outcomes = [
        write_audit_publish(table, w, rules, coordinator_dir=coord,
                            stats_cols=["o_orderkey"])
        for w in (wave_a, wave_b, wave_c)
    ]
    assert [o["published"] for o in outcomes] == [True, False, True]
    return table.read().select("o_orderkey", "o_custkey", "o_totalprice")


ORACLE_WAP_GATED_INGEST = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderkey % 3 = 0 OR o_orderkey % 3 = 2
"""

register("wap_gated_ingest", q_wap_gated_ingest, ORACLE_WAP_GATED_INGEST)


def q_merge_update_set_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-column MERGE (sinks/acid.py merge_update_set — the Delta
    UPDATE SET refinement of the reference's whole-row ON CONFLICT):
    a delta batch INCREMENTS matched balances (t.balance_c +
    s.delta_c) while every unlisted column keeps its stored value, and
    unmatched delta rows insert with their delta as the opening
    balance. Two waves accumulate — a whole-row merge would wipe the
    first wave's increments; the oracle folds both deltas over the
    base in SQL, so any column bleed or lost increment is a value
    mismatch."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "balance_c"
        ),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    table = AcidTable(spark, tempfile.mkdtemp(prefix="merge_set_"))
    table.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    d1 = orders.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", F.lit(500).cast("bigint").alias("delta_c")
    )
    d2 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.lit(250).cast("bigint").alias("delta_c")
    )
    for d in (d1, d2):
        table.merge_update_set(
            d,
            keys=["o_orderkey"],
            set_exprs={"balance_c": "t.balance_c + s.delta_c"},
            insert_defaults={
                "balance_c": "s.delta_c",
                "o_orderpriority": "'NEW'",
            },
        )
    return table.read().select(
        "o_orderkey", "o_orderpriority", "balance_c"
    )


ORACLE_MERGE_UPDATE_SET_ORDERS = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS balance_c
  FROM orders WHERE o_orderkey % 2 = 0
), d1 AS (
  SELECT o_orderkey, 500 AS delta_c FROM orders WHERE o_orderkey % 4 = 0
), s1 AS (
  SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS o_orderkey,
         CASE WHEN b.o_orderkey IS NULL THEN 'NEW'
              ELSE b.o_orderpriority END AS o_orderpriority,
         CASE WHEN b.o_orderkey IS NULL THEN d.delta_c
              WHEN d.o_orderkey IS NULL THEN b.balance_c
              ELSE b.balance_c + d.delta_c END AS balance_c
  FROM base b FULL JOIN d1 d ON b.o_orderkey = d.o_orderkey
), d2 AS (
  SELECT o_orderkey, 250 AS delta_c FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(s.o_orderkey, d.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NULL THEN 'NEW'
            ELSE s.o_orderpriority END AS o_orderpriority,
       CASE WHEN s.o_orderkey IS NULL THEN d.delta_c
            WHEN d.o_orderkey IS NULL THEN s.balance_c
            ELSE s.balance_c + d.delta_c END AS balance_c
FROM s1 s FULL JOIN d2 d ON s.o_orderkey = d.o_orderkey
"""

register(
    "merge_update_set_orders", q_merge_update_set_orders,
    ORACLE_MERGE_UPDATE_SET_ORDERS,
)
