"""Medallion-architecture graded surface: min/max under the change
feed, and the silver→gold second hop (extension; no reference
counterpart — the reference recomputes every aggregate from scratch
per run, see SURVEY.md §2.11).

- ``cdf_minmax_view``: the bronze→silver hop where the silver view
  carries MIN/MAX aggregates through a retracting change feed. The
  delete commit removes every priority group's CURRENT maximum-price
  rows (plus key churn), so the stored extremes are invalidated and
  ``MaterializedAgg.update_changes`` must re-aggregate exactly the
  threatened groups from the version-pinned bronze snapshot
  (sinks/matview.py: touched-group recompute). The drained silver
  state must bitwise-equal the one-shot groupBy over the FINAL bronze
  snapshot — which is what the oracle computes from plain SQL.
- ``medallion_two_hop``: bronze→silver→gold — the silver view's own
  backing ACID table is itself a change-feed source, and a second
  ``ChangeFeedConsumer`` folds silver's row-level changes into a gold
  rollup (customer buckets), each hop's progress marker inside its own
  atomic commit (exactly-once per hop, so exactly-once end-to-end).
  Gold's ``n_active_custs`` is a signed fold of the has-orders
  INDICATOR — a non-linear function of silver state that only the
  preimage/postimage algebra can maintain incrementally.

Scale: each hop's cost is the size of the files the upstream commit
touched, never the table; the min/max recompute adds one column-pruned
snapshot scan restricted by a broadcast semi-join, and ONLY on folds
where a retraction ties-or-beats a stored extreme. Gold's input is the
silver state (|customer groups| rows), so the second hop is
dimension-sized regardless of fact volume.

Determinism: every aggregate is exact integer (cents), divisions by
100.0 happen once at the read edge on identical BIGINTs in both
engines.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.sources.readers import load_table
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer


def _orders_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )


def q_cdf_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver with MIN/MAX in the silver view: base write, ON-
    CONFLICT merge (updates + inserts), then a delete that removes each
    priority group's current max-price rows AND every 300th key — the
    exact scenario update_changes' touched-group recompute exists for
    (the retracted value WAS the stored extreme; a surviving duplicate
    can only be found by re-aggregating the group from bronze)."""
    orders = _orders_cents(spark, sf_dir).drop("o_custkey")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="cdfmm_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="cdfmm_silver_"),
        keys=["o_orderpriority"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("min_price_c", "min", "price_c"),
            ("max_price_c", "max", "price_c"),
        ],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=view, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    consumer.process_available()
    # doom every group's CURRENT max-price rows (all ties) + key churn
    snap = bronze.read()
    gmax = snap.groupBy("o_orderpriority").agg(F.max("price_c").alias("__mx"))
    doomed = (
        snap.join(F.broadcast(gmax), "o_orderpriority")
        .filter((F.col("price_c") == F.col("__mx")) | (F.col("o_orderkey") % 300 == 0))
        .select(*snap.columns)
    )
    bronze.merge(doomed, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    return consumer.state().select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
        (F.col("min_price_c") / 100.0).alias("min_price"),
        (F.col("max_price_c") / 100.0).alias("max_price"),
    )


ORACLE_CDF_MINMAX_VIEW = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), ins AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), merged AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), gmax AS (
  SELECT o_orderpriority, MAX(price_c) AS mx FROM merged GROUP BY 1
), kept AS (
  SELECT m.* FROM merged m JOIN gmax g USING (o_orderpriority)
  WHERE NOT (m.price_c = g.mx OR m.o_orderkey % 300 = 0)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       MIN(price_c) / 100.0 AS min_price,
       MAX(price_c) / 100.0 AS max_price
FROM kept
GROUP BY o_orderpriority
"""

register("cdf_minmax_view", q_cdf_minmax_view, ORACLE_CDF_MINMAX_VIEW)


def q_medallion_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained exactly-once hops: bronze orders → silver per-customer
    count/sum → gold per-bucket rollup. The gold consumer reads the
    SILVER view's own ACID change feed (silver state rows are unique by
    customer key, so they diff cleanly), derives its group key and the
    has-orders indicator with a row-local feed_transform, and folds
    preimage/postimage pairs — so a customer whose orders fully retract
    moves gold's n_active_custs down by exactly one while n_custs_seen
    (silver state rows ever created — zero-count rows persist by the
    single-commit-atomicity contract) stays."""
    orders = _orders_cents(spark, sf_dir).drop("o_orderpriority")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    deletes = base.filter(F.col("o_orderkey") % 300 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="m2h_bronze_"))
    silver = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="m2h_silver_"),
        keys=["o_custkey"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    hop1 = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=silver, count_col="n_orders"
    )
    gold = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="m2h_gold_"),
        keys=["cust_bucket"],
        aggs=[
            ("n_custs_seen", "count", ""),
            ("n_active_custs", "sum", "has_orders"),
            ("total_orders", "sum", "n_orders"),
            ("total_price_c", "sum", "sum_price_c"),
        ],
    )
    hop2 = ChangeFeedConsumer(
        silver.acid,
        source_keys=["o_custkey"],
        view=gold,
        count_col="n_custs_seen",
        feed_transform=lambda df: df.withColumn(
            "cust_bucket", F.col("o_custkey") % 10
        ).withColumn(
            "has_orders", (F.col("n_orders") > 0).cast("bigint")
        ),
    )
    for commit in (
        lambda: bronze.write(
            base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"]
        ),
        lambda: bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"]),
        lambda: bronze.merge(deletes, keys=["o_orderkey"], delete_matched=True),
    ):
        commit()
        hop1.process_available()
        hop2.process_available()
    return hop2.state().select(
        "cust_bucket",
        "n_custs_seen",
        "n_active_custs",
        "total_orders",
        (F.col("total_price_c") / 100.0).alias("total_price"),
    )


ORACLE_MEDALLION_TWO_HOP = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_custkey,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), kept AS (
  SELECT * FROM upd WHERE o_orderkey % 300 <> 0
), ins AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), final AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
), seen AS (
  SELECT DISTINCT o_custkey FROM (
    SELECT o_custkey FROM base UNION ALL SELECT o_custkey FROM ins
  )
), silver AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(price_c) AS sum_price_c
  FROM final GROUP BY 1
)
SELECT b.cust_bucket,
       b.n_custs_seen,
       COALESCE(g.n_active_custs, 0) AS n_active_custs,
       COALESCE(g.total_orders, 0) AS total_orders,
       COALESCE(g.total_price_c, 0) / 100.0 AS total_price
FROM (
  SELECT o_custkey % 10 AS cust_bucket, CAST(COUNT(*) AS BIGINT) AS n_custs_seen
  FROM seen GROUP BY 1
) b
LEFT JOIN (
  SELECT o_custkey % 10 AS cust_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_active_custs,
         CAST(SUM(n_orders) AS BIGINT) AS total_orders,
         CAST(SUM(sum_price_c) AS BIGINT) AS total_price_c
  FROM silver GROUP BY 1
) g USING (cust_bucket)
"""

register("medallion_two_hop", q_medallion_two_hop, ORACLE_MEDALLION_TWO_HOP)


def q_matview_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained JOIN view (sinks/joinview.py): silver =
    bronze orders ⋈ customer dim (inner). The update commit moves some
    orders to NEW customers — including custkey 0, which matches no
    customer, so those rows must LEAVE the inner-join view (the
    postimage-anti-dim delete path) — and the delete commit removes
    keys outright. Every fold costs |changed rows| ⋈ broadcast dim plus
    a touched-files-only state rewrite in ONE atomic commit (upserts +
    deletes together); the final state must equal the one-shot join
    over the final bronze snapshot."""
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin

    orders = _orders_cents(spark, sf_dir).drop("o_orderpriority")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    # updates: +100 price; every 500th key reassigns to custkey 0 (no
    # such customer — the row leaves the view), the rest of the %100
    # keys reassign to a low custkey (guaranteed present in the dim)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 500 == 0, F.lit(0))
        .otherwise((F.col("o_orderkey") % 7) + 1)
        .alias("o_custkey"),
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    deletes = base.filter(F.col("o_orderkey") % 300 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mvj_bronze_"))
    view = MaterializedJoin(
        spark,
        tempfile.mkdtemp(prefix="mvj_silver_"),
        row_keys=["o_orderkey"],
        dim=customer,
        on=[("o_custkey", "c_custkey")],
        how="inner",
    )
    consumer = ChangeFeedConsumer(bronze, source_keys=["o_orderkey"], view=view)
    for commit in (
        lambda: bronze.write(
            base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"]
        ),
        lambda: bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"]),
        lambda: bronze.merge(deletes, keys=["o_orderkey"], delete_matched=True),
    ):
        commit()
        consumer.process_available()
    return consumer.state().select(
        "o_orderkey",
        "o_custkey",
        (F.col("price_c") / 100.0).alias("price"),
        "c_mktsegment",
        "c_nationkey",
    )


ORACLE_MATVIEW_JOIN_ORDERS_CUSTOMER = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN
           CASE WHEN o_orderkey % 500 = 0 THEN 0
                ELSE (o_orderkey % 7) + 1 END
         ELSE o_custkey END AS o_custkey,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), kept AS (
  SELECT * FROM upd WHERE o_orderkey % 300 <> 0
), ins AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), final AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT f.o_orderkey, f.o_custkey, f.price_c / 100.0 AS price,
       c.c_mktsegment, c.c_nationkey
FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
"""

register(
    "matview_join_orders_customer",
    q_matview_join_orders_customer,
    ORACLE_MATVIEW_JOIN_ORDERS_CUSTOMER,
)


def q_matview_join_dim_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-side churn through the join view
    (``MaterializedJoin.update_dim_changes``): the customer dim is
    itself an ACID table taking three commits — segment renames, GDPR
    deletes, partial re-inserts — and a dim-side ChangeFeedConsumer
    folds each into the orders⋈customer LEFT view FROM STATE ALONE
    (bronze is written once and never re-read). Deleted customers NULL
    their orders' dim columns; re-inserted ones revive them — the two
    cases an inner view cannot maintain, which is why the class refuses
    inner here. Final state must equal the one-shot LEFT join of bronze
    against the final dim."""
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin

    orders = _orders_cents(spark, sf_dir).drop("o_orderpriority")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mvd_bronze_"))
    dim = AcidTable(spark, tempfile.mkdtemp(prefix="mvd_dim_"))
    dim.write(customer.repartition(2, "c_custkey"), stats_cols=["c_custkey"])
    view = MaterializedJoin(
        spark,
        tempfile.mkdtemp(prefix="mvd_silver_"),
        row_keys=["o_orderkey"],
        dim=lambda: dim.read(),  # live snapshot for any bronze-side fold
        on=[("o_custkey", "c_custkey")],
        how="left",
    )
    rows_c = ChangeFeedConsumer(bronze, source_keys=["o_orderkey"], view=view)
    dim_c = ChangeFeedConsumer(
        dim, source_keys=["c_custkey"], view=view, dim_side=True
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    rows_c.process_available()
    # the view was built against dim v1; start the dim consumer there
    # rather than replaying the initial full-insert feed as churn
    assert dim_c.last_processed_version() == 0
    renames = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("CHURNED").alias("c_mktsegment"), "c_nationkey"
    )
    deletes = customer.filter(F.col("c_custkey") % 7 == 0)
    reinserts = customer.filter(F.col("c_custkey") % 14 == 0).select(
        "c_custkey", F.lit("REBORN").alias("c_mktsegment"), "c_nationkey"
    )
    # fold the v1->v2 span only (v0->v1 is the initial load the view
    # already reflects): publish a no-op marker first
    view.acid._commit(
        view.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_c.stream_id, "batch_id": 1},
    )
    for commit in (
        lambda: dim.merge(renames, keys=["c_custkey"]),
        lambda: dim.merge(deletes, keys=["c_custkey"], delete_matched=True),
        lambda: dim.merge(reinserts, keys=["c_custkey"]),
    ):
        commit()
        dim_c.process_available()
    return dim_c.state().select(
        "o_orderkey",
        "o_custkey",
        (F.col("price_c") / 100.0).alias("price"),
        "c_mktsegment",
        "c_nationkey",
    )


ORACLE_MATVIEW_JOIN_DIM_CHURN = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), fdim AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 14 = 0 THEN 'REBORN'
              WHEN c_custkey % 10 = 0 THEN 'CHURNED'
              ELSE c_mktsegment END AS c_mktsegment,
         c_nationkey
  FROM customer
  WHERE c_custkey % 7 <> 0 OR c_custkey % 14 = 0
)
SELECT b.o_orderkey, b.o_custkey, b.price_c / 100.0 AS price,
       d.c_mktsegment, d.c_nationkey
FROM base b LEFT JOIN fdim d ON b.o_custkey = d.c_custkey
"""

register(
    "matview_join_dim_churn",
    q_matview_join_dim_churn,
    ORACLE_MATVIEW_JOIN_DIM_CHURN,
)


def q_medallion_join_then_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic star-schema medallion: bronze orders → silver
    ENRICHMENT JOIN (orders ⋈ customer, left) → gold AGGREGATE
    (revenue per market segment) — a JOIN view's own ACID change feed
    driving a retracting aggregate view, each hop exactly-once. The
    custkey-0 reassignment sends rows to the NULL-segment group (left
    join), exercising the null-safe group fold end-to-end; deletes
    retract through BOTH hops. Gold must equal the one-shot
    join+groupBy over the final bronze."""
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin

    orders = _orders_cents(spark, sf_dir).drop("o_orderpriority")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 500 == 0, F.lit(0))
        .otherwise((F.col("o_orderkey") % 7) + 1)
        .alias("o_custkey"),
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    deletes = base.filter(F.col("o_orderkey") % 300 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mja_bronze_"))
    silver = MaterializedJoin(
        spark,
        tempfile.mkdtemp(prefix="mja_silver_"),
        row_keys=["o_orderkey"],
        dim=customer,
        on=[("o_custkey", "c_custkey")],
        how="left",
    )
    hop1 = ChangeFeedConsumer(bronze, source_keys=["o_orderkey"], view=silver)
    gold = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mja_gold_"),
        keys=["c_mktsegment"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    hop2 = ChangeFeedConsumer(
        silver.acid,
        source_keys=["o_orderkey"],
        view=gold,
        count_col="n_orders",
    )
    for commit in (
        lambda: bronze.write(
            base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"]
        ),
        lambda: bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"]),
        lambda: bronze.merge(deletes, keys=["o_orderkey"], delete_matched=True),
    ):
        commit()
        hop1.process_available()
        hop2.process_available()
    return hop2.state().select(
        "c_mktsegment",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
    )


ORACLE_MEDALLION_JOIN_THEN_AGG = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN
           CASE WHEN o_orderkey % 500 = 0 THEN 0
                ELSE (o_orderkey % 7) + 1 END
         ELSE o_custkey END AS o_custkey,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), kept AS (
  SELECT * FROM upd WHERE o_orderkey % 300 <> 0
), ins AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), final AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(f.price_c) / 100.0 AS sum_price
FROM final f LEFT JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

register(
    "medallion_join_then_agg",
    q_medallion_join_then_agg,
    ORACLE_MEDALLION_JOIN_THEN_AGG,
)


def q_medallion_dim_churn_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full maintenance matrix in one chain: a CHURNING DIMENSION
    ripples through the silver join view (dim-side folds from state
    alone) and on through the gold aggregate (the join view's change
    feed retracts rows from their old segment group and adds them to
    the new one — including into the NULL-segment group when their
    customer is deleted, and back out when re-inserted). Bronze is
    written once and never re-read; gold must equal the one-shot
    join+groupBy of static bronze against the FINAL dim."""
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin

    orders = _orders_cents(spark, sf_dir).drop("o_orderpriority")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)

    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mdr_bronze_"))
    dim = AcidTable(spark, tempfile.mkdtemp(prefix="mdr_dim_"))
    dim.write(customer, stats_cols=["c_custkey"])
    silver = MaterializedJoin(
        spark,
        tempfile.mkdtemp(prefix="mdr_silver_"),
        row_keys=["o_orderkey"],
        dim=lambda: dim.read(),
        on=[("o_custkey", "c_custkey")],
        how="left",
    )
    hop1 = ChangeFeedConsumer(bronze, source_keys=["o_orderkey"], view=silver)
    dim_c = ChangeFeedConsumer(
        dim, source_keys=["c_custkey"], view=silver, dim_side=True
    )
    gold = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mdr_gold_"),
        keys=["c_mktsegment"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    hop2 = ChangeFeedConsumer(
        silver.acid, source_keys=["o_orderkey"], view=gold, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    hop1.process_available()
    hop2.process_available()
    silver.acid._commit(
        silver.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_c.stream_id, "batch_id": 1},
    )
    renames = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("CHURNED").alias("c_mktsegment")
    )
    deletes = customer.filter(F.col("c_custkey") % 7 == 0)
    reinserts = customer.filter(F.col("c_custkey") % 14 == 0).select(
        "c_custkey", F.lit("REBORN").alias("c_mktsegment")
    )
    for commit in (
        lambda: dim.merge(renames, keys=["c_custkey"]),
        lambda: dim.merge(deletes, keys=["c_custkey"], delete_matched=True),
        lambda: dim.merge(reinserts, keys=["c_custkey"]),
    ):
        commit()
        dim_c.process_available()
        hop2.process_available()
    return hop2.state().select(
        "c_mktsegment",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
    )


ORACLE_MEDALLION_DIM_CHURN_ROLLUP = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), fdim AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 14 = 0 THEN 'REBORN'
              WHEN c_custkey % 10 = 0 THEN 'CHURNED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
  WHERE c_custkey % 7 <> 0 OR c_custkey % 14 = 0
)
SELECT d.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(b.price_c) / 100.0 AS sum_price
FROM base b LEFT JOIN fdim d ON b.o_custkey = d.c_custkey
GROUP BY d.c_mktsegment
"""

register(
    "medallion_dim_churn_rollup",
    q_medallion_dim_churn_rollup,
    ORACLE_MEDALLION_DIM_CHURN_ROLLUP,
)


def q_medallion_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze evolves mid-stream and the silver hop rides it: the base
    commit has no ``o_channel`` column; a later append widens the
    schema (``merge_schema=True``); a backfill MERGE then rewrites
    pre-evolution files, moving rows out of the NULL-channel group.
    The consumer's row-local ``feed_transform`` normalizes the one
    pre-evolution span (typed-NULL fill) — every later span reads at
    the destination version's logged schema, so preimages of
    pre-evolution rows surface ``o_channel`` as NULL automatically.
    MIN in the view forces the touched-group recompute to run against
    a post-evolution pinned snapshot. Silver state must equal the
    one-shot groupBy over the final bronze snapshot.

    100 TB posture: identical to cdf_incremental_view — per-span cost
    is the touched files, and schema evolution adds ZERO data motion
    (old files are never rewritten for the new column; they read as
    NULL through the logged-schema pin)."""
    orders = _orders_cents(spark, sf_dir).drop("o_custkey")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    evolved_inserts = (
        orders.filter((F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 3 == 0))
        .withColumn(
            "o_channel",
            F.when(F.col("o_orderkey") % 10 < 5, F.lit("web")).otherwise(
                F.lit("store")
            ),
        )
    )
    backfill = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
        F.lit("backfill").alias("o_channel"),
    )
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mse_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mse_silver_"),
        keys=["o_channel"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("min_price_c", "min", "price_c"),
        ],
    )

    def _normalize(df: DataFrame) -> DataFrame:
        # the one schema-aware seam: the pre-evolution span's feed has
        # no o_channel column; later spans (and recompute snapshots)
        # already carry it via the logged-schema pin
        if "o_channel" not in df.columns:
            df = df.withColumn("o_channel", F.lit(None).cast("string"))
        return df

    consumer = ChangeFeedConsumer(
        bronze,
        source_keys=["o_orderkey"],
        view=view,
        count_col="n_orders",
        feed_transform=_normalize,
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()  # pre-evolution span
    bronze.write(
        evolved_inserts, mode="append", merge_schema=True, stats_cols=["o_orderkey"]
    )
    consumer.process_available()  # the widening span
    bronze.merge(backfill, keys=["o_orderkey"])
    consumer.process_available()  # cross-group retraction NULL -> 'backfill'
    return consumer.state().select(
        "o_channel",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
        (F.col("min_price_c") / 100.0).alias("min_price"),
    )


ORACLE_MEDALLION_SCHEMA_EVOLUTION = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), final AS (
  SELECT o_orderkey,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c,
         CASE WHEN o_orderkey % 100 = 0 THEN 'backfill' ELSE NULL END AS o_channel
  FROM base
  UNION ALL
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
         CASE WHEN o_orderkey % 10 < 5 THEN 'web' ELSE 'store' END AS o_channel
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0
)
SELECT o_channel,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       MIN(price_c) / 100.0 AS min_price
FROM final
GROUP BY o_channel
"""

register(
    "medallion_schema_evolution",
    q_medallion_schema_evolution,
    ORACLE_MEDALLION_SCHEMA_EVOLUTION,
)


def q_matview_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT COUNT(DISTINCT) as maintained silver state: per-priority
    distinct-customer counts ride the bronze change feed. Distinctness
    is not invertible — a retracted value may have a surviving twin, an
    inserted value may already be present — so every touched group
    recomputes from the version-pinned bronze snapshot (the same
    machinery MIN/MAX recompute uses, file-pruned by the broadcast
    group-key semi-join); count/sum in the same view keep the cheap
    signed fold. The update wave COLLAPSES customer keys (custkey % 50
    for every 100th order), so distinct counts genuinely drop while row
    counts do not — the case an approximate or fold-only maintenance
    would get wrong.

    100 TB posture: recompute cost is |touched groups| × their bronze
    footprint per feed, never a table scan; state stays |groups|."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        (F.col("o_custkey") % 50).alias("o_custkey"),
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mcd_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mcd_silver_"),
        keys=["o_orderpriority"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("n_custs", "count_distinct", "o_custkey"),
        ],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=view, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    consumer.process_available()
    doomed = bronze.read().filter(F.col("o_orderkey") % 300 == 0)
    bronze.merge(doomed, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    return consumer.state().select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
        "n_custs",
    )


ORACLE_MATVIEW_COUNTDISTINCT = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN o_custkey % 50
              ELSE o_custkey END AS o_custkey,
         o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), ins AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), merged AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), kept AS (
  SELECT * FROM merged WHERE o_orderkey % 300 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM kept
GROUP BY o_orderpriority
"""

register(
    "matview_countdistinct",
    q_matview_countdistinct,
    ORACLE_MATVIEW_COUNTDISTINCT,
)


def q_matview_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population VARIANCE as maintained silver state: the
    moment sums (count, Σx, Σx²) are all invertible, so the whole view
    rides the cheap signed fold — no recompute, ever, even under the
    delete wave. Σx² is carried as DECIMAL(38,0) (price²·rows overflows
    BIGINT well below 100 TB); variance closes from the exact integer
    moments with one double division per term, so both engines divide
    identical integers (the keyness.py discipline).

    100 TB posture: pure fold — per feed cost is |touched groups|, the
    state is |groups|; higher moments (skew/kurtosis) extend the same
    algebra with Σx³/Σx⁴ columns."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    ).withColumn(
        "price_sq",
        (F.col("price_c").cast("decimal(38,0)") * F.col("price_c")).cast(
            "decimal(38,0)"
        ),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_c") + F.lit(100)).alias("price_c"),
    ).withColumn(
        "price_sq",
        (F.col("price_c").cast("decimal(38,0)") * F.col("price_c")).cast(
            "decimal(38,0)"
        ),
    )
    inserts = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 501 == 0)
    )
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mvv_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mvv_silver_"),
        keys=["o_orderpriority"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("sum_price_sq", "sum", "price_sq"),
        ],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=view, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    consumer.process_available()
    doomed = bronze.read().filter(F.col("o_orderkey") % 300 == 0)
    bronze.merge(doomed, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    st = consumer.state()
    n = F.col("n_orders").cast("decimal(38,0)")
    s1 = F.col("sum_price_c").cast("decimal(38,0)")
    s2 = F.col("sum_price_sq")
    num = (n * s2 - s1 * s1).cast("decimal(38,0)")
    den = (n * n * F.lit(10000)).cast("decimal(38,0)")
    return st.select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c").cast("double")
         / (F.lit(100.0) * F.col("n_orders"))).alias("avg_price"),
        (num.cast("double") / den.cast("double")).alias("var_price"),
    )


ORACLE_MATVIEW_VARIANCE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), ins AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), merged AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), kept AS (
  SELECT * FROM merged WHERE o_orderkey % 300 <> 0
), moments AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(price_c) AS HUGEINT) AS s1,
         SUM(CAST(price_c AS HUGEINT) * price_c) AS s2
  FROM kept
  GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       CAST(s1 AS DOUBLE) / (100.0 * CAST(n AS BIGINT)) AS avg_price,
       CAST(n * s2 - s1 * s1 AS DOUBLE)
         / CAST(n * n * 10000 AS DOUBLE) AS var_price
FROM moments
"""

register("matview_variance", q_matview_variance, ORACLE_MATVIEW_VARIANCE)


def _churned_price_census(spark: SparkSession, sf_dir: str) -> MaterializedAgg:
    """The shared holistic-aggregate fixture: a (priority, price-cents)
    VALUE CENSUS maintained through base write + ON-CONFLICT merge +
    delete wave — the same churn every matview twin uses. Returns the
    census view; ``sinks/census.py`` derives median / percentiles /
    mode from its state at read time."""
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
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mmc_bronze_"))
    census = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mmc_census_"),
        keys=["o_orderpriority", "price_c"],
        aggs=[("n", "count", "")],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=census, count_col="n"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    consumer.process_available()
    doomed = bronze.read().filter(F.col("o_orderkey") % 300 == 0)
    bronze.merge(doomed, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    return census


def q_matview_median_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holistic aggregates (exact MEDIAN) as maintained state: no fold
    algebra exists for the median, so the maintained object is the
    VALUE CENSUS — a MaterializedAgg keyed on (group, value) whose
    count column rides the plain signed fold; the median derives at
    read time via ``sinks/census.py::census_median`` (one partitioned
    cumulative window, domain-bounded frame — never a window over fact
    input). The same API serves any percentile and mode off the same
    maintained census (graded: ``matview_percentile_census``).

    100 TB posture: census state is |group × value domain| (cents
    here), independent of row count; each feed folds |touched (group,
    value) cells|. The derive is a census-sized window, not a data
    scan."""
    from data_pipeline_platform_spark.sinks.census import census_median

    census = _churned_price_census(spark, sf_dir)
    med = census_median(census, out="median_c")
    return med.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        (F.col("median_c") / 100.0).alias("median_price"),
    )


ORACLE_MATVIEW_MEDIAN_CENSUS = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), ins AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), merged AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), kept AS (
  SELECT * FROM merged WHERE o_orderkey % 300 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       median(price_c) / 100.0 AS median_price
FROM kept
GROUP BY o_orderpriority
"""

register(
    "matview_median_census",
    q_matview_median_census,
    ORACLE_MATVIEW_MEDIAN_CENSUS,
)


def q_matview_percentile_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p90 and MODE off the SAME maintained census as the median twin
    (``sinks/census.py``): percentile_disc semantics (value at rank
    ``max(1, ceil(p·n))``, graded against DuckDB ``quantile_disc``)
    and deterministic mode (most frequent value, smallest on a tie —
    ``mode(x ORDER BY x)``). One maintained state, every holistic
    aggregate reads off it — the reusable-derive contract the r9
    verdict asked for.

    100 TB posture: identical to matview_median_census — the derives
    are census-sized windows over maintained state, never fact scans."""
    from data_pipeline_platform_spark.sinks.census import (
        census_mode,
        census_percentile,
    )

    census = _churned_price_census(spark, sf_dir)
    p90 = census_percentile(census, 0.9, out="p90_c")
    mode = census_mode(census, out="mode_c").select(
        "o_orderpriority", "mode_c"
    )
    return p90.join(mode, "o_orderpriority").select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        (F.col("p90_c") / 100.0).alias("p90_price"),
        (F.col("mode_c") / 100.0).alias("mode_price"),
    )


ORACLE_MATVIEW_PERCENTILE_CENSUS = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 0
), upd AS (
  SELECT o_orderkey, o_orderpriority,
         price_c + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM base
), ins AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 501 = 0
), merged AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), kept AS (
  SELECT * FROM merged WHERE o_orderkey % 300 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       quantile_disc(price_c, 0.9) / 100.0 AS p90_price,
       mode(price_c ORDER BY price_c) / 100.0 AS mode_price
FROM kept
GROUP BY o_orderpriority
"""

register(
    "matview_percentile_census",
    q_matview_percentile_census,
    ORACLE_MATVIEW_PERCENTILE_CENSUS,
)


def q_stream_fanout_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the atomic streaming fan-out
    (streaming/matview.py fold_batch_multi): three deterministic
    micro-batches of orders fold into TWO views — per-priority
    count/sum and per-customer-bucket count — each batch under ONE
    multi-table txn (marker inside every stage, one decide marker),
    with batch 1 REDELIVERED to prove the replay skip. The output
    joins both views' state; the oracle is the one-shot aggregate
    pair over the full input, so a half-applied batch (one view
    advanced, the other not) or a double-fold is a value mismatch.

    100 TB posture: per batch cost is the two batch-sized partial
    aggs + file-pruned merges; the decide point is one empty-object
    put regardless of batch size."""
    from data_pipeline_platform_spark.streaming.matview import fold_batch_multi

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    by_prio = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="sft_prio_"),
        keys=["o_orderpriority"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    by_bucket = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="sft_bucket_"),
        keys=["cust_bucket"],
        aggs=[("n_orders", "count", "")],
    )
    coord = tempfile.mkdtemp(prefix="sft_txns_")
    for i in range(3):
        batch = orders.filter(F.col("o_orderkey") % 3 == i).withColumn(
            "cust_bucket", F.col("o_custkey") % 10
        )
        fold_batch_multi(
            [(by_prio, batch), (by_bucket, batch)], "twin", i, coord
        )
        if i == 1:  # redelivery: the replay must skip BOTH views
            fold_batch_multi(
                [(by_prio, batch), (by_bucket, batch)], "twin", i, coord
            )
    buckets = by_bucket.read().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("n_orders").alias("n_total"),
    )
    return by_prio.read().select(
        "o_orderpriority",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
    ).crossJoin(F.broadcast(buckets))


ORACLE_STREAM_FANOUT_TWIN = """
WITH src AS (
  SELECT o_orderpriority, o_custkey % 10 AS cust_bucket,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       (SELECT CAST(COUNT(DISTINCT cust_bucket) AS BIGINT) FROM src)
         AS n_buckets,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM src) AS n_total
FROM src
GROUP BY o_orderpriority
"""

register("stream_fanout_twin", q_stream_fanout_twin, ORACLE_STREAM_FANOUT_TWIN)


def q_medallion_nullable_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM over a genuinely NULLABLE column through a churn that
    retracts the LAST non-NULL row of half the groups — the exact shape
    of the r9 nullable-SUM defect (sinks/matview.py: the additive state
    read 0 where SQL SUM over the remaining all-NULL group is NULL; the
    hidden per-sum non-NULL counter now NULLs it out).

    ``bonus_c`` is non-NULL only for every 97th order; the delete wave
    retracts EVERY non-NULL bonus row of groups 0-4, so those groups'
    ``sum_bonus`` must read NULL (not 0) while their row counts stay
    positive and ``sum_price`` (never NULL) keeps the plain signed fold.

    100 TB posture: identical to cdf_incremental_view — the counter is
    one extra bigint per (group, sum agg), folded in the same partial
    aggregation; no extra shuffle, no snapshot scans."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 10).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )

    def _shape(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey",
            "grp",
            "price_c",
            F.when(F.col("o_orderkey") % 97 == 0, F.col("price_c")).alias(
                "bonus_c"
            ),
        )

    base = _shape(orders)
    updates = _shape(
        orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "price_c", F.col("price_c") + F.lit(100)
        )
    )
    bronze = AcidTable(spark, tempfile.mkdtemp(prefix="mns_bronze_"))
    view = MaterializedAgg(
        spark,
        tempfile.mkdtemp(prefix="mns_silver_"),
        keys=["grp"],
        aggs=[
            ("n_orders", "count", ""),
            ("sum_price_c", "sum", "price_c"),
            ("sum_bonus_c", "sum", "bonus_c"),
        ],
    )
    consumer = ChangeFeedConsumer(
        bronze, source_keys=["o_orderkey"], view=view, count_col="n_orders"
    )
    bronze.write(base.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"])
    consumer.process_available()
    bronze.merge(updates, keys=["o_orderkey"])
    consumer.process_available()
    # retract the last non-NULL bonus rows of groups 0-4
    doomed = bronze.read().filter(
        F.col("bonus_c").isNotNull() & (F.col("grp") < 5)
    )
    bronze.merge(doomed, keys=["o_orderkey"], delete_matched=True)
    consumer.process_available()
    return consumer.state().select(
        "grp",
        "n_orders",
        (F.col("sum_price_c") / 100.0).alias("sum_price"),
        (F.col("sum_bonus_c") / 100.0).alias("sum_bonus"),
    )


ORACLE_MEDALLION_NULLABLE_SUM = """
WITH cur AS (
  SELECT o_orderkey, o_orderkey % 10 AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 100 = 0 THEN 100 ELSE 0 END AS price_c
  FROM orders
), with_bonus AS (
  SELECT o_orderkey, grp, price_c,
         CASE WHEN o_orderkey % 97 = 0 THEN price_c ELSE NULL END AS bonus_c
  FROM cur
), kept AS (
  SELECT * FROM with_bonus
  WHERE NOT (o_orderkey % 97 = 0 AND grp < 5)
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS sum_price,
       SUM(bonus_c) / 100.0 AS sum_bonus
FROM kept
GROUP BY grp
"""

register(
    "medallion_nullable_sum",
    q_medallion_nullable_sum,
    ORACLE_MEDALLION_NULLABLE_SUM,
)
