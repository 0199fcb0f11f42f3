"""Graded surface for SCD Type-2 dimension maintenance (sinks/scd.py).

``scd2_customer_dim`` drives the full state machine end-to-end: three
deterministic delta batches derived from customer (initial load minus
late arrivals, an update+unchanged-presence mix, late arrivals plus a
second update wave) applied through ``Scd2Table.apply`` — i.e. through
AcidTable's copy-on-write MERGE — and the final version table is
compared against a DuckDB oracle that reconstructs the SAME versions
set-theoretically with LAG/LEAD windows over the batch union.  An
engine bug in any leg (change detection, close/open bookkeeping, merge
matching on the composite key) shifts a valid_from/valid_to somewhere
and breaks the bitwise match.

Batch construction (c_custkey k, segment s = c_mktsegment):

- batch 1: every k with k % 11 != 0, s
- batch 2: k % 7 == 0 -> 'M2-' || s (update or late first version);
           plus k % 3 == 0 AND k % 11 != 0 -> s (present, unchanged)
- batch 3: k % 11 == 0 AND k % 7 != 0 -> s (late arrivals);
           k % 21 == 0 -> 'M3-' || s (second update wave; disjoint from
           the first branch since 21 = 3*7)
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sinks.scd import Scd2Table
from data_pipeline_platform_spark.sources.readers import load_table


def _batches(cust: DataFrame):
    k = F.col("c_custkey")
    s = F.col("c_mktsegment")
    b1 = cust.filter(k % 11 != 0).select(k.alias("c_custkey"), s.alias("segment"))
    b2 = cust.filter((k % 7 == 0) | ((k % 3 == 0) & (k % 11 != 0))).select(
        k.alias("c_custkey"),
        F.when(k % 7 == 0, F.concat(F.lit("M2-"), s)).otherwise(s).alias("segment"),
    )
    b3 = cust.filter(((k % 11 == 0) & (k % 7 != 0)) | (k % 21 == 0)).select(
        k.alias("c_custkey"),
        F.when(k % 21 == 0, F.concat(F.lit("M3-"), s)).otherwise(s).alias("segment"),
    )
    return b1, b2, b3


def q_scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    dim = Scd2Table(
        spark,
        tempfile.mkdtemp(prefix="scd2_customer_"),
        keys=["c_custkey"],
        tracked=["segment"],
    )
    for bid, batch in enumerate(_batches(cust), start=1):
        dim.apply(batch, batch_id=bid)
    return dim.read().select(
        "c_custkey", "segment", "valid_from", "valid_to", "is_current"
    )


# the oracle rebuilds the version table from scratch: union the batches,
# keep rows whose segment differs from the key's previous PRESENT batch
# (LAG), then the closing batch of each version is the next version's
# opening batch (LEAD)
ORACLE_SCD2_CUSTOMER_DIM = """
WITH b AS (
  SELECT c_custkey, 1 AS bid, c_mktsegment AS segment
  FROM customer WHERE c_custkey % 11 <> 0
  UNION ALL
  SELECT c_custkey, 2,
         CASE WHEN c_custkey % 7 = 0 THEN 'M2-' || c_mktsegment
              ELSE c_mktsegment END
  FROM customer
  WHERE c_custkey % 7 = 0 OR (c_custkey % 3 = 0 AND c_custkey % 11 <> 0)
  UNION ALL
  SELECT c_custkey, 3,
         CASE WHEN c_custkey % 21 = 0 THEN 'M3-' || c_mktsegment
              ELSE c_mktsegment END
  FROM customer
  WHERE (c_custkey % 11 = 0 AND c_custkey % 7 <> 0) OR c_custkey % 21 = 0
), chg AS (
  SELECT c_custkey, bid, segment,
         LAG(segment) OVER (PARTITION BY c_custkey ORDER BY bid) AS prev
  FROM b
), vers AS (
  SELECT c_custkey, bid, segment FROM chg
  WHERE prev IS NULL OR prev <> segment
)
SELECT c_custkey, segment,
       CAST(bid AS BIGINT) AS valid_from,
       CAST(LEAD(bid) OVER (PARTITION BY c_custkey ORDER BY bid) AS BIGINT)
         AS valid_to,
       LEAD(bid) OVER (PARTITION BY c_custkey ORDER BY bid) IS NULL AS is_current
FROM vers
"""


register("scd2_customer_dim", q_scd2_customer_dim, ORACLE_SCD2_CUSTOMER_DIM)


def q_scd2_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point of keeping Type-2 history: enrich facts with the
    dimension attributes THAT WERE TRUE at fact time, not today's.
    Orders are assigned a deterministic event epoch (1 + o_orderkey % 3)
    and joined to the customer dimension version whose
    [valid_from, valid_to) interval covers that epoch; revenue per
    (epoch, then-current segment) would silently misattribute every
    moved customer if joined against only the latest snapshot.

    Plan shape: equi-join on the business key (the selective part), the
    interval predicate as a post-join filter — version chains are short
    (<= |batches| rows per key), so the non-equi residual multiplies a
    bounded per-key frame, never |facts| x |dim|."""
    cust = load_table(spark, sf_dir, "customer")
    dim = Scd2Table(
        spark,
        tempfile.mkdtemp(prefix="scd2_asof_"),
        keys=["c_custkey"],
        tracked=["segment"],
    )
    for bid, batch in enumerate(_batches(cust), start=1):
        dim.apply(batch, batch_id=bid)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.lit(1) + F.col("o_orderkey") % 3).cast("bigint").alias("epoch"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    versions = dim.read()
    joined = orders.join(
        versions, orders.o_custkey == versions.c_custkey, "inner"
    ).filter(
        (F.col("valid_from") <= F.col("epoch"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("epoch")))
    )
    return (
        joined.groupBy("epoch", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("price_c") / 100.0).alias("revenue"),
        )
    )


ORACLE_SCD2_ASOF_ENRICHMENT = """
WITH b AS (
  SELECT c_custkey, 1 AS bid, c_mktsegment AS segment
  FROM customer WHERE c_custkey % 11 <> 0
  UNION ALL
  SELECT c_custkey, 2,
         CASE WHEN c_custkey % 7 = 0 THEN 'M2-' || c_mktsegment
              ELSE c_mktsegment END
  FROM customer
  WHERE c_custkey % 7 = 0 OR (c_custkey % 3 = 0 AND c_custkey % 11 <> 0)
  UNION ALL
  SELECT c_custkey, 3,
         CASE WHEN c_custkey % 21 = 0 THEN 'M3-' || c_mktsegment
              ELSE c_mktsegment END
  FROM customer
  WHERE (c_custkey % 11 = 0 AND c_custkey % 7 <> 0) OR c_custkey % 21 = 0
), chg AS (
  SELECT c_custkey, bid, segment,
         LAG(segment) OVER (PARTITION BY c_custkey ORDER BY bid) AS prev
  FROM b
), vers AS (
  SELECT c_custkey, bid AS valid_from,
         LEAD(bid) OVER (PARTITION BY c_custkey ORDER BY bid) AS valid_to,
         segment
  FROM chg WHERE prev IS NULL OR prev <> segment
), o AS (
  SELECT o_custkey, CAST(1 + o_orderkey % 3 AS BIGINT) AS epoch,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
)
SELECT o.epoch, v.segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(price_c) / 100.0 AS revenue
FROM o JOIN vers v
  ON o.o_custkey = v.c_custkey
 AND v.valid_from <= o.epoch
 AND (v.valid_to IS NULL OR v.valid_to > o.epoch)
GROUP BY 1, 2
"""


register("scd2_asof_enrichment", q_scd2_asof_enrichment, ORACLE_SCD2_ASOF_ENRICHMENT)
