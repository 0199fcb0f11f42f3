#!/usr/bin/env python
"""Merge-on-read + CDC + governance example (the r10-continuation lake
wave): deletion-vector deletes that never rewrite data, a sequence-
keyed CDC apply that suppresses stale events, a Write-Audit-Publish
gate that aborts a bad wave before anyone can read it, partial-column
UPDATE SET merges, a secondary key index answering range lookups on a
non-clustered column, and a deep clone for DR.

Run: python examples/lake_mor_cdc_example.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.cdc import apply_changes, read_current
from data_pipeline_platform_spark.sinks.keyindex import KeyIndex
from data_pipeline_platform_spark.sinks.wap import write_audit_publish
from data_pipeline_platform_spark.sources.readers import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lake-mor-cdc-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lake_example_")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    # -- deletion vectors: a selective delete costs metadata, not a
    # rewrite; the data files stay byte-identical on disk
    t = AcidTable(spark, root + "/orders")
    t.write(orders.repartition(4, "o_orderkey"), stats_cols=["o_orderkey"],
            binpack=False)
    out = t.delete("o_orderkey % 10 = 3", mode="dv")
    print("dv delete:", out, "rows now:", t.read().count())

    # the change feed sees the dead rows as deletes (identity-keyed diff)
    feed = t.changes(["o_orderkey"], v_from=1, v_to=2)
    print("cdf rows from the dv delete:", feed.count())

    # -- write-audit-publish: the bad wave is never readable
    rules = [{"rule": "in_range", "column": "o_totalprice",
              "min": 0.0, "max": 1e7}]
    bad = orders.limit(50).select(
        "o_orderkey", "o_custkey",
        (-F.col("o_totalprice")).alias("o_totalprice"),
    )
    res = write_audit_publish(t, bad, rules, coordinator_dir=root + "/c")
    print("wap published?", res["published"], "failed:", res["failed_rules"])

    # -- partial-column merge: increment balances without touching the
    # other columns
    t2 = AcidTable(spark, root + "/balances")
    t2.write(
        orders.limit(1000).select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "balance_c"),
        )
    )
    t2.merge_update_set(
        t2.read().limit(100).select(
            "o_orderkey", F.lit(500).cast("bigint").alias("delta_c")),
        keys=["o_orderkey"],
        set_exprs={"balance_c": "t.balance_c + s.delta_c"},
        insert_defaults={"balance_c": "s.delta_c"},
    )
    print("balances after UPDATE SET:", t2.read().count())

    # -- CDC apply with tombstones: stale events lose, batching cannot
    # change the outcome
    cdc = AcidTable(spark, root + "/cdc")
    ev = spark.createDataFrame(
        [(1, 20, "D", None), (1, 10, "U", 5.0), (2, 10, "U", 7.0)],
        "k long, seq long, op string, v double",
    )
    for i in range(3):  # deliver one event per batch, deletes first
        apply_changes(cdc, ev.offset(i).limit(1), keys=["k"],
                      sequence_by="seq", tombstones=True)
    print("cdc current:", read_current(cdc).collect())

    # -- secondary key index: range lookup on a non-clustered column
    idx = KeyIndex(t2, "o_custkey", root + "/idx")
    idx.build()
    print("custkey range hits:", idx.lookup_range(1, 50).count())

    # -- deep clone for DR, fully independent of the source
    dr = t2.deep_clone(root + "/dr")
    print("dr clone rows:", dr.read().count(), "fsck ok:", dr.fsck()["ok"])

    spark.stop()


if __name__ == "__main__":
    main()
