"""Bucketed-table tests: the co-located join must execute with NO
shuffle exchange — the core 100 TB fact-fact join strategy."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.writers import BatchWriter


@pytest.fixture()
def bucketed(spark, tmp_warehouse):
    writer = BatchWriter(spark, base_path=tmp_warehouse)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    writer.write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    writer.write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # at test SF both sides fit the broadcast threshold, which would hide
    # the property under test; forcing the shuffle-join path shows the
    # bucket layout replacing the exchange (what happens at 100 TB where
    # neither fact table broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        # only the final group-by may shuffle — never the join inputs
        assert n_exchanges <= 1, f"join inputs shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(bucketed):
    spark = bucketed
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    expected = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == expected
