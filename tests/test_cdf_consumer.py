"""Change-feed consumer (streaming/cdf.py): the bronze->silver hop —
silver equals one-shot groupBy over the bronze snapshot after any
sequence of writes/merges/deletes, replays are no-ops, retraction
drops emptied groups, and min/max aggs are rejected."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer


def _setup(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "bronze"))
    view = MaterializedAgg(
        spark, str(tmp_path / "silver"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    return bronze, view, consumer

def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, x long")


def _want(spark, bronze):
    return {
        r["g"]: (r["n"], r["s"])
        for r in bronze.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }


def _got(consumer):
    return {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()}


def test_silver_tracks_bronze_through_write_merge_delete(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 7)]),
                 stats_cols=["k"])
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze)

    bronze.merge(_df(spark, [(2, "a", 50), (4, "c", 1)]), keys=["k"])
    stats = consumer.process_available()
    assert stats["versions_behind"] == 1
    assert _got(consumer) == _want(spark, bronze)

    bronze.merge(_df(spark, [(1, "a", 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze)


def test_replay_and_crash_are_noops(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 1)]), stats_cols=["k"])
    consumer.process_available()
    versions = view.acid.latest_version()
    # nothing new: no commit published
    out = consumer.process_available()
    assert out["versions_behind"] == 0
    assert view.acid.latest_version() == versions
    # a fresh consumer instance (crash restart) reads the marker from
    # the silver commit log and also no-ops
    c2 = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    assert c2.last_processed_version() == bronze.latest_version()
    assert c2.process_available()["versions_behind"] == 0


def test_group_retracted_to_zero_disappears(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 1), (2, "b", 2)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(_df(spark, [(2, "b", 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got(consumer) == {"a": (1, 1)}
    # the zero-count row physically remains (single-commit atomicity)
    assert view.read().filter("g = 'b'").collect()[0]["n"] == 0


def test_min_max_aggs_rejected_for_retraction(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "b2"))
    view = MaterializedAgg(
        spark, str(tmp_path / "s2"), keys=["g"],
        aggs=[("n", "count", ""), ("hi", "max", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    bronze.write(_df(spark, [(1, "a", 1)]), stats_cols=["k"])
    with pytest.raises(ValueError, match="invertible"):
        consumer.process_available()
    with pytest.raises(ValueError, match="count aggregate"):
        ChangeFeedConsumer(bronze, ["k"], view, count_col="hi")
