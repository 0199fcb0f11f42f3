"""Incremental ingestion, dry-run explain, compaction, skew diagnosis."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.plans.incremental import (
    IncrementalIngestor,
    WatermarkStore,
)


def test_incremental_ingest_cycle(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    inc = IncrementalIngestor(store)
    events = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "event_id long, v double"
    )

    # run 1: everything
    first = inc.read_increment(events, "src1", "event_id")
    assert first.count() == 100
    hwm = inc.commit_watermark(first, "src1", "event_id")
    assert hwm == 99

    # run 2 with no new data: empty increment, watermark unchanged
    second = inc.read_increment(events, "src1", "event_id")
    assert second.count() == 0
    assert inc.commit_watermark(second, "src1", "event_id") is None
    assert store.get("src1") == 99

    # run 3: new rows appear; only the delta is read
    more = events.union(
        spark.createDataFrame([(100, 100.0), (101, 101.0)], "event_id long, v double")
    )
    third = inc.read_increment(more, "src1", "event_id")
    assert sorted(r["event_id"] for r in third.collect()) == [100, 101]
    assert inc.commit_watermark(third, "src1", "event_id") == 101


def test_incremental_predicate_pushed_down(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.set("p", 500)
    inc = IncrementalIngestor(store)
    path = str(tmp_path / "data")
    spark.range(1000).withColumnRenamed("id", "seq").write.parquet(path)
    out = inc.read_increment(spark.read.parquet(path), "p", "seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(seq,500)" in plan  # reaches the scan
    assert out.count() == 499


def test_dry_run_explain(spark):
    from data_pipeline_platform_spark.plans.runner import PipelineRunner

    runner = PipelineRunner(spark)
    text = runner.explain(
        {
            "ingestion": {"path": "/root/testdata/sf0.001/orders.parquet", "format": "parquet"},
            "transformation": {
                "type": "sql",
                "query": "SELECT o_custkey, SUM(o_totalprice) AS t FROM input_data "
                "WHERE o_totalprice > 1000 GROUP BY o_custkey",
            },
        }
    )
    assert "Physical Plan" in text
    # the transform's filter is pushed into the ingest scan: one plan
    assert "PushedFilters" in text and "o_totalprice" in text


def test_compaction(spark, tmp_path):
    from data_pipeline_platform_spark.functions.scale import compact

    path = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(10_000).repartition(40).write.parquet(path)
    import os

    before = sum(1 for f in os.listdir(path) if f.startswith("part-"))
    assert before == 40
    compact(spark, path, target_file_bytes=1 << 30)
    after = sum(1 for f in os.listdir(path) if f.startswith("part-"))
    assert after == 1
    assert spark.read.parquet(path).count() == 10_000


def test_diagnose_skew(spark):
    from data_pipeline_platform_spark.functions.scale import diagnose_skew

    df = spark.createDataFrame(
        [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5, "k long"
    )
    top = diagnose_skew(df, "k", top_n=2).collect()
    assert top[0]["k"] == 1 and top[0]["share"] == 0.8
    assert top[1]["k"] == 2


def test_observed_watermark_reflects_persisted_rows_only(spark, tmp_path):
    """The watermark must come out of the persist job itself (Observation),
    not a second scan: on a live source the re-scan can see rows the
    persist didn't, advancing the mark past never-written rows."""
    store = WatermarkStore(str(tmp_path / "wm.json"))
    inc = IncrementalIngestor(store)
    out = str(tmp_path / "sink")

    src = spark.createDataFrame([(i, float(i)) for i in range(50)], "event_id long, v double")
    hwm = inc.ingest(src, "live", "event_id", lambda d: d.write.mode("append").parquet(out))
    assert hwm == 49 and store.get("live") == 49
    assert spark.read.parquet(out).count() == 50

    # empty increment: no action on the store
    assert (
        inc.ingest(src, "live", "event_id", lambda d: d.write.mode("append").parquet(out))
        is None
    )
    assert store.get("live") == 49

    # delta: only rows past the mark are persisted and committed
    more = src.union(spark.createDataFrame([(60, 60.0)], "event_id long, v double"))
    hwm = inc.ingest(more, "live", "event_id", lambda d: d.write.mode("append").parquet(out))
    assert hwm == 60 and store.get("live") == 60
    assert spark.read.parquet(out).count() == 51


def test_observed_watermark_single_job(spark, tmp_path):
    """observe_watermark computes max in the SAME action as the write —
    committing must not trigger any further job over the source."""
    store = WatermarkStore(str(tmp_path / "wm.json"))
    inc = IncrementalIngestor(store)
    df = spark.createDataFrame([(7, 1.0), (3, 2.0)], "event_id long, v double")
    observed, obs = inc.observe_watermark(df, "event_id")
    observed.write.parquet(str(tmp_path / "o"))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    assert inc.commit_observed(obs, "s") == 7
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no re-scan
