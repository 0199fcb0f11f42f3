"""Streaming materialized-view maintenance (streaming/matview.py):
drained-stream state equals the one-shot batch groupBy, and replays are
no-ops."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.streaming.matview import (
    last_folded_batch,
    stream_materialize,
)


@pytest.fixture()
def source_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [("a", 1), ("b", 10), ("a", 5), ("c", 7), ("b", -2), ("a", 2)]
    df = spark.createDataFrame(rows, "g string, x long")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    df.repartition(3).write.parquet(src)
    return src, df


def _view(spark, tmp_path):
    return MaterializedAgg(
        spark,
        str(tmp_path / "mv"),
        keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x"), ("hi", "max", "x")],
    )


def _drain(spark, src, view, ckpt):
    stream = (
        spark.readStream.schema("g string, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_materialize(stream, view, checkpoint=ckpt)
    q.awaitTermination(120)
    return q


def test_drained_stream_equals_batch_groupby(spark, tmp_path, source_dir):
    src, df = source_dir
    view = _view(spark, tmp_path)
    _drain(spark, src, view, str(tmp_path / "ckpt"))
    got = {r["g"]: (r["n"], r["s"], r["hi"]) for r in view.read().collect()}
    want = {
        r["g"]: (r["n"], r["s"], r["hi"])
        for r in df.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"), F.max("x").alias("hi"))
        .collect()
    }
    assert got == want
    assert last_folded_batch(view) >= 1  # multiple micro-batches folded


def test_replay_is_noop(spark, tmp_path, source_dir):
    src, df = source_dir
    view = _view(spark, tmp_path)
    _drain(spark, src, view, str(tmp_path / "ckpt1"))
    before = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    n_versions = view.acid.latest_version()
    # a FRESH checkpoint re-delivers every micro-batch from scratch; the
    # batch-id guard must skip them all (no double counts)
    _drain(spark, src, view, str(tmp_path / "ckpt2"))
    after = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert after == before
    assert view.acid.latest_version() == n_versions  # no new commits
