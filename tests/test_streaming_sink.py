"""Streaming -> writer integration: foreachBatch driving the UPSERT
strategy (the production pattern for continuously merging a stream into
a lake table)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.writers import BatchWriter, WriteStrategy
from data_pipeline_platform_spark.sources.readers import load_table
from data_pipeline_platform_spark.streaming.windows import read_events_stream


def test_stream_upsert_via_foreachbatch(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(400)
    stream_dir = str(tmp_path / "ev_in")
    events.repartition(4).write.parquet(stream_dir)

    writer = BatchWriter(spark, base_path=str(tmp_path / "wh"))

    def merge_batch(batch_df, batch_id):
        # running per-user profile: aggregate the micro-batch, COMBINE
        # with existing state, then upsert — a bare upsert of the batch
        # aggregate would overwrite history with the last batch's view
        profile = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_seen"),
        )
        if writer.table_exists("user_profiles"):
            existing = writer.read_table("user_profiles")
            profile = (
                profile.unionByName(existing)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.max("last_seen").alias("last_seen"),
                )
            )
        writer.write(profile, "user_profiles", WriteStrategy.UPSERT, upsert_keys=["user_id"])

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    out = writer.read_table("user_profiles")
    users = out.count()
    assert users == events.select("user_id").distinct().count()
    # combined state must equal the global batch aggregate per user
    expected = {
        r["user_id"]: (r["n"], r["mx"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("mx"))
        .collect()
    }
    got = {r["user_id"]: (r["n_events"], r["last_seen"]) for r in out.collect()}
    assert got == expected


def test_stream_append_to_parquet_sink(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(100)
    stream_dir = str(tmp_path / "in2")
    events.write.parquet(stream_dir)
    out_dir = str(tmp_path / "out2")

    stream = read_events_stream(spark, stream_dir)
    q = (
        stream.select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 100


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """Duplicated input files -> stream_dedup output == batch
    dropDuplicates (late_threshold chosen so no test event falls behind
    the watermark; eviction semantics are the documented contract)."""
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        stream_dedup,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    stream_dir = str(tmp_path / "dup_events")
    # every event written twice, across different files
    events.repartition(3).write.parquet(stream_dir)
    events.repartition(2).write.mode("append").parquet(stream_dir)

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=2)
    q = run_to_memory(
        stream_dedup(stream, late_threshold="3650 days"), "t_dedup"
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
    expected = events.select("event_id").distinct().count()
    assert got["n"] == expected == got["d"]

    # batch fall-through: same function, no stream
    doubled = events.union(events)
    assert stream_dedup(doubled).count() == expected
