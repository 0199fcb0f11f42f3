"""applyInPandasWithState: running per-user totals must equal the batch
aggregate after the stream drains (multi-micro-batch to exercise state
persistence across batches)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sources.readers import load_table
from data_pipeline_platform_spark.streaming.stateful import running_user_totals
from data_pipeline_platform_spark.streaming.windows import read_events_stream


def test_stateful_running_totals_match_batch(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    stream_dir = str(tmp_path / "ev_state")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    events.repartition(5).write.parquet(stream_dir)

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode: the memory sink holds one row per (user, emission);
    # the LAST emission per user carries the final running state
    final = spark.sql(
        """
        SELECT user_id, total_events, total_value, batches FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY batches DESC) rn
          FROM user_totals
        ) WHERE rn = 1
        """
    ).collect()

    expected = {
        r["user_id"]: (r["n"], r["v"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert len(final) == len(expected)
    for row in final:
        n, v = expected[row["user_id"]]
        assert row["total_events"] == n
        assert abs(row["total_value"] - v) < 1e-6
        assert row["batches"] >= 1
