"""Streaming CDC apply (streaming/cdc_apply.py): drained stream equals
the batch apply_changes fold, replays skip (marker inside the apply
commit), and the marker prevents the physical-mode resurrect-on-
redelivery hazard."""

import os

from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.cdc import apply_changes, read_current
from data_pipeline_platform_spark.streaming.cdc_apply import (
    apply_cdc_batch,
    last_applied_batch,
    stream_apply_changes,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, op string, v string")


BATCHES = [
    [(1, 10, "U", "a"), (2, 10, "U", "b")],
    [(1, 20, "U", "a2"), (3, 10, "U", "c")],
    [(2, 30, "D", None), (1, 5, "U", "stale")],
]


def _write_source(spark, src):
    for i, rows in enumerate(BATCHES):
        _events(spark, rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)


def test_drained_stream_equals_batch_apply(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_source(spark, src)
    # streaming apply (tombstones: the final state is batching-
    # independent, so one-file-per-trigger micro-batching cannot matter)
    table_s = AcidTable(spark, str(tmp_path / "stream_t"))
    stream = (
        spark.readStream.schema("k long, seq long, op string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_apply_changes(
        stream, table_s, keys=["k"], sequence_by="seq",
        checkpoint=str(tmp_path / "ckpt"), tombstones=True,
    )
    q.awaitTermination(120)
    # batch apply of the same events in one shot
    table_b = AcidTable(spark, str(tmp_path / "batch_t"))
    all_rows = [r for b in BATCHES for r in b]
    apply_changes(table_b, _events(spark, all_rows), keys=["k"],
                  sequence_by="seq", tombstones=True)
    got = {
        r["k"]: (r["seq"], r["v"]) for r in read_current(table_s).collect()
    }
    want = {
        r["k"]: (r["seq"], r["v"]) for r in read_current(table_b).collect()
    }
    assert got == want == {1: (20, "a2"), 3: (10, "c")}


def test_replay_skips_and_blocks_resurrection(spark, tmp_path):
    table = AcidTable(spark, str(tmp_path / "t"))
    sid = "s1"
    b0 = _events(spark, BATCHES[0])
    assert apply_cdc_batch(table, sid, b0, 0, keys=["k"], sequence_by="seq")
    assert last_applied_batch(table, sid) == 0
    # batch 1 physically deletes key 2
    b1 = _events(spark, [(2, 30, "D", None)])
    assert apply_cdc_batch(table, sid, b1, 1, keys=["k"], sequence_by="seq")
    assert {r["k"] for r in table.read().collect()} == {1}
    versions = table.latest_version()
    # REDELIVERY of batch 0 (crash replay): without the marker this
    # would re-insert key 2 (its sequence died with the row); the
    # marker skips it
    assert not apply_cdc_batch(table, sid, b0, 0, keys=["k"],
                               sequence_by="seq")
    assert table.latest_version() == versions
    assert {r["k"] for r in table.read().collect()} == {1}


def test_fresh_consumer_resumes_from_marker(spark, tmp_path):
    table = AcidTable(spark, str(tmp_path / "t"))
    sid = "s1"
    apply_cdc_batch(table, sid, _events(spark, BATCHES[0]), 0,
                    keys=["k"], sequence_by="seq")
    apply_cdc_batch(table, sid, _events(spark, BATCHES[1]), 1,
                    keys=["k"], sequence_by="seq")
    # a restarted process reads the marker straight from the log
    assert last_applied_batch(table, sid) == 1
    assert last_applied_batch(table, "other") == -1
