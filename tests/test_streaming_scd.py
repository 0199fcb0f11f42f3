"""Streaming SCD2 (streaming/scd_stream.py): drained stream equals the
sequential batch applies, replays skip, as_of reconstruction works on
the streamed dimension."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.scd import Scd2Table
from data_pipeline_platform_spark.streaming.scd_stream import (
    apply_scd_batch,
    last_applied_batch,
    stream_scd2,
)

BATCHES = [
    [(1, "a", "x"), (2, "b", "y")],
    [(1, "a2", "x"), (3, "c", "z")],       # 1 changes, 3 is new
    [(2, "b", "y")],                       # no change: opens nothing
    [(2, "b9", "y"), (1, "a2", "x")],      # 2 changes, 1 unchanged
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, seg string")


def _dim(spark, path):
    return Scd2Table(spark, str(path), keys=["k"], tracked=["name", "seg"])


def test_drained_stream_equals_sequential_applies(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, rows in enumerate(BATCHES):
        _df(spark, rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    dim_s = _dim(spark, tmp_path / "dim_stream")
    stream = (
        spark.readStream.schema("k long, name string, seg string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_scd2(stream, dim_s, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    dim_b = _dim(spark, tmp_path / "dim_batch")
    for i, rows in enumerate(BATCHES):
        apply_scd_batch(dim_b, _df(spark, rows), i)

    def hist(dim):
        return sorted(
            (r["k"], r["name"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in dim.read().collect()
        )

    # NOTE: file order into micro-batches follows append order here
    # (one file per trigger, lexicographic part names per batch dir) —
    # if this ever flakes, the batches were reordered, which SCD2
    # legitimately refuses
    assert hist(dim_s) == hist(dim_b)
    cur = {r["k"]: r["name"] for r in dim_s.current().collect()}
    assert cur == {1: "a2", 2: "b9", 3: "c"}


def test_replay_skips_and_no_change_batch_is_noop(spark, tmp_path):
    dim = _dim(spark, tmp_path / "dim")
    assert apply_scd_batch(dim, _df(spark, BATCHES[0]), 0)
    assert apply_scd_batch(dim, _df(spark, BATCHES[1]), 1)
    v = dim.acid.latest_version()
    # replay of batch 1: skipped outright (its id is recorded in the
    # opened rows)
    assert not apply_scd_batch(dim, _df(spark, BATCHES[1]), 1)
    assert dim.acid.latest_version() == v
    # a no-change batch opens nothing but STILL stamps its commit, so
    # the watermark advances and its replay is skipped exactly —
    # not merely harmlessly re-applied
    assert apply_scd_batch(dim, _df(spark, BATCHES[2]), 2) is True
    assert last_applied_batch(dim) == 2
    v2 = dim.acid.latest_version()
    assert not apply_scd_batch(dim, _df(spark, BATCHES[2]), 2)
    assert dim.acid.latest_version() == v2  # no commit on the replay
    assert {r["k"] for r in dim.current().collect()} == {1, 2, 3}


def test_as_of_on_streamed_dim(spark, tmp_path):
    dim = _dim(spark, tmp_path / "dim")
    for i, rows in enumerate(BATCHES):
        apply_scd_batch(dim, _df(spark, rows), i)
    as_of_0 = {r["k"]: r["name"] for r in dim.as_of(0).collect()}
    assert as_of_0 == {1: "a", 2: "b"}
    as_of_1 = {r["k"]: r["name"] for r in dim.as_of(1).collect()}
    assert as_of_1 == {1: "a2", 2: "b", 3: "c"}
