"""Streaming enrichment: Structured Streaming micro-batches folded
into a MaterializedJoin via the SAME stream_materialize/fold_batch
machinery as aggregate views (duck-typed update()) — drained state
equals the one-shot batch join, replays are no-ops. Plus: a
compaction commit is invisible to downstream change-feed consumers
(COW survivor suppression)."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer
from data_pipeline_platform_spark.streaming.matview import (
    fold_batch,
    stream_materialize,
)


def _dim(spark):
    return spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY"), (3, "FURNITURE")],
        "c_id long, seg string",
    )


def test_streamed_enrichment_equals_batch_join(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(1, 1, 10), (2, 2, 5), (3, 9, 7), (4, 3, 2), (5, 1, 8)]
    df = spark.createDataFrame(rows, "k long, cust long, x long")
    df.repartition(3).write.parquet(src)  # several micro-batches
    view = MaterializedJoin(
        spark, str(tmp_path / "ev"), row_keys=["k"],
        dim=_dim(spark), on=[("cust", "c_id")], how="left",
    )
    stream = (
        spark.readStream.schema("k long, cust long, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_materialize(stream, view, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r["k"]: (r["cust"], r["x"], r["seg"]) for r in view.read().collect()}
    want = {
        r["k"]: (r["cust"], r["x"], r["seg"])
        for r in df.join(_dim(spark), F.col("cust") == F.col("c_id"), "left").collect()
    }
    assert got == want


def test_enrichment_fold_replay_is_noop(spark, tmp_path):
    view = MaterializedJoin(
        spark, str(tmp_path / "rv"), row_keys=["k"],
        dim=_dim(spark), on=[("cust", "c_id")], how="left",
    )
    b0 = spark.createDataFrame([(1, 1, 10)], "k long, cust long, x long")
    b1 = spark.createDataFrame([(2, 2, 5)], "k long, cust long, x long")
    assert fold_batch(view, "s1", b0, 0) is True
    assert fold_batch(view, "s1", b1, 1) is True
    versions = view.acid.latest_version()
    assert fold_batch(view, "s1", b0, 0) is False  # crash re-delivery
    assert fold_batch(view, "s1", b1, 1) is False
    assert view.acid.latest_version() == versions


def test_compaction_commit_is_cdf_invisible(spark, tmp_path):
    """compact() rewrites files without changing rows; the change feed
    across it must net to ZERO rows (COW survivor suppression), so a
    downstream consumer folds nothing and commits a marker-only span."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    bronze = AcidTable(spark, str(tmp_path / "cb"))
    df = spark.createDataFrame(
        [(k, "g%d" % (k % 3), k) for k in range(1, 31)], "k long, g string, x long"
    )
    bronze.write(df.repartition(4, "k"), stats_cols=["k"], binpack=False)
    view = MaterializedAgg(
        spark, str(tmp_path / "cv"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    consumer.process_available()
    before = {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()}

    v_pre = bronze.latest_version()
    bronze.compact()
    assert bronze.latest_version() == v_pre + 1
    feed = bronze.changes(["k"], v_from=v_pre, v_to=bronze.latest_version())
    assert feed.count() == 0  # identical survivor rows suppressed

    consumer.process_available()
    assert {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()} == before


def test_consumer_over_shallow_clone(spark, tmp_path):
    """A shallow clone is a first-class CDF source: its CLONE commit
    feeds the initial load (referenced source files read as inserts),
    its own COW merges diff normally, and the source table's later
    churn never leaks into the clone's feed."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    src = AcidTable(spark, str(tmp_path / "csrc"))
    src.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 5)], "k long, g string, x long"
        ),
        stats_cols=["k"],
    )
    clone = src.clone(str(tmp_path / "cdst"))
    view = MaterializedAgg(
        spark, str(tmp_path / "cv2"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(clone, ["k"], view, count_col="n")
    consumer.process_available()

    def got():
        return {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()}

    assert got() == {"a": (1, 10), "b": (1, 5)}
    # source churn is invisible to the clone's consumer
    src.merge(
        spark.createDataFrame([(1, "a", 99)], "k long, g string, x long"),
        keys=["k"],
    )
    assert consumer.process_available()["versions_behind"] == 0
    # the clone's own divergence folds
    clone.merge(
        spark.createDataFrame([(2, "b", 50)], "k long, g string, x long"),
        keys=["k"],
    )
    consumer.process_available()
    assert got() == {"a": (1, 10), "b": (1, 50)}
