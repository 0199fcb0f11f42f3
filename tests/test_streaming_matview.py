"""Streaming materialized-view maintenance (streaming/matview.py):
drained-stream state equals the one-shot batch groupBy, replayed
batches are no-ops (marker rides inside the ACID commit — no crash
window), and checkpoint/view mispairing fails loudly."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.streaming.matview import (
    fold_batch,
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


def _state(view):
    return {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}


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
    import os

    sid = os.path.abspath(str(tmp_path / "ckpt"))
    assert last_folded_batch(view, sid) >= 1  # multiple micro-batches folded


def test_fold_batch_replay_is_noop_and_marker_is_atomic(spark, tmp_path):
    """Crash-replay simulation: the SAME (stream, batch_id) folding
    twice commits exactly once — the progress marker lives INSIDE the
    fold's ACID commit, so there is no fold-then-marker crash window."""
    view = _view(spark, tmp_path)
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "g string, x long")
    b1 = spark.createDataFrame([("a", 10)], "g string, x long")
    assert fold_batch(view, "s1", b0, 0) is True
    assert fold_batch(view, "s1", b1, 1) is True
    versions = view.acid.latest_version()
    before = _state(view)
    # foreachBatch re-delivery after a simulated crash: same ids again
    assert fold_batch(view, "s1", b0, 0) is False
    assert fold_batch(view, "s1", b1, 1) is False
    assert view.acid.latest_version() == versions  # no new commits
    assert _state(view) == before
    # the marker is in the commit meta, not a sidecar
    metas = [c["meta"] for c in view.acid.history()]
    assert {"stream_id": "s1", "batch_id": 1} == {
        k: metas[-1][k] for k in ("stream_id", "batch_id")
    }


def test_same_checkpoint_restart_folds_only_new_data(spark, tmp_path, source_dir):
    """The r7-ADVICE data-loss scenario: new source files arriving
    after a drain must fold on a SAME-checkpoint restart (batch ids
    continue from the checkpoint; the per-stream guard admits them)."""
    src, df = source_dir
    view = _view(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, src, view, ckpt)
    late = spark.createDataFrame([("a", 100), ("d", 1)], "g string, x long")
    late.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, view, ckpt)
    want = {
        r["g"]: (r["n"], r["s"])
        for r in df.unionByName(late)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert _state(view) == want


def test_fresh_checkpoint_against_folded_view_raises(spark, tmp_path):
    """A fresh checkpoint restarts batch ids at 0 and re-delivers the
    whole source — folding it into existing state would double-count,
    so the mispairing is rejected loudly."""
    view = _view(spark, tmp_path)
    b = spark.createDataFrame([("a", 1)], "g string, x long")
    fold_batch(view, "s1", b, 0)
    with pytest.raises(RuntimeError, match="another stream"):
        fold_batch(view, "s2", b, 0)
    # disjoint-sources escape hatch
    assert fold_batch(view, "s2", b, 0, allow_other_streams=True) is True


class TestFoldBatchMulti:
    """Atomic fan-out: one micro-batch folds into several views under
    one multi-table txn — all visible together, crash heals, replays
    skip."""

    def _views(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

        by_g = MaterializedAgg(
            spark, str(tmp_path / "by_g"), keys=["g"],
            aggs=[("n", "count", ""), ("s", "sum", "x")],
        )
        by_u = MaterializedAgg(
            spark, str(tmp_path / "by_u"), keys=["u"],
            aggs=[("n", "count", "")],
        )
        return by_g, by_u

    def _batch(self, spark, rows):
        return spark.createDataFrame(rows, "g string, u long, x long")

    def test_fold_replay_skip_and_lockstep(self, spark, tmp_path):
        from data_pipeline_platform_spark.streaming.matview import (
            fold_batch_multi,
        )

        by_g, by_u = self._views(spark, tmp_path)
        coord = str(tmp_path / "_txns")
        b0 = self._batch(spark, [("a", 1, 10), ("b", 2, 20)])
        assert fold_batch_multi(
            [(by_g, b0), (by_u, b0)], "s1", 0, coord
        )
        assert not fold_batch_multi(
            [(by_g, b0), (by_u, b0)], "s1", 0, coord
        )  # replay skips
        b1 = self._batch(spark, [("a", 1, 5)])
        assert fold_batch_multi([(by_g, b1), (by_u, b1)], "s1", 1, coord)
        got_g = {r["g"]: (r["n"], r["s"]) for r in by_g.read().collect()}
        got_u = {r["u"]: r["n"] for r in by_u.read().collect()}
        assert got_g == {"a": (2, 15), "b": (1, 20)}
        assert got_u == {1: 2, 2: 1}

    def test_crash_between_stage_and_decide_heals(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.txn import MultiTableTxn
        from data_pipeline_platform_spark.streaming.matview import (
            fold_batch_multi,
            last_folded_batch,
        )

        by_g, by_u = self._views(spark, tmp_path)
        coord = str(tmp_path / "_txns")
        b0 = self._batch(spark, [("a", 1, 10)])
        fold_batch_multi([(by_g, b0), (by_u, b0)], "s1", 0, coord)
        # simulate a crash: stage batch 1 into ONE view only, no decide
        b1 = self._batch(spark, [("b", 2, 20)])
        dangling = MultiTableTxn(coord)
        by_g.update(
            b1,
            commit_meta={"stream_id": "s1", "batch_id": 1},
            txn=dangling._ref(),
        )
        # the pending stage neither counts as folded nor leaks state
        assert last_folded_batch(by_g, "s1") == 0
        assert {r["g"] for r in by_g.read().collect()} == {"a"}
        # redelivery recovers (presumed abort) then folds BOTH views
        assert fold_batch_multi([(by_g, b1), (by_u, b1)], "s1", 1, coord)
        got_g = {r["g"]: (r["n"], r["s"]) for r in by_g.read().collect()}
        assert got_g == {"a": (1, 10), "b": (1, 20)}
        assert {r["u"]: r["n"] for r in by_u.read().collect()} == {1: 1, 2: 1}

    def test_streaming_drain_equals_batch(self, spark, tmp_path):
        """stream_materialize_multi over a file stream: drained state
        equals the one-shot aggregates of the full input."""
        from pyspark.sql import functions as F

        from data_pipeline_platform_spark.streaming.matview import (
            stream_materialize_multi,
        )

        src = tmp_path / "src"
        df = spark.range(100).select(
            (F.col("id") % 7).cast("string").alias("g"),
            (F.col("id") % 5).alias("u"),
            F.col("id").alias("x"),
        )
        df.write.parquet(str(src))
        by_g, by_u = self._views(spark, tmp_path)
        stream = spark.readStream.schema(
            "g string, u long, x long"
        ).parquet(str(src))
        q = stream_materialize_multi(
            stream,
            [(by_g, lambda b: b), (by_u, lambda b: b)],
            str(tmp_path / "ckpt"),
            str(tmp_path / "_txns"),
        )
        q.awaitTermination(120)
        want_g = {
            r["g"]: (r["n"], r["s"])
            for r in df.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
            .collect()
        }
        got_g = {r["g"]: (r["n"], r["s"]) for r in by_g.read().collect()}
        assert got_g == want_g
        assert {r["u"]: r["n"] for r in by_u.read().collect()} == {
            r["u"]: r["n"]
            for r in df.groupBy("u").agg(F.count(F.lit(1)).alias("n")).collect()
        }


def test_fold_batch_multi_mixes_agg_and_join_views(spark, tmp_path):
    """Heterogeneous atomic fan-out: one micro-batch folds into a
    MaterializedAgg AND a MaterializedJoin under one txn."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin
    from data_pipeline_platform_spark.streaming.matview import fold_batch_multi

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "d_key long, tier string"
    )
    agg = MaterializedAgg(
        spark, str(tmp_path / "agg"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    join = MaterializedJoin(
        spark, str(tmp_path / "join"), dim=dim,
        on=[("d", "d_key")], row_keys=["k"], how="left",
    )
    coord = str(tmp_path / "_txns")
    b0 = spark.createDataFrame(
        [(10, "a", 1, 5), (11, "b", 2, 7)], "k long, g string, d long, x long"
    )
    assert fold_batch_multi([(agg, b0), (join, b0)], "s1", 0, coord)
    assert not fold_batch_multi([(agg, b0), (join, b0)], "s1", 0, coord)
    b1 = spark.createDataFrame(
        [(12, "a", 9, 3)], "k long, g string, d long, x long"
    )  # d=9 misses the dim: LEFT view keeps it with NULL tier
    assert fold_batch_multi([(agg, b1), (join, b1)], "s1", 1, coord)
    assert {r["g"]: (r["n"], r["s"]) for r in agg.read().collect()} == {
        "a": (2, 8),
        "b": (1, 7),
    }
    tiers = {r["k"]: r["tier"] for r in join.read().collect()}
    assert tiers == {10: "gold", 11: "basic", 12: None}
