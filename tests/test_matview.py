"""Incrementally maintained aggregates (sinks/matview.py): additive
fold correctness vs one-shot groupBy, new-group inserts, untouched-group
file pruning, unsupported-agg validation."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.matview import MaterializedAgg


@pytest.fixture()
def view(spark, tmp_path):
    return MaterializedAgg(
        spark,
        str(tmp_path / "mv"),
        keys=["g"],
        aggs=[
            ("n", "count", ""),
            ("s", "sum", "x"),
            ("lo", "min", "x"),
            ("hi", "max", "x"),
        ],
    )


def _b(spark, rows):
    return spark.createDataFrame(rows, "g string, x long")


def _state(view):
    return {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in view.read().collect()
    }


def test_incremental_equals_one_shot(spark, view):
    b1 = _b(spark, [("a", 1), ("a", 5), ("b", 10)])
    b2 = _b(spark, [("a", 2), ("c", 7)])
    b3 = _b(spark, [("b", -3), ("c", 7)])
    for b in (b1, b2, b3):
        view.update(b)
    want = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in b1.unionByName(b2)
        .unionByName(b3)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        .collect()
    }
    assert _state(view) == want


def test_new_group_inserts_and_counts(spark, view):
    out1 = view.update(_b(spark, [("a", 1)]))
    # version: the committed ACID version — fold_batch_multi records it
    # on the multi-table txn so the decide record carries membership
    assert out1 == {"groups_touched": 1, "files_rewritten": 0, "version": 1}
    out2 = view.update(_b(spark, [("a", 2), ("z", 9)]))
    assert out2["groups_touched"] == 2
    assert _state(view) == {"a": (2, 3, 1, 2), "z": (1, 9, 9, 9)}


def test_untouched_groups_prune(spark, view):
    # many groups spread over several key-ranged files; a one-group batch
    # must not rewrite them all
    base = spark.range(0, 400).select(
        F.concat(F.lit("g"), F.format_string("%03d", F.col("id") % 100)).alias("g"),
        F.col("id").alias("x"),
    )
    view.update(base.repartitionByRange(8, "g"))
    out = view.update(_b(spark, [("g007", 1000)]))
    assert out["groups_touched"] == 1
    assert out["files_rewritten"] <= 2
    st = _state(view)
    assert st["g007"][0] == 5 and st["g007"][3] == 1000
    assert st["g008"] == (4, 8 + 108 + 208 + 308, 8, 308)


def test_unsupported_agg_kind_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported agg kinds"):
        MaterializedAgg(
            spark, str(tmp_path / "x"), keys=["g"], aggs=[("a", "avg", "x")]
        )


class TestCountDistinct:
    """Exact COUNT(DISTINCT) maintenance: every touched group recomputes
    from the pinned snapshot (distinctness is not invertible)."""

    def _setup(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.acid import AcidTable
        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
        from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

        bronze = AcidTable(spark, str(tmp_path / "bronze"))
        view = MaterializedAgg(
            spark,
            str(tmp_path / "silver"),
            keys=["g"],
            aggs=[("n", "count", ""), ("cd", "count_distinct", "u")],
        )
        consumer = ChangeFeedConsumer(
            bronze, source_keys=["k"], view=view, count_col="n"
        )
        return bronze, view, consumer

    def _state(self, consumer):
        return {r["g"]: (r["n"], r["cd"]) for r in consumer.state().collect()}

    def test_duplicate_insert_does_not_inflate(self, spark, tmp_path):
        bronze, _, c = self._setup(spark, tmp_path)
        bronze.write(
            spark.createDataFrame(
                [(1, "a", 10), (2, "a", 10), (3, "a", 20), (4, "b", 30)],
                "k long, g string, u long",
            ),
            stats_cols=["k"],
        )
        c.process_available()
        assert self._state(c) == {"a": (3, 2), "b": (1, 1)}
        bronze.write(
            spark.createDataFrame(
                [(5, "a", 10), (6, "b", 40)], "k long, g string, u long"
            ),
            mode="append",
        )
        c.process_available()
        assert self._state(c) == {"a": (4, 2), "b": (2, 2)}

    def test_retraction_with_surviving_twin_keeps_count(self, spark, tmp_path):
        bronze, _, c = self._setup(spark, tmp_path)
        bronze.write(
            spark.createDataFrame(
                [(1, "a", 10), (2, "a", 10), (3, "a", 20)],
                "k long, g string, u long",
            ),
            stats_cols=["k"],
        )
        c.process_available()
        # delete the ONLY u=20 row: cd drops
        bronze.merge(
            spark.createDataFrame([(3, "a", 20)], "k long, g string, u long"),
            keys=["k"],
            delete_matched=True,
        )
        c.process_available()
        assert self._state(c) == {"a": (2, 1)}
        # delete ONE of the two u=10 rows: twin survives, cd holds
        bronze.merge(
            spark.createDataFrame([(1, "a", 10)], "k long, g string, u long"),
            keys=["k"],
            delete_matched=True,
        )
        c.process_available()
        assert self._state(c) == {"a": (1, 1)}

    def test_group_move_and_full_retraction(self, spark, tmp_path):
        bronze, _, c = self._setup(spark, tmp_path)
        bronze.write(
            spark.createDataFrame(
                [(1, "a", 10), (2, "b", 30)], "k long, g string, u long"
            ),
            stats_cols=["k"],
        )
        c.process_available()
        # move k=2 from b to a with a new value
        bronze.merge(
            spark.createDataFrame([(2, "a", 30)], "k long, g string, u long"),
            keys=["k"],
        )
        c.process_available()
        assert self._state(c) == {"a": (2, 2)}  # b fully retracted, dropped

    def test_append_only_path_refuses_count_distinct(self, spark, tmp_path):
        import pytest as _pytest

        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

        view = MaterializedAgg(
            spark,
            str(tmp_path / "v"),
            keys=["g"],
            aggs=[("n", "count", ""), ("cd", "count_distinct", "u")],
        )
        with _pytest.raises(ValueError, match="count_distinct"):
            view.update(
                spark.createDataFrame([("a", 1)], "g string, u long")
            )


def test_optimize_recluster_keeps_state_and_restores_pruning(spark, tmp_path):
    """After many folds the state table fragments; optimize()
    re-clusters by group key so later merges prune again — state is
    unchanged by the rewrite."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    view = MaterializedAgg(
        spark, str(tmp_path / "v"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    for i in range(5):
        batch = spark.range(40).select(
            (F.col("id") % 20).cast("string").alias("g"),
            (F.col("id") + i).alias("x"),
        )
        view.update(batch)
    before = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    n_files_before = len(view.acid.snapshot_files())
    view.optimize(target_files=2)
    after = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert after == before
    files = view.acid.snapshot_files()
    assert len(files) <= max(2, n_files_before)
    # disjoint per-file key ranges: every file carries g-stats
    for a in files:
        assert "g" in (a.get("stats") or {})
    # and a fold after optimize still works
    view.update(
        spark.createDataFrame([("0", 7)], "g string, x long")
    )
    assert view.read().filter("g = '0'").collect()[0]["n"] == before["0"][0] + 1


def test_nullable_sum_reads_null_across_both_fold_paths(spark, tmp_path):
    """r10 nn-counter coverage for the MIXED lifecycle: a view seeded by
    append-only update() (count-based nn) and then maintained by
    update_changes() (signed nn) must read SUM as NULL exactly when no
    non-NULL value remains — and as the additive value otherwise."""
    view = MaterializedAgg(
        spark, str(tmp_path / "mvn"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    # append path: group a has ONE non-NULL, group b none at all
    view.update(
        spark.createDataFrame(
            [("a", 5), ("a", None), ("b", None)], "g string, x long"
        )
    )
    got = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert got == {"a": (2, 5), "b": (1, None)}
    # change-feed path: retract a's only non-NULL value
    feed = spark.createDataFrame(
        [("delete", "a", 5), ("insert", "b", None)],
        "change_type string, g string, x long",
    )
    view.update_changes(feed)
    got = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert got == {"a": (1, None), "b": (2, None)}
    # and a later insert revives the sum from the additive 0 state
    view.update_changes(
        spark.createDataFrame(
            [("insert", "a", 7)], "change_type string, g string, x long"
        )
    )
    got = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert got["a"] == (2, 7)
