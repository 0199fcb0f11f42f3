"""MaterializedJoin (sinks/joinview.py): delta-join incremental view
maintenance — state equals the one-shot bronze ⋈ dim after any
sequence of writes/merges/deletes, the key-moved-out-of-dim case
removes rows under inner semantics, upserts+deletes publish in one
atomic commit (AcidTable.merge delete_keys), and folds prune
untouched state files."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer


def _dim(spark):
    return spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY"), (3, "FURNITURE")],
        "c_id long, seg string",
    )


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k long, cust long, x long")


def _setup(spark, tmp_path, how="inner"):
    bronze = AcidTable(spark, str(tmp_path / f"jb_{how}"))
    view = MaterializedJoin(
        spark, str(tmp_path / f"jv_{how}"),
        row_keys=["k"], dim=_dim(spark), on=[("cust", "c_id")], how=how,
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view)
    return bronze, view, consumer


def _want(spark, bronze, how):
    return {
        r["k"]: (r["cust"], r["x"], r["seg"])
        for r in bronze.read().join(
            _dim(spark), F.col("cust") == F.col("c_id"), how
        ).collect()
    }


def _got(consumer):
    return {
        r["k"]: (r["cust"], r["x"], r["seg"])
        for r in consumer.state().collect()
    }


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_view_tracks_bronze(spark, tmp_path, how):
    bronze, view, consumer = _setup(spark, tmp_path, how)
    # cust 9 matches no dim row: dropped under inner, NULL seg under left
    bronze.write(
        _facts(spark, [(1, 1, 10), (2, 2, 5), (3, 9, 7)]), stats_cols=["k"]
    )
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze, how)

    # value update + insert + re-assignment INTO the dim
    bronze.merge(_facts(spark, [(2, 2, 50), (3, 3, 7), (4, 1, 1)]), keys=["k"])
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze, how)

    # re-assignment OUT of the dim (cust 9): inner drops the row,
    # left keeps it with NULL dim columns
    bronze.merge(_facts(spark, [(1, 9, 10)]), keys=["k"])
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze, how)
    if how == "inner":
        assert 1 not in _got(consumer)
    else:
        assert _got(consumer)[1] == (9, 10, None)

    # outright delete
    bronze.merge(_facts(spark, [(2, 2, 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze, how)
    assert 2 not in _got(consumer)


def test_join_view_replay_is_noop_and_atomic(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_facts(spark, [(1, 1, 10), (2, 2, 5)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(_facts(spark, [(1, 3, 11)]), keys=["k"])
    bronze.merge(_facts(spark, [(2, 2, 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()  # one fold spans both commits
    # the upsert of k=1 and the delete of k=2 landed in ONE view commit
    assert view.acid.latest_version() == 2
    before = _got(consumer)
    assert before == _want(spark, bronze, "inner")
    # crash restart: marker in the commit log, replay no-ops
    c2 = ChangeFeedConsumer(bronze, ["k"], view)
    assert c2.process_available()["versions_behind"] == 0
    assert _got(c2) == before


def test_join_view_fold_prunes_untouched_files(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    facts = _facts(spark, [(k, (k % 3) + 1, k * 10) for k in range(1, 41)])
    bronze.write(facts.repartition(4, "k"), stats_cols=["k"])
    # seed the view as a 4-file layout (binpack would collapse this tiny
    # state into one file, leaving nothing to prune) with the consumer's
    # progress marker inside the same commit
    joined = bronze.read().join(_dim(spark), F.col("cust") == F.col("c_id"))
    view.acid.write(
        joined.repartition(4, "k"),
        stats_cols=["k"],
        extra_meta={"stream_id": consumer.stream_id, "batch_id": 1},
        binpack=False,
    )
    assert consumer.last_processed_version() == 1
    # touch one key: the fold must rewrite a strict subset of files
    bronze.merge(_facts(spark, [(7, 2, 777)]), keys=["k"])
    stats = consumer.process_available()
    assert stats["files_pruned"] >= 1
    assert stats["files_rewritten"] >= 1
    assert _got(consumer) == _want(spark, bronze, "inner")


def test_consumer_count_col_contract(spark, tmp_path):
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    bronze = AcidTable(spark, str(tmp_path / "cb"))
    agg_view = MaterializedAgg(
        spark, str(tmp_path / "cv"), keys=["g"], aggs=[("n", "count", "")]
    )
    # aggregate views must name their count column
    with pytest.raises(ValueError, match="count_col"):
        ChangeFeedConsumer(bronze, ["k"], agg_view)


def test_merge_delete_keys_with_upserts_single_commit(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "dk"))
    t.write(
        _facts(spark, [(1, 1, 10), (2, 2, 20), (3, 3, 30)]), stats_cols=["k"]
    )
    v0 = t.latest_version()
    # upsert k=1 (update) + k=9 (insert), delete k=3 — one commit
    t.merge(
        _facts(spark, [(1, 1, 11), (9, 9, 90)]),
        keys=["k"],
        delete_keys=spark.createDataFrame([(3,)], "k long"),
    )
    assert t.latest_version() == v0 + 1
    got = {r["k"]: r["x"] for r in t.read().collect()}
    assert got == {1: 11, 2: 20, 9: 90}


def test_merge_delete_keys_overlap_source_wins(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "dk2"))
    t.write(_facts(spark, [(1, 1, 10)]), stats_cols=["k"])
    t.merge(
        _facts(spark, [(1, 1, 99)]),
        keys=["k"],
        delete_keys=spark.createDataFrame([(1,)], "k long"),
    )
    assert {r["k"]: r["x"] for r in t.read().collect()} == {1: 99}


def test_merge_delete_keys_exclusive_with_delete_matched(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "dk3"))
    t.write(_facts(spark, [(1, 1, 10)]), stats_cols=["k"])
    with pytest.raises(ValueError, match="exclusive"):
        t.merge(
            _facts(spark, [(1, 1, 11)]),
            keys=["k"],
            delete_matched=True,
            delete_keys=spark.createDataFrame([(1,)], "k long"),
        )


def _dim_table(spark, tmp_path, name="dimacid"):
    t = AcidTable(spark, str(tmp_path / name))
    t.write(
        spark.createDataFrame(
            [(1, "BUILDING"), (2, "MACHINERY"), (3, "FURNITURE")],
            "c_id long, seg string",
        ),
        stats_cols=["c_id"],
    )
    return t


def _dim_rows(spark, rows):
    return spark.createDataFrame(rows, "c_id long, seg string")


def test_dim_churn_update_delete_reinsert(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "dcb"))
    dim = _dim_table(spark, tmp_path)
    view = MaterializedJoin(
        spark, str(tmp_path / "dcv"), row_keys=["k"],
        dim=lambda: dim.read(), on=[("cust", "c_id")], how="left",
    )
    rows_c = ChangeFeedConsumer(bronze, ["k"], view)
    dim_c = ChangeFeedConsumer(dim, ["c_id"], view, dim_side=True)
    bronze.write(
        _facts(spark, [(1, 1, 10), (2, 2, 5), (3, 2, 7), (4, 9, 1)]),
        stats_cols=["k"],
    )
    rows_c.process_available()
    # baseline marker: the view reflects dim v1 already
    view.acid._commit(
        view.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_c.stream_id, "batch_id": 1},
    )

    def got():
        return {r["k"]: (r["cust"], r["seg"]) for r in dim_c.state().collect()}

    # rename: every order of cust 2 sees the new segment
    dim.merge(_dim_rows(spark, [(2, "RENAMED")]), keys=["c_id"])
    dim_c.process_available()
    assert got() == {1: (1, "BUILDING"), 2: (2, "RENAMED"),
                     3: (2, "RENAMED"), 4: (9, None)}

    # GDPR delete: cust 1's orders NULL their dim columns
    dim.merge(_dim_rows(spark, [(1, "X")]), keys=["c_id"], delete_matched=True)
    dim_c.process_available()
    assert got()[1] == (1, None)

    # late insert of cust 9: the NULL row revives — the case that
    # forces how='left'
    dim.merge(_dim_rows(spark, [(9, "LATE")]), keys=["c_id"])
    dim_c.process_available()
    assert got()[4] == (9, "LATE")
    # end state equals the one-shot left join against the final dim
    want = {
        r["k"]: (r["cust"], r["seg"])
        for r in bronze.read().join(
            dim.read(), F.col("cust") == F.col("c_id"), "left"
        ).collect()
    }
    assert got() == want


def test_dim_churn_refused_for_inner(spark, tmp_path):
    dim = _dim_table(spark, tmp_path, "dimacid2")
    view = MaterializedJoin(
        spark, str(tmp_path / "dcv2"), row_keys=["k"],
        dim=lambda: dim.read(), on=[("cust", "c_id")], how="inner",
    )
    feed = dim.changes(["c_id"], v_from=0, v_to=1)
    with pytest.raises(ValueError, match="left"):
        view.update_dim_changes(feed)
    with pytest.raises(ValueError, match="MaterializedJoin"):
        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
        agg = MaterializedAgg(
            spark, str(tmp_path / "nope"), keys=["g"], aggs=[("n", "count", "")]
        )
        ChangeFeedConsumer(dim, ["c_id"], agg, count_col="n", dim_side=True)


def test_dim_churn_replay_is_noop(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "dcb3"))
    dim = _dim_table(spark, tmp_path, "dimacid3")
    view = MaterializedJoin(
        spark, str(tmp_path / "dcv3"), row_keys=["k"],
        dim=lambda: dim.read(), on=[("cust", "c_id")], how="left",
    )
    ChangeFeedConsumer(bronze, ["k"], view)  # construction only
    bronze.write(_facts(spark, [(1, 1, 10)]), stats_cols=["k"])
    ChangeFeedConsumer(bronze, ["k"], view).process_available()
    dim_c = ChangeFeedConsumer(dim, ["c_id"], view, dim_side=True)
    view.acid._commit(
        view.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_c.stream_id, "batch_id": 1},
    )
    dim.merge(_dim_rows(spark, [(1, "NEW")]), keys=["c_id"])
    dim_c.process_available()
    versions = view.acid.latest_version()
    # crash restart on BOTH consumers: no double-apply
    assert ChangeFeedConsumer(
        dim, ["c_id"], view, dim_side=True
    ).process_available()["versions_behind"] == 0
    assert ChangeFeedConsumer(
        bronze, ["k"], view
    ).process_available()["versions_behind"] == 0
    assert view.acid.latest_version() == versions
