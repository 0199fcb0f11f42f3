"""Change-feed consumer (streaming/cdf.py): the bronze->silver hop —
silver equals one-shot groupBy over the bronze snapshot after any
sequence of writes/merges/deletes, replays are no-ops, retraction
drops emptied groups, min/max aggs maintain by touched-group
recompute, and the silver->gold second hop chains exactly-once."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer


def _setup(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "bronze"))
    view = MaterializedAgg(
        spark, str(tmp_path / "silver"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    return bronze, view, consumer

def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, x long")


def _want(spark, bronze):
    return {
        r["g"]: (r["n"], r["s"])
        for r in bronze.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }


def _got(consumer):
    return {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()}


def test_silver_tracks_bronze_through_write_merge_delete(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 7)]),
                 stats_cols=["k"])
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze)

    bronze.merge(_df(spark, [(2, "a", 50), (4, "c", 1)]), keys=["k"])
    stats = consumer.process_available()
    assert stats["versions_behind"] == 1
    assert _got(consumer) == _want(spark, bronze)

    bronze.merge(_df(spark, [(1, "a", 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze)


def test_replay_and_crash_are_noops(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 1)]), stats_cols=["k"])
    consumer.process_available()
    versions = view.acid.latest_version()
    # nothing new: no commit published
    out = consumer.process_available()
    assert out["versions_behind"] == 0
    assert view.acid.latest_version() == versions
    # a fresh consumer instance (crash restart) reads the marker from
    # the silver commit log and also no-ops
    c2 = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    assert c2.last_processed_version() == bronze.latest_version()
    assert c2.process_available()["versions_behind"] == 0


def test_group_retracted_to_zero_disappears(spark, tmp_path):
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 1), (2, "b", 2)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(_df(spark, [(2, "b", 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got(consumer) == {"a": (1, 1)}
    # the zero-count row physically remains (single-commit atomicity)
    assert view.read().filter("g = 'b'").collect()[0]["n"] == 0


def test_min_max_without_snapshot_rejected(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "b2"))
    view = MaterializedAgg(
        spark, str(tmp_path / "s2"), keys=["g"],
        aggs=[("n", "count", ""), ("hi", "max", "x")],
    )
    bronze.write(_df(spark, [(1, "a", 1)]), stats_cols=["k"])
    feed = bronze.changes(["k"], v_from=0, v_to=1)
    with pytest.raises(ValueError, match="snapshot"):
        view.update_changes(feed)  # direct call, no snapshot provided
    with pytest.raises(ValueError, match="count aggregate"):
        ChangeFeedConsumer(bronze, ["k"], view, count_col="hi")


def _minmax_setup(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "bmm"))
    view = MaterializedAgg(
        spark, str(tmp_path / "smm"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x"),
              ("lo", "min", "x"), ("hi", "max", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    return bronze, view, consumer


def _want_minmax(spark, bronze):
    return {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in bronze.read().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
            F.min("x").alias("lo"), F.max("x").alias("hi"),
        ).collect()
    }


def _got_minmax(consumer):
    return {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in consumer.state().collect()
    }


def test_minmax_tracks_bronze_through_extreme_deletes(spark, tmp_path):
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(
        _df(spark, [(1, "a", 10), (2, "a", 5), (3, "a", 10), (4, "b", 7)]),
        stats_cols=["k"],
    )
    consumer.process_available()
    assert _got_minmax(consumer) == _want_minmax(spark, bronze)

    # delete ONE of a's two max rows: recompute must find the surviving
    # duplicate (fold alone cannot — this is the non-invertible case)
    bronze.merge(_df(spark, [(1, "a", 10)]), keys=["k"], delete_matched=True)
    stats = consumer.process_available()
    assert stats["groups_recomputed"] == 1
    assert _got_minmax(consumer) == _want_minmax(spark, bronze)
    assert _got_minmax(consumer)["a"] == (2, 15, 5, 10)

    # delete the last max holder: extreme actually drops
    bronze.merge(_df(spark, [(3, "a", 10)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got_minmax(consumer)["a"] == (1, 5, 5, 5)

    # delete a's min: min recompute path
    bronze.merge(_df(spark, [(2, "a", 5)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert _got_minmax(consumer) == {"b": (1, 7, 7, 7)}
    # fully-retracted group: zero count, NULL extremes in raw state
    raw = view.read().filter("g = 'a'").collect()[0]
    assert raw["n"] == 0 and raw["lo"] is None and raw["hi"] is None


def test_minmax_insert_only_fold_skips_recompute(spark, tmp_path):
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10)]), stats_cols=["k"])
    consumer.process_available()
    # pure insert: extremes fold with least/greatest, no snapshot scan
    bronze.merge(_df(spark, [(2, "a", 99), (3, "a", 1)]), keys=["k"])
    stats = consumer.process_available()
    assert stats["groups_recomputed"] == 0
    assert _got_minmax(consumer)["a"] == (3, 110, 1, 99)


def test_minmax_safe_retraction_skips_recompute(spark, tmp_path):
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "a", 5), (3, "a", 7)]),
                 stats_cols=["k"])
    consumer.process_available()
    # retract a strictly interior value: neither extreme threatened
    bronze.merge(_df(spark, [(3, "a", 7)]), keys=["k"], delete_matched=True)
    stats = consumer.process_available()
    assert stats["groups_recomputed"] == 0
    assert _got_minmax(consumer)["a"] == (2, 15, 5, 10)


def test_minmax_update_moves_extreme(spark, tmp_path):
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "a", 5)]), stats_cols=["k"])
    consumer.process_available()
    # update the max holder DOWN: preimage retracts the extreme
    # (recompute), postimage inserts the new value (fold)
    bronze.merge(_df(spark, [(1, "a", 6)]), keys=["k"])
    stats = consumer.process_available()
    assert stats["groups_recomputed"] == 1
    assert _got_minmax(consumer)["a"] == (2, 11, 5, 6)
    assert _got_minmax(consumer) == _want_minmax(spark, bronze)


def test_minmax_replay_is_noop(spark, tmp_path):
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "a", 5)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(_df(spark, [(1, "a", 10)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    before = _got_minmax(consumer)
    versions = view.acid.latest_version()
    # fresh consumer (crash restart): marker read from the commit log
    c2 = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    assert c2.process_available()["versions_behind"] == 0
    assert view.acid.latest_version() == versions
    assert _got_minmax(c2) == before


def _two_hop_setup(spark, tmp_path):
    bronze = AcidTable(spark, str(tmp_path / "th_b"))
    silver = MaterializedAgg(
        spark, str(tmp_path / "th_s"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    hop1 = ChangeFeedConsumer(bronze, ["k"], silver, count_col="n")
    gold = MaterializedAgg(
        spark, str(tmp_path / "th_g"), keys=["bucket"],
        aggs=[("n_groups", "count", ""), ("active", "sum", "has_rows"),
              ("total", "sum", "s")],
    )
    hop2 = ChangeFeedConsumer(
        silver.acid, ["g"], gold, count_col="n_groups",
        feed_transform=lambda df: df.withColumn(
            "bucket", F.substring("g", 1, 1)
        ).withColumn("has_rows", (F.col("n") > 0).cast("bigint")),
    )
    return bronze, silver, hop1, gold, hop2


def _gold_got(hop2):
    return {
        r["bucket"]: (r["n_groups"], r["active"], r["total"])
        for r in hop2.state().collect()
    }


def test_two_hop_tracks_bronze(spark, tmp_path):
    bronze, silver, hop1, gold, hop2 = _two_hop_setup(spark, tmp_path)
    bronze.write(
        _df(spark, [(1, "a1", 10), (2, "a2", 5), (3, "b1", 7)]),
        stats_cols=["k"],
    )
    hop1.process_available()
    hop2.process_available()
    assert _gold_got(hop2) == {"a": (2, 2, 15), "b": (1, 1, 7)}

    # update + insert ripple through both hops
    bronze.merge(_df(spark, [(2, "a2", 50), (4, "b2", 1)]), keys=["k"])
    hop1.process_available()
    hop2.process_available()
    assert _gold_got(hop2) == {"a": (2, 2, 60), "b": (2, 2, 8)}

    # fully retract group a2: gold's indicator fold drops active by 1,
    # n_groups (state rows ever) stays — the zero-count-row contract
    bronze.merge(_df(spark, [(2, "a2", 0)]), keys=["k"], delete_matched=True)
    hop1.process_available()
    hop2.process_available()
    assert _gold_got(hop2) == {"a": (2, 1, 10), "b": (2, 2, 8)}


def test_two_hop_crash_between_hops_is_exactly_once(spark, tmp_path):
    bronze, silver, hop1, gold, hop2 = _two_hop_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a1", 10), (3, "b1", 7)]), stats_cols=["k"])
    hop1.process_available()
    hop2.process_available()
    bronze.merge(_df(spark, [(1, "a1", 20)]), keys=["k"])
    hop1.process_available()
    # CRASH before hop2 runs; restart re-creates both consumers
    h1b = ChangeFeedConsumer(bronze, ["k"], silver, count_col="n")
    h2b = ChangeFeedConsumer(
        silver.acid, ["g"], gold, count_col="n_groups",
        feed_transform=hop2.feed_transform,
    )
    assert h1b.process_available()["versions_behind"] == 0  # hop1 replay: no-op
    assert h2b.process_available()["versions_behind"] == 1  # hop2 catches up
    assert _gold_got(h2b) == {"a": (1, 1, 20), "b": (1, 1, 7)}
    # second restart: both no-op, state unchanged
    assert h2b.process_available()["versions_behind"] == 0
    assert _gold_got(h2b) == {"a": (1, 1, 20), "b": (1, 1, 7)}


def test_minmax_recompute_handles_null_group_key(spark, tmp_path):
    """A NULL group key must fold and RECOMPUTE like any other group —
    the broadcast semi/equi joins in the recompute path are eqNullSafe,
    matching groupBy's NULL-group semantics."""
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(
        spark.createDataFrame(
            [(1, None, 10), (2, None, 5), (3, "a", 7)], "k long, g string, x long"
        ),
        stats_cols=["k"],
    )
    consumer.process_available()
    assert _got_minmax(consumer)[None] == (2, 15, 5, 10)
    # delete the NULL group's max holder: recompute must find the rest
    bronze.merge(
        spark.createDataFrame([(1, None, 10)], "k long, g string, x long"),
        keys=["k"], delete_matched=True,
    )
    stats = consumer.process_available()
    assert stats["groups_recomputed"] == 1
    assert _got_minmax(consumer) == _want_minmax(spark, bronze)
    assert _got_minmax(consumer)[None] == (1, 5, 5, 5)


def test_two_hop_gold_minmax_recomputes_against_silver(spark, tmp_path):
    """MIN/MAX in the GOLD hop: when a silver group's sum is retracted
    downward, gold's max-over-sums must recompute against the SILVER
    snapshot (the consumer passes the version-pinned upstream state
    through feed_transform into update_changes). Gold aggregates silver
    STATE rows — zero-count rows included, by the persistence contract."""
    bronze = AcidTable(spark, str(tmp_path / "gb"))
    silver = MaterializedAgg(
        spark, str(tmp_path / "gs"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    hop1 = ChangeFeedConsumer(bronze, ["k"], silver, count_col="n")
    gold = MaterializedAgg(
        spark, str(tmp_path / "gg"), keys=["bucket"],
        aggs=[("n_groups", "count", ""), ("hi_sum", "max", "s")],
    )
    hop2 = ChangeFeedConsumer(
        silver.acid, ["g"], gold, count_col="n_groups",
        feed_transform=lambda df: df.withColumn(
            "bucket", F.substring("g", 1, 1)
        ),
    )
    bronze.write(
        _df(spark, [(1, "a1", 10), (2, "a2", 5), (3, "b1", 7)]),
        stats_cols=["k"],
    )
    hop1.process_available()
    hop2.process_available()
    got = {r["bucket"]: r["hi_sum"] for r in hop2.state().collect()}
    assert got == {"a": 10, "b": 7}

    # retract the max-holding silver group's rows: gold recompute finds
    # the surviving group's sum (a2=5) via the silver snapshot
    bronze.merge(_df(spark, [(1, "a1", 0)]), keys=["k"], delete_matched=True)
    hop1.process_available()
    stats = hop2.process_available()
    assert stats["groups_recomputed"] == 1
    got = {r["bucket"]: r["hi_sum"] for r in hop2.state().collect()}
    # a1's state row persists with s=0, so max over {0, 5} is 5
    assert got == {"a": 5, "b": 7}


def test_metadata_only_span_is_noop(spark, tmp_path):
    """SET_CONSTRAINT / no-op merge-delete commits change no data
    files; the consumer must report a no-op, not crash in changes()."""
    bronze, view, consumer = _setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 1)]), stats_cols=["k"])
    consumer.process_available()
    bronze.add_constraint("x_small", "x < 1000")
    bronze.merge(_df(spark, [(99, "z", 0)]), keys=["k"], delete_matched=True)
    out = consumer.process_available()
    assert out.get("metadata_only") is True
    assert out["versions_behind"] == 2
    assert _got(consumer) == _want(spark, bronze)
    # a later data commit folds the whole span normally
    bronze.merge(_df(spark, [(2, "b", 5)]), keys=["k"])
    consumer.process_available()
    assert _got(consumer) == _want(spark, bronze)


def test_full_table_delete_folds_to_empty_state(spark, tmp_path):
    """Deleting EVERY bronze row: the minmax recompute snapshot has no
    files; the fold must still land (zero counts, NULL extremes) and
    state() must read empty."""
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "b", 5)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(
        _df(spark, [(1, "a", 0), (2, "b", 0)]), keys=["k"], delete_matched=True
    )
    consumer.process_available()
    assert _got_minmax(consumer) == {}
    raw = {r["g"]: (r["n"], r["lo"], r["hi"]) for r in view.read().collect()}
    assert raw == {"a": (0, None, None), "b": (0, None, None)}


def test_group_revives_after_full_retraction(spark, tmp_path):
    """A group retracted to zero (NULL extremes in state) must revive
    cleanly when new rows insert: the fold treats the NULL-extreme
    state like an absent side and takes the insert-side extremes."""
    bronze, view, consumer = _minmax_setup(spark, tmp_path)
    bronze.write(_df(spark, [(1, "a", 10), (2, "b", 3)]), stats_cols=["k"])
    consumer.process_available()
    bronze.merge(_df(spark, [(1, "a", 0)]), keys=["k"], delete_matched=True)
    consumer.process_available()
    assert "a" not in _got_minmax(consumer)
    bronze.merge(_df(spark, [(5, "a", 42), (6, "a", 7)]), keys=["k"])
    consumer.process_available()
    assert _got_minmax(consumer)["a"] == (2, 49, 7, 42)
    assert _got_minmax(consumer) == _want_minmax(spark, bronze)


def test_consumer_skips_pending_and_aborted_txn_commits(spark, tmp_path):
    """Composability of the CDF hop with multi-table txns: a bronze
    commit staged under an undecided txn is invisible to the consumer
    (no-op span, NO marker published — the post-decide span re-checks
    and folds); an aborted stage never folds."""
    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.sinks.txn import MultiTableTxn
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    bronze = AcidTable(spark, str(tmp_path / "b"))
    view = MaterializedAgg(
        spark, str(tmp_path / "s"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    bronze.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, g string, x long"
        ),
        stats_cols=["k"],
    )
    consumer.process_available()
    txn = MultiTableTxn(str(tmp_path / "_txns"))
    txn.stage_write(
        bronze,
        spark.createDataFrame([(3, "a", 30)], "k long, g string, x long"),
        mode="append",
    )
    out = consumer.process_available()
    # pending tip: the span CLAMPS below it (v_to walks back past the
    # unresolved commit), so nothing folds and no marker publishes —
    # the post-decide span covers it. Before the clamp, a mixed span
    # ending on a pending tip would publish batch_id = tip and the
    # txn's rows would never fold once it committed.
    assert out["versions_behind"] == 0 and not out.get("metadata_only")
    txn.commit()
    consumer.process_available()  # the same span now folds
    assert {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()} == {
        "a": (2, 40),
        "b": (1, 20),
    }
    t2 = MultiTableTxn(str(tmp_path / "_txns"))
    t2.stage_write(
        bronze,
        spark.createDataFrame([(4, "b", 40)], "k long, g string, x long"),
        mode="append",
    )
    t2.abort()
    out = consumer.process_available()
    assert out.get("metadata_only")  # aborted: permanently invisible
    assert {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()} == {
        "a": (2, 40),
        "b": (1, 20),
    }
