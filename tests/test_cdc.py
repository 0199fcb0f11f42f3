"""CDC APPLY CHANGES (sinks/cdc.py): sequence-keyed folds of
out-of-order change events — stale suppression, deterministic in-batch
ties, ambiguity refusal, the physical-delete re-insert caveat, and the
tombstone mode's batching invariance."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.cdc import apply_changes, read_current


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, op string, v string")


def _state(table):
    return {r["k"]: (r["seq"], r["op"], r["v"]) for r in table.read().collect()}


@pytest.fixture()
def table(spark, tmp_path):
    return AcidTable(spark, str(tmp_path / "cdc"))


def test_stale_update_is_suppressed(spark, table):
    apply_changes(table, _df(spark, [(1, 10, "U", "new")]),
                  keys=["k"], sequence_by="seq")
    apply_changes(table, _df(spark, [(1, 5, "U", "old")]),
                  keys=["k"], sequence_by="seq")
    assert _state(table) == {1: (10, "U", "new")}
    # equal sequence re-applies (idempotent redelivery: same values)
    apply_changes(table, _df(spark, [(1, 10, "U", "new")]),
                  keys=["k"], sequence_by="seq")
    assert _state(table) == {1: (10, "U", "new")}


def test_in_batch_collapse_delete_wins_sequence_tie(spark, table):
    # same key: insert at seq 7 and delete at seq 7 in ONE batch ->
    # delete wins the tie, key never materializes
    apply_changes(
        table,
        _df(spark, [(1, 7, "U", "x"), (1, 7, "D", None), (2, 1, "U", "y")]),
        keys=["k"], sequence_by="seq",
    )
    assert _state(table) == {2: (1, "U", "y")}


def test_in_batch_highest_sequence_wins(spark, table):
    apply_changes(
        table,
        _df(spark, [(1, 1, "U", "a"), (1, 3, "U", "c"), (1, 2, "U", "b")]),
        keys=["k"], sequence_by="seq",
    )
    assert _state(table) == {1: (3, "U", "c")}


def test_ambiguous_same_key_seq_op_refused(spark, table):
    with pytest.raises(ValueError, match="deterministic winner"):
        apply_changes(
            table,
            _df(spark, [(1, 5, "U", "a"), (1, 5, "U", "b")]),
            keys=["k"], sequence_by="seq",
        )
    # exact duplicates are NOT ambiguous — they collapse
    apply_changes(
        table,
        _df(spark, [(1, 5, "U", "a"), (1, 5, "U", "a")]),
        keys=["k"], sequence_by="seq",
    )
    assert _state(table) == {1: (5, "U", "a")}


def test_physical_delete_and_its_reinsert_caveat(spark, table):
    apply_changes(table, _df(spark, [(1, 10, "U", "x"), (2, 10, "U", "y")]),
                  keys=["k"], sequence_by="seq")
    apply_changes(table, _df(spark, [(1, 20, "D", None)]),
                  keys=["k"], sequence_by="seq")
    assert set(_state(table)) == {2}
    # unmatched delete is a no-op (not an insert)
    apply_changes(table, _df(spark, [(9, 1, "D", None)]),
                  keys=["k"], sequence_by="seq")
    assert set(_state(table)) == {2}
    # the documented caveat: the deleted row's sequence is gone, so an
    # EARLIER event arriving in a LATER batch re-inserts
    apply_changes(table, _df(spark, [(1, 5, "U", "stale")]),
                  keys=["k"], sequence_by="seq")
    assert _state(table)[1] == (5, "U", "stale")


def test_tombstones_suppress_across_batches_any_order(spark, tmp_path):
    """Tombstone mode: the final current state equals per-key argmax by
    sequence REGARDLESS of how events are batched — including deletes
    arriving before the insert they kill."""
    events = [
        (1, 10, "U", "a"), (1, 20, "D", None), (1, 5, "U", "stale"),
        (2, 10, "U", "b"), (2, 15, "U", "b2"),
        (3, 30, "D", None), (3, 40, "U", "revived"),
    ]
    want = {2: (15, "U", "b2"), 3: (40, "U", "revived")}
    orders = [
        [events[:3], events[3:5], events[5:]],
        [events[5:], events[:3], events[3:5]],          # deletes-first
        [[e] for e in reversed(events)],                # fully reversed
    ]
    for i, batches in enumerate(orders):
        t = AcidTable(spark, str(tmp_path / f"ts{i}"))
        for b in batches:
            apply_changes(t, _df(spark, b), keys=["k"], sequence_by="seq",
                          tombstones=True)
        got = {
            r["k"]: (r["seq"], r["op"], r["v"])
            for r in read_current(t).collect()
        }
        assert got == want, f"order {i}: {got}"
        # tombstone rows are physically retained
        assert t.read().filter(F.col("op") == "D").count() == 1


def test_tombstone_same_sequence_tie_across_batches(spark, tmp_path):
    """Cross-batch tie rule == in-batch tie rule: a same-sequence U/D
    pair nets to absent no matter how the pair is split across batches.
    (Regression: update_when = 's.seq >= t.seq' let a later-batch
    same-sequence upsert overwrite the stored tombstone.)"""
    u, d = (1, 10, "U", "a"), (1, 10, "D", None)
    splits = [
        [[u, d]],        # together (in-batch collapse)
        [[u], [d]],      # upsert first
        [[d], [u]],      # delete first — the regression case
    ]
    for i, batches in enumerate(splits):
        t = AcidTable(spark, str(tmp_path / f"tie{i}"))
        for b in batches:
            apply_changes(t, _df(spark, b), keys=["k"], sequence_by="seq",
                          tombstones=True)
        assert read_current(t).count() == 0, f"split {i}: key resurrected"
        stored = t.read().collect()
        assert len(stored) == 1 and stored[0]["op"] == "D", f"split {i}"
        # and a strictly newer upsert still revives the key
        apply_changes(t, _df(spark, [(1, 11, "U", "back")]),
                      keys=["k"], sequence_by="seq", tombstones=True)
        assert {r["k"]: r["v"] for r in read_current(t).collect()} == {1: "back"}


def test_tombstone_replay_is_idempotent(spark, table):
    batch = _df(spark, [(1, 10, "U", "a"), (2, 20, "D", None)])
    apply_changes(table, batch, keys=["k"], sequence_by="seq",
                  tombstones=True)
    v = table.latest_version()
    apply_changes(table, batch, keys=["k"], sequence_by="seq",
                  tombstones=True)
    # value-idempotent (a redelivered batch changes nothing)
    assert {r["k"]: r["v"] for r in read_current(table).collect()} == {1: "a"}
    assert table.latest_version() > v  # a commit happened, a no-op one
