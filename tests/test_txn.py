"""Multi-table atomic transactions (sinks/txn.py): 2PC with presumed
abort over the AcidTable log. The decide point is ONE atomic marker
create; staged commits are invisible before it, visible together after
it, and permanently dead after abort."""

from __future__ import annotations

import pytest

from data_pipeline_platform_spark.sinks.acid import (
    AcidTable,
    TxnPendingError,
)
from data_pipeline_platform_spark.sinks.txn import MultiTableTxn, TxnDecidedError


@pytest.fixture()
def pair(spark, tmp_path):
    facts = AcidTable(spark, str(tmp_path / "facts"))
    audit = AcidTable(spark, str(tmp_path / "audit"))
    facts.write(
        spark.createDataFrame([(1, 100), (2, 200)], "k long, v long"),
        stats_cols=["k"],
    )
    audit.write(spark.createDataFrame([("init", 2)], "event string, n long"))
    return facts, audit, str(tmp_path / "_txns")


def test_staged_commits_invisible_until_marker_then_visible_together(
    spark, pair
):
    facts, audit, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_merge(
        facts,
        spark.createDataFrame([(2, 222), (3, 300)], "k long, v long"),
        keys=["k"],
    )
    txn.stage_write(
        audit,
        spark.createDataFrame([("merge", 2)], "event string, n long"),
        mode="append",
    )
    # before the marker: both tables read pre-txn
    assert {r["k"]: r["v"] for r in facts.read().collect()} == {1: 100, 2: 200}
    assert audit.read().count() == 1
    txn.commit()
    # after ONE marker create: both visible
    assert {r["k"]: r["v"] for r in facts.read().collect()} == {
        1: 100,
        2: 222,
        3: 300,
    }
    assert audit.read().count() == 2


def test_pending_txn_blocks_other_writers(spark, pair):
    facts, _, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts, spark.createDataFrame([(9, 9)], "k long, v long"), mode="append"
    )
    with pytest.raises(TxnPendingError, match="unresolved txn"):
        facts.write(
            spark.createDataFrame([(8, 8)], "k long, v long"), mode="append"
        )
    with pytest.raises(TxnPendingError):
        facts.merge(
            spark.createDataFrame([(1, 111)], "k long, v long"), keys=["k"]
        )
    txn.commit()
    facts.write(
        spark.createDataFrame([(8, 8)], "k long, v long"), mode="append"
    )
    assert facts.read().count() == 4


def test_abort_is_permanent_and_unblocks(spark, pair):
    facts, _, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts, spark.createDataFrame([(9, 9)], "k long, v long"), mode="append"
    )
    txn.abort()
    assert facts.read().count() == 2  # staged rows never appear
    facts.write(
        spark.createDataFrame([(8, 8)], "k long, v long"), mode="append"
    )
    assert {r["k"] for r in facts.read().collect()} == {1, 2, 8}
    # aborted staged files are vacuum-able orphans
    removed = facts.vacuum()
    assert removed  # at least the aborted txn's file
    assert facts.read().count() == 3


def test_crash_recovery_presumed_abort(spark, pair):
    facts, audit, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts, spark.createDataFrame([(7, 7)], "k long, v long"), mode="append"
    )
    # coordinator "crashes" before decide; a writer hits the block and
    # runs recovery
    ids = MultiTableTxn.recover(coord, [facts, audit])
    assert len(ids) == 1
    assert facts.read().count() == 2
    facts.write(
        spark.createDataFrame([(8, 8)], "k long, v long"), mode="append"
    )
    assert facts.read().count() == 3


def test_recover_never_touches_committed_txns(spark, pair):
    facts, audit, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts, spark.createDataFrame([(7, 7)], "k long, v long"), mode="append"
    )
    txn.commit()
    ids = MultiTableTxn.recover(coord, [facts, audit])
    assert ids == []
    assert facts.read().count() == 3


def test_decide_is_exclusive_and_idempotent(spark, pair):
    facts, _, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts, spark.createDataFrame([(7, 7)], "k long, v long"), mode="append"
    )
    txn.commit()
    txn.commit()  # idempotent
    with pytest.raises(TxnDecidedError, match="already committed"):
        txn.abort()
    with pytest.raises(TxnDecidedError, match="already committed"):
        txn.stage_write(
            facts,
            spark.createDataFrame([(6, 6)], "k long, v long"),
            mode="append",
        )


def test_changes_span_across_txn_commits(spark, pair):
    """The CDF diff sees a committed txn's rows and never an aborted
    one's — downstream consumers ride txn boundaries for free."""
    facts, _, coord = pair
    v0 = facts.latest_version()
    good = MultiTableTxn(coord)
    good.stage_write(
        facts, spark.createDataFrame([(3, 300)], "k long, v long"), mode="append"
    )
    good.commit()
    bad = MultiTableTxn(coord)
    bad.stage_write(
        facts, spark.createDataFrame([(4, 400)], "k long, v long"), mode="append"
    )
    bad.abort()
    feed = facts.changes(["k"], v_from=v0)
    rows = {(r["change_type"], r["k"]) for r in feed.collect()}
    assert rows == {("insert", 3)}


def test_checkpoint_never_bakes_in_unresolved_txn(spark, tmp_path):
    """Commit 10 is checkpoint-eligible; if it belongs to a txn the
    checkpoint is skipped, so replay stays correct whichever way the
    txn resolves."""
    t = AcidTable(spark, str(tmp_path / "ckpt"))
    coord = str(tmp_path / "_txns")
    for i in range(9):
        t.write(
            spark.createDataFrame([(i, i)], "k long, v long"),
            mode="append" if i else "overwrite",
        )
    assert t.latest_version() == 9
    txn = MultiTableTxn(coord)
    txn.stage_write(
        t, spark.createDataFrame([(99, 99)], "k long, v long"), mode="append"
    )
    assert t.latest_version() == 10  # the checkpoint-eligible slot
    import os

    assert not os.path.exists(t._checkpoint_file(10))
    txn.commit()
    assert {r["k"] for r in t.read().collect()} == set(range(9)) | {99}


class TestConsistentCut:
    """Multi-table snapshot-isolation reads: the cut never tears a
    committed transaction across tables."""

    def _setup(self, spark, tmp_path):
        facts = AcidTable(spark, str(tmp_path / "facts"))
        audit = AcidTable(spark, str(tmp_path / "audit"))
        facts.write(spark.createDataFrame([(1, 100)], "k long, v long"))
        audit.write(spark.createDataFrame([("base", 1)], "event string, seq long"))
        coord = str(tmp_path / "_txns")
        txn = MultiTableTxn(coord)
        txn.stage_merge(
            facts,
            spark.createDataFrame([(2, 200)], "k long, v long"),
            keys=["k"],
        )
        txn.stage_write(
            audit,
            spark.createDataFrame([("batch", 2)], "event string, seq long"),
            mode="append",
        )
        txn.commit()
        return facts, audit, coord

    def test_current_cut_includes_whole_txn(self, spark, tmp_path):
        facts, audit, coord = self._setup(spark, tmp_path)
        cut = MultiTableTxn.consistent_cut(coord, [facts, audit])
        assert cut[facts.path] == 2 and cut[audit.path] == 2
        frames = MultiTableTxn.read_consistent(coord, [facts, audit])
        assert frames[facts.path].count() == 2
        assert frames[audit.path].count() == 2

    def test_torn_proposal_is_repaired(self, spark, tmp_path):
        """Proposing facts AFTER the txn but audit BEFORE it (the torn
        read a naive two-instant scan produces) lowers facts below its
        stage — both-or-neither."""
        facts, audit, coord = self._setup(spark, tmp_path)
        cut = MultiTableTxn.consistent_cut(
            coord, [facts, audit], at={facts.path: 2, audit.path: 1}
        )
        assert cut == {facts.path: 1, audit.path: 1}
        frames = MultiTableTxn.read_consistent(
            coord, [facts, audit], at={facts.path: 2, audit.path: 1}
        )
        assert frames[facts.path].count() == 1  # pre-txn
        assert frames[audit.path].count() == 1

    def test_cascading_repair_converges(self, spark, tmp_path):
        """Two overlapping txns: repairing for one exposes a tear in
        the other; the fixpoint handles the chain."""
        facts, audit, coord = self._setup(spark, tmp_path)
        txn2 = MultiTableTxn(coord)
        txn2.stage_write(
            facts, spark.createDataFrame([(3, 300)], "k long, v long"),
            mode="append",
        )
        txn2.stage_write(
            audit,
            spark.createDataFrame([("batch2", 3)], "event string, seq long"),
            mode="append",
        )
        txn2.commit()
        # propose: facts at 3 (includes txn2), audit at 1 (excludes BOTH)
        cut = MultiTableTxn.consistent_cut(
            coord, [facts, audit], at={facts.path: 3, audit.path: 1}
        )
        assert cut == {facts.path: 1, audit.path: 1}
        # and an honest current cut includes both whole txns
        cut = MultiTableTxn.consistent_cut(coord, [facts, audit])
        assert cut == {facts.path: 3, audit.path: 3}
