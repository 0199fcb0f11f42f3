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


def test_vacuum_protects_pending_txn_staged_files(spark, pair):
    """r10 (ADVICE high): vacuum's live set comes from snapshot_files,
    which skips pending-txn commits — so the files staged by an
    undecided txn looked unreferenced and were DELETED; the txn's later
    committed marker then exposed a snapshot referencing vanished files
    (permanent data loss). A pending commit can only be the tip, and
    vacuum now protects the tip's add-actions while it is undecided."""
    import os

    facts, _, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_write(
        facts,
        spark.createDataFrame([(7, 700)], "k long, v long"),
        mode="append",
    )
    staged_files = {a["path"] for a in facts._read_commit(2)["add"]}
    removed = facts.vacuum()  # the stage→decide window
    assert not (set(removed) & staged_files)
    for p in staged_files:
        assert os.path.exists(p)
    txn.commit()
    assert {r["k"] for r in facts.read().collect()} == {1, 2, 7}
    assert facts.fsck()["ok"]
    # aborted stages stay collectable
    t2 = MultiTableTxn(coord)
    t2.stage_write(
        facts,
        spark.createDataFrame([(8, 800)], "k long, v long"),
        mode="append",
    )
    orphans = {a["path"] for a in facts._read_commit(3)["add"]}
    t2.abort()
    removed = facts.vacuum()
    assert orphans <= set(removed)


def test_cdf_span_clamps_below_pending_tip_mixed_span(spark, tmp_path):
    """r10 (ADVICE high): a mixed span (resolved data commit + pending
    txn tip) used to set v_to = the pending tip, whose rows changes()
    excludes — the published marker then permanently skipped the txn's
    rows after it committed. The span now clamps to the newest resolved
    commit; the post-decide span folds the txn's rows."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    bronze = AcidTable(spark, str(tmp_path / "b"))
    view = MaterializedAgg(
        spark, str(tmp_path / "s"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    bronze.write(
        spark.createDataFrame([(1, "a", 10)], "k long, g string, x long"),
        stats_cols=["k"],
    )
    consumer.process_available()  # marker at v1
    # resolved data commit v2 + pending txn tip v3 — the mixed span
    bronze.write(
        spark.createDataFrame([(2, "a", 20)], "k long, g string, x long"),
        mode="append",
    )
    txn = MultiTableTxn(str(tmp_path / "_txns"))
    txn.stage_write(
        bronze,
        spark.createDataFrame([(3, "b", 30)], "k long, g string, x long"),
        mode="append",
    )
    out = consumer.process_available()
    assert out["v_to"] == 2  # clamped below the pending tip
    assert {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()} == {
        "a": (2, 30),
    }
    txn.commit()
    out = consumer.process_available()  # the txn's rows fold NOW
    assert out["v_to"] == 3
    assert {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()} == {
        "a": (2, 30),
        "b": (1, 30),
    }


def test_decide_point_single_name_no_contradictory_markers(tmp_path):
    """r10 (ADVICE low): commit()/abort() used check-then-create on TWO
    different names, so a recovery-driven abort racing a slow commit
    could materialize BOTH markers (and _txn_state resolved
    committed-first, flipping a recovery that already acted on
    'aborted'). Both outcomes now contend for ONE name (.decided): the
    loser reads the winner's outcome and raises, and no contradictory
    marker can ever exist."""
    import os

    coord = str(tmp_path / "_txns")
    # two coordinator objects for the SAME txn simulate the race window
    # (each passed the old exists-check before either created a marker)
    a = MultiTableTxn(coord, txn_id="racy")
    b = MultiTableTxn(coord, txn_id="racy")
    a.commit()
    with pytest.raises(TxnDecidedError):
        b.abort()
    assert a.state() == b.state() == "committed"
    names = set(os.listdir(coord))
    assert not any(n.endswith(".aborted") for n in names)
    # reverse order: abort wins, commit loses loudly
    c = MultiTableTxn(coord, txn_id="racy2")
    d = MultiTableTxn(coord, txn_id="racy2")
    c.abort()
    with pytest.raises(TxnDecidedError):
        d.commit()
    assert d.state() == "aborted"
    assert not any(
        n.startswith("racy2") and n.endswith(".committed")
        for n in os.listdir(coord)
    )
    # idempotent re-decide stays a no-op
    a.commit()
    c.abort()


def test_fanout_decide_record_carries_membership(spark, tmp_path):
    """r10 (ADVICE medium): fold_batch_multi staged via view.update(...,
    txn=txn._ref()), which bypassed stage_write/stage_merge — the decide
    record said staged: [] and consistent_cut had NO membership for any
    streaming fan-out txn (cuts could tear the very batches the fan-out
    promises are atomic). update() now reports its committed version and
    fold_batch_multi records it."""
    import json
    import os

    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.matview import fold_batch_multi

    v1 = MaterializedAgg(
        spark, str(tmp_path / "v1"), keys=["g"], aggs=[("n", "count", "")]
    )
    v2 = MaterializedAgg(
        spark, str(tmp_path / "v2"), keys=["h"], aggs=[("n", "count", "")]
    )
    coord = str(tmp_path / "_txns")
    batch = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2)], "g string, h string, k long"
    )
    for bid in (0, 1):  # batch 0 exercises write(), batch 1 merge()
        assert fold_batch_multi(
            [(v1, batch.select("g")), (v2, batch.select("h"))],
            "stream-A", bid, coord,
        )
    decided = sorted(
        f for f in os.listdir(coord) if f.endswith(".decided")
    )
    assert len(decided) == 2
    for f in decided:
        with open(os.path.join(coord, f)) as fh:
            content = json.load(fh)
        assert content["outcome"] == "committed"
        staged = content["staged"]
        assert {s["table"] for s in staged} == {v1.acid.path, v2.acid.path}
        assert all(s["version"] for s in staged)
    # and the membership actually repairs a torn proposal
    cut = MultiTableTxn.consistent_cut(
        coord, [v1.acid, v2.acid],
        at={v1.acid.path: 2, v2.acid.path: 1},
    )
    assert cut == {v1.acid.path: 1, v2.acid.path: 1}


def test_read_consistent_raises_typed_error_when_cut_vacuumed(spark, tmp_path):
    """r10 (verdict #7): consistent_cut may repair a cut below a version
    vacuum already dropped; read_consistent used to surface a raw
    missing-file error at scan time. It now probes the cut snapshot's
    files driver-side and raises VersionVacuumedError naming the txn
    that forced the lowering."""
    from data_pipeline_platform_spark.sinks.txn import VersionVacuumedError

    facts = AcidTable(spark, str(tmp_path / "facts"))
    audit = AcidTable(spark, str(tmp_path / "audit"))
    facts.write(spark.createDataFrame([(1, 100)], "k long, v long"))
    audit.write(spark.createDataFrame([("base", 1)], "event string, seq long"))
    coord = str(tmp_path / "_txns")
    txn = MultiTableTxn(coord)
    txn.stage_merge(
        facts, spark.createDataFrame([(1, 111)], "k long, v long"), keys=["k"]
    )
    txn.stage_write(
        audit,
        spark.createDataFrame([("batch", 2)], "event string, seq long"),
        mode="append",
    )
    txn.commit()
    facts.vacuum()  # aggressive: drops v1's rewritten file
    # torn proposal: facts after the txn, audit before it — the repair
    # lowers facts to v1, whose files vacuum just removed
    with pytest.raises(VersionVacuumedError) as exc:
        MultiTableTxn.read_consistent(
            coord, [facts, audit],
            at={facts.path: 2, audit.path: 1},
        )
    assert txn.id in str(exc.value)


def test_reattach_recovers_membership_after_coordinator_restart(
    spark, pair
):
    """r10: a coordinator re-created after a crash used to decide with
    staged: [] — the marker lost the membership consistent cuts need.
    reattach() rebuilds it from the tables' pending tip commits, so the
    decide record carries the full (table, version) set."""
    import json
    import os

    facts, audit, coord = pair
    txn = MultiTableTxn(coord)
    txn.stage_merge(
        facts, spark.createDataFrame([(2, 222)], "k long, v long"), keys=["k"]
    )
    txn.stage_write(
        audit,
        spark.createDataFrame([("m", 1)], "event string, n long"),
        mode="append",
    )
    txn_id = txn.id
    del txn  # the coordinator process dies between stage and decide

    re = MultiTableTxn.reattach(coord, txn_id, [facts, audit])
    assert {s["table"] for s in re.staged} == {facts.path, audit.path}
    re.commit()
    with open(os.path.join(coord, f"{txn_id}.decided")) as f:
        content = json.load(f)
    assert content["outcome"] == "committed"
    assert {s["table"] for s in content["staged"]} == {facts.path, audit.path}
    # and the recovered membership repairs a torn proposal
    cut = MultiTableTxn.consistent_cut(
        coord, [facts, audit], at={facts.path: 2, audit.path: 1}
    )
    assert cut == {facts.path: 1, audit.path: 1}


def test_wap_staged_rows_never_visible_and_abort_is_vacuumable(spark, tmp_path):
    """Write-Audit-Publish (sinks/wap.py): a failing wave's rows are
    never readable at ANY point, the txn aborts atomically, and the
    staged files become vacuum-able orphans; a passing wave publishes."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.wap import write_audit_publish

    table = AcidTable(spark, str(tmp_path / "t"))
    rules = [{"rule": "in_range", "column": "v", "min": 0, "max": 100}]
    good = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    bad = spark.createDataFrame([(3, -5), (4, 30)], "k long, v long")

    out1 = write_audit_publish(table, good, rules,
                               coordinator_dir=str(tmp_path / "c"))
    assert out1["published"] and table.read().count() == 2

    out2 = write_audit_publish(table, bad, rules,
                               coordinator_dir=str(tmp_path / "c"))
    assert not out2["published"] and out2["failed_rules"] == 1
    # the aborted wave is invisible and its commit slot resolved
    assert {r["k"] for r in table.read().collect()} == {1, 2}
    assert table.fsck()["pending_txns"] == []
    # staged orphans reclaimable
    removed = table.vacuum()
    assert removed  # the aborted wave's data file(s)
    assert table.read().count() == 2
    # report carries per-rule outcomes
    assert any(r["rule"] == "in_range" and r["violations"] == 1
               for r in out2["report"])


def test_wap_audit_crash_aborts_instead_of_blocking(spark, tmp_path):
    """A rule that itself crashes must abort the stage (un-audited data
    never publishes) and leave the table unblocked for the next wave."""
    import pytest as _pt

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.wap import write_audit_publish

    table = AcidTable(spark, str(tmp_path / "t"))
    good = spark.createDataFrame([(1, 10)], "k long, v long")
    write_audit_publish(table, good,
                        [{"rule": "not_null", "column": "k"}],
                        coordinator_dir=str(tmp_path / "c"))
    with _pt.raises(Exception):
        write_audit_publish(
            table, good, [{"rule": "expr", "expr": "no_such_col > 0"}],
            coordinator_dir=str(tmp_path / "c"),
        )
    # table not blocked: the crashed wave aborted, a new wave publishes
    assert table.fsck()["pending_txns"] == []
    out = write_audit_publish(table, good,
                              [{"rule": "not_null", "column": "k"}],
                              coordinator_dir=str(tmp_path / "c"))
    assert out["published"]


def test_wap_audits_staged_schema_not_published_schema(spark, tmp_path):
    """A staged schema-widening write is audited under ITS OWN schema:
    a rule naming the new column must see it (and catch bad values in
    it), not error out because the audit read the old published schema.
    (Regression: table_schema(version) skips pending commits, so the
    staged commit's widened schema was invisible at audit time.)"""
    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.wap import write_audit_publish

    table = AcidTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame([(1, 10)], "k long, v long")
    write_audit_publish(table, base, [{"rule": "not_null", "column": "k"}],
                        coordinator_dir=str(tmp_path / "c"))
    # widen with a new column carrying an out-of-range value: the rule
    # on the NEW column must fire and abort the wave
    widened = spark.createDataFrame([(2, 20, -7)],
                                    "k long, v long, score long")
    out = write_audit_publish(
        table, widened,
        [{"rule": "in_range", "column": "score", "min": 0, "max": 100}],
        coordinator_dir=str(tmp_path / "c"), merge_schema=True,
    )
    assert not out["published"] and out["failed_rules"] == 1
    assert "score" not in table.read().columns  # abort kept old schema
    # and a clean widened wave publishes with the column audited
    ok = spark.createDataFrame([(3, 30, 55)], "k long, v long, score long")
    out2 = write_audit_publish(
        table, ok,
        [{"rule": "in_range", "column": "score", "min": 0, "max": 100}],
        coordinator_dir=str(tmp_path / "c"), merge_schema=True,
    )
    assert out2["published"]
    assert {r["score"] for r in table.read().collect()} == {None, 55}
