"""GENUINELY concurrent OCC / multi-table-txn stress (r9 verdict #6):
real threads racing merges into one AcidTable — not single-threaded
interleavings — asserting linear history, a serializable final state,
and vacuum-ability of lost attempts' orphans.

Spark supports concurrent job submission from multiple Python threads
sharing one session; the races here are over the COMMIT LOG (the
O_EXCL version-slot create in acid.py::_commit), which is exactly the
surface the OCC retry loop (acid.py::merge) exists for.
"""

from __future__ import annotations

import threading
import time

import pytest

from data_pipeline_platform_spark.sinks.acid import (
    AcidTable,
    TxnPendingError,
)
from data_pipeline_platform_spark.sinks.txn import MultiTableTxn, TxnDecidedError

N_WRITERS = 4
HOT_KEY = 999


def test_threads_racing_merges_linearize_and_orphans_vacuum(spark, tmp_path):
    """N writer threads each merge a DISJOINT key range plus one shared
    HOT key into the same table, while one more thread runs a
    multi-table txn (stage facts + audit, commit). Afterwards:

    - history is linear (contiguous versions, fsck ok, no double adds);
    - the final state is serializable: every disjoint range landed
      exactly once with its writer's payload, and the hot key holds the
      payload of the LAST commit that touched it (verified against the
      log replay order, not just membership);
    - vacuum removes the lost attempts' staged orphans without
      disturbing the final state."""
    facts = AcidTable(spark, str(tmp_path / "facts"))
    audit = AcidTable(spark, str(tmp_path / "audit"))
    facts.write(
        spark.createDataFrame([(HOT_KEY, -1)], "k long, v long"),
        stats_cols=["k"],
    )
    audit.write(spark.createDataFrame([("init", 0)], "event string, n long"))
    coord = str(tmp_path / "_txns")
    errors: list = []
    barrier = threading.Barrier(N_WRITERS + 1)

    def writer(i: int) -> None:
        rows = [(k, i * 1000 + k) for k in range(i * 10, i * 10 + 10)]
        rows.append((HOT_KEY, i))
        df = spark.createDataFrame(rows, "k long, v long")
        barrier.wait()
        for _ in range(60):  # a pending txn tip asks writers to wait
            try:
                facts.merge(
                    df, keys=["k"], max_retries=32,
                    extra_meta={"writer": i},
                )
                return
            except TxnPendingError:
                time.sleep(0.05)
        errors.append(f"writer {i} starved behind a pending txn")

    def txn_writer() -> None:
        barrier.wait()
        for _ in range(60):
            txn = MultiTableTxn(coord)
            try:
                txn.stage_merge(
                    facts,
                    spark.createDataFrame([(2000, 2000)], "k long, v long"),
                    keys=["k"],
                )
            except (TxnPendingError, Exception) as exc:  # noqa: BLE001
                if "Commit" in type(exc).__name__ or isinstance(
                    exc, TxnPendingError
                ):
                    time.sleep(0.05)
                    continue
                raise
            txn.stage_write(
                audit,
                spark.createDataFrame([("txn", 1)], "event string, n long"),
                mode="append",
            )
            txn.commit()
            return
        errors.append("txn writer starved")

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(N_WRITERS)
    ] + [threading.Thread(target=txn_writer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # linear history: contiguous versions, clean replay
    report = facts.fsck()
    assert report["ok"], report
    assert not audit.fsck()["gaps"]

    state = {r["k"]: r["v"] for r in facts.read().collect()}
    # every disjoint range landed exactly once, payload intact
    for i in range(N_WRITERS):
        for k in range(i * 10, i * 10 + 10):
            assert state[k] == i * 1000 + k
    assert state[2000] == 2000  # the txn's stage is visible
    assert {r["event"] for r in audit.read().collect()} == {"init", "txn"}

    # serializable hot key: equals the writer of the LAST commit that
    # touched it in log order (the serialization order IS the version
    # order)
    last_writer = None
    for v in range(1, facts.latest_version() + 1):
        meta = facts._read_commit(v).get("meta") or {}
        if "writer" in meta:
            last_writer = meta["writer"]
    assert last_writer is not None and state[HOT_KEY] == last_writer

    # lost attempts' staged files are orphans: vacuum removes them and
    # the state is unchanged
    facts.vacuum()
    assert {r["k"]: r["v"] for r in facts.read().collect()} == state
    assert facts.fsck()["ok"]


def test_threads_racing_commit_vs_abort_single_outcome(tmp_path):
    """The decide race, with REAL threads: one committer and one
    aborter contend for the same txn. Exactly one outcome ever exists
    (single-name .decided create), the loser raises TxnDecidedError,
    and no contradictory outcome-named marker is materialized."""
    import os

    coord = str(tmp_path / "_txns")
    for round_no in range(8):
        txn_id = f"race{round_no}"
        a = MultiTableTxn(coord, txn_id=txn_id)
        b = MultiTableTxn(coord, txn_id=txn_id)
        results: dict = {}
        start = threading.Barrier(2)

        def decide(obj, outcome, key):
            start.wait()
            try:
                (obj.commit if outcome == "committed" else obj.abort)()
                results[key] = outcome
            except TxnDecidedError:
                results[key] = "lost"

        t1 = threading.Thread(target=decide, args=(a, "committed", "a"))
        t2 = threading.Thread(target=decide, args=(b, "aborted", "b"))
        t1.start(); t2.start(); t1.join(); t2.join()
        outcomes = {v for v in results.values() if v != "lost"}
        assert len(outcomes) == 1, results
        final = outcomes.pop()
        assert a.state() == b.state() == final
        names = [n for n in os.listdir(coord) if n.startswith(txn_id + ".")]
        other = "aborted" if final == "committed" else "committed"
        assert not any(n.endswith("." + other) for n in names), names


def test_concurrent_same_batch_redelivery_folds_exactly_once(spark, tmp_path):
    """Two threads deliver the SAME batch of the same stream
    concurrently — the speculative-redelivery shape a foreachBatch
    restart can produce. The pending-txn tip + presumed-abort recovery
    serialize them: exactly one delivery folds, the other resolves to a
    replay skip (possibly after its in-flight txn is recovery-aborted),
    and both views end in lockstep with the batch applied ONCE."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.matview import fold_batch_multi

    v1 = MaterializedAgg(
        spark, str(tmp_path / "v1"), keys=["g"], aggs=[("n", "count", "")]
    )
    v2 = MaterializedAgg(
        spark, str(tmp_path / "v2"), keys=["h"], aggs=[("n", "count", "")]
    )
    coord = str(tmp_path / "_txns")
    b0 = spark.createDataFrame([("a", "x", 1)], "g string, h string, k long")
    fold_batch_multi([(v1, b0.select("g")), (v2, b0.select("h"))],
                     "s", 0, coord)
    b1 = spark.createDataFrame(
        [("b", "y", 2), ("b", "z", 3)], "g string, h string, k long"
    )
    errors: list = []
    folded: list = []
    start = threading.Barrier(2)

    def deliver(tag):
        start.wait()
        for _ in range(80):
            try:
                out = fold_batch_multi(
                    [(v1, b1.select("g")), (v2, b1.select("h"))],
                    "s", 1, coord,
                )
                folded.append((tag, out))
                return
            except (TxnPendingError, TxnDecidedError) as _:
                time.sleep(0.05)  # loser of the race: re-check, then skip
                continue
            except Exception as exc:  # noqa: BLE001
                if "Commit" in type(exc).__name__:
                    time.sleep(0.05)
                    continue
                errors.append(f"{tag}: {exc!r}")
                return
        errors.append(f"{tag} starved")

    t1 = threading.Thread(target=deliver, args=("t1",))
    t2 = threading.Thread(target=deliver, args=("t2",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    # exactly one delivery actually folded; the other skipped as replay
    assert sorted(out for _, out in folded) == [False, True], folded
    g = {r["g"]: r["n"] for r in v1.read(drop_empty_on="n").collect()}
    h = {r["h"]: r["n"] for r in v2.read(drop_empty_on="n").collect()}
    assert g == {"a": 1, "b": 2}
    assert h == {"x": 1, "y": 1, "z": 1}
