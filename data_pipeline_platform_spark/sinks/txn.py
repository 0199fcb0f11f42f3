"""Multi-table atomic transactions over AcidTable.

Neither Delta nor Iceberg gives you an atomic commit ACROSS tables;
the standard answer is a coordinator with two-phase commit and
presumed abort, which is what this module implements natively on the
AcidTable log:

1. STAGE — each participating write/merge runs its normal machinery
   (data files, OCC, footer stats, schema validation) but its commit
   record carries a ``txn`` pointer. A txn commit RESERVES its version
   slot while staying invisible to every read (snapshot replay skips
   unresolved txn commits), and it BLOCKS successor commits on that
   table, so a later-resolved txn can never retroactively change a
   snapshot someone else already built on — history stays linear.
2. DECIDE — ``commit()`` creates ONE marker file
   (``<txn_id>.committed``, atomic create-if-absent) in the
   coordinator directory. That single create is the all-or-nothing
   point for every staged table: before it, readers of every table see
   the pre-txn snapshot; after it, they see every staged commit.
   ``abort()`` writes the ``.aborted`` marker instead; markers are
   immutable and mutually exclusive (first one wins).
3. RECOVER — a crash between stage and decide leaves pending commits
   that block their tables. ``recover()`` implements presumed abort:
   any pending txn in the coordinator dir without a committed marker
   gets an aborted marker, unblocking the tables; the staged data
   files become unreferenced orphans that ``vacuum`` removes.

Reference analog: none — the reference's writer wraps a single
database transaction per target (src/pipeline/persistence/
batch_writer.py); cross-table atomicity (facts + audit log, two
matviews, paired bronze tables) is exactly what it cannot express.

100 TB posture: staging cost is the writes themselves; the decide
point is one put-if-absent of an empty object regardless of data
volume; readers pay one existence probe per UNRESOLVED txn commit in
the replayed suffix (resolved markers are immutable, and checkpoints
never include unresolved commits).
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.sinks.acid import AcidTable


class TxnDecidedError(RuntimeError):
    """commit()/abort() called after the transaction was already
    decided the other way."""


class MultiTableTxn:
    def __init__(self, coordinator_dir: str, txn_id: str = None):
        self.status_dir = os.path.abspath(coordinator_dir)
        os.makedirs(self.status_dir, exist_ok=True)
        self.id = txn_id or uuid.uuid4().hex
        self.staged: List[Dict[str, Any]] = []

    # ------------------------------------------------------------------
    def _ref(self) -> Dict[str, str]:
        return {"id": self.id, "status_dir": self.status_dir}

    def _marker(self, state: str) -> str:
        return os.path.join(self.status_dir, f"{self.id}.{state}")

    def state(self) -> str:
        if os.path.exists(self._marker("committed")):
            return "committed"
        if os.path.exists(self._marker("aborted")):
            return "aborted"
        return "pending"

    # ------------------------------------------------------------------
    # stage
    # ------------------------------------------------------------------
    def stage_write(self, table: AcidTable, df: DataFrame, **kw) -> int:
        """Stage a write (same contract as AcidTable.write) that
        publishes only when this txn commits."""
        self._check_undecided("stage_write")
        version = table.write(df, txn=self._ref(), **kw)
        self.staged.append({"table": table.path, "version": version})
        return version

    def stage_merge(
        self, table: AcidTable, source: DataFrame, keys: Sequence[str], **kw
    ) -> Dict[str, int]:
        """Stage a MERGE (same contract as AcidTable.merge) that
        publishes only when this txn commits."""
        self._check_undecided("stage_merge")
        stats = table.merge(source, keys, txn=self._ref(), **kw)
        self.staged.append(
            {"table": table.path, "version": stats.get("version"),
             "merge": stats}
        )
        return stats

    def _check_undecided(self, op: str) -> None:
        st = self.state()
        if st != "pending":
            raise TxnDecidedError(f"{op}: txn {self.id} already {st}")

    # ------------------------------------------------------------------
    # decide
    # ------------------------------------------------------------------
    def commit(self) -> None:
        """The all-or-nothing point: one atomic marker create. Every
        staged commit in every table becomes visible together. The
        marker records the staged (table, version) set — the membership
        consistent_cut() needs for torn-read-free multi-table snapshot
        reads. Content lands atomically: it is written to a temp file
        and hard-linked into place (link is the exclusive create, and
        the content is complete before it)."""
        import json as _json

        if os.path.exists(self._marker("aborted")):
            raise TxnDecidedError(f"txn {self.id} already aborted")
        marker = self._marker("committed")
        if os.path.exists(marker):
            return  # idempotent: committing twice is a no-op
        tmp = marker + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "staged": [
                        {"table": s["table"], "version": s.get("version")}
                        for s in self.staged
                    ]
                },
                f,
            )
        try:
            os.link(tmp, marker)
        except FileExistsError:
            pass  # lost the race to another committer of the same txn
        finally:
            os.remove(tmp)

    def abort(self) -> None:
        """Presumed-abort resolution: staged commits become permanently
        invisible; their data files are vacuum-able orphans."""
        if os.path.exists(self._marker("committed")):
            raise TxnDecidedError(f"txn {self.id} already committed")
        try:
            with open(self._marker("aborted"), "x"):
                pass
        except FileExistsError:
            pass

    # ------------------------------------------------------------------
    # consistent multi-table snapshot reads
    # ------------------------------------------------------------------
    @staticmethod
    def consistent_cut(
        coordinator_dir: str,
        tables: Sequence[AcidTable],
        at: Optional[Dict[str, int]] = None,
    ) -> Dict[str, int]:
        """A {table path: version} cut where every transaction decided
        through this coordinator is ALL-IN or ALL-OUT — the multi-table
        snapshot-isolation read. Per-table reads taken naively at
        different instants can tear a txn (see A after decide, B from
        before it); this repairs the proposed cut by walking the
        committed markers' staged sets and LOWERING any cut that
        includes a txn some sibling cut excludes, to just below that
        stage — iterated to fixpoint (cuts only decrease: terminates).
        ``at`` proposes a historical cut (consistent time travel);
        default is each table's current latest.

        100 TB posture: marker files are tiny JSON and the loop is
        driver-side metadata only; no data is read until the caller
        opens the returned versions."""
        import json as _json

        coordinator_dir = os.path.abspath(coordinator_dir)
        by_path = {t.path: t for t in tables}
        cut = {
            p: (at or {}).get(p, t.latest_version())
            for p, t in by_path.items()
        }
        stagings: List[List[Dict[str, Any]]] = []
        if os.path.isdir(coordinator_dir):
            for name in os.listdir(coordinator_dir):
                if not name.endswith(".committed"):
                    continue
                try:
                    with open(os.path.join(coordinator_dir, name)) as f:
                        content = _json.load(f)
                except (OSError, _json.JSONDecodeError, ValueError):
                    continue  # legacy empty marker: no membership info
                staged = [
                    s
                    for s in content.get("staged", [])
                    if s.get("table") in by_path and s.get("version")
                ]
                if len(staged) > 1:
                    stagings.append(staged)
        changed = True
        while changed:
            changed = False
            for staged in stagings:
                included = [s for s in staged if s["version"] <= cut[s["table"]]]
                if included and len(included) < len(staged):
                    # torn: some stages inside the cut, some outside —
                    # push every included stage's table below its stage
                    for s in included:
                        new_v = s["version"] - 1
                        if new_v < cut[s["table"]]:
                            cut[s["table"]] = new_v
                            changed = True
        return cut

    @staticmethod
    def read_consistent(
        coordinator_dir: str,
        tables: Sequence[AcidTable],
        at: Optional[Dict[str, int]] = None,
    ) -> Dict[str, DataFrame]:
        """Open every table at a torn-free cut (see consistent_cut)."""
        cut = MultiTableTxn.consistent_cut(coordinator_dir, tables, at)
        return {t.path: t.read(version=cut[t.path]) for t in tables}

    # ------------------------------------------------------------------
    # recover
    # ------------------------------------------------------------------
    @staticmethod
    def recover(coordinator_dir: str, tables: Sequence[AcidTable]) -> List[str]:
        """Presumed abort for crashed transactions: scan each table's
        newest commit; any unresolved txn pointing at this coordinator
        gets an aborted marker. Returns the txn ids aborted. Call it
        when a writer hits TxnPendingError after a coordinator crash —
        a txn that reached its committed marker is never touched."""
        coordinator_dir = os.path.abspath(coordinator_dir)
        aborted = []
        for table in tables:
            v = table.latest_version()
            if v == 0:
                continue
            commit = table._read_commit(v)
            t = commit.get("txn")
            if not t or os.path.abspath(t["status_dir"]) != coordinator_dir:
                continue
            if AcidTable._txn_state(commit) == "pending":
                txn = MultiTableTxn(coordinator_dir, txn_id=t["id"])
                txn.abort()
                aborted.append(t["id"])
        return sorted(set(aborted))
