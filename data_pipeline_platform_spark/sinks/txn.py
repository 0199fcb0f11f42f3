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
2. DECIDE — ``commit()``/``abort()`` atomically create ONE file of ONE
   name (``<txn_id>.decided``, create-if-absent, content = outcome +
   staged membership) in the coordinator directory. That single create
   is the all-or-nothing point for every staged table: before it,
   readers of every table see the pre-txn snapshot; after it, they see
   every staged commit (or never will). Because both outcomes contend
   for the SAME name, exactly one outcome can ever exist — a
   recovery-driven abort racing a slow commit cannot produce two
   contradictory markers; the loser reads the winner's outcome back.
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


class VersionVacuumedError(RuntimeError):
    """A consistent cut landed on a table version whose data files
    vacuum() has already dropped — the torn-read repair lowered (or the
    caller proposed) a cut below the vacuum retention window. Re-vacuum
    with a retention window covering the coordinator's txn history, or
    read at the current latest instead."""


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
        st = AcidTable._txn_state({"txn": self._ref()})
        return "pending" if st == "none" else st

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

    def record(self, table_path: str, version: Optional[int]) -> None:
        """Register an externally staged commit — a write/merge that was
        handed this txn's ``_ref()`` directly instead of going through
        stage_write/stage_merge (e.g. ``MaterializedAgg.update`` under
        ``fold_batch_multi``) — so the decide record carries FULL
        membership. ``consistent_cut()`` skips stagings with fewer than
        two entries, so a marker recording ``staged: []`` would let
        cuts tear exactly the batches the fan-out promises are atomic."""
        self._check_undecided("record")
        if version:
            self.staged.append({"table": table_path, "version": version})

    def _check_undecided(self, op: str) -> None:
        st = self.state()
        if st != "pending":
            raise TxnDecidedError(f"{op}: txn {self.id} already {st}")

    @classmethod
    def reattach(
        cls, coordinator_dir: str, txn_id: str, tables: Sequence[AcidTable]
    ) -> "MultiTableTxn":
        """Rebuild a coordinator object for an UNDECIDED txn after a
        process restart, RECOVERING its staged membership by scanning
        each participating table's tip commit (a pending txn commit can
        only be the tip — it blocks successors). Without this, a
        re-created ``MultiTableTxn(dir, txn_id=...)`` that then commits
        records ``staged: []`` and consistent cuts lose the very
        membership that keeps the txn untearable. Use after a crash
        when the decision should be COMMIT; ``recover()`` remains the
        presumed-abort path."""
        txn = cls(coordinator_dir, txn_id=txn_id)
        for table in tables:
            v = table.latest_version()
            if v == 0:
                continue
            commit = table._read_commit(v)
            t = commit.get("txn")
            if (
                t
                and t["id"] == txn_id
                and os.path.abspath(t["status_dir"]) == txn.status_dir
            ):
                txn.staged.append({"table": table.path, "version": v})
        return txn

    # ------------------------------------------------------------------
    # decide
    # ------------------------------------------------------------------
    def _decide(self, outcome: str) -> None:
        """THE all-or-nothing point: one atomic create of ONE name
        (``<txn_id>.decided``, content = outcome + staged membership).
        Exactly one outcome can ever exist — a recover()-driven abort
        racing a slow coordinator's commit resolves to whichever link
        wins, and the loser reads the winner's outcome back (raising
        ``TxnDecidedError`` on a mismatch) instead of materializing a
        second, contradictory marker. Content lands atomically: written
        to a temp file and hard-linked into place (the link is the
        exclusive create, and the content is complete before it).

        A legacy-named convenience marker (``.committed``/``.aborted``)
        is materialized AFTER the decided file for tooling that globs by
        outcome; the ``.decided`` file is the authority and is written
        first, so the two can never disagree."""
        import json as _json

        content = {
            "outcome": outcome,
            "staged": [
                {"table": s["table"], "version": s.get("version")}
                for s in self.staged
            ],
        }
        decided = self._marker("decided")
        tmp = decided + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            _json.dump(content, f)
        try:
            os.link(tmp, decided)
        except FileExistsError:
            with open(decided) as f:
                existing = _json.load(f)
            if existing.get("outcome") != outcome:
                raise TxnDecidedError(
                    f"txn {self.id} already {existing.get('outcome')}"
                ) from None
            content = existing  # idempotent re-decide: first record wins
        finally:
            os.remove(tmp)
        legacy = self._marker(outcome)
        if not os.path.exists(legacy):
            ltmp = legacy + f".tmp-{uuid.uuid4().hex}"
            with open(ltmp, "w") as f:
                _json.dump(content, f)
            try:
                os.link(ltmp, legacy)
            except FileExistsError:
                pass
            finally:
                os.remove(ltmp)

    def commit(self) -> None:
        """Every staged commit in every table becomes visible together
        (see ``_decide``). The record carries the staged (table,
        version) set — the membership consistent_cut() needs for
        torn-read-free multi-table snapshot reads."""
        self._decide("committed")

    def abort(self) -> None:
        """Presumed-abort resolution: staged commits become permanently
        invisible; their data files are vacuum-able orphans."""
        self._decide("aborted")

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
        cut, _ = MultiTableTxn._cut_with_provenance(
            coordinator_dir, tables, at
        )
        return cut

    @staticmethod
    def _cut_with_provenance(
        coordinator_dir: str,
        tables: Sequence[AcidTable],
        at: Optional[Dict[str, int]] = None,
    ):
        """consistent_cut plus {table path: txn_id} recording which
        committed txn forced each table's lowering (None when the cut
        is the untouched proposal) — read_consistent names the txn in
        VersionVacuumedError."""
        import json as _json

        coordinator_dir = os.path.abspath(coordinator_dir)
        by_path = {t.path: t for t in tables}
        cut = {
            p: (at or {}).get(p, t.latest_version())
            for p, t in by_path.items()
        }
        stagings: List[List[Dict[str, Any]]] = []
        seen_txns: set = set()
        if os.path.isdir(coordinator_dir):
            # .decided files are the authority (atomic single-name decide
            # point); .committed files cover pre-decided-era coordinators
            # and the crash window before the convenience marker lands
            for suffix in (".decided", ".committed"):
                for name in os.listdir(coordinator_dir):
                    if not name.endswith(suffix):
                        continue
                    txn_id = name[: -len(suffix)]
                    if txn_id in seen_txns:
                        continue
                    try:
                        with open(os.path.join(coordinator_dir, name)) as f:
                            content = _json.load(f)
                    except (OSError, _json.JSONDecodeError, ValueError):
                        continue  # legacy empty marker: no membership info
                    if suffix == ".decided" and content.get("outcome") != "committed":
                        seen_txns.add(txn_id)  # aborted: no membership
                        continue
                    seen_txns.add(txn_id)
                    staged = [
                        s
                        for s in content.get("staged", [])
                        if s.get("table") in by_path and s.get("version")
                    ]
                    if len(staged) > 1:
                        stagings.append((txn_id, staged))
        forced_by: Dict[str, Optional[str]] = {p: None for p in by_path}
        changed = True
        while changed:
            changed = False
            for txn_id, staged in stagings:
                included = [s for s in staged if s["version"] <= cut[s["table"]]]
                if included and len(included) < len(staged):
                    # torn: some stages inside the cut, some outside —
                    # push every included stage's table below its stage
                    for s in included:
                        new_v = s["version"] - 1
                        if new_v < cut[s["table"]]:
                            cut[s["table"]] = new_v
                            forced_by[s["table"]] = txn_id
                            changed = True
        return cut, forced_by

    @staticmethod
    def read_consistent(
        coordinator_dir: str,
        tables: Sequence[AcidTable],
        at: Optional[Dict[str, int]] = None,
    ) -> Dict[str, DataFrame]:
        """Open every table at a torn-free cut (see consistent_cut).

        Raises ``VersionVacuumedError`` (naming the txn that forced the
        lowering) when the cut lands on a version whose data files
        ``vacuum`` has already dropped — a raw missing-file error at
        scan time would otherwise surface arbitrarily late, inside an
        executor. The probe is driver-side metadata only (one existence
        check per live file of the cut snapshot)."""
        cut, forced_by = MultiTableTxn._cut_with_provenance(
            coordinator_dir, tables, at
        )
        for t in tables:
            v = cut[t.path]
            if v <= 0:
                continue
            missing = [
                a["path"]
                for a in t.snapshot_files(v)
                if not os.path.exists(a["path"])
            ]
            if missing:
                culprit = forced_by.get(t.path)
                why = (
                    f"the cut was lowered to keep txn {culprit} all-in-or-all-out"
                    if culprit
                    else "the proposed cut predates the vacuum retention window"
                )
                raise VersionVacuumedError(
                    f"table {t.path} at cut version {v}: "
                    f"{len(missing)} data file(s) already vacuumed "
                    f"(e.g. {missing[0]}); {why}. Vacuum with a retention "
                    "window covering the coordinator's txn history, or "
                    "read at the current latest."
                )
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
