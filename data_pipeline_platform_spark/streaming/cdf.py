"""Change-data-feed consumer: the medallion bronze→silver hop.

An upstream ``AcidTable`` (bronze) takes writes/merges/deletes; this
consumer incrementally folds its row-level change feed
(``AcidTable.changes()``) into a downstream ``MaterializedAgg``
(silver), so the silver view tracks the bronze snapshot without ever
re-scanning it — cost per hop is the size of the files the bronze
commits touched, not the table.

Exactly-once, same discipline as streaming/matview.py: each fold's
commit meta records ``{stream_id: "cdf:<bronze path>", batch_id:
<bronze version consumed up to>}`` — marker and fold publish in ONE
atomic commit, and ``process_available`` resumes from the marker, so a
crash replays nothing and skips nothing.

Retraction: updates/deletes in the feed SUBTRACT their preimage
(``MaterializedAgg.update_changes``); count/sum fold invertibly, and
min/max aggregates are maintained by touched-group recompute against a
version-pinned bronze snapshot — only groups whose retracted value
ties-or-beats the stored extreme pay a snapshot re-aggregation (pure
inserts never scan bronze). A group retracted to zero keeps a
zero-count state row (single-commit atomicity); ``state()`` drops
those, restoring "silver equals the one-shot groupBy over the current
bronze snapshot" exactly — the contract the graded twins
(functions/lake.py: cdf_incremental_view, cdf_minmax_view) check
against a DuckDB oracle.
"""

from __future__ import annotations

from typing import Dict, Sequence

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
from data_pipeline_platform_spark.streaming.matview import last_folded_batch


class ChangeFeedConsumer:
    def __init__(
        self,
        source: AcidTable,
        source_keys: Sequence[str],
        view: MaterializedAgg,
        count_col: str = None,
        feed_transform=None,
        dim_side: bool = False,
    ):
        """``source_keys``: the bronze table's unique ROW key (what
        ``changes()`` diffs on) — distinct from ``view.keys``, the
        silver GROUP key. ``count_col``: the view's count aggregate,
        used both to drop fully-retracted groups at read time and to
        sanity-check the agg set early (update_changes re-validates);
        omit it only for row-level views (``MaterializedJoin``), which
        physically remove retracted rows.
        ``feed_transform``: optional ROW-LOCAL projection applied to
        the change feed (and the recompute snapshot) before folding —
        derive the view's group key / agg inputs from source columns
        (e.g. a bucket of a key, an indicator flag). Must be
        deterministic, per-row, and independent of ``change_type``:
        it is applied identically to preimage and postimage rows, so
        any cross-row or change-aware logic would corrupt the signed
        fold. ``dim_side``: this consumer watches the DIMENSION table
        of a ``MaterializedJoin`` (source = the dim's AcidTable,
        source_keys = the dim key) and folds via
        ``update_dim_changes`` — the same exactly-once marker
        discipline, a second independent stream_id on the same view."""
        if count_col is not None and not any(
            a[0] == count_col and a[1] == "count"
            for a in getattr(view, "aggs", [])
        ):
            raise ValueError(
                f"count_col {count_col!r} is not a count aggregate of the view"
            )
        if count_col is None and hasattr(view, "aggs"):
            raise ValueError(
                "aggregate views need count_col (zero-count rows must drop "
                "at read time); only row-level views (MaterializedJoin, "
                "which physically removes retracted rows) may omit it"
            )
        if dim_side and not hasattr(view, "update_dim_changes"):
            raise ValueError("dim_side consumers need a MaterializedJoin view")
        self.source = source
        self.source_keys = list(source_keys)
        self.view = view
        self.count_col = count_col
        self.feed_transform = feed_transform
        self.dim_side = dim_side
        self.stream_id = f"cdf:{source.path}"

    def last_processed_version(self) -> int:
        """Bronze version silver has folded up to (0 = nothing yet) —
        read from the silver commit log, never from a sidecar."""
        return max(0, last_folded_batch(self.view, self.stream_id))

    def process_available(self) -> Dict[str, int]:
        """Fold all bronze commits past the marker in one span. Returns
        the (from, to) span and touched-group count; a no-op span
        returns versions_behind=0 without committing."""
        v_from = self.last_processed_version()
        v_to = self.source.latest_version()
        # Never let the span cover an UNRESOLVED txn tip: its rows are
        # excluded from changes() (invisible until decided), but a
        # marker recording batch_id = that version would mean the rows
        # NEVER fold once the txn commits — silver diverges silently
        # forever. Clamp to the newest resolved commit; the span after
        # the txn decides subsumes it. A pending commit blocks
        # successors, so the walk-back is at most one step in practice.
        while v_to > v_from and AcidTable._txn_state(
            self.source._read_commit(v_to)
        ) == "pending":
            v_to -= 1
        if v_to <= v_from:
            return {"v_from": v_from, "v_to": v_to, "versions_behind": 0}
        # metadata-only span (SET_CONSTRAINT, no-op merge-deletes,
        # application markers): no data file entered or left the
        # snapshot, so there is nothing to fold — report a no-op
        # WITHOUT publishing a marker commit (the next data commit's
        # span subsumes this one; re-checking costs one file-set
        # comparison, never a scan)
        # (path, dv) IDENTITY, not path alone: a merge-on-read delete
        # re-publishes the same path under a new deletion vector — rows
        # changed, so that span is NOT metadata-only
        before = {
            AcidTable._action_ident(f)
            for f in self.source.snapshot_files(v_from)
        }
        after = {
            AcidTable._action_ident(f)
            for f in self.source.snapshot_files(v_to)
        }
        if before == after:
            return {
                "v_from": v_from,
                "v_to": v_to,
                "versions_behind": v_to - v_from,
                "metadata_only": True,
            }
        feed = self.source.changes(self.source_keys, v_from=v_from, v_to=v_to)
        # version-pinned post-span snapshot: min/max recompute (if the
        # view has any) must see exactly the state the feed diffs to,
        # even if the bronze table advances concurrently. Lazy — never
        # scanned unless a retraction actually threatens an extreme.
        # A span that empties the table entirely has no snapshot files;
        # the recompute must still run (against zero rows -> NULL
        # extremes), so fall back to an empty frame in the feed's shape.
        try:
            snapshot = self.source.read(version=v_to)
        except FileNotFoundError:
            snapshot = feed.drop("change_type").limit(0)
        if self.feed_transform is not None:
            feed = self.feed_transform(feed)
            snapshot = self.feed_transform(snapshot)
        fold = (
            self.view.update_dim_changes
            if self.dim_side
            else self.view.update_changes
        )
        stats = fold(
            feed,
            commit_meta={"stream_id": self.stream_id, "batch_id": v_to},
            snapshot=snapshot,
        )
        return {
            "v_from": v_from,
            "v_to": v_to,
            "versions_behind": v_to - v_from,
            **stats,
        }

    def state(self):
        """Silver view == one-shot groupBy over the current bronze
        snapshot (fully-retracted groups dropped)."""
        return self.view.read(drop_empty_on=self.count_col)
