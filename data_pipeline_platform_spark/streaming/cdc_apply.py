"""Streaming CDC APPLY CHANGES: fold a change-event STREAM into an
AcidTable via ``foreachBatch`` + ``sinks/cdc.apply_changes``, with the
same exactly-once discipline as ``streaming/matview.py`` — each applied
batch records ``{stream_id, batch_id}`` INSIDE the ACID commit it
publishes, and replayed batches skip.

The marker-skip is CORRECTNESS-critical here, not an optimization: in
physical-delete mode, redelivering batch N after batch N+1 deleted one
of its keys would re-insert the dead row (the row's sequence left with
it — the documented apply_changes caveat); the marker guarantees a
delivered batch folds exactly once, so the caveat only concerns
GENUINELY out-of-order events (which tombstone mode handles). The
commit_guard re-checks the marker inside the OCC retry loop, closing
the concurrent-duplicate-delivery race the same way fold_batch does.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.sinks.acid import (
    AcidTable,
    CommitGuardFailed,
)
from data_pipeline_platform_spark.sinks.cdc import apply_changes


def last_applied_batch(table: AcidTable, stream_id: str) -> int:
    """Highest batch_id committed for ``stream_id``, or -1 (newest-first
    walk, stops at the first marker — O(1) commits in steady state;
    markers inside unresolved/aborted txn stages never count)."""
    for v in range(table.latest_version(), 0, -1):
        commit = table._read_commit(v)
        if table._txn_state(commit) in ("pending", "aborted"):
            continue
        meta = commit.get("meta") or {}
        if meta.get("stream_id") == stream_id:
            return int(meta["batch_id"])
    return -1


def apply_cdc_batch(
    table: AcidTable,
    stream_id: str,
    batch_df: DataFrame,
    batch_id: int,
    keys: Sequence[str],
    sequence_by: str,
    op_col: str = "op",
    delete_op: str = "D",
    tombstones: bool = False,
) -> bool:
    """Apply one micro-batch idempotently; True if applied, False if
    skipped as a replay."""
    if batch_id <= last_applied_batch(table, stream_id):
        return False
    if batch_df.isEmpty():
        return False
    try:
        apply_changes(
            table,
            batch_df,
            keys=keys,
            sequence_by=sequence_by,
            op_col=op_col,
            delete_op=delete_op,
            tombstones=tombstones,
            extra_meta={"stream_id": stream_id, "batch_id": batch_id},
            commit_guard=lambda: last_applied_batch(table, stream_id)
            < batch_id,
        )
    except CommitGuardFailed:
        return False  # a concurrent delivery applied it first
    return True


def stream_apply_changes(
    stream_df: DataFrame,
    table: AcidTable,
    keys: Sequence[str],
    sequence_by: str,
    checkpoint: str,
    op_col: str = "op",
    delete_op: str = "D",
    tombstones: bool = False,
    trigger: Optional[Dict[str, Any]] = None,
    stream_id: Optional[str] = None,
):
    """Start the apply; returns the StreamingQuery. Default trigger is
    availableNow (drain and stop); ``stream_id`` defaults to the
    absolute checkpoint path (the lineage batch ids are scoped to)."""
    trigger = {"availableNow": True} if trigger is None else trigger
    sid = stream_id if stream_id is not None else os.path.abspath(checkpoint)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            table, sid, batch_df, batch_id,
            keys=keys, sequence_by=sequence_by,
            op_col=op_col, delete_op=delete_op, tombstones=tombstones,
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
