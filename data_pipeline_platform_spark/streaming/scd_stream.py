"""Streaming SCD Type-2 maintenance: fold a dimension-change STREAM
into an `Scd2Table` (sinks/scd.py) via ``foreachBatch`` — the
CDC-to-history-dimension hop (bronze customer churn → versioned
silver dim) run continuously.

Exactly-once without a separate marker: each apply stamps its
``batch_id`` into the ACID commit it publishes (``scd_batch_id`` in
the commit meta), so the dimension's log itself is the progress
record — the wrapper's replay check is a newest-first commit-meta
walk, O(1) commits in steady state, never a scan of the growing
dimension. No-op batches (no tracked column changed) stamp too, so a
replayed no-change batch is skipped exactly. Each apply is ONE
copy-on-write merge commit, so there is no crash window between
"history written" and "progress recorded".

Structured Streaming batch ids are monotone per checkpoint lineage,
which is exactly the monotonicity ``Scd2Table.apply`` already demands
of its batch ids — the checkpoint contract and the dimension contract
are the same contract.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.sinks.scd import Scd2Table


def last_applied_batch(dim: Scd2Table) -> int:
    """Highest applied batch_id, or -1 — delegates to the dimension's
    O(1)-commits newest-first commit-meta walk (every apply stamps
    ``scd_batch_id`` into its commit), the same shape as
    streaming/cdc_apply.last_applied_batch. Never scans the dimension."""
    return dim.last_applied_batch()


def apply_scd_batch(
    dim: Scd2Table, batch_df: DataFrame, batch_id: int
) -> bool:
    """Apply one micro-batch idempotently; True if applied, False if
    skipped as a replay (or empty)."""
    if batch_id <= last_applied_batch(dim):
        return False
    if batch_df.isEmpty():
        return False
    dim.apply(batch_df, batch_id)
    return True


def stream_scd2(
    stream_df: DataFrame,
    dim: Scd2Table,
    checkpoint: str,
    trigger: Optional[Dict[str, Any]] = None,
):
    """Start the fold; returns the StreamingQuery (availableNow by
    default — drain the backlog and stop)."""
    trigger = {"availableNow": True} if trigger is None else trigger

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_scd_batch(dim, batch_df, batch_id)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
