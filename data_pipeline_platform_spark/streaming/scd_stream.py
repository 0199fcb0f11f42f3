"""Streaming SCD Type-2 maintenance: fold a dimension-change STREAM
into an `Scd2Table` (sinks/scd.py) via ``foreachBatch`` — the
CDC-to-history-dimension hop (bronze customer churn → versioned
silver dim) run continuously.

Exactly-once without a separate marker: an applied batch stamps its
``batch_id`` into every row it opens (``valid_from``) — the dimension
itself IS the progress record. The wrapper skips any batch at or below
``max(valid_from)``; a replayed batch that opened NOTHING (no tracked
column changed) re-applies as a natural no-op because the change
detector finds no diffs the second time either. Each apply is ONE
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
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.scd import Scd2Table


def last_applied_batch(dim: Scd2Table) -> int:
    """Highest batch_id that OPENED at least one version row, or -1."""
    if not dim.acid.exists():
        return -1
    last = dim.acid.read().agg(F.max("valid_from")).collect()[0][0]
    return -1 if last is None else int(last)


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
