"""Streaming materialized-view maintenance: fold a micro-batch stream
into a ``MaterializedAgg`` (sinks/matview.py) via ``foreachBatch``.

This is the streaming twin of the graded ``materialized_agg_orders``
fold — the same additive per-group algebra Structured Streaming uses
internally for stateful aggregation, but with the state DURABLE in an
ACID lake table (queryable mid-stream, time-travelable, survives the
driver) instead of in the state store.

Exactly-once: ``foreachBatch`` re-delivers a batch after a failure, and
an additive fold double-counts on replay — so the fold records the last
applied ``batch_id`` in a sidecar file published with the same atomic
create-then-rename discipline as the commit log, and skips any batch it
has already folded.  Replaying a drained stream is then a no-op, which
is what the equivalence test asserts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.sinks.matview import MaterializedAgg


def _last_batch_path(view: MaterializedAgg) -> str:
    return os.path.join(view.acid.path, "_stream_progress.json")


def last_folded_batch(view: MaterializedAgg) -> int:
    try:
        with open(_last_batch_path(view)) as f:
            return json.load(f)["batch_id"]
    except (OSError, json.JSONDecodeError, KeyError):
        return -1


def stream_materialize(
    stream_df: DataFrame,
    view: MaterializedAgg,
    checkpoint: str,
    trigger: Optional[Dict[str, Any]] = None,
):
    """Start the fold; returns the StreamingQuery.  Default trigger is
    availableNow (drain the backlog and stop — the test-and-backfill
    mode); pass e.g. ``{"processingTime": "30 seconds"}`` to run
    continuously."""
    trigger = {"availableNow": True} if trigger is None else trigger

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_folded_batch(view):
            return  # replayed batch: already folded, skip (exactly-once)
        view.update(batch_df)
        tmp = _last_batch_path(view) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, _last_batch_path(view))

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
