"""Custom stateful streaming operators via applyInPandasWithState.

Where the built-in window aggregates (windows.py) can't express the
semantics — per-key running state machines, custom eviction, cross-batch
counters — this is the escape hatch: per-group pandas batches with an
explicit GroupState handle. State is stored in the streaming state store
(RocksDB/HDFS-backed on a cluster), bounded by the configured timeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_COUNTER_SCHEMA = "user_id long, total_events long, total_value double, batches long"
STATE_SCHEMA = "total_events long, total_value double, batches long"


def _update_user_counter(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user totals across micro-batches (exactly-once within
    the streaming query via the state store + checkpoint)."""
    if state.exists:
        total_events, total_value, batches = state.get
    else:
        total_events, total_value, batches = 0, 0.0, 0

    new_events = 0
    new_value = 0.0
    for pdf in pdfs:
        new_events += len(pdf)
        new_value += float(pdf["value"].sum())

    total_events += new_events
    total_value += new_value
    batches += 1
    state.update((total_events, total_value, batches))

    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total_events],
            "total_value": [total_value],
            "batches": [batches],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user counters over an events stream.

    Emits the updated running totals for each user present in each
    micro-batch (update semantics). State never expires here
    (NoTimeout); production deployments pick ProcessingTimeTimeout /
    EventTimeTimeout to bound state for churning key spaces."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counter,
        outputStructType=USER_COUNTER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
