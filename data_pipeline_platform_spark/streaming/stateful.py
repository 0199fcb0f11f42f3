"""Custom stateful streaming operators via applyInPandasWithState.

Where the built-in window aggregates (windows.py) can't express the
semantics — per-key running state machines, custom eviction, cross-batch
counters — this is the escape hatch: per-group pandas batches with an
explicit GroupState handle. State is stored in the streaming state store
(RocksDB/HDFS-backed on a cluster), bounded by the configured timeout.

Spark 4's successor API (``transformWithStateInPandas`` — typed
ValueState/ListState/MapState handles, timers, TTL) is present in this
PySpark build but ENVIRONMENT-BLOCKED here: its state-server protocol
imports ``google.protobuf``, which this container lacks (verified —
the driver worker dies with ImportError at
StateSchemaValidation; same class of gate as FastAPI). The operators
below stay on ``applyInPandasWithState`` (protobuf-free protocol),
which remains fully supported; a deployment with protobuf can port
them mechanically (the state layout is the same tuple-of-columns).
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


# ---------------------------------------------------------------------------
# streaming z-score anomaly detection: the stateful twin of the batch
# functions/events.py::q_events_anomaly (same fixed-point moments, same
# threshold), so a one-micro-batch run reproduces the batch flags exactly
# ---------------------------------------------------------------------------

ANOMALY_Z_SCALE = 1_000_000  # matches functions/events.py _Z_SCALE
ANOMALY_THRESHOLD = 2.5  # matches functions/events.py _Z_THRESHOLD
# second moments of 1e-6-scaled values overflow int64 (~2.4e17 per
# event at value~490); the state store has no DECIMAL surface, so the
# exact python-int sum is carried as two BIGINTs split at 1e18
_SPLIT = 10**18

ANOMALY_SCHEMA = (
    "user_id long, kind string, event_id long, value double, z double, "
    "n long, sum_fp long, sumsq_hi long, sumsq_lo long"
)
ANOMALY_STATE_SCHEMA = "n long, sum_fp long, sumsq_hi long, sumsq_lo long"


def _update_anomaly(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running moments + within-batch z-score flags.

    Moments are exact integers (value scaled to 1e-6 fixed point;
    squares summed as python ints via object dtype, split into hi/lo
    BIGINTs for the state store). The z computation rounds each exact
    integer to double FIRST and then divides — the same operation order
    as the batch SQL (CAST(x AS DOUBLE)/n), so a single-micro-batch run
    is bit-identical to q_events_anomaly's filter decisions.

    Emission contract (update mode): one 'stats' row per user per batch
    with the running moments, plus one 'flag' row per event in THIS
    batch whose |z| >= threshold against the end-of-batch state.
    """
    import math

    if state.exists:
        n, sum_fp, hi, lo = state.get
    else:
        n, sum_fp, hi, lo = 0, 0, 0, 0
    sumsq = hi * _SPLIT + lo

    batches = [pdf for pdf in pdfs if len(pdf)]
    fps = []
    for pdf in batches:
        v_fp = (pdf["value"] * ANOMALY_Z_SCALE).round().astype("int64")
        fps.append(v_fp)
        n += len(pdf)
        sum_fp += int(v_fp.sum())
        # object dtype: python-int arithmetic, no int64 overflow
        sumsq += int((v_fp.astype(object) ** 2).sum())

    state.update((n, sum_fp, sumsq // _SPLIT, sumsq % _SPLIT))

    user_id = key[0]
    out = [
        pd.DataFrame(
            {
                "user_id": [user_id],
                "kind": ["stats"],
                "event_id": [None],
                "value": [None],
                "z": [None],
                "n": [n],
                "sum_fp": [sum_fp],
                "sumsq_hi": [sumsq // _SPLIT],
                "sumsq_lo": [sumsq % _SPLIT],
            }
        )
    ]
    # double-rounds first, then divides: CAST(int AS DOUBLE)/n semantics
    mean = float(sum_fp) / n if n else 0.0
    var = (float(sumsq) / n - mean * mean) if n else 0.0
    if var > 0:
        sd = math.sqrt(var)
        for pdf, v_fp in zip(batches, fps):
            z = (v_fp.astype("float64") - mean) / sd
            hit = z.abs() >= ANOMALY_THRESHOLD
            if hit.any():
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": user_id,
                            "kind": "flag",
                            "event_id": pdf["event_id"][hit],
                            "value": pdf["value"][hit],
                            "z": z[hit],
                            "n": n,
                            "sum_fp": sum_fp,
                            "sumsq_hi": sumsq // _SPLIT,
                            "sumsq_lo": sumsq % _SPLIT,
                        }
                    )
                )
    yield pd.concat(out, ignore_index=True)


def streaming_anomaly(events: DataFrame) -> DataFrame:
    """Stateful per-user z-score anomaly detection over an events
    stream (the streaming twin of the batch events_anomaly operator).

    Each micro-batch updates exact running moments in the state store
    and flags this batch's outliers against the state so far — the
    standard production shape where history accumulates and fresh
    events are judged as they arrive. State is bounded by key count
    (4 BIGINTs per user); churning key spaces should switch NoTimeout
    for ProcessingTimeTimeout eviction."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_anomaly,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_SCHEMA = (
    "event_type string, hour_start timestamp, n_events long, "
    "cusum_scaled long, drifting boolean"
)
CUSUM_STATE_SCHEMA = "hours array<long>, counts array<long>"
_HOUR_US = 3_600_000_000  # microseconds per hour


def _update_cusum(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-event-type CUSUM drift detection with REPLAY-INVARIANT
    state: the state store holds the per-hour count census itself
    (calendar-bounded — one BIGINT per observed hour per type, never
    data-bounded), so every batch can recompute the exact batch
    statistic over the full observed series. However the stream is
    split into micro-batches, the final emission equals the batch
    operator bitwise — a stronger contract than judge-against-
    state-so-far, because the CUSUM mean is a whole-series quantity.

    Emission (update mode): the full refreshed hourly series per batch
    (new hours shift the mean, so every hour's statistic can change)."""
    counts: dict = {}
    if state.exists:
        hrs, cnts = state.get
        counts = dict(zip(hrs, cnts))
    for pdf in pdfs:
        if not len(pdf):
            continue
        # epoch-hour bucketing on the raw timestamps (UTC, µs)
        hours = (
            pd.to_datetime(pdf["ts"]).astype("int64") // 1000 // _HOUR_US
        ).astype("int64")
        for h, c in hours.value_counts().items():
            counts[int(h)] = counts.get(int(h), 0) + int(c)

    ordered = sorted(counts.items())
    state.update(([h for h, _ in ordered], [c for _, c in ordered]))

    n = len(ordered)
    total = sum(c for _, c in ordered)
    rows, prefix, min_prefix = [], 0, 0
    for h, c in ordered:
        prefix += n * c - total
        # batch semantics: the running min INCLUDES the current prefix
        # (S_t = P_t - least(min_{j<=t} P_j, 0))
        min_prefix = min(min_prefix, prefix)
        s = prefix - min(min_prefix, 0)
        rows.append(
            {
                "event_type": key[0],
                "hour_start": pd.Timestamp(h * 3600, unit="s"),
                "n_events": c,
                "cusum_scaled": s,
                "drifting": s > 2 * total,
            }
        )
    yield pd.DataFrame(rows)


def streaming_cusum(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch `cusum_changepoints` operator (see
    functions/changepoint.py). State = the hourly count census per
    event type; each micro-batch merges its counts and re-emits the
    exact full-series CUSUM, so a drained stream equals the batch
    operator no matter how the input was split into batches."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
