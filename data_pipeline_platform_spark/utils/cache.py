"""Tracked DataFrame caching.

Operators like MinHash-LSH and the Jaccard inverted index persist an
intermediate frame because Spark re-executes uncached subtrees on every
self-join branch. Those frames are consumed *lazily* — the operator
returns a plan, so it cannot unpersist before the caller materializes
the result. This module gives the caller a handle instead of leaking:

    from data_pipeline_platform_spark.utils.cache import tracked_persist,
        release_tracked

    sh = tracked_persist(with_shingles(docs))   # inside the operator
    ...
    result_df.collect()                         # caller materializes
    release_tracked()                           # caller frees the caches

Long-lived callers (the API service, parity/bench harnesses, tests)
call ``release_tracked()`` after materializing each query so repeated
invocations do not accumulate cached partitions for the session
lifetime. One-shot scripts can skip it — the caches die with the
session either way.
"""

from __future__ import annotations

import threading
from typing import List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: List[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register the frame for later release."""
    persisted = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LOCK:
        _TRACKED.append(persisted)
    return persisted


def release_tracked() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    with _LOCK:
        frames, _TRACKED[:] = _TRACKED[:], []
    released = 0
    for df in frames:
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return released


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
