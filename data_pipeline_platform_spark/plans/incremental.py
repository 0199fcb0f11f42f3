"""Incremental (high-water-mark) ingestion.

The reference's parameterized-query pattern (`:start_date`,
tests/fixtures/data/pipeline_config.json:3-7) formalized: persist the
max watermark value after each successful run, read only rows beyond it
on the next. This is what turns a 100 TB source into a per-run delta —
the single most important cost lever for repeated pipelines.

State is a tiny JSON file (swap for a table in production); the
read-filter composes into the source scan, so parquet sources prune
row groups / partitions by the watermark predicate and JDBC sources ship
it as a WHERE clause.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """Durable per-source high-water marks."""

    def __init__(self, path: str = "/tmp/dpps-watermarks.json"):
        self.path = path

    def _load(self) -> Dict[str, Any]:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def get(self, source_id: str) -> Optional[Any]:
        return self._load().get(source_id)

    def set(self, source_id: str, value: Any) -> None:
        state = self._load()
        state[source_id] = value
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, default=str)
        os.replace(tmp, self.path)


class IncrementalIngestor:
    """Read-beyond-watermark + advance-after-persist."""

    def __init__(self, store: Optional[WatermarkStore] = None):
        self.store = store or WatermarkStore()

    def read_increment(
        self, df: DataFrame, source_id: str, watermark_col: str
    ) -> DataFrame:
        """Filter to rows past the stored watermark (everything on the
        first run). The predicate is a plain comparison — Catalyst pushes
        it into the scan."""
        last = self.store.get(source_id)
        if last is None:
            return df
        return df.filter(F.col(watermark_col) > F.lit(last))

    def observe_watermark(self, df: DataFrame, watermark_col: str):
        """Attach a max-watermark observation to the increment.

        Returns ``(observed_df, handle)``: persist the RETURNED frame,
        then pass the handle to :meth:`commit_observed`. The max is
        computed by the SAME job that writes the rows — a separate
        post-persist aggregation would re-execute the plan, and on a
        live source (JDBC) that second scan can include rows that
        arrived after the persisted read, advancing the watermark past
        rows that were never written (silently skipped forever on the
        next increment).
        """
        from pyspark.sql import Observation

        obs = Observation()
        return df.observe(obs, F.max(F.col(watermark_col)).alias("hwm")), obs

    def commit_observed(self, obs, source_id: str) -> Optional[Any]:
        """Commit the watermark captured by the persist job itself.
        Call AFTER the persist succeeds — crash between persist and
        commit re-processes the increment (at-least-once; pair with
        UPSERT or idempotency keys for effective exactly-once)."""
        hwm = obs.get["hwm"]
        if hwm is not None:
            self.store.set(source_id, hwm)
        return hwm

    def ingest(
        self,
        df: DataFrame,
        source_id: str,
        watermark_col: str,
        persist,
    ) -> Optional[Any]:
        """read-beyond-watermark -> persist -> advance, in one call.
        ``persist`` is a callable receiving the (observed) increment
        DataFrame; it must trigger exactly one action that writes it.
        Returns the committed watermark (None if the increment was
        empty)."""
        increment = self.read_increment(df, source_id, watermark_col)
        observed, obs = self.observe_watermark(increment, watermark_col)
        persist(observed)
        return self.commit_observed(obs, source_id)

    def commit_watermark(
        self, df: DataFrame, source_id: str, watermark_col: str
    ) -> Optional[Any]:
        """Record max(watermark_col) by RE-SCANNING ``df``. Only sound
        for frozen sources (an immutable parquet snapshot) — on a live
        source the re-scan can see rows the persist did not, breaking
        at-least-once. Prefer :meth:`ingest` / :meth:`observe_watermark`
        + :meth:`commit_observed`, which read the watermark out of the
        persist job itself."""
        row = df.agg(F.max(watermark_col).alias("hwm")).collect()[0]
        if row["hwm"] is not None:
            self.store.set(source_id, row["hwm"])
        return row["hwm"]
