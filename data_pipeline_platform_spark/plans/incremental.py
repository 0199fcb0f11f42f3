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

    def commit_watermark(
        self, df: DataFrame, source_id: str, watermark_col: str
    ) -> Optional[Any]:
        """Record max(watermark_col) of the just-processed increment.
        Call AFTER the persist succeeds — crash between persist and
        commit re-processes the increment (at-least-once; pair with
        UPSERT or idempotency keys for effective exactly-once)."""
        row = df.agg(F.max(watermark_col).alias("hwm")).collect()[0]
        if row["hwm"] is not None:
            self.store.set(source_id, row["hwm"])
        return row["hwm"]
