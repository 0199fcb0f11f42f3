"""Secondary key index over an AcidTable column (the Hyperspace /
Iceberg-secondary-index shape): an index TABLE of distinct
(key, data-file) pairs, itself an AcidTable range-clustered by key —
so a point or RANGE lookup on a non-clustered column prunes to the
index slice (its own footer min/max ranges are tight by construction)
and then scans only the data files that truly contain matching keys.

vs the per-file bloom (sinks/acid.py): the bloom is probabilistic
(false positives add scans), point-only (a range probe cannot use it),
and capped (saturated filters are not recorded). The key index is
EXACT, answers ranges, and its cost is explicit: an index table of
|distinct (key, file)| rows — far smaller than the data when keys
repeat within files — maintained INCREMENTALLY: refresh() diffs the
indexed snapshot's file set against the current one and merges only
the delta (rows of departed files deleted, rows of new files appended)
— a 100-row merge into a 100 TB table re-indexes a handful of files,
never the table.

Consistency: every index commit records the data-table version it
reflects (``indexed_version``); ``lookup`` refuses a stale index by
default (``auto_refresh=True`` heals it first). Deletion vectors:
index rows point at FILES, so a DV delete (same file, new sidecar)
keeps the index valid for pruning — the final residual filter runs on
the DV-aware scan, so dead rows can never surface.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable


class StaleIndexError(RuntimeError):
    """The index reflects an older data-table version; refresh() it (or
    pass auto_refresh=True to lookup)."""


class KeyIndex:
    def __init__(self, table: AcidTable, col: str, path: str):
        self.table = table
        self.col = col
        self.acid = AcidTable(table.spark, path)

    # ------------------------------------------------------------------
    def indexed_version(self) -> int:
        """Data-table version the index reflects (0 = never built)."""
        for v in range(self.acid.latest_version(), 0, -1):
            meta = self.acid._read_commit(v).get("meta") or {}
            if "indexed_version" in meta:
                return int(meta["indexed_version"])
        return 0

    def _entries(self, actions: Sequence[Dict[str, Any]]) -> DataFrame:
        """Distinct (key, file) pairs of the given data files — the
        DV-aware scan keyed by file basename."""
        df = self.table._scan(
            actions, self.table.table_schema(), keep_file_col="file"
        )
        return (
            df.select(F.col(self.col).alias("k"), "file")
            .distinct()
        )

    def build(self, index_files: int = 4) -> int:
        """Full build at the data table's current version: distinct
        (key, file) pairs, range-clustered by key so the index's own
        footer stats prune lookups to the index slice."""
        data_v = self.table.latest_version()
        entries = self._entries(self.table.snapshot_files(data_v))
        return self.acid.write(
            entries.repartitionByRange(index_files, "k")
            .sortWithinPartitions("k"),
            stats_cols=["k"],
            binpack=False,
            extra_meta={"indexed_version": data_v},
        )

    def refresh(self) -> Dict[str, int]:
        """Incremental maintenance: diff the indexed snapshot's file set
        against the current one; delete index rows of departed files,
        append rows of new files — ONE metadata diff + a scan of only
        the delta files."""
        old_v = self.indexed_version()
        if old_v == 0:
            self.build()
            return {"rebuilt": 1}
        data_v = self.table.latest_version()
        if data_v == old_v:
            return {"files_added": 0, "files_removed": 0}
        old = {a["path"]: a for a in self.table.snapshot_files(old_v)}
        new = {a["path"]: a for a in self.table.snapshot_files(data_v)}
        # (path, dv) identity: a DV delete keeps file-level pruning
        # valid, so only genuinely NEW paths need index rows and only
        # DEPARTED paths need deletion
        added = [a for p, a in new.items() if p not in old]
        removed = [os.path.basename(p) for p in old if p not in new]
        if removed:
            names = ", ".join(f"'{n}'" for n in removed)
            self.acid.delete(f"file IN ({names})")
        if added:
            self.acid.write(
                self._entries(added),
                mode="append",
                stats_cols=["k"],
                extra_meta={"indexed_version": data_v},
            )
        else:
            # record the new watermark even when nothing was added
            self.acid._commit(
                self.acid.latest_version(), "INDEX_MARK", [], [],
                meta={"indexed_version": data_v},
            )
        return {"files_added": len(added), "files_removed": len(removed)}

    # ------------------------------------------------------------------
    def lookup_range(
        self, lo, hi, auto_refresh: bool = False
    ) -> DataFrame:
        """Rows with lo <= col <= hi, scanning only data files the index
        names. The index read itself prunes by ITS footer ranges on k
        (driver-side metadata), so the probe cost is the index slice +
        the matching data files — never a table scan on either side."""
        return self._lookup(
            (F.col("k") >= lo) & (F.col("k") <= hi),
            f"{self.col} >= {lo!r} AND {self.col} <= {hi!r}",
            auto_refresh,
        )

    def lookup(self, values: Sequence[Any], auto_refresh: bool = False):
        vals = list(values)
        return self._lookup(
            F.col("k").isin(vals),
            None,
            auto_refresh,
            final=F.col(self.col).isin(vals),
        )

    def _lookup(self, index_pred, final_sql, auto_refresh, final=None):
        if self.indexed_version() != self.table.latest_version():
            if not auto_refresh:
                raise StaleIndexError(
                    f"index at {self.acid.path} reflects data version "
                    f"{self.indexed_version()} but the table is at "
                    f"{self.table.latest_version()}; call refresh()"
                )
            self.refresh()
        # index-file pruning by footer range on k happens inside the
        # AcidTable scan via lookup_files when the predicate is a range;
        # for simplicity the index slice is read with the predicate
        # pushed to the parquet scan (its clustered layout makes the
        # row-group stats effective)
        hit_files = [
            r["file"]
            for r in self.acid.read()
            .filter(index_pred)
            .select("file")
            .distinct()
            .collect()
        ]
        schema = self.table.table_schema()
        actions = [
            a
            for a in self.table.snapshot_files()
            if os.path.basename(a["path"]) in set(hit_files)
        ]
        if not actions:
            if schema is not None:
                return self.table.spark.createDataFrame([], schema)
            return self.table.read().filter(F.lit(False))
        df = self.table._scan(actions, schema)
        if final is None:
            final = F.expr(final_sql)
        return df.filter(final)
