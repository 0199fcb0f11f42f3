"""Versioned dataset writes: an append-only snapshot log over plain
parquet directories — the reproducibility primitive a training-data
pipeline needs (pin the exact corpus snapshot a model trained on, diff
two snapshots, roll back a bad curation run) without requiring a table
format's runtime.

Layout per table:

    <base>/<table>/
        v=1/part-*.parquet      immutable snapshot data
        v=2/part-*.parquet
        _snapshots.json         append-only log: one entry per version

Design points, in scale order:
- snapshots are IMMUTABLE directories: a new write never touches old
  files, so concurrent readers of v=N are safe with zero coordination
  and storage is content-addressed-friendly (dedupe at the object
  store).
- the log append is a read-modify-write of a small JSON file guarded by
  an O_EXCL lock file — single-writer semantics, the same discipline a
  real lakehouse gets from a metastore transaction. Reads never take
  the lock.
- time travel = read the directory the log names. `version=None` reads
  the latest COMMITTED version — a crashed writer that left data files
  but no log entry is invisible to readers (write data first, commit
  the log entry last).
- rollback is O(1): append a new log entry pointing at the old
  directory. Nothing is rewritten.

At 100 TB the per-version data write is an ordinary distributed parquet
write; the log stays tiny (one JSON entry per snapshot) regardless of
data size.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


class VersionedWriter:
    """Snapshot-versioned parquet tables with time-travel reads."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path

    def _dir(self, table: str) -> str:
        return os.path.join(self.base_path, table)

    def _log_path(self, table: str) -> str:
        return os.path.join(self._dir(table), "_snapshots.json")

    def _read_log(self, table: str) -> List[Dict[str, Any]]:
        p = self._log_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _append_log(self, table: str, entry: Dict[str, Any]) -> None:
        """Append one entry under an O_EXCL lock (single committer)."""
        os.makedirs(self._dir(table), exist_ok=True)
        lock = self._log_path(table) + ".lock"
        fd = None
        for _ in range(50):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                time.sleep(0.1)
        if fd is None:
            raise TimeoutError(f"snapshot log lock busy: {lock}")
        try:
            log = self._read_log(table)
            log.append(entry)
            tmp = self._log_path(table) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(log, f, indent=1)
            os.replace(tmp, self._log_path(table))
        finally:
            os.close(fd)
            os.remove(lock)

    def write_snapshot(
        self,
        df: DataFrame,
        table: str,
        message: str = "",
        parent: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Write a new immutable snapshot; returns the log entry.

        Data lands BEFORE the log entry commits, so a crash mid-write
        leaves an orphan directory readers never see (and a later write
        reuses the next free version number, not the orphan's)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        os.makedirs(self._dir(table), exist_ok=True)
        log = self._read_log(table)
        version = (max((e["version"] for e in log), default=0)) + 1
        # claim the version number with an atomic mkdir — two concurrent
        # writers (or a writer racing a crashed writer's orphan dir)
        # cannot both own the same slot, with no lock held during the
        # (long) data write
        while True:
            data_dir = os.path.join(self._dir(table), f"v={version}")
            try:
                os.makedirs(data_dir, exist_ok=False)
                break
            except FileExistsError:
                version += 1
        obs = Observation()
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        observed.write.mode("overwrite").parquet(data_dir)
        entry = {
            "version": version,
            "dir": f"v={version}",
            "rows": obs.get["rows"],
            "parent": parent,
            "message": message,
            "ts": time.time(),
        }
        self._append_log(table, entry)
        return entry

    def read(self, table: str, version: Optional[int] = None) -> DataFrame:
        """Time-travel read: latest committed snapshot, or an exact
        version. Raises KeyError on an unknown version."""
        log = self._read_log(table)
        if not log:
            raise KeyError(f"no snapshots for table {table!r}")
        if version is None:
            entry = log[-1]
        else:
            matches = [e for e in log if e["version"] == version]
            if not matches:
                raise KeyError(f"{table!r} has no snapshot version {version}")
            entry = matches[-1]
        return self.spark.read.parquet(
            os.path.join(self._dir(table), entry["dir"])
        )

    def history(self, table: str) -> List[Dict[str, Any]]:
        return list(self._read_log(table))

    def rollback(self, table: str, to_version: int) -> Dict[str, Any]:
        """O(1) rollback: append a log entry whose data dir is the old
        snapshot's. No data moves; the latest read now resolves there."""
        log = self._read_log(table)
        matches = [e for e in log if e["version"] == to_version]
        if not matches:
            raise KeyError(f"{table!r} has no snapshot version {to_version}")
        old = matches[-1]
        version = max(e["version"] for e in log) + 1
        entry = {
            "version": version,
            "dir": old["dir"],
            "rows": old["rows"],
            "parent": to_version,
            "message": f"rollback to v{to_version}",
            "ts": time.time(),
        }
        self._append_log(table, entry)
        return entry

    def optimize(self, table: str, target_files: int = 8) -> Dict[str, Any]:
        """OPTIMIZE: rewrite the latest snapshot's data into
        ``target_files`` files as a NEW snapshot (data-identical; the
        old version stays readable — time travel is the undo). The
        streaming-ingest analog of `functions/scale.py::compact`, but
        version-safe: nothing is rewritten in place, so concurrent
        readers of any version never see a half-compacted directory."""
        latest = self._read_log(table)[-1]["version"]
        df = self.read(table, latest).coalesce(target_files)
        return self.write_snapshot(
            df, table, message=f"optimize v{latest} -> {target_files} files",
            parent=latest,
        )

    def diff_counts(self, table: str, v_from: int, v_to: int, key: str) -> Dict[str, int]:
        """Snapshot diff by key: rows added / removed between versions
        (two anti-joins — the distributed way; never a collect)."""
        a = self.read(table, v_from).select(key)
        b = self.read(table, v_to).select(key)
        return {
            "added": b.join(a, key, "left_anti").count(),
            "removed": a.join(b, key, "left_anti").count(),
        }
