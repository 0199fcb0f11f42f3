"""Persistence: the four write strategies (SURVEY.md §2.1 K1-K9).

Reference (src/pipeline/persistence/batch_writer.py:26-524) writes pandas
DataFrames to PostgreSQL with INSERT / UPSERT / REPLACE / APPEND. Spark
restatement over lake tables (parquet directories; Delta MERGE would slot
in where available — delta-spark is not in this environment, so UPSERT is
the documented join-rewrite):

- INSERT  (K1, :144-160) -> append; optional duplicate-key pre-check (the
  RDBMS PK violation has no lake-table equivalent, so the check is an
  explicit anti-join validation, off by default at scale).
- APPEND  (K5, :306-327) -> ``mode("append")``.
- REPLACE (K4, :278-304) -> ``mode("overwrite")`` (TRUNCATE+insert parity).
- UPSERT  (K3, :230-276) -> join-rewrite: keep target rows that do NOT
  match a source key (left_anti), union the source, overwrite atomically
  via a staged write. On a real cluster this is Delta ``MERGE INTO``; the
  semantics here mirror ON CONFLICT DO UPDATE (all non-key columns take
  the source's values; source rows with no match are inserted).

Scale notes: the anti-join shuffles on the upsert keys — with bucketed or
partitioned targets only matching partitions need rewriting (dynamic
partition overwrite). K2 COPY / K8 outer chunking are deleted: Spark's
writers are already parallel and bulk.
"""

from __future__ import annotations

import enum
import os
import shutil
import time
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_platform_spark.utils.retry import retry_call


def recover_staged_swap(path: str) -> None:
    """Heal a crashed stage-then-swap before re-attempting it.

    The swap sequence is: write ``path.__staging__``, rename ``path`` ->
    ``path.__old__``, rename staging -> ``path``, delete backup. A crash
    between the two renames leaves the backup as the ONLY copy of the
    table — a naive re-run would then see "no target" and write just the
    source batch, silently dropping every pre-existing row. Recovery
    rules (each observable state has exactly one owner):

    - backup exists, table missing  -> crashed mid-swap: the backup IS
      the table; restore it.
    - backup exists, table present  -> crashed after the swap completed
      but before cleanup: the table is current; discard the backup.
    - staging exists                -> always stale (it is rewritten from
      scratch each attempt); discard.
    """
    backup = path + ".__old__"
    staging = path + ".__staging__"
    if os.path.isdir(backup):
        if os.path.isdir(path):
            shutil.rmtree(backup)
        else:
            os.rename(backup, path)
    if os.path.isdir(staging):
        shutil.rmtree(staging)


class WriteStrategy(enum.Enum):
    INSERT = "insert"
    UPSERT = "upsert"
    REPLACE = "replace"
    APPEND = "append"

    @classmethod
    def from_string(cls, s: str) -> "WriteStrategy":
        """Unknown strategy string -> INSERT (reference tasks.py:318 parity)."""
        try:
            return cls(s.lower())
        except ValueError:
            return cls.INSERT


class DuplicateKeyError(ValueError):
    pass


class BatchWriter:
    """Write DataFrames to parquet lake tables under a base path."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str = "/tmp/dpps-warehouse",
        fmt: str = "parquet",
        max_retries: int = 3,
    ):
        self.spark = spark
        self.base_path = base_path
        self.fmt = fmt
        self.max_retries = max_retries
        self._stats: List[Dict[str, Any]] = []
        self._savepoints: List[Dict[str, Any]] = []
        os.makedirs(base_path, exist_ok=True)

    def _table_path(self, table: str, schema: Optional[str] = None) -> str:
        return os.path.join(self.base_path, schema or "default", table)

    def table_exists(self, table: str, schema: Optional[str] = None) -> bool:
        path = self._table_path(table, schema)
        return os.path.isdir(path) and any(
            f.endswith(self.fmt) or f.startswith("part-") for f in os.listdir(path)
        )

    def read_table(self, table: str, schema: Optional[str] = None) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self._table_path(table, schema))

    # -- main entry (reference batch_writer.py:81-179) --------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        strategy: WriteStrategy = WriteStrategy.INSERT,
        schema: Optional[str] = None,
        upsert_keys: Optional[List[str]] = None,
        output_schema=None,
        check_duplicates: bool = False,
        partition_by: Optional[List[str]] = None,
    ) -> Dict[str, Any]:
        """Dispatch on strategy; returns write stats (K9 parity)."""
        if output_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            df = SchemaValidator().validate(df, output_schema)

        start = time.time()
        path = self._table_path(table, schema)

        def _do() -> int:
            if strategy == WriteStrategy.UPSERT:
                if not upsert_keys:
                    raise ValueError("UPSERT requires upsert_keys")  # (:240-241)
                return self._write_upsert(df, path, upsert_keys, partition_by)
            if strategy == WriteStrategy.REPLACE:
                return self._write_mode(df, path, "overwrite", partition_by)
            if strategy == WriteStrategy.INSERT and check_duplicates and upsert_keys:
                self._check_duplicate_keys(df, path, upsert_keys)
            return self._write_mode(df, path, "append", partition_by)

        self._snapshot_for_savepoint(path)
        rows = retry_call(_do, max_retries=self.max_retries)
        duration = time.time() - start
        stat = {
            "table": table,
            "rows_written": rows,
            "duration": duration,
            "strategy": strategy.value,
            "timestamp": start,
        }
        self._stats.append(stat)
        return stat

    def _write_mode(
        self, df: DataFrame, path: str, mode: str, partition_by: Optional[List[str]]
    ) -> int:
        # rows_written via the Observation API: the count is computed as a
        # metric of the write job itself — no second pass over the input
        # (a naive df.count() would re-execute the full upstream plan)
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = observed.write.format(self.fmt).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return obs.get["rows"]

    def _check_duplicate_keys(self, df: DataFrame, path: str, keys: List[str]) -> None:
        """INSERT duplicate-PK failure parity (reference K1): explicit
        semi-join check against the existing table. O(shuffle) — off by
        default; enable only when PK semantics are required."""
        if not os.path.isdir(path):
            return
        existing = self.spark.read.format(self.fmt).load(path)
        dup = df.join(existing.select(*keys), on=keys, how="left_semi").limit(1)
        if dup.count() > 0:
            raise DuplicateKeyError(f"duplicate key(s) {keys} already present in {path}")

    # -- K3 UPSERT join-rewrite (reference :230-276) ----------------------
    def _write_upsert(
        self, df: DataFrame, path: str, keys: List[str], partition_by: Optional[List[str]]
    ) -> int:
        """ON CONFLICT (keys) DO UPDATE SET non-keys = EXCLUDED.* parity.

        Duplicate keys *within one source batch* collapse to the last
        occurrence — mirrors sequential INSERT..ON CONFLICT row order
        (reference :258-270 iterates chunk rows in order). We implement
        "last wins" deterministically with a row_number over a
        monotonically-increasing id.

        Retry-safe: a prior attempt may have died anywhere in the swap
        sequence, so every entry first heals leftover swap state (see
        recover_staged_swap). Readers racing the two renames can still
        observe a missing directory for a moment — a catalog/Delta
        commit is the fix on a real deployment; for lake-path tables the
        window is two directory renames.
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        recover_staged_swap(path)

        src = df
        # dedup source on keys: last occurrence wins
        w = Window.partitionBy(*keys).orderBy(F.col("__dpps_seq").desc())
        src = (
            src.withColumn("__dpps_seq", F.monotonically_increasing_id())
            .withColumn("__dpps_rn", F.row_number().over(w))
            .filter(F.col("__dpps_rn") == 1)
            .drop("__dpps_seq", "__dpps_rn")
        )

        if not os.path.isdir(path) or not os.listdir(path):
            return self._write_mode(src, path, "overwrite", partition_by)

        target = self.spark.read.format(self.fmt).load(path)
        kept = target.join(src.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(src.select(*target.columns))

        # stage-then-swap: reading and overwriting the same path in one
        # job is unsafe (Spark would delete inputs mid-scan)
        staging = path + ".__staging__"
        from pyspark.sql import Observation
        from pyspark.sql import functions as F2

        obs = Observation()
        merged = merged.observe(obs, F2.count(F2.lit(1)).alias("rows"))
        writer = merged.write.format(self.fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(staging)
        rows = obs.get["rows"]
        backup = path + ".__old__"
        if os.path.isdir(backup):
            shutil.rmtree(backup)
        os.rename(path, backup)
        os.rename(staging, path)
        shutil.rmtree(backup)
        return rows

    # -- savepoints (reference batch_writer.py:427-454 nested SAVEPOINT) --
    def _snapshot_for_savepoint(self, path: str) -> None:
        """Before the first write to ``path`` inside each active
        savepoint scope, capture its pre-write state (a directory copy;
        None if the table doesn't exist yet). Rollback restores exactly
        these states, innermost scope first."""
        for depth, frame in enumerate(self._savepoints):
            if path in frame["snapshots"]:
                continue
            if os.path.isdir(path):
                snap = f"{path}.__sp_{frame['name']}_{depth}__"
                if os.path.isdir(snap):
                    shutil.rmtree(snap)
                shutil.copytree(path, snap)
                frame["snapshots"][path] = snap
            else:
                frame["snapshots"][path] = None

    def savepoint(self, name: str = "sp"):
        """Nested-rollback scope over lake tables (the SAVEPOINT analog;
        reference batch_writer.py:427-454).

        Inside ``with writer.savepoint("cp"):`` every table is
        snapshotted (copy-on-first-write) before its first mutation; an
        exception restores each touched table to its pre-scope state —
        tables created inside the scope are removed — and re-raises.
        Success discards the snapshots. Scopes nest: rolling back an
        inner savepoint leaves the outer scope's snapshots (and thus its
        rollback point) intact, mirroring ROLLBACK TO SAVEPOINT.

        Directory-copy snapshots suit test/dev scale; on a production
        lakehouse this maps to Delta/Iceberg time travel (RESTORE TO
        VERSION), where the snapshot is a metadata pointer, not a copy.
        """
        import contextlib

        @contextlib.contextmanager
        def _scope():
            frame: Dict[str, Any] = {"name": name, "snapshots": {}}
            self._savepoints.append(frame)
            try:
                yield self
            except BaseException:
                for path, snap in frame["snapshots"].items():
                    if os.path.isdir(path):
                        shutil.rmtree(path)
                    if snap is not None:
                        os.rename(snap, path)
                raise
            else:
                for snap in frame["snapshots"].values():
                    if snap is not None and os.path.isdir(snap):
                        shutil.rmtree(snap)
            finally:
                self._savepoints.remove(frame)

        return _scope()

    # -- K9 stats (reference :170-177, 507-524) ---------------------------
    def get_write_stats(self, table: Optional[str] = None) -> List[Dict[str, Any]]:
        if table is None:
            return list(self._stats)
        return [s for s in self._stats if s["table"] == table]

    def clear_stats(self) -> None:
        self._stats.clear()

    # -- bucketed tables (the 100 TB co-located-join path) ----------------
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: List[str],
        num_buckets: int = 32,
        sort_cols: Optional[List[str]] = None,
        mode: str = "overwrite",
    ) -> None:
        """Write a bucketed (and optionally sorted) catalog table.

        Two tables bucketed on the same keys with the same bucket count
        join WITHOUT a shuffle (Spark matches bucket ids side to side) —
        this is how the orders⋈lineitem shuffle disappears at 100 TB.
        Requires saveAsTable (bucket metadata lives in the catalog).
        """
        writer = (
            df.write.format(self.fmt)
            .mode(mode)
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.option("path", self._table_path(table)).saveAsTable(table)

    # -- JDBC sink (K1/K5 for RDBMS targets) ------------------------------
    def write_jdbc(
        self,
        df: DataFrame,
        url: str,
        table: str,
        mode: str = "append",
        batchsize: int = 10_000,
        properties: Optional[Dict[str, str]] = None,
    ) -> None:
        """JDBC bulk write; batchsize mirrors the reference's 10k chunking
        (batch_writer.py:42) and replaces the COPY fast path (K2)."""
        writer = (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("batchsize", batchsize)
            .mode(mode)
        )
        for k, v in (properties or {}).items():
            writer = writer.option(k, v)
        writer.save()

    # -- clustered layout (row-group pruning path) -------------------------
    def backfill_partitions(
        self,
        df: DataFrame,
        table: str,
        partition_col: str,
        partition_values: List,
        schema: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Idempotently recompute a subset of a partitioned table: only
        the named partitions are replaced; every other partition's files
        are untouched bytes.

        Mechanism: dynamic partition overwrite (overwrite mode deletes
        ONLY the partitions present in the written data) over ``df``
        pre-filtered to ``partition_values`` — the filter is the safety
        interlock, so a recompute frame accidentally containing extra
        dates cannot clobber partitions outside the requested range.
        Replaying the same backfill rewrites the same partitions with
        the same rows — the at-least-once-safe shape every orchestrated
        backfill job needs. The conf flips per-call and restores, so
        other writers on the session keep static-overwrite semantics.
        """
        from pyspark.sql import functions as F

        spark = df.sparkSession
        path = self._table_path(table, schema)
        scoped = df.filter(F.col(partition_col).isin(partition_values))
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            from pyspark.sql import Observation

            obs = Observation()
            observed = scoped.observe(obs, F.count(F.lit(1)).alias("rows"))
            (
                observed.write.format(self.fmt)
                .mode("overwrite")
                .partitionBy(partition_col)
                .save(path)
            )
            rows = obs.get["rows"]
        finally:
            spark.conf.set(conf_key, prev)
        stat = {
            "table": table,
            "rows_written": rows,
            "strategy": "backfill",
            "partitions": list(partition_values),
            "timestamp": time.time(),
        }
        self._stats.append(stat)
        return stat

    def write_clustered(
        self,
        df: DataFrame,
        table: str,
        cluster_cols: List[str],
        num_files: int = 32,
        mode: str = "overwrite",
    ) -> str:
        """Write globally clustered parquet: range-partition on
        ``cluster_cols`` then sort within each partition, so every
        output file owns a near-disjoint key range and each row group's
        parquet min/max statistics become selective.

        This is the layout half of scan pruning: partition directories
        prune whole folders (``functions/scale.py`` date layout), and
        clustering prunes ROW GROUPS inside files — a filter on the
        cluster key skips the row groups whose [min, max] miss the
        predicate, which is how a 100 TB time-range or key-range query
        reads gigabytes instead of the full table. Range partitioning
        also bounds file skew (each file gets ~1/num_files of the rows,
        sampled), unlike hash-partitioned sorts.
        """
        path = self._table_path(table)
        (
            df.repartitionByRange(num_files, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .write.format(self.fmt)
            .mode(mode)
            .save(path)
        )
        return path

    def write_zorder(
        self,
        df: DataFrame,
        table: str,
        zorder_cols: List[str],
        num_files: int = 32,
        bits: int = 8,
        mode: str = "overwrite",
    ) -> str:
        """Write parquet Z-ORDER-clustered on two or more columns:
        each column is quantile-bucketed to a ``bits``-bit code against
        sampled boundaries, the per-column codes are bit-interleaved
        into one Morton code, and the data is range-partitioned + sorted
        on that code.

        Why not write_clustered twice: 1-D clustering makes ONE
        column's row-group [min, max] selective and leaves the others
        shuffled. Morton interleaving keeps every file inside a small
        hyper-rectangle of the key space, so row-group stats prune on
        EACH z-ordered column independently — the standard lakehouse
        layout for "filter by either key" tables (Delta/Iceberg
        OPTIMIZE ZORDER).

        Scale: boundaries come from approxQuantile (sampled, driver-
        sized: 2^bits values per column) and enter the plan as
        broadcast literals; the bucketing is a row-local array fold —
        deliberately NOT a percent_rank window, whose global ORDER BY
        collapses to one task. The only exchange is the final range
        partition on the Morton code.
        """
        from pyspark.sql import functions as F

        n = len(zorder_cols)
        levels = 1 << bits
        z = df
        code_cols = []
        for c in zorder_cols:
            probs = [i / levels for i in range(1, levels)]
            bounds = df.approxQuantile(c, probs, 0.001)
            arr = "array(" + ", ".join(repr(float(b)) for b in bounds) + ")"
            code = f"__z_{c}"
            # bucket = number of boundaries <= value (row-local fold)
            z = z.withColumn(
                code,
                F.expr(
                    f"CAST(size(filter({arr}, b -> b <= CAST({c} AS DOUBLE))) AS BIGINT)"
                ),
            )
            code_cols.append(code)
        # interleave: bit i of column k lands at position i * n_cols + k
        terms = " + ".join(
            f"shiftleft(shiftright({code}, {i}) & 1, {i * n + k})"
            for k, code in enumerate(code_cols)
            for i in range(bits)
        )
        z = z.withColumn("__zcode", F.expr(f"CAST({terms} AS BIGINT)"))
        path = self._table_path(table)
        (
            z.repartitionByRange(num_files, "__zcode")
            .sortWithinPartitions("__zcode")
            .drop("__zcode", *code_cols)
            .write.format(self.fmt)
            .mode(mode)
            .save(path)
        )
        return path
