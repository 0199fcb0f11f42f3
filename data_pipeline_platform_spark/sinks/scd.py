"""SCD Type-2 dimension maintenance over the ACID lake layer.

The reference's persistence layer stops at row-level UPSERT
(src/pipeline/persistence/batch_writer.py:230-276 — last write wins,
history lost).  A warehouse/training-metadata deployment almost always
wants the Type-2 shape instead: every attribute change OPENS a new
version row and CLOSES the old one, so any past state of the dimension
can be reconstructed.  This module supplies that as a thin state machine
on top of ``AcidTable.merge`` — the lake layer already gives atomic
publish, time travel, and copy-on-write file pruning, so SCD2 inherits
"rewrites only the files the batch touches" for free.

Row schema: business keys + tracked attribute columns +
``valid_from`` (BIGINT batch id, caller-supplied and monotonically
increasing — deterministic, replayable; wall-clock timestamps would make
every run unique), ``valid_to`` (BIGINT, NULL while current) and
``is_current`` (BOOLEAN).

Apply semantics (delta batches):

- key absent from the batch        -> untouched (stays current)
- key present, tracked cols equal  -> no-op (null-safe comparison)
- key present, any tracked differs -> close current (valid_to=batch_id),
                                      open new version (valid_from=batch_id)
- brand-new key                    -> open first version

Scale shape: one shuffle join of the batch against CURRENT rows keyed on
the business key (the batch is the small side — Spark broadcasts it),
then ONE ``merge`` whose source is |closed| + |opened| rows; footer
min/max stats on the business key prune every data file the batch does
not touch.  Nothing ever scans closed history.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable

_META = ("valid_from", "valid_to", "is_current")


class Scd2Table:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        tracked: Sequence[str],
    ):
        overlap = set(keys) & set(tracked)
        if overlap:
            raise ValueError(f"columns cannot be both key and tracked: {sorted(overlap)}")
        self.spark = spark
        self.keys = list(keys)
        self.tracked = list(tracked)
        self.acid = AcidTable(spark, path)

    # ------------------------------------------------------------------
    def _validate_batch(self, batch: DataFrame, batch_id: int) -> DataFrame:
        missing = [c for c in self.keys + self.tracked if c not in batch.columns]
        if missing:
            raise ValueError(f"batch missing columns: {missing}")
        batch = batch.select(*self.keys, *self.tracked)
        # duplicate business keys inside one batch are ambiguous (which
        # version opens?) — refuse loudly rather than pick one
        # nondeterministically. IN-PLAN guard instead of an eager
        # count job (r14; the AcidTable.changes() posture): each batch
        # row carries its per-key count from a window and a FILTER
        # re-raises through raise_error() at materialization — the
        # first action of every apply() path (counts agg / first
        # write) runs BEFORE anything commits, so the refuse-loudly
        # contract holds with zero extra jobs.
        from pyspark.sql.window import Window

        w_dup = Window.partitionBy(*self.keys)
        guard = F.when(
            F.count(F.lit(1)).over(w_dup) > 1,
            F.raise_error(
                F.lit(f"batch {batch_id} has duplicate business keys")
            ).cast("boolean"),
        ).otherwise(F.lit(True))
        batch = batch.withColumn("__dup_ok", guard).filter(
            F.col("__dup_ok")
        ).drop("__dup_ok")
        last = self.last_applied_batch()
        if batch_id <= last:
            raise ValueError(
                f"batch_id {batch_id} not after last applied batch {last}"
            )
        return batch

    def last_applied_batch(self) -> int:
        """Highest applied batch_id, or -1. Newest-first commit-meta
        walk — each apply stamps ``scd_batch_id`` into its commit, so
        this stops at the first stamped commit: O(1) commits in steady
        state, never a max(valid_from) scan over the (monotonically
        growing) dimension. Because no-op batches stamp too, a replayed
        no-change batch is skipped exactly, not merely harmlessly.
        Legacy fallback: tables whose commits predate the stamp fall
        back to max(valid_from)."""
        if not self.acid.exists():
            return -1
        for v in range(self.acid.latest_version(), 0, -1):
            commit = self.acid._read_commit(v)
            if self.acid._txn_state(commit) in ("pending", "aborted"):
                continue
            meta = commit.get("meta") or {}
            if "scd_batch_id" in meta:
                return int(meta["scd_batch_id"])
        last = self.acid.read().agg(F.max("valid_from")).collect()[0][0]
        return -1 if last is None else int(last)

    def apply(self, batch: DataFrame, batch_id: int) -> Dict[str, int]:
        """Apply one delta batch; returns counts of opened/closed rows."""
        batch = self._validate_batch(batch, batch_id)
        opened_meta = [
            F.lit(batch_id).cast("bigint").alias("valid_from"),
            F.lit(None).cast("bigint").alias("valid_to"),
            F.lit(True).alias("is_current"),
        ]
        if not self.acid.exists():
            first = batch.select(*self.keys, *self.tracked, *opened_meta)
            self.acid.write(first, stats_cols=self.keys,
                            extra_meta={"scd_batch_id": batch_id})
            return {"opened": first.count(), "closed": 0, "files_rewritten": 0}

        cur = self.acid.read().filter(F.col("is_current"))
        b = batch.alias("b")
        c = cur.alias("c")
        joined = b.join(c, self.keys, "left")
        # null-safe: a tracked col changing to/from NULL IS a change
        differs = F.lit(False)
        for t in self.tracked:
            differs = differs | ~F.col(f"b.{t}").eqNullSafe(F.col(f"c.{t}"))
        new_key = F.col("c.valid_from").isNull()
        from data_pipeline_platform_spark.utils.cache import tracked_persist

        # consumed three times (opened, closed, merge source) — persist at
        # its smallest point; batch-sized, not dim-sized
        opens = tracked_persist(joined.filter(new_key | differs))

        opened = opens.select(
            *[F.col(f"b.{k}") for k in self.keys],
            *[F.col(f"b.{t}") for t in self.tracked],
            *opened_meta,
        )
        closed = opens.filter(~new_key).select(
            *[F.col(f"b.{k}") for k in self.keys],
            *[F.col(f"c.{t}").alias(t) for t in self.tracked],
            F.col("c.valid_from").alias("valid_from"),
            F.lit(batch_id).cast("bigint").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        # materialize the counts BEFORE the merge commits: they read the
        # persisted `opens` frame, so a post-commit recount that would
        # race a concurrent vacuum (superseded files vanishing mid-read)
        # never happens. ONE agg job for both: opened = every opens row,
        # closed = the existing-key subset
        counts = opens.agg(
            F.count(F.lit(1)).alias("__o"),
            F.count(F.when(~new_key, True)).alias("__c"),
        ).collect()[0]
        n_opened, n_closed = counts["__o"], counts["__c"]
        source = closed.unionByName(opened)
        # ONE copy-on-write merge: (keys, valid_from) uniquely addresses a
        # version row — closed rows match and take the new valid_to /
        # is_current, opened rows miss and insert; footer stats prune
        # untouched files. assume_unique (r14): the batch is key-unique
        # (guard above) and each key contributes at most one closed row
        # (valid_from = old version) plus one opened row (valid_from =
        # batch_id, strictly newer than any prior batch), so source is
        # unique on (keys, valid_from) by construction — merge's
        # last-wins dedup would be an identity bought with an extra
        # shuffle + aggregate per apply.
        stats = self.acid.merge(source, keys=self.keys + ["valid_from"],
                                extra_meta={"scd_batch_id": batch_id},
                                assume_unique=True)
        return {
            "opened": n_opened,
            "closed": n_closed,
            "files_rewritten": stats["files_rewritten"],
        }

    # ------------------------------------------------------------------
    def read(self, version: int = None) -> DataFrame:
        return self.acid.read(version=version)

    def current(self) -> DataFrame:
        return self.read().filter(F.col("is_current")).drop("valid_to", "is_current")

    def as_of(self, batch_id: int) -> DataFrame:
        """Dimension state as of a batch id (inclusive): version rows
        whose validity interval covers it — reconstructs ANY past state
        from the final table, no log replay needed."""
        return self.read().filter(
            (F.col("valid_from") <= F.lit(batch_id))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(batch_id)))
        )

    def history(self) -> List[Dict]:
        return self.acid.history()
