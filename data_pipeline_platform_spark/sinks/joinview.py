"""Incrementally maintained JOIN views (delta-join maintenance) over
the ACID lake layer.

The commonest silver-layer shape is not an aggregate but an ENRICHMENT
JOIN — bronze facts ⋈ a dimension. ``MaterializedAgg`` maintains
groupBy views; this class maintains the join view: state is the joined
row set keyed by the bronze ROW key, and each change-feed batch costs

    |changed bronze rows| ⋈ dim  +  COW rewrite of touched state files

— never a re-join of history. Classic delta-join maintenance
(Δ(R ⋈ S) = ΔR ⋈ S when only R changes), the dimension broadcast.

Maintenance algebra per feed row:

- ``insert`` / ``update_postimage``: join the row against the dim and
  UPSERT the result under the bronze row key (an update's postimage
  simply replaces the old joined row — same key).
- ``delete``: remove the state row for that key.
- ``how='inner'`` only: a postimage whose new join key matches NO dim
  row must also REMOVE its old state row (the row left the view) —
  the anti-join of postimages vs dim feeds the delete set. With
  ``how='left'`` every bronze row keeps a state row (dim columns
  NULL), so only explicit deletes remove.

DIMENSION-side churn (``update_dim_changes``, ``how='left'`` only):
Δ(R ⋈ S) when S changes = R ⋈ ΔS — and because every state row
already carries its bronze join key, the delta applies FROM STATE
ALONE, no bronze re-scan ever: a dim insert/postimage rewrites the dim
columns of the state rows whose join key matches (including rows that
were NULL because the key was previously absent); a dim delete NULLs
them. Inner views are refused: they physically dropped the
non-matching bronze rows, so a later dim insert has nothing to revive
— use ``how='left'`` when the dimension churns.

Upserts and deletes publish in ONE atomic ACID commit
(``AcidTable.merge(delete_keys=...)``), carrying the change-feed
progress marker — the same exactly-once discipline as
``MaterializedAgg.update_changes``, so ``ChangeFeedConsumer`` drives
this class unchanged (duck-typed: ``.acid``, ``.update_changes``,
``.read``).

Scale shape: the delta is batch-sized and the dim broadcasts (an
enrichment dim is orders of magnitude smaller than the fact table; for
a fact-sized right side you'd shuffle-hash on the join key instead —
pass ``broadcast_dim=False``). The state merge prunes untouched files
by footer key stats, so a 100-row feed into a 100 TB view rewrites a
handful of files.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable


class MaterializedJoin:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        row_keys: Sequence[str],
        dim: DataFrame,
        on: Sequence[Sequence[str]],
        how: str = "inner",
        broadcast_dim: bool = True,
    ):
        """``row_keys``: the bronze row key (state is unique by it).
        ``on``: (bronze_col, dim_col) equi-join pairs. ``how``: inner
        or left. ``dim``: the dimension frame, or a CALLABLE returning
        it — pass ``lambda: dim_table.read()`` when the dimension
        itself churns, so bronze-side folds always join the current
        snapshot (dim-side folds never read it; see
        ``update_dim_changes``)."""
        if how not in ("inner", "left"):
            raise ValueError(f"how must be inner or left, got {how!r}")
        self.spark = spark
        self.row_keys = list(row_keys)
        self._dim = dim
        self.on = [tuple(p) for p in on]
        self.how = how
        self.broadcast_dim = broadcast_dim
        self.acid = AcidTable(spark, path)

    @property
    def dim(self) -> DataFrame:
        return self._dim() if callable(self._dim) else self._dim

    # ------------------------------------------------------------------
    def _join(self, delta: DataFrame) -> DataFrame:
        dim = F.broadcast(self.dim) if self.broadcast_dim else self.dim
        cond = F.lit(True)
        for bc, dc in self.on:
            # eqNullSafe is deliberately NOT used: SQL join semantics
            # (NULL keys never match), matching the one-shot oracle join
            cond = cond & (delta[bc] == dim[dc])
        return delta.join(dim, cond, self.how)

    def update(
        self,
        batch: DataFrame,
        commit_meta: Dict[str, object] = None,
        txn: Dict[str, str] = None,
        commit_guard=None,
    ) -> Dict[str, int]:
        """Append-only fold: join one micro-batch of NEW bronze rows
        against the dim and upsert under the row key. This is the
        streaming-enrichment entry — ``streaming.matview.fold_batch``
        / ``stream_materialize`` drive it unchanged (same duck type as
        ``MaterializedAgg.update``), marker inside the atomic commit;
        ``txn`` stages the fold under a multi-table transaction, so
        ``fold_batch_multi`` can fan one micro-batch out across agg AND
        join views atomically."""
        # batch-sized join result, consumed by the write/merge resolution
        # AND the bookkeeping count — persist so the batch-dim join runs
        # once per fold, not once per consumer
        upserts = self._join(batch).persist()
        try:
            if not self.acid.exists():
                version = self.acid.write(
                    upserts, stats_cols=self.row_keys, extra_meta=commit_meta,
                    txn=txn, commit_guard=commit_guard,
                )
                return {"rows_upserted": upserts.count(),
                        "files_rewritten": 0, "version": version}
            stats = self.acid.merge(
                upserts, keys=self.row_keys, extra_meta=commit_meta, txn=txn,
                commit_guard=commit_guard,
            )
            return {"rows_upserted": upserts.count(), **stats}
        finally:
            upserts.unpersist(blocking=False)

    def update_changes(
        self,
        feed: DataFrame,
        commit_meta: Dict[str, object] = None,
        snapshot: DataFrame = None,  # unused; ChangeFeedConsumer duck-type
    ) -> Dict[str, int]:
        """Fold one change-feed batch (``AcidTable.changes()`` shape)
        into the join view in one atomic commit."""
        post = feed.filter(
            F.col("change_type").isin("insert", "update_postimage")
        ).drop("change_type")
        # the change-feed diff behind `post` (touched-file scan + full-
        # outer join) would re-execute per consumer — persist the batch-
        # sized join result across the merge resolution + count
        upserts = self._join(post).persist()
        try:
            deletes = feed.filter(F.col("change_type") == "delete").select(
                *self.row_keys
            )
            if self.how == "inner":
                # postimages that no longer match any dim row LEAVE the view
                dim = F.broadcast(self.dim) if self.broadcast_dim else self.dim
                cond = F.lit(True)
                for bc, dc in self.on:
                    cond = cond & (post[bc] == dim[dc])
                deletes = deletes.unionByName(
                    post.join(dim, cond, "left_anti").select(*self.row_keys)
                )
            if not self.acid.exists():
                self.acid.write(
                    upserts, stats_cols=self.row_keys, extra_meta=commit_meta
                )
                return {"rows_upserted": upserts.count(),
                        "files_rewritten": 0}
            stats = self.acid.merge(
                upserts,
                keys=self.row_keys,
                delete_keys=deletes,
                extra_meta=commit_meta,
            )
            return {"rows_upserted": upserts.count(), **stats}
        finally:
            upserts.unpersist(blocking=False)

    def update_dim_changes(
        self,
        feed: DataFrame,
        commit_meta: Dict[str, object] = None,
        snapshot: DataFrame = None,  # unused; ChangeFeedConsumer duck-type
    ) -> Dict[str, int]:
        """Fold one DIMENSION change-feed batch (``AcidTable.changes()``
        keyed by the dim key) into the join view in one atomic commit —
        from state alone, the bronze table is never read:

        - insert / update_postimage dim rows REWRITE the dim columns of
          every state row whose join key matches (a key that was absent
          revives its NULL rows — this is why inner views are refused);
        - delete dim rows NULL the dim columns of matching state rows.

        Cost: state rows matching the churned keys (broadcast semi /
        equi joins against the dim-delta), COW rewrite of touched state
        files only."""
        if self.how != "left":
            raise ValueError(
                "dim-side maintenance needs how='left': an inner view "
                "physically dropped the non-matching bronze rows, so a "
                "dim insert has nothing to revive — re-derive the view "
                "or build it as a left join"
            )
        state = self.acid.read()
        dim_cols = list(self.dim.columns)
        bronze_cols = [c for c in state.columns if c not in dim_cols]
        dtypes = {f.name: f.dataType for f in state.schema.fields}
        post = feed.filter(
            F.col("change_type").isin("insert", "update_postimage")
        ).drop("change_type")
        dels = feed.filter(F.col("change_type") == "delete")
        cond = F.lit(True)
        for bc, dc in self.on:
            cond = cond & (F.col(f"s.{bc}") == F.col(f"p.{dc}"))
        matched = (
            state.alias("s")
            .join(F.broadcast(post).alias("p"), cond)
            .select(
                *[F.col(f"s.{c}").alias(c) for c in bronze_cols],
                *[F.col(f"p.{c}").alias(c) for c in dim_cols],
            )
        )
        dcond = F.lit(True)
        for bc, dc in self.on:
            dcond = dcond & (F.col(f"s.{bc}") == F.col(f"d.{dc}"))
        nulled = (
            state.alias("s")
            .join(
                F.broadcast(dels.select(*[dc for _, dc in self.on])).alias("d"),
                dcond,
                "left_semi",
            )
            .select(
                *bronze_cols,
                *[F.lit(None).cast(dtypes[c]).alias(c) for c in dim_cols],
            )
        )
        upserts = matched.unionByName(nulled).persist()
        try:
            stats = self.acid.merge(
                upserts, keys=self.row_keys, extra_meta=commit_meta
            )
            return {"rows_upserted": upserts.count(), **stats}
        finally:
            upserts.unpersist(blocking=False)

    # ------------------------------------------------------------------
    def read(self, drop_empty_on: str = None) -> DataFrame:
        """The joined state (``drop_empty_on`` accepted for consumer
        duck-typing; join rows are physically removed, so it is a
        no-op)."""
        return self.acid.read()

    def history(self) -> List[Dict]:
        return self.acid.history()
