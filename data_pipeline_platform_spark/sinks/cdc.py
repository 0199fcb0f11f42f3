"""CDC APPLY CHANGES: fold an out-of-order change-event stream into an
AcidTable keyed on a sequence column (the Delta Live Tables
APPLY CHANGES INTO contract; the reference's UPSERT —
src/pipeline/persistence/batch_writer.py:230-276 — is the degenerate
case where arrival order IS event order).

The problem this solves: CDC feeds (Debezium, binlog tailers, queue
replays) deliver events out of order and redeliver them. Last-WRITE-
wins corrupts the table the moment a stale event arrives late; the
correct fold is last-EVENT-wins, decided by a monotone per-key
sequence (binlog offset, LSN, event timestamp). Every apply step is
one ``AcidTable.merge_conditional`` — file-pruned, OCC-retried, ONE
atomic commit per batch — whose clauses compare the incoming sequence
against the sequence STORED in the target row:

- within a batch, the highest-sequence event per key wins (ties:
  delete beats upsert, so a same-sequence insert+delete pair nets to
  absent — deterministic); conflicting same-(key, sequence, op)
  events with different payloads are refused loudly (``strict``);
- a matched row updates only when the incoming sequence is >= the
  stored one — a stale late update is a no-op, not a corruption;
- deletes come in two shapes (``tombstones``):

  * ``False`` (physical): a qualifying delete removes the row. Caveat,
    same as any physical CDC apply: once the row is gone its sequence
    is gone, so a LATER batch delivering an EARLIER event re-inserts
    (use tombstones when the feed can straddle a delete across
    batches);
  * ``True`` (logical, the Kafka-compaction shape): the delete UPSERTS
    a tombstone row carrying its sequence; stale events arriving after
    it in ANY later batch lose the sequence comparison against the
    tombstone. The current state is ``read_current`` (tombstones
    filtered); with tombstones retained, the final state is
    independent of how the event stream was batched — pure per-key
    argmax by sequence.

SCALE: each batch costs one batch-sized window (partitioned by key —
never a global sort), one batch-sized ambiguity probe, and one
merge_conditional whose candidate resolution is a broadcast semi-join
of the batch's keys against the snapshot — a 1000-row CDC batch into a
100 TB table touches only the files holding those 1000 keys.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable


def _collapse_batch(
    source: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    op_col: str,
    delete_op: str,
    strict: bool,
) -> DataFrame:
    """One winner per key: highest sequence, delete beating upsert on a
    sequence tie. Exact duplicate events collapse silently; same
    (key, sequence, op) with DIFFERENT payloads is ambiguous (no
    deterministic winner exists) and refused under ``strict``."""
    src = source.dropDuplicates()
    if strict:
        ambiguous = (
            src.groupBy(*keys, sequence_by, op_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .count()
        )
        if ambiguous:
            raise ValueError(
                f"apply_changes: conflicting events share "
                f"({list(keys)}, {sequence_by}, {op_col}) with different "
                "payloads — no deterministic winner; fix the feed or pass "
                "strict=False to keep an arbitrary one"
            )
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_by).desc(),
        F.when(F.col(op_col) == delete_op, 1).otherwise(0).desc(),
    )
    return (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    table: AcidTable,
    source: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    op_col: str = "op",
    delete_op: str = "D",
    tombstones: bool = False,
    strict: bool = True,
    extra_meta: Optional[Dict[str, Any]] = None,
    txn: Optional[Dict[str, str]] = None,
    commit_guard=None,
) -> Dict[str, int]:
    """Fold one CDC batch into ``table``. The target table stores the
    event columns verbatim (including ``op_col`` and ``sequence_by`` —
    the stored sequence IS the stale-event guard). Returns the merge
    stats dict; the first batch creates the table."""
    key_list = list(keys)
    winners = _collapse_batch(
        source, key_list, sequence_by, op_col, delete_op, strict
    )
    is_del = F.col(op_col) == F.lit(delete_op)
    if not table.exists():
        first = winners if tombstones else winners.filter(~is_del)
        v = table.write(
            first.repartition(4, *key_list),
            stats_cols=key_list,
            extra_meta=extra_meta,
            txn=txn,
            commit_guard=commit_guard,
        )
        return {"version": v, "files_rewritten": 0, "created": 1}
    seq_newer = f"s.{sequence_by} >= t.{sequence_by}"
    if tombstones:
        # logical deletes: the tombstone row upserts like any event and
        # keeps suppressing stale arrivals forever (delete_when=FALSE —
        # nothing is physically removed until a compaction policy does).
        # The cross-batch tie rule must equal the in-batch one (delete
        # beats upsert at the same sequence), otherwise a same-sequence
        # upsert delivered in a LATER batch would overwrite a stored
        # tombstone and resurrect the key — breaking the docstring's
        # batching-independence guarantee.
        tombstone_update_when = (
            f"s.{sequence_by} > t.{sequence_by} OR "
            f"(s.{sequence_by} = t.{sequence_by} AND NOT "
            f"(t.{op_col} = '{delete_op}' AND s.{op_col} <> '{delete_op}'))"
        )
        return table.merge_conditional(
            winners,
            keys=key_list,
            update_when=tombstone_update_when,
            delete_when="FALSE",
            insert_when=None,
            extra_meta=dict(extra_meta or {}) | {"cdc": "tombstones"},
            txn=txn,
            commit_guard=commit_guard,
        )
    return table.merge_conditional(
        winners,
        keys=key_list,
        update_when=f"{seq_newer} AND s.{op_col} <> '{delete_op}'",
        delete_when=f"{seq_newer} AND s.{op_col} = '{delete_op}'",
        insert_when=f"s.{op_col} <> '{delete_op}'",
        extra_meta=dict(extra_meta or {}) | {"cdc": "physical"},
        txn=txn,
        commit_guard=commit_guard,
    )


def read_current(
    table: AcidTable,
    op_col: str = "op",
    delete_op: str = "D",
    version: Optional[int] = None,
) -> DataFrame:
    """The current state of a tombstone-mode CDC table: everything but
    the tombstone rows."""
    return table.read(version=version).filter(
        F.col(op_col) != F.lit(delete_op)
    )
