"""Streaming materialized-view maintenance: fold a micro-batch stream
into a ``MaterializedAgg`` (sinks/matview.py) via ``foreachBatch``.

This is the streaming twin of the graded ``materialized_agg_orders``
fold — the same additive per-group algebra Structured Streaming uses
internally for stateful aggregation, but with the state DURABLE in an
ACID lake table (queryable mid-stream, time-travelable, survives the
driver) instead of in the state store.

Exactly-once: ``foreachBatch`` re-delivers a batch after a failure, and
an additive fold double-counts on replay — so each fold records
``{stream_id, batch_id}`` INSIDE the ACID commit it publishes (the
Delta ``txn``-action pattern: data and progress marker commit in one
atomic O_EXCL publish, so no crash window can separate them), and a
batch whose id is <= the last committed id FOR THAT STREAM is skipped.

Stream identity is the checkpoint location: Structured Streaming batch
ids are only meaningful within one checkpoint lineage.  Restarting with
the SAME checkpoint is exactly-once — replayed batches skip, new data
(higher batch ids) folds.  Pointing a FRESH checkpoint at a view that
already holds folds from another stream would re-deliver every source
batch from id 0 and double-count, so ``fold_batch`` detects that and
raises; pass ``allow_other_streams=True`` only for the legitimate
multiple-disjoint-sources-one-view topology.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.sinks.matview import MaterializedAgg


def last_folded_batch(view: MaterializedAgg, stream_id: str) -> int:
    """Highest batch_id committed for ``stream_id``, or -1.

    Reads the commit log newest-first and stops at the first commit
    carrying the stream's marker — batch ids within a stream are
    monotone, so the most recent marker IS the max (O(1) commits read
    in steady state, not O(versions)). Markers inside unresolved or
    aborted multi-table-txn commits do not count: the fold never (yet)
    happened."""
    acid = view.acid
    for v in range(acid.latest_version(), 0, -1):
        commit = acid._read_commit(v)
        if acid._txn_state(commit) in ("pending", "aborted"):
            continue
        meta = commit.get("meta") or {}
        if meta.get("stream_id") == stream_id:
            return int(meta["batch_id"])
    return -1


def _other_stream_has_folds(view: MaterializedAgg, stream_id: str) -> bool:
    acid = view.acid
    for v in range(acid.latest_version(), 0, -1):
        commit = acid._read_commit(v)
        if acid._txn_state(commit) in ("pending", "aborted"):
            continue
        meta = commit.get("meta") or {}
        sid = meta.get("stream_id")
        if sid is not None and sid != stream_id:
            return True
    return False


def fold_batch(
    view: MaterializedAgg,
    stream_id: str,
    batch_df: DataFrame,
    batch_id: int,
    allow_other_streams: bool = False,
) -> bool:
    """Fold one micro-batch idempotently; returns True if folded, False
    if skipped as a replay.  The {stream_id, batch_id} marker publishes
    inside the same atomic ACID commit as the fold itself."""
    if batch_id <= last_folded_batch(view, stream_id):
        return False  # replayed batch: already committed, skip
    if (
        batch_id == 0
        and not allow_other_streams
        and _other_stream_has_folds(view, stream_id)
    ):
        raise RuntimeError(
            f"stream {stream_id!r} starts at batch 0 but the view at "
            f"{view.acid.path} already holds folds from another stream. "
            "A fresh checkpoint re-delivers the whole source and would "
            "double-count; reuse the original checkpoint, start a fresh "
            "view, or pass allow_other_streams=True for genuinely "
            "disjoint sources."
        )
    if batch_df.isEmpty():
        return False  # nothing to fold; replaying an empty batch is a no-op
    from data_pipeline_platform_spark.sinks.acid import CommitGuardFailed

    # the pre-check above is advisory; the GUARD (re-checked inside the
    # OCC retry loop, after the base version read) is what makes the
    # fold exactly-once under CONCURRENT duplicate delivery — a
    # competing fold of the same batch surfaces as a commit conflict,
    # the retry re-checks the marker, and this delivery skips instead
    # of double-counting
    try:
        view.update(
            batch_df,
            commit_meta={"stream_id": stream_id, "batch_id": batch_id},
            commit_guard=lambda: last_folded_batch(view, stream_id) < batch_id,
        )
    except CommitGuardFailed:
        return False  # a concurrent delivery folded it first
    return True


def stream_materialize(
    stream_df: DataFrame,
    view: MaterializedAgg,
    checkpoint: str,
    trigger: Optional[Dict[str, Any]] = None,
    stream_id: Optional[str] = None,
    allow_other_streams: bool = False,
):
    """Start the fold; returns the StreamingQuery.  Default trigger is
    availableNow (drain the backlog and stop — the test-and-backfill
    mode); pass e.g. ``{"processingTime": "30 seconds"}`` to run
    continuously.  ``stream_id`` defaults to the (absolute) checkpoint
    path — the identity batch ids are scoped to."""
    trigger = {"availableNow": True} if trigger is None else trigger
    sid = stream_id if stream_id is not None else os.path.abspath(checkpoint)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(view, sid, batch_df, batch_id,
                   allow_other_streams=allow_other_streams)

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def fold_batch_multi(
    folds,
    stream_id: str,
    batch_id: int,
    coordinator_dir: str,
    allow_other_streams: bool = False,
) -> bool:
    """Fold ONE micro-batch into SEVERAL views ATOMICALLY: every view's
    fold commit is staged under one multi-table transaction
    (sinks/txn.py) carrying the {stream_id, batch_id} marker, and a
    single marker create publishes them all together — so a reader can
    never observe batch N applied to one view but not another (the
    fan-out consistency single-sink foreachBatch cannot give you).

    ``folds``: [(MaterializedAgg, batch_df), ...] — typically different
    projections/groupings of the same micro-batch.

    Crash discipline: a failure between staging and decide leaves
    pending commits that block the views; the NEXT delivery of any
    batch runs presumed-abort recovery first (markers inside aborted
    stages never count as folded — see last_folded_batch), then folds
    cleanly. Returns True if folded, False if skipped as a replay."""
    from data_pipeline_platform_spark.sinks.txn import MultiTableTxn

    views = [v for v, _ in folds]
    MultiTableTxn.recover(coordinator_dir, [v.acid for v in views])
    if batch_id <= max(last_folded_batch(v, stream_id) for v in views):
        return False  # atomicity keeps all views in lockstep; max = the truth
    if batch_id == 0 and not allow_other_streams:
        for v in views:
            if _other_stream_has_folds(v, stream_id):
                raise RuntimeError(
                    f"stream {stream_id!r} starts at batch 0 but the view "
                    f"at {v.acid.path} already holds folds from another "
                    "stream (see fold_batch)"
                )
    if all(df.isEmpty() for _, df in folds):
        return False
    from data_pipeline_platform_spark.sinks.acid import CommitGuardFailed

    txn = MultiTableTxn(coordinator_dir)
    marker = {"stream_id": stream_id, "batch_id": batch_id}

    def _not_folded() -> bool:
        # exactly-once under CONCURRENT duplicate delivery: re-checked
        # inside each stage's OCC loop (our own pending stages don't
        # count — last_folded_batch skips unresolved txn commits), so
        # two deliveries of the same batch serialize on the version
        # slot and the loser aborts instead of double-folding
        return batch_id > max(last_folded_batch(v, stream_id) for v in views)

    try:
        for v, df in folds:
            out = v.update(
                df, commit_meta=marker, txn=txn._ref(),
                commit_guard=_not_folded,
            )
            # record membership so the decide record carries the full
            # (table, version) set — consistent_cut()/read_consistent()
            # need it to keep this batch's fan-out untearable
            txn.record(v.acid.path, out.get("version"))
        txn.commit()
    except CommitGuardFailed:
        txn.abort()  # roll back any stages; the competing delivery won
        return False
    return True


def stream_materialize_multi(
    stream_df: DataFrame,
    targets,
    checkpoint: str,
    coordinator_dir: str,
    trigger: Optional[Dict[str, Any]] = None,
    stream_id: Optional[str] = None,
):
    """Streaming twin of fold_batch_multi: ``targets`` is
    [(MaterializedAgg, row-local projection fn), ...]; each micro-batch
    is projected per target and all folds publish atomically."""
    trigger = {"availableNow": True} if trigger is None else trigger
    sid = stream_id if stream_id is not None else os.path.abspath(checkpoint)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # one materialization, N folds
        fold_batch_multi(
            [(view, proj(batch_df)) for view, proj in targets],
            sid,
            batch_id,
            coordinator_dir,
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
