"""Streaming corpus ingestion: the unbounded twin of the batch curation
flagship (`functions/text.py::q_curation_pipeline`) plus exact dedup
against the already-ingested table.

Two deliberate design choices for corpus-scale streams:

- **Quality scoring is stateless**, so the same pure-Column pipeline runs
  unchanged on a streaming frame (Spark's unified batch/stream API) — no
  watermark needed for the filter stage.
- **Dedup state lives in the lake table, not the stream.** Keeping every
  fingerprint ever seen in streaming state grows without bound (and
  `dropDuplicatesWithinWatermark` needs an event-time column documents
  do not have). Instead each micro-batch collapses its own duplicates
  (bounded by batch size) and anti-joins the target table's
  fingerprints inside ``foreachBatch`` — the table itself is the dedup
  state, which also makes ingestion idempotent under source replay:
  re-delivered documents anti-join away. At 100 TB the fingerprint
  column is a few bytes/row; reading it back is a single-column parquet
  scan, and a production deployment would maintain it as a compacted
  side table or bloom-filter index.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """File-source stream over a directory of documents parquet files
    (production: Kafka/queue of document batches; downstream operators
    are source-agnostic)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_curation(docs: DataFrame) -> DataFrame:
    """Quality filter + fingerprint, identical predicates to the batch
    `q_curation_pipeline` — works on batch AND streaming frames (pure
    Column expressions, no state)."""
    from data_pipeline_platform_spark.functions.text import with_text_stats

    kept = with_text_stats(docs).filter(
        (F.col("token_count") >= 20)
        & (F.col("type_token_ratio") >= 0.15)
        & (F.col("stopword_ratio") <= 0.5)
        & (F.col("char_count") >= 100)
    )
    return kept.select(
        "doc_id",
        "lang",
        "token_count",
        F.round("type_token_ratio", 6).alias("ttr"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    )


def curated_ingest(
    curated_stream: DataFrame,
    writer,
    table: str = "curated_docs",
    checkpoint: str = "/tmp/dpps-corpus-ckpt",
    trigger: Optional[Dict[str, Any]] = None,
):
    """Continuously merge a curated document stream into ``table`` with
    exact dedup: per micro-batch, keep the lowest doc_id per fingerprint
    (deterministic), drop fingerprints already in the table (left_anti),
    append the remainder. Returns the StreamingQuery.

    ``trigger`` is passed through to ``writeStream.trigger(**trigger)``
    — e.g. ``{"processingTime": "30 seconds"}`` for a continuous ingest,
    ``{"availableNow": True}`` (the default) to drain the backlog and
    stop, which is what the batch-equivalence tests use."""
    from data_pipeline_platform_spark.sinks.writers import WriteStrategy

    trigger = {"availableNow": True} if trigger is None else trigger

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if writer.table_exists(table):
            existing = writer.read_table(table).select("fingerprint")
            batch = batch.join(existing, "fingerprint", "left_anti")
        writer.write(batch, table, WriteStrategy.APPEND)

    return (
        curated_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
