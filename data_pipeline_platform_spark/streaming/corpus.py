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


# ---------------------------------------------------------------------------
# Incremental C4 line-level cleaning (r13, r12 verdict #6)
# ---------------------------------------------------------------------------

_C4_STREAM = "c4-lines"


class IncrementalLineCleaner:
    """foreachBatch-incremental variant of
    ``functions/corpus.py::clean_lines_c4``: the global duplicate-line
    census — the one shuffle of the one-shot pass — is maintained
    INCREMENTALLY as a MaterializedAgg (sinks/matview.py's additive IVM
    fold), so each micro-batch folds only its own per-line counts and
    history is never re-censused.

    Per batch: (1) judge the batch's lines with the shared row-local
    rule Column and append them to an ACID lines store, marker-guarded;
    (2) fold the batch's per-line DISTINCT-doc counts into the census
    view via ``fold_batch`` (marker inside the same atomic commit as
    the fold). Each side skips replayed batch ids independently, so a
    crash between the two commits heals on redelivery and a duplicate
    delivery is a no-op — the crash-schedule contract of the
    exactly-once family.

    Additivity contract: every document rides in EXACTLY ONE batch
    (the standard stream partitioning — a doc is one source record),
    so corpus-wide COUNT(DISTINCT doc) per line equals the sum over
    batches of per-batch distinct-doc counts.

    ``summaries()`` joins the stored judged lines with the CURRENT
    census — a line that crossed the duplicate threshold in batch N
    retroactively drops from batch-1 documents, exactly as the
    one-shot census would — and reuses ``summarize_judged_lines`` so
    the output is byte-identical to ``clean_lines_c4`` over the same
    corpus."""

    def __init__(self, spark: SparkSession, lines_path: str,
                 census_path: str):
        from data_pipeline_platform_spark.sinks.acid import AcidTable
        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

        self.spark = spark
        self.lines = AcidTable(spark, lines_path)
        self.census = MaterializedAgg(
            spark, census_path, keys=["line"], aggs=[("nd", "sum", "d1")]
        )

    def _last_lines_batch(self) -> int:
        for v in range(self.lines.latest_version(), 0, -1):
            meta = self.lines._read_commit(v).get("meta") or {}
            if meta.get("stream_id") == _C4_STREAM:
                return int(meta["batch_id"])
        return -1

    def process_batch(self, batch_lines: DataFrame,
                      batch_id: int) -> Dict[str, Any]:
        """Ingest one (doc_id, line_no, line) micro-batch idempotently."""
        from data_pipeline_platform_spark.functions.corpus import c4_rule_ok
        from data_pipeline_platform_spark.streaming.matview import fold_batch

        marker = {"stream_id": _C4_STREAM, "batch_id": batch_id}
        appended = False
        if batch_id > self._last_lines_batch():
            judged = batch_lines.select("doc_id", "line_no", "line").withColumn(
                "rule_ok", c4_rule_ok()
            )
            self.lines.write(judged, mode="append", extra_meta=marker)
            appended = True
        # distinct (line, doc) within the batch -> additive d1 counts;
        # fold_batch's in-commit marker makes the fold exactly-once
        per_line = (
            batch_lines.select("line", "doc_id").distinct()
            .select("line", F.lit(1).cast("bigint").alias("d1"))
        )
        folded = fold_batch(self.census, _C4_STREAM, per_line, batch_id)
        return {"batch_id": batch_id, "appended": appended, "folded": folded}

    def summaries(self, salt_buckets: Optional[int] = None) -> DataFrame:
        """Per-document cleaning summary against the CURRENT census —
        byte-identical to clean_lines_c4 over the ingested corpus.
        ``salt_buckets`` salts the census join-back exactly like
        ``clean_lines_c4(salt_buckets=)`` (same hot-boilerplate
        exposure; SCALE.md r13 balance numbers)."""
        from data_pipeline_platform_spark.functions.corpus import (
            C4_DUP_DOCS,
            summarize_judged_lines,
        )
        from data_pipeline_platform_spark.functions.scale import salted_join

        dup = (
            self.census.read()
            .filter(F.col("nd") >= C4_DUP_DOCS)
            .select("line", F.lit(True).alias("is_dup"))
        )
        stored = self.lines.read()
        if salt_buckets and salt_buckets > 1:
            joined = salted_join(stored, dup, "line", how="left",
                                 salt_buckets=salt_buckets)
        else:
            joined = stored.join(dup, "line", "left")
        judged = joined.withColumn(
            "kept", F.col("rule_ok") & F.col("is_dup").isNull()
        )
        return summarize_judged_lines(judged)


def stream_clean_lines(
    lines_stream: DataFrame,
    cleaner: IncrementalLineCleaner,
    checkpoint: str,
    trigger: Optional[Dict[str, Any]] = None,
):
    """Wire the cleaner under a real Structured Streaming query
    (foreachBatch); availableNow by default — drain and stop."""
    trigger = {"availableNow": True} if trigger is None else trigger

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cleaner.process_batch(batch_df, batch_id)

    return (
        lines_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


# ---------------------------------------------------------------------------
# Incremental URL/host curation (r13) — the host census as an IVM fold
# ---------------------------------------------------------------------------

_URL_STREAM = "url-hosts"


class IncrementalUrlFilter:
    """foreachBatch-incremental twin of
    ``functions/corpus.py::filter_by_url``: per batch, parse hosts
    row-locally, append the parsed docs to an ACID store
    (marker-guarded) and fold the batch's per-host doc counts into a
    MaterializedAgg census — plain COUNT is additive, so the fold needs
    no distinct bookkeeping at all. ``verdicts()`` joins the stored
    docs against the CURRENT census and applies the shared verdict
    expressions, so a host that crosses the over-representation cap in
    a later batch retroactively flips keep=false on earlier documents —
    byte-identical to the one-shot pass over the same corpus.

    Exactly-once: same two-marker shape as IncrementalLineCleaner —
    each side skips replayed batch ids independently; a crash between
    the two commits heals on redelivery."""

    def __init__(self, spark: SparkSession, docs_path: str,
                 census_path: str):
        from data_pipeline_platform_spark.sinks.acid import AcidTable
        from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

        self.spark = spark
        self.docs = AcidTable(spark, docs_path)
        self.census = MaterializedAgg(
            spark, census_path, keys=["host"],
            aggs=[("n_docs_host", "count", "")],
        )

    def _last_docs_batch(self) -> int:
        for v in range(self.docs.latest_version(), 0, -1):
            meta = self.docs._read_commit(v).get("meta") or {}
            if meta.get("stream_id") == _URL_STREAM:
                return int(meta["batch_id"])
        return -1

    def process_batch(self, batch_docs: DataFrame,
                      batch_id: int) -> Dict[str, Any]:
        """Ingest one (doc_id, url, ...) micro-batch idempotently."""
        from data_pipeline_platform_spark.functions.corpus import (
            parse_url_host,
        )
        from data_pipeline_platform_spark.streaming.matview import fold_batch

        parsed = parse_url_host(batch_docs)
        marker = {"stream_id": _URL_STREAM, "batch_id": batch_id}
        appended = False
        if batch_id > self._last_docs_batch():
            self.docs.write(parsed, mode="append", extra_meta=marker)
            appended = True
        folded = fold_batch(
            self.census, _URL_STREAM, parsed.select("host"), batch_id
        )
        return {"batch_id": batch_id, "appended": appended, "folded": folded}

    def verdicts(self, salt_buckets: Optional[int] = None) -> DataFrame:
        """Per-doc URL verdicts against the CURRENT host census —
        byte-identical to filter_by_url over the ingested corpus.
        ``salt_buckets`` salts the census join-back (dominant-host
        exposure; SCALE.md r13)."""
        from data_pipeline_platform_spark.functions.corpus import url_verdicts
        from data_pipeline_platform_spark.functions.scale import salted_join

        census = self.census.read().select("host", "n_docs_host")
        stored = self.docs.read()
        if salt_buckets and salt_buckets > 1:
            joined = salted_join(stored, census, "host", how="inner",
                                 salt_buckets=salt_buckets)
        else:
            joined = stored.join(census, "host")
        return url_verdicts(joined)


def stream_filter_urls(
    docs_stream: DataFrame,
    flt: IncrementalUrlFilter,
    checkpoint: str,
    trigger: Optional[Dict[str, Any]] = None,
):
    """Wire the URL filter under a real Structured Streaming query
    (foreachBatch); availableNow by default."""
    trigger = {"availableNow": True} if trigger is None else trigger

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        flt.process_batch(batch_df, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
