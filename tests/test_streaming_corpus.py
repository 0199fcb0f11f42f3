"""Streaming corpus ingestion: quality filter + lake-table dedup must
equal the batch curation pipeline deduped by fingerprint, including
under source replay (every file delivered twice)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.sinks.writers import BatchWriter
from data_pipeline_platform_spark.sources.readers import load_table
from data_pipeline_platform_spark.streaming.corpus import (
    curated_ingest,
    read_documents_stream,
    stream_curation,
)

SF = "/root/testdata/sf0.001"


def _batch_expected(spark):
    """Batch twin: curation filter then min-doc_id-per-fingerprint."""
    from data_pipeline_platform_spark.functions.text import q_curation_pipeline

    curated = q_curation_pipeline(spark, SF)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        curated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def test_stream_curation_matches_batch_on_static_frame(spark):
    """The same function body runs on a batch frame — predicates and
    projection must match q_curation_pipeline exactly."""
    from data_pipeline_platform_spark.functions.text import q_curation_pipeline

    docs = load_table(spark, SF, "documents")
    a = stream_curation(docs).orderBy("doc_id").collect()
    b = q_curation_pipeline(spark, SF).orderBy("doc_id").collect()
    assert a == b


def test_streaming_ingest_dedups_under_replay(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    stream_dir = str(tmp_path / "docs_in")
    # simulated redelivery: every document arrives twice, across
    # different files/micro-batches
    docs.repartition(3).write.parquet(stream_dir)
    docs.repartition(2).write.mode("append").parquet(stream_dir)

    writer = BatchWriter(spark, base_path=str(tmp_path / "lake"))
    stream = read_documents_stream(spark, stream_dir, max_files_per_trigger=2)
    q = curated_ingest(
        stream_curation(stream),
        writer,
        table="curated_docs",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        r["fingerprint"]: (r["doc_id"], r["token_count"])
        for r in writer.read_table("curated_docs").collect()
    }
    expected = {
        r["fingerprint"]: (r["doc_id"], r["token_count"])
        for r in _batch_expected(spark).collect()
    }
    assert got == expected
    # idempotency: a second full replay adds nothing
    stream2 = read_documents_stream(spark, stream_dir, max_files_per_trigger=4)
    q2 = curated_ingest(
        stream_curation(stream2),
        writer,
        table="curated_docs",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert writer.read_table("curated_docs").count() == len(expected)
