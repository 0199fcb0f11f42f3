"""Cross-validation against independent implementations:
- our banded MinHash-LSH vs Spark ML's MinHashLSH (different hash
  families, same ground truth)
- structured logging contract (correlation ids reach the records)
"""

import json
import logging

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_custom_lsh_agrees_with_spark_ml(spark):
    """Both LSH families must recover the same >=0.8-Jaccard pairs (the
    ground truth is exact Jaccard; each index only generates candidates)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_minhash_lsh,
        with_shingles,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    ours = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_lsh(spark, SF).collect()
    }

    docs = load_table(spark, SF, "documents")
    sh = with_shingles(docs).select("doc_id", "shingles").filter(F.size("shingles") > 0)
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True).fit(sh)
    vecs = cv.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=16, seed=7).fit(vecs)
    # ML's join returns pairs under a Jaccard *distance* threshold
    ml_pairs_df = mh.approxSimilarityJoin(vecs, vecs, 0.2, distCol="jd")
    ml_pairs = {
        (min(a, b), max(a, b))
        for a, b in (
            (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
            for r in ml_pairs_df.filter("datasetA.doc_id < datasetB.doc_id").collect()
        )
    }
    assert ours == ml_pairs


def test_structured_logging_carries_context(spark, tmp_warehouse, caplog):
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter
    from data_pipeline_platform_spark.utils.logging import (
        JSONFormatter,
        pipeline_context,
        stage_context,
    )

    record_holder = []

    class Capture(logging.Handler):
        def emit(self, record):
            record_holder.append(JSONFormatter().format(record))

    logger = logging.getLogger("dpps.test")
    handler = Capture()
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    try:
        with pipeline_context("pipe-42") as pid:
            with stage_context("transformation"):
                logger.info("inside stage")
        payload = json.loads(record_holder[-1])
        assert payload["pipeline_id"] == "pipe-42"
        assert payload["stage"] == "transformation"
        assert payload["correlation_id"]
        assert payload["message"] == "inside stage"
    finally:
        logger.removeHandler(handler)

    # runner integrates the contexts: an error run still produces a
    # result dict (logging must never break the pipeline)
    runner = PipelineRunner(spark, writer=BatchWriter(spark, base_path=tmp_warehouse))
    result = runner.run({"ingestion": {"query": "SELECT * FROM missing"}}, pipeline_id="p-log")
    assert result["status"] == "error" and result["pipeline_id"] == "p-log"
