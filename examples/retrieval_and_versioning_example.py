#!/usr/bin/env python
"""Retrieval + reproducibility example: quantize an embedding corpus,
search it with the int8 probe, semantic-dedup it, and pin each curation
step as an immutable snapshot with time-travel reads.

Run: python examples/retrieval_and_versioning_example.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.functions.similarity import (
    q_cosine_topk,
    q_cosine_topk_int8,
    q_quantize_embeddings,
    q_semantic_dedup,
)
from data_pipeline_platform_spark.sinks.versioned import VersionedWriter
from data_pipeline_platform_spark.sources.readers import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. codec quality: int8 quantization with its own audit columns
    audit = q_quantize_embeddings(spark, sf_dir)
    worst = audit.orderBy("cos_recon").limit(3).collect()
    print("worst reconstruction cosines:", [r["cos_recon"] for r in worst])

    # 2. search: exact baseline vs int8 probe (same top-k contract)
    exact = {r["vec_id"] for r in q_cosine_topk(spark, sf_dir).collect()}
    probed = {r["vec_id"] for r in q_cosine_topk_int8(spark, sf_dir).collect()}
    print(f"int8 probe recall@10: {len(exact & probed)}/10")

    # 3. curation with pinned snapshots: every step is reproducible
    with tempfile.TemporaryDirectory() as lake:
        vw = VersionedWriter(spark, lake)
        emb = load_table(spark, sf_dir, "embeddings")
        v1 = vw.write_snapshot(emb, "corpus_emb", "raw ingest")
        dropped = q_semantic_dedup(spark, sf_dir).select("dropped_vec_id")
        curated = emb.join(
            dropped, emb.vec_id == dropped.dropped_vec_id, "left_anti"
        )
        v2 = vw.write_snapshot(curated, "corpus_emb", "semantic dedup", parent=1)
        print("snapshots:", [(e["version"], e["rows"], e["message"]) for e in vw.history("corpus_emb")])
        d = vw.diff_counts("corpus_emb", v1["version"], v2["version"], key="vec_id")
        print("dedup removed:", d["removed"], "vectors")
        # a model trained on v1 stays reproducible after the dedup:
        print("time travel v1 rows:", vw.read("corpus_emb", 1).count())

    spark.stop()


if __name__ == "__main__":
    main()
