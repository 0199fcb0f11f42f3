#!/usr/bin/env python
"""Training-data curation example: the corpus operator family composed
end-to-end over the `documents` table, plus the one-call flagship.

Run: python examples/corpus_curation_example.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.functions.corpus import (
    PACK_BUDGET,
    deterministic_sample,
    q_training_data_pipeline,
    scrub_patterns,
)
from data_pipeline_platform_spark.functions.dedup import _jaccard_pairs
from data_pipeline_platform_spark.functions.text import with_text_stats
from data_pipeline_platform_spark.sources.readers import load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality scoring — pure Column exprs, composes into the scan
    scored = with_text_stats(docs)
    print(
        "corpus:",
        docs.count(),
        "docs | median tokens:",
        scored.approxQuantile("token_count", [0.5], 0.01)[0],
    )

    # 2. deterministic held-out split (content-addressed, no RNG)
    held_out = deterministic_sample(docs)
    print("held-out split:", held_out.count(), "docs (md5-prefix 'a')")

    # 3. near-duplicate pairs at jaccard >= 0.8 (candidates -> verify)
    pairs = _jaccard_pairs(docs, threshold=0.8)
    print("near-dup pairs:", pairs.count())

    # 4. pattern scrubbing with audit counts
    scrubbed = scrub_patterns(docs)
    n_touched = scrubbed.filter(F.col("n_redactions") > 0).count()
    print("docs with redactions:", n_touched)

    # 5. the flagship: filter -> dedup -> decontaminate -> pack, one plan
    curated = q_training_data_pipeline(spark, sf_dir)
    bins = curated.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("bin_id").alias("bins"),
        F.sum("token_count").alias("tokens"),
    ).collect()[0]
    print(
        f"curated: {bins['docs']} docs -> {bins['bins']} bins "
        f"(budget {PACK_BUDGET} tokens, {bins['tokens']} total)"
    )


if __name__ == "__main__":
    main()
