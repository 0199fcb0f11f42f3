#!/usr/bin/env python
"""Corpus-health analytics example: the r6 observability family run as
one health report — which feeds mirror each other, whether new data
still adds vocabulary, which quality gates are load-bearing, how the
tokenizer taxes each language, and what the next training mixture
should be.

Run: python examples/corpus_analytics_example.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.functions.bpe import q_tokenizer_fertility
from data_pipeline_platform_spark.functions.mixture import q_doremi_mixture_step
from data_pipeline_platform_spark.functions.overlap import q_source_overlap
from data_pipeline_platform_spark.functions.repetition import (
    q_quality_ablation_report,
)
from data_pipeline_platform_spark.functions.text import q_char_entropy
from data_pipeline_platform_spark.functions.vocab import q_vocab_growth


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== Which sources mirror each other? (union-MinHash Jaccard) ==")
    (
        q_source_overlap(spark, sf_dir)
        .orderBy("jaccard_est", ascending=False)
        .show(5, truncate=False)
    )

    print("== Is new data still adding vocabulary? (Heaps curve tail) ==")
    (
        q_vocab_growth(spark, sf_dir)
        .orderBy("bucket", ascending=False)
        .show(5, truncate=False)
    )

    print("== Which Gopher gates are load-bearing? ==")
    q_quality_ablation_report(spark, sf_dir).orderBy(
        "n_unique_fail", ascending=False
    ).show(truncate=False)

    print("== Tokenizer tax by language ==")
    q_tokenizer_fertility(spark, sf_dir).orderBy("fertility", ascending=False).show(
        truncate=False
    )

    print("== Entropy outliers (possible gibberish / binary spill) ==")
    q_char_entropy(spark, sf_dir).orderBy("entropy_bits", ascending=False).show(
        5, truncate=False
    )

    print("== Next mixture (one DoReMi step) ==")
    q_doremi_mixture_step(spark, sf_dir).orderBy(
        "weight_new", ascending=False
    ).show(truncate=False)

    print("== Everything at once: the per-source health report ==")
    from data_pipeline_platform_spark.functions.mixture import (
        q_corpus_health_report,
    )

    q_corpus_health_report(spark, sf_dir).orderBy(
        "max_source_overlap", ascending=False
    ).show(truncate=False)


if __name__ == "__main__":
    main()
