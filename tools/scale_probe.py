#!/usr/bin/env python
"""Scale probe: inflate the sf0.1 tables Nx into /tmp (multi-file, so
scans parallelize), run the headline queries, and report per-query time
vs the sf0.1 baseline. If a query's time grows faster than data size,
its plan has a scaling bug the small-SF bench can't see.

Usage: python tools/scale_probe.py [factor] (default 20 -> ~12M lineitem)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BASE = "/root/testdata/sf0.1"
OUT = f"/tmp/dpps-scale-x{FACTOR}"

HEADLINE = [
    "pricing_summary",
    "revenue_by_segment_year",
    "multi_join_revenue",
    "filter_family",
    "window_rank",
    "extract_year",
    "upsert_merge",
    "left_join_nulls",
    "local_supplier_volume",
    "large_orders",
    "customer_order_distribution",
    "events_sessionize",
    "events_retention",
    # corpus ops (documents inflated with a replica prefix token; the
    # pairwise dedup ops are excluded — replicating a corpus makes every
    # replica a near-dup of its source, which measures the replication
    # artifact, not the operator)
    "curation_pipeline",
    "dedup_exact",
    "pack_sequences",
    "bigram_stats",
    "corpus_mixture",
    "repetition_stats",
    "winnow_fingerprints",
    "bpe_token_stats",
    # batch-6 TPC-H shapes
    "important_parts",
    "promo_part_suppliers",
    "waiting_suppliers",
    "idle_customers",
    # round-3 operators
    "events_multires_rollup",
    "data_quality_report",
    "salted_skew_join",
    "multimodal_byte_features",
    # round-5 operators (chunking/oov/novelty are per-doc or
    # bounded-vocab — replication must scale them linearly)
    "chunk_documents",
    "oov_rate",
    "ngram_novelty",
    "events_burst",
    # round-6 operators: quality gates / LM scoring / sketches scale
    # with the corpus; BOW dedup sees 20x distinct groups (replica
    # prefix token); anomaly/EWMA keep |users| fixed with 20x events.
    # pca/whiten excluded (embeddings are copied, not inflated);
    # keep_best/corpus pairwise ops excluded per the replication note.
    "gopher_quality_filter",
    "unigram_logprob",
    "bigram_logprob",
    "dedup_bow",
    "events_anomaly",
    "events_ewma",
    "hll_distinct_users",
    "bpe_train_merges",
    # round-6 late: sketch census / join pruning / DSIR scale with the
    # corpus. dup_span_fraction excluded per the replication note
    # (replicas make ~every gram corpus-duplicated — the probe would
    # measure the replication artifact, not the operator).
    "cms_heavy_hitters",
    "bloom_prune_join",
    "dsir_importance_weights",
]


def inflate(spark):
    """Replicate fact tables FACTOR x with shifted keys (keeps join
    selectivity and group cardinality realistic); dims stay as-is."""
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    fact_shift = {
        # table -> (key columns to shift so replicas don't collide)
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id"],
        "documents": ["doc_id"],
    }
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{BASE}/{t}.parquet", dst)
    for t, keys in fact_shift.items():
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        n = df.count()
        rep = df.withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(FACTOR)])))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__r").cast("long") * (n * 10))
        if t == "documents":
            # prefix a replica token so replicas are not byte-identical
            # (dedup_exact should see 20x distinct groups, not 20-copy ones)
            rep = rep.withColumn(
                "text", F.concat(F.lit("r"), F.col("__r").cast("string"), F.lit(" "), F.col("text"))
            )
        rep.drop("__r").repartition(32).write.mode("overwrite").parquet(dst)
        print(f"inflated {t}: {n} -> {n * FACTOR} rows", file=sys.stderr)


def main():
    from data_pipeline_platform_spark.queries import all_queries
    from data_pipeline_platform_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    inflate(spark)
    registry = all_queries()

    # warm
    spark.read.parquet(f"{OUT}/lineitem.parquet").select("l_orderkey").limit(1).count()

    results = {}
    for name in HEADLINE:
        fn = registry[name]
        # time at base and inflated scale
        t0 = time.time()
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        base_t = time.time() - t0
        t0 = time.time()
        fn(spark, OUT).write.format("noop").mode("overwrite").save()
        big_t = time.time() - t0
        ratio = big_t / base_t if base_t > 0 else float("inf")
        results[name] = {
            "sf0.1_sec": round(base_t, 2),
            f"x{FACTOR}_sec": round(big_t, 2),
            "time_ratio": round(ratio, 1),
        }
        flag = "OK " if ratio < FACTOR else "SLOW"
        print(
            f"{flag} {name}: {base_t:.2f}s -> {big_t:.2f}s "
            f"(x{ratio:.1f} time for x{FACTOR} data)"
        )
    print(json.dumps({"factor": FACTOR, "results": results}))


if __name__ == "__main__":
    main()
