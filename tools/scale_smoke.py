"""sf1 scaling smoke (r7 verdict item #7): time the heaviest graded
queries at 10x bench scale (a /tmp replica built by make_scaled_dir.py)
vs sf0.1, and report wall-time ratios. A ratio well above ~10 flags a
super-linear plan. Timing convention mirrors bench.py (noop sink,
tracked caches released between queries).

Usage:
  python tools/make_scaled_dir.py /root/testdata/sf0.1 /tmp/sf1 10
  python tools/scale_smoke.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "dedup_clusters",
    "training_data_pipeline",
    "scd2_customer_dim",
    "pca_top_component",
    "retrieval_eval",
    "fuzzy_contamination",
    "dedup_minhash_lsh",
    "materialized_agg_orders",
    "pagerank",
    "kcenter_coreset",
    # judge-named super-linear candidates beyond the bench top-10
    "dedup_levenshtein",
    "dedup_simhash",
    "scd2_asof_enrichment",
    # r8 additions (r8 verdict item #8): the iterative graph loops and
    # the two whole-schema audits
    "hits_authority",
    "k_core",
    "nation_shortest_path",
    "table_fingerprint",
    "fk_orphan_profile",
    # r9 additions: the sketch builds, the salted shuffle join, and the
    # incremental indexes (expect copy-inflation super-linearity on the
    # replica — see SCALE.md's 586x-output control evidence)
    "hll_distinct_sources",
    "hll_distinct_sources_sharded",
    "salted_skew_join_events",
    "dedup_incremental_lsh",
]


def main() -> None:
    names = sys.argv[1:] or HEAVY
    from data_pipeline_platform_spark.queries import all_queries
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.utils.cache import release_tracked

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    spark.range(1).count()  # JVM warm-up

    results = {}
    for sf_dir, tag in [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")]:
        for name in names:
            fn = registry[name]
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                dt = f"ERROR: {type(exc).__name__}: {str(exc)[:120]}"
            finally:
                release_tracked()
            results.setdefault(name, {})[tag] = dt
            print(f"{tag:6s} {name}: {dt}", flush=True)

    print("\n| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        a, b = results[name].get("sf0.1"), results[name].get("sf1")
        ratio = (
            round(b / a, 1)
            if isinstance(a, float) and isinstance(b, float) and a > 0
            else "-"
        )
        print(f"| {name} | {a} | {b} | {ratio} |")
    with open("/tmp/scale_smoke.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
