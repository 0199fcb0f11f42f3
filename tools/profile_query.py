#!/usr/bin/env python
"""Driver-side wall-time profile of one or more registry queries.

cProfile over fn(spark, sf_dir) + noop write. Because every Spark action
blocks the driver in a py4j socket read, driver cumtime per call site is
an accurate wall-clock attribution for the sequential fixture queries
(ingest loops, ACID commits) that dominate the bench: it answers "which
phase of this operator is the time going to" without the Spark UI.

Usage: python tools/profile_query.py [--sf DIR] [--top N] query [query ...]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=35)
    ap.add_argument("--callers", action="store_true",
                    help="also print callers of the top package functions")
    args = ap.parse_args()

    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.queries import all_queries
    from data_pipeline_platform_spark.utils.cache import release_tracked

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    spark.range(1).count()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").select("l_orderkey").limit(1).count()

    for name in args.queries:
        fn = registry[name]
        # warm-up (codegen, footer caches) so the profile is steady-state
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        release_tracked()
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        df = fn(spark, args.sf)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        pr.disable()
        t2 = time.time()
        release_tracked()
        print(f"\n=== {name}: total {t2-t0:.2f}s (build {t1-t0:.2f}s, read {t2-t1:.2f}s) ===")
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        st.print_stats(r"data_pipeline_platform_spark|py4j.*send_command|socket", args.top)
        out = buf.getvalue()
        # strip the pstats banner noise
        lines = [ln for ln in out.splitlines() if ln.strip()]
        for ln in lines:
            print(ln)
        if args.callers:
            buf2 = io.StringIO()
            st2 = pstats.Stats(pr, stream=buf2).sort_stats("cumulative")
            st2.print_callers(r"data_pipeline_platform_spark", 20)
            print(buf2.getvalue())


if __name__ == "__main__":
    main()
