#!/usr/bin/env python
"""Skew-machinery stress run (r10 verdict #7): on a zipf-skewed events
table (tools/make_skewed_events.py), time the UNSALTED shuffle join+agg
against the SALTED two-phase shape `q_salted_skew_join_events` uses,
with AQE's skew-join splitting DISABLED (a single hot KEY defeats it
anyway — one key hashes to one partition regardless of how AQE splits
skewed files) and broadcast off (at 100 TB neither side broadcasts —
the only regime where salting matters).

Besides wall time it reports reducer balance as rows-per-shuffle-
partition of the join output (the direct proxy for task load):
max/median for both plans. Results go into SCALE.md.

Usage: python tools/skew_stress.py SKEWED_DIR [N_SALT]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def partition_balance(df) -> tuple[int, float]:
    # rdd.mapPartitions, NOT a spark_partition_id() projection: Catalyst
    # can collapse the projection below the join's exchange and report
    # the upstream layout instead of the join output's (this silently
    # hid a 20x skew in the r13 census measurements —
    # tools/census_skew_stress.py)
    counts = sorted(
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    return counts[-1], float(statistics.median(counts))


def main(sf_dir: str, n_salt: int = 16) -> None:
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.sources.readers import load_table

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # coalescing folds the (small-at-test-scale) shuffle output into a
    # few partitions, which would hide the reducer-load picture the
    # balance numbers exist to show
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("val_c"),
        "event_id",
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    ev.count()  # warm the parquet footer/OS page caches
    dim.count()

    def unsalted():
        j = ev.join(dim.hint("merge"), "user_id")
        return j, (
            j.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum("val_c") / 100.0).alias("total_value"),
            )
        )

    def salted():
        e = ev.withColumn("salt", F.expr(f"pmod(event_id, {n_salt})"))
        d = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        ).withColumn("salt", F.col("salt").cast("bigint"))
        j = e.join(d.hint("merge"), ["user_id", "salt"])
        partial = j.groupBy("c_mktsegment", "salt").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val_c").alias("s")
        )
        return j, (
            partial.groupBy("c_mktsegment").agg(
                F.sum("n").cast("bigint").alias("n_events"),
                (F.sum("s") / 100.0).alias("total_value"),
            )
        )

    results = {}
    for name, build in (("unsalted", unsalted), ("salted", salted)):
        join_df, agg_df = build()
        t0 = time.time()
        rows = {r["c_mktsegment"]: (r["n_events"], r["total_value"])
                for r in agg_df.collect()}
        wall = time.time() - t0
        mx, med = partition_balance(join_df)
        results[name] = dict(wall=round(wall, 2), rows=rows,
                             max_part=mx, med_part=med,
                             ratio=round(mx / max(med, 1.0), 1))
        print(f"{name}: wall={wall:.2f}s  max/median partition rows = "
              f"{mx}/{med:.0f} ({mx / max(med, 1.0):.1f}x)")
    assert results["unsalted"]["rows"] == results["salted"]["rows"], (
        "salted result diverged from unsalted")
    speedup = results["unsalted"]["wall"] / max(results["salted"]["wall"], 1e-9)
    print(f"speedup: {speedup:.2f}x  (salted balance "
          f"{results['salted']['ratio']}x vs unsalted "
          f"{results['unsalted']['ratio']}x)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: skew_stress.py SKEWED_DIR [N_SALT]")
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 16)
