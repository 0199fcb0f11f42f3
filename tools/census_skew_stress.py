#!/usr/bin/env python
"""Corpus-census skew stress (r12 verdict #5): the C4 line census and
the URL host census both hash-partition on CONTENT keys with realistic
heavy hitters (a boilerplate line in most documents; one host
dominating a crawl). This driver builds a 60%-hot-key corpus and
measures, with broadcast DISABLED (the 100 TB regime — a corpus-wide
census does not broadcast):

1. the census aggregation itself — structurally skew-safe:
   count_distinct first shuffles on (line, doc_id) so the hot line
   spreads across docs, and the final per-line exchange carries ONE
   partial row per (key, mapper), never raw rows. Verified by
   measuring the aggregation output's per-partition row counts.
2. the join-back of the census onto the rows — the actually vulnerable
   shuffle (sort-merge join keyed on the hot content key): per-reducer
   row balance with AQE skew-join OFF, then end-to-end wall with the
   split OFF vs ON.

Measurement note: per-partition rows are counted via
``df.rdd.mapPartitions`` — a ``spark_partition_id()`` projection gets
collapsed BELOW the join's exchange by Catalyst and reports the
upstream (cached round-robin) layout, hiding the skew entirely. The
wall-time A/B keeps AQE active end-to-end (the .rdd path bypasses the
adaptive re-plan, so it is only used for the OFF-side balance
snapshot).

Results land in SCALE.md. Decision recorded there: AQE's skew-join
split (ON in the session defaults, settings.py) holds the join-back —
salting is not wired into the census path.

Usage: python tools/census_skew_stress.py [n_docs] [hot_share]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

HOT_LINE = "subscribe to our newsletter for daily updates today."
PAD = (" with several words in it and then some more padding words "
       "here to make it realistic length.")


def rdd_balance(df):
    sizes = sorted(
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    return sizes[-1], float(statistics.median(sizes)), len(sizes)


def main(n_docs: int = 8_000_000, hot_share: float = 0.6) -> None:
    from data_pipeline_platform_spark.functions.corpus import (
        C4_DUP_DOCS,
        c4_rule_ok,
    )
    from data_pipeline_platform_spark.session import get_spark

    spark = get_spark("census-skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # keep the reducer-load picture visible at test scale
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    n_hot = int(n_docs * hot_share)
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniq = docs.select(
        "doc_id", F.lit(1).alias("line_no"),
        F.concat(F.lit("unique content line number "), F.col("doc_id"),
                 F.lit(PAD)).alias("line"),
    )
    hot = docs.filter(F.col("doc_id") < n_hot).select(
        "doc_id", F.lit(0).alias("line_no"), F.lit(HOT_LINE).alias("line"),
    )
    lines = uniq.unionByName(hot).repartition(32).persist()
    n_rows = lines.count()
    print(f"\ncorpus: {n_docs} docs, {n_rows} line rows, "
          f"hot line in {n_hot} docs")

    census = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= C4_DUP_DOCS)
        .select("line", F.lit(True).alias("is_dup"))
    )
    mx, med, nparts = rdd_balance(census)
    print(f"\ncensus agg output balance: max={mx} median={med} "
          f"parts={nparts} (skew-safe by construction)")

    flagged = lines.withColumn("rule_ok", c4_rule_ok())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    judged = flagged.join(census, "line", "left")
    mx, med, nparts = rdd_balance(judged)
    print(f"\njoin-back reducer balance, skew split OFF: max={mx} "
          f"median={med} parts={nparts}")

    # the library's salted path (clean_lines_c4(salt_buckets=N))
    from data_pipeline_platform_spark.functions.scale import salted_join

    salted = salted_join(flagged, census, "line", how="left",
                         salt_buckets=16)
    mx, med, nparts = rdd_balance(salted)
    print(f"\njoin-back reducer balance, salted x16: max={mx} "
          f"median={med} parts={nparts}")
    t0 = time.time()
    salted.withColumn(
        "kept", F.col("rule_ok") & F.col("is_dup").isNull()
    ).write.format("noop").mode("overwrite").save()
    print(f"\njoin-back end-to-end wall, salted x16: "
          f"{time.time()-t0:.2f}s")

    for skew in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        # the split only fires above these thresholds; lower them so
        # the test-scale hot partition is seen the way a 100 TB run's
        # multi-GB partition would be (defaults: 256MB / factor 5)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16MB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
        j = flagged.join(census, "line", "left").withColumn(
            "kept", F.col("rule_ok") & F.col("is_dup").isNull()
        )
        best = None
        for _ in range(2):
            t0 = time.time()
            j.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"\njoin-back end-to-end wall, skewJoin={skew}: "
              f"{best:.2f}s (best of 2)")
    lines.unpersist()
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    main(n, share)
