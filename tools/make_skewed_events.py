#!/usr/bin/env python
"""Synthesize a ZIPF-SKEWED events table for skew-machinery stress runs
(SCALE.md; never correctness — the graded data distribution is the
driver's). The user_id marginal is deliberately pathological:

    ~30% of rows -> hot user 1, ~10% -> user 2, ~5% -> user 3,
    remainder uniform over the customer key domain.

That is the single-hot-key regime AQE's skew splitting cannot fix (one
KEY = one partition no matter how AQE splits files), i.e. exactly what
`salted_join` / `q_salted_skew_join_events` exist for. Row volume is
events x FACTOR (value columns re-used round-robin), assignment is
seeded rand — deterministic across runs.

Usage: python tools/make_skewed_events.py SRC_SF_DIR DST_DIR [FACTOR]
Writes DST_DIR/events.parquet and copies customer.parquet unchanged.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(src: str, dst: str, factor: int = 1) -> None:
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.sources.readers import load_table

    spark = get_spark("make-skewed-events")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    ev = load_table(spark, src, "events")
    cust = load_table(spark, src, "customer")
    max_cust = cust.agg(F.max("c_custkey")).collect()[0][0]

    base = ev
    for i in range(1, factor):
        base = base.unionByName(
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            )
        )
    hot = float(os.environ.get("SKEW_HOT_SHARE", "0.30"))
    u = F.rand(seed=7)
    skewed = base.withColumn(
        "user_id",
        F.when(u < hot, F.lit(1))
        .when(u < hot + 0.10, F.lit(2))
        .when(u < hot + 0.15, F.lit(3))
        .otherwise((F.rand(seed=11) * max_cust).cast("bigint") + 1),
    )
    skewed.write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))
    src_cust = os.path.join(src, "customer.parquet")
    dst_cust = os.path.join(dst, "customer.parquet")
    if os.path.isdir(src_cust):
        shutil.copytree(src_cust, dst_cust, dirs_exist_ok=True)
    else:
        shutil.copy(src_cust, dst_cust)
    n = skewed.count()
    n_hot = skewed.filter(F.col("user_id") == 1).count()
    print(f"wrote {n} rows, hot-key share {n_hot / n:.3f} -> {dst}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: make_skewed_events.py SRC_SF_DIR DST_DIR [FACTOR]")
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 1)
