#!/usr/bin/env python
"""Phase-level timing of fuzzy_contamination at sf0.1: which stage of
the LSH decontamination (shingle persist, band keys, candidate join,
verify) owns the wall-clock. Guide §1 — measure before touching."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.functions.corpus import _docs
    from data_pipeline_platform_spark.functions.dedup import (
        lsh_band_keys,
        with_shingles,
    )

    spark = get_spark("phase-fuzzy")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    def t(label, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label:38s} {time.time()-t0:6.2f}s")

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)

    for rnd in range(2):
        print(f"--- pass {rnd} ---")
        t_sh = (
            with_shingles(train).select("doc_id", "shingles")
            .filter(F.size("shingles") > 0)
        )
        b_sh = (
            with_shingles(bench)
            .select(F.col("doc_id").alias("bench_id"), "shingles")
            .filter(F.size("shingles") > 0)
        )
        t("t_sh (train shingles)", t_sh)
        t("b_sh (bench shingles)", b_sh)
        t_shp = t_sh.persist()
        b_shp = b_sh.persist()
        t_shp.count()
        b_shp.count()
        t("train band keys (from persisted)", lsh_band_keys(t_shp))
        cand = (
            lsh_band_keys(t_shp)
            .join(F.broadcast(lsh_band_keys(b_shp, id_col="bench_id")),
                  ["band", "sig"])
            .select("doc_id", "bench_id")
            .distinct()
        )
        t("candidates (bands join + distinct)", cand)
        verified = (
            cand.join(t_shp, "doc_id")
            .join(b_shp.select("bench_id",
                               F.col("shingles").alias("b_shingles")),
                  "bench_id")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("shingles", "b_shingles"))
                * F.lit(1.0)
                / F.size(F.array_union("shingles", "b_shingles")),
            )
            .filter(F.col("jaccard") >= 0.8)
            .select("doc_id", "bench_id", "jaccard")
        )
        t("verified (full, from persisted)", verified)
        t_shp.unpersist(blocking=True)
        b_shp.unpersist(blocking=True)


if __name__ == "__main__":
    main()
