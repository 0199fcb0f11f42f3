"""Synthesize an N-times-scaled copy of a testdata dir for SCALING
SMOKE runs only (never correctness: replicated rows change dedup/join
selectivity semantics, which is fine for timing — a dedup workload at
scale IS mostly duplicates — but is not the graded data distribution).

Each fact/entity table is unioned N times with every join KEY column
shifted by copy_index * (max_key + 1), so referential integrity and
per-key cardinalities are preserved copy-by-copy; value columns are
untouched. nation/region stay single-copy (fixed dims).

Usage: python tools/make_scaled_dir.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# table -> columns shifted by that table family's key stride
_SHIFT = {
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event", "user_id": "user"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "nation": {},   # fixed dims: one copy
    "region": {},
}


def main(src: str, dst: str, factor: int) -> None:
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.sources.readers import load_table

    spark = get_spark("make-scaled-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    # one stride per key FAMILY so tables shift consistently (orders'
    # o_custkey moves exactly like customer's c_custkey)
    strides = {}
    for table, cols in _SHIFT.items():
        df = load_table(spark, src, table)
        for col, family in cols.items():
            hi = df.agg(F.max(col)).collect()[0][0]
            strides[family] = max(strides.get(family, 0), int(hi) + 1)

    for table, cols in _SHIFT.items():
        df = load_table(spark, src, table)
        out = os.path.join(dst, f"{table}.parquet")
        if not cols:
            df.write.mode("overwrite").parquet(out)
            continue
        copies = []
        for i in range(factor):
            c = df
            for col, family in cols.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * strides[family])).cast("bigint")
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(out)
        print(f"{table}: x{factor} -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    main(src, dst, factor)
