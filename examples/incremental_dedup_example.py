"""Runnable incremental-dedup walkthrough: a persisted MinHash-LSH
signature index absorbs three "daily" document feeds; each day's cost
is the day's shingling plus one band equi-join against the stored
signatures — history is never re-shingled — and the discovered
near-duplicate pair set is identical to a from-scratch run.

    python examples/incremental_dedup_example.py [sf_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_pipeline_platform_spark.functions.dedup import (  # noqa: E402
    q_dedup_minhash_lsh,
)
from data_pipeline_platform_spark.functions.dedup_index import (  # noqa: E402
    IncrementalLshIndex,
)
from data_pipeline_platform_spark.session import get_spark  # noqa: E402
from data_pipeline_platform_spark.sources.readers import load_table  # noqa: E402
from data_pipeline_platform_spark.utils.cache import release_tracked  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = IncrementalLshIndex(
        spark,
        tempfile.mkdtemp(prefix="lsh_index_"),
        tempfile.mkdtemp(prefix="lsh_pairs_"),
    )
    for day in range(3):
        feed = docs.filter(F.col("doc_id") % 3 == day)
        stats = idx.add_batch(feed, batch_id=day)
        print(f"day {day}: {stats}")
    # a crashed scheduler re-delivers day 2: nothing double-counts
    replay = idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)
    print(f"replayed day 2: {replay}")

    incremental = {
        (r["doc_a"], r["doc_b"]) for r in idx.all_pairs().collect()
    }
    one_shot = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    release_tracked()
    print(f"pairs: incremental={len(incremental)} one-shot={len(one_shot)} "
          f"identical={incremental == one_shot}")
    idx.all_pairs().orderBy("doc_a", "doc_b").show(5)

    # ---------------------------------------- right-to-be-forgotten (r10)
    victim = idx.all_pairs().limit(1).collect()
    if victim:
        doomed = victim[0]["doc_a"]
        out = idx.erase([doomed])
        print(f"erased doc {doomed}: {out}; "
              f"pairs naming it left: "
              f"{idx.all_pairs().filter((F.col('doc_a') == doomed) | (F.col('doc_b') == doomed)).count()}")


if __name__ == "__main__":
    main()
