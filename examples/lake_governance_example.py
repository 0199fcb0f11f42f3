"""Runnable lake-governance walkthrough: schema evolution, multi-table
atomic transactions, multi-column Z-ORDER, and retention vacuum on the
AcidTable layer.

    python examples/lake_governance_example.py [sf_dir]

Everything lands in a temp directory; at 100 TB the same code points at
object-store paths — evolution adds zero data motion (old files read
new columns as NULL through the logged-schema pin), the txn decide
point is one put-if-absent marker regardless of staged volume, and the
z-order rewrite is the same shuffle a lexicographic compaction pays.
"""

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_pipeline_platform_spark.session import get_spark  # noqa: E402
from data_pipeline_platform_spark.sinks.acid import (  # noqa: E402
    AcidTable,
    SchemaMismatchError,
)
from data_pipeline_platform_spark.sinks.txn import MultiTableTxn  # noqa: E402
from data_pipeline_platform_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lake-governance-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lake_gov_")
    print(f"== lake dir: {root}")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )

    # ------------------------------------------------------ schema evolution
    facts = AcidTable(spark, f"{root}/facts")
    facts.write(
        orders.filter(F.col("o_orderkey") % 2 == 0).repartition(4),
        stats_cols=["o_orderkey", "o_custkey"],
    )
    print(f"v1 schema: {facts.table_schema().simpleString()}")
    widened = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel",
        F.when(F.col("o_orderkey") % 10 < 5, "web").otherwise("store"),
    )
    try:
        facts.write(widened, mode="append")
    except SchemaMismatchError as e:
        print(f"unplanned widening refused: {e}")
    facts.write(widened, mode="append", merge_schema=True)
    print(f"v2 schema: {facts.table_schema().simpleString()}")
    by_channel = facts.read().groupBy("channel").count().collect()
    print(f"channels (NULL = pre-evolution rows): "
          f"{sorted((r['channel'] or '<null>', r['count']) for r in by_channel)}")
    print(f"time travel: v1 columns = {facts.read(1).columns}")

    # -------------------------------------------------- multi-table txn (2PC)
    audit = AcidTable(spark, f"{root}/audit")
    audit.write(spark.createDataFrame([("base", 1)], "event string, seq long"))
    txn = MultiTableTxn(f"{root}/_txns")
    txn.stage_merge(
        facts,
        facts.read().filter(F.col("o_orderkey") % 1000 == 0).withColumn(
            "price_c", F.col("price_c") + 100
        ),
        keys=["o_orderkey"],
    )
    txn.stage_write(
        audit,
        spark.createDataFrame([("repriced", 2)], "event string, seq long"),
        mode="append",
    )
    print(f"staged, pre-decide: audit rows = {audit.read().count()}")
    txn.commit()
    print(f"one marker later: audit rows = {audit.read().count()}")

    poison = MultiTableTxn(f"{root}/_txns")
    poison.stage_write(
        audit,
        spark.createDataFrame([("oops", 99)], "event string, seq long"),
        mode="append",
    )
    poison.abort()
    print(f"aborted txn left no trace: audit rows = {audit.read().count()}")

    # ------------------------------------------------- multi-column Z-ORDER
    facts.compact(target_files=16, cluster_by=["o_orderkey", "o_custkey"],
                  zorder=True)

    def candidates(col, lo, hi):
        n = 0
        for a in facts.snapshot_files():
            st = (a.get("stats") or {}).get(col)
            if st is None or not (st["max"] < lo or st["min"] > hi):
                n += 1
        return n

    total = len(facts.snapshot_files())
    k_hi = facts.read().agg(F.max("o_orderkey")).collect()[0][0]
    c_hi = facts.read().agg(F.max("o_custkey")).collect()[0][0]
    print(f"z-order probe (1/8 range): o_orderkey -> "
          f"{candidates('o_orderkey', 0, k_hi // 8)}/{total} files, "
          f"o_custkey -> {candidates('o_custkey', 0, c_hi // 8)}/{total} files")

    # ------------------------------------------- consistent snapshot reads
    cut = MultiTableTxn.consistent_cut(f"{root}/_txns", [facts, audit])
    print("torn-free cut:",
          {os.path.basename(k): v for k, v in cut.items()})
    torn = MultiTableTxn.consistent_cut(
        f"{root}/_txns", [facts, audit],
        at={facts.path: facts.latest_version(), audit.path: 1},
    )
    print("torn proposal repaired to:",
          {os.path.basename(k): v for k, v in torn.items()})

    # ------------------------------------------- bloom point lookups (r10)
    facts.set_bloom_index(["o_orderkey"])
    facts.merge(  # any rewrite after set_bloom_index records fresh blooms
        facts.read().limit(50).withColumn("price_c", F.col("price_c") + 1),
        keys=["o_orderkey"],
    )
    keep, pruned = facts.lookup_files("o_orderkey", [2])
    print(f"bloom lookup of one key: scans {len(keep)} files, "
          f"skips {pruned} (footer ranges alone cannot skip interleaved keys)")
    print("point_lookup rows:",
          facts.point_lookup("o_orderkey", [2, 4]).count())

    # ------------------------------- conditional MERGE clause set (r10)
    stats = facts.merge_conditional(
        facts.read().limit(20).withColumn("price_c", F.col("price_c") - 100),
        keys=["o_orderkey"],
        update_when="s.price_c > t.price_c",       # only raises apply
        delete_when="t.price_c < 0",               # never fires here
        insert_when="true",
    )
    print("conditional merge (stale price drops ignored):", stats)

    # ---------------------------------------------------- retention vacuum
    removed = facts.vacuum(retain_versions=1)
    print(f"vacuum(retain_versions=1): {len(removed)} orphan/old files gone; "
          f"previous version still readable: "
          f"{facts.read(facts.latest_version() - 1).count()} rows")


if __name__ == "__main__":
    main()
