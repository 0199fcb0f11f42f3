"""Runnable medallion walkthrough: bronze orders → silver enrichment
join → gold aggregate, maintained INCREMENTALLY through ACID change
feeds with exactly-once markers — plus dimension churn folded from
state alone.

    python examples/medallion_example.py [sf_dir]

Everything lands in a temp directory; at 100 TB the same code points
at object-store paths and each fold costs the touched files, never the
table.
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_pipeline_platform_spark.session import get_spark  # noqa: E402
from data_pipeline_platform_spark.sinks.acid import AcidTable  # noqa: E402
from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin  # noqa: E402
from data_pipeline_platform_spark.sinks.matview import MaterializedAgg  # noqa: E402
from data_pipeline_platform_spark.sources.readers import load_table  # noqa: E402
from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("medallion-example")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    root = tempfile.mkdtemp(prefix="medallion_")
    bronze = AcidTable(spark, f"{root}/bronze")
    dim = AcidTable(spark, f"{root}/dim")
    dim.write(customer, stats_cols=["c_custkey"])

    # governance: refuse negative prices at the bronze door
    silver = MaterializedJoin(
        spark,
        f"{root}/silver",
        row_keys=["o_orderkey"],
        dim=lambda: dim.read(),
        on=[("o_custkey", "c_custkey")],
        how="left",
    )
    gold = MaterializedAgg(
        spark,
        f"{root}/gold",
        keys=["c_mktsegment"],
        aggs=[("n_orders", "count", ""), ("sum_price_c", "sum", "price_c")],
    )
    hop1 = ChangeFeedConsumer(bronze, ["o_orderkey"], silver)
    hop2 = ChangeFeedConsumer(
        silver.acid, ["o_orderkey"], gold, count_col="n_orders"
    )
    dim_hop = ChangeFeedConsumer(dim, ["c_custkey"], silver, dim_side=True)

    def drain():
        print("  hop1", hop1.process_available())
        print("  hop2", hop2.process_available())

    print("== initial load")
    bronze.write(
        orders.filter("o_orderkey % 2 = 0").repartition(4, "o_orderkey"),
        stats_cols=["o_orderkey"],
    )
    bronze.add_constraint("price_nonneg", "price_c >= 0")
    drain()
    # dim consumer starts at the dim version the view was built against
    silver.acid._commit(
        silver.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_hop.stream_id, "batch_id": dim.latest_version()},
    )

    print("== late orders + price corrections")
    bronze.merge(
        orders.filter("o_orderkey % 2 = 1 AND o_orderkey % 501 = 0"),
        keys=["o_orderkey"],
    )
    drain()

    print("== GDPR delete through every layer")
    bronze.merge(
        bronze.read().filter("o_orderkey % 300 = 0"),
        keys=["o_orderkey"],
        delete_matched=True,
    )
    drain()

    print("== dimension churn folds from state alone")
    dim.merge(
        customer.filter("c_custkey % 10 = 0").select(
            "c_custkey", F.lit("CHURNED").alias("c_mktsegment")
        ),
        keys=["c_custkey"],
    )
    print("  dim ", dim_hop.process_available())
    # the silver rows that changed segment retract from their old gold
    # group and add to CHURNED — the join-view feed drives the
    # aggregate's signed fold
    print("  hop2", hop2.process_available())

    print("== gold state")
    gold.read(derive={"avg_price_c": ("sum_price_c", "n_orders")}).orderBy(
        "c_mktsegment"
    ).show()
    print("bronze history:", [h["op"] for h in bronze.history()])
    print("silver history:", [h["op"] for h in silver.history()])


if __name__ == "__main__":
    main()
