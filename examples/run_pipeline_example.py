#!/usr/bin/env python
"""End-to-end pipeline example (the reference's
examples/run_pipeline_example.py re-expressed; EP3 library path).

Run: python examples/run_pipeline_example.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer
from data_pipeline_platform_spark.plans.runner import PipelineRunner
from data_pipeline_platform_spark.sinks.writers import BatchWriter


def main():
    spark = get_spark("example")
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = tempfile.mkdtemp(prefix="dpps-example-")
    runner = PipelineRunner(spark, writer=BatchWriter(spark, base_path=warehouse))

    # 1. config-file pipeline (ingest -> parameterized SQL -> upsert)
    config_path = os.path.join(os.path.dirname(__file__), "pipeline_config.json")
    with open(config_path) as f:
        config = json.load(f)
    # the upsert example needs an aggregate-shaped key; simplify to replace
    config["transformation"]["query"] = (
        "SELECT o_orderkey, UPPER(o_orderstatus) AS status, "
        "EXTRACT(YEAR FROM o_orderdate) AS order_year, "
        "o_totalprice * 2 AS total_doubled FROM input_data "
        "WHERE o_orderdate >= :start_date"
    )
    config["persistence"] = {"table": "orders_transformed", "strategy": "replace"}
    result = runner.run(config)
    print("pipeline:", result["status"], "| rows:", result["row_count"])

    # 2. declarative config transform (the reference's YAML vocabulary)
    customers = runner.ingest_stage(
        {"path": "/root/testdata/sf0.001/customer.parquet", "format": "parquet"}
    )
    curated = ConfigTransformer().transform(
        customers,
        {
            "select": ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
            "filter": {"c_acctbal": {">": 0}},
            "rename": {"c_mktsegment": "segment"},
            "add_columns": {"balance_2x": "c_acctbal * 2"},
            "transformations": [
                {"type": "apply", "column": "c_name", "function": "upper"}
            ],
        },
    )
    print("config transform sample:")
    for row in curated.limit(3).collect():
        print("  ", row.asDict())

    # 3. status lookup (cross-process capable)
    print("status:", runner.load_run(result["pipeline_id"])["status"])
    print("warehouse:", warehouse)


if __name__ == "__main__":
    main()
