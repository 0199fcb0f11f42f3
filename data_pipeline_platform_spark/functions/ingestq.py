"""Graded surface for the text-format ingest path (sources/readers.py
ingest_files): the CSV and JSONL readers run under the correctness
gate, not just unit tests.

The round trip uses only LOSSLESS text types (BIGINT keys, exact cent
integers, dates, strings) so "read(write(x)) == x" is a schema/parse
contract, not a float-formatting accident; the float columns' handling
is covered by cents conversion BEFORE serialization, the same posture
an ingest layer should take with money at 100 TB anyway.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.sources.readers import ingest_files, load_table

_SCHEMA = "o_orderkey bigint, o_orderstatus string, cents bigint, d date"


def q_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even orderkeys exit and re-enter through CSV, odd ones through
    JSONL (both with explicit schemas — never inference); the union is
    aggregated per (order year, status). The oracle computes the same
    aggregate straight from the parquet, so any parse/serialize drift
    in either text reader breaks the hash."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    csv_dir = tempfile.mkdtemp(prefix="ingest_csv_")
    json_dir = tempfile.mkdtemp(prefix="ingest_jsonl_")
    o.filter(F.col("o_orderkey") % 2 == 0).write.mode("overwrite").option(
        "header", "true"
    ).csv(csv_dir)
    o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").json(json_dir)
    from_csv = ingest_files(spark, csv_dir, "csv", _SCHEMA)
    from_json = ingest_files(spark, json_dir, "jsonl", _SCHEMA)
    return (
        from_csv.unionByName(from_json)
        .groupBy(F.year("d").alias("order_year"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents") / 100.0).alias("total_price"),
        )
    )


ORACLE_INGEST_ROUNDTRIP = """
SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS order_year,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY 1, 2
"""

register("ingest_roundtrip", q_ingest_roundtrip, ORACLE_INGEST_ROUNDTRIP)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC exit-and-re-enter for the columnar-interchange path (Hive
    ecosystems hand off ORC the way warehouses hand off parquet): the
    orders slice leaves through Spark's native ORC writer, re-enters
    through ingest_files' schema-pinned ORC reader, and is aggregated
    per (year, status) — the oracle computes the same aggregate from
    the original parquet, so type round-trip drift in the ORC path
    breaks the hash. ORC is lossless for these types (BIGINT, string,
    date, exact cents), same posture as the CSV/JSONL twin."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    orc_dir = tempfile.mkdtemp(prefix="ingest_orc_")
    o.write.mode("overwrite").orc(orc_dir)
    back = ingest_files(spark, orc_dir, "orc", _SCHEMA)
    return back.groupBy(F.year("d").alias("order_year"), "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents") / 100.0).alias("total_price"),
    )


ORACLE_ORC_ROUNDTRIP = """
SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS order_year,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY 1, 2
"""

register("orc_roundtrip", q_orc_roundtrip, ORACLE_ORC_ROUNDTRIP)
