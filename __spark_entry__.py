"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_platform_spark``; this module is
a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    orders ⋈ broadcast(customer) -> revenue by market segment and year
    (projection + year-extract + group-agg: the reference's EP3 library
    path re-expressed as one lazy Catalyst plan)."""
    from data_pipeline_platform_spark.queries import q_revenue_by_segment_year

    return q_revenue_by_segment_year(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from data_pipeline_platform_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI twins; names absent here get rows-only checks."""
    from data_pipeline_platform_spark.queries import all_oracles

    return all_oracles()
