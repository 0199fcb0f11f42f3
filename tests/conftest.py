"""Shared fixtures: one local SparkSession per test session (SURVEY.md §5:
local session fixture + exact-value golden asserts, matching the
reference's unit-test style)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_platform_spark.session import get_spark

# Test-session shuffle parallelism: 4 (matching the local[4] master)
# unless the caller overrides. The production default of 32 makes every
# tiny test exchange schedule up to 32 map-side tasks across 4 cores —
# pure task-dispatch waves over sf0.001 data (measured: the CDF fold
# module 114s -> 99s). Env-driven, so the packaged default is untouched.
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")

SF_DIR = os.environ.get("DPPS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dpps-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def users_df(spark):
    """The reference's primary 5-row fixture (tests/conftest.py:31-47)."""
    import datetime

    rows = [
        (1, "Alice", "alice@example.com", 25, datetime.datetime(2024, 1, 1)),
        (2, "Bob", "bob@example.com", 30, datetime.datetime(2024, 1, 2)),
        (3, "Charlie", "charlie@example.com", 35, datetime.datetime(2024, 1, 3)),
        (4, "David", "david@example.com", 40, datetime.datetime(2024, 1, 4)),
        (5, "Eve", "eve@example.com", 45, datetime.datetime(2024, 1, 5)),
    ]
    return spark.createDataFrame(rows, "id long, name string, email string, age long, created_at timestamp")


@pytest.fixture()
def tmp_warehouse(tmp_path):
    return str(tmp_path / "warehouse")
