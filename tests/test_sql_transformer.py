"""SQLTransformer golden tests (reference tests/unit/test_sql_transformer.py)."""

import pytest

from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer


@pytest.fixture()
def t(spark):
    return SQLTransformer(spark)


def test_upper_golden(t, users_df):
    out = t.transform(users_df, "SELECT id, UPPER(name) AS name_upper FROM input_data")
    assert out.filter("id = 1").collect()[0]["name_upper"] == "ALICE"


def test_arithmetic_golden(t, users_df):
    out = t.transform(users_df, "SELECT id, age * 2 AS age_doubled FROM input_data")
    assert out.filter("id = 5").collect()[0]["age_doubled"] == 90


def test_table_name_placeholder(t, users_df):
    out = t.transform(
        users_df, "SELECT COUNT(*) AS n FROM :table_name", table_name="my_tbl"
    )
    assert out.collect()[0]["n"] == 5


def test_named_parameters(t, users_df):
    out = t.transform(
        users_df,
        "SELECT id FROM input_data WHERE age > :min_age",
        parameters={"min_age": 30},
    )
    assert out.count() == 3


def test_window_count_over(t, users_df):
    out = t.transform(
        users_df, "SELECT id, COUNT(*) OVER () AS total FROM input_data"
    )
    assert all(r["total"] == 5 for r in out.collect())


def test_multi_table(t, spark, users_df):
    other = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    out = t.transform_multi(
        {"u": users_df, "tags": other},
        "SELECT u.id, u.name, tags.tag FROM u JOIN tags ON u.id = tags.id",
    )
    assert out.count() == 2


def test_version_registry(t, users_df):
    t.register_query_version("q", 1, "SELECT id FROM input_data")
    t.register_query_version("q", 2, "SELECT id, name FROM input_data")
    assert t.get_query_version("q") == "SELECT id, name FROM input_data"
    out = t.transform_with_version(users_df, "q", version=1)
    assert out.columns == ["id"]
    assert len(t.registry.execution_history) == 1
