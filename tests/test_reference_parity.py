"""Verbatim reference-query parity: the SQL strings the reference's own
docs/tests/examples feed to its SQL transformer must run unchanged here
and produce the reference's documented golden values.

Sources (all in /root/reference, read-only):
- tests/unit/test_sql_transformer.py:18-42  (UPPER -> 'ALICE', age*2)
- tests/integration/test_pipeline_flow.py:82 (combined projection)
- tests/fixtures/data/pipeline_config.json:13 (EXTRACT(YEAR FROM ...))
- sql_transformer.py:85 docstring            (COUNT(*) OVER ())
"""

import pytest

from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer


@pytest.fixture()
def t(spark):
    return SQLTransformer(spark)


def test_reference_upper_query_verbatim(t, users_df):
    out = t.transform(
        users_df, "SELECT id, UPPER(name) as name_upper FROM input_data"
    )
    assert out.filter("id = 1").collect()[0]["name_upper"] == "ALICE"


def test_reference_pipeline_flow_query_verbatim(t, users_df):
    out = t.transform(
        users_df,
        "SELECT id, UPPER(name) as name_upper, email, age * 2 as age_doubled "
        "FROM input_data",
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["name_upper"] == "ALICE" and rows[1]["age_doubled"] == 50
    assert rows[5]["age_doubled"] == 90
    assert out.columns == ["id", "name_upper", "email", "age_doubled"]


def test_reference_extract_year_verbatim(t, users_df):
    out = t.transform(
        users_df,
        "SELECT id, EXTRACT(YEAR FROM created_at) as created_year FROM input_data",
    )
    assert all(r["created_year"] == 2024 for r in out.collect())


def test_reference_count_over_verbatim(t, users_df):
    out = t.transform(
        users_df,
        "SELECT id, name, COUNT(*) OVER() as total FROM input_data",
    )
    assert all(r["total"] == 5 for r in out.collect())


def test_reference_parameterized_verbatim(t, users_df):
    out = t.transform(
        users_df,
        "SELECT * FROM input_data WHERE age > :min_age",
        parameters={"min_age": 30},
    )
    assert out.count() == 3
