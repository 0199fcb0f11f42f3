"""CodeTransformer tests (reference tests/unit/test_code_transformer.py
behaviors: callables, file/module loading, class transforms, kwargs)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.operators.code_transformer import CodeTransformer


@pytest.fixture()
def t():
    return CodeTransformer()


def test_callable_transform(t, users_df):
    out = t.transform(users_df, lambda df: df.withColumn("age2", F.col("age") * 2))
    assert out.filter("id = 1").collect()[0]["age2"] == 50


def test_kwargs_forwarded(t, users_df):
    def add_const(df, n=0):
        return df.withColumn("n", F.lit(n))

    out = t.transform(users_df, add_const, n=42)
    assert out.limit(1).collect()[0]["n"] == 42


def test_non_dataframe_result_raises(t, users_df):
    with pytest.raises(TypeError):
        t.transform(users_df, lambda df: 123)


def test_load_from_file(t, users_df, tmp_path):
    mod = tmp_path / "user_fn.py"
    mod.write_text(
        "from pyspark.sql import functions as F\n"
        "def double_age(df):\n"
        "    return df.withColumn('age', F.col('age') * 2)\n"
    )
    out = t.transform(users_df, f"{mod}:double_age")
    assert out.filter("id = 1").collect()[0]["age"] == 50


def test_class_transform(t, users_df):
    class Doubler:
        def __init__(self, col="age"):
            self.col = col

        def transform(self, df):
            return df.withColumn(self.col, F.col(self.col) * 2)

    out = t.transform_with_class(users_df, Doubler, col="age")
    assert out.filter("id = 2").collect()[0]["age"] == 60


def test_pandas_map(t, users_df):
    def pandas_fn(pdf):
        pdf = pdf.copy()
        pdf["age"] = pdf["age"] + 1
        return pdf

    out = CodeTransformer.transform_pandas(
        users_df, pandas_fn, schema=users_df.schema
    )
    assert sorted(r["age"] for r in out.collect()) == [26, 31, 36, 41, 46]


def test_pandas_grouped(t, spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, 10.0), (2, 20.0)], "k long, v double"
    )

    def demean(pdf):
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = CodeTransformer.transform_pandas(df, demean, schema="k long, v double", group_by=["k"])
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [(1, -1.0), (1, 1.0), (2, -5.0), (2, 5.0)]


def test_versioning(t, users_df):
    t.register_function_version("f", 1, lambda df: df.select("id"))
    t.register_function_version("f", 2, lambda df: df.select("id", "name"))
    assert t.transform_with_version(users_df, "f").columns == ["id", "name"]
    assert t.transform_with_version(users_df, "f", version=1).columns == ["id"]
