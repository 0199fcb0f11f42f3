"""Golden-value tests for the ConfigTransformer (reference
tests/unit/test_config_transformer.py style: exact scalars)."""

import pytest

from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer


@pytest.fixture()
def t():
    return ConfigTransformer()


def test_select_silently_drops_missing(t, users_df):
    out = t.transform(users_df, {"select": ["id", "name", "nope"]})
    assert out.columns == ["id", "name"]


def test_rename(t, users_df):
    out = t.transform(users_df, {"rename": {"name": "full_name"}})
    assert "full_name" in out.columns and "name" not in out.columns


def test_filter_equality(t, users_df):
    out = t.transform(users_df, {"filter": {"age": 30}}).collect()
    assert len(out) == 1 and out[0]["name"] == "Bob"


def test_filter_comparison_ops(t, users_df):
    assert t.transform(users_df, {"filter": {"age": {">": 30}}}).count() == 3
    assert t.transform(users_df, {"filter": {"age": {">=": 30, "<=": 40}}}).count() == 3
    assert t.transform(users_df, {"filter": {"age": {"!=": 30}}}).count() == 4


def test_filter_membership(t, users_df):
    assert t.transform(users_df, {"filter": {"id": {"in": [1, 2]}}}).count() == 2
    assert t.transform(users_df, {"filter": {"id": {"not_in": [1, 2]}}}).count() == 3


def test_filter_contains_is_literal_substring(t, users_df):
    out = t.transform(users_df, {"filter": {"name": {"contains": "li"}}})
    assert sorted(r["name"] for r in out.collect()) == ["Alice", "Charlie"]


def test_filter_null_tests(t, spark):
    df = spark.createDataFrame(
        [(1, "a@x.com"), (2, None), (3, "c@x.com")], "id long, email string"
    )
    t_ = ConfigTransformer()
    assert t_.transform(df, {"filter": {"email": {"is_null": True}}}).count() == 1
    assert t_.transform(df, {"filter": {"email": {"is_not_null": True}}}).count() == 2


def test_add_columns_expression(t, users_df):
    out = t.transform(users_df, {"add_columns": {"age_plus_10": "age + 10"}})
    row = out.filter("id = 1").collect()[0]
    assert row["age_plus_10"] == 35  # reference golden: 25 + 10


def test_add_columns_literal_fallback(t, users_df):
    out = t.transform(users_df, {"add_columns": {"status": "not a valid ~~ expr ((", "n": 7}})
    row = out.limit(1).collect()[0]
    assert row["status"] == "not a valid ~~ expr (("
    assert row["n"] == 7


def test_drop_columns_ignores_missing(t, users_df):
    out = t.transform(users_df, {"drop_columns": ["email", "ghost"]})
    assert "email" not in out.columns


def test_map_unmapped_to_null(t, users_df):
    out = t.transform(
        users_df,
        {"transformations": [{"type": "map", "column": "name", "mapping": {"Alice": "A"}}]},
    )
    vals = {r["id"]: r["name"] for r in out.collect()}
    assert vals[1] == "A" and vals[2] is None  # pandas .map parity


def test_apply_upper(t, users_df):
    out = t.transform(
        users_df,
        {"transformations": [{"type": "apply", "column": "name", "function": "upper"}]},
    )
    assert out.filter("id = 1").collect()[0]["name"] == "ALICE"


def test_group_agg_naming_quirk(t, users_df):
    out = t.transform(
        users_df,
        {"aggregations": {"group_by": ["age"], "aggregations": {"total": "SUM(id)"}}},
    )
    assert "id_sum" in out.columns  # {col}_{func}, not the config key


def test_global_count_only(t, users_df):
    out = t.transform(users_df, {"aggregations": {"aggregations": {"n": "COUNT(*)"}}})
    assert out.collect()[0]["n"] == 5


def test_global_non_count_raises(t, users_df):
    with pytest.raises(ValueError):
        t.transform(users_df, {"aggregations": {"aggregations": {"s": "SUM(age)"}}})


def test_group_size_fallback(t, users_df):
    out = t.transform(users_df, {"aggregations": {"group_by": ["age"]}})
    assert "count" in out.columns and out.count() == 5


def test_fixed_op_order(t, users_df):
    # rename happens before filter, so the filter must use the new name
    out = t.transform(
        users_df,
        {"rename": {"age": "years"}, "filter": {"years": {">": 30}}},
    )
    assert out.count() == 3


def test_versioning_latest_wins(t, users_df):
    t.register_config_version("cfg", 1, {"select": ["id"]})
    t.register_config_version("cfg", 2, {"select": ["id", "name"]})
    out = t.transform_with_version(users_df, "cfg")
    assert out.columns == ["id", "name"]
    out1 = t.transform_with_version(users_df, "cfg", version=1)
    assert out1.columns == ["id"]
    assert [h["version"] for h in t.get_version_history("cfg")] == [1, 2]


def test_config_loading_yaml_json(t, tmp_path):
    yml = tmp_path / "c.yaml"
    yml.write_text("select:\n  - id\n  - name\nrename:\n  name: full_name\n")
    cfg = ConfigTransformer.load_config(str(yml))
    assert cfg == {"select": ["id", "name"], "rename": {"name": "full_name"}}
    js = tmp_path / "c.json"
    js.write_text('{"select": ["id"]}')
    assert ConfigTransformer.load_config(str(js)) == {"select": ["id"]}
