"""Schema validation/evolution/registry tests (reference
tests/unit/test_schema_validator.py:86-228 behaviors)."""

import pytest

from data_pipeline_platform_spark.operators.schema import (
    ColumnSchema,
    SchemaDefinition,
    SchemaRegistry,
    SchemaValidationError,
    SchemaValidator,
)


@pytest.fixture()
def v():
    return SchemaValidator()


def _schema(*cols):
    return SchemaDefinition(name="s", version=1, columns=list(cols))


def test_missing_column_gets_default(v, users_df):
    schema = _schema(
        ColumnSchema(name="id", dtype="long"),
        ColumnSchema(name="status", dtype="string", default="active"),
    )
    out = v.validate(users_df, schema)
    assert out.columns == ["id", "status"]
    assert out.limit(1).collect()[0]["status"] == "active"


def test_missing_column_null_without_default(v, users_df):
    schema = _schema(
        ColumnSchema(name="id", dtype="long"),
        ColumnSchema(name="missing_col", dtype="string"),
    )
    out = v.validate(users_df, schema)
    assert out.limit(1).collect()[0]["missing_col"] is None


def test_strict_missing_raises(v, users_df):
    schema = _schema(ColumnSchema(name="ghost", dtype="string"))
    with pytest.raises(SchemaValidationError):
        v.validate(users_df, schema, strict=True)


def test_extra_columns_dropped_by_default(v, users_df):
    schema = _schema(ColumnSchema(name="id", dtype="long"))
    assert v.validate(users_df, schema).columns == ["id"]


def test_extra_columns_kept_when_allowed(v, users_df):
    schema = _schema(ColumnSchema(name="id", dtype="long"))
    out = v.validate(users_df, schema, allow_extra_columns=True)
    assert out.columns[0] == "id" and "name" in out.columns


def test_lossy_coercion_to_null(v, spark):
    df = spark.createDataFrame([("1",), ("abc",), ("3",)], "x string")
    schema = _schema(ColumnSchema(name="x", dtype="int"))
    vals = [r["x"] for r in v.validate(df, schema).collect()]
    assert vals == [1, None, 3]  # pd.to_numeric(errors='coerce') parity


def test_default_fills_coercion_nulls(v, spark):
    df = spark.createDataFrame([("1",), ("abc",)], "x string")
    schema = _schema(ColumnSchema(name="x", dtype="int", default=0))
    vals = [r["x"] for r in v.validate(df, schema).collect()]
    assert vals == [1, 0]


def test_column_reorder(v, users_df):
    schema = _schema(
        ColumnSchema(name="name", dtype="string"),
        ColumnSchema(name="id", dtype="long"),
    )
    assert v.validate(users_df, schema).columns == ["name", "id"]


def test_evolve_schema_add_and_drop(v, users_df):
    new = _schema(
        ColumnSchema(name="id", dtype="long"),
        ColumnSchema(name="name", dtype="string"),
        ColumnSchema(name="tier", dtype="string", default="basic"),
    )
    out = v.evolve_schema(users_df, new, deprecated_columns=["email"])
    assert out.columns == ["id", "name", "tier"]
    assert out.limit(1).collect()[0]["tier"] == "basic"


def test_compare_schemas():
    old = _schema(
        ColumnSchema(name="a", dtype="int"),
        ColumnSchema(name="b", dtype="string"),
    )
    new = _schema(
        ColumnSchema(name="a", dtype="double"),
        ColumnSchema(name="c", dtype="string", nullable=False),
    )
    diff = SchemaValidator.compare_schemas(old, new)
    assert diff["added_columns"] == ["c"]
    assert diff["removed_columns"] == ["b"]
    assert diff["type_changes"]["a"] == {"from": "int", "to": "double"}
    assert not diff["compatible"]


def test_registry_upsert_latest(tmp_path):
    reg = SchemaRegistry(str(tmp_path))
    s1 = _schema(ColumnSchema(name="a", dtype="int"))
    s1.version = 1
    reg.register(s1)
    s2 = s1.model_copy(update={"version": 2})
    reg.register(s2)
    assert reg.load("s").version == 2  # latest by default
    assert reg.load("s", version=1).version == 1
    assert [h["version"] for h in reg.history("s")] == [1, 2]


def test_struct_type_bridge():
    schema = _schema(
        ColumnSchema(name="v", dtype="array<float>"),
        ColumnSchema(name="t", dtype="timestamp"),
    )
    st = schema.to_struct_type()
    assert st.fields[0].dataType.simpleString() == "array<float>"
    assert st.fields[1].dataType.simpleString() == "timestamp"


def test_acid_registry_upsert_latest_and_time_travel(spark, tmp_path):
    """The JSON-backend contract on the ACID backend, plus what the lake
    layer adds: registry-wide time travel and a commit audit trail."""
    from data_pipeline_platform_spark.operators.schema import AcidSchemaRegistry

    reg = AcidSchemaRegistry(spark, str(tmp_path / "reg"))
    s1 = _schema(ColumnSchema(name="a", dtype="int"))
    s1.version = 1
    reg.register(s1)
    s2 = s1.model_copy(update={"version": 2})
    reg.register(s2)
    assert reg.load("s").version == 2  # latest by default
    assert reg.load("s", version=1).version == 1
    assert [h["version"] for h in reg.history("s")] == [1, 2]
    with pytest.raises(KeyError):
        reg.load("nope")
    with pytest.raises(KeyError):
        reg.load("s", version=99)

    # upsert: re-registering version 2 with a changed column REPLACES it
    s2b = s2.model_copy(
        update={"columns": [ColumnSchema(name="a", dtype="double")]}
    )
    reg.register(s2b)
    assert reg.load("s", version=2, table_version=None).columns[0].dtype == "double"
    assert len(reg.history("s")) == 2  # still two versions, not three

    # time travel: the registry as of commit 2 still holds the OLD v2
    assert reg.load("s", version=2, table_version=2).columns[0].dtype == "int"
    ops = [h["op"] for h in reg.table_history()]
    assert ops[0] == "OVERWRITE" and "MERGE" in ops[1:]


def test_acid_registry_cache_serves_current_snapshot(spark, tmp_path):
    from data_pipeline_platform_spark.operators.schema import AcidSchemaRegistry

    reg = AcidSchemaRegistry(spark, str(tmp_path / "reg2"))
    s1 = _schema(ColumnSchema(name="a", dtype="int"))
    reg.register(s1)
    assert reg.load("s", version=1) is reg._cache["s@1"]
