"""Config migration + checkpoint tests (SURVEY §2.10 migrate_config,
§2.12 O5)."""

from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer


def test_migrate_config_applies_old_then_new(users_df):
    t = ConfigTransformer()
    t.register_config_version("m", 1, {"rename": {"name": "full_name"}})
    t.register_config_version("m", 2, {"select": ["id", "full_name"]})
    out = t.migrate_config(users_df, "m", from_version=1, to_version=2)
    assert out.columns == ["id", "full_name"]
    assert out.count() == 5


def test_checkpoint_cuts_lineage(spark, tmp_warehouse):
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    runner = PipelineRunner(spark, writer=BatchWriter(spark, base_path=tmp_warehouse))
    df = spark.range(100).withColumnRenamed("id", "x")
    cp = runner.checkpoint(df, name="cp1")
    assert cp.count() == 100
    # the re-read frame scans parquet, not the original range
    assert "Range" not in cp._jdf.queryExecution().optimizedPlan().toString()


def test_registry_persistence_roundtrip(tmp_path):
    from data_pipeline_platform_spark.operators.versioning import VersionRegistry

    p = str(tmp_path / "reg.json")
    reg = VersionRegistry(persist_path=p)
    reg.register("q", 1, "SELECT 1", "first")
    reg.register("q", 2, "SELECT 2", "second")
    # new instance loads from disk
    reg2 = VersionRegistry(persist_path=p)
    assert reg2.get("q") == "SELECT 2"
    assert reg2.get("q", 1) == "SELECT 1"
