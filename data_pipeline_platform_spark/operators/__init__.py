from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer
from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer
from data_pipeline_platform_spark.operators.code_transformer import CodeTransformer
from data_pipeline_platform_spark.operators.versioning import VersionRegistry

__all__ = ["SQLTransformer", "ConfigTransformer", "CodeTransformer", "VersionRegistry"]
