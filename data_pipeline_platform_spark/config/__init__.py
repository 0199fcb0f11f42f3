from data_pipeline_platform_spark.config.settings import Settings

__all__ = ["Settings"]
