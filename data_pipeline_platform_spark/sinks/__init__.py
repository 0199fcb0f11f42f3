from data_pipeline_platform_spark.sinks.writers import BatchWriter, WriteStrategy

__all__ = ["BatchWriter", "WriteStrategy"]
