from data_pipeline_platform_spark.sources.readers import (
    BatchIngestor,
    TABLES,
    load_table,
    register_views,
)

__all__ = ["BatchIngestor", "TABLES", "load_table", "register_views"]
