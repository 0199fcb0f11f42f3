"""data_pipeline_platform_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark rebuild of the capabilities of the reference platform
``akmukhi/data-pipeline-platform`` (pandas + Celery + PostgreSQL batch ETL):
ingest -> transform (SQL / config / code) -> persist, with schema
validation/evolution, versioned transformations, idempotency, retry, and a
pipeline runner — re-expressed as lazy Spark DataFrame plans optimized by
Catalyst, plus large-scale data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing, structured streaming).

Design stance (see SURVEY.md §7): one lazy DataFrame chain per pipeline;
no inter-stage serialization; Catalyst + AQE do the optimization; Python
stays on the driver except for Arrow-batched pandas UDFs where built-in
functions genuinely cannot express the semantics.
"""

from data_pipeline_platform_spark.config.settings import Settings
from data_pipeline_platform_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["Settings", "get_spark", "stop_spark", "__version__"]
