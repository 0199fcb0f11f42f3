from data_pipeline_platform_spark.utils.retry import RetryError, retry, retry_call
from data_pipeline_platform_spark.utils.idempotency import IdempotencyManager, idempotent

__all__ = ["RetryError", "retry", "retry_call", "IdempotencyManager", "idempotent"]
