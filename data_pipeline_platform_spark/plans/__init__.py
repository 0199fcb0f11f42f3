from data_pipeline_platform_spark.plans.runner import PipelineRunner

__all__ = ["PipelineRunner"]
