from recover_spark.plans.pipeline import DatasetPipeline, PipelineResult

__all__ = ["DatasetPipeline", "PipelineResult"]
