from gemini_data_wrangler_spark.operators.compiler import compile_stage
from gemini_data_wrangler_spark.operators.pipeline import PipelineRunner

__all__ = ["compile_stage", "PipelineRunner"]
