from gemini_data_wrangler_spark.plans.stage import (
    AggSpec,
    FilterCondition,
    OrderSpec,
    Stage,
    StageType,
    validate_stage,
)

__all__ = [
    "AggSpec",
    "FilterCondition",
    "OrderSpec",
    "Stage",
    "StageType",
    "validate_stage",
]
