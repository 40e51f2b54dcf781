"""Pipeline model: stage abstraction, registry, config parsing, SQL
parameter injection."""

from arc_jupyter_spark.plans.pipeline import (  # noqa: F401
    PipelineStage,
    STAGE_REGISTRY,
    parse_pipeline,
    register_stage,
    run_pipeline,
)
from arc_jupyter_spark.plans.sqlparams import inject_parameters  # noqa: F401
