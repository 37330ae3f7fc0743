from ceres_spark.plans.glob import glob_to_regex
from ceres_spark.plans.render import (
    RenderContext,
    parse_at_time,
    render,
    render_targets,
    supported_functions,
)
from ceres_spark.plans.target import parse_target

__all__ = [
    "glob_to_regex",
    "RenderContext",
    "parse_at_time",
    "render",
    "render_targets",
    "supported_functions",
    "parse_target",
]
