from ceres_spark.plans.glob import glob_to_regex
from ceres_spark.plans.render import (
    RenderContext,
    render,
    supported_functions,
)
from ceres_spark.plans.target import parse_target

__all__ = [
    "glob_to_regex",
    "RenderContext",
    "render",
    "supported_functions",
    "parse_target",
]
