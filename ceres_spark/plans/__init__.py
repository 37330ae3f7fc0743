from ceres_spark.plans.glob import glob_to_regex

__all__ = ["glob_to_regex"]
