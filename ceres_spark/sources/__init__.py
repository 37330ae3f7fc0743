from ceres_spark.sources.tables import TABLES, load, load_all, points

__all__ = ["TABLES", "load", "load_all", "points"]
