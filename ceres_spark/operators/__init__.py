"""Operator modules. Import submodules explicitly
(``import ceres_spark.operators.compact as cp``) — several module
names coincide with their main function names, so the package does
not re-export functions at the top level.
"""
