"""Aggregation kernel — the 5 ceres methods, null-skipping.

Reference: ``aggregate(aggregationMethod, values)`` (ceres.py
≈L1005-1030) filters out None, returns None on empty, and dispatches
to {average, sum, last, max, min}; ``aggregateSeries(method, oldStep,
newStep, values)`` (ceres.py ≈L1033-1050) chunks a dense series into
``newStep // oldStep`` groups (partial last chunk still aggregated)
and applies ``aggregate`` per chunk.

Spark mapping: all five methods are built-in null-skipping JVM
aggregates, so an empty (all-NULL) group yields NULL exactly like the
reference's empty→None. ``last`` needs an explicit ordering to be
deterministic under distributed execution — ceres's list order is
timestamp order after compaction, so we use ``max_by(value, ts)``
over non-null values (DuckDB oracle: ``arg_max(value, ts)``).

Fixed-factor chunking ≡ tumbling-window grouping when timestamps are
quantized: chunk i of ``aggregateSeries`` holds exactly the points
with ``floor(ts / newStep)`` == i (given oldStep | newStep), so
``groupBy(floor(ts/newStep)*newStep)`` reproduces it — including the
partial-last-chunk behavior, since a tumbling window never drops a
partial bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ceres_spark.errors import InvalidAggregationMethod

AGGREGATION_METHODS = ("average", "sum", "last", "max", "min")


def _dec_to_double(col: Column) -> Column:
    """Correctly-rounded decimal→double via string (see agg_expr)."""
    return col.cast("string").cast("double")


def agg_expr(method: str, value_col: str = "value", ts_col: str = "ts") -> Column:
    """Null-skipping aggregate Column for one ceres method.

    All five skip NULLs natively and return NULL for all-NULL/empty
    groups, matching aggregate()'s empty→None (ceres.py ≈L1005).
    """
    if method == "average":
        # decimal-exact accumulation, ONE double division at the end:
        # reproducible bit-for-bit at any parallelism / partitioning
        # (double summation is order-dependent; decimal is not), and
        # identical to the DuckDB oracle's matching expression.
        # decimal→string→double because decimal→double casts are not
        # correctly rounded in every engine (DuckDB computes
        # int128/10^scale in float arithmetic: off by 1 ulp); every
        # engine parses decimal strings correctly rounded.
        return _dec_to_double(
            F.sum(F.col(value_col).cast("string").cast("decimal(30,10)"))
        ) / F.count(F.col(value_col))
    if method == "sum":
        return _dec_to_double(F.sum(F.col(value_col).cast("string").cast("decimal(30,10)")))
    if method == "last":
        # last non-null value by timestamp; max_by skips rows where the
        # value is NULL only if we pre-filter, so guard with a when().
        return F.max_by(
            value_col, F.when(F.col(value_col).isNotNull(), F.col(ts_col))
        )
    if method == "max":
        return F.max(value_col)
    if method == "min":
        return F.min(value_col)
    raise InvalidAggregationMethod(method)


def aggregate(df: DataFrame, method: str, keys: list[str] | None = None) -> DataFrame:
    """Whole-group scalar aggregate (op #19). ``keys=None`` → global."""
    expr = agg_expr(method).alias(method)
    if keys:
        return df.groupBy(*keys).agg(expr)
    return df.agg(expr)


def aggregate_series(
    df: DataFrame,
    method: str,
    new_step: int,
    keys: list[str] = ("metric",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Downsample a quantized series to ``new_step`` (op #20).

    Input/output ``ts`` are epoch-second BIGINTs. One shuffle on
    (keys, bucket); partial aggregation (map-side combine) keeps the
    shuffle volume proportional to buckets, not points — this is the
    plan that survives 100 TB.
    """
    if method not in AGGREGATION_METHODS:
        raise InvalidAggregationMethod(method)
    step = int(new_step)
    bucket = (F.col(ts_col) - F.col(ts_col) % step).cast("long").alias(ts_col)
    out = df.groupBy(*keys, bucket).agg(
        agg_expr(method, value_col, ts_col).alias(value_col)
    )
    return out
