"""Mergeable cardinality sketches (HLL, Apache DataSketches via
Spark's built-in ``hll_*`` functions).

Why sketches and not COUNT(DISTINCT): at 100 TB an exact distinct is
a full shuffle of every key occurrence; an HLL sketch is a few KB per
group, computed map-side, and — the property that matters — MERGEABLE:
sketch each partition/day once, store it, and answer any coarser
rollup (weekly, all-time) by unioning stored sketches without
re-reading data. That reaggregation is exactly how the engine's
multi-resolution rollups work for sums/means; HLL extends it to
distinct counts, which plain counters cannot reaggregate.

Determinism: DataSketches HLL has no RNG — same input multiset (in
any order, any partitioning) → identical registers → identical
estimate. So merged-daily == direct on the same data, asserted in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_col: str, value_col: str, lgk: int = 12
) -> DataFrame:
    """Distinct ``value_col`` per ``group_col``, estimated from one
    HLL sketch per group (map-side partial sketches, tiny shuffle)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lgk))
        ).alias("approx_distinct")
    )


def approx_distinct_reagg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_expr,
    lgk: int = 12,
) -> DataFrame:
    """The two-level path a warehouse actually runs: sketch per
    (group, bucket) — e.g. per day, stored alongside the rollup
    tables — then union sketches per group. Identical estimates to
    :func:`approx_distinct` on the same data (HLL union is exact on
    registers), so pre-sketching costs no accuracy."""
    daily = df.groupBy(F.col(group_col), bucket_expr.alias("_bucket")).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("_sk")
    )
    return daily.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
            "approx_distinct"
        )
    )
