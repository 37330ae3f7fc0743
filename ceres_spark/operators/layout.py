"""Data-layout optimization: Z-order (Morton) clustering keys.

Why: parquet pruning is per-column min/max. A layout sorted by one
dimension (time) gives perfect pruning on time and none on metric; a
layout sorted by the Z-ORDER interleaving of both dimensions gives
good pruning on EITHER predicate — each file covers a small square of
the (metric-bucket, time-bucket) plane instead of a full-width time
stripe. At 100 TB this is the difference between a single-metric
fetch reading one stripe of every file and reading a handful of
files. Delta/Iceberg expose this as OPTIMIZE ZORDER BY; on plain
parquet the same effect is one ``repartitionByRange(zkey)`` +
sorted write away.

Everything here is pure 64-bit integer math (shift/mask/or — the
standard magic-number bit spreading), so the key column is
engine-portable bit-for-bit and the registry entry hash-checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic masks for 16-bit → 32-bit even-position spreading
_SPREAD_MASKS = (
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

MAX_DIM = 1 << 16  # per-dimension bucket cardinality contract


def _spread_bits(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` to the even bit positions of a
    long (0b1011 → 0b01000101): 4 shift-or-mask steps, all inside
    whole-stage codegen."""
    for sh, mask in _SPREAD_MASKS:
        v = v.bitwiseOR(F.shiftleft(v, sh)).bitwiseAND(F.lit(mask))
    return v


def morton_key(x: Column, y: Column) -> Column:
    """64-bit Morton (Z-order) code of two bucket ids in
    [0, 2^16): x takes the even bit positions, y the odd. Adjacent
    codes are adjacent squares on the (x, y) plane — the locality
    property range-partitioning inherits.

    Inputs are masked to 16 bits (the caller buckets real values —
    see :func:`zorder_points`); the result stays < 2^32, so it is
    always a positive BIGINT and range-orders identically in every
    engine."""
    lo = F.lit(MAX_DIM - 1)
    return _spread_bits(x.bitwiseAND(lo)).bitwiseOR(
        F.shiftleft(_spread_bits(y.bitwiseAND(lo)), 1)
    )


def zorder_points(
    points: DataFrame,
    metric_buckets: int = 4096,
    time_bucket_s: int = 86400,
) -> DataFrame:
    """Z-order clustering key for the points table: dimension 1 is a
    portable hash bucket of the metric (md5-low31 mod
    ``metric_buckets`` — stable across engines and runs, unlike
    hashCode-style hashes), dimension 2 the day index mod 2^16.
    Output: ``metric, ts, value, zkey``.

    The write path is then
    ``df.repartitionByRange(N, "zkey").sortWithinPartitions("zkey")``
    — each output file covers a compact square of (metric-bucket,
    day) space, so BOTH a one-metric fetch and a one-day scan prune
    most files from min/max stats. tests/test_plans.py pins the
    locality property (per-range-partition cell spread ≪ random
    layout)."""
    from ceres_spark.operators.dedup import _md5_low31

    mb = int(metric_buckets)
    if mb > MAX_DIM:
        raise ValueError(f"metric_buckets must be <= {MAX_DIM}")
    x = _md5_low31(F.col("metric")) % F.lit(mb)
    # integer DIV, never `/`: double division rounds near bucket
    # boundaries and the truncating cast would mis-bucket there
    y = F.expr(f"ts DIV {int(time_bucket_s)}") % F.lit(MAX_DIM)
    return points.select(
        "metric", "ts", "value", morton_key(x, y).alias("zkey")
    )
