"""Join strategies for scale: salted skew joins and bucketed
co-located joins.

These are the two knobs SURVEY.md's scale mandate calls out beyond
broadcast (which relational.py uses everywhere a dim fits):

- **Salting** defeats hot-key skew that AQE's skew-join splitting
  can't fully fix (e.g. one metric is 50% of all points and the
  OTHER side must replicate). The hot side gets a random-but-
  deterministic salt in [0, salt); the small side is exploded
  ``salt``× so every salted key finds its match. Join key becomes
  (key, salt) → the hot key spreads over ``salt`` reducers.
- **Bucketing** pre-shuffles both fact tables into the same bucket
  layout on the join key, so repeated joins (the common case for
  orders⋈lineitem-shaped workloads) pay ZERO exchange at query time
  — the write amortizes the shuffle once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big (skewed) side, explode the
    small side ``salt``×. Deterministic salt (hash of the full row's
    key + a per-row uniform from xxhash64 of all columns would be
    overkill — a hash of monotonically varying payload is enough;
    here we use pmod(xxhash64(all cols), salt) so re-runs agree)."""
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn("_salt", salt_col.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize a fact table bucketed (and optionally sorted) by
    the join key. Subsequent equi-joins between tables bucketed the
    same way need no exchange — and with sorted buckets, no sort.

    Idempotent across SESSIONS, not just runs: the in-memory catalog
    forgets managed tables when a session ends but their warehouse
    directories persist, and `mode("overwrite")` on an uncatalogued
    table raises LOCATION_ALREADY_EXISTS — so drop both the catalog
    entry and any stale directory first."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh and wh.startswith(("file:", "/")):
        loc = wh.removeprefix("file:").rstrip("/")
        shutil.rmtree(f"{loc}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables — the plan should show
    SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def bucketed_series_windows(
    spark: SparkSession, points: DataFrame, table: str = "bp_points"
) -> DataFrame:
    """The time-series-warehouse version of the bucketing payoff:
    points written bucketed by ``metric`` satisfy every
    ``Window.partitionBy(metric)`` distribution requirement, so the
    per-series function library (derivative / moving average /
    running integral — series.series_functions) runs with ZERO
    Exchange at query time. At 100 TB this is the difference between
    re-shuffling the whole corpus per dashboard query and paying the
    shuffle once at ingest; the write is the same one the streaming
    ingest path already performs per micro-batch.

    Result-invariance is the oracle contract (same rows as the
    unbucketed plan); the no-Exchange-before-Window property is
    plan-asserted in tests/test_plans.py.
    """
    from ceres_spark.operators.series import series_functions

    write_bucketed(points, table, "metric", buckets=8, sort=False)
    return series_functions(spark.table(table))
