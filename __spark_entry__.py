"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship dense-fetch at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL.

Determinism contract with the oracle: timestamps flow as epoch-second
BIGINTs (integer quantization only), and every double aggregate is
accumulated in DECIMAL(30,10) then cast to double (order-independent,
so Spark's partial aggregation and DuckDB's single-threaded scan
produce bit-identical doubles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import ceres_spark.catalog as cat
import ceres_spark.operators.aggregate as agg
import ceres_spark.operators.compact as cp
import ceres_spark.operators.resolution as res
import ceres_spark.operators.retention as ret
import ceres_spark.operators.series as ser
import ceres_spark.sources.tables as tbl

# events span 2024-01-01 → 2024-01-30 (UTC)
T0 = 1704067200  # 2024-01-01T00:00:00Z
DAY = 86400

# every oracle shares this derivation of the canonical points table
# (mirrors ceres_spark.sources.tables.points, FIXTURES.md §B.1)
POINTS_CTE = """
points AS (
  SELECT event_type AS metric,
         x - (x % 60) AS ts,
         value,
         event_id AS arrival_seq
  FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS x FROM events)
)
"""

DEC_AVG = "CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(value)"
DEC_SUM = "CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)"


# ---------------------------------------------------------------- queries

def _q_fetch_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #10+#14: ceres fetch — dense 1-day read at 1h step, avg."""
    pts = tbl.points(spark, sf_dir)
    metrics = pts.select("metric").distinct()
    return ser.read_series(pts, metrics, T0, T0 + DAY, 3600, "average")


def _q_quantize_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #16: write compaction — quantize to 600 s + LWW dedup."""
    pts = tbl.points(spark, sf_dir)
    return cp.compact(pts, 600)


def _q_agg_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #19: all five aggregation methods per metric over the
    LWW-deduped series."""
    deduped = cp.compact(tbl.points(spark, sf_dir), 60)
    return deduped.groupBy("metric").agg(
        agg.agg_expr("average").alias("avg_value"),
        agg.agg_expr("sum").alias("sum_value"),
        agg.agg_expr("last").alias("last_value"),
        agg.agg_expr("max").alias("max_value"),
        agg.agg_expr("min").alias("min_value"),
        F.count("value").alias("n_points"),
    )


def _q_aggregate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #20: aggregateSeries — downsample deduped 60 s series to
    300 s tumbling buckets, method=average."""
    deduped = cp.compact(tbl.points(spark, sf_dir), 60)
    return agg.aggregate_series(deduped, "average", 300)


def _q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #24: TimeSeriesData.merge — 'click' dense day-1 series,
    holes filled from 'view' (self wins, out-of-range dropped)."""
    pts = tbl.points(spark, sf_dir)
    a = ser.read_series(
        pts, pts.select("metric").filter(F.col("metric") == "click").distinct(),
        T0, T0 + DAY, 1800, "average",
    ).drop("metric")
    b = agg.aggregate_series(
        cp.quantize(pts.filter(F.col("metric") == "view"), 1800),
        "average", 1800, keys=[],
    )
    merged = a.join(b.withColumnRenamed("value", "_fill"), ["ts"], "left")
    return merged.select(
        "ts", F.coalesce("value", "_fill").alias("value")
    )


def _q_has_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #25: hasDataForInterval per metric for day 2."""
    pts = tbl.points(spark, sf_dir)
    return ser.has_data_for_interval(pts, T0 + DAY, T0 + 2 * DAY)


def _q_find_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #12: glob find '[cps]*' over the catalog (fnmatch class +
    star), returning matching metric names."""
    pts = tbl.points(spark, sf_dir)
    catalog = cat.catalog_from_points(pts)
    return cat.find(catalog, "[cps]*").select("metric")


def _q_delete_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #8: retention front-truncate at day 15 (cutoff quantized UP
    to the step grid like CeresSlice.deleteBefore ≈L835), then count
    survivors per metric."""
    cutoff = T0 + 15 * DAY + 17  # deliberately off-grid
    step = 60
    cutoff_q = cutoff + (-cutoff) % step  # quantize UP
    pts = tbl.points(spark, sf_dir).filter(F.col("ts") >= cutoff_q)
    return pts.groupBy("metric").agg(
        F.count("value").alias("n_points"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def _q_rollup_xff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #21: maintenance rollup 60 s → 3600 s with xFilesFactor=0.05
    (bucket kept only when ≥5% of its 60 expected points are known —
    ≥3 points; events are sparse, ~3 points/bucket on average)."""
    deduped = cp.compact(tbl.points(spark, sf_dir), 60)
    return ret.rollup(deduped, "average", 60, 3600, x_files_factor=0.05)


def _q_multi_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #13: cross-resolution read. Data older than day 20 lives only
    in a 300 s rollup archive; newer data in the 60 s table. A fetch of
    days 18-22 reconciles at the coarsest step touched (300 s),
    finest data winning where both cover a bucket."""
    horizon = T0 + 20 * DAY
    deduped = cp.compact(tbl.points(spark, sf_dir), 60)
    fine = deduped.filter(F.col("ts") >= horizon)
    coarse = ret.rollup(
        deduped.filter(F.col("ts") < horizon), "average", 60, 300
    )
    metrics = deduped.select("metric").distinct()
    return res.read_multi_resolution(
        {60: fine, 300: coarse},
        metrics,
        T0 + 18 * DAY,
        T0 + 22 * DAY,
        "average",
        result_step=300,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dense ceres fetch on sf0.001; driver checks rows>0."""
    return _q_fetch_dense(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fetch_dense": _q_fetch_dense,
        "quantize_lww": _q_quantize_lww,
        "agg_methods": _q_agg_methods,
        "aggregate_series": _q_aggregate_series,
        "merge_series": _q_merge,
        "rollup_xff": _q_rollup_xff,
        "multi_resolution": _q_multi_resolution,
        "has_data_for_interval": _q_has_data,
        "find_glob": _q_find_glob,
        "delete_before": _q_delete_before,
    }


def oracle_sql() -> dict[str, str]:
    t1 = T0 + DAY
    cutoff = T0 + 15 * DAY + 17
    cutoff_q = cutoff + (-cutoff) % 60
    return {
        "fetch_dense": f"""
WITH {POINTS_CTE},
agg AS (
  SELECT metric, ts - (ts % 3600) AS ts, {DEC_AVG} AS value
  FROM points WHERE ts >= {T0} AND ts < {t1}
  GROUP BY 1, 2
),
grid AS (
  SELECT m.metric, r.range AS ts
  FROM (SELECT DISTINCT metric FROM points) m
  CROSS JOIN range({T0}, {t1}, 3600) r
)
SELECT grid.metric, grid.ts, agg.value
FROM grid LEFT JOIN agg USING (metric, ts)
""",
        "quantize_lww": f"""
WITH {POINTS_CTE}
SELECT metric, ts - (ts % 600) AS ts,
       arg_max(value, arrival_seq) AS value
FROM points WHERE value IS NOT NULL
GROUP BY 1, 2
""",
        "agg_methods": f"""
WITH {POINTS_CTE},
deduped AS (
  SELECT metric, ts, arg_max(value, arrival_seq) AS value
  FROM points WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT metric,
       {DEC_AVG} AS avg_value,
       {DEC_SUM} AS sum_value,
       arg_max(value, ts) AS last_value,
       max(value) AS max_value,
       min(value) AS min_value,
       count(value) AS n_points
FROM deduped GROUP BY metric
""",
        "aggregate_series": f"""
WITH {POINTS_CTE},
deduped AS (
  SELECT metric, ts, arg_max(value, arrival_seq) AS value
  FROM points WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT metric, ts - (ts % 300) AS ts, {DEC_AVG} AS value
FROM deduped GROUP BY 1, 2
""",
        "merge_series": f"""
WITH {POINTS_CTE},
a_agg AS (
  SELECT ts - (ts % 1800) AS ts, {DEC_AVG} AS value
  FROM points WHERE metric = 'click' AND ts >= {T0} AND ts < {t1}
  GROUP BY 1
),
a AS (
  SELECT r.range AS ts, a_agg.value
  FROM range({T0}, {t1}, 1800) r LEFT JOIN a_agg ON a_agg.ts = r.range
),
b AS (
  SELECT ts - (ts % 1800) AS ts, {DEC_AVG} AS value
  FROM points WHERE metric = 'view' GROUP BY 1
)
SELECT a.ts, coalesce(a.value, b.value) AS value
FROM a LEFT JOIN b USING (ts)
""",
        "rollup_xff": f"""
WITH {POINTS_CTE},
deduped AS (
  SELECT metric, ts, arg_max(value, arrival_seq) AS value
  FROM points WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT metric, ts - (ts % 3600) AS ts, {DEC_AVG} AS value
FROM deduped GROUP BY 1, 2
HAVING count(value) / 60.0 >= 0.05
""",
        "multi_resolution": f"""
WITH {POINTS_CTE},
deduped AS (
  SELECT metric, ts, arg_max(value, arrival_seq) AS value
  FROM points WHERE value IS NOT NULL GROUP BY 1, 2
),
fine_agg AS (
  SELECT metric, ts - (ts % 300) AS ts, {DEC_AVG} AS value
  FROM deduped
  WHERE ts >= {T0 + 20 * DAY} AND ts >= {T0 + 18 * DAY} AND ts < {T0 + 22 * DAY}
  GROUP BY 1, 2
),
coarse AS (
  SELECT metric, ts - (ts % 300) AS ts, {DEC_AVG} AS value
  FROM deduped WHERE ts < {T0 + 20 * DAY} GROUP BY 1, 2
),
coarse_f AS (
  SELECT * FROM coarse WHERE ts >= {T0 + 18 * DAY} AND ts < {T0 + 22 * DAY}
),
merged AS (
  SELECT metric, ts, coalesce(f.value, c.value) AS value
  FROM fine_agg f FULL OUTER JOIN coarse_f c USING (metric, ts)
),
grid AS (
  SELECT m.metric, r.range AS ts
  FROM (SELECT DISTINCT metric FROM points) m
  CROSS JOIN range({T0 + 18 * DAY}, {T0 + 22 * DAY}, 300) r
)
SELECT grid.metric, grid.ts, merged.value
FROM grid LEFT JOIN merged USING (metric, ts)
""",
        "has_data_for_interval": f"""
WITH {POINTS_CTE}
SELECT metric,
       (min(ts) < {T0 + 2 * DAY} AND max(ts) >= {t1}) AS has_data
FROM points GROUP BY metric
""",
        "find_glob": f"""
WITH {POINTS_CTE}
SELECT DISTINCT metric FROM points
WHERE regexp_matches(metric, '^[cps][^.]*$')
""",
        "delete_before": f"""
WITH {POINTS_CTE}
SELECT metric, count(value) AS n_points,
       min(ts) AS min_ts, max(ts) AS max_ts
FROM points WHERE ts >= {cutoff_q}
GROUP BY metric
""",
    }
