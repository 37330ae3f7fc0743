"""Metric catalog — the Spark-native replacement for per-directory
``.ceres-node`` JSON metadata files.

Reference: each CeresNode directory holds a free-form JSON dict with
engine-known keys ``timeStep`` (int, default 60), ``aggregationMethod``
(default 'average'), plus rollup conventions ``retentions`` /
``xFilesFactor`` (ceres.py ≈L430 readMetadata / ≈L450 writeMetadata).
Millions of tiny metadata files is the known ceres failure mode; here
the whole catalog is ONE small DataFrame — broadcastable, cacheable,
and joinable against the fact table without a shuffle.

``find`` (op #12) = glob→regex + rlike; the optional interval filter
(CeresTree.find's fromTime/untilTime args, ≈L240) is a semi-join
against per-metric extents, mirroring hasDataForInterval (≈L500).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ceres_spark.plans.glob import (
    expand_braces,
    glob_to_regex,
    glob_to_regex_body,
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("timeStep", T.IntegerType(), False),
        T.StructField("aggregationMethod", T.StringType(), False),
        T.StructField(
            "retentions", T.ArrayType(T.ArrayType(T.IntegerType())), True
        ),
        T.StructField("xFilesFactor", T.DoubleType(), True),
    ]
)

#: default metadata, as in CeresNode.create (ceres.py ≈L360)
DEFAULTS = {"timeStep": 60, "aggregationMethod": "average"}


def make_catalog(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a catalog DataFrame from metadata dicts (node create,
    op #2). Unknown JSON keys are dropped — the engine only ever read
    the keys modeled here.

    Built as a pure-JVM literal plan (``inline`` over a struct-array
    literal), NOT ``spark.createDataFrame(list_of_dicts)``
    (optimization r13, guide §4.1): the list form is a Python-RDD-
    backed relation that spins ``defaultParallelism`` pickled-row
    Python tasks every time the catalog is evaluated — 32 Python
    worker round-trips to materialize a handful of metadata rows,
    and the cost SCALES WITH CORE COUNT (the expire_catalog 32-vs-8
    inversion in PERF_r12's scaling block). The literal plan
    evaluates driver/JVM-side with zero Python tasks at any core
    count. Same schema, same rows, same nullability.
    """
    from ceres_spark.sources.tables import local_rows

    filled = [
        (
            str(r["metric"]),
            int(r.get("timeStep", DEFAULTS["timeStep"])),
            str(r.get("aggregationMethod", DEFAULTS["aggregationMethod"])),
            r.get("retentions"),
            None
            if r.get("xFilesFactor") is None
            else float(r["xFilesFactor"]),
        )
        for r in rows
    ]
    return local_rows(spark, filled, CATALOG_SCHEMA)


def catalog_from_points(points: DataFrame) -> DataFrame:
    """Derive a catalog from observed metrics (distinct is a map-side
    combinable agg on a low-cardinality key)."""
    return points.select("metric").distinct().select(
        "metric",
        F.lit(60).alias("timeStep"),
        F.lit("average").alias("aggregationMethod"),
        F.lit(None).cast(CATALOG_SCHEMA["retentions"].dataType).alias("retentions"),
        F.lit(None).cast("double").alias("xFilesFactor"),
    )


def find(
    catalog: DataFrame,
    pattern: str,
    points: DataFrame | None = None,
    from_time: int | None = None,
    until_time: int | None = None,
    braces: bool = False,
) -> DataFrame:
    """Glob metric discovery (op #12) with optional interval filter.

    Returns matching catalog rows. When an interval is given, keeps
    only metrics whose data extent overlaps it (LEFT SEMI join against
    per-metric min/max — no data columns move through the join).

    ``braces=True`` opts into graphite-web-layer ``{a,b}`` alternative
    expansion (NOT a ceres semantic — the reference's find is
    fnmatch-only; see plans/glob.py): the pattern is pre-expanded and
    the alternatives' regexes unioned into ONE anchored rlike, still a
    single catalog scan.
    """
    pats = expand_braces(pattern) if braces else [pattern]
    if len(pats) == 1:
        rx = glob_to_regex(pats[0])
    else:
        rx = "^(?:" + "|".join(
            glob_to_regex_body(p) for p in pats
        ) + ")$"
    matched = catalog.filter(F.col("metric").rlike(rx))
    if points is not None and (from_time is not None or until_time is not None):
        extents = points.groupBy("metric").agg(
            F.min("ts").alias("_min_ts"), F.max("ts").alias("_max_ts")
        )
        cond = F.lit(True)
        if until_time is not None:
            cond = cond & (F.col("_min_ts") < F.lit(int(until_time)))
        if from_time is not None:
            cond = cond & (F.col("_max_ts") >= F.lit(int(from_time)))
        live = extents.filter(cond).select("metric")
        matched = matched.join(live, "metric", "left_semi")
    return matched
