"""Range join: containment semantics + binned-vs-naive equivalence."""

import ceres_spark.operators.range_join as rj
from pyspark.sql import functions as F


def frames(spark):
    probe = spark.createDataFrame(
        [(1, 5.0), (2, 49.9), (3, 50.0), (4, 119.0), (5, 250.0)],
        "id long, v double",
    )
    build = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 250.0)],
        "band string, lo double, hi double",
    )
    return probe, build


def test_containment_bounds(spark):
    probe, build = frames(spark)
    out = rj.range_join(probe, build, "v")
    got = {r["id"]: r["band"] for r in out.collect()}
    # lo inclusive, hi exclusive; 250.0 falls outside every band
    assert got == {1: "low", 2: "low", 3: "mid", 4: "mid"}


def test_binned_equals_naive(spark):
    probe, build = frames(spark)
    naive = {(r["id"], r["band"]) for r in rj.range_join(probe, build, "v").collect()}
    binned = {
        (r["id"], r["band"])
        for r in rj.range_join(probe, build, "v", bin_width=30).collect()
    }
    assert naive == binned


def test_binned_on_real_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    build = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 250.0)],
        "band string, lo double, hi double",
    )
    a = rj.range_join(ev, build, "value").groupBy("band").count().collect()
    b = (
        rj.range_join(ev, build, "value", bin_width=50.0)
        .groupBy("band")
        .count()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["count"] for r in a) > 0
