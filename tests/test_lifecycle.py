"""The complete ceres maintenance lifecycle, end-to-end through the
warehouse API: store fine data → rollup to a coarse archive → expire
fine history → cross-resolution fetch spanning the horizon.

This is the integration of ops #8, #13, #17-18, #21 that the
reference runs as carbon-write + ceres-maintenance + graphite-read.
"""

from pyspark.sql import functions as F

import ceres_spark.operators.compact as cp
import ceres_spark.operators.retention as ret
from ceres_spark.tree import CeresTree

DAY = 86400


def test_full_maintenance_lifecycle(spark, tmp_path):
    tree = CeresTree.create_tree(spark, str(tmp_path))
    tree.create_node("srv.cpu", timeStep=60, aggregationMethod="average")

    # 2 "days" of minute data, value = minute index
    rows = [(t, float(t // 60)) for t in range(0, 2 * DAY, 60)]
    tree.store("srv.cpu", spark.createDataFrame(rows, "ts long, value double"))

    # maintenance: rollup day 1 (ts < DAY) into a 3600s archive...
    fine = cp.lww_dedup(tree.points(60))
    coarse = (
        ret.rollup(fine, "average", 60, 3600, until=DAY)
        .withColumn("arrival_seq", F.lit(0).cast("long"))
        .withColumn("date", F.to_date(F.timestamp_seconds(F.col("ts"))))
    )
    coarse.write.mode("overwrite").partitionBy("date").parquet(
        tree.points_path(3600)
    )
    # ...then expire the fine data older than the horizon
    ret.expire_path(spark, tree.points_path(60), DAY, 60)
    tree.clear_slice_cache(60)

    assert tree.resolutions() == [60, 3600]
    fine_left = tree.points(60)
    assert fine_left.agg(F.min("ts")).collect()[0][0] == DAY  # expired

    # fetch spanning the horizon: result at the coarse step (3600),
    # day-1 values from the archive, day-2 downsampled from fine
    out = tree.read_multi("srv.cpu", 0, 2 * DAY)
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert len(got) == 48  # dense: 48 hourly buckets
    # hour bucket h of day 1 (archive): avg of minutes h*60..h*60+59
    assert got[0] == sum(range(0, 60)) / 60
    assert got[5 * 3600] == sum(range(300, 360)) / 60
    # hour bucket of day 2 (downsampled fine data)
    h25 = range(25 * 60, 26 * 60)
    assert got[25 * 3600] == sum(h25) / 60
    # no gaps anywhere (continuous data)
    assert all(v is not None for v in got.values())


def test_lifecycle_fetch_before_any_rollup(spark, tmp_path):
    tree = CeresTree.create_tree(spark, str(tmp_path))
    tree.create_node("m", timeStep=60)
    tree.store("m", spark.createDataFrame([(60, 1.0)], "ts long, value double"))
    out = {r["ts"]: r["value"] for r in tree.read_multi("m", 0, 180).collect()}
    assert out == {0: None, 60: 1.0, 120: None}


def test_slices_inventory(spark, tmp_path):
    # op #15: inventory rows per (resolution, date), newest date first
    tree = CeresTree.create_tree(spark, str(tmp_path))
    tree.create_node("m", timeStep=60)
    tree.store("m", spark.createDataFrame(
        [(60, 1.0), (DAY + 60, 2.0)], "ts long, value double"))
    inv = tree.slices().collect()
    assert [(r["step"], r["date"]) for r in inv] == [
        (60, "1970-01-02"), (60, "1970-01-01")]
    assert all(r["n_files"] >= 1 and r["n_rows"] == 1 for r in inv)
