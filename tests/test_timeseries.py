"""TimeSeriesData wrapper — mirrors the reference's
TimeSeriesDataTest (tests/test_ceres.py)."""

from ceres_spark.timeseries import TimeSeriesData


def test_timestamps_and_iteration():
    ts = TimeSeriesData(0, 180, 60, [1.0, None, 3.0])
    assert list(ts.timestamps) == [0, 60, 120]
    assert list(ts) == [(0, 1.0), (60, None), (120, 3.0)]


def test_merge_fills_only_holes_self_wins():
    a = TimeSeriesData(0, 180, 60, [1.0, None, 3.0])
    b = TimeSeriesData(0, 240, 60, [9.0, 2.0, 9.0, 9.0])  # 180 out of range
    a.merge(b)
    assert a.values == [1.0, 2.0, 3.0]


def test_merge_drops_out_of_range():
    a = TimeSeriesData(60, 120, 60, [None])
    b = TimeSeriesData(0, 240, 60, [0.0, 1.0, 2.0, 3.0])
    a.merge(b)
    assert a.values == [1.0]


def test_from_dense_df(spark):
    import ceres_spark.operators.series as ser

    pts = spark.createDataFrame(
        [("m", 60, 5.0, 0)], "metric string, ts long, value double, arrival_seq long"
    )
    metrics = spark.createDataFrame([("m",)], "metric string")
    dense = ser.read_series(pts, metrics, 0, 180, 60, "average")
    ts = TimeSeriesData.from_dense_df(dense, 0, 180, 60, metric="m")
    assert ts.values == [None, 5.0, None]
    assert list(ts.timestamps) == [0, 60, 120]
