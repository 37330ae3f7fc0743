"""As-of join semantics on hand-built frames."""

import ceres_spark.operators.asof as ao


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("u", 5, 0.5), ("v", 10, 9.0)],
        "user string, ts long, value double",
    )
    right = spark.createDataFrame(
        [("u", 7, 100.0), ("u", 15, 200.0), ("w", 1, 999.0)],
        "user string, ts long, rv double",
    )
    out = ao.asof_join(left, right, by="user", value_cols=("rv",))
    got = {(r["user"], r["ts"]): r["rv_asof"] for r in out.collect()}
    assert got == {
        ("u", 5): None,      # no right row at or before 5
        ("u", 10): 100.0,    # latest right ≤ 10 is ts=7
        ("u", 20): 200.0,    # latest right ≤ 20 is ts=15
        ("v", 10): None,     # no right rows for v at all
    }


def test_asof_equal_ts_is_visible(spark):
    left = spark.createDataFrame([("u", 10, 1.0)], "user string, ts long, value double")
    right = spark.createDataFrame([("u", 10, 7.0)], "user string, ts long, rv double")
    out = ao.asof_join(left, right, by="user", value_cols=("rv",)).collect()
    assert out[0]["rv_asof"] == 7.0  # <= semantics (DuckDB ASOF default)


def test_asof_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [("u", 10, 1.0, "x")], "user string, ts long, value double, tag string"
    )
    right = spark.createDataFrame([("u", 3, 5.0)], "user string, ts long, rv double")
    row = ao.asof_join(left, right, by="user", value_cols=("rv",)).collect()[0]
    assert row["tag"] == "x" and row["value"] == 1.0 and row["rv_asof"] == 5.0
