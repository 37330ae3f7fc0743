"""HLL sketch distinct counts: accuracy vs exact, and the mergeability
invariant (daily sketches unioned == one-shot sketch)."""

import pytest
from pyspark.sql import functions as F

import ceres_spark.operators.sketches as sk
import ceres_spark.sources.tables as tbl

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return tbl.load(spark, "events", SF_DIR)


def test_estimate_within_hll_error(spark, events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sk.approx_distinct(events, "event_type", "user_id").collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # lgk=12 → relative standard error ~1.6%; 5% is > 3 sigma
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


def test_merged_daily_equals_direct(spark, events):
    direct = sk.approx_distinct(events, "event_type", "user_id")
    merged = sk.approx_distinct_reagg(
        events, "event_type", "user_id",
        F.to_date(F.timestamp_seconds(F.col("ts") / 1_000_000_000)),
    )
    d = {r["event_type"]: r["approx_distinct"] for r in direct.collect()}
    m = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    assert d == m  # HLL union is register-exact: pre-bucketing is free


def test_partitioning_independent(spark, events):
    a = sk.approx_distinct(events, "event_type", "user_id")
    b = sk.approx_distinct(
        events.repartition(7, "user_id"), "event_type", "user_id"
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
