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
        F.to_date(F.timestamp_seconds(
            tbl.epoch_seconds(events.schema["ts"].dataType)
        )),
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


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    import ceres_spark.operators.sketches as sk
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type").alias("metric"), "value"
    )
    est = {
        r["metric"]: (r["p50_est"], r["p95_est"])
        for r in sk.histogram_quantiles(
            ev, "metric", "value", qs=(0.5, 0.95), bin_width=1.0
        ).collect()
    }
    # the sketch targets the CDF-inverse quantile (smallest v whose
    # cumulative count reaches q·n) — error ≤ bin_width vs THAT order
    # statistic. (The interpolated `percentile` can sit in a data gap
    # wider than a bin, so it is not the right yardstick.)
    import math

    by_metric = {}
    for r in ev.collect():
        by_metric.setdefault(r["metric"], []).append(r["value"])
    for m, vals in by_metric.items():
        vals.sort()
        n = len(vals)
        for q, got in zip((0.5, 0.95), est[m]):
            v_rank = vals[math.ceil(q * n) - 1]
            assert got == math.floor(v_rank) + 1.0, (m, q)
            assert abs(got - v_rank) <= 1.0, (m, q)


def test_histogram_sketch_is_merge_exact(spark):
    import ceres_spark.operators.sketches as sk
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = raw.select(
        F.col("event_type").alias("metric"), "value",
        F.timestamp_seconds(
            tbl.epoch_seconds(raw.schema["ts"].dataType)
        ).alias("t"),
    )
    # direct histogram == union of per-day histograms re-summed
    direct = {
        (r["metric"], r["bin"]): r["bin_count"]
        for r in sk.histogram_sketch(ev, "metric", "value").collect()
    }
    daily = ev.withColumn("day", F.to_date("t"))
    per_day = daily.groupBy(
        "metric", "day", F.floor(F.col("value") / 1.0).alias("bin")
    ).agg(F.count("*").alias("c"))
    merged = {
        (r["metric"], r["bin"]): r["bc"]
        for r in per_day.groupBy("metric", "bin").agg(
            F.sum("c").alias("bc")
        ).collect()
    }
    assert direct == merged


def test_frequent_items_exact_at_capacity(spark):
    import ceres_spark.operators.sketches as sk
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r["item"]: (r["count_min"], r["count_max"])
           for r in sk.frequent_items(ev, "event_type", k=10,
                                      capacity=1000).collect()}
    want = {r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count("*").alias("n")).collect()}
    # capacity >= distinct ⇒ sketch degenerates to exact counts
    assert got == {it: (n, n) for it, n in want.items()}


def test_frequent_items_bounds_contain_truth_under_pressure(spark):
    import ceres_spark.operators.sketches as sk
    from pyspark.sql import functions as F

    # 3 heavy items + long tail, tiny capacity
    rows = ([("hot%d" % i,) for i in range(3) for _ in range(200)]
            + [("tail%d" % i,) for i in range(150)])
    df = spark.createDataFrame(rows, "item_key string").repartition(4)
    out = {r["item"]: (r["count_min"], r["count_max"])
           for r in sk.frequent_items(df, "item_key", k=5,
                                      capacity=8).collect()}
    # guarantee: every item with freq > n/capacity is tracked and its
    # true count lies inside [count_min, count_max]
    for i in range(3):
        lo, hi = out["hot%d" % i]
        assert lo <= 200 <= hi, out


def test_frequent_items_exact_when_capacity_equals_distinct(spark):
    # regression: a FULL table with zero evictions must keep theta=0,
    # i.e. capacity == per-partition distinct is still EXACT
    import ceres_spark.operators.sketches as sk
    from pyspark.sql import functions as F

    rows = [("k%d" % (i % 8),) for i in range(400)]
    df = spark.createDataFrame(rows, "item_key string").repartition(4)
    got = {r["item"]: (r["count_min"], r["count_max"])
           for r in sk.frequent_items(df, "item_key", k=8,
                                      capacity=8).collect()}
    assert got == {("k%d" % i): (50, 50) for i in range(8)}


def test_frequent_items_counts_null_keys(spark):
    # NULL keys are a group, matching SQL GROUP BY semantics
    import ceres_spark.operators.sketches as sk

    rows = [("a",)] * 5 + [(None,)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(rows, "item_key string").repartition(2)
    got = {r["item"]: (r["count_min"], r["count_max"])
           for r in sk.frequent_items(df, "item_key", k=5,
                                      capacity=16).collect()}
    assert got == {"a": (5, 5), None: (7, 7), "b": (3, 3)}


def test_kmv_exact_below_capacity(spark):
    # fewer distinct values than k -> the sketch IS the exact count
    rows = [("a", v) for v in range(40)] + [("a", v) for v in range(40)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = sk.kmv_distinct(df, "g", "v", k=64).collect()
    assert len(out) == 1
    assert out[0]["n_tracked"] == 40
    assert out[0]["est_distinct"] == 40.0


def test_kmv_estimate_within_error(spark, events):
    # full sketch: |est/exact - 1| within ~3/sqrt(k) (k=64 -> 37%;
    # observed much tighter, the bound is the 3-sigma envelope)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    got = sk.kmv_distinct(events, "event_type", "user_id", k=64).collect()
    for r in got:
        rel = abs(r["est_distinct"] / exact[r["event_type"]] - 1)
        assert rel < 3 / 64 ** 0.5, (r["event_type"], rel)
        assert r["n_tracked"] == 64


def test_kmv_two_phase_equals_global_kmin(spark):
    # the salted two-phase k-min must equal a pure-Python global k-min
    # over the same portable hashes (mergeability made concrete)
    import hashlib

    vals = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v string"
    )

    def low31(s):
        d = hashlib.md5(s.encode()).digest()
        return int.from_bytes(d[8:16], "little") & 0x7FFFFFFF

    hs = sorted({low31(v) for v in vals})
    k = 16
    expect_hk = hs[k - 1]
    expect_est = (k - 1) * float(1 << 31) / expect_hk
    out = sk.kmv_distinct(df, "g", "v", k=k).collect()
    assert out[0]["n_tracked"] == k
    assert out[0]["est_distinct"] == expect_est


def test_kmv_partitioning_independent(spark, events):
    a = sk.kmv_distinct(events, "event_type", "user_id").collect()
    b = sk.kmv_distinct(
        events.repartition(17, "user_id"), "event_type", "user_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_overlap_exact_when_unfull(spark):
    # all sets below capacity -> union exact, jaccard exact ->
    # est_intersection == true intersection
    rows = ([("a", v) for v in range(30)]
            + [("b", v) for v in range(20, 50)]
            + [("c", v) for v in range(100, 110)])
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r["type_a"], r["type_b"]): r for r in
           sk.kmv_overlap(df, "g", "v", k=64).collect()}
    ab = out[("a", "b")]
    assert ab["est_union"] == 50.0
    assert ab["jaccard_est"] == 10 / 50
    assert ab["est_intersection"] == (10 / 50) * 50.0
    assert out[("a", "c")]["est_intersection"] == 0.0
    assert out[("b", "c")]["jaccard_est"] == 0.0


def test_kmv_overlap_estimator_tracks_truth(spark, events):
    # full sketches on the real events table: every type pair shares
    # all 150 users, so jaccard must estimate ~1 and the intersection
    # must land within the KMV error envelope of 150
    out = sk.kmv_overlap(events, "event_type", "user_id", k=64).collect()
    assert len(out) == 10  # C(5,2)
    for r in out:
        assert r["jaccard_est"] > 0.8, r
        assert abs(r["est_intersection"] / 150 - 1) < 3 / 64 ** 0.5, r


def test_kmv_overlap_partitioning_independent(spark, events):
    a = sk.kmv_overlap(events, "event_type", "user_id").collect()
    b = sk.kmv_overlap(
        events.repartition(13, "event_id"), "event_type", "user_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_portable_registers_match_python_reference(spark):
    """Every register of the portable HLL equals a pure-Python
    recomputation (md5 low-64 LE word & 0x7FFFFFFF, low 8 bits
    bucket, 23-bit leading-zero rho) — the same derivation the
    external DuckDB oracle runs, pinned here at pytest granularity."""
    import hashlib
    import math

    vals = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val string"
    )
    regs = {}
    for v in vals:
        hv = (
            int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
            & 0x7FFFFFFF
        )
        bucket, w = hv % 256, hv // 256
        rho = 24 if w == 0 else 24 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(1 << (24 - r) for r in regs.values()) + (256 - len(regs)) * (
        1 << 24
    )
    v_zero = 256 - len(regs)
    checksum = sum((b + 1) * r for b, r in regs.items())
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 * 16777216.0 / s
    est = (
        256.0 * math.log(256.0 / v_zero)
        if raw <= 640.0 and v_zero > 0
        else raw
    )
    [row] = sk.hll_portable(df, "grp", "val").collect()
    assert row["n_zero_registers"] == v_zero
    assert row["register_sum_scaled"] == s
    assert row["register_checksum"] == checksum
    assert row["est_distinct"] == round(est, 4)
    assert abs(row["est_distinct"] - 500) / 500 < 0.20  # ~3 sigma at m=256


def test_hll_portable_two_level_equals_direct(spark, events):
    direct = sk.hll_portable(events, "event_type", "user_id")
    merged = sk.hll_portable(
        events, "event_type", "user_id",
        bucket_expr=F.to_date(F.timestamp_seconds(
            tbl.epoch_seconds(events.schema["ts"].dataType)
        )),
    )
    assert {tuple(r) for r in direct.collect()} == {
        tuple(r) for r in merged.collect()
    }  # register union is max: pre-bucketing is free, externally too


def test_hll_portable_partitioning_independent(spark, events):
    a = sk.hll_portable(events, "event_type", "user_id")
    b = sk.hll_portable(
        events.repartition(7, "user_id"), "event_type", "user_id"
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hll_lc_boundary_check_pins_fast_path():
    """The production m=256 linear-counting domain is boundary-clear,
    so hll_portable keeps the in-engine log (the cheap plan) and the
    oracle's Python literal table is an INDEPENDENT computation path
    the external hash check proves agreement with. If a Java/libm
    change ever lands a value near a .5 boundary, this pins the
    module to fall back to the shared-table form instead of going
    flaky."""
    assert sk.lc_engine_log_safe(256)
    # and the checker itself can refuse: an eps wider than any
    # possible fraction distance flags every m as unsafe
    assert not sk.lc_engine_log_safe(256, eps=0.5)


def test_hll_lc_table_matches_engine_log_everywhere(spark):
    """Both lc forms — in-engine round(m*log(m/V),4) and the Python
    literal table — agree on every possible V in 1..256, through the
    real Spark expression, not just in Python."""
    df = spark.range(1, 257).select(
        F.col("id").cast("bigint").alias("n_zero_registers")
    )
    engine = df.select(
        F.round(
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("n_zero_registers")),
            4,
        ).alias("x")
    ).collect()
    table = sk.hll_lc_table(256)
    assert [r["x"] for r in engine] == table


def test_hll_portable_estimate_accuracy_at_scale(spark):
    """Out of the linear-counting regime (n >> m): the raw HLL
    estimator lands within ~3 sigma (1.04/sqrt(256) = 6.5% RSE)."""
    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("val")
    )
    [row] = sk.hll_portable(df, "grp", "val").collect()
    assert abs(row["est_distinct"] - n) / n < 0.20
