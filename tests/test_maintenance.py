"""Retention / rollup / defrag / multi-resolution reconciliation
(ops #8, #13, #21-22)."""

import os

from pyspark.sql import functions as F

import ceres_spark.operators.resolution as res
import ceres_spark.operators.retention as ret

PTS = "metric string, ts long, value double"


def df(spark, rows, schema=PTS):
    return spark.createDataFrame(rows, schema)


def test_quantize_up():
    assert ret.quantize_up(100, 60) == 120
    assert ret.quantize_up(120, 60) == 120


def test_delete_before_quantizes_up(spark):
    d = df(spark, [("m", 60, 1.0), ("m", 120, 2.0), ("m", 180, 3.0)])
    out = {r["ts"] for r in ret.delete_before(d, 61, 60).collect()}
    assert out == {120, 180}  # cutoff 61 → 120


def test_rollup_xfilesfactor(spark):
    # 300s bucket expects 5 points at 60s; xff=0.5 needs >=3 known
    rows = [("m", t, 1.0) for t in (0, 60, 120)]  # 3/5 known in bucket 0
    rows += [("m", 300, 2.0)]  # 1/5 known in bucket 300
    out = ret.rollup(df(spark, rows), "average", 60, 300, x_files_factor=0.5)
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got == {0: 1.0}  # bucket 300 dropped by xff


def test_rollup_until_horizon(spark):
    rows = [("m", 0, 1.0), ("m", 300, 2.0), ("m", 600, 3.0)]
    out = ret.rollup(df(spark, rows), "sum", 60, 300, until=600)
    assert {r["ts"] for r in out.collect()} == {0, 300}


def test_expire_path_drops_old_partitions(spark, tmp_path):
    path = str(tmp_path / "pts")
    d = df(spark, [("m", 0, 1.0), ("m", 86400 * 3, 2.0)]).withColumn(
        "date", F.to_date(F.timestamp_seconds(F.col("ts")))
    )
    d.write.partitionBy("date").parquet(path)
    ret.expire_path(spark, path, 86400, 60)
    left = spark.read.parquet(path).select("ts").collect()
    assert {r["ts"] for r in left} == {86400 * 3}
    assert not any("1970-01-01" in p for p in os.listdir(path))


def test_compact_files(spark, tmp_path):
    path = str(tmp_path / "pts")
    df(spark, [("m", t, float(t)) for t in range(0, 6000, 60)]).repartition(
        16
    ).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    ret.compact_files(spark, path, target_partitions=1)
    after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert after < before and after == 1
    assert spark.read.parquet(path).count() == 100


def test_multi_resolution_reconciliation(spark):
    # coarse archive covers [0, 1200); fine covers [600, 1200).
    # read [0, 1200) → result at coarse step 300, fine data wins where
    # present (reference op #13: newest/finest first, re-agg to coarse).
    fine = df(spark, [("m", t, 1.0) for t in range(600, 1200, 60)])
    coarse = df(spark, [("m", t, 50.0) for t in range(0, 1200, 300)])
    metrics = spark.createDataFrame([("m",)], "metric string")
    out = res.read_multi_resolution(
        {60: fine, 300: coarse}, metrics, 0, 1200, "average"
    )
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got == {0: 50.0, 300: 50.0, 600: 1.0, 900: 1.0}


def test_choose_resolution(spark):
    fine = df(spark, [("m", 900, 1.0)])
    coarse = df(spark, [("m", 0, 2.0)])
    tables = {60: fine, 300: coarse}
    # range touches coarse → coarsest wins
    assert res.choose_resolution(tables, 0, 1200) == 300
    # range touches only fine → fine step
    assert res.choose_resolution(tables, 600, 1200) == 60


def test_rollup_catalog_equals_rollup_per_node(spark):
    # VERDICT r3 #8: the catalog-JOIN dispatch must be bit-equal to
    # the CASE-chain rollup under equivalent per-node config
    import ceres_spark.catalog as cat

    rows = []
    for m, mult in (("a.cpu", 1.0), ("a.mem", 2.0), ("b.net", 3.0)):
        rows += [(m, t, mult * t) for t in range(0, 7200, 60)]
    pts = df(spark, rows)
    catalog = cat.make_catalog(
        spark,
        [
            {"metric": "a.cpu", "timeStep": 60,
             "aggregationMethod": "max",
             "retentions": [[60, 86400], [300, 604800]]},
            {"metric": "a.mem", "timeStep": 60,
             "aggregationMethod": "sum",
             "retentions": [[60, 86400], [600, 604800]]},
            {"metric": "b.net", "timeStep": 60},  # defaults
        ],
    )
    got = ret.rollup_catalog(
        pts, catalog, default_step=3600, default_method="average"
    )
    want = ret.rollup_per_node(
        pts,
        step_by_metric={"a.cpu": 300, "a.mem": 600},
        method_by_metric={"a.cpu": "max", "a.mem": "sum"},
        default_step=3600,
        default_method="average",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_maintenance_run_is_one_dataframe_job(spark, tmp_path):
    # the dispatch itself must not iterate nodes on the driver: the
    # plugin sees whole frames and returns one plan
    from ceres_spark.tree import CeresTree

    root = str(tmp_path / "tree")
    tree = CeresTree.create_tree(spark, root)
    tree.create_node("x.one", timeStep=60)
    tree.create_node("x.two", timeStep=60, aggregationMethod="sum")
    tree.store(
        "x.one", df(spark, [(t, 1.0) for t in range(0, 600, 60)],
                    "ts long, value double")
    )
    tree.store(
        "x.two", df(spark, [(t, 2.0) for t in range(0, 600, 60)],
                    "ts long, value double")
    )
    calls = []

    def plugin(catalog, points):
        calls.append(1)
        return ret.rollup_catalog(points, catalog, default_step=300)

    out = tree.maintenance_run(plugin)
    assert len(calls) == 1  # one dispatch, not one per node
    got = {(r["metric"], r["ts"]): r["value"] for r in out.collect()}
    # x.two uses its own sum method; x.one the average default
    assert got[("x.two", 0)] == 2.0 * 5
    assert got[("x.one", 0)] == 1.0


def test_rollup_catalog_unknown_method_falls_to_default(spark):
    # review r4: unknown per-node method must use the DEFAULT method
    # (as documented), not silently average; a bad default raises
    import pytest

    import ceres_spark.catalog as cat

    pts = df(spark, [("m", t, 1.0) for t in range(0, 600, 60)])
    catalog = cat.make_catalog(
        spark, [{"metric": "m", "timeStep": 60,
                 "aggregationMethod": "median"}]  # unknown method
    )
    got = {r["ts"]: r["value"] for r in ret.rollup_catalog(
        pts, catalog, default_step=300, default_method="sum"
    ).collect()}
    assert got == {0: 5.0, 300: 5.0}  # sum, not average (1.0)
    with pytest.raises(KeyError):
        ret.rollup_catalog(pts, catalog, default_method="nope")


def test_cli_rollup_catalog_routes_mixed_steps(spark, tmp_path):
    # review r4: a mixed-resolution rollup must land each node's
    # buckets in the archive directory of ITS OWN step — and never
    # touch the raw step=60 archive
    import os

    import ceres_spark.cli as cli
    from ceres_spark.tree import CeresTree

    root = str(tmp_path / "t")
    tree = CeresTree.create_tree(spark, root)
    tree.create_node(
        "a.one", timeStep=60, aggregationMethod="sum",
        retentions=[[60, 86400], [300, 604800]],
    )
    tree.create_node("a.two", timeStep=60)  # falls to --new-step
    for m in ("a.one", "a.two"):
        tree.store(m, df(spark, [(t, 1.0) for t in range(0, 7200, 60)],
                         "ts long, value double"))
    assert cli.main(["maintenance", root, "--plugin", "rollup-catalog",
                     "--new-step", "3600"]) == 0
    pts_root = os.path.join(root, "points")
    assert os.path.exists(os.path.join(pts_root, "step=300"))
    assert os.path.exists(os.path.join(pts_root, "step=3600"))
    raw = spark.read.parquet(os.path.join(pts_root, "step=60"))
    assert raw.count() == 240  # untouched
    s300 = spark.read.parquet(os.path.join(pts_root, "step=300"))
    rows = {(r["metric"], r["ts"]): r["value"] for r in s300.collect()}
    assert set(m for m, _ in rows) == {"a.one"}       # only its node
    assert rows[("a.one", 0)] == 5.0                  # sum of 5 pts
    s3600 = spark.read.parquet(os.path.join(pts_root, "step=3600"))
    assert {r["metric"] for r in s3600.collect()} == {"a.two"}


def test_expire_catalog_per_node_horizons(spark):
    import ceres_spark.catalog as cat

    pts = df(spark, [("a", t, 1.0) for t in range(0, 7200, 60)]
             + [("b", t, 2.0) for t in range(0, 7200, 60)])
    catalog = cat.make_catalog(
        spark,
        [
            # horizon = max secondsOfHistory = 3600
            {"metric": "a", "timeStep": 60,
             "retentions": [[60, 1800], [300, 3600]]},
            {"metric": "b", "timeStep": 60},  # default horizon
        ],
    )
    out = ret.expire_catalog(pts, catalog, now=7200, default_horizon=600)
    got = {}
    for r in out.collect():
        got.setdefault(r["metric"], set()).add(r["ts"])
    assert min(got["a"]) == 3600 and max(got["a"]) == 7140  # 7200-3600
    assert min(got["b"]) == 6600  # 7200-600
    # cutoff quantizes UP: now=7230 → raw cut 3630 → 3660
    out2 = ret.expire_catalog(pts, catalog, now=7230, default_horizon=600)
    a2 = {r["ts"] for r in out2.collect() if r["metric"] == "a"}
    assert min(a2) == 3660


def test_catalog_ops_tolerate_empty_and_duplicate_rows(spark):
    # review r4 #2: empty retentions → default horizon, NOT horizon 0
    # (silent full expiry); duplicate catalog rows must not duplicate
    # points through the broadcast join
    import ceres_spark.catalog as cat

    pts = df(spark, [("m", t, 1.0) for t in range(0, 1200, 60)])
    empty_ret = cat.make_catalog(
        spark, [{"metric": "m", "timeStep": 60, "retentions": []}]
    )
    out = ret.expire_catalog(pts, empty_ret, now=1200, default_horizon=600)
    assert {r["ts"] for r in out.collect()} == set(range(600, 1200, 60))
    dup_cat = cat.make_catalog(
        spark,
        [{"metric": "m", "timeStep": 60, "aggregationMethod": "sum"},
         {"metric": "m", "timeStep": 60, "aggregationMethod": "sum"}],
    )
    assert ret.expire_catalog(
        pts, dup_cat, now=1200, default_horizon=600
    ).count() == 10  # not 20
    rolled = ret.rollup_catalog(pts, dup_cat, default_step=300,
                                default_method="sum").collect()
    got = {r["ts"]: r["value"] for r in rolled}
    assert got[0] == 5.0  # sum over 5 pts, not doubled to 10


def test_expire_path_drop_list_derived_from_data(spark, tmp_path):
    # r5: the drop list comes from distinct(partition_col), not a
    # local directory listing — a foreign (non-partition) file in the
    # table root must not confuse expiry, and multiple fully-expired
    # days all drop while the straddling day is rewritten in place
    path = str(tmp_path / "pts")
    rows = (
        [("m", 3600, 1.0), ("m", 7200, 2.0)]             # day 0: expired
        + [("m", 86400 + 60, 3.0)]                        # day 1: expired
        + [("m", 2 * 86400 + 60, 4.0),                    # day 2: straddles
           ("m", 2 * 86400 + 7200, 5.0)]
        + [("m", 3 * 86400 + 60, 6.0)]                    # day 3: untouched
    )
    d = df(spark, rows).withColumn(
        "date", F.to_date(F.timestamp_seconds(F.col("ts")))
    )
    d.write.partitionBy("date").parquet(path)
    (tmp_path / "pts" / "_FOREIGN").write_text("not a partition")
    ret.expire_path(spark, path, 2 * 86400 + 3600, 60)
    left = sorted(r["ts"] for r in spark.read.parquet(path).collect())
    assert left == [2 * 86400 + 7200, 3 * 86400 + 60]
    days = {p for p in os.listdir(path) if p.startswith("date=")}
    assert days == {"date=1970-01-03", "date=1970-01-04"}
    assert (tmp_path / "pts" / "_FOREIGN").exists()


def test_rollup_partials_merge_equals_direct_all_methods(spark):
    # finalize(merge(partials(A), partials(B))) must be bit-identical
    # to rollup(A ∪ B) for every ceres method — even when a coarse
    # bucket straddles A and B (the incremental-maintenance contract)
    rows = [("m", t, float(v)) for t, v in
            zip(range(0, 7200, 60), range(120))] + \
           [("n", 0, 5.5), ("n", 3660, 2.25)] + \
           [("g", 0, 5.0), ("g", 60, None), ("g", 120, None)]
    # metric "g": the bucket's LATEST rows carry NULL values (gap rows
    # from lww_dedup output) — 'last' must finalize to 5.0, the last
    # NON-null value, on both paths (ADVICE r5: the unguarded max_by
    # returned NULL on the incremental path)
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    a = df.filter("ts % 180 = 0")   # interleaved split within buckets
    b = df.filter("ts % 180 != 0")
    for method in ret.AGGREGATION_METHODS:
        direct = {(r["metric"], r["ts"]): r["value"] for r in
                  ret.rollup(df, method, 60, 3600).collect()}
        inc = {(r["metric"], r["ts"]): r["value"] for r in
               ret.rollup_finalize(
                   ret.rollup_merge(
                       ret.rollup_partials(a, 3600),
                       ret.rollup_partials(b, 3600),
                   ), method, 60, 3600,
               ).collect()}
        assert inc == direct, method


def test_rollup_partials_merge_is_associative(spark):
    rows = [("m", t, float(t % 7)) for t in range(0, 3600, 60)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    p = [ret.rollup_partials(df.filter(f"ts % 180 = {i * 60}"), 3600)
         for i in range(3)]
    left = ret.rollup_merge(ret.rollup_merge(p[0], p[1]), p[2])
    right = ret.rollup_merge(p[0], ret.rollup_merge(p[1], p[2]))
    get = lambda d: sorted(
        (r["metric"], r["ts"], str(r["_sum_dec"]), r["_cnt"],
         r["_vmin"], r["_vmax"], r["_last_ts"], r["_last_val"])
        for r in d.collect())
    assert get(left) == get(right)


def test_rollup_partials_xff_matches_direct(spark):
    # xff gate evaluates on the MERGED count, not per-partial counts
    rows = [("m", t, 1.0) for t in range(0, 360, 60)]  # 6 pts, 1 bucket
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    a, b = df.filter("ts < 180"), df.filter("ts >= 180")
    merged = ret.rollup_merge(
        ret.rollup_partials(a, 3600), ret.rollup_partials(b, 3600))
    # 6/60 = 0.1 known: kept at xff=0.1, dropped at 0.2 — same as direct
    assert ret.rollup_finalize(merged, "average", 60, 3600, 0.1).count() == 1
    assert ret.rollup_finalize(merged, "average", 60, 3600, 0.2).count() == 0
    assert ret.rollup(df, "average", 60, 3600, 0.1).count() == 1
    assert ret.rollup(df, "average", 60, 3600, 0.2).count() == 0


def test_expire_path_safe_in_non_utc_session(spark, tmp_path):
    # regression (r5 review): the straddling partition's DATE label is
    # session-tz-derived; classifying fully-expired days with a Python
    # UTC date deleted the freshly rewritten straddling partition
    # under non-UTC sessions. The drop list must come from the same
    # Spark expressions that produced the labels.
    path = str(tmp_path / "pts")
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        # cutoff Jan 3 01:00 UTC == Jan 2 17:00 PT: in PT the
        # straddling partition is date=1970-01-02 and holds BOTH
        # expired (00:30 UTC) and surviving (02:00 UTC) rows
        cutoff = 2 * 86400 + 3600
        rows = [("m", 0, 1.0),                 # PT 1969-12-31 — expired
                ("m", 2 * 86400 + 1800, 2.0),  # PT 01-02, expired
                ("m", 2 * 86400 + 7200, 3.0),  # PT 01-02, SURVIVES
                ("m", 4 * 86400, 4.0)]         # untouched
        d = df(spark, rows).withColumn(
            "date", F.to_date(F.timestamp_seconds(F.col("ts")))
        )
        d.write.partitionBy("date").parquet(path)
        ret.expire_path(spark, path, cutoff, 60)
        left = {r["ts"] for r in
                spark.read.parquet(path).select("ts").collect()}
        assert left == {2 * 86400 + 7200, 4 * 86400}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
