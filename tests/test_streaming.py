"""Streaming ingest (op #17 as a stream): out-of-order micro-batches
must converge to the same LWW state as a single batch write —
FIXTURES.md §B.4."""

import ceres_spark.operators.compact as cp
import ceres_spark.streaming.ingest as ing
from pyspark.sql import functions as F


def test_stream_store_matches_batch(spark, tmp_path):
    # 3 shuffled micro-batches, overlapping timestamps (late + dup data)
    batches = [
        [("m", 120, 10.0), ("m", 300, 30.0)],
        [("m", 60, 6.0), ("m", 121, 99.0)],   # 121 → bucket 120, later batch wins
        [("m", 10, 1.0)],                      # very late — still accepted
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "metric string, ts long, value double"
        ).withColumn("arrival_seq", F.lit(i)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    target = str(tmp_path / "points")
    stream = spark.readStream.schema(
        "metric string, ts long, value double, arrival_seq long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = ing.stream_store(
        stream, target, time_step=60, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    final = cp.lww_dedup(spark.read.parquet(target))
    got = {r["ts"]: r["value"] for r in final.collect()}
    # NOTE: file-source batch order isn't guaranteed to match write
    # order, so assert LWW convergence on the keys, not which dup won
    assert set(got) == {0, 60, 120, 300}
    assert got[0] == 1.0 and got[60] == 6.0 and got[300] == 30.0
    assert got[120] in (10.0, 99.0)


def test_stream_store_events_equals_batch(spark, tmp_path):
    """FIXTURES.md §B.4: the real events table fed in ts-shuffled
    micro-batches through the streaming writer must converge to the
    same LWW state as one batch write."""
    import ceres_spark.sources.tables as tbl

    pts = tbl.points(spark, "/root/testdata/sf0.001")
    # shuffle deterministically into 4 files → ≥4 micro-batches
    src = str(tmp_path / "src")
    pts.withColumn("_shard", F.col("arrival_seq") % 4).repartition(
        4, "_shard"
    ).drop("_shard").write.parquet(src)

    target = str(tmp_path / "points")
    stream = spark.readStream.schema(
        "metric string, ts long, value double, arrival_seq long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = ing.stream_store(
        stream, target, time_step=60, checkpoint=str(tmp_path / "ck")
    )
    q.awaitTermination(180)

    # batch reference: same quantize + arrival-LWW over the whole set
    batch = {
        (r["metric"], r["ts"]): r["value"]
        for r in cp.lww_dedup(cp.quantize(pts, 60)).collect()
    }
    streamed = {
        (r["metric"], r["ts"]): r["value"]
        for r in cp.lww_dedup(spark.read.parquet(target)).collect()
    }
    assert set(streamed) == set(batch)
    # values may differ only where original arrival order was split
    # across batches with intra-bucket duplicates; count those
    diffs = [k for k in batch if batch[k] != streamed[k]]
    assert len(diffs) / len(batch) < 0.02, f"{len(diffs)}/{len(batch)} diverged"


def test_dedup_stream_drops_watermark_window_dupes(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    rows = [("m", 60, 1.0), ("m", 60, 1.0), ("m", 120, 2.0), ("m", 60, 9.0)]
    spark.createDataFrame(rows, "metric string, ts long, value double") \
        .withColumn("event_time", F.timestamp_seconds(F.col("ts"))) \
        .coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "metric string, ts long, value double, event_time timestamp"
    ).parquet(src)
    out = ing.dedup_stream(stream)
    q = out.writeStream.format("memory").queryName("dd").outputMode(
        "append"
    ).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ddck")
    ).start()
    q.awaitTermination(120)
    got = spark.sql("select metric, ts from dd").collect()
    assert sorted((r["metric"], r["ts"]) for r in got) == [("m", 60), ("m", 120)]


def test_windowed_rollup_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    # watermark after the data batch = 570s - 60s = 510s > 300s, so the
    # no-data batch Spark runs on watermark advance emits window [0,300)
    rows = [("m", i, float(i)) for i in range(0, 600, 30)]
    spark.createDataFrame(rows, "metric string, epoch long, value double") \
        .select("metric", F.timestamp_seconds("epoch").alias("ts"), "value") \
        .write.parquet(src)
    stream = spark.readStream.schema("metric string, ts timestamp, value double") \
        .parquet(src)
    agg = ing.windowed_rollup_stream(stream, 300, lateness="1 minute")
    q = agg.writeStream.format("memory").queryName("roll").outputMode(
        "append"
    ).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt2")
    ).start()
    q.awaitTermination(120)
    got = {
        r["ts"]: (r["n_points"], r["sum_value"])
        for r in spark.sql("select * from roll").collect()
    }
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes all but possibly the last window
    assert got.get(0) == (10, sum(range(0, 300, 30)) * 1.0)


def test_session_stream_merges_and_splits_on_gap(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    # user 1: two bursts 40 min apart (-> 2 sessions with 30-min gap);
    # user 2: one burst. A final late marker row advances the watermark
    # far enough to close every session in append mode.
    rows = [
        (1, 0, 1.0), (1, 600, 2.0),           # session A: [0, 600]
        (1, 3000, 4.0),                        # session B (gap 2400s > 1800)
        (2, 100, 8.0), (2, 200, 16.0),         # user 2 single session
        (9, 100000, 0.0),                      # watermark pusher
    ]
    spark.createDataFrame(
        rows, "user_id long, epoch long, value double"
    ).select(
        "user_id", F.timestamp_seconds("epoch").alias("ts"), "value"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    agg = ing.session_stream(stream, gap="30 minutes", lateness="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sess").collect()
    }
    assert got[(1, 0)] == (2, 3.0)
    assert got[(1, 3000)] == (1, 4.0)
    assert got[(2, 100)] == (2, 24.0)


def test_stream_stream_join_pairs_within_interval(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "ssl"), str(tmp_path / "ssr")
    # left: clicks at t=3600, 7200 for user 1
    # right: errors at t=100 (too old for 7200, in range for 3600? no -
    #   3600-3600=0 <= 100 <= 3600 yes), 7000 (in range for 7200 only)
    spark.createDataFrame(
        [(1, 3600, 1.0), (1, 7200, 2.0)],
        "user_id long, epoch long, value double",
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"), "value") \
        .write.parquet(lsrc)
    spark.createDataFrame(
        [(1, 100, 10.0), (1, 7000, 20.0), (2, 3600, 99.0)],
        "user_id long, epoch long, value double",
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"), "value") \
        .write.parquet(rsrc)
    ls = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(lsrc)
    rs = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(rsrc)
    j = ing.stream_stream_join(ls, rs, within="1 hour")
    q = (
        j.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], int(r["l_ts"].timestamp()), int(r["r_ts"].timestamp()))
        for r in spark.sql("select * from ssj").collect()
    )
    assert got == [(1, 3600, 100), (1, 7200, 7000)], got


def test_backfill_rollup_windows_repairs_and_passes_through(spark):
    # the batch half of the backfill loop (VERDICT r9 #7): windows
    # touched by late arrivals are recomputed from the store; every
    # other dashboard row passes through byte-identical
    import ceres_spark.operators.retention as ret

    stored = spark.createDataFrame(
        [
            # window 0: on-time rows only (arrival batches 0-2)
            ("a", 10, 1.0, 0), ("a", 20, 2.0, 1),
            # window 300: one on-time + one LATE row (batch 3) —
            # the merged-repair case
            ("a", 310, 3.0, 1), ("a", 350, 4.0, 3),
            # window 600: purely late — the dashboard never saw it
            ("a", 610, 5.0, 3),
        ],
        "metric string, x long, value double, arrival_batch long",
    )
    # the dashboard as the watermark left it: window 300 reflects
    # only the on-time row; window 600 absent
    dashboard = spark.createDataFrame(
        [("a", 0, 2, 3.0), ("a", 300, 1, 3.0)],
        "metric string, ts long, n_points long, sum_value double",
    )
    got = {
        (r["metric"], r["ts"]): r
        for r in ret.backfill_rollup_windows(
            stored, dashboard, 300, since_batch=3
        ).collect()
    }
    assert got[("a", 0)]["patched"] == 0
    assert (got[("a", 0)]["n_points"], got[("a", 0)]["sum_value"]) == (2, 3.0)
    assert got[("a", 300)]["patched"] == 1
    assert (got[("a", 300)]["n_points"], got[("a", 300)]["sum_value"]) == (
        2, 7.0,
    )
    assert got[("a", 600)]["patched"] == 1
    assert (got[("a", 600)]["n_points"], got[("a", 600)]["sum_value"]) == (
        1, 5.0,
    )


def test_backfill_multiday_window_covers_intermediate_days(spark):
    # ADVICE r10 medium: with the store's `date` partition column
    # present and a window spanning >= 3 calendar days (weekly
    # rollup), store rows on INTERMEDIATE days must still reach the
    # recompute — the old 2-element day explode (first + last day
    # only) silently dropped them from the 3-key semi-join
    import datetime

    import ceres_spark.operators.retention as ret

    day = 86400
    win = 7 * day  # weekly window [0, 604800)
    rows = [
        ("a", 10, 1.0, 0),            # day 0 (window start), on-time
        ("a", 3 * day + 5, 2.0, 1),   # day 3 — INTERMEDIATE day
        ("a", 5 * day + 7, 3.0, 3),   # day 5 — intermediate, LATE
        ("a", 6 * day + 9, 4.0, 0),   # day 6 (window's last day)
    ]
    stored = spark.createDataFrame(
        [
            (m, x, v, b, datetime.date(1970, 1, 1 + x // day))
            for m, x, v, b in rows
        ],
        "metric string, x long, value double, arrival_batch long,"
        " date date",
    )
    # dashboard as the watermark left it: the late day-5 row missing
    dashboard = spark.createDataFrame(
        [("a", 0, 3, 7.0)],
        "metric string, ts long, n_points long, sum_value double",
    )
    got = ret.backfill_rollup_windows(
        stored, dashboard, win, since_batch=3
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["ts"], r["patched"]) == (0, 1)
    # all four store rows — including both intermediate days — in
    # the recompute
    assert (r["n_points"], r["sum_value"]) == (4, 10.0)


def test_stream_append_log_stamps_batches(spark, tmp_path):
    # the storage leg never drops and stamps arrival order
    import ceres_spark.streaming.ingest as ing2

    src = str(tmp_path / "src")
    for i, ts in enumerate(["2024-01-01 00:00:10", "2024-01-05 00:00:10"]):
        spark.createDataFrame(
            [("a", ts, float(i))], "metric string, ts string, value double"
        ).select(
            "metric", F.col("ts").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("metric string, ts timestamp, value double")
        .parquet(src)
    )
    store = str(tmp_path / "store")
    q = ing2.stream_append_log(
        stream, store, checkpoint=str(tmp_path / "ck")
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 2  # nothing dropped
    assert {r["arrival_batch"] for r in rows} == {0}  # one availableNow batch
    assert {str(r["date"]) for r in rows} == {"2024-01-01", "2024-01-05"}
