"""Spark 4 Python DataSource for slice files: format registration,
per-file partitions, NaN→NULL, agreement with the mapInPandas reader."""

import ceres_spark.sources.slice_datasource as sds
import ceres_spark.sources.slice_format as sf


def test_datasource_reads_tree(spark, tmp_path):
    node = tmp_path / "servers" / "web01" / "cpu"
    node.mkdir(parents=True)
    sf.write_slice(str(node), 1000, 60, [1.0, None, 3.0])
    other = tmp_path / "m2"
    other.mkdir()
    sf.write_slice(str(other), 0, 300, [5.0])

    sds.register(spark)
    df = spark.read.format("ceres_slice").load(str(tmp_path))
    got = sorted((r["metric"], r["ts"], r["value"]) for r in df.collect())
    assert got == [
        ("m2", 0, 5.0),
        ("servers.web01.cpu", 1000, 1.0),
        ("servers.web01.cpu", 1120, 3.0),
    ]


def test_datasource_matches_mapinpandas_reader(spark, tmp_path):
    node = tmp_path / "a"
    node.mkdir()
    sf.write_slice(str(node), 0, 60, [1.0, None, 2.5, 9.0])
    sds.register(spark)
    via_ds = {
        (r["metric"], r["ts"], r["value"])
        for r in spark.read.format("ceres_slice").load(str(tmp_path)).collect()
    }
    via_mp = {
        (r["metric"], r["ts"], r["value"])
        for r in sf.read_slice_tree(spark, str(tmp_path)).collect()
    }
    assert via_ds == via_mp


def test_datasource_keepnan_option(spark, tmp_path):
    node = tmp_path / "a"
    node.mkdir()
    sf.write_slice(str(node), 0, 60, [1.0, None])
    sds.register(spark)
    df = spark.read.format("ceres_slice").option("keepnan", "true").load(
        str(tmp_path)
    )
    rows = df.collect()
    assert len(rows) == 2
    assert rows[1]["value"] is None  # NaN surfaced as NULL row


def test_stream_reader_tails_appends_and_new_slices(spark, tmp_path):
    import struct

    tree = tmp_path / "tree"
    node = tree / "cpu"
    node.mkdir(parents=True)
    p1 = sf.write_slice(str(node), 1000, 60, [1.0, 2.0])
    sds.register(spark)

    out = str(tmp_path / "out")

    def drain():
        # durable sink so the SAME checkpoint resumes across restarts
        # (memory sink does not support checkpoint recovery)
        q = (
            spark.readStream.format("ceres_slice")
            .load(str(tree))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["metric"], r["ts"], r["value"])
            for r in spark.read.parquet(out).collect()
        )

    # batch 1: full history
    assert drain() == [("cpu", 1000, 1.0), ("cpu", 1060, 2.0)]

    # append two points in place + a brand-new slice in a new node
    with open(p1, "ab") as f:
        f.write(struct.pack("!d", 3.0))
        f.write(struct.pack("!d", float("nan")))  # gap -> not emitted
    node2 = tree / "mem"
    node2.mkdir()
    sf.write_slice(str(node2), 5000, 300, [9.0])

    got2 = drain()
    # same checkpoint: cumulative sink now holds history + ONLY the
    # newly appended / new-slice points (no re-emission of old ones)
    assert got2 == [
        ("cpu", 1000, 1.0),
        ("cpu", 1060, 2.0),
        ("cpu", 1120, 3.0),
        ("mem", 5000, 9.0),
    ], got2
