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
