"""Legacy .slice binary reader — format parity with CeresSlice
(big-endian float64, implicit timestamps, NaN gaps → NULL)."""

import os

import ceres_spark.sources.slice_format as sf


def test_roundtrip_with_nan_gaps(spark, tmp_path):
    node = tmp_path / "servers" / "web01" / "cpu"
    node.mkdir(parents=True)
    sf.write_slice(str(node), 1000, 60, [1.0, None, 3.0])
    sf.write_slice(str(node), 2200, 60, [9.0])  # second slice, later start
    out = sf.read_slice_tree(spark, str(tmp_path)).collect()
    got = {(r["metric"], r["ts"]): r["value"] for r in out}
    assert got == {
        ("servers.web01.cpu", 1000): 1.0,
        ("servers.web01.cpu", 1120): 3.0,  # implicit ts: start + i*step
        ("servers.web01.cpu", 2200): 9.0,
    }  # NaN point dropped (NULL boundary, CeresSlice.read ≈L760)


def test_keep_nan_preserves_density(spark, tmp_path):
    node = tmp_path / "m"
    node.mkdir()
    sf.write_slice(str(node), 0, 60, [1.0, None])
    rows = sf.read_slice_tree(spark, str(tmp_path), keep_nan=True).collect()
    assert len(rows) == 2  # gap row present (as NaN) when asked


def test_multiple_metrics_and_steps(spark, tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "deeper" / "b"
    a.mkdir()
    b.mkdir(parents=True)
    sf.write_slice(str(a), 0, 60, [1.0])
    sf.write_slice(str(b), 0, 300, [2.0, 3.0])
    out = sf.read_slice_tree(spark, str(tmp_path)).collect()
    got = sorted((r["metric"], r["ts"], r["value"]) for r in out)
    assert got == [("a", 0, 1.0), ("deeper.b", 0, 2.0), ("deeper.b", 300, 3.0)]


def test_export_roundtrip(spark, tmp_path):
    # points → slice files → points again must be identity
    pts = spark.createDataFrame(
        [
            ("a.b", 0, 1.0),
            ("a.b", 120, 2.0),  # small gap → NaN-padded same slice
            ("a.b", 60 * 200, 3.0),  # gap > 80 points → new slice
            ("c", 60, 4.0),
        ],
        "metric string, ts long, value double",
    )
    root = str(tmp_path / "export")
    n = sf.export_slice_tree(spark, pts, root, 60)
    assert n == 3  # a.b split into 2 slices + c
    back = sf.read_slice_tree(spark, root).collect()
    got = sorted((r["metric"], r["ts"], r["value"]) for r in back)
    assert got == [
        ("a.b", 0, 1.0),
        ("a.b", 120, 2.0),
        ("a.b", 12000, 3.0),
        ("c", 60, 4.0),
    ]


def test_export_empty_points_writes_nothing(spark, tmp_path):
    ep = spark.createDataFrame([], "metric string, ts long, value double")
    assert sf.export_slice_tree(spark, ep, str(tmp_path / "e"), 60) == 0


def test_migrate_tree_to_points(spark, tmp_path):
    node = tmp_path / "legacy" / "m"
    node.mkdir(parents=True)
    sf.write_slice(str(node), 86400, 60, [5.0, 6.0])
    target = str(tmp_path / "points")
    sf.migrate_tree(spark, str(tmp_path / "legacy"), target)
    pts = spark.read.parquet(target)
    assert pts.count() == 2
    assert os.path.isdir(os.path.join(target, "date=1970-01-02"))
