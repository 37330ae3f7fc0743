"""CLI parity (op #9/#23) — drives python -m ceres_spark.cli
subcommands in-process (fresh subprocesses per command would pay ~10 s
of JVM startup each; main() with argv is the same code path)."""

import ceres_spark.cli as cli


def test_cli_end_to_end(spark, tmp_path, capsys):
    root = str(tmp_path / "warehouse")
    assert cli.main(["tree-create", root, "--prop", "sitename=test"]) == 0
    assert cli.main(["node-create", root, "servers.web01.cpu", "--step", "60"]) == 0
    assert (
        cli.main(
            ["node-write", root, "servers.web01.cpu", "60:1.5", "125:2.5"]
        )
        == 0
    )
    capsys.readouterr()
    assert cli.main(["node-read", root, "servers.web01.cpu", "0", "240"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["0\tNone", "60\t1.5", "120\t2.5", "180\tNone"]
    assert cli.main(["find", root, "servers.*.cpu"]) == 0
    assert "servers.web01.cpu" in capsys.readouterr().out
    assert cli.main(["maintenance", root, "--plugin", "rollup",
                     "--new-step", "300"]) == 0
    assert cli.main(["maintenance", root, "--plugin", "rollup-catalog",
                     "--new-step", "300"]) == 0
    assert cli.main(["maintenance", root, "--plugin", "defrag"]) == 0


def test_slicecheck_legacy_finds_problems(tmp_path):
    import ceres_spark.sources.slice_format as sf

    node = tmp_path / "metrics" / "cpu"
    node.mkdir(parents=True)
    (node / ".ceres-node").write_text("{}")
    sf.write_slice(str(node), 0, 60, [1.0, 2.0, 3.0])        # clean
    sf.write_slice(str(node), 120, 60, [9.0])                # overlaps (0..180)
    (node / "77@60.slice").write_bytes(b"\x00" * 8)          # off-grid start
    (node / "600@60.slice").write_bytes(b"\x00" * 9)         # ragged size
    (node / "junk.slice").write_bytes(b"")                   # bad name
    probs = sf.slicecheck(str(tmp_path))
    assert len(probs) == 4
    assert any("unparseable" in p["problem"] for p in probs)
    assert any("multiple of 8" in p["problem"] for p in probs)
    assert any("off the timeStep grid" in p["problem"] for p in probs)
    # overlap reported against the valid 0@60 slice, on the later file
    assert any(
        p["problem"] == "overlaps 0@60.slice"
        and p["file"].endswith("120@60.slice")
        for p in probs
    )


def test_slicecheck_legacy_clean_tree(tmp_path):
    import ceres_spark.sources.slice_format as sf

    node = tmp_path / "m"
    node.mkdir()
    sf.write_slice(str(node), 0, 60, [1.0, None, 3.0])
    sf.write_slice(str(node), 600, 60, [4.0])   # disjoint
    sf.write_slice(str(node), 0, 300, [7.0])    # other step: no conflict
    assert sf.slicecheck(str(tmp_path)) == []


def test_slicecheck_warehouse_cli(spark, tmp_path, capsys):
    from ceres_spark.cli import main
    from ceres_spark.tree import CeresTree

    root = str(tmp_path / "wh")
    tree = CeresTree.create_tree(spark, root)
    node = tree.create_node("a.b", timeStep=60)
    node.write(spark.createDataFrame(
        [(0, 1.0), (60, 2.0)], "ts long, value double"
    ))
    assert main(["slicecheck", root]) == 0
    out = capsys.readouterr().out
    assert "rows=2 misaligned=0 nan=0 dups=0" in out


def test_cli_migrate_roundtrip(spark, tmp_path, capsys):
    """migrate-in then migrate-out over a legacy tree: both CLI
    directions drive the distributed slice codec and the cycle is
    identity on the stored points."""
    import ceres_spark.sources.slice_format as sf

    legacy = tmp_path / "legacy" / "web" / "cpu"
    legacy.mkdir(parents=True)
    sf.write_slice(str(legacy), 600, 60, [1.0, None, 3.0])
    points = str(tmp_path / "points")
    assert cli.main(["migrate-in", str(tmp_path / "legacy"), points]) == 0
    assert "2 points" in capsys.readouterr().out
    back = str(tmp_path / "back")
    assert cli.main(["migrate-out", points, back, "--step", "60"]) == 0
    assert "1 slice file(s)" in capsys.readouterr().out
    got = {
        (r["metric"], r["ts"], r["value"])
        for r in sf.read_slice_tree(spark, back).collect()
    }
    assert got == {("web.cpu", 600, 1.0), ("web.cpu", 720, 3.0)}


def test_cli_explain_lists_and_prints_plan(capsys):
    from ceres_spark.cli import main

    assert main(["explain", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "tpch_q6" in names and len(names) > 100

    assert main(["explain", "tpch_q6"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out

    assert main(["explain", "nope_not_a_query"]) == 1


def test_cli_corpus_stage(spark, tmp_path, capsys):
    import ceres_spark.cli as cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s1", 22),
            (2, "one two three four five", "en", "s2", 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(src)
    out = str(tmp_path / "scored")
    rc = cli.main(["corpus", "classify", src, out])
    assert rc == 0
    assert "wrote 2 rows" in capsys.readouterr().out
    cols = set(spark.read.parquet(out).columns)
    assert {"doc_id", "margin_micro", "keep"} <= cols


def test_cli_render_front_door(spark, tmp_path, capsys):
    """The r12 render subcommand: tree store → graphite target string
    → composed plan → printed rows (the reference web layer's
    evaluateTarget surface over a ceres tree)."""
    root = str(tmp_path / "wh")
    assert cli.main(["tree-create", root]) == 0
    assert cli.main(["node-create", root, "web.s1.cpu"]) == 0
    assert cli.main(["node-create", root, "web.s2.cpu"]) == 0
    assert cli.main(
        ["node-write", root, "web.s1.cpu", "60:1.0", "120:3.0"]
    ) == 0
    assert cli.main(
        ["node-write", root, "web.s2.cpu", "60:2.0", "120:5.0"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["render", root, 'alias(sumSeries(web.*.cpu),"total")']
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["total\t60\t3.0", "total\t120\t8.0"]
    # range + scale with graphite name rewrite
    assert cli.main(
        ["render", root, "scale(web.s1.cpu,2)", "--from", "120"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["scale(web.s1.cpu,2)\t120\t6.0"]
