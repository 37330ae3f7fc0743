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
    assert cli.main(["maintenance", root, "--plugin", "defrag"]) == 0
