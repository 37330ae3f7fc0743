"""Commit-protocol failure path (ADVICE r11 / VERDICT r11 #6): a
failed store() KEEPS its staging dir (``_FAILED`` marker) instead of
deleting not-yet-moved part files; ``cleanup_stagings`` rolls forward
completed-write stagings idempotently and removes garbage, gated by a
grace window so it can never race a live writer. Reference anchor:
ceres.py ≈L790 CeresSlice.write's in-place overwrite has no crash
window at all — the distributed analogue must make its window
recoverable."""

import json
import os
import shutil

import pytest

from ceres_spark.tree import CeresTree


@pytest.fixture()
def tree(spark, tmp_path):
    return CeresTree.create_tree(spark, str(tmp_path), sitename="test")


def dp(spark, rows):
    return spark.createDataFrame(rows, "ts long, value double")


def _read(node, lo=0, hi=600):
    return {
        r["ts"]: r["value"]
        for r in node.read(lo, hi).collect()
        if r["value"] is not None
    }


def test_failed_apply_keeps_staging_then_rolls_forward(
    spark, tree, monkeypatch
):
    """Writer raises inside the move loop → staging survives with
    _FAILED + _SUCCESS + _COMMIT; cleanup_stagings completes the
    commit (roll-forward) and the data becomes fully visible."""
    node = tree.create_node("a.b", timeStep=60)

    real = CeresTree._apply_staging

    def boom(self, staging, step, seq):
        raise OSError("injected rename failure")

    monkeypatch.setattr(CeresTree, "_apply_staging", boom)
    with pytest.raises(OSError, match="injected"):
        tree.store("a.b", dp(spark, [(60, 1.0), (90000, 2.0)]))
    monkeypatch.setattr(CeresTree, "_apply_staging", real)

    (d,) = tree.staging_dirs()
    path = os.path.join(tree.root, d)
    assert os.path.exists(os.path.join(path, "_FAILED"))
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    with open(os.path.join(path, "_COMMIT")) as fh:
        m = json.load(fh)
    assert m["node"] == "a.b" and m["step"] == 60
    # nothing visible yet: the move loop never ran
    assert _read(node, 0, 100000) == {}

    out = tree.cleanup_stagings()
    assert out["rolled_forward"] == [d]
    assert tree.staging_dirs() == []
    assert _read(node, 0, 100000) == {60: 1.0, 90000: 2.0}


def test_mid_loop_crash_roll_forward_is_idempotent(
    spark, tree, monkeypatch
):
    """Hard crash mid-rename (some date partitions moved, some not,
    no _FAILED marker — a kill -9): cleanup past the grace window
    rolls forward exactly the remainder; row counts stay exact (no
    duplicated files)."""
    node = tree.create_node("a.b", timeStep=60)

    real = CeresTree._apply_staging
    partial_staging = {}

    def partial(self, staging, step, seq):
        # move only the FIRST date partition, then die without a trace
        target = self.points_path(step)
        dates = sorted(
            x for x in os.listdir(staging) if x.startswith("date=")
        )
        assert len(dates) >= 2, "fixture must span 2+ UTC dates"
        src_dir = os.path.join(staging, dates[0])
        dst_dir = os.path.join(target, dates[0])
        os.makedirs(dst_dir, exist_ok=True)
        for f in sorted(os.listdir(src_dir)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(src_dir, f),
                    os.path.join(dst_dir, f"part-c{seq}-{f}"),
                )
        partial_staging["path"] = staging
        raise SystemExit("simulated kill")

    monkeypatch.setattr(CeresTree, "_apply_staging", partial)
    with pytest.raises(SystemExit):
        # 60 and 90000 land on different UTC dates
        tree.store("a.b", dp(spark, [(60, 1.0), (90000, 2.0)]))
    monkeypatch.setattr(CeresTree, "_apply_staging", real)

    path = partial_staging["path"]
    # a kill -9 leaves no _FAILED marker — erase the exception-path one
    os.remove(os.path.join(path, "_FAILED"))
    # partial commit IS visible (documented), the other date is not
    assert _read(node, 0, 100000) == {60: 1.0}

    # young + unmarked → skipped (could be a live writer)
    out = tree.cleanup_stagings(grace_seconds=10**9)
    assert out["skipped"] == [os.path.basename(path)]
    # past grace → rolled forward; re-applying moves ONLY the remainder
    out = tree.cleanup_stagings(grace_seconds=0.0)
    assert out["rolled_forward"] == [os.path.basename(path)]
    assert tree.staging_dirs() == []
    assert _read(node, 0, 100000) == {60: 1.0, 90000: 2.0}
    # exact row count: one row per bucket per commit, nothing doubled
    pts = tree.points(60).filter("value is not null").collect()
    assert len(pts) == 2


def test_retry_shadows_partial_commit_before_and_after_cleanup(
    spark, tree, monkeypatch
):
    """The documented caller contract: retrying a failed store()
    shadows its partial rows via read-time LWW — and a LATER
    roll-forward of the stale staging cannot resurrect them (its
    arrival_seq loses every LWW race)."""
    node = tree.create_node("a.b", timeStep=60)

    def boom(self, staging, step, seq):
        raise OSError("injected")

    real = CeresTree._apply_staging
    monkeypatch.setattr(CeresTree, "_apply_staging", boom)
    with pytest.raises(OSError):
        tree.store("a.b", dp(spark, [(60, 1.0)]))
    monkeypatch.setattr(CeresTree, "_apply_staging", real)

    tree.store("a.b", dp(spark, [(60, 7.0)]))  # the retry
    assert _read(node) == {60: 7.0}
    out = tree.cleanup_stagings()
    assert len(out["rolled_forward"]) == 1
    # the rolled-forward seq-1 rows are shadowed by the retry's seq-2
    assert _read(node) == {60: 7.0}
    hist = [r["version"] for r in tree.history().collect()]
    assert sorted(hist) == [1, 2]


def test_garbage_staging_without_markers_is_removed_after_grace(tree):
    """Crash during the parquet write itself: no _SUCCESS/_COMMIT —
    nothing reached the target, the dir is plain garbage."""
    path = os.path.join(tree.root, ".staging-99-deadbeef")
    os.makedirs(os.path.join(path, "date=1970-01-01"))
    assert tree.cleanup_stagings(grace_seconds=10**9)["skipped"] == [
        ".staging-99-deadbeef"
    ]
    out = tree.cleanup_stagings(grace_seconds=0.0)
    assert out["removed"] == [".staging-99-deadbeef"]
    assert tree.staging_dirs() == []


def test_failed_marker_without_success_is_removed_immediately(tree):
    """_FAILED + incomplete write → removable regardless of age (the
    writer raised and exited; there is nothing to roll forward)."""
    path = os.path.join(tree.root, ".staging-7-cafe")
    os.makedirs(path)
    with open(os.path.join(path, "_FAILED"), "w") as fh:
        fh.write("{}")
    out = tree.cleanup_stagings(grace_seconds=10**9)
    assert out["removed"] == [".staging-7-cafe"]


def test_success_path_leaves_no_staging(spark, tree):
    node = tree.create_node("a.b", timeStep=60)
    tree.store("a.b", dp(spark, [(60, 1.0)]))
    assert tree.staging_dirs() == []
    assert _read(node) == {60: 1.0}
