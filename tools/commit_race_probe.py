"""Commit-protocol stress probe (VERDICT r11 #6): N concurrent
``tree.store()`` writers over OVERLAPPING date partitions, with a
crash injected mid-rename in one writer, then verifies the full
failure contract on the d70e85d per-commit staging protocol
(hardened r12 with roll-forward recovery — tree.py ``CeresNode.write``
/ ``CeresTree.cleanup_stagings``):

1. every surviving commit's rows are fully visible;
2. read-path LWW resolves every contested bucket to the HIGHEST
   arrival_seq that wrote it (checked bucket-by-bucket against the
   raw points frame — commit order, not thread order);
3. the txn log carries distinct contiguous versions, one per store();
4. the crashed writer's staging dir is DETECTED (staging_dirs) and
   resolved by cleanup_stagings: rolled FORWARD when its parquet
   write had finished (commit becomes whole), removed when not —
   and a post-cleanup LWW re-check proves the rolled-forward rows
   cannot shadow any later commit.

Usage:
    python tools/commit_race_probe.py [writers] [crash_at]

Prints one JSON line with the verdict. Exit 0 iff every check holds.
Single-machine probe: threads share one SparkSession (Spark's job
scheduler is thread-safe); on a cluster the same protocol holds
because staging dirs are per-commit (uuid-named) and the move loop
touches only its own deterministic part-c{seq}-* names.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ceres_spark.session import get_spark
from ceres_spark.tree import CeresTree

DAY = 86400


def main() -> None:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    crash_at = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("commit-race-probe")
    root = tempfile.mkdtemp(prefix="commit-race-")
    tree = CeresTree.create_tree(spark, root, sitename="probe")
    tree.create_node("race.metric", timeStep=60)
    node = tree.get_node("race.metric")

    real_apply = CeresTree._apply_staging
    crashed: dict = {}

    def crashy_apply(self, staging, step, seq):
        # one writer dies after moving its FIRST date partition —
        # the partial-commit crash window
        if seq == crash_at and "path" not in crashed:
            target = self.points_path(step)
            dates = sorted(
                d for d in os.listdir(staging) if d.startswith("date=")
            )
            if dates:
                src = os.path.join(staging, dates[0])
                dst = os.path.join(target, dates[0])
                os.makedirs(dst, exist_ok=True)
                for f in sorted(os.listdir(src)):
                    if f.endswith(".parquet"):
                        os.rename(
                            os.path.join(src, f),
                            os.path.join(dst, f"part-c{seq}-{f}"),
                        )
            crashed["path"] = staging
            crashed["seq"] = seq
            raise OSError("injected mid-rename crash")
        return real_apply(self, staging, step, seq)

    CeresTree._apply_staging = crashy_apply
    try:
        def one_writer(i: int):
            # every writer hits the SAME three UTC dates and the same
            # contested bucket (ts=60), plus a writer-private bucket
            rows = [
                (60, float(i)),            # contested, day 0
                (DAY + 60 * i, 100.0 + i),  # day 1, private
                (2 * DAY + 60, float(i)),   # contested, day 2
            ]
            df = spark.createDataFrame(rows, "ts long, value double")
            try:
                tree.store("race.metric", df)
                return ("ok", i)
            except OSError:
                return ("crashed", i)

        with ThreadPoolExecutor(max_workers=writers) as ex:
            results = list(ex.map(one_writer, range(writers)))
    finally:
        CeresTree._apply_staging = real_apply

    n_crashed = sum(1 for s, _ in results if s == "crashed")
    checks: dict = {"writers": writers, "crashed_writers": n_crashed}

    # (3) txn log: distinct contiguous versions, one per store()
    versions = sorted(r["version"] for r in tree.history().collect())
    checks["txn_contiguous"] = versions == list(range(1, writers + 1))

    # (4a) the crash left exactly one staging dir behind
    leftovers = tree.staging_dirs()
    checks["orphan_detected"] = len(leftovers) == n_crashed == 1

    def lww_ok() -> bool:
        pts = tree.points(60).filter("value is not null").collect()
        by_bucket: dict = {}
        for r in pts:
            b = by_bucket.setdefault(r["ts"], [])
            b.append((r["arrival_seq"], r["value"]))
        got = {
            r["ts"]: r["value"]
            for r in node.read(0, 3 * DAY).collect()
            if r["value"] is not None
        }
        return all(
            got[ts] == max(pairs)[1] for ts, pairs in by_bucket.items()
        )

    # (2) LWW before cleanup: contested buckets resolve by commit order
    checks["lww_pre_cleanup"] = lww_ok()

    # (4b) cleanup rolls the crashed commit forward (its parquet write
    # finished — _SUCCESS + _COMMIT + _FAILED all present)
    out = tree.cleanup_stagings()
    checks["cleanup"] = {
        k: len(v) for k, v in out.items() if isinstance(v, list)
    }
    checks["rolled_forward"] = out["rolled_forward"] == leftovers
    checks["staging_empty_after"] = tree.staging_dirs() == []

    # (1)+(2) after roll-forward: every writer's private day-1 bucket
    # is visible, and LWW still resolves to the highest seq
    got = {
        r["ts"]: r["value"]
        for r in node.read(0, 3 * DAY).collect()
        if r["value"] is not None
    }
    checks["all_commits_whole"] = all(
        got.get(DAY + 60 * i) == 100.0 + i for i in range(writers)
    )
    checks["lww_post_cleanup"] = lww_ok()

    ok = all(
        v for k, v in checks.items()
        if isinstance(v, bool)
    )
    print(json.dumps({"ok": ok, **checks}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
