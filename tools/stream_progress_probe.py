"""Per-micro-batch duration decomposition for the streaming replay
entries (optimization r13, guide §1: measure first).

Registers a StreamingQueryListener, runs the named stream_* registry
entries (bench-identical count() action), and prints — per entry —
the wall time plus the summed per-batch ``durationMs`` phases
(addBatch, getBatch, latestOffset, queryPlanning, walCommit,
commitOffsets, triggerExecution) and the state-store operator timings
(commitTimeMs, allUpdatesTimeMs, allRemovalsTimeMs), so the ~3 s/entry
replay floor decomposes into named machinery instead of a blob.

Usage: python tools/stream_progress_probe.py stream_ewma,stream_kmv \
           [--passes 2] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ceres_spark.session import get_spark

from pyspark.sql.streaming import StreamingQueryListener


class _Collector(StreamingQueryListener):
    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:
            pass

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    spark = get_spark("ceres-spark-stream-probe")
    col = _Collector()
    spark.streams.addListener(col)
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # warmup identical to bench.py
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        fn = qs[name]
        for p in range(args.passes):
            col.progress.clear()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            wall = time.perf_counter() - t0
            # listener events arrive on a background thread; give the
            # last batch's progress a moment to land
            time.sleep(0.3)
            phases: dict[str, float] = {}
            state: dict[str, float] = {}
            n_batches = 0
            for pr in col.progress:
                n_batches += 1
                for k, v in (pr.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0.0) + v / 1000.0
                for op in pr.get("stateOperators") or []:
                    for k in (
                        "commitTimeMs",
                        "allUpdatesTimeMs",
                        "allRemovalsTimeMs",
                    ):
                        if k in op:
                            state[k] = state.get(k, 0.0) + op[k] / 1000.0
            print(
                json.dumps(
                    {
                        "q": name,
                        "pass": p,
                        "wall_s": round(wall, 3),
                        "n_progress_events": n_batches,
                        "phases_s": {
                            k: round(v, 3) for k, v in sorted(phases.items())
                        },
                        "state_s": {
                            k: round(v, 3) for k, v in sorted(state.items())
                        },
                        "trigger_total_s": round(
                            phases.get("triggerExecution", 0.0), 3
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
