"""Benchmark harness — runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with a count() over the full result (the driver
collects separately; count keeps bench I/O out of the timing).

The payload also records the MEASUREMENT CONDITIONS (VERDICT r5 #2:
the driver's tail and the builder's idle min-of-2 disagreed 1.27× vs
0.93× with uniform inflation on unchanged queries — environment, not
plans, but unprovable without data): host loadavg before/after, both
per-pass totals, the per-query max/min noise ratio distribution, and
any live concurrent replay-fixture scratch dirs owned by other
processes. A future delta read can now separate "the plan regressed"
from "the host was busy" from the artifact alone.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from ceres_spark.session import get_spark


def _live_replay_siblings() -> int:
    """Count ceres_replay_* scratch dirs owned by OTHER live
    processes — a concurrent check_oracle/bench run shares the host
    and inflates wall clocks."""
    n = 0
    roots = {tempfile.gettempdir(), "/dev/shm"}  # r7: scratch moved
    #                                              to tmpfs when present
    for d in (
        p for root in roots
        for p in glob.glob(os.path.join(root, "ceres_replay_*"))
    ):
        try:
            pid = int(d.rsplit("_", 1)[-1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
            n += 1
        except (ProcessLookupError, PermissionError):
            pass
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = os.getloadavg()
    siblings = _live_replay_siblings()
    spark = get_spark("ceres-spark-bench")
    qs = entrymod.queries()
    # warm-up actions so one-time startup isn't billed to whichever
    # query happens to run first: JVM/codegen (entry) and the Python
    # worker pool (a no-op mapInPandas) — both are per-process costs,
    # not per-query costs, in any long-lived deployment
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    # two passes, keep the per-query MIN: this container's wall clock
    # swings ±50% under neighbor load (same query measured 0.96 s and
    # 5.5 s minutes apart), so a single pass measures the host, not
    # the engine; min-of-2 is the steady-state figure.
    timings: dict[str, float] = {}
    worst: dict[str, float] = {}
    pass_totals: list[float] = []
    for _pass in range(2):
        pt = 0.0
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            pt += dt
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            if name not in worst or dt > worst[name]:
                worst[name] = dt
        pass_totals.append(round(pt, 4))
    load_end = os.getloadavg()
    total = round(sum(timings.values()), 4)
    ratios = sorted(
        worst[q] / timings[q] for q in timings if timings[q] > 0
    )
    noise = {
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "live_replay_siblings": siblings,
        "pass_totals": pass_totals,
        "noise_median_maxmin": round(ratios[len(ratios) // 2], 3)
        if ratios else None,
        "noise_p90_maxmin": round(ratios[int(len(ratios) * 0.9)], 3)
        if ratios else None,
    }
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "method": "min_of_2_passes",
        "conditions": noise,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # the round artifact captures only the TAIL of stdout (~82 of 139+
    # queries survived in r1–r3) — persist the complete per-query
    # table to a file so every timing is diffable across rounds.
    # ("conditions" sorts before "queries", so the driver's tail still
    # keeps the per-query block.)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_full.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
