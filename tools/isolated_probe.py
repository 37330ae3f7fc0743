"""Isolated per-query timing probe for optimization A/B reads.

Runs a named subset of registry entries in one session, N passes each
(bench-identical count() action plus an optional noop-sink pass), and
prints per-query pass lists + mins as one JSON line. Sentinel entries
(known-untouched queries) ride along so a reader can separate host
drift from plan change: if sentinels reproduce their reference
numbers and a suspect does not, the suspect's move is real.

Usage: python tools/isolated_probe.py q1,q2,... [--passes N] [--noop]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink pass per query")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    # same pre-flight as bench.py: wait (bounded) for loadavg AND the
    # single-core probe spread to settle so neighbor bursts don't
    # masquerade as plan changes
    import bench as benchmod
    preflight = benchmod.wait_for_quiet_host(benchmod.BENCH_WAIT)
    if not preflight["quiet"]:
        print(f"PROBE PRE-FLIGHT: host still noisy after "
              f"{preflight['waited_s']}s", file=sys.stderr)

    spark = get_spark("ceres-spark-isolated-probe")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # same warmup as bench.py so first-query startup isn't billed
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        counts, noops = [], []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"probe:{name}:count")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            counts.append(round(time.perf_counter() - t0, 4))
            if args.noop:
                spark.sparkContext.setJobDescription(f"probe:{name}:noop")
                t0 = time.perf_counter()
                (fn(spark, args.sf_dir).write.format("noop")
                 .mode("overwrite").save())
                noops.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        rec = {"count_passes": counts, "count_min": min(counts)}
        if noops:
            rec["noop_passes"] = noops
            rec["noop_min"] = min(noops)
        out[name] = rec

    print(json.dumps({
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "preflight": preflight,
        "sf_dir": args.sf_dir,
        "results": out,
    }))


if __name__ == "__main__":
    main()
