"""A/B: applyInPandasWithState vs transformWithStateInPandas (r9).

VERDICT r8 #4: after the state-store provider flip, ~380 ms/batch of
Python stateful overhead remained in the replay twins (TIMINGS.md
r8). Spark 4's transformWithState family is the candidate lever.
This probe replays the stream_ewma feed (sf0.1 hourly averages, 4
time-ordered arrival batches) through BOTH stateful APIs on the same
RocksDB+changelog provider, interleaved min-of-N, and digest-checks
the outputs bit-equal.

Usage: python tools/tws_probe.py [rounds] [sf_dir]   (default 3, sf0.1)
Emits one JSON line per arm (total replay seconds; divide by 4 for
per-batch) plus a digest + conditions line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
import ceres_spark.operators.aggregate as agg
import ceres_spark.operators.compact as cp
import ceres_spark.sources.tables as tbl
import ceres_spark.streaming.stateful as st
from ceres_spark.session import get_spark


def digest(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("tws-probe")

    deduped = cp.compact(tbl.points(spark, sf_dir), 60)
    hourly = agg.aggregate_series(deduped, "average", 3600)

    arms = {
        "applyInPandasWithState": lambda s: st.ewma_stream(s, alpha=0.3),
        "transformWithStateInPandas": lambda s: st.ewma_stream_tws(
            s, alpha=0.3
        ),
    }
    times: dict[str, list[float]] = {k: [] for k in arms}
    digests: dict[str, set[str]] = {k: set() for k in arms}
    errors: dict[str, str] = {}
    for _ in range(rounds):
        for name, op in arms.items():
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                out = entry._replay_stateful(
                    spark, sf_dir, f"ewma_probe_{name}",
                    f"tws_probe_{name}", hourly,
                    "metric string, ts long, value double", op,
                ).select("metric", "ts", "value", "ewma")
                d = digest(out)
            except NotImplementedError as e:
                # the availability gate (no protobuf on this box):
                # record the no-go as data, keep measuring the other
                # arm — VERDICT r8 #4 wants the finding either way
                errors[name] = str(e)
                continue
            times[name].append(time.perf_counter() - t0)
            digests[name].add(d)

    for name in arms:
        if name in errors:
            print(json.dumps({"arm": name, "unavailable": errors[name]}))
            continue
        ts = times[name]
        print(json.dumps({
            "arm": name,
            "min_s": round(min(ts), 3),
            "per_batch_min_ms": round(min(ts) / 4 * 1000, 1),
            "runs": [round(t, 3) for t in ts],
            "digests": sorted(digests[name]),
        }))
    measured = [k for k in arms if k not in errors]
    same = (
        len(measured) < 2
        or digests[measured[0]] == digests[measured[1]]
    )
    print(json.dumps({
        "digest_equal": same if len(measured) == 2 else None,
        "conditions": {"loadavg": os.getloadavg(), "rounds": rounds,
                       "sf_dir": sf_dir},
    }))
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
