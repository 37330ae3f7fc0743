"""State-store provider probe for the 12 streaming replay twins
(VERDICT r7 #3): measures the HDFS-backed default against
RocksDBStateStoreProvider, with and without changelog checkpointing,
on the SAME entries the driver benches — interleaved passes, min-of-2,
plus a result-equality check (sorted-row digest per entry per mode
must match the HDFS mode, so a provider switch can never silently
change what the twins prove).

Usage:
    python tools/state_store_probe.py [sf_dir] [passes]

Prints one JSON line: per-mode per-entry min seconds, family totals,
and the equality verdict. The TIMINGS.md r7 decomposition put the
remaining replay floor at ~440 ms/query of offset/WAL commits plus
~380 ms/batch of Python stateful addBatch; the state store is the
half of that a provider can move.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ceres_spark.session import get_spark

# the replay harness reads SPARK_GRAFT_STATE_STORE per query start
# (__spark_entry__._replay_shuffle), so the probe selects modes via
# env — one source of truth for what each mode sets
MODES = list(entrymod.STATE_STORE_MODES)


def _digest(df) -> str:
    rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("state-store-probe")
    qs = entrymod.queries()
    names = sorted(n for n in qs if n.startswith("stream_"))
    entrymod.entry(spark).count()  # JVM/codegen warmup
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    best: dict[str, dict[str, float]] = {m: {} for m in MODES}
    digests: dict[str, dict[str, str]] = {m: {} for m in MODES}
    for p in range(passes):
        for mode in MODES:
            os.environ["SPARK_GRAFT_STATE_STORE"] = mode
            for name in names:
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                if name not in digests[mode]:
                    digests[mode][name] = _digest(df)
                else:
                    df.count()
                dt = round(time.perf_counter() - t0, 3)
                if name not in best[mode] or dt < best[mode][name]:
                    best[mode][name] = dt
                print(f"ROW pass={p} mode={mode} {name} {dt}",
                      file=sys.stderr)
    os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    mismatches = [
        (m, n)
        for m in MODES if m != "hdfs"
        for n in names
        if digests[m][n] != digests["hdfs"][n]
    ]
    payload = {
        "sf_dir": sf_dir,
        "passes": passes,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "totals": {m: round(sum(best[m].values()), 2) for m in MODES},
        "per_entry": best,
        "results_equal_across_modes": not mismatches,
        "mismatches": [f"{m}:{n}" for m, n in mismatches],
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
