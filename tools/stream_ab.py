"""Interleaved A/B of one-or-more session confs over named registry
entries (optimization r13): alternates the two conf states pass by
pass in ONE warm session, which cancels host drift — the batch-16 r12
methodology, generalized to confs.

Usage:
  python tools/stream_ab.py --queries q1,q2 --rounds 3 \
      --conf spark.foo=bar[,spark.baz=qux]   # the "B" state; "A" is
                                             # the session default
Prints one JSON line: per query, min + all passes for A and B.
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
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--conf", required=True,
                    help="comma-separated key=value list for the B state")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    confs = dict(kv.split("=", 1) for kv in args.conf.split(","))

    spark = get_spark("ceres-spark-stream-ab")
    qs = entrymod.queries()
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()

    saved = {k: spark.conf.get(k, None) for k in confs}
    res: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for _ in range(args.rounds):
        for mode in ("A", "B"):
            for k, v in confs.items():
                if mode == "B":
                    spark.conf.set(k, v)
                elif saved[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, saved[k])
            for n in names:
                t0 = time.perf_counter()
                qs[n](spark, args.sf_dir).count()
                res[n][mode].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "conf_B": confs,
        "per_query": {
            n: {
                "A_min": min(d["A"]), "B_min": min(d["B"]),
                "B_over_A": round(min(d["B"]) / min(d["A"]), 3),
                "A": d["A"], "B": d["B"],
            }
            for n, d in res.items()
        },
        "total_A_min": round(sum(min(d["A"]) for d in res.values()), 3),
        "total_B_min": round(sum(min(d["B"]) for d in res.values()), 3),
    }))


if __name__ == "__main__":
    main()
