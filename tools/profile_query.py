"""Per-query isolation profiler (optimization r12, guide §1).

Times named registry queries in one warm session — min-of-N wall for
both the bench action (``count()``) and the noop sink (which computes
every column, guide §1.4) — and dumps ``explain('formatted')`` to a
plans directory so before/after plan shapes are diffable artifacts.

Usage:
    python tools/profile_query.py q1 q2 ... [--passes 3] \
        [--plans plans/r12 --suffix before] [--sf /root/testdata/sf0.1]

Prints one JSON line per query:
    {"q": name, "count_s": [..], "noop_s": [..], "exchanges": n,
     "plan_file": path}
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
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') into")
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix: <query>_<suffix>.txt")
    ap.add_argument("--no-noop", action="store_true",
                    help="skip the noop-sink passes (streaming entries "
                    "whose result must be collected before re-invoking)")
    args = ap.parse_args()

    spark = get_spark("profile-query")
    qs = entrymod.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # warm-up identical to bench.py: JVM/codegen + Python worker pool
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()

    for name in args.queries:
        fn = qs[name]
        rec: dict = {"q": name}
        counts = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            counts.append(round(time.perf_counter() - t0, 4))
        rec["count_s"] = counts
        if not args.no_noop:
            noops = []
            for _ in range(args.passes):
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.perf_counter()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                noops.append(round(time.perf_counter() - t0, 4))
            rec["noop_s"] = noops
        spark.sparkContext.setJobDescription(None)
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        rec["exchanges"] = plan.count("Exchange")
        rec["python_nodes"] = sum(
            plan.count(t) for t in
            ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
             "FlatMapGroupsInPandas", "MapInArrow"))
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            pf = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(pf, "w") as f:
                f.write(plan)
            rec["plan_file"] = pf
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
