"""Core-scaling probe at a synthetic larger SF (optimization r13,
VERDICT r12 #7 / "What's wrong" #5): the sf0.1 inputs are one parquet
row group per table, so the driver's c8-vs-c32 scaling block mostly
measures fixed costs. This probe synthesizes an N× documents table
(doc_id-offset copies — same %-cycle contracts, more volume, multiple
row groups) next to the untouched sf0.1 side tables, then times the
named CPU-heavy registry entries at two core counts in SEPARATE
processes (a local[k] master is fixed per JVM).

Usage:
  python tools/core_scaling_probe.py --mult 10 \
      --queries phash_neardup,audio_neardup,... [--passes 2]
  (run once; it spawns the per-core-count child processes itself)

Writes one JSON line: per query, min wall at each core count and the
c32/c8 speedup. Builder-side measurement only — nothing here touches
the driver fixtures or the bench contract.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = "--child-run"


def synthesize(mult: int, base: str, out_dir: str) -> None:
    """N× documents via doc_id-offset copies (offset = a power of 10
    above max id × copy index, so every doc_id % k cycle pattern keeps
    cycling); other tables copied through untouched."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(base):
        if name != "documents.parquet":
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(base, name), dst)
    con = duckdb.connect()
    max_id = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    off = 1
    while off <= max_id:
        off *= 10
    cols = [
        r[0]
        for r in con.execute(
            f"SELECT * FROM read_parquet('{base}/documents.parquet') LIMIT 0"
        ).description
    ]
    parts = " UNION ALL ".join(
        f"SELECT doc_id + {i * off} AS doc_id, "
        + ", ".join(c for c in cols if c != "doc_id")
        + f" FROM read_parquet('{base}/documents.parquet')"
        for i in range(mult)
    )
    con.execute(
        f"COPY ({parts}) TO '{out_dir}/documents.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 20000)"
    )


def child(sf_dir: str, names: list[str], passes: int) -> None:
    import time

    import __spark_entry__ as entrymod
    from ceres_spark.session import get_spark

    spark = get_spark("core-scaling-probe")
    qs = entrymod.queries()
    entrymod.entry(spark).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    out = {}
    for n in names:
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
        out[n] = ts
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument(CHILD, dest="child_sf", default=None)
    args = ap.parse_args()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    if args.child_sf:
        child(args.child_sf, names, args.passes)
        return

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/ceres_scaleprobe_sf{args.mult}x"
    synthesize(args.mult, base, out_dir)

    results = {}
    for cpus in [c.strip() for c in args.cpus.split(",")]:
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--queries",
                args.queries,
                "--passes",
                str(args.passes),
                CHILD,
                out_dir,
            ],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [
            l for l in proc.stdout.splitlines() if l.startswith("CHILD_RESULT ")
        ]
        if not line:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child at cpus={cpus} produced no result")
        results[cpus] = json.loads(line[-1][len("CHILD_RESULT "):])

    cl, ch = [c.strip() for c in args.cpus.split(",")]
    print(
        json.dumps(
            {
                "mult": args.mult,
                "sf_dir": out_dir,
                "per_query": {
                    n: {
                        f"c{cl}_passes": results[cl][n],
                        f"c{ch}_passes": results[ch][n],
                        "speedup_high_over_low": round(
                            min(results[cl][n]) / min(results[ch][n]), 2
                        ),
                    }
                    for n in names
                },
            }
        )
    )


if __name__ == "__main__":
    main()
