"""End-to-end flagship soak at 64× (VERDICT r7 #6): the 100 TB
mandate has been graded per-operator so far; this runs the two
COMPOSITE flagships — ``dedup_materialize`` (near-dup pairs →
connected components → quality keeper) and ``corpus_pipeline``
(quality gate → exact dedup → per-language stats) — at x1/x16/x64
constant-duplicate-density document corpora and records REAL Spark
metrics per run, not wall time alone: input bytes, shuffle read/write
bytes, memory/disk spill, and stage peak execution memory, harvested
from the status REST API of a UI-enabled session.

The claims this probes: wall time and shuffle bytes should grow
~linearly with the corpus (the near-dup pair set is linear by the
dup_rate construction), and NOTHING should spill to disk at any
multiple on a 128 GiB local[32] box.

Usage: python tools/e2e_soak.py [mults_csv] [dup_rate]
Prints one JSON line per (entry, mult) and a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

UI_PORT = 4071


def get_ui_spark():
    """session.py's configs + the status UI (ceres_spark.session
    disables the UI; the soak needs its REST metrics)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("e2e-soak")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


_APP = {}


def stage_metrics() -> dict[int, dict]:
    if "id" not in _APP:
        _APP["id"] = _rest("applications")[0]["id"]
    out = {}
    for st in _rest(f"applications/{_APP['id']}/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


SUM_FIELDS = (
    "inputBytes", "shuffleReadBytes", "shuffleWriteBytes",
    "memoryBytesSpilled", "diskBytesSpilled",
)


def run_measured(name: str, fn) -> dict:
    before = stage_metrics()
    t0 = time.perf_counter()
    rows = fn()
    wall = round(time.perf_counter() - t0, 2)
    after = stage_metrics()
    new = [v for k, v in after.items() if k not in before]
    agg = {f: sum(int(s.get(f, 0)) for s in new) for f in SUM_FIELDS}
    peak = max(
        (int(s.get("peakExecutionMemory", 0)) for s in new), default=0
    )
    return {
        "entry": name,
        "wall_sec": wall,
        "rows": rows,
        "n_stages": len(new),
        "peak_execution_memory_mb": round(peak / 2**20, 1),
        **{f: agg[f] for f in SUM_FIELDS},
    }


def main() -> None:
    mults = [int(x) for x in (
        sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "16", "64"]
    )]
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    base = "/root/testdata/sf0.1"
    spark = get_ui_spark()

    import __spark_entry__ as entrymod
    from scale_probe import synthesize_docs

    qs = entrymod.queries()
    entries = ("dedup_materialize", "corpus_pipeline")
    # warm-up: JVM/codegen + python worker pool on the base corpus
    for e in entries:
        qs[e](spark, base).count()
    results = []
    for m in mults:
        td = tempfile.mkdtemp(prefix=f"soak_x{m}_")
        try:
            import ceres_spark.sources.tables as tbl

            for name in tbl.TABLES:
                src = f"{base}/{name}.parquet"
                dst = f"{td}/{name}.parquet"
                if name != "documents":
                    os.symlink(src, dst)
            n_docs = synthesize_docs(
                spark, base, m, f"{td}/documents.parquet",
                dup_rate=dup_rate,
            )
            for e in entries:
                r = run_measured(
                    f"{e}", lambda: qs[e](spark, td).count()
                )
                r.update({"mult": m, "n_docs": n_docs})
                print(json.dumps(r), flush=True)
                results.append(r)
        finally:
            shutil.rmtree(td, ignore_errors=True)
    print(json.dumps({
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "dup_rate": dup_rate,
        "spill_anywhere": any(
            r["memoryBytesSpilled"] or r["diskBytesSpilled"]
            for r in results
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
