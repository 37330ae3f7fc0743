"""E2E soak: ANN (IVF×PQ build+probe) + streaming flagship at x16/x64.

VERDICT r8 #8 extends the r8 composite-pipeline soak (tools/
e2e_soak.py) to the remaining two flagships, with the same REAL
executor REST metrics (input/shuffle bytes, spills, stage peak
memory), not wall time alone:

- ``topk_cosine_ivfpq`` end-to-end (train → build → probe → exact
  re-rank) over clustered corpora at x1/x16/x64 of the sf0.1
  embeddings cardinality (2k → 32k → 128k × 64-d), dialed by the
  FITTED deployment rule from docs/ANN.md §Scale: nlist ≈ 4√N,
  nprobe=16, refine = max(50, N/150).
- ``stream_windowed_rollup`` — the registry replay twin (file source
  → watermarked tumbling agg → foreachBatch, checkpoint included) —
  over synthesized x1/x16/x64 events.

Expected: shuffle bytes ~linear in corpus, zero disk spill, peak
stage memory sub-linear; streaming wall = fixed trigger overhead +
linear slope (batch count fixed at 4 by the harness).

Usage: python tools/flagship_soak.py [mults_csv]   (default 1,16,64)
Prints one JSON line per (entry, mult) and a summary line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_scale_probe import synth_vectors, write_corpus
from e2e_soak import get_ui_spark, run_measured
from scale_probe import synthesize

BASE = "/root/testdata/sf0.1"
BASE_N = 2000  # sf0.1 embeddings cardinality


def main() -> None:
    mults = [int(x) for x in (
        sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "16", "64"]
    )]
    spark = get_ui_spark()

    import __spark_entry__ as entrymod
    import ceres_spark.operators.ivfpq as ivfpq
    import ceres_spark.sources.tables as tbl
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    # warm-up: JVM/codegen/python workers + one replay (state store,
    # checkpoint machinery) so x1 isn't billed the cold start
    qs["topk_cosine_ivfpq"](spark, BASE).count()
    qs["stream_windowed_rollup"](spark, BASE).count()

    results = []
    for m in mults:
        n = BASE_N * m
        td = tempfile.mkdtemp(prefix=f"flagship_x{m}_")
        try:
            # --- ANN: clustered corpus at n vectors, fitted dials
            emb_path = f"{td}/embeddings.parquet"
            write_corpus(spark, synth_vectors(n), emb_path)
            emb = spark.read.parquet(emb_path)
            k_lists = max(8, int(4 * math.sqrt(n)))
            refine = max(50, n // 150)

            def ann():
                return ivfpq.topk_cosine_ivfpq(
                    emb,
                    emb.filter(F.col("vec_id") < 50),
                    k=10, k_lists=k_lists, nprobe=16, refine=refine,
                    cache_key=f"flagship_x{m}",
                ).count()

            r = run_measured("topk_cosine_ivfpq", ann)
            r.update({"mult": m, "n_vectors": n,
                      "k_lists": k_lists, "refine": refine})
            print(json.dumps(r), flush=True)
            results.append(r)

            # --- streaming: registry replay over synthesized events
            ev_rows = synthesize(spark, BASE, m, f"{td}/events.parquet")
            for name in tbl.TABLES:
                src = f"{BASE}/{name}.parquet"
                dst = f"{td}/{name}.parquet"
                if not os.path.exists(dst):
                    os.symlink(src, dst)
            r = run_measured(
                "stream_windowed_rollup",
                lambda: qs["stream_windowed_rollup"](spark, td).count(),
            )
            r.update({"mult": m, "n_events": ev_rows})
            print(json.dumps(r), flush=True)
            results.append(r)
        finally:
            shutil.rmtree(td, ignore_errors=True)

    print(json.dumps({
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "spill_anywhere": any(
            r["memoryBytesSpilled"] or r["diskBytesSpilled"]
            for r in results
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
