"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from ceres_spark.session import get_spark
from ceres_spark.sources.tables import TABLES


def _norm(rows, cols):
    import numpy as np

    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            # canonicalize numpy scalars so repr/sort keys are stable
            if isinstance(v, np.floating):
                v = float(v)
            elif isinstance(v, np.integer):
                v = int(v)
            elif isinstance(v, np.bool_):
                v = bool(v)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            else:
                vals.append(v)  # exact — determinism is the contract
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [r.asDict() for r in sdf.collect()]
        if sql is None:
            print(f"{name}: rows-only ({len(srows)} rows) — no oracle")
            continue
        ddf = con.execute(sql).fetchdf()
        dcols = list(ddf.columns)
        drows = ddf.to_dict("records")
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            status.append(f"ROWS spark={len(srows)} duck={len(drows)}")
        if not status:
            cols = sorted(scols)
            a, b = _norm(srows, cols), _norm(drows, cols)
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                status.append(f"VALUES first-diffs={diffs}")
        if status:
            failures += 1
            print(f"{name}: FAIL  {' | '.join(status)}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
