"""Legacy ceres slice-file reader — migration-compat source.

Reference format (ceres.py ≈L41-44, ≈L703-900 CeresSlice): a node
directory holds files named ``<startTime>@<timeStep>.slice`` whose
body is a bare array of big-endian float64 (``DATAPOINT_FORMAT='!d'``,
8 bytes/point, no header, no compression); the timestamp of point i
is ``startTime + i*timeStep`` (implicit), gaps are packed NaN, and
the metric name is the directory path with ``os.sep`` → ``.``
(CeresTree.getNodePath ≈L160).

Spark-native read: ``spark.read.format("binaryFile")`` lists and
ships whole slice files to executors (distributed, no driver I/O);
a ``mapInPandas`` kernel decodes each file with one vectorized
``numpy.frombuffer('>f8')`` + ``arange`` — no per-point Python. NaN
becomes NULL at this boundary exactly like ``CeresSlice.read``
(≈L760), so downstream operators never see NaN.

This is the migration path: point it at a real ceres tree root and
append the result into the engine's points table.
"""

from __future__ import annotations

import os
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLICE_NAME = re.compile(r"^(\d+)@(\d+)\.slice$")

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("arrival_seq", T.LongType(), False),
    ]
)


def write_slice(path: str, start_time: int, time_step: int, values) -> str:
    """Test/migration helper: write a reference-format slice file
    (big-endian float64, None → NaN) named ``<start>@<step>.slice``."""
    fname = os.path.join(path, f"{int(start_time)}@{int(time_step)}.slice")
    packed = b"".join(
        struct.pack("!d", float("nan") if v is None else float(v))
        for v in values
    )
    with open(fname, "wb") as f:
        f.write(packed)
    return fname


def read_slice_tree(
    spark: SparkSession, root: str, keep_nan: bool = False
) -> DataFrame:
    """Read every ``*.slice`` under a ceres tree root into the tall
    points model ``(metric, ts, value, arrival_seq=0)``.

    Decoding runs in executors via mapInPandas (Arrow batches of
    (path, content)); each file is one numpy frombuffer — the
    per-point cost is pure vectorized C.
    """
    root = os.path.abspath(root)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.slice")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_metric, out_ts, out_val = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                fs_path = path[len("file:") :] if path.startswith("file:") else path
                rel = os.path.relpath(os.path.dirname(fs_path), root)
                metric = rel.replace(os.sep, ".")  # getNodePath ≈L160
                m = SLICE_NAME.match(os.path.basename(fs_path))
                if not m:
                    continue
                start, step = int(m.group(1)), int(m.group(2))
                vals = np.frombuffer(content, dtype=">f8").astype(np.float64)
                ts = start + step * np.arange(len(vals), dtype=np.int64)
                if not keep_nan:
                    mask = ~np.isnan(vals)
                    vals, ts = vals[mask], ts[mask]
                out_metric.append(np.full(len(ts), metric, dtype=object))
                out_ts.append(ts)
                out_val.append(vals)
            if out_ts:
                yield pd.DataFrame(
                    {
                        "metric": np.concatenate(out_metric),
                        "ts": np.concatenate(out_ts),
                        "value": np.concatenate(out_val),
                        "arrival_seq": 0,
                    }
                )

    return files.mapInPandas(decode, schema=POINTS_SCHEMA)


def export_slice_tree(
    spark: SparkSession, points: DataFrame, root: str, time_step: int = 60
) -> int:
    """Inverse migration: engine points → reference-format slice
    files (one node dir per metric, contiguous runs split into slices
    exactly like CeresNode.write routes them, gaps inside a slice
    materialized as packed NaN ≤ MAX_SLICE_GAP=80 points, larger gaps
    → new slice — ceres.py ≈L45/L640). Returns slices written.

    DISTRIBUTED: one task per metric node (``applyInPandas`` over
    ``groupBy(metric)``) — node directories are disjoint, so writers
    never collide, and a 100 TB export fans out across executors
    instead of funnelling through a driver collect. Requires ``root``
    on a filesystem the executors can write (shared mount; trivially
    true on local[*]). Inside a task the run split + NaN padding is
    pure numpy (diff/split/scatter), no per-point Python.

    Precondition (same as the reference's write path, which quantizes
    every timestamp before packing, ceres.py ≈L470): ``ts`` on the
    ``time_step`` grid. Duplicate (metric, ts) must be resolved
    upstream (compact/LWW) — the scatter write is last-wins.
    """
    MAX_SLICE_GAP = 80  # ceres.py ≈L45
    step = int(time_step)
    root_abs = os.path.abspath(root)
    os.makedirs(root_abs, exist_ok=True)

    def write_node(pdf: pd.DataFrame) -> pd.DataFrame:
        metric = pdf["metric"].iloc[0]
        node_dir = os.path.join(root_abs, *metric.split("."))
        os.makedirs(node_dir, exist_ok=True)
        order = np.argsort(pdf["ts"].to_numpy(), kind="stable")
        ts = pdf["ts"].to_numpy()[order].astype(np.int64)
        vals = pdf["value"].to_numpy()[order].astype(np.float64)
        gap_pts = (np.diff(ts) // step) - 1  # whole missing grid slots
        breaks = np.nonzero(gap_pts > MAX_SLICE_GAP)[0] + 1
        n = 0
        for seg in np.split(np.arange(len(ts)), breaks):
            sts, svals = ts[seg], vals[seg]
            start = int(sts[0])
            idx = (sts - start) // step
            arr = np.full(int(idx[-1]) + 1, np.nan)
            arr[idx] = svals
            fname = os.path.join(node_dir, f"{start}@{step}.slice")
            with open(fname, "wb") as f:
                f.write(arr.astype(">f8").tobytes())  # '!d' packing
            n += 1
        return pd.DataFrame({"metric": [metric], "n_slices": [n]})

    per_node = (
        points.filter(F.col("value").isNotNull())
        .select("metric", "ts", "value")
        .groupBy("metric")
        .applyInPandas(write_node, "metric string, n_slices long")
    )
    total = per_node.agg(F.sum("n_slices")).collect()[0][0]
    return int(total or 0)


def migrate_tree(
    spark: SparkSession, slice_root: str, target_points_path: str
) -> None:
    """One-shot migration: legacy tree → date-partitioned points
    table (the engine's storage layout, tree.py)."""
    pts = read_slice_tree(spark, slice_root).withColumn(
        "date", F.to_date(F.timestamp_seconds(F.col("ts")))
    )
    pts.write.mode("append").partitionBy("date").parquet(target_points_path)


def slicecheck(root: str) -> list[dict]:
    """bin/slicecheck parity (op #9): validate a legacy slice tree's
    file-level invariants — driver-side fsck over file METADATA (the
    reference tool is a local script; point it at one node or a whole
    tree). Checks per ``*.slice``:

    - name parses as ``<startTime>@<timeStep>.slice``
    - body size is a multiple of 8 (whole big-endian float64 points)
    - startTime sits on the timeStep grid (the write path quantizes
      every timestamp, ceres.py ≈L470, so a misaligned start means
      corruption)
    - same-step slices within a node must not overlap
      (``start + n_points*step`` ≤ next start — CeresNode.read
      assumes disjoint, newest-first slices)

    Returns a list of ``{"file": ..., "problem": ...}`` (empty =
    clean), like the reference prints one line per problem.
    """
    problems: list[dict] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        per_step: dict[int, list[tuple[int, int, str]]] = {}
        for name in sorted(filenames):
            if not name.endswith(".slice"):
                continue
            fp = os.path.join(dirpath, name)
            m = SLICE_NAME.match(name)
            if not m:
                problems.append({"file": fp, "problem": "unparseable name"})
                continue
            start, step = int(m.group(1)), int(m.group(2))
            size = os.path.getsize(fp)
            if step <= 0:
                problems.append({"file": fp, "problem": "timeStep <= 0"})
                continue
            ok = True
            if size % 8:
                problems.append(
                    {"file": fp, "problem": f"size {size} not a multiple of 8"}
                )
                ok = False
            if start % step:
                problems.append(
                    {"file": fp, "problem": "startTime off the timeStep grid"}
                )
                ok = False
            if ok:  # invalid slices are reported once, not cascaded
                per_step.setdefault(step, []).append((start, size // 8, fp))
        for step, slices in per_step.items():
            slices.sort()
            for (s1, n1, f1), (s2, _n2, f2) in zip(slices, slices[1:]):
                if s1 + n1 * step > s2:
                    problems.append(
                        {
                            "file": f2,
                            "problem": f"overlaps {os.path.basename(f1)}",
                        }
                    )
    return problems
