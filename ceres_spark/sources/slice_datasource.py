"""`ceres_slice` — a Spark 4 Python DataSource for the reference's
slice-file format (SURVEY.md §4's "custom piece that could pay":
``spark.read.format("ceres_slice").load(tree_root)``).

Complements ``slice_format.read_slice_tree`` (binaryFile +
mapInPandas): the DataSource form gives the format a first-class
name, pushes file discovery to planning time, and makes each slice
file ONE input partition — Spark schedules decode exactly like any
other file source (locality, task retry, dynamic allocation).

Format recap (ceres.py ≈L41-44, ≈L703): ``<start>@<step>.slice``
holds bare big-endian float64; timestamp of point i is implicit
``start + i*step``; NaN is the gap sentinel (→ NULL here); the
metric name is the node directory path with separators → dots.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SLICE_NAME = re.compile(r"^(\d+)@(\d+)\.slice$")

SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
    ]
)


class SliceFilePartition(InputPartition):
    def __init__(self, path: str, metric: str, start: int, step: int):
        self.path = path
        self.metric = metric
        self.start = start
        self.step = step


class CeresSliceReader(DataSourceReader):
    def __init__(self, options):
        self.root = os.path.abspath(options.get("path"))
        self.keep_nan = str(options.get("keepnan", "false")).lower() == "true"

    def partitions(self):
        parts = []
        for dirpath, _dirs, files in os.walk(self.root):
            for fname in files:
                m = SLICE_NAME.match(fname)
                if not m:
                    continue
                rel = os.path.relpath(dirpath, self.root)
                metric = "." if rel == "." else rel.replace(os.sep, ".")
                parts.append(
                    SliceFilePartition(
                        os.path.join(dirpath, fname),
                        metric,
                        int(m.group(1)),
                        int(m.group(2)),
                    )
                )
        return parts

    def read(self, partition: SliceFilePartition) -> Iterator[tuple]:
        import numpy as np

        with open(partition.path, "rb") as f:
            vals = np.frombuffer(f.read(), dtype=">f8")
        ts = partition.start + partition.step * np.arange(
            len(vals), dtype=np.int64
        )
        if not self.keep_nan:
            mask = ~np.isnan(vals)
            vals, ts = vals[mask], ts[mask]
        metric = partition.metric
        for t, v in zip(ts.tolist(), vals.tolist()):
            yield (metric, t, None if v != v else v)


class CeresSliceStreamReader(SimpleDataSourceStreamReader):
    """Tail a live ceres tree — the carbon-relay consumption pattern:
    a writer appends points to slice files (or creates new slices);
    each micro-batch emits exactly the datapoints appended since the
    last offset.

    Offset = ``{path: points_already_read}`` (JSON dict), so recovery
    replay (``readBetweenOffsets``) is an exact positional re-read —
    the same O(1) seek math as the batch reader (byte offset =
    points · 8, ceres.py ≈L750). In-place overwrites of already-read
    points are NOT re-emitted (the stream is append-ordered, like
    carbon's pickle protocol; LWW reconciliation stays a read-path
    concern)."""

    def __init__(self, options):
        self.root = os.path.abspath(options.get("path"))
        self.keep_nan = str(options.get("keepnan", "false")).lower() == "true"

    def _sizes(self) -> dict:
        sizes = {}
        for dirpath, _dirs, files in os.walk(self.root):
            for fname in files:
                if SLICE_NAME.match(fname):
                    p = os.path.join(dirpath, fname)
                    sizes[p] = os.path.getsize(p) // 8
        return sizes

    def initialOffset(self) -> dict:
        # start-of-stream = nothing read: replays existing history
        # first (use a checkpoint to resume instead)
        return {}

    def _rows_for(self, path: str, lo: int, hi: int):
        import numpy as np

        m = SLICE_NAME.match(os.path.basename(path))
        start, step = int(m.group(1)), int(m.group(2))
        rel = os.path.relpath(os.path.dirname(path), self.root)
        metric = "." if rel == "." else rel.replace(os.sep, ".")
        with open(path, "rb") as f:
            f.seek(lo * 8)
            vals = np.frombuffer(f.read((hi - lo) * 8), dtype=">f8")
        ts = start + step * (lo + np.arange(len(vals), dtype=np.int64))
        if not self.keep_nan:
            mask = ~np.isnan(vals)
            vals, ts = vals[mask], ts[mask]
        for t, v in zip(ts.tolist(), vals.tolist()):
            yield (metric, t, None if v != v else v)

    def read(self, start: dict):
        end = self._sizes()
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned rows for replay
        return list(self._emit(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._emit(start, end))

    def _emit(self, start: dict, end: dict) -> Iterator[tuple]:
        for path, hi in sorted(end.items()):
            lo = int(start.get(path, 0))
            if hi > lo and os.path.exists(path):
                yield from self._rows_for(path, lo, hi)


class CeresSliceDataSource(DataSource):
    """Usage::

        spark.dataSource.register(CeresSliceDataSource)
        df = spark.read.format("ceres_slice").load("/path/to/tree")
        live = spark.readStream.format("ceres_slice").load("/path/to/tree")
    """

    @classmethod
    def name(cls) -> str:
        return "ceres_slice"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return CeresSliceReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return CeresSliceStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CeresSliceDataSource)
