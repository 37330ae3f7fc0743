"""TimeSeriesData — the reference's query-result type, for API-level
drop-in parity.

Reference: ``class TimeSeriesData`` (ceres.py ≈L903-960) holds
``(startTime, endTime, timeStep, values)`` where ``values`` is a
dense list with None for missing points; ``timestamps`` is
``range(start, end, step)``; iteration yields ``(timestamp, value)``
pairs; ``merge(other)`` fills only this series' None holes from the
other, dropping the other's out-of-range points.

The engine computes with DataFrames; this wrapper materializes a
dense result for callers written against the reference API (e.g.
graphite-web's fetch() consumers). It is a driver-side object by
design — the distributed form IS the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class TimeSeriesData:
    __slots__ = ("startTime", "endTime", "timeStep", "values")

    def __init__(self, startTime: int, endTime: int, timeStep: int, values):
        self.startTime = int(startTime)
        self.endTime = int(endTime)
        self.timeStep = int(timeStep)
        self.values = list(values)

    @property
    def timestamps(self):
        return range(self.startTime, self.endTime, self.timeStep)

    def __iter__(self):
        # (timestamp, value) pairs, zip-truncated like the reference
        return iter(zip(self.timestamps, self.values))

    def __len__(self):
        return len(self.values)

    def merge(self, other: "TimeSeriesData") -> None:
        """Fill self's None holes from ``other`` (self wins; other's
        out-of-range timestamps dropped) — ceres.py ≈L935."""
        for ts, value in other:
            if value is None:
                continue
            try:
                i = int((ts - self.startTime) / self.timeStep)
            except ZeroDivisionError:
                continue
            if 0 <= i < len(self.values) and self.values[i] is None:
                self.values[i] = value

    @classmethod
    def from_dense_df(
        cls,
        df: DataFrame,
        from_time: int,
        until_time: int,
        step: int,
        metric: str | None = None,
    ) -> "TimeSeriesData":
        """Materialize a dense read_series result (``metric, ts,
        value`` or ``ts, value``) into the reference result type."""
        cols = df.columns
        if metric is not None and "metric" in cols:
            df = df.filter(df["metric"] == metric)
        rows = df.select("ts", "value").collect()
        by_ts = {r["ts"]: r["value"] for r in rows}
        values = [
            by_ts.get(t) for t in range(int(from_time), int(until_time), int(step))
        ]
        return cls(from_time, until_time, step, values)
