"""Custom stateful streaming operator (north-star §2.2:
"applyInPandasWithState for custom stateful operators").

Operator: per-metric running statistics over an event stream —
cumulative count/sum and last value, maintained as explicit state
across micro-batches. This is the shape every custom stateful ceres
extension takes (anomaly flags, rate-of-change, counters that the
reference's maintenance plugins computed offline).

Scale notes: state is per-group (metric), partitioned by the
streaming state store across executors; each micro-batch touches only
groups present in the batch. Timeouts would bound state for unbounded
key spaces (not needed for bounded metric sets).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts", LongType()),
        StructField("last_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", LongType()),
        StructField("last_value", DoubleType()),
    ]
)


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (metric,) = key
    if state.exists:
        n, total, last_ts, last_value = state.get
    else:
        n, total, last_ts, last_value = 0, 0.0, -1, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        idx = pdf["ts"].idxmax()
        if int(pdf["ts"].loc[idx]) >= last_ts:
            last_ts = int(pdf["ts"].loc[idx])
            last_value = float(pdf["value"].loc[idx])
    state.update((n, total, last_ts, last_value))
    yield pd.DataFrame(
        {
            "metric": [metric],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [last_ts],
            "last_value": [last_value],
        }
    )


def running_stats_stream(stream: DataFrame) -> DataFrame:
    """Attach the stateful running-stats operator to a streaming
    DataFrame with columns (metric string, ts long, value double).
    Emits the updated per-metric totals every micro-batch."""
    return stream.groupBy("metric").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
