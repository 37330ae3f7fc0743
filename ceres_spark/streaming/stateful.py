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
    ArrayType,
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


HOLT_STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("dev", DoubleType()),
        StructField("inited", LongType()),
    ]
)

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("forecast", DoubleType()),
        StructField("upper", DoubleType()),
        StructField("lower", DoubleType()),
        StructField("aberration", DoubleType()),
    ]
)


def holt_winters_stream(
    stream: DataFrame,
    alpha: float = 0.1,
    beta: float = 0.0035,
    dev_scale: float = 3.0,
) -> DataFrame:
    """Streaming twin of :func:`ceres_spark.operators.series
    .holt_winters`: the (level, trend, deviation) recurrence carried
    across micro-batches as explicit state, emitting forecast/band/
    aberration for every observation as it arrives — the online
    anomaly-detection shape (graphite holtWintersAberration as a
    live stream instead of a nightly batch).

    Equivalence with the batch operator on identically-ordered input
    is pytest-asserted (tests/test_stateful.py): same series fed in
    two micro-batches must produce bit-identical rows. Requires
    per-series batches to arrive in time order (the file/Kafka source
    contract used by the ingest path; late data belongs to the
    backfill route, streaming/ingest.py).
    """
    import math

    a, b, s = float(alpha), float(beta), float(dev_scale)

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        if state.exists:
            level, trend, d, inited = state.get
        else:
            level, trend, d, inited = math.nan, 0.0, 0.0, 0
        # ONE sort over the whole micro-batch: pandas chunks within a
        # group carry no cross-chunk ordering guarantee, and a
        # per-chunk sort would fold the recurrence out of time order
        # whenever a batch splits into multiple Arrow chunks
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts").reset_index(
                drop=True
            )
            vals = pdf["value"].to_numpy(dtype=float)
            n = len(vals)
            import numpy as np

            fc = np.full(n, np.nan)
            dev = np.full(n, np.nan)
            for i, v in enumerate(vals):
                if not inited:
                    if not np.isnan(v):
                        level = v
                        inited = 1
                    fc[i], dev[i] = v, 0.0
                    continue
                f = level + trend
                fc[i] = f
                dev[i] = d
                if not np.isnan(v):
                    d = a * abs(v - f) + (1 - a) * d
                    nl = a * v + (1 - a) * (level + trend)
                    trend = b * (nl - level) + (1 - b) * trend
                    level = nl
            upper = fc + s * dev
            lower = fc - s * dev
            with np.errstate(invalid="ignore"):
                ab = np.where(
                    vals > upper, vals - upper,
                    np.where(vals < lower, vals - lower, 0.0),
                )
            yield pd.DataFrame(
                {
                    "metric": metric,
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "forecast": fc,
                    "upper": upper,
                    "lower": lower,
                    "aberration": np.where(np.isnan(vals), 0.0, ab),
                }
            )
        state.update(
            (float(level), float(trend), float(d), int(inited))
        )

    return stream.groupBy("metric").applyInPandasWithState(
        _update,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_STATE_SCHEMA = StructType([StructField("ewma", DoubleType())])

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma_stream(stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming twin of :func:`ceres_spark.operators.series.ewma`:
    the ``e_i = α·v_i + (1−α)·e_{i-1}`` recurrence carried across
    micro-batches as ONE float of state per series — the cheapest
    possible stateful operator, and the live version of graphite's
    ``exponentialMovingAverage``.

    The update expression is written EXACTLY as the batch operator
    writes it (same ``a·v + (1−a)·state`` association, NaN marks the
    uninitialized state, gaps carry the average forward), so a
    time-ordered replay produces bit-identical doubles to the batch
    pass — which is what lets the replay entry share the batch
    recursive-CTE oracle. State store cost: 8 bytes per live series.
    """
    import math

    import numpy as np

    a = float(alpha)

    def _upd(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        st = state.get[0] if state.exists else math.nan
        if st is None:
            st = math.nan
        # one sort over the whole micro-batch — see holt_winters_stream
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts").reset_index(
                drop=True
            )
            vals = pdf["value"].to_numpy(dtype=float)
            out = np.empty_like(vals)
            for i, v in enumerate(vals):
                if not np.isnan(v):
                    st = v if np.isnan(st) else a * v + (1 - a) * st
                out[i] = st
            yield pd.DataFrame(
                {
                    "metric": metric,
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "ewma": out,
                }
            )
        state.update((float(st),))

    return stream.groupBy("metric").applyInPandasWithState(
        _upd,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream_tws(stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """:func:`ewma_stream` on Spark 4's ``transformWithStateInPandas``
    (the VERDICT r8 #4 probe): identical recurrence, identical output
    schema and doubles, but the state rides the new StatefulProcessor
    API (typed ``ValueState`` against the RocksDB provider — the
    replay default — instead of the applyInPandasWithState
    GroupState protocol).

    Why probe it: TIMINGS.md r8 itemized ~380 ms/batch of Python
    stateful overhead that survived the state-store provider flip;
    transformWithState is the API Spark is actively optimizing
    (SPARK-49564 umbrella), so the question is whether its per-batch
    protocol (state server over a local socket vs the inline
    state-in-the-plan protocol) prices differently at our
    toy-per-batch, many-batch replay shape. Measured head-to-head in
    tools/tws_probe.py; digest-equality with :func:`ewma_stream` is
    pytest-pinned when the dependency below exists. RocksDB provider
    REQUIRED (the HDFS provider does not implement the
    transformWithState operator family).

    AVAILABILITY GATE: Spark's TransformWithStateInPySpark runner
    speaks protobuf to its Python state server —
    ``StreamingPythonRunnerInitializationException: ImportError:
    cannot import name 'descriptor' from 'google.protobuf'`` on a
    box without the ``protobuf`` package (this container, probed r9
    — TIMINGS.md §r9). The import check below converts that
    mid-query crash into a loud, immediate NotImplementedError; the
    applyInPandasWithState twin (:func:`ewma_stream`) has no such
    dependency and stays the production path."""
    import math

    import numpy as np

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(Spark's Python state-server protocol); install protobuf "
            "or use ewma_stream (applyInPandasWithState), which is "
            "digest-identical"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    a = float(alpha)

    class _EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("ewma", EWMA_STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            (metric,) = key
            st = (
                self._st.get()[0]
                if self._st.exists()
                else math.nan
            )
            if st is None:
                st = math.nan
            # one sort over the whole micro-batch — same reasoning
            # as ewma_stream (chunks carry no cross-chunk order)
            chunks = list(rows)
            if chunks:
                pdf = pd.concat(chunks).sort_values("ts").reset_index(
                    drop=True
                )
                vals = pdf["value"].to_numpy(dtype=float)
                out = np.empty_like(vals)
                for i, v in enumerate(vals):
                    if not np.isnan(v):
                        st = v if np.isnan(st) else a * v + (1 - a) * st
                    out[i] = st
                yield pd.DataFrame(
                    {
                        "metric": metric,
                        "ts": pdf["ts"],
                        "value": pdf["value"],
                        "ewma": out,
                    }
                )
            self._st.update((float(st),))

        def close(self) -> None:
            pass

    return stream.groupBy("metric").transformWithStateInPandas(
        statefulProcessor=_EwmaProcessor(),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


HOLT_SEASONAL_STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("dev", DoubleType()),
        StructField("inited", LongType()),
        StructField("seasonals", ArrayType(DoubleType())),
    ]
)


def holt_winters_seasonal_stream(
    stream: DataFrame,
    season_length: int,
    step: int,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float = 0.1,
    dev_scale: float = 3.0,
) -> DataFrame:
    """Streaming twin of the SEASONAL
    :func:`ceres_spark.operators.series.holt_winters` (additive
    triple smoothing): level/trend/deviation plus the O(L) seasonal
    vector carried as explicit state across micro-batches. The
    seasonal phase is anchored to the timestamp
    (``j = (ts // step) % L``), so a restart resumes in phase and the
    batch operator on identically-ordered input is bit-equal
    (pytest-asserted, tests/test_stateful.py)."""
    import math

    import numpy as np

    a, b, g, s = float(alpha), float(beta), float(gamma), float(dev_scale)
    L, stp = int(season_length), int(step)

    def _upd(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        if state.exists:
            level, trend, d, inited, seas_l = state.get
            seas = np.asarray(seas_l, dtype=float)
        else:
            level, trend, d, inited = math.nan, 0.0, 0.0, 0
            seas = np.zeros(L)
        # one sort over the whole micro-batch — see holt_winters_stream
        chunks = list(pdfs)
        for pdf in ([pd.concat(chunks)] if chunks else []):
            pdf = pdf.sort_values("ts").reset_index(drop=True)
            vals = pdf["value"].to_numpy(dtype=float)
            idxs = (pdf["ts"].to_numpy(dtype=np.int64) // stp) % L
            n = len(vals)
            fc = np.full(n, np.nan)
            dev = np.full(n, np.nan)
            for i, v in enumerate(vals):
                if not inited:
                    if not np.isnan(v):
                        level = v
                        inited = 1
                    fc[i], dev[i] = v, 0.0
                    continue
                j = int(idxs[i])
                f = level + trend + seas[j]
                fc[i] = f
                dev[i] = d
                if not np.isnan(v):
                    d = g * abs(v - f) + (1 - g) * d
                    nl = a * (v - seas[j]) + (1 - a) * (level + trend)
                    trend = b * (nl - level) + (1 - b) * trend
                    seas[j] = g * (v - nl) + (1 - g) * seas[j]
                    level = nl
            upper = fc + s * dev
            lower = fc - s * dev
            with np.errstate(invalid="ignore"):
                ab = np.where(
                    vals > upper, vals - upper,
                    np.where(vals < lower, vals - lower, 0.0),
                )
            yield pd.DataFrame(
                {
                    "metric": metric,
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "forecast": fc,
                    "upper": upper,
                    "lower": lower,
                    "aberration": np.where(np.isnan(vals), 0.0, ab),
                }
            )
        state.update(
            (float(level), float(trend), float(d), int(inited),
             [float(x) for x in seas])
        )

    return stream.groupBy("metric").applyInPandasWithState(
        _upd,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_SEASONAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


# ---------------------------------------------------------------- CUSUM

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_hi", DoubleType()),
        StructField("s_lo", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("s_hi", DoubleType()),
        StructField("s_lo", DoubleType()),
        StructField("alarm", StringType()),
    ]
)


def make_cusum_update(mu0: float, slack: float, h: float):
    """Page's ONLINE CUSUM recursion (the sequential original — the
    batch twin at operators/series.cusum_changepoints uses the
    retrospective whole-series form):

        S⁺ ← max(0, S⁺ + (x − μ₀ − k))
        S⁻ ← max(0, S⁻ + (μ₀ − k − x))
        alarm when either exceeds h, then RESET that side

    μ₀ is the in-control reference mean, ``slack`` the k allowance,
    ``h`` the decision threshold — all deployment dials, exactly how
    the sequential test is parameterized in the SPC literature.
    State is three numbers per metric; rows inside a batch are
    processed in ts order, so replaying the same stream reproduces
    the same alarms bit-for-bit.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        s_hi, s_lo, last_ts = (
            state.get if state.exists else (0.0, 0.0, -1)
        )
        out = []
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for ts, value in zip(rows["ts"], rows["value"]):
            if value is None or pd.isna(value):
                continue
            s_hi = max(0.0, s_hi + (value - mu0 - slack))
            s_lo = max(0.0, s_lo + (mu0 - slack - value))
            alarm = ""
            if s_hi > h:
                alarm, s_hi = "high", 0.0
            if s_lo > h:
                alarm, s_lo = ("low", 0.0) if not alarm else ("both", 0.0)
            out.append((metric, int(ts), float(value), s_hi, s_lo, alarm))
            last_ts = int(ts)
        state.update((float(s_hi), float(s_lo), int(last_ts)))
        yield pd.DataFrame(
            out,
            columns=["metric", "ts", "value", "s_hi", "s_lo", "alarm"],
        )

    return update


def cusum_stream(
    stream: DataFrame, mu0: float, slack: float = 0.5, h: float = 5.0
) -> DataFrame:
    """Online CUSUM over a streaming (metric, ts, value) frame: one
    (s_hi, s_lo) pair of state per metric, alarms emitted in-stream.
    The state is O(1) per metric regardless of history length — the
    property that makes sequential CUSUM the streaming-native form
    (the batch form needs the whole series for its mean)."""
    return stream.groupBy("metric").applyInPandasWithState(
        make_cusum_update(float(mu0), float(slack), float(h)),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("rows_seen", LongType()),
    ]
)

KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("rows_seen", LongType()),
        StructField("n_tracked", LongType()),
        StructField("est_distinct", DoubleType()),
    ]
)


def kmv_stream(stream: DataFrame, k: int = 64) -> DataFrame:
    """Streaming twin of
    :func:`ceres_spark.operators.sketches.kmv_distinct`: a live
    distinct-user counter per event_type, maintained as a KMV sketch
    in the state store — ≤ ``k`` int64 hashes + one counter per
    group, emitted as (rows_seen, n_tracked, est_distinct) after each
    micro-batch.

    The state transition is pure set-union-then-truncate, which is
    COMMUTATIVE and IDEMPOTENT in the inputs — so the final sketch is
    bit-identical to the batch sketch REGARDLESS of how arrivals are
    batched or ordered. That is the mergeability property that makes
    KMV (like HLL) the warehouse streaming-distinct primitive, and
    it is exactly what the replay entry externally verifies: the
    last emission per group must hash-match the batch KMV SQL.

    The per-value hash is the same portable md5-low31 as the batch
    side (digest bytes 8..16 little-endian, masked to 31 bits), and
    the estimator double arithmetic is written term-for-term like the
    batch column expression — Python floats ARE IEEE doubles, so the
    emitted estimate is bit-equal across the three implementations
    (this stream, the Spark batch plan, the DuckDB oracle).
    """
    import hashlib

    kk = int(k)

    def _upd(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            hashes, rows_seen = set(state.get[0]), int(state.get[1])
        else:
            hashes, rows_seen = set(), 0
        for pdf in pdfs:
            vals = pdf["user_id"].dropna()
            rows_seen += int(len(vals))
            for v in vals:
                d = hashlib.md5(str(int(v)).encode()).digest()
                hashes.add(
                    int.from_bytes(d[8:16], "little") & 0x7FFFFFFF
                )
            if len(hashes) > kk:
                hashes = set(sorted(hashes)[:kk])
            n_tracked = min(len(hashes), kk)
            if n_tracked < kk:
                est = float(n_tracked)
            else:
                est = (kk - 1) * float(1 << 31) / sorted(hashes)[kk - 1]
            yield pd.DataFrame(
                {
                    "event_type": [etype],
                    "rows_seen": [rows_seen],
                    "n_tracked": [n_tracked],
                    "est_distinct": [est],
                }
            )
        state.update((sorted(hashes), rows_seen))

    return stream.groupBy("event_type").applyInPandasWithState(
        _upd,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
