"""Graphite render-target front door: AST → one composed DataFrame
plan over the operator layer.

VERDICT r11 "What's missing" #1: the engine ships ~65 render
functions as Python operators, but a graphite user writes
``aliasByNode(sumSeries(web.*.cpu),1)`` — a nested function-call
STRING (graphite-web ``evaluateTarget``, the layer above ceres.py
≈L310 ``fetch``; public knowledge, SURVEY §0 provenance caveat).
This module closes that gap: :func:`render` parses the target
(:mod:`plans.target`), resolves metric path leaves through the glob
layer (:mod:`plans.glob`), and composes the registered function
adapters into ONE declarative DataFrame plan — Catalyst sees the
whole tree, so filter pushdown / column pruning / broadcast sizing
work across function boundaries exactly as if the user had written
the composition by hand.

Scope (wave 1, per the r11 verdict): the shipped operator-layer
function names with scalar / int / string arguments — ~45 graphite
names over the series surface. Unsupported names raise
:class:`InvalidRequest` loudly with the supported list.

Semantics notes:

- **Series frame contract**: every function consumes and produces
  ``(metric string, ts bigint, value double)``. Path leaves resolve
  against the context's bucketed points frame (LWW-deduped, range-
  filtered at the scan). The frame is as stored — sparse where the
  store is sparse; callers wanting graphite's dense-slot view densify
  before rendering (``tree.read`` / ``series.densify``).
- **Naming**: graphite rewrites series names through most functions
  (``scale(web.cpu,2)``); adapters reproduce that with engine-side
  string ops, using ``%g`` for numeric args like graphite's
  ``%g``-style formatting, and combinators name their single output
  after the canonical argument expression (:func:`format_expr`).
  Transcribed from public graphite-web 1.1.x conventions — same
  re-verify caveat as ema_window (SURVEY §2.11).
- **Ordering**: graphite series lists are ordered; DataFrames are
  not. Sort functions (``sortByName``/``sortByTotal``/
  ``sortByMaxima``/``sortByMinima``) attach a series-cardinality
  ORDER frame that ``limit(n)`` consumes; ``limit`` without a
  preceding sort falls back to graphite's stable natural order
  (metric name). All ordering ranks ride the operator layer's
  guarded unpartitioned windows (MAX_RANKED_SERIES family) — series
  cardinality, never point cardinality.
- **100 TB shape**: path resolution is a pushed-down ``rlike`` +
  ts-range predicate on the points scan; series-selection gates
  (averageAbove, maximumBelow, …) are series-cardinality aggregates
  broadcast back as semi-joins; combinators are single map-side-
  combinable grouped aggregates with the repo's decimal-determinism
  idiom; no function introduces a cartesian product or an unguarded
  global sort (machine-checked by tests/test_plan_audit.py across
  the composed registry entries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import ceres_spark.operators.series as ser
from ceres_spark.errors import InvalidRequest
from ceres_spark.plans.glob import expand_braces, glob_to_regex_body
from ceres_spark.plans.target import Call, Path, parse_target

__all__ = [
    "RenderContext",
    "render",
    "format_expr",
    "parse_interval",
    "supported_functions",
]

_SERIES_COLS = ("metric", "ts", "value")

_INTERVAL_RX = re.compile(r"^([+-]?)(\d+)([a-zA-Z]+)$")
_UNIT_SECONDS = {
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
    "mon": 2592000, "month": 2592000, "months": 2592000,
    "y": 31536000, "year": 31536000, "years": 31536000,
}


def parse_interval(text: str | int, *, implied_minus: bool = False) -> int:
    """graphite ``parseTimeOffset``: ``"1h"`` → 3600, ``"10min"`` →
    600; months are 30 days, years 365 (graphite's calendar). An
    already-numeric argument passes through as seconds. With
    ``implied_minus`` (timeShift), an unsigned string means the past:
    ``"1d"`` → −86400 while ``"+1d"`` → +86400."""
    if isinstance(text, (int, float)) and not isinstance(text, bool):
        return int(text)
    m = _INTERVAL_RX.match(str(text).strip())
    if not m:
        raise InvalidRequest(f"unparseable interval: {text!r}")
    sign_s, num, unit = m.groups()
    secs = int(num) * _UNIT_SECONDS.get(unit.lower(), 0)
    if unit.lower() not in _UNIT_SECONDS:
        raise InvalidRequest(f"unknown interval unit {unit!r} in {text!r}")
    if sign_s == "-" or (sign_s == "" and implied_minus):
        return -secs
    return secs


def _fmt_g(x) -> str:
    """graphite's ``%g`` numeric formatting in rewritten names."""
    if isinstance(x, bool):
        return "True" if x else "False"
    if isinstance(x, int):
        return str(x)
    return "%g" % x


def format_expr(node) -> str:
    """Canonical target-string rendering of an AST — the text
    combinators use to name their output series, matching graphite's
    convention of naming after the argument expression."""
    if isinstance(node, Path):
        return node.pattern
    if isinstance(node, Call):
        parts = [format_expr(a) for a in node.args]
        parts += [f"{k}={format_expr(v)}" for k, v in node.kwargs]
        return f"{node.name}({','.join(parts)})"
    if isinstance(node, str):
        return f'"{node}"'
    if node is None:
        return "None"
    if isinstance(node, bool):
        return "True" if node else "False"
    return _fmt_g(node)


class SeriesFrame:
    """An evaluated series-list value: the data frame plus the
    expression text it came from (for graphite naming) and an
    optional series-cardinality order frame (metric, _order) set by
    sort functions and consumed by limit()."""

    __slots__ = ("df", "expr", "order")

    def __init__(
        self, df: DataFrame, expr: str, order: DataFrame | None = None
    ):
        self.df = df.select(*_SERIES_COLS)
        self.expr = expr
        self.order = order

    def with_df(self, df: DataFrame, *, keep_order: bool = False):
        """Derived frame; name-preserving transforms may keep the
        order frame, anything that rewrites names drops it."""
        return SeriesFrame(
            df, self.expr, self.order if keep_order else None
        )


class RenderContext:
    """Everything a target needs to evaluate: the session, the
    bucketed points frame leaves resolve against, the request range,
    and the series step (for scaleToSeconds / hitcount)."""

    def __init__(
        self,
        spark: SparkSession,
        series: DataFrame,
        from_time: int | None = None,
        until_time: int | None = None,
        step: int = 60,
    ):
        self.spark = spark
        self.series = series.select(*_SERIES_COLS)
        self.from_time = from_time
        self.until_time = until_time
        self.step = int(step)

    def fetch(self, pattern: str) -> SeriesFrame:
        """Resolve one metric path expression: brace alternation →
        per-alternative glob regex → ONE pushed-down rlike predicate
        (plus the request ts range) on the points scan."""
        bodies = [
            glob_to_regex_body(alt) for alt in expand_braces(pattern)
        ]
        rx = "^(" + "|".join(bodies) + ")$"
        df = self.series.filter(F.col("metric").rlike(rx))
        if self.from_time is not None:
            df = df.filter(F.col("ts") >= F.lit(int(self.from_time)))
        if self.until_time is not None:
            df = df.filter(F.col("ts") < F.lit(int(self.until_time)))
        return SeriesFrame(df, pattern)


# --------------------------------------------------------------------
# adapter helpers
# --------------------------------------------------------------------


def _wrap_name(df: DataFrame, fn: str, *suffix_parts: str) -> DataFrame:
    """graphite's per-series rename: ``name`` → ``fn(name[,args])``
    as an engine-side string op (deterministic, oracle-expressible as
    the same concat)."""
    tail = ("," + ",".join(suffix_parts)) if suffix_parts else ""
    return df.withColumn(
        "metric",
        F.concat(F.lit(fn + "("), F.col("metric"), F.lit(tail + ")")),
    )


def _value_map(sf: SeriesFrame, col, fn: str, *suffix: str) -> SeriesFrame:
    """Per-point transform + graphite rename (order frame dropped —
    names changed)."""
    out = sf.df.withColumn("value", col)
    return SeriesFrame(_wrap_name(out, fn, *suffix), sf.expr)


def _pick(sf: SeriesFrame, op_df: DataFrame, value_col: str,
          fn: str, *suffix: str) -> SeriesFrame:
    """Reuse an operator-layer frame: select its ``value_col`` as the
    new value, rename per graphite."""
    out = op_df.select(
        "metric", "ts", F.col(value_col).cast("double").alias("value")
    )
    return SeriesFrame(_wrap_name(out, fn, *suffix), sf.expr)


def _semi(sf: SeriesFrame, keep: DataFrame) -> SeriesFrame:
    """Series-selection gate: semi-join the point frame against a
    series-cardinality keep set (broadcast — the big side never
    shuffles). Selection functions do NOT rename in graphite, so the
    order frame survives."""
    return sf.with_df(
        sf.df.join(F.broadcast(keep.select("metric")), "metric", "semi"),
        keep_order=True,
    )


_DEC = lambda c: c.cast("string").cast("decimal(30,10)")  # noqa: E731
_DEC2DBL = lambda c: c.cast("string").cast("double")  # noqa: E731


def _series_arg(v, what: str) -> SeriesFrame:
    if not isinstance(v, SeriesFrame):
        raise InvalidRequest(f"{what} expects a series argument")
    return v


def _single_series_per_ts(df: DataFrame, fn: str) -> DataFrame:
    """Collapse a frame asserted to hold ONE series to (ts, value),
    with an in-plan raise if the assertion is violated (the
    divide/multiply divisor contract — graphite errors on a
    multi-series divisor too)."""
    g = df.filter(F.col("value").isNotNull()).groupBy("ts").agg(
        F.count("*").alias("_n"), F.max("value").alias("_v")
    )
    return g.select(
        "ts",
        F.when(F.col("_n") == 1, F.col("_v"))
        .otherwise(
            F.raise_error(F.lit(
                f"{fn}: argument must resolve to exactly one series"
            ))
        )
        .alias("_v"),
    )


def _name_rank(df: DataFrame) -> DataFrame:
    """Fallback natural order for limit(): rank distinct series by
    name — an unpartitioned row_number over the SERIES-cardinality
    distinct-metric frame, behind the MAX_RANKED_SERIES loud guard
    (the sort_by_extrema precedent)."""
    from pyspark.sql.window import Window

    ranked = (
        df.select("metric")
        .distinct()
        .select(
            "metric",
            F.row_number().over(Window.orderBy("metric")).alias("_r"),
        )
    )
    return ranked.select(
        "metric",
        F.when(
            F.col("_r") <= ser.MAX_RANKED_SERIES, F.col("_r")
        )
        .otherwise(
            F.raise_error(F.lit(
                "render limit(): more than "
                f"{ser.MAX_RANKED_SERIES} series — panel-ordering "
                "primitive (unpartitioned rank); pre-filter the "
                "series list first"
            ))
        )
        .alias("_order"),
    )


# --------------------------------------------------------------------
# function adapters — graphite name → composer
# --------------------------------------------------------------------

FUNCTIONS: dict = {}


def _register(*names):
    def deco(fn):
        for n in names:
            FUNCTIONS[n] = fn
        return fn
    return deco


# ---- per-point transforms ------------------------------------------


@_register("scale")
def _scale(ctx, sf, factor):
    sf = _series_arg(sf, "scale")
    return _value_map(
        sf, F.col("value") * F.lit(float(factor)), "scale", _fmt_g(factor)
    )


@_register("offset")
def _offset(ctx, sf, c):
    sf = _series_arg(sf, "offset")
    return _value_map(
        sf, F.col("value") + F.lit(float(c)), "offset", _fmt_g(c)
    )


@_register("absolute")
def _absolute(ctx, sf):
    sf = _series_arg(sf, "absolute")
    return _value_map(sf, F.abs(F.col("value")), "absolute")


@_register("invert")
def _invert(ctx, sf):
    sf = _series_arg(sf, "invert")
    # graphite: 1/v if v else None — zero inverts to None, not ±inf
    return _value_map(
        sf,
        F.when(F.col("value") != 0.0, F.lit(1.0) / F.col("value")),
        "invert",
    )


@_register("transformNull")
def _transform_null(ctx, sf, default=0):
    sf = _series_arg(sf, "transformNull")
    return _value_map(
        sf,
        F.coalesce(F.col("value"), F.lit(float(default))),
        "transformNull",
        _fmt_g(default),
    )


@_register("isNonNull")
def _is_non_null(ctx, sf):
    sf = _series_arg(sf, "isNonNull")
    return _value_map(
        sf,
        F.col("value").isNotNull().cast("int").cast("double"),
        "isNonNull",
    )


@_register("removeAboveValue")
def _remove_above_value(ctx, sf, n):
    sf = _series_arg(sf, "removeAboveValue")
    return _value_map(
        sf,
        F.when(F.col("value") <= F.lit(float(n)), F.col("value")),
        "removeAboveValue",
        _fmt_g(n),
    )


@_register("removeBelowValue")
def _remove_below_value(ctx, sf, n):
    sf = _series_arg(sf, "removeBelowValue")
    return _value_map(
        sf,
        F.when(F.col("value") >= F.lit(float(n)), F.col("value")),
        "removeBelowValue",
        _fmt_g(n),
    )


@_register("timeSlice")
def _time_slice(ctx, sf, start, end):
    sf = _series_arg(sf, "timeSlice")
    lo, hi = int(start), int(end)
    return _value_map(
        sf,
        F.when(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
            F.col("value"),
        ),
        "timeSlice",
        str(lo),
        str(hi),
    )


@_register("scaleToSeconds")
def _scale_to_seconds(ctx, sf, seconds):
    sf = _series_arg(sf, "scaleToSeconds")
    factor = float(seconds) / float(ctx.step)
    return _value_map(
        sf,
        F.col("value") * F.lit(factor),
        "scaleToSeconds",
        _fmt_g(int(seconds)),
    )


@_register("offsetToZero")
def _offset_to_zero(ctx, sf):
    sf = _series_arg(sf, "offsetToZero")
    return _pick(
        sf, ser.offset_to_zero(sf.df), "offset_to_zero", "offsetToZero"
    )


@_register("delay")
def _delay(ctx, sf, steps):
    sf = _series_arg(sf, "delay")
    return _pick(
        sf,
        ser.offset_to_zero(sf.df, delay_steps=int(steps)),
        "delayed",
        "delay",
        str(int(steps)),
    )


@_register("timeShift")
def _time_shift(ctx, sf, shift):
    sf = _series_arg(sf, "timeShift")
    # graphite: unsigned means the PAST; points from t-delta are
    # relabeled onto t, i.e. ts_out = ts - delta
    delta = parse_interval(shift, implied_minus=True)
    out = ser.time_shift(sf.df, -delta)
    return SeriesFrame(
        _wrap_name(out, "timeShift", f'"{shift}"'), sf.expr
    )


# ---- sequential / windowed (operator reuse) ------------------------


@_register("derivative")
def _derivative(ctx, sf):
    sf = _series_arg(sf, "derivative")
    return _pick(
        sf, ser.derivative_integral(sf.df), "derivative", "derivative"
    )


@_register("integral")
def _integral(ctx, sf):
    sf = _series_arg(sf, "integral")
    return _pick(sf, ser.derivative_integral(sf.df), "integral", "integral")


@_register("perSecond")
def _per_second(ctx, sf):
    sf = _series_arg(sf, "perSecond")
    return _pick(sf, ser.per_second(sf.df), "per_second", "perSecond")


@_register("nonNegativeDerivative")
def _non_negative_derivative(ctx, sf, maxValue=None):
    sf = _series_arg(sf, "nonNegativeDerivative")
    if maxValue is not None:
        return _pick(
            sf,
            ser.counter_wrap_rate(sf.df, max_value=float(maxValue)),
            "nn_delta",
            "nonNegativeDerivative",
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy("metric").orderBy("ts")
    delta = F.col("value") - F.lag("value").over(w)
    out = sf.df.withColumn("value", F.when(delta >= 0.0, delta))
    return SeriesFrame(
        _wrap_name(out, "nonNegativeDerivative"), sf.expr
    )


@_register("movingAverage")
def _moving_average(ctx, sf, n):
    sf = _series_arg(sf, "movingAverage")
    return _pick(
        sf,
        ser.series_functions(sf.df, ma_points=int(n)),
        "moving_avg",
        "movingAverage",
        _fmt_g(int(n)),
    )


@_register("movingMedian")
def _moving_median(ctx, sf, n):
    sf = _series_arg(sf, "movingMedian")
    return _pick(
        sf,
        ser.moving_median(sf.df, points=int(n)),
        "moving_median",
        "movingMedian",
        _fmt_g(int(n)),
    )


@_register("movingMin")
def _moving_min(ctx, sf, n):
    sf = _series_arg(sf, "movingMin")
    return _pick(
        sf,
        ser.moving_window_functions(sf.df, points=int(n)),
        "moving_min",
        "movingMin",
        _fmt_g(int(n)),
    )


@_register("movingMax")
def _moving_max(ctx, sf, n):
    sf = _series_arg(sf, "movingMax")
    return _pick(
        sf,
        ser.moving_window_functions(sf.df, points=int(n)),
        "moving_max",
        "movingMax",
        _fmt_g(int(n)),
    )


@_register("movingSum")
def _moving_sum(ctx, sf, n):
    sf = _series_arg(sf, "movingSum")
    return _pick(
        sf,
        ser.moving_window_functions(sf.df, points=int(n)),
        "moving_sum",
        "movingSum",
        _fmt_g(int(n)),
    )


@_register("stdev")
def _stdev(ctx, sf, n):
    sf = _series_arg(sf, "stdev")
    return _pick(
        sf,
        ser.moving_stddev(sf.df, points=int(n)),
        "moving_stddev",
        "stdev",
        _fmt_g(int(n)),
    )


@_register("exponentialMovingAverage")
def _ema(ctx, sf, n):
    sf = _series_arg(sf, "exponentialMovingAverage")
    return _pick(
        sf,
        ser.ema_window(sf.df, window_points=int(n)),
        "ema",
        "exponentialMovingAverage",
        _fmt_g(int(n)),
    )


@_register("keepLastValue")
def _keep_last_value(ctx, sf):
    sf = _series_arg(sf, "keepLastValue")
    return _pick(sf, ser.forward_fill(sf.df), "filled", "keepLastValue")


@_register("interpolate")
def _interpolate(ctx, sf, limit=3):
    sf = _series_arg(sf, "interpolate")
    return _pick(
        sf,
        ser.interpolate_gaps(sf.df, limit=int(limit)),
        "interpolated",
        "interpolate",
    )


# ---- re-bucketing ---------------------------------------------------


@_register("summarize")
def _summarize(ctx, sf, interval, func="sum", alignToFrom=False):
    sf = _series_arg(sf, "summarize")
    secs = abs(parse_interval(interval))
    out = ser.summarize(
        sf.df, secs, method=str(func), align_to_from=bool(alignToFrom)
    )
    return SeriesFrame(
        _wrap_name(out, "summarize", f'"{interval}"', f'"{func}"'),
        sf.expr,
    )


@_register("smartSummarize")
def _smart_summarize(ctx, sf, interval, func="sum"):
    sf = _series_arg(sf, "smartSummarize")
    secs = abs(parse_interval(interval))
    out = ser.smart_summarize(
        sf.df, interval=secs, method=str(func),
        from_time=ctx.from_time,
    )
    return _pick(
        sf, out, "value", "smartSummarize", f'"{interval}"', f'"{func}"'
    )


@_register("hitcount")
def _hitcount(ctx, sf, interval):
    sf = _series_arg(sf, "hitcount")
    secs = abs(parse_interval(interval))
    return _pick(
        sf,
        ser.hitcount(sf.df, interval=secs, step=ctx.step),
        "hits",
        "hitcount",
        f'"{interval}"',
    )


@_register("integralByInterval")
def _integral_by_interval(ctx, sf, interval):
    sf = _series_arg(sf, "integralByInterval")
    secs = abs(parse_interval(interval))
    return _pick(
        sf,
        ser.integral_by_interval(sf.df, interval=secs),
        "integral",
        "integralByInterval",
        f'"{interval}"',
    )


# ---- series selection (no rename in graphite) ----------------------


@_register("averageAbove")
def _average_above(ctx, sf, n):
    sf = _series_arg(sf, "averageAbove")
    return sf.with_df(
        ser.average_above(sf.df, float(n)), keep_order=True
    )


@_register("averageBelow")
def _average_below(ctx, sf, n):
    sf = _series_arg(sf, "averageBelow")
    # complement arm of average_above: Below is INCLUSIVE (<=), the
    # filter_series adjudication (ADVICE r8/r9)
    avg = (
        sf.df.filter(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(
            (
                _DEC2DBL(F.sum(_DEC(F.col("value"))))
                / F.count("*")
            ).alias("_avg")
        )
        .filter(F.col("_avg") <= F.lit(float(n)))
    )
    return _semi(sf, avg)


def _filter_gate(ctx, sf, n, flag: str, gate_kw: str):
    stats = ser.filter_series(sf.df, **{gate_kw: float(n)})
    return _semi(sf, stats.filter(F.col(flag) == 1))


@_register("currentAbove")
def _current_above(ctx, sf, n):
    sf = _series_arg(sf, "currentAbove")
    return _filter_gate(ctx, sf, n, "current_above", "current_gate")


@_register("currentBelow")
def _current_below(ctx, sf, n):
    sf = _series_arg(sf, "currentBelow")
    return _filter_gate(ctx, sf, n, "current_below", "current_gate")


@_register("maximumAbove")
def _maximum_above(ctx, sf, n):
    sf = _series_arg(sf, "maximumAbove")
    return _filter_gate(ctx, sf, n, "maximum_above", "max_gate")


@_register("maximumBelow")
def _maximum_below(ctx, sf, n):
    sf = _series_arg(sf, "maximumBelow")
    return _filter_gate(ctx, sf, n, "maximum_below", "max_gate")


@_register("minimumAbove")
def _minimum_above(ctx, sf, n):
    sf = _series_arg(sf, "minimumAbove")
    return _filter_gate(ctx, sf, n, "minimum_above", "min_gate")


@_register("minimumBelow")
def _minimum_below(ctx, sf, n):
    sf = _series_arg(sf, "minimumBelow")
    return _filter_gate(ctx, sf, n, "minimum_below", "min_gate")


@_register("highestCurrent")
def _highest_current(ctx, sf, k):
    sf = _series_arg(sf, "highestCurrent")
    stats = ser.filter_series(sf.df)
    return _semi(
        sf, stats.filter(F.col("rank_highest_current") <= int(k))
    )


@_register("lowestCurrent")
def _lowest_current(ctx, sf, k):
    sf = _series_arg(sf, "lowestCurrent")
    stats = ser.filter_series(sf.df)
    return _semi(
        sf, stats.filter(F.col("rank_lowest_current") <= int(k))
    )


@_register("highestMax")
def _highest_max(ctx, sf, k):
    sf = _series_arg(sf, "highestMax")
    ext = ser.sort_by_extrema(sf.df)
    return _semi(sf, ext.filter(F.col("rank_by_max") <= int(k)))


@_register("mostDeviant")
def _most_deviant(ctx, sf, k):
    sf = _series_arg(sf, "mostDeviant")
    return _semi(sf, ser.most_deviant(sf.df, k=int(k)))


@_register("removeEmptySeries")
def _remove_empty_series(ctx, sf, xFilesFactor=None):
    sf = _series_arg(sf, "removeEmptySeries")
    xff_ppm = (
        950000 if xFilesFactor is None
        else int(round(float(xFilesFactor) * 1_000_000))
    )
    keeps = ser.remove_empty_series(sf.df, xff_ppm=xff_ppm)
    flag = "keep_any" if xFilesFactor is None else "keep_xff"
    return _semi(sf, keeps.filter(F.col(flag) == 1))


@_register("useSeriesAbove")
def _use_series_above(ctx, sf, value, search, replace):
    sf = _series_arg(sf, "useSeriesAbove")
    # the rewritten names fetch REPLACEMENT series, so resolve against
    # the context's full points frame, not just sf's own selection
    gated = ser.use_series_above(
        sf.df, float(value), str(search), str(replace)
    ).select("metric").distinct()
    full = ctx.fetch("*").df
    return SeriesFrame(
        full.join(F.broadcast(gated), "metric", "semi"), sf.expr
    )


@_register("removeAbovePercentile")
def _remove_above_percentile(ctx, sf, n):
    sf = _series_arg(sf, "removeAbovePercentile")
    out = ser.remove_percentile(sf.df, n=int(n), above=True)
    return SeriesFrame(
        _wrap_name(out, "removeAbovePercentile", _fmt_g(int(n))), sf.expr
    )


@_register("removeBelowPercentile")
def _remove_below_percentile(ctx, sf, n):
    sf = _series_arg(sf, "removeBelowPercentile")
    out = ser.remove_percentile(sf.df, n=int(n), above=False)
    return SeriesFrame(
        _wrap_name(out, "removeBelowPercentile", _fmt_g(int(n))), sf.expr
    )


@_register("removeBetweenPercentile")
def _remove_between_percentile(ctx, sf, n):
    sf = _series_arg(sf, "removeBetweenPercentile")
    out = ser.remove_between_percentile(sf.df, n=int(n))
    return sf.with_df(out.select(*_SERIES_COLS), keep_order=True)


@_register("averageOutsidePercentile")
def _average_outside_percentile(ctx, sf, n):
    sf = _series_arg(sf, "averageOutsidePercentile")
    out = ser.average_outside_percentile(sf.df, n=int(n))
    return sf.with_df(out.select(*_SERIES_COLS), keep_order=True)


@_register("nPercentile")
def _n_percentile(ctx, sf, n):
    sf = _series_arg(sf, "nPercentile")
    # graphite: a flat line per series at its n-th percentile
    pct = ser.n_percentile(sf.df, n=int(n))
    out = sf.df.join(F.broadcast(pct), "metric").select(
        "metric", "ts",
        F.col("n_percentile").cast("double").alias("value"),
    )
    return SeriesFrame(
        _wrap_name(out, "nPercentile", _fmt_g(int(n))), sf.expr
    )


# ---- ordering + limit ----------------------------------------------


@_register("sortByName")
def _sort_by_name(ctx, sf):
    sf = _series_arg(sf, "sortByName")
    return SeriesFrame(sf.df, sf.expr, order=_name_rank(sf.df))


@_register("sortByTotal")
def _sort_by_total(ctx, sf):
    sf = _series_arg(sf, "sortByTotal")
    ranks = ser.series_orderings(sf.df).select(
        "metric", F.col("rank_by_total").alias("_order")
    )
    return SeriesFrame(sf.df, sf.expr, order=ranks)


@_register("sortByMaxima")
def _sort_by_maxima(ctx, sf):
    sf = _series_arg(sf, "sortByMaxima")
    ranks = ser.sort_by_extrema(sf.df).select(
        "metric", F.col("rank_by_max").alias("_order")
    )
    return SeriesFrame(sf.df, sf.expr, order=ranks)


@_register("sortByMinima")
def _sort_by_minima(ctx, sf):
    sf = _series_arg(sf, "sortByMinima")
    ranks = ser.sort_by_extrema(sf.df).select(
        "metric", F.col("rank_by_min").alias("_order")
    )
    return SeriesFrame(sf.df, sf.expr, order=ranks)


@_register("limit")
def _limit(ctx, sf, n):
    sf = _series_arg(sf, "limit")
    order = sf.order if sf.order is not None else _name_rank(sf.df)
    keep = order.filter(F.col("_order") <= int(n))
    return sf.with_df(
        sf.df.join(F.broadcast(keep.select("metric")), "metric", "semi"),
    )


# ---- combinators ----------------------------------------------------


def _union_all(frames: list[SeriesFrame]) -> DataFrame:
    df = frames[0].df
    for f in frames[1:]:
        df = df.unionByName(f.df)
    return df


def _comb_name(fn: str, frames: list[SeriesFrame], *extra) -> str:
    parts = [f.expr for f in frames] + [str(e) for e in extra]
    return f"{fn}({','.join(parts)})"


def _combine(ctx, fn: str, frames: list[SeriesFrame], agg_col):
    """One grouped per-ts aggregate over the union of the inputs —
    map-side combinable, single shuffle on ts."""
    frames = [_series_arg(f, fn) for f in frames]
    name = _comb_name(fn, frames)
    nn = _union_all(frames).filter(F.col("value").isNotNull())
    out = nn.groupBy("ts").agg(agg_col.alias("value")).select(
        F.lit(name).alias("metric"), "ts",
        F.col("value").cast("double"),
    )
    return SeriesFrame(out, name)


@_register("sumSeries", "sum")
def _sum_series(ctx, *sfs):
    return _combine(
        ctx, "sumSeries", list(sfs),
        _DEC2DBL(F.sum(_DEC(F.col("value")))),
    )


@_register("averageSeries", "avg")
def _average_series(ctx, *sfs):
    return _combine(
        ctx, "averageSeries", list(sfs),
        _DEC2DBL(F.sum(_DEC(F.col("value")))) / F.count("value"),
    )


@_register("maxSeries")
def _max_series(ctx, *sfs):
    return _combine(ctx, "maxSeries", list(sfs), F.max("value"))


@_register("minSeries")
def _min_series(ctx, *sfs):
    return _combine(ctx, "minSeries", list(sfs), F.min("value"))


@_register("countSeries")
def _count_series(ctx, *sfs):
    return _combine(
        ctx, "countSeries", list(sfs),
        F.count("value").cast("double"),
    )


@_register("rangeOfSeries")
def _range_of_series(ctx, *sfs):
    return _combine(
        ctx, "rangeOfSeries", list(sfs),
        F.max("value") - F.min("value"),
    )


@_register("stddevSeries")
def _stddev_series(ctx, *sfs):
    # population σ from exact Σv/Σv² (the series_combinators recipe)
    s1 = _DEC2DBL(F.sum(_DEC(F.col("value"))))
    s2 = _DEC2DBL(
        F.sum(_DEC(F.col("value") * F.col("value")))
    )
    n = F.count("value")
    return _combine(
        ctx, "stddevSeries", list(sfs),
        F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))),
    )


@_register("diffSeries")
def _diff_series(ctx, first, *rest):
    """anchor − Σrest as ONE signed decimal sum per slot (the
    series_combinators _d recipe — no float re-association)."""
    first = _series_arg(first, "diffSeries")
    rest = [_series_arg(r, "diffSeries") for r in rest]
    name = _comb_name("diffSeries", [first] + list(rest))
    tagged = first.df.withColumn("_sign", F.lit(1))
    for r in rest:
        tagged = tagged.unionByName(r.df.withColumn("_sign", F.lit(-1)))
    nn = tagged.filter(F.col("value").isNotNull())
    signed = F.when(
        F.col("_sign") == 1, _DEC(F.col("value"))
    ).otherwise(-_DEC(F.col("value")))
    out = nn.groupBy("ts").agg(
        _DEC2DBL(F.sum(signed)).alias("value")
    ).select(F.lit(name).alias("metric"), "ts", "value")
    return SeriesFrame(out, name)


@_register("multiplySeries")
def _multiply_series(ctx, a, b=None):
    """Wave-1 contract: exactly two single-series arguments (one
    correctly-rounded IEEE multiply — a variadic product is
    order-sensitive in floats and is deliberately out of scope, the
    logarithm/round exclusion rationale)."""
    if b is None:
        raise InvalidRequest(
            "multiplySeries: wave-1 render supports exactly two "
            "series arguments"
        )
    a = _series_arg(a, "multiplySeries")
    b = _series_arg(b, "multiplySeries")
    name = _comb_name("multiplySeries", [a, b])
    av = _single_series_per_ts(a.df, "multiplySeries")
    bv = _single_series_per_ts(b.df, "multiplySeries")
    out = av.join(bv.withColumnRenamed("_v", "_w"), "ts").select(
        F.lit(name).alias("metric"), "ts",
        (F.col("_v") * F.col("_w")).alias("value"),
    )
    return SeriesFrame(out, name)


@_register("divideSeries")
def _divide_series(ctx, dividend, divisor):
    dividend = _series_arg(dividend, "divideSeries")
    divisor = _series_arg(divisor, "divideSeries")
    dv = _single_series_per_ts(divisor.df, "divideSeries")
    name_suffix = divisor.expr
    out = dividend.df.join(dv, "ts", "left").select(
        F.concat(
            F.lit("divideSeries("), F.col("metric"),
            F.lit(f",{name_suffix})"),
        ).alias("metric"),
        "ts",
        F.when(
            F.col("_v").isNotNull() & (F.col("_v") != 0.0),
            F.col("value") / F.col("_v"),
        ).alias("value"),
    )
    return SeriesFrame(out, f"divideSeries({dividend.expr},{name_suffix})")


@_register("asPercent")
def _as_percent(ctx, sf):
    sf = _series_arg(sf, "asPercent")
    return _pick(sf, ser.as_percent(sf.df), "pct", "asPercent")


@_register("percentileOfSeries")
def _percentile_of_series(ctx, sf, n):
    sf = _series_arg(sf, "percentileOfSeries")
    name = f"percentileOfSeries({sf.expr},{int(n)})"
    out = ser.percentile_of_series(sf.df, n=int(n)).select(
        F.lit(name).alias("metric"), "ts", "value"
    )
    return SeriesFrame(out, name)


@_register("fallbackSeries")
def _fallback_series(ctx, sf, fallback):
    sf = _series_arg(sf, "fallbackSeries")
    fallback = _series_arg(fallback, "fallbackSeries")
    out = ser.fallback_series(sf.df, fallback.df).select(*_SERIES_COLS)
    return SeriesFrame(out, sf.expr)


@_register("groupByNode")
def _group_by_node(ctx, sf, node, callback="sum"):
    sf = _series_arg(sf, "groupByNode")
    out = ser.group_by_node(
        sf.df, node_idx=int(node), method=str(callback)
    ).select(F.col("node").alias("metric"), "ts", "value")
    return SeriesFrame(out, sf.expr)


@_register("groupByNodes")
def _group_by_nodes(ctx, sf, callback, *nodes):
    sf = _series_arg(sf, "groupByNodes")
    out = ser.group_by_nodes(
        sf.df, [int(n) for n in nodes], method=str(callback)
    ).select(F.col("name").alias("metric"), "ts", "value")
    return SeriesFrame(out, sf.expr)


@_register("sumSeriesWithWildcards")
def _sum_series_with_wildcards(ctx, sf, position=0):
    sf = _series_arg(sf, "sumSeriesWithWildcards")
    out = ser.series_with_wildcards(sf.df, position=int(position))
    return SeriesFrame(out.select(*_SERIES_COLS), sf.expr)


# ---- naming ---------------------------------------------------------

#: graphite aliasByNode's first-metric-path extraction: pull the
#: path out of any function-call wrapping before splitting on dots
#: (functions.py's documented regex, transcribed)
_ALIAS_EXTRACT_RX = r"(?:.*\()?([-\w*\.]+)(?:,|\)?.*)?"


@_register("alias")
def _alias(ctx, sf, name):
    sf = _series_arg(sf, "alias")
    out = sf.df.withColumn("metric", F.lit(str(name)))
    return SeriesFrame(out, sf.expr)


@_register("aliasByMetric")
def _alias_by_metric(ctx, sf):
    sf = _series_arg(sf, "aliasByMetric")
    extracted = F.regexp_extract(F.col("metric"), _ALIAS_EXTRACT_RX, 1)
    out = sf.df.withColumn(
        "metric", F.element_at(F.split(extracted, r"\."), -1)
    )
    return SeriesFrame(out, sf.expr)


@_register("aliasByNode")
def _alias_by_node(ctx, sf, *nodes):
    sf = _series_arg(sf, "aliasByNode")
    extracted = F.regexp_extract(F.col("metric"), _ALIAS_EXTRACT_RX, 1)
    parts = F.split(extracted, r"\.")
    # F.get is the ANSI-safe accessor (out-of-range → NULL, not an
    # error — the group_by_nodes precedent, SURVEY §2.12)
    picked = [F.get(parts, int(n)) for n in nodes]
    out = sf.df.withColumn(
        "metric", F.concat_ws(".", *picked)
    )
    return SeriesFrame(out, sf.expr)


@_register("aliasSub")
def _alias_sub(ctx, sf, search, replace):
    sf = _series_arg(sf, "aliasSub")
    out = sf.df.withColumn(
        "metric",
        F.regexp_replace(F.col("metric"), str(search), str(replace)),
    )
    return SeriesFrame(out, sf.expr)


# --------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------


def supported_functions() -> list[str]:
    return sorted(FUNCTIONS)


def _evaluate(ctx: RenderContext, node):
    if isinstance(node, Path):
        return ctx.fetch(node.pattern)
    if isinstance(node, Call):
        fn = FUNCTIONS.get(node.name)
        if fn is None:
            raise InvalidRequest(
                f"unsupported render function {node.name!r}; wave-1 "
                f"supports: {', '.join(supported_functions())}"
            )
        args = [_evaluate(ctx, a) for a in node.args]
        kwargs = {k: _evaluate(ctx, v) for k, v in node.kwargs}
        out = fn(ctx, *args, **kwargs)
        # remember the canonical sub-expression for parent naming
        out.expr = format_expr(node)
        return out
    return node  # literal


def render(
    spark: SparkSession,
    target: str,
    from_time: int | None = None,
    until_time: int | None = None,
    *,
    series: DataFrame,
    step: int = 60,
) -> DataFrame:
    """Evaluate ONE graphite render target against a bucketed points
    frame → ``(metric, ts, value)`` DataFrame (the composed plan —
    nothing is collected here).

    >>> render(spark, "aliasByNode(sumSeries(web.*.cpu),1)",
    ...        from_time=t0, until_time=t1, series=points_df)

    ``series``: the store to resolve path leaves against — any
    ``(metric, ts, value)`` frame (e.g. a compacted ceres points
    table). ``from_time``/``until_time``: half-open request range,
    pushed into the scan. ``step``: the series' bucket seconds
    (scaleToSeconds / hitcount need it).
    """
    ast = parse_target(target)
    ctx = RenderContext(
        spark, series, from_time=from_time, until_time=until_time,
        step=step,
    )
    out = _evaluate(ctx, ast)
    if not isinstance(out, SeriesFrame):
        raise InvalidRequest(
            f"target {target!r} evaluates to a literal, not a series"
        )
    return out.df
