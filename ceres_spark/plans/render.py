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
    "render_targets",
    "format_expr",
    "parse_interval",
    "parse_at_time",
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


_ABS_DATE_RX = re.compile(
    r"^(?:(\d{1,2}):(\d{2})_)?(\d{4})(\d{2})(\d{2})$"
)


def parse_at_time(text, now: int | None = None) -> int:
    """graphite render/attime.py's AT-time grammar, the wave-8
    subset: ``now``, ``today``/``yesterday``/``tomorrow`` (UTC
    midnight), bare epoch seconds, ``HH:MM_YYYYMMDD`` / ``YYYYMMDD``
    absolutes (UTC), and relative offsets ``-1d`` / ``+2h`` /
    ``now-1d`` (a bare unsigned offset is NOT a valid at-time — it
    would be ambiguous with epoch ints — so relative forms require
    the sign, matching graphite). ``now`` is an explicit parameter
    so plans stay reproducible (pass the request's wall clock);
    None falls back to the system clock."""
    import calendar
    import time as _time

    if isinstance(text, (int, float)) and not isinstance(text, bool):
        return int(text)
    s = str(text).strip().lower().replace(" ", "")
    now_s = int(now if now is not None else _time.time())
    if s == "now":
        return now_s
    day = 86400
    midnight = now_s - now_s % day
    if s == "today":
        return midnight
    if s == "yesterday":
        return midnight - day
    if s == "tomorrow":
        return midnight + day
    if s.startswith("now"):
        return now_s + parse_interval(s[3:])
    if s and s[0] in "+-":
        return now_s + parse_interval(s)
    m = _ABS_DATE_RX.match(s)
    if m:
        hh, mm, yyyy, mon, dd = m.groups()
        tup = (int(yyyy), int(mon), int(dd),
               int(hh or 0), int(mm or 0), 0)
        return int(calendar.timegm(tup + (0, 0, -1)))
    if s.isdigit():
        return int(s)
    raise InvalidRequest(f"unparseable at-time: {text!r}")


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
        max_data_points: int | None = None,
    ):
        self.spark = spark
        self.series = series.select(*_SERIES_COLS)
        self.from_time = from_time
        self.until_time = until_time
        self.step = int(step)
        self.max_data_points = (
            int(max_data_points) if max_data_points is not None else None
        )

    def fetch(self, pattern: str) -> SeriesFrame:
        """Resolve one metric path expression: brace alternation →
        per-alternative glob regex → ONE pushed-down rlike predicate
        (plus the request ts range) on the points scan."""
        bodies = [
            glob_to_regex_body(alt) for alt in expand_braces(pattern)
        ]
        rx = "^(" + "|".join(bodies) + ")$"
        df = self.series.filter(F.col("metric").rlike(rx))
        return SeriesFrame(self._clip(df), pattern)

    def _clip(self, df: DataFrame) -> DataFrame:
        if self.from_time is not None:
            df = df.filter(F.col("ts") >= F.lit(int(self.from_time)))
        if self.until_time is not None:
            df = df.filter(F.col("ts") < F.lit(int(self.until_time)))
        return df

    def all_series(self) -> DataFrame:
        """The whole store, request-range clipped — for adapters that
        fetch REWRITTEN exact names (useSeriesAbove) rather than a
        user glob. NOT ``fetch("*")``: a path glob's ``*`` stops at
        dots (graphite node semantics), so that form silently matched
        nothing on any dotted store — the r12 coverage-suite bug."""
        return self._clip(self.series)


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
    # the gate is on the INPUT selection's per-series max, but the
    # rewritten names resolve against the WHOLE clipped store — the
    # canonical use rewrites onto a DIFFERENT family than the user
    # selected ('where capacity is above N, show active_io'), so
    # joining through the operator's input (series.use_series_above's
    # table-shaped contract, where the selection holds both families)
    # or through a glob fetch ("*" stops at dots) both return nothing
    # here — the two r12 coverage-suite findings
    gated = (
        sf.df.groupBy("metric")
        .agg(F.max("value").alias("_mx"))
        .filter(F.col("_mx") > F.lit(float(value)))
        .select(
            F.regexp_replace(F.col("metric"), str(search), str(replace))
            .alias("metric")
        )
        .distinct()
    )
    return SeriesFrame(
        ctx.all_series().join(F.broadcast(gated), "metric", "semi"),
        sf.expr,
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
def _as_percent(ctx, sf, total=None):
    """1-arg: share of the per-slot sum (series.as_percent — AQE
    sizes the ts-keyed rejoin, no broadcast hint on the unbounded
    axis). 2-arg (wave 8): graphite's ``100 * v / t`` against a
    constant or a single-series total — the same fixed IEEE tree on
    the oracle side."""
    sf = _series_arg(sf, "asPercent")
    if total is None:
        return _pick(sf, ser.as_percent(sf.df), "pct", "asPercent")
    if isinstance(total, SeriesFrame):
        tv = _single_series_per_ts(total.df, "asPercent")
        out = sf.df.join(tv, "ts", "left").select(
            "metric", "ts",
            F.when(
                F.col("_v").isNotNull() & (F.col("_v") != 0.0),
                F.lit(100.0) * F.col("value") / F.col("_v"),
            ).alias("value"),
        )
        return SeriesFrame(
            _wrap_name(out, "asPercent", total.expr), sf.expr
        )
    t = float(total)
    if t == 0.0:
        raise InvalidRequest("asPercent: zero total")
    return _value_map(
        sf, F.lit(100.0) * F.col("value") / F.lit(t),
        "asPercent", _fmt_g(t),
    )


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


def _with_wildcards(sf, position, value_col: str, fn: str):
    """Shared sum/averageSeriesWithWildcards body: the operator's
    node surgery runs on a ``path`` column (its table-shaped
    contract), so the metric renames across the boundary. r12 bugfix:
    the wave-1 adapter passed ``metric`` straight through and every
    invocation threw UNRESOLVED_COLUMN — caught by the wave-8
    adapter tests."""
    out = ser.series_with_wildcards(
        sf.df.withColumnRenamed("metric", "path"),
        position=int(position),
    ).select(
        F.col("name").alias("metric"), "ts",
        F.col(value_col).alias("value"),
    )
    return SeriesFrame(out, sf.expr)


@_register("sumSeriesWithWildcards")
def _sum_series_with_wildcards(ctx, sf, *positions):
    sf = _series_arg(sf, "sumSeriesWithWildcards")
    if len(positions) != 1:
        raise InvalidRequest(
            "sumSeriesWithWildcards: wave-8 supports exactly one "
            "wildcard position (use groupByNodes to KEEP a node set)"
        )
    return _with_wildcards(
        sf, positions[0], "sum_wild", "sumSeriesWithWildcards"
    )


@_register("averageSeriesWithWildcards")
def _average_series_with_wildcards(ctx, sf, *positions):
    sf = _series_arg(sf, "averageSeriesWithWildcards")
    if len(positions) != 1:
        raise InvalidRequest(
            "averageSeriesWithWildcards: wave-8 supports exactly one "
            "wildcard position (use groupByNodes to KEEP a node set)"
        )
    return _with_wildcards(
        sf, positions[0], "avg_wild", "averageSeriesWithWildcards"
    )


@_register("aggregateWithWildcards")
def _aggregate_with_wildcards(ctx, sf, func, *positions):
    sf = _series_arg(sf, "aggregateWithWildcards")
    col = {"sum": "sum_wild", "total": "sum_wild",
           "average": "avg_wild", "avg": "avg_wild"}.get(str(func))
    if col is None:
        raise InvalidRequest(
            "aggregateWithWildcards: wave-8 supports sum/total/"
            f"average/avg; got {func!r}"
        )
    if len(positions) != 1:
        raise InvalidRequest(
            "aggregateWithWildcards: wave-8 supports exactly one "
            "wildcard position"
        )
    return _with_wildcards(
        sf, positions[0], col, "aggregateWithWildcards"
    )


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


# ---- wave 8: grammar completion over the existing operator layer ---
#
# r12: VERDICT r11 shipped the front door scoped to "wave 1"; these
# registrations close the remaining ENGINE-SHAPED graphite names onto
# operators that already exist (series.py wave 1-7 + holt_winters +
# series_linreg + weighted_average + changed_points + point_gates'
# minMax recipe). Determinism posture unchanged: every adapter is
# either exact (decimal sums, integer ranks, name strings) or a fixed
# IEEE expression tree both engines evaluate in the same order;
# libm-backed names (logarithm, round, fractional pow, sigmoid,
# logit) stay excluded with a loud raise.


@_register("squareRoot")
def _square_root(ctx, sf):
    # IEEE-754 sqrt is CORRECTLY ROUNDED (unlike exp/log/pow), so it
    # is cross-engine deterministic; negative input → NULL, matching
    # graphite safePow's None on a math-domain error
    sf = _series_arg(sf, "squareRoot")
    return _value_map(
        sf,
        F.when(F.col("value") >= 0, F.sqrt(F.col("value"))),
        "squareRoot",
    )


@_register("pow")
def _pow(ctx, sf, n):
    """pow(series, n) for small non-negative INTEGER exponents only:
    the adapter emits an explicit left-associated multiply chain
    (v·v·…), each step one correctly-rounded IEEE op — the same
    fixed expression tree on the oracle side. Fractional/negative
    exponents are libm pow (not correctly rounded cross-engine) and
    raise, the logarithm/round exclusion rationale."""
    sf = _series_arg(sf, "pow")
    fn = float(n)
    if fn != int(fn) or not (0 <= int(fn) <= 6):
        raise InvalidRequest(
            "pow: only integer exponents 0..6 are deterministic "
            "cross-engine (fractional pow is libm-backed); got "
            f"{n!r}"
        )
    k = int(fn)
    if k == 0:
        col = F.when(F.col("value").isNotNull(), F.lit(1.0))
    else:
        col = F.col("value")
        for _ in range(k - 1):
            col = col * F.col("value")
    return _value_map(sf, col, "pow", _fmt_g(fn))


@_register("minMax")
def _min_max(ctx, sf):
    """Per-series (v − min)/(max − min); degenerate max == min → 0
    (the point_gates recipe — two IEEE subtracts + one correctly-
    rounded divide, per-metric window, no extra shuffle)."""
    from pyspark.sql.window import Window

    sf = _series_arg(sf, "minMax")
    w = Window.partitionBy("metric")
    lo, hi = F.min("value").over(w), F.max("value").over(w)
    col = F.when(
        F.col("value").isNotNull(),
        F.when(hi == lo, F.lit(0.0)).otherwise(
            (F.col("value") - lo) / (hi - lo)
        ),
    )
    return _value_map(sf, col, "minMax")


@_register("changed")
def _changed(ctx, sf):
    """1 when the value differs from the previous point of the same
    series, 0 for the first point and for no-change (the
    changed_points recipe: NULL-safe inequality, so None→value and
    value→None transitions count exactly like graphite's ``!=``)."""
    from pyspark.sql.window import Window

    sf = _series_arg(sf, "changed")
    w = Window.partitionBy("metric").orderBy("ts")
    first = F.row_number().over(w) == 1
    col = (
        F.when(first, F.lit(0))
        .otherwise(
            (~F.col("value").eqNullSafe(F.lag("value").over(w)))
            .cast("int")
        )
        .cast("double")
    )
    return _value_map(sf, col, "changed")


@_register("grep")
def _grep(ctx, sf, pattern):
    # re.search semantics == unanchored rlike; selection functions do
    # not rename, and name-based selection keeps the order frame
    sf = _series_arg(sf, "grep")
    return sf.with_df(
        sf.df.filter(F.col("metric").rlike(str(pattern))),
        keep_order=True,
    )


@_register("exclude")
def _exclude(ctx, sf, pattern):
    sf = _series_arg(sf, "exclude")
    return sf.with_df(
        sf.df.filter(~F.col("metric").rlike(str(pattern))),
        keep_order=True,
    )


@_register("substr")
def _substr(ctx, sf, start=0, stop=0):
    """Node-slice rename: split the extracted path on dots, keep
    nodes [start, stop) (stop 0 = through the end) — graphite substr
    with the wave-8 non-negative-index scope."""
    sf = _series_arg(sf, "substr")
    start_i, stop_i = int(start), int(stop)
    if start_i < 0 or stop_i < 0:
        raise InvalidRequest(
            "substr: negative node indexes are outside the wave-8 "
            "scope"
        )
    extracted = F.regexp_extract(F.col("metric"), _ALIAS_EXTRACT_RX, 1)
    parts = F.split(extracted, r"\.")
    length = (
        F.greatest(F.size(parts) - start_i, F.lit(0))
        if stop_i == 0
        else F.lit(max(stop_i - start_i, 0))
    )
    out = sf.df.withColumn(
        "metric", F.array_join(F.slice(parts, start_i + 1, length), ".")
    )
    return SeriesFrame(out, sf.expr)


def _median_series(ctx, *sfs):
    """graphite's aggFuncs median is ELEMENT SELECTION —
    ``sorted(vals)[len(vals) // 2]``, the upper median — so unlike a
    mean it involves zero float arithmetic and is deterministic
    cross-engine: per slot, sort the non-null values and pick the
    floor(n/2) element. The per-slot collect is bounded by SERIES
    cardinality (the panel axis every combinator reduces), never the
    point axis."""
    frames = [_series_arg(f, "median") for f in sfs]
    name = _comb_name("medianSeries", frames)
    nn = _union_all(frames).filter(F.col("value").isNotNull())
    g = nn.groupBy("ts").agg(
        F.sort_array(F.collect_list("value")).alias("_v")
    )
    out = g.select(
        F.lit(name).alias("metric"),
        "ts",
        F.get(
            F.col("_v"), (F.size("_v") / 2).cast("int")
        ).alias("value"),
    )
    return SeriesFrame(out, name)


#: aggregate(seriesList, func): graphite 1.1's umbrella — dispatch
#: onto the existing combinator adapters. multiply/last are excluded
#: (variadic multiply's float re-association is not deterministic
#: cross-engine, and 'last' depends on list order a frame doesn't
#: carry); median ships via element selection (no float arithmetic).
_AGGREGATE_DISPATCH: dict = {}


def _init_aggregate_dispatch():
    if _AGGREGATE_DISPATCH:
        return
    _AGGREGATE_DISPATCH.update({
        "sum": _sum_series, "total": _sum_series,
        "average": _average_series, "avg": _average_series,
        "max": _max_series, "min": _min_series,
        "count": _count_series, "stddev": _stddev_series,
        "range": _range_of_series, "rangeOf": _range_of_series,
        "diff": _diff_series, "median": _median_series,
    })


@_register("aggregate")
def _aggregate(ctx, sf, func):
    _init_aggregate_dispatch()
    fn = _AGGREGATE_DISPATCH.get(str(func))
    if fn is None:
        raise InvalidRequest(
            f"aggregate: unsupported function {func!r}; wave-8 "
            f"supports: {', '.join(sorted(_AGGREGATE_DISPATCH))}"
        )
    sf = _series_arg(sf, "aggregate")
    return fn(ctx, sf)


@_register("group")
def _group(ctx, *sfs):
    """Union of the argument series lists, every series keeping its
    own name (graphite group — the composition glue)."""
    frames = [_series_arg(f, "group") for f in sfs]
    return SeriesFrame(_union_all(frames), _comb_name("group", frames))


@_register("unique")
def _unique(ctx, *sfs):
    """Union keeping only each metric name's FIRST list occurrence
    (graphite unique): tag every input with its argument position,
    keep rows whose position equals the per-metric minimum — a
    series-cardinality aggregate broadcast back as a semi-join."""
    frames = [_series_arg(f, "unique") for f in sfs]
    tagged = frames[0].df.withColumn("_src", F.lit(0))
    for i, f in enumerate(frames[1:], start=1):
        tagged = tagged.unionByName(f.df.withColumn("_src", F.lit(i)))
    firsts = tagged.groupBy("metric").agg(F.min("_src").alias("_src"))
    out = tagged.join(
        F.broadcast(firsts), ["metric", "_src"], "semi"
    ).select(*_SERIES_COLS)
    return SeriesFrame(out, _comb_name("unique", frames))


_APPLY_TEMPLATE_RX = re.compile(
    r"^divideSeries\(%\.([-\w.]+),\s*%\.([-\w.]+)\)$"
)


@_register("applyByNode")
def _apply_by_node(ctx, sf, node, template):
    """Wave-8 scope: the divide template (the docs' canonical
    instance) — ``applyByNode(list, n, 'divideSeries(%.a, %.b)')``
    pivots both legs per prefix group in one grouped pass
    (series.apply_by_node). Other template bodies compose from the
    registered functions over groupByNodes instead."""
    sf = _series_arg(sf, "applyByNode")
    m = _APPLY_TEMPLATE_RX.match(str(template).strip())
    if m is None:
        raise InvalidRequest(
            "applyByNode: wave-8 supports the divide template "
            "'divideSeries(%.num, %.den)'; got " + repr(template)
        )
    out = ser.apply_by_node(
        sf.df.withColumnRenamed("metric", "path"),
        int(node), m.group(1), m.group(2),
    ).select(
        F.col("name").alias("metric"), "ts",
        F.col("quotient").alias("value"),
    )
    return SeriesFrame(out, sf.expr)


@_register("divideSeriesLists")
def _divide_series_lists(ctx, dividends, divisors):
    """Pair the two lists on the path MINUS its first node (the
    engine-native equivalent of graphite's positional zip after a
    wildcard expansion — series.divide_series_lists' rule) and
    divide per slot; NULL on a missing or zero divisor."""
    dividends = _series_arg(dividends, "divideSeriesLists")
    divisors = _series_arg(divisors, "divideSeriesLists")

    def _suffix(df, vcol):
        parts = F.split(F.col("metric"), r"\.")
        return df.select(
            F.array_join(
                F.slice(
                    parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))
                ),
                ".",
            ).alias("_key"),
            "metric", "ts", F.col("value").alias(vcol),
        )
    num = _suffix(dividends.df, "_a")
    den = _suffix(divisors.df, "_b").withColumnRenamed(
        "metric", "_dmetric"
    )
    out = num.join(den, ["_key", "ts"], "left").select(
        F.concat(
            F.lit("divideSeries("), F.col("metric"), F.lit(","),
            F.coalesce(F.col("_dmetric"), F.lit("MISSING")),
            F.lit(")"),
        ).alias("metric"),
        "ts",
        F.when(
            F.col("_b").isNotNull() & (F.col("_b") != 0.0),
            F.col("_a") / F.col("_b"),
        ).alias("value"),
    )
    name = _comb_name("divideSeriesLists", [dividends, divisors])
    return SeriesFrame(out, name)


@_register("consolidateBy")
def _consolidate_by(ctx, sf, func="average"):
    """graphite consolidateBy TAGS the series with the consolidation
    function; the render layer applies it only when the series holds
    more slots than the requester's maxDataPoints. With no
    ``max_data_points`` on the context this is graphite's
    points-fit case: a name tag, values untouched. With one set,
    series.consolidate_by re-buckets with the derived
    values-per-point (its c_step contract)."""
    sf = _series_arg(sf, "consolidateBy")
    if ctx.max_data_points is None:
        out = _wrap_name(sf.df, "consolidateBy", f'"{func}"')
        return SeriesFrame(out, sf.expr)
    out = ser.consolidate_by(
        sf.df, max_points=int(ctx.max_data_points),
        method=str(func), step=ctx.step,
    ).select("metric", "ts", F.col("value").cast("double").alias("value"))
    return SeriesFrame(
        _wrap_name(out, "consolidateBy", f'"{func}"'), sf.expr
    )


_MAX_TIMESTACK = 32


@_register("timeStack")
def _time_stack(ctx, sf, shift_unit="1d", start=0, end=7):
    """Union of timeShifted copies for shift i in [start, end) —
    each copy renamed ``timeShift(expr,-Ni)`` like graphite's
    timeStack legend. Copy count is bounded (plan size is linear in
    it)."""
    sf = _series_arg(sf, "timeStack")
    lo, hi = int(start), int(end)
    if not (0 <= hi - lo <= _MAX_TIMESTACK):
        raise InvalidRequest(
            f"timeStack: copy count {hi - lo} outside 0..{_MAX_TIMESTACK}"
        )
    # same sign convention as the timeShift adapter: the parsed
    # unsigned unit means the PAST (delta < 0), and copy i relabels
    # points from t + i·delta onto t, i.e. ts_out = ts − i·delta
    delta = parse_interval(shift_unit, implied_minus=True)
    frames = []
    for i in range(lo, hi):
        shifted = ser.time_shift(sf.df, -i * delta)
        named = shifted.withColumn(
            "metric",
            F.concat(
                F.lit("timeShift("), F.col("metric"),
                F.lit(f",{i * delta}s)"),
            ),
        )
        frames.append(SeriesFrame(named, sf.expr))
    return SeriesFrame(
        _union_all(frames),
        f"timeStack({sf.expr},\"{shift_unit}\",{lo},{hi})",
    )


@_register("movingWindow")
def _moving_window(ctx, sf, window_size, func="average"):
    """Dispatch onto the moving-* adapters; a time-string window
    converts to points through the context step (the
    exponentialMovingAverage precedent)."""
    dispatch = {
        "average": _moving_average, "avg": _moving_average,
        "median": _moving_median, "min": _moving_min,
        "max": _moving_max, "sum": _moving_sum, "stddev": _stdev,
    }
    fn = dispatch.get(str(func))
    if fn is None:
        raise InvalidRequest(
            f"movingWindow: unsupported function {func!r}; wave-8 "
            f"supports: {', '.join(sorted(dispatch))}"
        )
    if isinstance(window_size, str):
        n = abs(parse_interval(window_size)) // ctx.step
        if n < 1:
            raise InvalidRequest(
                f"movingWindow: window {window_size!r} is shorter "
                f"than the series step {ctx.step}s"
            )
    else:
        n = int(window_size)
    return fn(ctx, sf, n)


@_register("weightedAverage")
def _weighted_average(ctx, avg_sf, weight_sf, *nodes):
    """Pair each series in the first list with its weight series in
    the second on the selected path nodes, then emit ONE series
    Σ(aᵢ·wᵢ)/Σwᵢ per slot over pairs where both sides are non-null
    (graphite weightedAverage; series.weighted_average is the
    volume-weighted table-shaped sibling). Products accumulate
    through the string-routed DECIMAL sum — order-independent — and
    the single final division is one IEEE op."""
    avg_sf = _series_arg(avg_sf, "weightedAverage")
    weight_sf = _series_arg(weight_sf, "weightedAverage")
    if not nodes:
        raise InvalidRequest("weightedAverage: at least one node")

    def _key(df, vcol):
        parts = F.split(F.col("metric"), r"\.")
        key = F.concat_ws(
            ".", *[F.get(parts, int(n)) for n in nodes]
        )
        return df.select(
            key.alias("_key"), "ts", F.col("value").alias(vcol)
        )
    name = (
        f"weightedAverage({avg_sf.expr},{weight_sf.expr},"
        + ",".join(_fmt_g(int(n)) for n in nodes) + ")"
    )
    j = _key(avg_sf.df, "_a").join(
        _key(weight_sf.df, "_w"), ["_key", "ts"]
    ).filter(F.col("_a").isNotNull() & F.col("_w").isNotNull())
    prod = _DEC(F.col("_a") * F.col("_w"))
    out = j.groupBy("ts").agg(
        (
            _DEC2DBL(F.sum(prod))
            / _DEC2DBL(F.sum(_DEC(F.col("_w"))))
        ).alias("value")
    ).select(F.lit(name).alias("metric"), "ts", "value")
    return SeriesFrame(out, name)


@_register("linearRegression")
def _linear_regression(ctx, sf):
    """Per-series least-squares line over the request range
    (series.series_linreg's exact-decimal closed form), re-expanded
    to a fitted value per slot: ŷ(ts) = fit_end + slope·(ts − t_end)
    with slope = slope_per_hour/3600 — a fixed IEEE expression tree
    mirrored on the oracle side. Series with < 2 points emit NULL."""
    sf = _series_arg(sf, "linearRegression")
    # t_end_ts rides the SAME per-series aggregate (one scan for the
    # params side, not two — the r12 plan-audit finding)
    params = ser.series_linreg(sf.df, include_t_end=True)
    out = sf.df.join(F.broadcast(params), "metric").select(
        "metric", "ts",
        (
            F.col("fit_end")
            + (F.col("slope_per_hour") / F.lit(3600.0))
            * (F.col("ts") - F.col("t_end_ts")).cast("double")
        ).alias("value"),
    )
    return SeriesFrame(_wrap_name(out, "linearRegression"), sf.expr)


def _holt(ctx, sf, fn: str, delta=3):
    return ser.holt_winters(sf.df, dev_scale=float(delta))


@_register("holtWintersForecast")
def _hw_forecast(ctx, sf):
    sf = _series_arg(sf, "holtWintersForecast")
    return _pick(
        sf, _holt(ctx, sf, "holtWintersForecast"),
        "forecast", "holtWintersForecast",
    )


@_register("holtWintersConfidenceBands")
def _hw_bands(ctx, sf, delta=3):
    """Graphite returns TWO series per input — the upper and lower
    bands; the adapter unions both with graphite's Upper/Lower
    naming. Bootstrap departure documented on series.holt_winters:
    smoothing starts at the data start, not 7 days before the
    request window."""
    sf = _series_arg(sf, "holtWintersConfidenceBands")
    hw = _holt(ctx, sf, "holtWintersConfidenceBands", delta)
    up = hw.select(
        F.concat(
            F.lit("holtWintersConfidenceUpper("), F.col("metric"),
            F.lit(")"),
        ).alias("metric"),
        "ts", F.col("upper").alias("value"),
    )
    lo = hw.select(
        F.concat(
            F.lit("holtWintersConfidenceLower("), F.col("metric"),
            F.lit(")"),
        ).alias("metric"),
        "ts", F.col("lower").alias("value"),
    )
    return SeriesFrame(
        up.unionByName(lo),
        f"holtWintersConfidenceBands({sf.expr})",
    )


@_register("holtWintersAberration")
def _hw_aberration(ctx, sf, delta=3):
    sf = _series_arg(sf, "holtWintersAberration")
    return _pick(
        sf, _holt(ctx, sf, "holtWintersAberration", delta),
        "aberration", "holtWintersAberration",
    )


def _avg_rank_pick(ctx, sf, n, fn: str, highest: bool):
    """highest/lowestAverage share series_orderings' guarded
    rank_by_avg; 'lowest' flips through the series count — a 1-row
    scalar anchor (the fallback_series sanction), never a second
    global sort."""
    ranks = ser.series_orderings(sf.df).select("metric", "rank_by_avg")
    if highest:
        keep = ranks.filter(F.col("rank_by_avg") <= int(n))
    else:
        cnt = ranks.agg(F.count("*").alias("_cnt"))
        keep = ranks.crossJoin(F.broadcast(cnt)).filter(
            F.col("rank_by_avg") > F.col("_cnt") - int(n)
        )
    return _semi(sf, keep)


@_register("highestAverage")
def _highest_average(ctx, sf, n):
    sf = _series_arg(sf, "highestAverage")
    return _avg_rank_pick(ctx, sf, n, "highestAverage", True)


@_register("lowestAverage")
def _lowest_average(ctx, sf, n):
    sf = _series_arg(sf, "lowestAverage")
    return _avg_rank_pick(ctx, sf, n, "lowestAverage", False)


def _rank_dispatch(ctx, sf, n, func: str, highest: bool, fn: str):
    """graphite 1.1 highest/lowest umbrella: rank key by name.
    'current' rides filter_series' guarded current ranks, 'max'/'min'
    sort_by_extrema, 'average' series_orderings' rank_by_avg; lowest
    arms flip through the scalar-count anchor where only the
    descending rank exists."""
    key = str(func)
    if key in ("average", "avg"):
        return _avg_rank_pick(ctx, sf, n, fn, highest)
    if key == "current":
        stats = ser.filter_series(sf.df)
        col = "rank_highest_current" if highest else "rank_lowest_current"
        return _semi(sf, stats.filter(F.col(col) <= int(n)))
    if key in ("max", "min"):
        ext = ser.sort_by_extrema(sf.df).select(
            "metric",
            F.col("rank_by_max" if key == "max" else "rank_by_min")
            .alias("_r"),
        )
        # rank_by_max is descending (1 = biggest max), rank_by_min
        # ascending in the smallest-min sense — 'highest max' uses
        # rank_by_max directly, 'lowest min' uses rank_by_min
        # directly; the crossed arms flip through the count anchor
        direct = (key == "max") == highest
        if direct:
            keep = ext.filter(F.col("_r") <= int(n))
        else:
            cnt = ext.agg(F.count("*").alias("_cnt"))
            keep = ext.crossJoin(F.broadcast(cnt)).filter(
                F.col("_r") > F.col("_cnt") - int(n)
            )
        return _semi(sf, keep)
    raise InvalidRequest(
        f"{fn}: unsupported rank key {func!r}; wave-8 supports "
        "average/avg, current, max, min"
    )


@_register("add")
def _add(ctx, sf, constant):
    # graphite 1.1 add(series, c) — offset with its own name rewrite
    sf = _series_arg(sf, "add")
    return _value_map(
        sf, F.col("value") + F.lit(float(constant)), "add",
        _fmt_g(float(constant)),
    )


@_register("cumulative")
def _cumulative(ctx, sf):
    # graphite cumulative(series) ≡ consolidateBy(series, 'sum')
    sf = _series_arg(sf, "cumulative")
    return _consolidate_by(ctx, sf, "sum")


def _series_stat(df: DataFrame, func: str, fn: str) -> DataFrame:
    """Per-series scalar for filterSeries/aggregateLine: decimal-
    exact average/sum, exact max/min, 'current' = last non-null by
    ts (graphite safeLast) — one series-cardinality aggregate."""
    nn = df.filter(F.col("value").isNotNull())
    key = str(func)
    if key in ("average", "avg"):
        col = _DEC2DBL(F.sum(_DEC(F.col("value")))) / F.count("*")
    elif key in ("sum", "total"):
        col = _DEC2DBL(F.sum(_DEC(F.col("value"))))
    elif key == "max":
        col = F.max("value")
    elif key == "min":
        col = F.min("value")
    elif key in ("current", "last"):
        col = F.max_by("value", F.col("ts"))
    else:
        raise InvalidRequest(
            f"{fn}: unsupported aggregate {func!r}; wave-8 supports "
            "average/avg, sum/total, max, min, current/last"
        )
    return nn.groupBy("metric").agg(col.alias("_stat"))


@_register("aggregateLine")
def _aggregate_line(ctx, sf, func="average"):
    """Flat line per series at its aggregate value. Naming departure
    (documented): graphite embeds the VALUE in the rewritten name
    via %g — engine-side float→string differs across engines (the
    libm-class nondeterminism), so the adapter names with the
    FUNCTION instead: aggregateLine(name,"func")."""
    sf = _series_arg(sf, "aggregateLine")
    stats = _series_stat(sf.df, func, "aggregateLine")
    out = sf.df.join(F.broadcast(stats), "metric").select(
        "metric", "ts", F.col("_stat").alias("value")
    )
    return SeriesFrame(
        _wrap_name(out, "aggregateLine", f'"{func}"'), sf.expr
    )


_FILTER_OPERATORS = {
    "=": lambda c, t: c == t,
    "!=": lambda c, t: c != t,
    ">": lambda c, t: c > t,
    ">=": lambda c, t: c >= t,
    "<": lambda c, t: c < t,
    "<=": lambda c, t: c <= t,
}


@_register("filterSeries")
def _filter_series_fn(ctx, sf, func, operator, threshold):
    """graphite 1.1 filterSeries(list, func, operator, threshold) —
    the generic gate behind the averageAbove/currentBelow family:
    per-series scalar (the _series_stat kernel), one exact
    comparison, broadcast semi-join back. Selection keeps names, so
    the order frame survives."""
    sf = _series_arg(sf, "filterSeries")
    op = _FILTER_OPERATORS.get(str(operator))
    if op is None:
        raise InvalidRequest(
            f"filterSeries: unknown operator {operator!r}; one of "
            + ", ".join(sorted(_FILTER_OPERATORS))
        )
    stats = _series_stat(sf.df, func, "filterSeries")
    keep = stats.filter(op(F.col("_stat"), F.lit(float(threshold))))
    return _semi(sf, keep)


@_register("highest")
def _highest(ctx, sf, n=1, func="average"):
    sf = _series_arg(sf, "highest")
    return _rank_dispatch(ctx, sf, n, func, True, "highest")


@_register("lowest")
def _lowest(ctx, sf, n=1, func="average"):
    sf = _series_arg(sf, "lowest")
    return _rank_dispatch(ctx, sf, n, func, False, "lowest")


@_register("sortBy")
def _sort_by(ctx, sf, func="average", reverse=False):
    """Order frame from the named per-series rank; reverse flips
    through the series count (scalar anchor, no second sort)."""
    sf = _series_arg(sf, "sortBy")
    key = str(func)
    if key in ("average", "avg"):
        ranks = ser.series_orderings(sf.df).select(
            "metric", F.col("rank_by_avg").alias("_order")
        )
    elif key in ("total", "sum"):
        ranks = ser.series_orderings(sf.df).select(
            "metric", F.col("rank_by_total").alias("_order")
        )
    elif key == "max":
        ranks = ser.sort_by_extrema(sf.df).select(
            "metric", F.col("rank_by_max").alias("_order")
        )
    elif key == "min":
        ranks = ser.sort_by_extrema(sf.df).select(
            "metric", F.col("rank_by_min").alias("_order")
        )
    else:
        raise InvalidRequest(
            f"sortBy: unsupported key {func!r}; wave-8 supports "
            "average/avg, total/sum, max, min"
        )
    if reverse:
        cnt = ranks.agg(F.count("*").alias("_cnt"))
        ranks = ranks.crossJoin(F.broadcast(cnt)).select(
            "metric",
            (F.col("_cnt") + 1 - F.col("_order")).alias("_order"),
        )
    return SeriesFrame(sf.df, sf.expr, order=ranks)


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
    from_time: int | str | None = None,
    until_time: int | str | None = None,
    *,
    series: DataFrame,
    step: int = 60,
    max_data_points: int | None = None,
    now: int | None = None,
) -> DataFrame:
    """Evaluate ONE graphite render target against a bucketed points
    frame → ``(metric, ts, value)`` DataFrame (the composed plan —
    nothing is collected here).

    >>> render(spark, "aliasByNode(sumSeries(web.*.cpu),1)",
    ...        from_time=t0, until_time=t1, series=points_df)

    ``series``: the store to resolve path leaves against — any
    ``(metric, ts, value)`` frame (e.g. a compacted ceres points
    table). ``from_time``/``until_time``: half-open request range,
    pushed into the scan — ints, or graphite at-time strings
    (``"now"``, ``"-1d"``, ``"12:00_20240101"`` — see
    :func:`parse_at_time`; pass ``now`` for a reproducible wall
    clock). ``step``: the series' bucket seconds (scaleToSeconds /
    hitcount need it).
    """
    if from_time is not None:
        from_time = parse_at_time(from_time, now=now)
    if until_time is not None:
        until_time = parse_at_time(until_time, now=now)
    ast = parse_target(target)
    ctx = RenderContext(
        spark, series, from_time=from_time, until_time=until_time,
        step=step, max_data_points=max_data_points,
    )
    out = _evaluate(ctx, ast)
    if not isinstance(out, SeriesFrame):
        raise InvalidRequest(
            f"target {target!r} evaluates to a literal, not a series"
        )
    return out.df


def render_targets(
    spark: SparkSession,
    targets: list[str],
    from_time: int | str | None = None,
    until_time: int | str | None = None,
    *,
    series: DataFrame,
    step: int = 60,
    max_data_points: int | None = None,
    now: int | None = None,
) -> DataFrame:
    """graphite's multi-target request form (``&target=…&target=…``):
    every target renders into ONE unioned ``(metric, ts, value)``
    plan — Catalyst still sees a single tree, so shared path scans
    collapse and the union is free at the exchange level. Names are
    each target's own rewrites (graphite panels rely on them being
    distinct; duplicate output names across targets are the caller's
    concern, exactly as in graphite)."""
    if not targets:
        raise InvalidRequest("render_targets: at least one target")
    dfs = [
        render(
            spark, t, from_time, until_time, series=series, step=step,
            max_data_points=max_data_points, now=now,
        )
        for t in targets
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
