"""Render-target front door (VERDICT r11 #2): target-grammar parser
(nested / quoted / numeric / kwarg / brace cases) and the composed
DataFrame evaluation against hand-computed values. Reference:
graphite-web evaluateTarget/grammar.py semantics (public knowledge,
SURVEY §0 provenance caveat)."""

import pytest

from ceres_spark.errors import InvalidRequest
from ceres_spark.plans.render import (
    format_expr,
    parse_interval,
    render,
    supported_functions,
)
from ceres_spark.plans.target import Call, Path, parse_target


# ---------------- parser ----------------


def test_parse_nested_calls_and_path():
    ast = parse_target("aliasByNode(sumSeries(web.*.cpu.user),1)")
    assert ast == Call(
        "aliasByNode",
        (Call("sumSeries", (Path("web.*.cpu.user"),), ()), 1),
        (),
    )


def test_parse_quoted_strings_single_and_double():
    ast = parse_target("timeShift(a.b, \"-1h\")")
    assert ast.args[1] == "-1h"
    ast = parse_target("alias(a.b, 'my name, with comma()')")
    assert ast.args[1] == "my name, with comma()"


def test_parse_numeric_args():
    ast = parse_target("f(a.b, 3, -2, 0.5, -1.5, 1e3, +7)")
    assert ast.args[1:] == (3, -2, 0.5, -1.5, 1000.0, 7)
    assert isinstance(ast.args[1], int)
    assert isinstance(ast.args[3], float)


def test_parse_bool_none_and_bare_number_target():
    ast = parse_target("summarize(a.b, '1h', 'sum', true)")
    assert ast.args[3] is True
    assert parse_target("f(none)").args == (None,)
    assert parse_target("-5") == -5


def test_parse_kwargs():
    ast = parse_target("transformNull(a.b, default=0.5)")
    assert ast.kwargs == (("default", 0.5),)
    with pytest.raises(InvalidRequest, match="positional.*after keyword"):
        parse_target("f(a=1, b.c)")


def test_parse_braces_and_charclass_stay_in_path():
    ast = parse_target("scale(prod.{click,view}.x, 2)")
    assert ast.args[0] == Path("prod.{click,view}.x")
    assert parse_target("x.y[0-9].z") == Path("x.y[0-9].z")


def test_parse_whitespace_tolerated():
    ast = parse_target("  sumSeries( web.* , db.* )  ")
    assert ast == Call("sumSeries", (Path("web.*"), Path("db.*")), ())


def test_parse_errors_are_loud():
    for bad in ["f(", "f(a.b", "f(a.b,)", "'unterminated", "f(a.b))",
                "", "f(,a)"]:
        with pytest.raises(InvalidRequest):
            parse_target(bad)


def test_format_expr_roundtrip():
    s = 'aliasByNode(sumSeries(web.*.cpu),1)'
    assert format_expr(parse_target(s)) == s
    assert format_expr(parse_target('f(a.b,"x y",0.5,none)')) == \
        'f(a.b,"x y",0.5,None)'


def test_parse_interval():
    assert parse_interval("1h") == 3600
    assert parse_interval("10min") == 600
    assert parse_interval("-1d") == -86400
    assert parse_interval("2w") == 1209600
    assert parse_interval(90) == 90
    assert parse_interval("1h", implied_minus=True) == -3600
    assert parse_interval("+1h", implied_minus=True) == 3600
    with pytest.raises(InvalidRequest):
        parse_interval("1parsec")


# ---------------- composition ----------------


@pytest.fixture()
def panel(spark):
    return spark.createDataFrame(
        [
            ("web.s1.cpu", 0, 10.0), ("web.s1.cpu", 60, 20.0),
            ("web.s1.cpu", 120, 30.0),
            ("web.s2.cpu", 0, 40.0), ("web.s2.cpu", 60, None),
            ("web.s2.cpu", 120, 60.0),
            ("db.s1.mem", 0, 5.0), ("db.s1.mem", 60, 8.0),
            ("db.s1.mem", 120, 10.0),
        ],
        "metric string, ts long, value double",
    )


def _rows(df):
    return sorted(
        (r["metric"], r["ts"], r["value"]) for r in df.collect()
    )


def test_render_sum_and_alias_by_node(spark, panel):
    got = _rows(render(
        spark, "aliasByNode(sumSeries(web.*.cpu),1)", series=panel
    ))
    # null at (s2,60) skipped: sums are 50, 20, 90; alias node 1 of
    # the extracted path 'web.*.cpu' is '*' (graphite's own regex
    # extract applied to the rewritten name)
    assert got == [("*", 0, 50.0), ("*", 60, 20.0), ("*", 120, 90.0)]


def test_render_scale_names_and_values(spark, panel):
    got = _rows(render(
        spark, "scale(web.{s1,s2}.cpu, 0.5)", series=panel
    ))
    assert ("scale(web.s1.cpu,0.5)", 60, 10.0) in got
    assert ("scale(web.s2.cpu,0.5)", 60, None) in got
    assert len(got) == 6


def test_render_nested_three_deep(spark, panel):
    got = _rows(render(
        spark,
        'alias(maxSeries(scale(web.*.cpu,2),db.*.mem),"peak")',
        series=panel,
    ))
    # max over {20,80,5} {40,8} {60,120,10} per slot
    assert got == [("peak", 0, 80.0), ("peak", 60, 40.0),
                   ("peak", 120, 120.0)]


def test_render_selection_gates(spark, panel):
    # averages: s1=20, s2=50, mem=7.666… — strict > (operator-layer
    # adjudication)
    got = _rows(render(
        spark, "averageAbove(*.*.*, 20)", series=panel
    ))
    assert {m for m, _, _ in got} == {"web.s2.cpu"}
    got = _rows(render(spark, "averageBelow(*.*.*, 20)", series=panel))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "db.s1.mem"}
    got = _rows(render(spark, "maximumAbove(web.*.cpu, 30)", series=panel))
    assert {m for m, _, _ in got} == {"web.s2.cpu"}  # max 30 not > 30
    got = _rows(render(spark, "currentBelow(*.*.*, 30)", series=panel))
    # currents (last non-null): s1=30 (inclusive), s2=60, mem=10
    assert {m for m, _, _ in got} == {"web.s1.cpu", "db.s1.mem"}


def test_render_sort_then_limit(spark, panel):
    got = _rows(render(
        spark, "limit(sortByMaxima(*.*.*), 2)", series=panel
    ))
    # maxima: s2=60, s1=30, mem=10 → top-2 series
    assert {m for m, _, _ in got} == {"web.s2.cpu", "web.s1.cpu"}
    # limit without a sort: graphite natural order (name-stable)
    got = _rows(render(spark, "limit(*.*.*, 1)", series=panel))
    assert {m for m, _, _ in got} == {"db.s1.mem"}


def test_render_divide_series_and_guard(spark, panel):
    got = _rows(render(
        spark, "divideSeries(web.*.cpu, db.s1.mem)", series=panel
    ))
    assert ("divideSeries(web.s1.cpu,db.s1.mem)", 0, 2.0) in got
    assert ("divideSeries(web.s2.cpu,db.s1.mem)", 60, None) in got
    # multi-series divisor raises IN PLAN
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        render(
            spark, "divideSeries(db.s1.mem, web.*.cpu)", series=panel
        ).collect()


def test_render_kwarg_and_quoted_interval(spark, panel):
    got = _rows(render(
        spark, "transformNull(web.s2.cpu, default=7)", series=panel
    ))
    assert ("transformNull(web.s2.cpu,7)", 60, 7.0) in got
    got = _rows(render(
        spark, 'summarize(web.s1.cpu, "2min", "sum")', series=panel
    ))
    assert got == [
        ('summarize(web.s1.cpu,"2min","sum")', 0, 30.0),
        ('summarize(web.s1.cpu,"2min","sum")', 120, 30.0),
    ]


def test_render_time_range_pushed(spark, panel):
    got = _rows(render(
        spark, "web.s1.cpu", from_time=60, until_time=121, series=panel
    ))
    assert [ts for _, ts, _ in got] == [60, 120]


def test_render_diff_and_count(spark, panel):
    got = _rows(render(
        spark, "diffSeries(web.s1.cpu, db.s1.mem)", series=panel
    ))
    assert got == [
        ("diffSeries(web.s1.cpu,db.s1.mem)", 0, 5.0),
        ("diffSeries(web.s1.cpu,db.s1.mem)", 60, 12.0),
        ("diffSeries(web.s1.cpu,db.s1.mem)", 120, 20.0),
    ]
    got = _rows(render(spark, "countSeries(*.*.*)", series=panel))
    assert got == [
        ("countSeries(*.*.*)", 0, 3.0),
        ("countSeries(*.*.*)", 60, 2.0),  # the null drops out
        ("countSeries(*.*.*)", 120, 3.0),
    ]


def test_render_unknown_function_and_literal_target(spark, panel):
    with pytest.raises(InvalidRequest, match="unsupported render"):
        render(spark, "definitelyNotAFunction(a.b)", series=panel)
    with pytest.raises(InvalidRequest, match="literal"):
        render(spark, "42", series=panel)


def test_supported_list_is_stable_and_big():
    fns = supported_functions()
    assert len(fns) >= 70
    for must in ["sumSeries", "aliasByNode", "scale", "movingAverage",
                 "divideSeries", "limit", "summarize", "timeShift",
                 "exponentialMovingAverage", "highestCurrent"]:
        assert must in fns


# ---------------- wave 8: grammar completion ----------------


def test_render_square_root_and_pow(spark, panel):
    got = _rows(render(spark, "squareRoot(db.s1.mem)", series=panel))
    assert ("squareRoot(db.s1.mem)", 120, 10.0 ** 0.5) in got
    got = _rows(render(spark, "pow(db.s1.mem,3)", series=panel))
    assert ("pow(db.s1.mem,3)", 60, 8.0 * 8.0 * 8.0) in got
    # pow(…,0) is 1 for non-null values, fractional exponents raise
    got = _rows(render(spark, "pow(web.s2.cpu,0)", series=panel))
    assert ("pow(web.s2.cpu,0)", 0, 1.0) in got
    assert ("pow(web.s2.cpu,0)", 60, None) in got
    with pytest.raises(InvalidRequest, match="libm"):
        render(spark, "pow(db.s1.mem,0.5)", series=panel)


def test_render_square_root_negative_is_null(spark):
    df = spark.createDataFrame(
        [("a.b", 0, -4.0), ("a.b", 60, 9.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(spark, "squareRoot(a.b)", series=df))
    assert got == [("squareRoot(a.b)", 0, None),
                   ("squareRoot(a.b)", 60, 3.0)]


def test_render_min_max_and_changed(spark, panel):
    got = _rows(render(spark, "minMax(web.s1.cpu)", series=panel))
    assert got == [("minMax(web.s1.cpu)", 0, 0.0),
                   ("minMax(web.s1.cpu)", 60, 0.5),
                   ("minMax(web.s1.cpu)", 120, 1.0)]
    got = _rows(render(spark, "changed(web.s2.cpu)", series=panel))
    # first point 0; 40→None and None→60 both count as changes
    assert got == [("changed(web.s2.cpu)", 0, 0.0),
                   ("changed(web.s2.cpu)", 60, 1.0),
                   ("changed(web.s2.cpu)", 120, 1.0)]


def test_render_grep_exclude_substr(spark, panel):
    got = _rows(render(spark, 'grep(*.*.*, "cpu")', series=panel))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "web.s2.cpu"}
    got = _rows(render(spark, 'exclude(*.*.*, "s2")', series=panel))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "db.s1.mem"}
    got = _rows(render(spark, "substr(web.s1.cpu,1,3)", series=panel))
    assert {m for m, _, _ in got} == {"s1.cpu"}
    with pytest.raises(InvalidRequest, match="negative"):
        render(spark, "substr(web.s1.cpu,-1)", series=panel)


def test_render_aggregate_dispatch(spark, panel):
    got = _rows(render(spark, 'aggregate(web.*.cpu,"max")', series=panel))
    assert [v for _, _, v in got] == [40.0, 20.0, 60.0]
    # sum matches sumSeries bit-for-bit
    agg = _rows(render(spark, 'aggregate(web.*.cpu,"sum")', series=panel))
    plain = _rows(render(spark, "sumSeries(web.*.cpu)", series=panel))
    assert [v for _, _, v in agg] == [v for _, _, v in plain]
    # median is ELEMENT SELECTION (sorted[n//2], graphite's rule) —
    # no float arithmetic, so it ships despite the mean-family
    # determinism caveats; slot 60 has values [20] (s2's null
    # skipped) → 20, slots 0/120 pick the upper of two
    got = _rows(render(
        spark, 'aggregate(web.*.cpu,"median")', series=panel
    ))
    assert [v for _, _, v in got] == [40.0, 20.0, 60.0]
    with pytest.raises(InvalidRequest, match="unsupported function"):
        render(spark, 'aggregate(web.*.cpu,"multiply")', series=panel)


def test_render_group_and_unique(spark, panel):
    got = _rows(render(
        spark, "group(web.s1.cpu, db.s1.mem)", series=panel
    ))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "db.s1.mem"}
    assert len(got) == 6
    # unique keeps the FIRST occurrence of a duplicated name
    got = _rows(render(
        spark, "unique(web.*.cpu, web.s1.cpu)", series=panel
    ))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "web.s2.cpu"}
    assert len(got) == 6


def test_render_divide_series_lists(spark):
    df = spark.createDataFrame(
        [("dc0.web.cpu", 0, 10.0), ("dc0.web.cpu", 60, 20.0),
         ("dc1.web.cpu", 0, 2.0), ("dc1.web.cpu", 60, 0.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(
        spark, "divideSeriesLists(dc0.*.*, dc1.*.*)", series=df
    ))
    # zero divisor → NULL, graphite's safeDiv
    assert got == [
        ("divideSeries(dc0.web.cpu,dc1.web.cpu)", 0, 5.0),
        ("divideSeries(dc0.web.cpu,dc1.web.cpu)", 60, None),
    ]


def test_render_apply_by_node(spark):
    df = spark.createDataFrame(
        [("srv.a.disk.used", 0, 30.0), ("srv.a.disk.total", 0, 60.0),
         ("srv.b.disk.used", 0, 10.0), ("srv.b.disk.total", 0, 40.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(
        spark,
        "applyByNode(srv.*.disk.*, 1,"
        " 'divideSeries(%.disk.used, %.disk.total)')",
        series=df,
    ))
    assert got == [("srv.a", 0, 0.5), ("srv.b", 0, 0.25)]
    with pytest.raises(InvalidRequest, match="divide template"):
        render(spark, "applyByNode(srv.*.disk.*, 1, 'sumSeries(%)')",
               series=df)


def test_render_consolidate_by(spark, panel):
    # no maxDataPoints on the context → graphite's points-fit case:
    # a name tag, values untouched
    got = _rows(render(
        spark, 'consolidateBy(web.s1.cpu,"max")', series=panel
    ))
    assert got == [('consolidateBy(web.s1.cpu,"max")', 0, 10.0),
                   ('consolidateBy(web.s1.cpu,"max")', 60, 20.0),
                   ('consolidateBy(web.s1.cpu,"max")', 120, 30.0)]
    # with maxDataPoints=2: 3 slots consolidate at vpp=2
    got = _rows(render(
        spark, 'consolidateBy(web.s1.cpu,"max")', series=panel,
        max_data_points=2,
    ))
    assert [v for _, _, v in got] == [20.0, 30.0]


def test_render_time_stack(spark, panel):
    got = _rows(render(
        spark, 'timeStack(db.s1.mem,"1min",0,2)', series=panel
    ))
    names = {m for m, _, _ in got}
    assert names == {"timeShift(db.s1.mem,0s)",
                     "timeShift(db.s1.mem,-60s)"}
    # the -60s copy relabels the point from t-60 onto t
    assert ("timeShift(db.s1.mem,-60s)", 60, 5.0) in got
    with pytest.raises(InvalidRequest, match="copy count"):
        render(spark, 'timeStack(db.s1.mem,"1min",0,99)', series=panel)


def test_render_moving_window_dispatch(spark, panel):
    mw = _rows(render(
        spark, 'movingWindow(web.s1.cpu,"2min","sum")', series=panel
    ))
    ms = _rows(render(spark, "movingSum(web.s1.cpu,2)", series=panel))
    assert [v for _, _, v in mw] == [v for _, _, v in ms]
    with pytest.raises(InvalidRequest, match="shorter"):
        render(spark, 'movingWindow(web.s1.cpu,"30s")', series=panel)


def test_render_weighted_average(spark):
    df = spark.createDataFrame(
        [("a.x.v", 0, 10.0), ("a.y.v", 0, 20.0),
         ("w.x.v", 0, 1.0), ("w.y.v", 0, 3.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(
        spark, "weightedAverage(a.*.v, w.*.v, 1)", series=df
    ))
    # (10·1 + 20·3) / (1+3) = 17.5
    assert got == [("weightedAverage(a.*.v,w.*.v,1)", 0, 17.5)]


def test_render_linear_regression(spark):
    # real epoch timestamps: series_linreg's constant rebase assumes
    # ts ≥ ~1.7e9 (its documented validity window)
    t0 = 1_704_067_200
    df = spark.createDataFrame(
        [("a.b", t0, 1.0), ("a.b", t0 + 60, 2.0), ("a.b", t0 + 120, 3.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(spark, "linearRegression(a.b)", series=df))
    # perfectly linear input → the fit reproduces it
    vals = [v for _, _, v in got]
    assert vals == pytest.approx([1.0, 2.0, 3.0])


def test_render_holt_winters_family(spark, panel):
    fc = render(
        spark, "holtWintersForecast(web.s1.cpu)", series=panel
    ).collect()
    assert len(fc) == 3
    bands = render(
        spark, "holtWintersConfidenceBands(web.s1.cpu)", series=panel
    )
    names = {r.metric for r in bands.select("metric").distinct().collect()}
    assert names == {"holtWintersConfidenceUpper(web.s1.cpu)",
                     "holtWintersConfidenceLower(web.s1.cpu)"}
    ab = _rows(render(
        spark, "holtWintersAberration(web.s1.cpu)", series=panel
    ))
    assert len(ab) == 3


def test_render_average_ranks_and_sort_by(spark, panel):
    got = _rows(render(spark, "highestAverage(*.*.*,1)", series=panel))
    assert {m for m, _, _ in got} == {"web.s2.cpu"}  # avg 50
    got = _rows(render(spark, "lowestAverage(*.*.*,1)", series=panel))
    assert {m for m, _, _ in got} == {"db.s1.mem"}
    got = _rows(render(spark, 'highest(*.*.*,1,"max")', series=panel))
    assert {m for m, _, _ in got} == {"web.s2.cpu"}
    got = _rows(render(spark, 'lowest(*.*.*,1,"current")', series=panel))
    assert {m for m, _, _ in got} == {"db.s1.mem"}
    # sortBy('average') + limit composes like sortByMaxima + limit
    got = _rows(render(
        spark, 'limit(sortBy(*.*.*,"average"),2)', series=panel
    ))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "web.s2.cpu"}
    got = _rows(render(
        spark, 'limit(sortBy(*.*.*,"average",true),1)', series=panel
    ))
    assert {m for m, _, _ in got} == {"db.s1.mem"}
    with pytest.raises(InvalidRequest, match="unsupported rank key"):
        render(spark, 'highest(*.*.*,1,"stddev")', series=panel)


def test_render_with_wildcards_family(spark):
    # r12 bugfix coverage: the wave-1 sumSeriesWithWildcards adapter
    # passed `metric` straight into the operator's `path` contract
    # and EVERY invocation threw UNRESOLVED_COLUMN
    df = spark.createDataFrame(
        [("dc0.web.cpu", 0, 1.0), ("dc0.web.cpu", 60, 3.0),
         ("dc1.web.cpu", 0, 2.0), ("dc1.web.cpu", 60, 5.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(
        spark, "sumSeriesWithWildcards(*.web.cpu,0)", series=df
    ))
    assert got == [("web.cpu", 0, 3.0), ("web.cpu", 60, 8.0)]
    got = _rows(render(
        spark, "averageSeriesWithWildcards(*.web.cpu,0)", series=df
    ))
    assert got == [("web.cpu", 0, 1.5), ("web.cpu", 60, 4.0)]
    agg = _rows(render(
        spark, 'aggregateWithWildcards(*.web.cpu,"avg",0)', series=df
    ))
    assert agg == got
    with pytest.raises(InvalidRequest, match="exactly one"):
        render(spark, "sumSeriesWithWildcards(*.web.cpu,0,2)", series=df)
    with pytest.raises(InvalidRequest, match="sum/total"):
        render(spark, 'aggregateWithWildcards(*.web.cpu,"stddev",0)',
               series=df)


def test_render_add_cumulative_aggregate_line(spark, panel):
    got = _rows(render(spark, "add(db.s1.mem,10)", series=panel))
    assert got == [("add(db.s1.mem,10)", 0, 15.0),
                   ("add(db.s1.mem,10)", 60, 18.0),
                   ("add(db.s1.mem,10)", 120, 20.0)]
    # cumulative ≡ consolidateBy('sum'); points-fit → tag only
    got = _rows(render(spark, "cumulative(db.s1.mem)", series=panel))
    assert [v for _, _, v in got] == [5.0, 8.0, 10.0]
    got = _rows(render(
        spark, 'aggregateLine(web.s1.cpu,"average")', series=panel
    ))
    assert [v for _, _, v in got] == [20.0, 20.0, 20.0]


def test_render_filter_series_generic_gate(spark, panel):
    got = _rows(render(
        spark, 'filterSeries(*.*.*,"max",">=",30)', series=panel
    ))
    assert {m for m, _, _ in got} == {"web.s1.cpu", "web.s2.cpu"}
    got = _rows(render(
        spark, 'filterSeries(*.*.*,"current","=",10)', series=panel
    ))
    assert {m for m, _, _ in got} == {"db.s1.mem"}
    # selection keeps the order frame: sort then filter then limit
    got = _rows(render(
        spark,
        'limit(filterSeries(sortBy(*.*.*,"average"),"min","<",41),1)',
        series=panel,
    ))
    assert {m for m, _, _ in got} == {"web.s2.cpu"}
    with pytest.raises(InvalidRequest, match="unknown operator"):
        render(spark, 'filterSeries(*.*.*,"max","~",1)', series=panel)
    with pytest.raises(InvalidRequest, match="unsupported aggregate"):
        render(spark, 'filterSeries(*.*.*,"stddev",">",1)', series=panel)


def test_parse_at_time():
    from ceres_spark.plans.render import parse_at_time

    now = 1_704_067_200 + 3661  # 2024-01-01T01:01:01Z
    assert parse_at_time("now", now=now) == now
    assert parse_at_time("today", now=now) == 1_704_067_200
    assert parse_at_time("yesterday", now=now) == 1_704_067_200 - 86400
    assert parse_at_time("tomorrow", now=now) == 1_704_067_200 + 86400
    assert parse_at_time("-1h", now=now) == now - 3600
    assert parse_at_time("now-1d", now=now) == now - 86400
    assert parse_at_time("now+10min", now=now) == now + 600
    assert parse_at_time("20240101", now=now) == 1_704_067_200
    assert parse_at_time("12:30_20240102", now=now) == \
        1_704_067_200 + 86400 + 12 * 3600 + 30 * 60
    assert parse_at_time(1_700_000_000) == 1_700_000_000
    assert parse_at_time("1700000000") == 1_700_000_000
    with pytest.raises(InvalidRequest):
        parse_at_time("lastfullmoon", now=now)


def test_render_at_time_strings_push_range(spark, panel):
    # from/until as graphite at-time strings with an injected 'now'
    got = _rows(render(
        spark, "web.s1.cpu", "now-2min", "now", series=panel, now=120,
    ))
    assert [ts for _, ts, _ in got] == [0, 60]


def test_render_as_percent_two_arg(spark, panel):
    got = _rows(render(
        spark, "asPercent(web.s1.cpu,200)", series=panel
    ))
    assert got == [("asPercent(web.s1.cpu,200)", 0, 5.0),
                   ("asPercent(web.s1.cpu,200)", 60, 10.0),
                   ("asPercent(web.s1.cpu,200)", 120, 15.0)]
    got = _rows(render(
        spark, "asPercent(web.s1.cpu,db.s1.mem)", series=panel
    ))
    assert got == [
        ("asPercent(web.s1.cpu,db.s1.mem)", 0, 200.0),
        ("asPercent(web.s1.cpu,db.s1.mem)", 60, 250.0),
        ("asPercent(web.s1.cpu,db.s1.mem)", 120, 300.0),
    ]
    with pytest.raises(InvalidRequest, match="zero total"):
        render(spark, "asPercent(web.s1.cpu,0)", series=panel)


def test_render_targets_multi(spark, panel):
    from ceres_spark.plans.render import render_targets

    out = render_targets(
        spark,
        ["scale(web.s1.cpu,2)", "alias(db.s1.mem,'memory')"],
        series=panel,
    )
    got = _rows(out)
    names = {m for m, _, _ in got}
    assert names == {"scale(web.s1.cpu,2)", "memory"}
    assert len(got) == 6
    with pytest.raises(InvalidRequest, match="at least one"):
        render_targets(spark, [], series=panel)


# ---------------- parser property: format/parse roundtrip ----------------


from hypothesis import given, settings
from hypothesis import strategies as st

_FN_NAMES = st.from_regex(r"[a-zA-Z][a-zA-Z0-9]{0,15}", fullmatch=True)
_PATHS = st.from_regex(
    r"[a-zA-Z][a-zA-Z0-9_*-]{0,8}(\.[a-zA-Z0-9_*-]{1,8}){0,3}",
    fullmatch=True,
).map(Path)
# strings: printable ascii minus the quote chars and backslash
# (graphite strings have no escapes — the documented grammar contract)
_STRINGS = st.text(
    st.characters(
        min_codepoint=32, max_codepoint=126,
        blacklist_characters='"\'\\',
    ),
    max_size=12,
)
# ints within %g's 6-sig-digit window; floats normalized through %g so
# the canonical rendering is exact (semantic == tolerates 2.0 == 2)
_INTS = st.integers(min_value=-999_999, max_value=999_999)
_FLOATS = st.floats(
    allow_nan=False, allow_infinity=False, width=32
).map(lambda x: float(f"{x:g}"))
_LITERALS = st.one_of(
    _INTS, _FLOATS, _STRINGS, st.booleans(), st.none()
)


def _calls(children):
    args = st.lists(st.one_of(children, _PATHS, _LITERALS),
                    min_size=1, max_size=4)
    kwargs = st.lists(
        st.tuples(st.from_regex(r"[a-z][a-zA-Z0-9]{0,8}", fullmatch=True),
                  st.one_of(_LITERALS)),
        max_size=2, unique_by=lambda kv: kv[0],
    )
    return st.builds(
        lambda n, a, k: Call(n, tuple(a), tuple(k)),
        _FN_NAMES, args, kwargs,
    )


_ASTS = st.recursive(_calls(st.nothing()), _calls, max_leaves=12)


@settings(max_examples=300, deadline=None)
@given(_ASTS)
def test_format_parse_roundtrip_property(ast):
    """format_expr is the combinators' naming contract — every name a
    composed plan bakes into its output must re-parse to the SAME
    tree (aliasByNode's extract-from-rewritten-name trick and any
    user feeding a rendered name back as a target depend on it)."""
    text = format_expr(ast)
    assert parse_target(text) == ast


def test_render_use_series_above_cross_family(spark):
    # the canonical graphite use: gate on ONE family, rewrite onto
    # ANOTHER — the replacement resolves against the whole store,
    # not the user's selection (two r12 coverage-suite findings:
    # fetch("*") stopped at dots, and joining through the operator's
    # input missed cross-family rewrites entirely)
    df = spark.createDataFrame(
        [("srv.a.disk.total", 0, 100.0), ("srv.a.disk.used", 0, 30.0),
         ("srv.b.disk.total", 0, 10.0), ("srv.b.disk.used", 0, 9.0)],
        "metric string, ts long, value double",
    )
    got = _rows(render(
        spark,
        'useSeriesAbove(srv.*.disk.total,50,"total","used")',
        series=df,
    ))
    # only srv.a's total (100) clears 50 → fetch srv.a.disk.used
    assert got == [("srv.a.disk.used", 0, 30.0)]
