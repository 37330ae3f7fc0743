"""Fleet-wide render-grammar execution coverage (r12).

The wave-1 sumSeriesWithWildcards adapter violated its operator's
column contract and EVERY invocation threw — it survived two rounds
because nothing executed every registered name. This suite closes
that class: one canonical invocation per registered function, each
executed end-to-end (plan + collect) against a fixture that carries
every shape the adapters need (panel series, divide-template paths,
dc-prefixed list pairs), plus a completeness gate — registering a
new name in FUNCTIONS without adding an invocation here fails the
suite, the plan-audit-allowlist pattern applied to the grammar.
"""

import pytest

from ceres_spark.plans.render import render, supported_functions

T0 = 1_704_067_200  # linearRegression's rebase needs real epochs


@pytest.fixture(scope="module")
def store(spark):
    rows = []

    def series(name, base, n=12, hole_at=None):
        for i in range(n):
            v = None if i == hole_at else base + i
            rows.append((name, T0 + i * 60, v))

    series("web.s1.cpu", 10.0)
    series("web.s2.cpu", 40.0, hole_at=5)
    series("db.s1.mem", 5.0)
    series("srv.a.disk.used", 30.0)
    series("srv.a.disk.total", 60.0)
    series("srv.b.disk.used", 10.0)
    series("srv.b.disk.total", 40.0)
    series("dc0.web.cpu", 8.0)
    series("dc1.web.cpu", 2.0)
    return spark.createDataFrame(
        rows, "metric string, ts long, value double"
    )


#: one canonical, executable target per registered function name —
#: completeness is asserted below, so this table IS the grammar's
#: execution inventory
INVOCATIONS = {
    "absolute": "absolute(web.s1.cpu)",
    "add": "add(web.s1.cpu,5)",
    "aggregate": 'aggregate(web.*.cpu,"sum")',
    "aggregateLine": 'aggregateLine(web.s1.cpu,"average")',
    "aggregateWithWildcards": 'aggregateWithWildcards(dc0.web.*,"sum",0)',
    "alias": 'alias(web.s1.cpu,"renamed")',
    "aliasByMetric": "aliasByMetric(web.s1.cpu)",
    "aliasByNode": "aliasByNode(web.*.cpu,1)",
    "aliasSub": 'aliasSub(web.s1.cpu,"web","www")',
    "applyByNode":
        "applyByNode(srv.*.disk.*,1,"
        "'divideSeries(%.disk.used, %.disk.total)')",
    "asPercent": "asPercent(web.*.cpu)",
    "averageAbove": "averageAbove(web.*.cpu,1)",
    "averageBelow": "averageBelow(web.*.cpu,1000)",
    "averageOutsidePercentile": "averageOutsidePercentile(*.*.*,65)",
    "averageSeries": "averageSeries(web.*.cpu)",
    "averageSeriesWithWildcards":
        "averageSeriesWithWildcards(dc0.web.*,0)",
    "avg": "avg(web.*.cpu)",
    "changed": "changed(web.s2.cpu)",
    "consolidateBy": 'consolidateBy(web.s1.cpu,"max")',
    "countSeries": "countSeries(web.*.cpu)",
    "cumulative": "cumulative(web.s1.cpu)",
    "currentAbove": "currentAbove(web.*.cpu,1)",
    "currentBelow": "currentBelow(web.*.cpu,1000)",
    "delay": "delay(web.s1.cpu,2)",
    "derivative": "derivative(web.s1.cpu)",
    "diffSeries": "diffSeries(web.s1.cpu,db.s1.mem)",
    "divideSeries": "divideSeries(web.s1.cpu,db.s1.mem)",
    "divideSeriesLists": "divideSeriesLists(dc0.*.*,dc1.*.*)",
    "exclude": 'exclude(web.*.cpu,"s2")',
    "exponentialMovingAverage":
        "exponentialMovingAverage(web.s1.cpu,4)",
    "fallbackSeries": "fallbackSeries(web.s1.cpu,db.s1.mem)",
    "filterSeries": 'filterSeries(web.*.cpu,"max",">",0)',
    "grep": 'grep(web.*.cpu,"s1")',
    "group": "group(web.s1.cpu,db.s1.mem)",
    "groupByNode": 'groupByNode(web.*.cpu,0,"sum")',
    "groupByNodes": 'groupByNodes(web.*.cpu,"sum",0,2)',
    "highest": 'highest(web.*.cpu,1,"max")',
    "highestAverage": "highestAverage(web.*.cpu,1)",
    "highestCurrent": "highestCurrent(web.*.cpu,1)",
    "highestMax": "highestMax(web.*.cpu,1)",
    "hitcount": 'hitcount(web.s1.cpu,"5min")',
    "holtWintersAberration": "holtWintersAberration(web.s1.cpu)",
    "holtWintersConfidenceBands":
        "holtWintersConfidenceBands(web.s1.cpu)",
    "holtWintersForecast": "holtWintersForecast(web.s1.cpu)",
    "integral": "integral(web.s1.cpu)",
    "integralByInterval": 'integralByInterval(web.s1.cpu,"5min")',
    "interpolate": "interpolate(web.s2.cpu)",
    "invert": "invert(web.s1.cpu)",
    "isNonNull": "isNonNull(web.s2.cpu)",
    "keepLastValue": "keepLastValue(web.s2.cpu)",
    "limit": "limit(sortByName(web.*.cpu),1)",
    "linearRegression": "linearRegression(web.s1.cpu)",
    "lowest": 'lowest(web.*.cpu,1,"current")',
    "lowestAverage": "lowestAverage(web.*.cpu,1)",
    "lowestCurrent": "lowestCurrent(web.*.cpu,1)",
    "maxSeries": "maxSeries(web.*.cpu)",
    "maximumAbove": "maximumAbove(web.*.cpu,1)",
    "maximumBelow": "maximumBelow(web.*.cpu,1000)",
    "minMax": "minMax(web.s1.cpu)",
    "minSeries": "minSeries(web.*.cpu)",
    "minimumAbove": "minimumAbove(web.*.cpu,1)",
    "minimumBelow": "minimumBelow(web.*.cpu,1000)",
    "mostDeviant": "mostDeviant(web.*.cpu,1)",
    "movingAverage": "movingAverage(web.s1.cpu,3)",
    "movingMax": "movingMax(web.s1.cpu,3)",
    "movingMedian": "movingMedian(web.s1.cpu,3)",
    "movingMin": "movingMin(web.s1.cpu,3)",
    "movingSum": "movingSum(web.s1.cpu,3)",
    "movingWindow": 'movingWindow(web.s1.cpu,"3min","sum")',
    "multiplySeries": "multiplySeries(web.s1.cpu,db.s1.mem)",
    "nPercentile": "nPercentile(web.s1.cpu,50)",
    "nonNegativeDerivative": "nonNegativeDerivative(web.s1.cpu)",
    "offset": "offset(web.s1.cpu,-3)",
    "offsetToZero": "offsetToZero(web.s1.cpu)",
    "perSecond": "perSecond(web.s1.cpu)",
    "percentileOfSeries": "percentileOfSeries(web.*.cpu,50)",
    "pow": "pow(web.s1.cpu,2)",
    "rangeOfSeries": "rangeOfSeries(web.*.cpu)",
    "removeAbovePercentile": "removeAbovePercentile(web.s1.cpu,90)",
    "removeAboveValue": "removeAboveValue(web.s1.cpu,15)",
    "removeBelowPercentile": "removeBelowPercentile(web.s1.cpu,10)",
    "removeBelowValue": "removeBelowValue(web.s1.cpu,12)",
    "removeBetweenPercentile": "removeBetweenPercentile(*.*.*,65)",
    "removeEmptySeries": "removeEmptySeries(web.*.cpu)",
    "scale": "scale(web.s1.cpu,2)",
    "scaleToSeconds": "scaleToSeconds(web.s1.cpu,90)",
    "smartSummarize": 'smartSummarize(web.s1.cpu,"5min","sum")',
    "sortBy": 'sortBy(web.*.cpu,"average")',
    "sortByMaxima": "sortByMaxima(web.*.cpu)",
    "sortByMinima": "sortByMinima(web.*.cpu)",
    "sortByName": "sortByName(web.*.cpu)",
    "sortByTotal": "sortByTotal(web.*.cpu)",
    "squareRoot": "squareRoot(web.s1.cpu)",
    "stddevSeries": "stddevSeries(web.*.cpu)",
    "stdev": "stdev(web.s1.cpu,3)",
    "substr": "substr(web.s1.cpu,1)",
    "sum": "sum(web.*.cpu)",
    "sumSeries": "sumSeries(web.*.cpu)",
    "sumSeriesWithWildcards": "sumSeriesWithWildcards(dc0.web.*,0)",
    "summarize": 'summarize(web.s1.cpu,"5min","sum")',
    "timeShift": 'timeShift(web.s1.cpu,"1min")',
    "timeSlice": f"timeSlice(web.s1.cpu,{T0 + 60},{T0 + 300})",
    "timeStack": 'timeStack(web.s1.cpu,"1min",0,2)',
    "transformNull": "transformNull(web.s2.cpu,0)",
    "unique": "unique(web.*.cpu,web.s1.cpu)",
    "useSeriesAbove": 'useSeriesAbove(db.s1.mem,1,"mem","mem")',
    "weightedAverage": "weightedAverage(web.*.cpu,web.*.cpu,1)",
}


def test_invocation_table_is_complete():
    registered = set(supported_functions())
    table = set(INVOCATIONS)
    missing = sorted(registered - table)
    stale = sorted(table - registered)
    assert not missing, (
        "registered render functions with no execution-coverage row "
        f"(add an INVOCATIONS entry): {missing}"
    )
    assert not stale, f"INVOCATIONS rows for unregistered names: {stale}"


@pytest.mark.parametrize("name", sorted(INVOCATIONS))
def test_every_registered_function_executes(spark, store, name):
    out = render(spark, INVOCATIONS[name], series=store)
    rows = out.collect()
    # every canonical invocation must actually produce rows — an
    # empty result here means the invocation (or adapter) is wrong
    assert rows, f"{name}: canonical invocation returned no rows"
    for r in rows:
        assert set(r.asDict()) == {"metric", "ts", "value"}
