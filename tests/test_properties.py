"""Property tests (hypothesis) against a pure-Python reimplementation
of the reference semantics — SURVEY.md §7 hard-part 1: the
aggregate / aggregateSeries / compact kernels must match ceres.py
≈L460 (compact) and ≈L1005-1050 (aggregate/aggregateSeries) on
arbitrary inputs, not just fixtures.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ceres_spark.operators.aggregate as agg
import ceres_spark.operators.compact as cp

# ---------------------------------------------------- pure-python ref

def ref_aggregate(method, values):
    """aggregate() (ceres.py ≈L1005): None-filter, empty→None."""
    known = [v for v in values if v is not None]
    if not known:
        return None
    if method == "average":
        return sum(known) / len(known)
    if method == "sum":
        return sum(known)
    if method == "last":
        return known[-1]
    if method == "max":
        return max(known)
    if method == "min":
        return min(known)
    raise ValueError(method)


def ref_aggregate_series(method, old_step, new_step, dense_values, start=0):
    """aggregateSeries (≈L1033): chunk into factor-sized groups,
    partial last chunk still aggregated. Input is a DENSE value list
    starting at ``start`` with spacing ``old_step``; returns
    {bucket_ts: value}."""
    factor = new_step // old_step
    out = {}
    for ci in range(0, len(dense_values), factor):
        chunk = dense_values[ci : ci + factor]
        t = start + ci * old_step
        bucket = t - (t % new_step)
        out[bucket] = ref_aggregate(method, chunk)
    return out


def ref_compact(datapoints, step):
    """CeresNode.compact (≈L460): sort by raw ts (stable), drop None,
    quantize, duplicate quantized ts → last in sorted order wins."""
    cleaned = sorted(
        ((ts, v) for ts, v in datapoints if v is not None),
        key=lambda p: p[0],
    )
    out = {}
    for ts, v in cleaned:
        out[ts - (ts % step)] = v  # later (larger raw ts) overwrites
    return out


# ------------------------------------------------------- strategies

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
maybe_value = st.one_of(st.none(), finite)


# ---------------------------------------------------------- tests

@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(maybe_value, min_size=0, max_size=30),
    method=st.sampled_from(agg.AGGREGATION_METHODS),
)
def test_aggregate_matches_reference(spark, values, method):
    rows = [("m", i * 60, v, i) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, arrival_seq long"
    )
    got = df.groupBy("metric").agg(agg.agg_expr(method).alias("r")).collect()
    got_v = got[0]["r"] if got else None
    want = ref_aggregate(method, values)
    if want is None or got_v is None:
        assert want is None and (got_v is None or not got)
    else:
        assert got_v == pytest.approx(want, rel=1e-9, abs=1e-9)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(maybe_value, min_size=1, max_size=40),
    method=st.sampled_from(agg.AGGREGATION_METHODS),
    factor=st.sampled_from([2, 3, 5]),
)
def test_aggregate_series_matches_reference(spark, values, method, factor):
    old_step, new_step = 60, 60 * factor
    rows = [
        ("m", i * old_step, v, i)
        for i, v in enumerate(values)
        if v is not None  # sparse storage: gaps are absent rows
    ]
    want = {
        k: v
        for k, v in ref_aggregate_series(
            method, old_step, new_step, values
        ).items()
        if v is not None  # sparse output: empty buckets absent
    }
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, arrival_seq long"
    )
    got = {
        r["ts"]: r["value"]
        for r in agg.aggregate_series(df, method, new_step).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3000), maybe_value),
        min_size=0,
        max_size=30,
    ),
    step=st.sampled_from([60, 300]),
)
def test_compact_matches_reference(spark, points, step):
    # single batch (constant arrival_seq): the reference's
    # largest-raw-ts-wins rule must decide every bucket
    want = ref_compact(points, step)
    rows = [("m", ts, v, 0) for ts, v in points]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, arrival_seq long"
    )
    got = {r["ts"]: r["value"] for r in cp.compact(df, step).collect()}
    # ambiguity the reference itself leaves open: equal raw ts with
    # different values — ceres keeps input order (stable sort), a
    # distributed engine can't; exclude buckets with such exact ties
    from collections import Counter

    raw_ts_counts = Counter(ts for ts, v in points if v is not None)
    ambiguous = {
        ts - (ts % step)
        for ts, n in raw_ts_counts.items()
        if n > 1
    }
    for bucket, v in want.items():
        if bucket in ambiguous:
            assert bucket in got
        else:
            assert got[bucket] == pytest.approx(v, rel=1e-12)
    assert set(got) == set(want)


# ---------------------------------------------- shingles (HOF form)

def ref_shingles(text: str, k: int = 3) -> set[str]:
    """Reference k-token shingling: distinct space-joined k-grams of
    the lowercased whitespace-split tokens; whole text if < k tokens."""
    toks = text.lower().split(" ")
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),  # spaces + tiny alphabet
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_shingles_zipwith_matches_reference(spark, texts, k):
    """The zip_with/slice reformulation (perf fix) must be
    set-equivalent to the naive definition on arbitrary text,
    including texts with repeated/empty tokens and < k tokens."""
    import ceres_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["g"])
        for r in df.select("doc_id", dd.shingles(k).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_shingles(t, k), (t, k)
