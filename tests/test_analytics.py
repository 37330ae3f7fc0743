"""Funnel / cohort / mixture-sampling semantics on hand-built data."""

from pyspark.sql import functions as F

import ceres_spark.operators.analytics as ana
import ceres_spark.operators.corpus as corp

EV = "user_id long, event_type string, ts long"
NS = 1_000_000_000  # events.ts is epoch-nanos long under nanosAsLong


def ev(spark, rows):
    return spark.createDataFrame(
        [(u, e, t * NS) for u, e, t in rows], EV
    )


def test_funnel_order_matters(spark):
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full
        (2, "click", 10), (2, "view", 20),                       # click BEFORE view
        (3, "view", 10), (3, "click", 10),                       # same-second tie counts
        (4, "purchase", 5),                                      # purchase w/o funnel
    ]
    out = {r["step"]: r["n_users"] for r in ana.funnel(ev(spark, rows)).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_offsets(spark):
    W = ana.WEEK
    rows = [
        (1, "view", 0), (1, "view", W + 5), (1, "view", 3 * W),  # offsets 0,1,3
        (2, "view", 0),                                           # cohort 0 only
        (3, "view", W),                                           # week-1 cohort
    ]
    out = {
        (r["cohort_start"], r["week_offset"]): r["n_active"]
        for r in ana.cohort_retention(ev(spark, rows)).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (W, 0): 1}


def test_mixture_sample_deterministic_and_monotone(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    full = corp.mixture_sample(docs, {"a": 1.0, "b": 1.0})
    assert all(r["n_kept"] == r["n_total"] for r in full.collect())
    half = {r["source"]: r for r in corp.mixture_sample(docs, {"a": 0.5, "b": 0.1}).collect()}
    assert 0.3 < half["a"]["kept_frac"] < 0.7      # ~50% of 200
    assert half["b"]["n_kept"] < half["a"]["n_kept"]
    again = {r["source"]: r for r in corp.mixture_sample(docs, {"a": 0.5, "b": 0.1}).collect()}
    assert {s: r["n_kept"] for s, r in half.items()} == {
        s: r["n_kept"] for s, r in again.items()
    }


def test_cap_per_source_exact_k_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i < 300 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    out = corp.cap_per_source(docs, k=50)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 50, "b": 50}
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in corp.cap_per_source(docs, k=50).collect()}
    assert a == b   # md5 order → stable kept set


def test_props_flatten_schema_on_read(spark):
    import ceres_spark.operators.windows as win
    ev = spark.createDataFrame(
        [
            (1, '{"k": 5, "tag": "x"}'),
            (2, '{"k": 7}'),
            (3, None),
            (4, '{"tag": "y", "extra": 1.5}'),
        ],
        "event_id long, props string",
    )
    flat = win.props_flatten(ev)
    cols = set(flat.columns)
    assert {"props_k", "props_tag", "props_extra"} <= cols
    rows = {r["event_id"]: r for r in flat.collect()}
    assert rows[1]["props_k"] == 5 and rows[1]["props_tag"] == "x"
    assert rows[2]["props_tag"] is None
    assert rows[4]["props_extra"] == 1.5
    assert rows[3]["props_k"] is None


def test_event_transitions_counts_and_shares(spark):
    import ceres_spark.operators.analytics as ana

    # user 1: a->b->a ; user 2: a->b ; user 3: single event (no pair)
    rows = [(1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"),
            (4, 2, 10, "a"), (5, 2, 40, "b"),
            (6, 3, 10, "c")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {(r["from_type"], r["to_type"]): r for r in
           ana.event_transitions(df).collect()}
    assert got[("a", "b")]["n_transitions"] == 2
    assert got[("b", "a")]["n_transitions"] == 1
    assert ("c", None) not in got and len(got) == 2
    assert got[("a", "b")]["share_from"] == 1.0   # all a-exits go to b
    assert got[("b", "a")]["share_from"] == 1.0


def test_event_transitions_tiebreak_is_event_id(spark):
    import ceres_spark.operators.analytics as ana

    # two simultaneous events: order must follow event_id
    rows = [(1, 1, 10, "a"), (2, 1, 10, "b"), (3, 1, 20, "c")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {(r["from_type"], r["to_type"]) for r in
           ana.event_transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_time_to_convert_deltas_and_percentiles(spark):
    import ceres_spark.operators.analytics as ana

    # u1: view@100 -> purchase@160 (delta 60); u2: view@100,
    # purchase@40 BEFORE the view (no conversion); u3: no purchase;
    # u4: view@100 -> purchases at 100 and 500 -> delta 0 (ties count)
    NS = 10**9  # LongType ts is the epoch-NANOS read path
    rows = [(1, 1, 100 * NS, "view"), (2, 1, 160 * NS, "purchase"),
            (3, 2, 100 * NS, "view"), (4, 2, 40 * NS, "purchase"),
            (5, 3, 100 * NS, "view"),
            (6, 4, 100 * NS, "view"), (7, 4, 100 * NS, "purchase"),
            (8, 4, 500 * NS, "purchase")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = ana.time_to_convert(df, "view", "purchase").collect()
    assert len(out) == 1
    r = out[0]
    assert r["cohort_start"] == 0
    assert r["n_started"] == 4 and r["n_converted"] == 2
    # deltas {60, 0}: discrete p50 = 0, p90 = 60
    assert r["p50_latency_s"] == 0 and r["p90_latency_s"] == 60


def _skewed_events(spark, n_users=40, hot_share=0.5, n=2000, seed=7):
    """Synthetic clickstream where ONE user owns ~hot_share of the
    rows — the §SKEW shape the salted variants exist for."""
    import random

    rng = random.Random(seed)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for eid in range(n):
        u = 0 if rng.random() < hot_share else rng.randrange(1, n_users)
        rows.append((eid, u, rng.randrange(0, 10**6) * NS,
                     types[rng.randrange(4)]))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )


def test_event_transitions_salted_bit_equal(spark):
    df = _skewed_events(spark)
    want = {tuple(r) for r in ana.event_transitions(df).collect()}
    # thresholds chosen to cover: everyone hot (1), the skewed mix
    # (the probe regime: one hot user + cold tail), and all-cold
    # (default 50k — degenerates to the plain window)
    for n_chunks, hot_min in ((1, 1), (3, 200), (32, 1), (32, 50_000)):
        got = {
            tuple(r)
            for r in ana.event_transitions_salted(
                df, n_chunks=n_chunks, hot_min_rows=hot_min
            ).collect()
        }
        assert got == want, (n_chunks, hot_min)


def test_event_transitions_salted_ties_and_boundaries(spark):
    # simultaneous events + single-event users, across chunk edges
    rows = [(1, 1, 10, "a"), (2, 1, 10, "b"), (3, 1, 20, "c"),
            (4, 1, 10**6, "a"), (5, 2, 50, "b"), (6, 3, 99, "c")]
    df = spark.createDataFrame(
        [(e, u, t * NS, ty) for e, u, t, ty in rows],
        "event_id long, user_id long, ts long, event_type string",
    )
    want = {tuple(r) for r in ana.event_transitions(df).collect()}
    got = {
        tuple(r)
        for r in ana.event_transitions_salted(
            df, n_chunks=5, hot_min_rows=2
        ).collect()
    }
    assert got == want


def test_event_transitions_chunked_bit_equal(spark):
    # the blanket (detection-free) twin: same oracle, every n_chunks
    df = _skewed_events(spark)
    want = {tuple(r) for r in ana.event_transitions(df).collect()}
    for n_chunks in (1, 3, 32):
        got = {
            tuple(r)
            for r in ana.event_transitions_chunked(
                df, n_chunks=n_chunks
            ).collect()
        }
        assert got == want, n_chunks
    # ties + single-event users across chunk edges, and empty input
    rows = [(1, 1, 10, "a"), (2, 1, 10, "b"), (3, 1, 20, "c"),
            (4, 1, 10**6, "a"), (5, 2, 50, "b"), (6, 3, 99, "c")]
    small = spark.createDataFrame(
        [(e, u, t * NS, ty) for e, u, t, ty in rows],
        "event_id long, user_id long, ts long, event_type string",
    )
    assert {
        tuple(r) for r in ana.event_transitions_chunked(small, 5).collect()
    } == {tuple(r) for r in ana.event_transitions(small).collect()}
    assert ana.event_transitions_chunked(small.limit(0), 4).count() == 0


def test_hot_keys_bounded_and_exact(spark):
    df = _skewed_events(spark, n=1000, hot_share=0.5)
    hot = {r["user_id"] for r in ana.hot_keys(df, "user_id", 300).collect()}
    counts = {
        r["user_id"]: r["n"]
        for r in df.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert hot == {u for u, n in counts.items() if n >= 300}
    assert 0 in hot  # the planted 50% user


def test_funnel_salted_bit_equal(spark):
    df = _skewed_events(spark, n=1500)
    want = [tuple(r) for r in ana.funnel(df).collect()]
    # everyone hot / mixed (probe regime) / all cold
    for ns, hot_min in ((1, 1), (4, 400), (16, 1), (16, 50_000)):
        got = [
            tuple(r)
            for r in ana.funnel_salted(
                df, n_salts=ns, hot_min_rows=hot_min
            ).collect()
        ]
        assert got == want, (ns, hot_min)


def test_funnel_salted_order_matters(spark):
    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
        (4, 2, 10, "click"), (5, 2, 20, "view"),
        (6, 3, 10, "view"), (7, 3, 10, "click"),
        (8, 4, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        [(e, u, t * NS, ty) for e, u, t, ty in rows],
        "event_id long, user_id long, ts long, event_type string",
    )
    out = {r["step"]: r["n_users"] for r in ana.funnel_salted(df).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}
