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

from pyspark.sql import functions as F
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


# ------------------------------------------------ slice_runs / chunking

def ref_slice_runs(ts_list, step, max_gap):
    """Run-splitting (CeresNode.write ≈L640): new run when the gap to
    the previous quantized ts exceeds max_gap steps."""
    runs = []
    for t in sorted(set(ts_list)):
        if runs and t - runs[-1][-1] <= max_gap * step:
            runs[-1].append(t)
        else:
            runs.append([t])
    return {
        i: (r[0], r[-1], len(r)) for i, r in enumerate(runs)
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    max_gap=st.integers(min_value=1, max_value=10),
)
def test_slice_runs_matches_reference(spark, steps, max_gap):
    ts_list = [s * 60 for s in steps]
    df = spark.createDataFrame(
        [("m", t, 1.0) for t in sorted(set(ts_list))],
        "metric string, ts long, value double",
    )
    got = {
        r["run_id"]: (r["run_start"], r["run_end"], r["n_points"])
        for r in cp.slice_runs(df, 60, max_gap=max_gap).collect()
    }
    assert got == ref_slice_runs(ts_list, 60, max_gap)


def ref_chunks(tokens_list, size, stride):
    out = []
    for i, s in enumerate(range(0, len(tokens_list), stride)):
        out.append((i, " ".join(tokens_list[s : s + size]),
                    min(size, len(tokens_list) - s)))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    size=st.integers(min_value=1, max_value=20),
    stride=st.integers(min_value=1, max_value=20),
)
def test_chunking_matches_reference(spark, n_tokens, size, stride):
    import ceres_spark.operators.chunking as chk

    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, "s", " ".join(toks))], "doc_id long, source string, text string"
    )
    got = [
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chk.chunk_documents(df, size=size, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    ]
    assert got == ref_chunks(toks, size, stride)


# ------------------------------------------ banded dedup losslessness

@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=2, max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_fuzzy_banded_lossless_on_random_corpora(spark, texts, d):
    """The PassJoin segment filter must be LOSSLESS on arbitrary
    strings — including empties, shorter-than-m prefixes, and
    high-collision two-letter alphabets — not just on fixtures."""
    import ceres_spark.operators.dedup as dd

    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    # call the quadratic BODY explicitly: fuzzy_pairs is now a regime
    # dispatcher and would route these tight dials to the banded path,
    # making the comparison vacuous
    quad = {(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in dd.fuzzy_pairs_quadratic(docs, prefix_len=24,
                                              max_dist=d).collect()}
    band = {(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in dd.fuzzy_pairs_banded(docs, prefix_len=24,
                                           max_dist=d).collect()}
    assert quad == band
    disp = {(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in dd.fuzzy_pairs(docs, prefix_len=24,
                                    max_dist=d).collect()}
    assert disp == quad  # dispatch changes the plan, never the answer


def ref_ntile(n: int, b: int) -> list[int]:
    """Row-at-a-time SQL-standard ntile reference: deal rows into b
    buckets, first (n mod b) buckets get the extra row."""
    base, rem = divmod(n, b)
    out = []
    for bucket in range(1, b + 1):
        size = base + (1 if bucket <= rem else 0)
        out.extend([bucket] * size)
    return out


@given(
    n=st.integers(min_value=0, max_value=2000),
    b=st.integers(min_value=1, max_value=64),
)
@settings(deadline=None, max_examples=200)
def test_ntile_bucket_formula_matches_reference(n, b):
    import ceres_spark.operators.relational as rel

    got = list(rel.ntile_buckets(range(n), n, b)) if n else []
    assert got == ref_ntile(n, b)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=40),
        min_size=2, max_size=10,
    ),
    st.integers(min_value=0, max_value=16),
)
def test_simhash_banded_lossless_on_random_corpora(spark, texts, h):
    import ceres_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    s = dd.simhash(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = s.select(F.col("doc_id").alias("doc_a"),
                 F.col("simhash").alias("_ha"),
                 F.col("source").alias("_blk"))
    b = s.select(F.col("doc_id").alias("doc_b"),
                 F.col("simhash").alias("_hb"),
                 F.col("source").alias("_blk"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, "_blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                dd.hamming64(F.col("_ha"), F.col("_hb")).alias("hamming"))
        .filter(F.col("hamming") <= h).collect()
    }
    band = {(r["doc_a"], r["doc_b"], r["hamming"])
            for r in dd.simhash_pairs(docs, max_hamming=h).collect()}
    assert brute == band


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=8,
    ),
    target=st.integers(min_value=1, max_value=1_000_000),
    temp=st.sampled_from(["sqrt", "proportional"]),
)
def test_temperature_mix_always_sums_to_target(spark, counts, target, temp):
    """Largest-remainder apportionment: Σ alloc == target EXACTLY for
    any source sizes, any target, both temperatures — the invariant a
    training-mix consumer depends on."""
    import ceres_spark.operators.corpus as corp

    rows = []
    for i, c in enumerate(counts):
        # c tokens in source i (one doc of c whitespace tokens)
        rows.append((i, f"s{i}", " ".join(["w"] * c) if c else ""))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = corp.temperature_mix(
        docs, target_total_tokens=target, temperature=temp
    ).collect()
    # all-empty corpora have zero weight mass — N/A for apportionment
    if sum(r["weight"] for r in out) == 0:
        return
    assert sum(r["alloc_tokens"] for r in out) == target
    assert all(r["alloc_tokens"] >= 0 for r in out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        min_size=1, max_size=6,
    )
)
def test_text_normalize_is_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) on arbitrary unicode —
    a second pass through the gate must be a no-op (pipelines re-run
    stages; non-idempotent normalizers silently drift text)."""
    import ceres_spark.operators.text as text
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = text.text_normalize(docs).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    twice = text.text_normalize(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["norm_text"] for r in twice.collect()}
    assert a == b


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings=st.lists(
    st.text(st.characters(codec="utf-8", exclude_categories=("Cs",)),
            min_size=0, max_size=40),
    min_size=1, max_size=20, unique=True))
def test_md5_low31_matches_pure_python(spark, strings):
    # the portable hash every sketch/LSH oracle leans on: Spark's
    # reversed-hex conv == digest bytes 8..16 LE masked to 31 bits
    import hashlib

    from ceres_spark.operators.dedup import _md5_low31

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", _md5_low31(F.col("s")).alias("h")).collect()}
    for s in strings:
        d = hashlib.md5(s.encode()).digest()
        assert got[s] == int.from_bytes(d[8:16], "little") & 0x7FFFFFFF, s


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(
    st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
    min_size=1, max_size=40))
def test_morton_key_bijective_and_ordered(spark, pairs):
    # interleave must be invertible (no two cells share a key) and
    # reproduce the bit-interleave reference on arbitrary 16-bit input
    import ceres_spark.operators.layout as lay

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(pairs, "x long, y long")
    got = [r["z"] for r in
           df.select(lay.morton_key(F.col("x"), F.col("y")).alias("z"))
           .collect()]
    assert got == [ref(x, y) for x, y in pairs]
    assert len(set(got)) == len(set(pairs))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(0, 10**9), min_size=1, max_size=120),
    k=st.sampled_from([4, 16, 64]),
    nsplit=st.integers(1, 4),
)
def test_kmv_split_invariance(spark, vals, k, nsplit):
    # the sketch of a union == sketch of the whole, for ANY split of
    # the input and ANY duplication across splits — mergeability as a
    # property, not an example
    import ceres_spark.operators.sketches as sk

    whole = spark.createDataFrame([("g", v) for v in vals],
                                  "g string, v long")
    parts = [("g", v) for i, v in enumerate(vals)] + \
            [("g", v) for v in vals[::max(1, nsplit)]]  # re-arrivals
    split_df = spark.createDataFrame(parts, "g string, v long")
    a = sk.kmv_distinct(whole, "g", "v", k=k).collect()[0]
    b = sk.kmv_distinct(split_df, "g", "v", k=k).collect()[0]
    assert (a["n_tracked"], a["est_distinct"]) == (
        b["n_tracked"], b["est_distinct"])


# ----------------------------- r6 container layers (pure Python)

@given(
    sizes=st.lists(st.integers(min_value=1, max_value=400),
                   min_size=1, max_size=12),
    kf_every=st.integers(min_value=1, max_value=5),
    delta=st.integers(min_value=1, max_value=3000),
)
@settings(max_examples=60, deadline=None)
def test_mp4_manifest_matches_construction(sizes, kf_every, delta):
    # parse_mp4 derives everything from the sample tables — for ANY
    # mux input the manifest must equal the construction arithmetic
    import ceres_spark.operators.mp4 as m4

    samples = [bytes([(i * 31) % 251]) * s for i, s in enumerate(sizes)]
    p = m4.encode_mp4(samples, width=64, height=32, timescale=90000,
                      sample_delta=delta, keyframe_every=kf_every)
    m = m4.parse_mp4(p)
    assert m["n_samples"] == len(sizes)
    assert m["sizes"] == sizes
    assert m["duration"] == len(sizes) * delta
    assert m["mdat_bytes"] == sum(sizes)
    offs, acc = [], 32
    for s in sizes:
        offs.append(acc)
        acc += s
    assert m["sample_offsets"] == offs
    kf = list(range(0, len(sizes), kf_every))
    assert m["keyframes"] == [k + 1 for k in kf]
    assert m["keyframe_offsets"] == [offs[k] for k in kf]


@given(
    brs=st.lists(st.sampled_from([32, 40, 48, 56, 64, 80, 96, 112,
                                  128, 160, 192, 224, 256, 320]),
                 min_size=1, max_size=10),
    sr=st.sampled_from([44100, 48000, 32000]),
    id3=st.sampled_from([0, 10, 37, 59]),
)
@settings(max_examples=60, deadline=None)
def test_mp3_census_matches_construction(brs, sr, id3):
    import ceres_spark.operators.mp3 as m3

    m = m3.parse_mp3(m3.encode_mp3_frames(brs, rate=sr, id3_bytes=id3))
    assert m["n_frames"] == len(brs)
    assert m["total_samples"] == len(brs) * 1152
    assert m["is_vbr"] == (len(set(brs)) > 1)
    assert m["bitrate_sum"] == sum(brs)
    assert m["id3_bytes"] == id3
    assert m["audio_bytes"] == sum(
        144000 * b // sr + (i % 2) for i, b in enumerate(brs))


@given(n=st.integers(min_value=0, max_value=(1 << 36) - 1))
@settings(max_examples=200, deadline=None)
def test_flac_utf8_code_roundtrips_and_is_canonical(n):
    # ADVICE r5: canonical byte count per the 6+5k capacity table,
    # and the in-repo reader inverts the writer for EVERY value
    import ceres_spark.operators.multimodal as mm

    enc = mm._utf8_code(n)
    bits = n.bit_length()
    want = 1 if bits <= 7 else 1 + -(-(bits - 6) // 5)
    assert len(enc) == want, (hex(n), enc.hex())
    r = mm._MSBReader(enc, 0)
    assert mm._utf8_decode(r) == n


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                  # metric
            st.integers(min_value=0, max_value=200000),   # epoch s (spans 3 UTC days)
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(min_value=0, max_value=3),        # arrival batch
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_backfill_converges_to_all_batch_aggregate(spark, rows):
    # the ceres unlimited-lateness guarantee as a PROPERTY: for ANY
    # batch assignment, repairing a dashboard that is correct on
    # windows without late (batch >= since) rows yields exactly the
    # all-batch aggregate on every window with at least one row
    import ceres_spark.operators.retention as ret

    win, since = 300, 3
    # carry the store's `date` partition column so the property also
    # exercises the 3-key (metric, ts, date) semi-join path — the
    # branch ADVICE r10 flagged as never property-tested
    import datetime as _dt

    stored = spark.createDataFrame(
        [
            (m, t, v, b, _dt.date(1970, 1, 1) + _dt.timedelta(t // 86400))
            for m, t, v, b in rows
        ],
        "metric string, x long, value double, arrival_batch long,"
        " date date",
    )
    from pyspark.sql import functions as F

    w = (F.col("x") - F.col("x") % win).cast("long").alias("ts")
    dashboard = (
        stored.filter(F.col("arrival_batch") < since)
        .groupBy("metric", w)
        .agg(
            F.count("value").alias("n_points"),
            F.sum("value").alias("sum_value"),
        )
    )
    got = {
        (r["metric"], r["ts"]): (r["n_points"], r["sum_value"])
        for r in ret.backfill_rollup_windows(
            stored, dashboard, win, since_batch=since
        ).collect()
    }
    want = {
        (r["metric"], r["ts"]): (r["n_points"], r["sum_value"])
        for r in stored.groupBy("metric", w)
        .agg(
            F.count("value").alias("n_points"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        gn, gs = got[k]
        assert gn == n
        assert gs == pytest.approx(s, rel=1e-9, abs=1e-9)


def _ema_window_ref(vals, n):
    """Pure-Python replay of the transcribed graphite EMA rule
    (operators/series.ema_window docstring): decimal-lattice seed
    over the first n slots (None-skipping; all-None seeds AND emits
    0.0 — graphite's `safeAvg(window) or 0` is appended
    unconditionally, ADVICE r11), c = 2/(n+1), each output slot consumes
    the PREVIOUS slot's datapoint, None emits None without updating
    the state, final overflow value dropped. Returns the outputs
    aligned to slots n..len-1."""
    import decimal

    if len(vals) <= n:
        return []
    q = decimal.Decimal(1).scaleb(-10)
    nn = [v for v in vals[:n] if v is not None]
    if nn:
        s = sum(
            (decimal.Decimal(repr(v)).quantize(
                q, rounding=decimal.ROUND_HALF_UP) for v in nn),
            decimal.Decimal(0),
        )
        seed = float(str(s)) / len(nn)
    else:
        seed = 0.0
    out = [seed]
    state = seed
    c = 2.0 / (n + 1.0)
    for k in range(n + 1, len(vals)):
        v = vals[k - 1]
        if v is None:
            out.append(None)
        else:
            state = c * v + (1 - c) * state
            out.append(state)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # quarter-integers: exact in binary AND in <=2 decimal digits, so
    # the decimal seed lattice is exact on both sides and the property
    # pins the RECURSION/PHASE/None semantics (string-formatting
    # parity across engines is covered by the 208-entry oracle sweep)
    values=st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-400, max_value=400).map(lambda k: k / 4),
        ),
        min_size=0,
        max_size=24,
    ),
    n=st.integers(min_value=1, max_value=6),
)
def test_ema_window_matches_reference(spark, values, n):
    import ceres_spark.operators.series as ser

    rows = [("m", i * 3600, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {
        r["ts"]: r["ema"]
        for r in ser.ema_window(df, window_points=n).collect()
    }
    want = _ema_window_ref(values, n)
    assert len(got) == len(want)
    for j, w in enumerate(want):
        g = got[(n + j) * 3600]
        if w is None:
            assert g is None
        else:
            # the recursion is the same IEEE op sequence — exact
            assert g == w, (j, g, w)
