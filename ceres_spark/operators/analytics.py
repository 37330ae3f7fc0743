"""Event-sequence analytics over the ``events`` stream (north-star
§2.2 generalization of the read path): funnel stage conversion and
cohort retention — the two queries every product-analytics deployment
runs on a time-series store, and deliberately ORDER-aware (ceres
itself has no notion of event ordering beyond the timestamp grid).

Scale shape: both ops reduce the raw stream to USER-cardinality
aggregates first (map-side combinable min/distinct), and every
subsequent join is between user-cardinality sides keyed on user_id —
the raw fact table is scanned once per funnel step and never joined
against itself at event cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ceres_spark.operators.windows import event_time

WEEK = 7 * 86400


def _event_secs(events: DataFrame) -> Column:
    """Epoch-second BIGINT event time (integer math end-to-end)."""
    import pyspark.sql.types as T

    dtype = events.schema["ts"].dataType
    if isinstance(dtype, T.LongType):  # nanosAsLong read path
        return F.expr("ts DIV 1000000000")
    return F.unix_timestamp(event_time(events)).cast("long")


def funnel(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: a user reaches step i+1 with an event of that
    type AT OR AFTER their first step-i reach time (first-touch
    attribution; ties at the same second count, matching the oracle's
    ``t >= t_prev``).

    Returns one row per step: ``step_idx, step, n_users``.

    Plan (optimization r12, guide §2.4): ONE user-partitioned window
    pass computes every step's first-reach time off the same
    exchange — ``t_i = min(t | type = step_i ∧ t >= t_{i-1}) over
    (partition by user)`` — then a per-user aggregate (reuses the
    window's partitioning, no second shuffle) and one scalar count
    per step. The old reach-join chain re-evaluated each prior
    stage's events subtree per step (12 scans in the census plan);
    this shape scans events once and shuffles once. Null users
    replicate the join semantics exactly: step 1's GROUP BY counts
    the null group, steps ≥ 2 gate on ``user_id IS NOT NULL``
    because a USING join never matches null keys.
    """
    from pyspark.sql.window import Window

    base = events.select(
        "user_id", "event_type", _event_secs(events).alias("t")
    )
    w = Window.partitionBy("user_id")
    cur = base
    prev_t = None
    for i, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev_t is not None:
            cond = (
                cond & (F.col("t") >= prev_t)
                & F.col("user_id").isNotNull()
            )
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col("t"))).over(w)
        )
        prev_t = F.col(f"_t{i}")
    per_user = cur.groupBy("user_id").agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    totals = per_user.agg(
        *[F.count(f"_t{i}").alias(f"_n{i}") for i in range(len(steps))]
    )
    return totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step_idx"),
                        F.lit(step).alias("step"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("_s")
    ).select("_s.*")


def cohort_retention(events: DataFrame, period_s: int = WEEK) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    first event; one row per (cohort, period offset) counting users
    active again in that period.

    ``(cohort_start, week_offset, n_active)`` — offset 0 is the cohort
    size. All period math is integer quantization (``t - t % period``),
    the same grid arithmetic as the ceres read path.
    """
    p = int(period_s)
    base = events.select("user_id", _event_secs(events).alias("t"))
    first = base.groupBy("user_id").agg(F.min("t").alias("_ft"))
    cohort = first.select(
        "user_id", (F.col("_ft") - F.col("_ft") % p).alias("_cw")
    )
    active = base.select(
        "user_id", (F.col("t") - F.col("t") % p).alias("_w")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.col("_cw").alias("cohort_start"),
            F.expr(f"(_w - _cw) DIV {p}").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-path transition matrix (the Markov/Sankey
    view of a clickstream): for every ordered pair of consecutive
    events of one user, count (from_type → to_type) and its share of
    all transitions leaving from_type.

    Ordering is pinned to (raw ts, event_id) — a pure timestamp
    order is ambiguous under simultaneous events, and an ambiguous
    LEAD is the classic nondeterministic-window bug; with the
    tiebreak the lead is a total order, so counts (and the
    integer→double shares) are engine-exact. The RAW ts column
    (epoch-nanos long or timestamp) sorts identically in both
    engines, so no epoch conversion is needed for ordering. One
    per-user window + one grouped count: shuffles on user then on
    the TYPE-PAIR table (≤ |types|² rows).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id")
    )
    pairs = (
        events.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    from_tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(from_tot)
        ).alias("share_from"),
    )


def time_to_convert(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    period_s: int = WEEK,
) -> DataFrame:
    """Conversion-latency distribution per starting cohort: for each
    user, the delta from their FIRST ``from_type`` event to their
    first ``to_type`` event AT OR AFTER it; per cohort period of the
    starting event, the conversion count and the exact discrete
    p50/p90 latencies (``percentile_disc`` — observed deltas, so the
    quantiles are engine-portable integers, not interpolations).

    Plan: two user-cardinality aggregates + one user-keyed join —
    the raw stream is never self-joined; the percentile sort runs
    over converted-user counts per cohort, not events.
    """
    p = int(period_s)
    t = _event_secs(events)
    first_from = (
        events.filter(F.col("event_type") == from_type)
        .groupBy("user_id")
        .agg(F.min(t).alias("_t0"))
    )
    to_times = events.filter(F.col("event_type") == to_type).select(
        "user_id", t.alias("_t")
    )
    per_user = (
        first_from.join(to_times, "user_id", "left")
        .groupBy("user_id", "_t0")
        .agg(
            F.min(F.when(F.col("_t") >= F.col("_t0"), F.col("_t"))).alias(
                "_t1"
            )
        )
        .select(
            (F.col("_t0") - F.col("_t0") % p).alias("cohort_start"),
            (F.col("_t1") - F.col("_t0")).alias("_delta"),
        )
    )
    return per_user.groupBy("cohort_start").agg(
        F.count("*").cast("bigint").alias("n_started"),
        F.count("_delta").cast("bigint").alias("n_converted"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY _delta)"
        ).cast("bigint").alias("p50_latency_s"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY _delta)"
        ).cast("bigint").alias("p90_latency_s"),
    )


def hot_keys(df: DataFrame, key_col: str, hot_min_rows: int) -> DataFrame:
    """Keys owning at least ``hot_min_rows`` rows — the targeted-
    salting prefilter shared by :func:`event_transitions_salted` and
    :func:`funnel_salted`. One grouped COUNT (map-side combinable, so
    the detection itself is skew-neutral) filtered to a set whose
    size is BOUNDED by construction: at most N / hot_min_rows keys,
    so with the threshold set ≳ the rows a single task comfortably
    owns (the only regime where salting helps at all), the hot set is
    always broadcast-small. Everything below the threshold takes the
    unchanged unsalted plan — uniform data pays one cheap aggregate
    and nothing else.
    """
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= int(hot_min_rows))
        .select(key_col)
    )


# Past this many hot keys the literal isin() predicate stops being the
# cheap path: every branch of the plan that references the flagged
# frame re-inlines the full literal list into analysis/codegen, and in
# funnel's chained step lineage that multiplies (measured 0.81→3.83 s
# at sf0.1 with a 1,222-key list under the old 4096 threshold). The
# collected list rides a driver-local broadcast DataFrame instead —
# a compact LocalTableScan whose plan cost is constant in list size.
# Either way detection runs ONCE.
MAX_HOT_ISIN = 64


def collect_hot_keys(
    df: DataFrame, key_col: str, hot_min_rows: int
) -> list:
    """Driver-side hot-key set — ONE detection job, reused everywhere.

    The set is broadcast-small by construction (≤ N / hot_min_rows
    keys), so collecting it is no heavier than the broadcast the
    salted plans already paid. Collecting instead of re-referencing
    the aggregate subtree means detection runs EXACTLY once per call:
    the earlier form paid the limit(1) probe job, a min/max collect,
    and a recompute of the hot_keys aggregate wherever the broadcast
    frame was referenced (once per funnel step) unless AQE exchange
    reuse happened to kick in (ADVICE r7).
    """
    return [r[0] for r in hot_keys(df, key_col, hot_min_rows).collect()]


def collect_hot_keys_and_bounds(
    df: DataFrame, key_col: str, hot_min_rows: int, sec_col
) -> tuple[list, int | None, int | None]:
    """Hot-key set PLUS global min/max of ``sec_col`` in ONE job.

    :func:`event_transitions_salted` needs both the hot set and the
    time-range bounds; computing them separately is two full scans
    and two driver round-trips. The per-key aggregate already visits
    every row, so the global bounds fall out of a second-level
    aggregate over the per-key partials: one shuffle, one collected
    row. The hot array stays bounded exactly as before (≤ N /
    hot_min_rows entries — ``collect_list`` skips the NULLs the
    below-threshold keys produce)."""
    per_key = df.groupBy(key_col).agg(
        F.count("*").alias("_n"),
        F.min(sec_col).alias("_lo"),
        F.max(sec_col).alias("_hi"),
    )
    row = per_key.agg(
        F.collect_list(
            F.when(F.col("_n") >= int(hot_min_rows), F.col(key_col))
        ).alias("_hot"),
        F.min("_lo").alias("_glo"),
        F.max("_hi").alias("_ghi"),
    ).collect()[0]
    return list(row[0]), row[1], row[2]


def _flag_hot(df: DataFrame, key_col: str, hot_list: list) -> DataFrame:
    """``df`` plus a materialized boolean ``_hot`` column (never null).

    Tiny sets become a literal ``isin`` (pure codegen, zero extra
    join); anything larger rides one broadcast join against a
    driver-local table (LocalTableScan — constant plan cost however
    long the list, and no aggregate-subtree recompute). Callers that
    derive per-key frames downstream should CARRY the column through
    their aggregates (``F.max("_hot")`` — hotness is constant per
    key) rather than re-flagging the derived frame: re-application
    chains the flag machinery into every branch of the lineage."""
    if len(hot_list) <= MAX_HOT_ISIN:
        return df.withColumn("_hot", F.col(key_col).isin(hot_list))
    from ceres_spark.sources.tables import local_rows

    spark = df.sparkSession
    hot_df = local_rows(
        spark, [(k,) for k in hot_list], df.select(key_col).schema
    ).withColumn("_hot_flag", F.lit(True))
    return (
        df.join(F.broadcast(hot_df), key_col, "left")
        .withColumn("_hot", F.coalesce(F.col("_hot_flag"), F.lit(False)))
        .drop("_hot_flag")
    )


def event_transitions_salted(
    events: DataFrame, n_chunks: int = 32, hot_min_rows: int = 1_000_000
) -> DataFrame:
    """:func:`event_transitions` with hot-key serialization salted
    away (VERDICT r6 #2 — the one measured genuine scale cost,
    docs/SCALING.md §SKEW): a user owning half the stream pins that
    many rows to ONE task in the per-user LEAD window; sequence
    semantics mean no engine can split an order it must honor —
    UNLESS the order itself is split order-contiguously. Consecutive-
    pair counting is associative over time-chunks of a user's
    timeline: within-chunk pairs come from a per-(user, chunk) window
    (n_chunks-way parallel for the hot user), and the only cross-
    chunk work is the boundary pair (last event of a chunk → first
    event of the next non-empty one), recovered from a partial-
    aggregatable min_by/max_by and one tiny per-user window over
    ≤ n_chunks rows.

    TARGETED, one-pass: :func:`hot_keys` users (≥ hot_min_rows rows —
    the bounded, broadcast-small set; i.e. actually serialization-
    bound) are flagged by ONE broadcast left-join and get the time-
    chunk id; everyone else gets the constant chunk 0 — for a cold
    user one chunk IS the whole timeline, so the same (user, chunk)
    window runs the exact unsalted sequence for them (no second scan,
    no anti-join: a blanket two-branch semi/anti split measured
    SLOWER than the skew it removed). Cold single-chunk users fall
    out of the boundary pass by construction (lead over one row is
    NULL). With no hot keys at all the plan early-exits to the
    unsalted form after one bounded probe of the hot set.

    Output is bit-identical to :func:`event_transitions` (the
    registry entry shares its oracle verbatim): within-chunk +
    boundary pairs are exactly the consecutive pairs of the full
    (ts, event_id) order. Chunk id = integer time-range bucket of the
    event second — order-contiguous with the sort (seconds coarsen
    raw ts), from one bounded min/max scalar job. Measured (x64
    fixtures, 6.4M events, min-of-3): uniform parity, 50%-hot 4.8 s →
    3.6 s, 90%-hot 6.9 s → 3.7 s (tools/salt_probe.py, §SKEW).

    The ``hot_min_rows`` default (1M) is the measured ENGAGE
    threshold, not a guess: the chunk/boundary machinery costs a
    roughly fixed ~1–1.5 s, so salting a 200k-row hot key LOSES
    (quiet-host skew_probe x4: 0.88 s unsalted vs 2.48 s salted)
    while a 3.2M-row hot key wins 0.87× and 5.8M wins 0.55×
    (salt_probe x64). Below the default the plan early-exits to the
    exact unsalted form after the one detection aggregate — so the
    twin is never worse than the original on data that doesn't need
    it. (SCALING.md §SKEW holds both tables.)

    DEPLOYMENT NOTE (r9): the interleaved A/B in
    tools/transitions_ab.py measured :func:`event_transitions_chunked`
    — blanket time-chunking, no detection job — matching this form's
    x64 skew win within noise at ~1.7× less toy-scale overhead
    (TIMINGS.md §r9); prefer it unless you specifically need the
    hot-set as a side product. This targeted form remains the
    reference implementation of the hot-key flag pattern
    funnel_salted requires (blanket salting would explode reach rows
    ×n_salts for every user there).
    """
    from pyspark.sql.window import Window

    n = int(n_chunks)
    # detection runs EXACTLY once: the bounded hot set AND the global
    # time bounds come from ONE fused aggregate job (two scans and
    # two driver round-trips before), then re-enter the plan as a
    # driver-local broadcast (or a literal for tiny sets) — no probe
    # job, no aggregate-subtree recompute (ADVICE r7)
    s = _event_secs(events)
    hot_list, lo, hi = collect_hot_keys_and_bounds(
        events, "user_id", hot_min_rows, s
    )
    if not hot_list:
        return event_transitions(events)
    span = int(hi) - int(lo) + 1
    proj = events.select(
        "user_id", "event_id", "event_type", "ts", s.alias("_s")
    )
    flagged = _flag_hot(proj, "user_id", hot_list)
    chunked = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(
            F.col("_hot"),
            F.expr(f"({n} * (_s - {int(lo)})) div {span}"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("_chunk"),
    )
    return _chunked_transition_pairs(chunked)


def _chunked_transition_pairs(chunked: DataFrame) -> DataFrame:
    """within-chunk + boundary pairs → the transition matrix.

    Shared tail of :func:`event_transitions_salted` (targeted) and
    :func:`event_transitions_chunked` (blanket): ``chunked`` carries
    ``user_id, event_id, event_type, ts, _chunk`` where ``_chunk`` is
    order-contiguous with (ts, event_id) per user. Within-chunk pairs
    come from the per-(user, chunk) LEAD window; cross-chunk seams
    from a map-side-combinable min_by/max_by aggregate plus one tiny
    per-user window over ≤ n_chunks rows. A single-chunk user's lead
    is NULL, so they fall out of the boundary pass by construction.
    """
    from pyspark.sql.window import Window

    wc = Window.partitionBy("user_id", "_chunk").orderBy(
        F.col("ts").asc(), F.col("event_id")
    )
    wcf = wc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # ONE pass computes the within-pairs AND the per-chunk edge
    # summary off the SAME (user, chunk) exchange+sort: the earlier
    # form fed a separate groupBy(user, chunk) min_by/max_by branch,
    # which re-scanned and re-shuffled every row (no exchange reuse
    # across a window and an aggregate with different partials) —
    # measured 3.1x unsalted on uniform x64 data; this form reads
    # the edge rows out of the window output (rn == cnt) instead
    rows = chunked.select(
        "user_id",
        "_chunk",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wc).alias("to_type"),
        F.row_number().over(wc).alias("_rn"),
        F.count("*").over(wcf).alias("_cnt"),
        F.first("event_type").over(wcf).alias("_first"),
    )
    within = rows.select("from_type", "to_type").filter(
        F.col("to_type").isNotNull()
    )
    wu = Window.partitionBy("user_id").orderBy("_chunk")
    boundary = (
        rows.filter(F.col("_rn") == F.col("_cnt"))
        .select(
            "user_id",
            "_chunk",
            F.col("from_type"),  # rn == cnt ⇒ the chunk's LAST event
            "_first",
        )
        .select(
            "from_type",
            F.lead("_first").over(wu).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )

    pairs = (
        within.unionByName(boundary)
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    from_tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(from_tot)
        ).alias("share_from"),
    )


def event_transitions_chunked(
    events: DataFrame, n_chunks: int = 32
) -> DataFrame:
    """BLANKET time-chunked :func:`event_transitions` — the
    detection-free twin (VERDICT r8 "what's wrong" #1 A/B).

    :func:`event_transitions_salted` pays a keyed detection aggregate
    (groupBy user → collect) plus a broadcast flag join to salt ONLY
    hot users. This form skips detection entirely: EVERY user's
    timeline is chunked into ``n_chunks`` global time buckets — the
    bounds come from one min/max scalar scan (a partial aggregate, no
    keyed shuffle, no broadcast join) — and the shared
    within+boundary tail reassembles exactly the consecutive pairs.
    For a cold user the per-(user, chunk) window is the same rows
    through the same sort, just with a few more (tiny) partitions;
    the extra cost vs unsalted is only the edges aggregate, whose
    map-side partials are ≤ distinct (user, chunk) per input split.
    Output is bit-identical to :func:`event_transitions` (same oracle
    as the salted twin). Measured against the targeted form in
    tools/salt_probe.py / docs/TIMINGS.md §r9.
    """
    n = int(n_chunks)
    s = _event_secs(events)
    lo, hi = events.agg(F.min(s), F.max(s)).collect()[0]
    if lo is None:
        return event_transitions(events)  # empty input, empty matrix
    span = int(hi) - int(lo) + 1
    chunked = events.select(
        "user_id", "event_id", "event_type", "ts", s.alias("_s")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.expr(f"({n} * (_s - {int(lo)})) div {span}")
        .cast("bigint")
        .alias("_chunk"),
    )
    return _chunked_transition_pairs(chunked)


def funnel_salted(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    n_salts: int = 16,
    hot_min_rows: int = 1_000_000,
) -> DataFrame:
    """:func:`funnel` with its reach join salted (VERDICT r6 #2): the
    unsalted plan's at-scale skew point is ``hits ⋈ reach ON
    user_id`` — at toy scale AQE broadcasts the tiny reach side and
    skew vanishes, but at user-cardinality reach (billions of rows)
    the join is sort-merge and a hot user sends that many EVENT-
    cardinality hits through one task.

    TARGETED, one-pass: hits carry ``_salt = hash(event_id) mod
    n_salts`` for :func:`hot_keys` users (flagged by ONE broadcast
    left-join) and the constant 0 for everyone else; reach rows
    explode into n_salts copies for hot users and exactly one (salt
    0) for the rest; ONE sort-merge join on (user_id, _salt) then
    serves both populations, spreading the hot user across n_salts
    tasks. Each step's reach feeds the next step ONCE — an earlier
    two-branch semi/anti design consumed reach twice per step, and
    with funnel's sequential step chain that recomputed every prior
    join per branch (measured 4.5× SLOWER than unsalted at 50%-hot;
    this form is what shipped). The merge back is the groupBy-min the
    plan already ran, whose partial aggregation is skew-neutral
    (0.90× in §SKEW). With no hot keys: one bounded probe, then the
    exact unsalted plan. Output is bit-identical to :func:`funnel`
    (shared oracle): the min over salted partitions is the min.
    """
    ns = int(n_salts)
    # one detection job total (ADVICE r7): the earlier broadcast-frame
    # form re-evaluated the hot_keys aggregate once per funnel step
    hot_list = collect_hot_keys(events, "user_id", hot_min_rows)
    if not hot_list:
        return funnel(events, steps)
    proj = events.select(
        "user_id", "event_id", "event_type", _event_secs(events).alias("t")
    )
    flagged = _flag_hot(proj, "user_id", hot_list)
    base = flagged.select(
        "user_id",
        "event_type",
        "t",
        F.when(
            F.col("_hot"),
            F.pmod(F.xxhash64("event_id"), F.lit(ns)),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("_salt"),
        "_hot",
    )
    out = None
    reach = None
    for i, step in enumerate(steps):
        hits = base.filter(F.col("event_type") == step)
        if reach is not None:
            # reach CARRIES its _hot flag from the aggregate below —
            # hotness is constant per user, so no re-flagging (and no
            # per-step join/literal chained into the lineage)
            reach_s = reach.select(
                "user_id",
                "t_reach",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("bigint"),
                        F.when(
                            F.col("_hot"),
                            F.lit(ns - 1).cast("bigint"),
                        ).otherwise(F.lit(0).cast("bigint")),
                    )
                ).alias("_salt"),
            )
            hits = hits.join(reach_s, ["user_id", "_salt"]).filter(
                F.col("t") >= F.col("t_reach")
            ).drop("t_reach")
        reach = hits.groupBy("user_id").agg(
            F.min("t").alias("t_reach"), F.max("_hot").alias("_hot")
        )
        row = reach.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out
