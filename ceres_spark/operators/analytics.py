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
    """
    base = events.select(
        "user_id", "event_type", _event_secs(events).alias("t")
    )
    out = None
    reach = None
    for i, step in enumerate(steps):
        hits = base.filter(F.col("event_type") == step)
        if reach is not None:
            hits = hits.join(reach, "user_id").filter(
                F.col("t") >= F.col("t_reach")
            ).drop("t_reach")
        reach = hits.groupBy("user_id").agg(F.min("t").alias("t_reach"))
        row = reach.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


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
