"""Mergeable cardinality sketches (HLL, Apache DataSketches via
Spark's built-in ``hll_*`` functions).

Why sketches and not COUNT(DISTINCT): at 100 TB an exact distinct is
a full shuffle of every key occurrence; an HLL sketch is a few KB per
group, computed map-side, and — the property that matters — MERGEABLE:
sketch each partition/day once, store it, and answer any coarser
rollup (weekly, all-time) by unioning stored sketches without
re-reading data. That reaggregation is exactly how the engine's
multi-resolution rollups work for sums/means; HLL extends it to
distinct counts, which plain counters cannot reaggregate.

Determinism: DataSketches HLL has no RNG — same input multiset (in
any order, any partitioning) → identical registers → identical
estimate. So merged-daily == direct on the same data, asserted in
tests/test_sketches.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql.window import Window
from pyspark.sql import functions as F


def hll_lc_table(m: int) -> list[float]:
    """Linear-counting estimates ``round(m·ln(m/V), 4)`` for V=1..m,
    evaluated ONCE in Python and inlined as identical double literals
    on both the Spark and the oracle side of :func:`hll_portable`
    (ADVICE r7: an in-engine ln() whose 5th decimal sits within a ulp
    of the .5 boundary could round differently under Spark's
    java.lang.Math.log vs DuckDB's libm log — a rare flaky mismatch;
    a shared literal table removes the transcendental from both
    query plans entirely)."""
    return [round(m * math.log(m / v), 4) for v in range(1, m + 1)]


def lc_engine_log_safe(m: int, eps: float = 1e-6) -> bool:
    """True when ``round(m·ln(m/V), 4)`` is ulp-stable across engines
    for EVERY possible V in 1..m — i.e. no value's 4th-decimal
    fraction sits within ``eps`` of the .5 rounding boundary.

    The ln() domain is enumerable (V ≤ m), so the ADVICE r7 hazard —
    Spark's java.lang.Math.log and DuckDB's libm log disagreeing by a
    ulp exactly on a boundary — is CHECKABLE, not just avoidable: a
    1-ulp error at x ≤ m·ln(m) ≈ 1.4e3 (m=256) is ~2.3e-13, or
    ~2.3e-9 after the 1e4 scaling, so ``eps=1e-6`` gives a ~400×
    margin while triggering with probability ~m·2eps ≈ 5e-4 for an
    adversarial m. When safe (every practical m), :func:`hll_portable`
    keeps the cheap in-engine log — measured ~0.15 s/call cheaper
    than carrying the m-double array literal through codegen — and
    the oracle's Python-evaluated table becomes an INDEPENDENT
    computation path the hash check proves agreement with."""
    for v in range(1, int(m) + 1):
        frac = (m * math.log(m / v) * 1e4) % 1.0
        if abs(frac - 0.5) < eps:
            return False
    return True


def approx_distinct(
    df: DataFrame, group_col: str, value_col: str, lgk: int = 12
) -> DataFrame:
    """Distinct ``value_col`` per ``group_col``, estimated from one
    HLL sketch per group (map-side partial sketches, tiny shuffle)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lgk))
        ).alias("approx_distinct")
    )


def approx_distinct_reagg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_expr,
    lgk: int = 12,
) -> DataFrame:
    """The two-level path a warehouse actually runs: sketch per
    (group, bucket) — e.g. per day, stored alongside the rollup
    tables — then union sketches per group. Identical estimates to
    :func:`approx_distinct` on the same data (HLL union is exact on
    registers), so pre-sketching costs no accuracy."""
    daily = df.groupBy(F.col(group_col), bucket_expr.alias("_bucket")).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("_sk")
    )
    return daily.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
            "approx_distinct"
        )
    )


def histogram_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float = 1.0,
) -> DataFrame:
    """Mergeable equi-width histogram sketch: (group, bin) → count.

    The warehouse primitive behind approximate quantiles at 100 TB:
    per-partition histograms merge by summing counts (associative,
    exact), so partial aggregation does almost all the work map-side
    and re-aggregation across days/tables costs no accuracy — the
    same two-level shape as :func:`approx_distinct_reagg`."""
    b = F.floor(F.col(value_col) / F.lit(float(bin_width))).alias("bin")
    return df.groupBy(F.col(group_col), b).agg(
        F.count("*").alias("bin_count")
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    bin_width: float = 1.0,
) -> DataFrame:
    """Approximate quantiles from the histogram sketch with error
    bounded by ``bin_width`` (the estimate is the chosen bin's upper
    edge). All arithmetic is integer counts + one exact multiply —
    deterministic and oracle-expressible, unlike t-digest/KLL whose
    estimates depend on merge order.

    Per group: cumulative bin counts (tiny window — one row per
    OCCUPIED bin, not per point), then the first bin whose cumulative
    count reaches ⌈q·n⌉ yields the estimate."""
    hist = histogram_sketch(df, group_col, value_col, bin_width)
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("bin_count").over(w)).withColumn(
        "n", F.sum("bin_count").over(Window.partitionBy(group_col))
    )
    out_cols = []
    for q in qs:
        name = f"p{int(round(q * 100)):02d}_est"
        hit = F.when(
            F.col("cum") * F.lit(1.0) >= F.lit(float(q)) * F.col("n"),
            F.col("bin"),
        )
        out_cols.append(
            ((F.min(hit) + 1) * F.lit(float(bin_width))).alias(name)
        )
    return cum.groupBy(group_col).agg(
        *out_cols, F.max("n").alias("n_points")
    )


def frequent_items(
    df: DataFrame, key_col: str, k: int = 10, capacity: int = 64
) -> DataFrame:
    """Distributed Space-Saving heavy hitters — the mergeable
    frequent-items sketch completing the sketch family (HLL distinct,
    histogram quantiles, + this): per-partition capacity-``C``
    summaries, one item-keyed merge, PROVABLE count bounds.

    Per partition (mapInPandas, batch-vectorized: value_counts per
    Arrow batch, then a deterministic sorted merge into the table):
    every item's true in-partition count lies in [est − err, est],
    and any item occurring more than n_partition/C times is
    guaranteed tracked. At merge: for item i,
      count_max = Σ_tracked est_p(i) + (Σ_all θ_p − Σ_tracked θ_p)
      count_min = Σ_tracked (est_p(i) − err_p(i))
    where θ_p is partition p's eviction floor (min est once an
    eviction has actually occurred, else 0 — a full-but-unevicted
    table has seen every item, so it is still exact) — an untracked
    partition can hide at most θ_p occurrences. NULL keys are counted
    as a group (``value_counts(dropna=False)``), matching SQL
    ``GROUP BY``. Output: top-``k`` by count_max (item tie-break),
    with the [count_min, count_max] interval exposed so callers SEE
    the uncertainty instead of a point lie.

    Scale shape: emitted state is ≤ capacity+1 rows per partition —
    independent of partition size; the merge aggregates
    O(partitions × capacity) rows. With capacity ≥ per-partition
    distinct counts the sketch is EXACT (err 0, θ 0) — pytest pins
    that against a plain groupBy count.
    """
    import pandas as pd

    cap = int(capacity)
    _NULLKEY = "\x00__null__"  # in-table stand-in for the NULL key

    def scan(batches):
        table: dict = {}          # item -> [est, err]
        evicted = False           # theta is 0 until a real eviction
        for pdf in batches:
            # dropna=False: NULL keys are a group, same as SQL GROUP BY
            vc = pdf[key_col].value_counts(dropna=False)
            pairs = sorted(
                (
                    (_NULLKEY if pd.isna(k) else k, int(c))
                    for k, c in vc.items()
                ),
                key=lambda kv: str(kv[0]),
            )
            for item, cnt in pairs:
                if item in table:
                    table[item][0] += cnt
                elif len(table) < cap:
                    table[item] = [cnt, 0]
                else:
                    # evict the deterministic minimum (est, then item)
                    evict = min(
                        table, key=lambda x: (table[x][0], str(x))
                    )
                    theta = table[evict][0]
                    del table[evict]
                    table[item] = [theta + cnt, theta]
                    evicted = True
        # a full-but-never-evicted table has seen every item: an
        # untracked item occurred 0 times, so the floor stays 0 —
        # this is what makes capacity >= distinct EXACT
        theta_p = (
            min(v[0] for v in table.values()) if evicted else 0
        )
        rows = [
            {
                "item": None if it == _NULLKEY else it,
                "est": v[0], "err": v[1], "theta": theta_p, "kind": 0,
            }
            for it, v in table.items()
        ]
        rows.append(
            {"item": None, "est": 0, "err": 0, "theta": theta_p, "kind": 1}
        )
        yield pd.DataFrame(rows)

    sk = df.select(key_col).mapInPandas(
        scan, "item string, est long, err long, theta long, kind int"
    )
    total_theta = sk.filter(F.col("kind") == 1).agg(
        F.sum("theta").alias("_total_theta")
    )
    merged = (
        sk.filter(F.col("kind") == 0)
        .groupBy("item")
        .agg(
            F.sum("est").alias("_est"),
            F.sum(F.col("est") - F.col("err")).alias("count_min"),
            F.sum("theta").alias("_tracked_theta"),
        )
        .join(F.broadcast(total_theta))
        .withColumn(
            "count_max",
            F.col("_est") + F.col("_total_theta") - F.col("_tracked_theta"),
        )
    )
    return (
        merged.select("item", "count_min", "count_max")
        .orderBy(F.desc("count_max"), "item")
        .limit(int(k))
    )


def _kmin_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int, n_salts: int
) -> DataFrame:
    """Shared KMV construction for :func:`kmv_distinct` and
    :func:`kmv_overlap` — ONE copy of the engine-portability recipe
    (md5-low31 hash, NULL filter, distinct, salted two-phase k-min)
    so the two external oracles can never drift apart. Returns the
    per-group k smallest distinct hashes as rows
    ``(group_col, _hv, _rn)`` with ``_rn`` the 1-based global rank.
    """
    from ceres_spark.operators.dedup import _md5_low31

    h = (
        df.filter(F.col(value_col).isNotNull())  # COUNT DISTINCT semantics
        .select(
            F.col(group_col),
            _md5_low31(F.col(value_col).cast("string")).alias("_hv"),
        )
        .distinct()
        .withColumn("_salt", F.col("_hv") % F.lit(int(n_salts)))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_hv")
    survivors = (
        h.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= int(k))
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy("_hv")
    return survivors.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= int(k)
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    n_salts: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    deterministic, ENGINE-PORTABLE member of the sketch family: the
    tracked hash set, the k-th minimum, and the estimate are exact
    functions of the input multiset, so the whole sketch carries a
    bit-for-bit SQL oracle (HLL's registers are
    implementation-defined; this twin is what lets an external engine
    audit the sketch-counting path end to end).

    Estimator (Bar-Yossef et al. 2002): hash values to uniform 31-bit
    ints via the portable md5-low31 hash; with fewer than ``k``
    distinct hashes the count is exact, otherwise
    ``(k-1) · 2³¹ / h_(k)`` — all double ops on exact integers, so
    engines agree bit-for-bit. A 31-bit collision merges two users
    identically in both engines (and is priced into the estimator's
    error, ~1/√k ≫ collision mass).

    Scale shape — the reason this isn't one window over the distinct
    hashes: Window.partitionBy(group) puts EVERY distinct hash of a
    group through one reducer (1e9 rows per hot group at 100 TB).
    Instead the k-min runs two-phase, the DataFrame form of KMV's
    mergeability: per (group, hash mod n_salts) take the k smallest
    (n_salts-way parallel, each slice ~1/n_salts of the hashes), then
    k smallest of the ≤ n_salts·k survivors (tiny). Identical result
    to a global k-min — min-k of a union is min-k of per-part min-ks.
    """
    topk = _kmin_sketch(df, group_col, value_col, int(k), int(n_salts))
    # no separate exact-count pass: an un-full sketch (n_tracked < k)
    # holds EVERY distinct hash, so n_tracked is already the exact
    # count — the defining KMV property
    agg = topk.groupBy(group_col).agg(
        F.count("*").alias("n_tracked"),
        F.max(F.when(F.col("_rn") == int(k), F.col("_hv"))).alias("_hk"),
    )
    return agg.select(
        group_col,
        F.col("n_tracked").cast("bigint").alias("n_tracked"),
        F.when(
            F.col("n_tracked") < int(k),
            F.col("n_tracked").cast("double"),
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(1 << 31)) / F.col("_hk")
        )
        .alias("est_distinct"),
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    n_salts: int = 64,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups from KMV sketches
    (Beyer et al. 2007): for every group pair, estimate
    |A∪B| from the k-min sketch of the union and Jaccard from the
    fraction of union-sketch members present in BOTH sides —
    ``est_intersection = jaccard · est_union``. The audience-overlap
    primitive ("how many users do click and purchase share?") at
    sketch cost instead of a distinct-pair join.

    Why per-group sketches suffice: any hash among the k smallest of
    A∪B is among the k smallest of whichever side contains it, so
    K(A∪B) ⊆ K(A) ∪ K(B) and membership tests against the sketches
    are EXACT for union-sketch members. Everything is integer set
    algebra + two double ops — deterministic, engine-portable,
    hash-checked like :func:`kmv_distinct`.

    Scale contract: one row of ≤ k int64 per group after the same
    salted two-phase k-min as kmv_distinct; the pairing is a
    broadcast nested-loop over GROUP-cardinality rows (event types,
    sources — ≪ 10⁴ by contract), never over values.
    """
    kk = int(k)
    sk = (
        _kmin_sketch(df, group_col, value_col, kk, int(n_salts))
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("_hv")).alias("_kmin"))
    )
    a = sk.select(
        F.col(group_col).alias("type_a"), F.col("_kmin").alias("_ka")
    )
    b = sk.select(
        F.col(group_col).alias("type_b"), F.col("_kmin").alias("_kb")
    )
    pairs = a.join(
        F.broadcast(b), F.col("type_a") < F.col("type_b")
    )
    u = F.array_sort(F.array_union(F.col("_ka"), F.col("_kb")))
    m = F.least(F.lit(kk), F.size(u))
    union_k = F.slice(u, 1, m)
    est_union = F.when(
        F.size(u) < kk, F.size(u).cast("double")
    ).otherwise(
        F.lit(float(kk - 1)) * F.lit(float(1 << 31))
        / F.element_at(u, kk)
    )
    inter_in_k = F.size(
        F.array_intersect(
            F.array_intersect(union_k, F.col("_ka")), F.col("_kb")
        )
    )
    jacc = inter_in_k.cast("double") / m
    return pairs.select(
        "type_a",
        "type_b",
        est_union.alias("est_union"),
        jacc.alias("jaccard_est"),
        (jacc * est_union).alias("est_intersection"),
    )


def hll_portable(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 8,
    bucket_expr=None,
) -> DataFrame:
    """HyperLogLog with every register an exact integer function of
    the input — the engine-portable twin of :func:`approx_distinct`
    (Flajolet et al. 2007): bucket index = low ``p`` bits of the
    portable md5-low31 hash, ρ = leading-zero count of the remaining
    ``31-p`` bits + 1, register = max ρ per bucket. All three are
    integer-exact and SQL-expressible (bit length via the binary
    string, no float log2 whose ulp could flip a power-of-two edge),
    so an external engine recomputes the registers AND the
    bias-corrected estimate bit-for-bit — closing the one sketch
    mechanism (sketches.py:26's DataSketches registers are
    implementation-defined) that external hash-checking couldn't
    reach. Same mergeability story as the production path: pass
    ``bucket_expr`` (e.g. a day) to sketch per (group, day) first and
    union per group — register union is max, exact, so the two-level
    result is identical to direct.

    Estimator: with m = 2^p registers M_j, scale = 2^(31-p+1) so
    every 2^-M_j term is the integer 2^(scale_bits - M_j);
    S = Σ_j 2^(scale_bits - M_j) is an exact BIGINT (absent buckets
    contribute M_j = 0). raw = α_m · m² · 2^scale_bits / S; below
    2.5 m with V > 0 empty registers, linear counting m·ln(m/V).
    α_m is written as the same literal expression ``0.7213 /
    (1 + 1.079/m)`` on both sides so the doubles agree bit-for-bit;
    the one transcendental (ln) sits behind a round(·, 4) with
    ~1e-13 relative ulp slack — not a correctness dial, a
    representation one.

    Output one row per group: ``n_zero_registers`` (V),
    ``register_sum_scaled`` (S — pins the ρ multiset),
    ``register_checksum`` (Σ (bucket+1)·M_j — pins ρ positions) and
    ``est_distinct``. Scale shape: two grouped MAX aggregations
    (map-side combinable) over value-cardinality rows, then one
    m-row-per-group aggregate — no windows, no collects.
    """
    pp = int(p)
    m = 1 << pp
    rho_bits = 31 - pp  # hash bits left for the leading-zero count
    scale_bits = rho_bits + 1  # max rho = rho_bits + 1 -> min term 2^0
    from ceres_spark.operators.dedup import _md5_low31

    hv = _md5_low31(F.col(value_col).cast("string"))
    w = (F.col("_hv") / F.lit(m)).cast("bigint")  # high rho_bits bits
    # bit length of w via the decimal->binary string (exact); w == 0
    # means all rho_bits bits are zero -> rho = rho_bits + 1
    bitlen = F.length(F.conv(F.col("_w").cast("string"), 10, 2))
    rho = F.when(F.col("_w") == 0, F.lit(rho_bits + 1)).otherwise(
        F.lit(rho_bits + 1) - bitlen
    )
    hashed = (
        df.filter(F.col(value_col).isNotNull())  # COUNT DISTINCT semantics
        .select(
            F.col(group_col),
            *([bucket_expr.alias("_bk")] if bucket_expr is not None else []),
            hv.alias("_hv"),
        )
        .withColumn("_bucket", F.col("_hv") % F.lit(m))
        .withColumn("_w", w)
        .withColumn("_rho", rho.cast("int"))
    )
    if bucket_expr is not None:  # per-(group, day) sketches ...
        daily = hashed.groupBy(group_col, "_bk", "_bucket").agg(
            F.max("_rho").alias("_rho")
        )
        regs = daily.groupBy(group_col, "_bucket").agg(  # ... unioned
            F.max("_rho").alias("_reg")
        )
    else:
        regs = hashed.groupBy(group_col, "_bucket").agg(
            F.max("_rho").alias("_reg")
        )
    per_group = regs.groupBy(group_col).agg(
        F.count("*").alias("_present"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(scale_bits) - F.col("_reg")).cast(
                "bigint"
            )
        ).alias("_s_present"),
        F.sum((F.col("_bucket") + 1) * F.col("_reg")).alias(
            "register_checksum"
        ),
    )
    v_zero = F.lit(m) - F.col("_present")
    s = (
        F.col("_s_present") + v_zero * F.lit(1 << scale_bits)
    ).cast("bigint")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = (
        alpha
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << scale_bits))
        / F.col("register_sum_scaled")
    )
    # linear counting: V ≤ m means the whole ln() domain is
    # enumerable, so the cross-engine ulp hazard is CHECKED in Python
    # (lc_engine_log_safe) rather than merely avoided — when every
    # possible rounding is boundary-clear (every practical m), the
    # cheap in-engine log stays in the plan and the oracle's
    # Python-evaluated literal table is an independent path the hash
    # check proves agreement with; only an adversarial m falls back
    # to carrying the table as one array-typed literal.
    if lc_engine_log_safe(m):
        lc = F.round(
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("n_zero_registers")),
            4,
        )
    else:
        lc = F.element_at(
            F.lit(hll_lc_table(m)),
            F.col("n_zero_registers").cast("int"),
        )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero_registers") > 0), lc
    ).otherwise(F.round(raw, 4))
    return (
        per_group.withColumn("n_zero_registers", v_zero.cast("bigint"))
        .withColumn("register_sum_scaled", s)
        .select(
            group_col,
            "n_zero_registers",
            "register_sum_scaled",
            "register_checksum",
            est.alias("est_distinct"),
        )
    )
