"""Corpus-construction operators for LLM training-data pipelines
(north-star §2.2 — not in the ceres reference, which has no text or
relational surface at all; SURVEY.md §2 "operators ceres does NOT
have").

Three pipeline stages every large-scale training-data build needs:

- ``stratified_split``: deterministic content-hash train/val/test
  assignment. Hashing the *normalized content* (not the doc_id) means
  the assignment survives re-crawls, re-sharding, and id reassignment,
  and exact duplicates always land in the same split — no eval
  leakage from dup pairs straddling the boundary.
- ``vocab_top_n``: corpus vocabulary with occurrence + document
  frequencies (the input to tokenizer training).
- ``tfidf_top_terms``: per-document characteristic terms. The score
  is ``tf * N / df`` in exact BIGINT ppm arithmetic rather than a
  float ``log`` idf — order-independent, partitioning-independent,
  and bit-identical on any engine (a float log would be libm- and
  summation-order-dependent; see docs on oracle determinism).

Scale notes (100 TB): the split is a pure per-row map — no shuffle.
vocab/tf-idf shuffle on token resp. (doc_id, token); both benefit
from partial aggregation (map-side combine) so the exchange carries
one row per distinct key per task, not one per occurrence. The df
side of the tf-idf join is a vocabulary — small relative to the
corpus — and is broadcast, so the tf table shuffles only once for the
final per-document window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators.text import tokens

#: Cardinality bound for :func:`temperature_mix`'s global remainder
#: ranking — apportionment is a total order over sources, so past
#: this many sources the plan raises in-plan instead of silently
#: single-reducing (VERDICT r5).
MAX_MIX_SOURCES = 100_000

#: hex-first-char boundaries: 0-b = 12/16 = 75% train, c-d = 12.5%
#: val, e-f = 12.5% test. md5 is uniform on the first nibble.
_TRAIN_MAX = "b"
_VAL_MAX = "d"


def content_bucket(col: str = "text") -> F.Column:
    """First hex nibble of md5 over space-normalized lowercase text —
    the same normalization as text.fingerprint, so exact dups share a
    bucket by construction."""
    normalized = F.regexp_replace(F.lower(F.col(col)), " +", " ")
    return F.substring(F.md5(normalized), 1, 1)


def stratified_split(docs: DataFrame) -> DataFrame:
    """Assign each document to train/val/test by content hash.

    Deterministic, idempotent, and stable under re-ingestion; the
    per-language stratification is inherent (the hash is independent
    of ``lang``, so each language subdivides ~75/12.5/12.5 too).
    """
    b = content_bucket()
    return docs.select(
        "doc_id",
        "lang",
        F.when(b <= _TRAIN_MAX, F.lit("train"))
        .when(b <= _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def vocab_top_n(docs: DataFrame, n: int = 100) -> DataFrame:
    """Top-``n`` corpus vocabulary by occurrence count (ties broken
    by token text — fully deterministic).

    The explode is map-side; partial aggregation collapses each
    task's occurrences before the single token-keyed shuffle. The
    final global top-n sorts only the distinct vocabulary (bounded,
    tiny next to the corpus).
    """
    tok = docs.select(
        "doc_id", F.explode(tokens()).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n_occurrences"), "token").limit(n)


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by exact-integer
    tf-idf: ``score_ppm = (tf * 1_000_000 * N) div df``.

    Plan: one (doc_id, token) aggregation for tf; df + N derived from
    it (vocab-sized, broadcast back); per-document window for the
    top-k. The fact-sized tf table is shuffled once for tf and once
    for the doc_id window — the df join adds no exchange.
    """
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        # eager localCheckpoint (optimization r12, guide §5.3): tf is
        # consumed by the df branch AND the scored branch, and
        # Catalyst clones the tokenize → explode → aggregate upstream
        # per consumer — the full tokenize ran twice. The TF matrix
        # is the materialization real tf-idf pipelines stage anyway
        # (far smaller than the raw text it came from).
        .localCheckpoint(eager=True)
    )
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score_ppm", F.expr("tf * 1000000L * n_docs div df")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_ppm"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "score_ppm", "rank")
    )


def weighted_sample(docs: DataFrame) -> DataFrame:
    """Quality-weighted importance sampling (the DSIR-shaped step
    after hard filtering): each document is kept with probability
    equal to its lexical diversity (distinct/total tokens ∈ [0,1] —
    a deterministic, engine-portable quality proxy), decided by a
    content-independent uniform draw derived from md5(doc_id).

    Both the weight and the uniform are exact deterministic
    functions, so the kept set is reproducible across runs, engines,
    and partitionings — re-sampling churn-free like mixture_sample,
    but per-document rather than per-source. Scan-speed: one
    projection + filter, no shuffle, no state.

    The uniform is the first 15 hex digits of md5(doc_id) scaled by
    16^-15 — integer-exact in a BIGINT, one final division, identical
    in any engine with md5 + hex parsing.
    """
    t = tokens()
    p = F.size(F.array_distinct(t)) / F.size(t)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
            16, 10,
        ).cast("bigint")
        / F.lit(float(16 ** 15))
    )
    return (
        docs.select(
            "doc_id",
            "source",
            p.alias("keep_prob"),
            u.alias("draw"),
        )
        .filter(F.col("draw") < F.col("keep_prob"))
    )


def corpus_filter_gate(
    docs: DataFrame,
    min_tokens: int = 20,
    max_dup_bigram: float = 0.06,
    max_span_dup: float = 0.5,
) -> DataFrame:
    """The C4/Gopher-style composite quality gate as ONE query: the
    length, repetition, and exact-substring signals joined per
    document into named flags and a final keep verdict — the shape a
    production filter job takes (filter reasons preserved for audit,
    not collapsed into a bare boolean).

    Composition: repetition_stats (explode + map-only branches) ⋈
    span_dup_ratio (span-count aggregate) on doc_id — both
    doc-cardinality, AQE-coalesced. All signals are deterministic
    doubles (exact divisions of counts), so threshold comparisons cut
    identically in any engine — the gate is oracle-checkable
    end-to-end.
    """
    from ceres_spark.operators.dedup import span_dup_ratio
    from ceres_spark.operators.text import repetition_stats

    rep = repetition_stats(docs)
    spans = span_dup_ratio(docs).select("doc_id", "dup_ratio")
    j = rep.join(spans, "doc_id")
    flag_short = F.col("n_tokens") < int(min_tokens)
    flag_repetitive = F.coalesce(
        F.col("dup_bigram_frac") > float(max_dup_bigram), F.lit(False)
    )
    flag_boilerplate = F.col("dup_ratio") > float(max_span_dup)
    return j.select(
        "doc_id",
        "n_tokens",
        flag_short.alias("flag_short"),
        flag_repetitive.alias("flag_repetitive"),
        flag_boilerplate.alias("flag_boilerplate"),
        (~(flag_short | flag_repetitive | flag_boilerplate)).alias(
            "keep"
        ),
    )


def cap_per_source(docs: DataFrame, k: int = 25) -> DataFrame:
    """Deterministic per-domain cap (domain balancing): keep at most
    ``k`` documents per source, chosen by a content-independent
    pseudo-random order (md5 of doc_id) so the kept set is stable
    across runs and engines and unbiased by ingestion order.

    Exact-k requires ranking within each source: one shuffle on
    source + per-group sort. A single pathologically hot source
    cannot be split across tasks by a window — for that skew regime
    use :func:`mixture_sample` (hash-threshold, scan-speed,
    approximate-k) instead; this is the exact-k path for the normal
    many-domains shape.
    """
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(k))
        .select("doc_id", "source", "sample_rank")
    )


def token_rarity(docs: DataFrame) -> DataFrame:
    """Per-document token-rarity profile from corpus-level document
    frequencies — the unigram-LM quality proxy: documents whose
    tokens are mostly hapax/rare are gibberish-or-OCR candidates;
    documents of only ultra-common tokens are boilerplate candidates.

    All scores are exact integers (``df_ppm = df * 1e6 div N``, the
    tf-idf trick at corpus.py:tfidf_top_terms) so the result is
    engine- and partitioning-independent: min/sum of BIGINTs, one
    final double division for the mean.

    Plan: one distinct-token explode, one token-keyed df aggregate,
    join back on the same key (no extra exchange under AQE), one
    doc-keyed aggregate. Linear, no windows.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
    )
    dft = tok.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    return (
        tok.join(dft, "token")
        .join(F.broadcast(n))
        .withColumn("_df_ppm", F.expr("df * 1000000L div n_docs"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_tokens"),
            F.min("_df_ppm").alias("min_df_ppm"),
            F.sum("_df_ppm").alias("sum_df_ppm"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("n_hapax"),
        )
        .withColumn(
            "mean_df_ppm",
            F.col("sum_df_ppm") / F.col("n_distinct_tokens"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic per-source downsampling toward a target mixture:
    a doc survives when the first 4 hex digits of md5('source#doc_id')
    sort below its source's weight threshold. Hex-lexical compare is
    engine-portable (md5 hex is identical everywhere; no hex→int
    conversion, which DuckDB 1.0 lacks — same trick as
    :func:`stratified_split`).

    Keying the hash on (source, doc_id) — not content — makes the
    sample independent of text edits and uniform within a source;
    determinism means re-running ingestion keeps the same docs
    (append-only pipelines can't tolerate resampling churn).

    Returns per-source ``n_total, n_kept, kept_frac`` — the mixture
    audit a pipeline logs; the kept rows themselves are
    ``docs.filter(mixture_keep(...))`` at scale (scan-speed, no
    shuffle).
    """
    def thr(w: float) -> str:
        # weight ≥ 1.0 → 'g': sorts after every 4-hex-digit string, so
        # the keep-all threshold stays a valid LEXICAL compare (a
        # 5-digit '10000' would sort BEFORE most hashes)
        t = max(0, int(w * 65536))
        return "g" if t >= 65536 else format(t, "04x")

    b = F.substring(
        F.md5(F.concat(F.col("source"), F.lit("#"), F.col("doc_id").cast("string"))),
        1,
        4,
    )
    expr = None
    for src, w in sorted(weights.items()):
        c = F.when(F.col("source") == src, b < F.lit(thr(w)))
        expr = c if expr is None else expr.when(
            F.col("source") == src, b < F.lit(thr(w))
        )
    kept = (
        expr.otherwise(b < F.lit(thr(default_weight)))
        if expr is not None
        else (b < F.lit(thr(default_weight)))
    )
    return (
        docs.select("source", kept.cast("int").alias("_k"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("_k").cast("long").alias("n_kept"),
        )
        .withColumn("kept_frac", F.col("n_kept") / F.col("n_total"))
    )


def bigram_lm_score(docs: DataFrame, rare_ppm: int = 1000) -> DataFrame:
    """Per-document fluency profile under a corpus-trained bigram
    language model — the classic LM-based quality filter (CCNet /
    Gopher shape): documents whose token transitions are improbable
    under the corpus's own bigram statistics are gibberish, OCR
    noise, or boilerplate-stitching candidates.

    The model is maximum-likelihood ``P(w2|w1) = c(w1,w2)/c(w1·)``
    held in exact BIGINT ppm (``c2 * 1e6 div c1`` — the tf-idf trick
    at :func:`tfidf_top_terms`), so every reported statistic is an
    integer min/sum over BIGINTs: order-independent, partitioning-
    independent, engine-exact. No float ``log`` ever enters (a real
    pipeline would threshold on these ppm stats exactly the way it
    would on log-perplexity — the ranking is monotone-equivalent
    for the min/rare-count signals).

    Plan (all linear, no windows): one explode into per-occurrence
    bigrams, one (w1,w2)-keyed count with map-side combine, c(w1·)
    derived from the *model* table (not a second corpus pass), join
    model back to occurrences on the same (w1,w2) key, one doc-keyed
    aggregate. At 100 TB the model table is vocabulary², far smaller
    than the corpus, and partial aggregation means the exchanges
    carry distinct keys per task, not occurrences. Documents with
    fewer than two tokens have no transitions and are excluded (the
    oracle applies the same rule).
    """
    big = (
        docs.withColumn("_t", tokens())
        .filter(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.expr("slice(_t, 1, size(_t) - 1)"),
                    F.expr("slice(_t, 2, size(_t) - 1)"),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = c2.join(c1, "w1").withColumn(
        "ppm", F.expr("c2 * 1000000L div c1")
    )
    return (
        big.join(model.select("w1", "w2", "ppm"), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.min("ppm").alias("min_ppm"),
            F.sum("ppm").alias("sum_ppm"),
            F.sum((F.col("ppm") < int(rare_ppm)).cast("bigint")).alias(
                "n_rare"
            ),
        )
        .withColumn("mean_ppm", F.col("sum_ppm") / F.col("n_bigrams"))
    )


#: integer micro-unit weights for :func:`quality_classifier` — a
#: trained-elsewhere linear model shipped as constants (the fasttext
#: -style quality-filter deployment shape: training is offline,
#: inference is a scan). Units: margin accumulates in "micro" space
#: so every term is an exact BIGINT product of a BIGINT feature.
QUALITY_WEIGHTS = {
    "bias": -800_000,
    "n_tokens": 5_000,
    "lexdiv_ppm": 1,
    "stop_ppm": -2,
}

#: the feature's stopword inventory (tiny on purpose — the FEATURE is
#: the ratio, the inventory is a model artifact like the weights)
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")


def quality_classifier(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Model-based quality filtering — linear-classifier inference
    over engineered features, the CCNet/fasttext deployment shape
    done Spark-first: the model is a broadcast-constant weight
    vector, inference is ONE projection over the scan (no shuffle,
    no UDF), and the decision margin is exact BIGINT micro-units so
    the verdict is bit-identical on any engine or partitioning (same
    integer-ppm discipline as :func:`token_rarity`).

    Features per document: token count, lexical diversity ppm,
    stopword-ratio ppm. Returns features + ``margin_micro`` +
    ``keep`` (margin > 0). A real pipeline retrains the weights and
    redeploys them as constants; sigmoid-calibrated probabilities are
    monotone in the margin, so thresholding the margin IS
    thresholding the probability.
    """
    w = dict(QUALITY_WEIGHTS)
    if weights:
        w.update(weights)
    t = tokens()
    feat = docs.select(
        "doc_id",
        *keep_cols,
        F.size(t).cast("bigint").alias("n_tokens"),
        F.expr(
            "size(array_distinct(split(lower(text), ' '))) * 1000000L"
            " div size(split(lower(text), ' '))"
        ).alias("lexdiv_ppm"),
        F.expr(
            "size(filter(split(lower(text), ' '), x -> x in "
            + "("
            + ", ".join("'" + s + "'" for s in QUALITY_STOPWORDS)
            + "))) * 1000000L div size(split(lower(text), ' '))"
        ).alias("stop_ppm"),
    )
    return feat.withColumn(
        "margin_micro",
        F.lit(int(w["bias"])).cast("bigint")
        + F.lit(int(w["n_tokens"])).cast("bigint") * F.col("n_tokens")
        + F.lit(int(w["lexdiv_ppm"])).cast("bigint") * F.col("lexdiv_ppm")
        + F.lit(int(w["stop_ppm"])).cast("bigint") * F.col("stop_ppm"),
    ).withColumn("keep", F.col("margin_micro") > 0)


def token_budget_fill(
    docs: DataFrame,
    budget_per_source: int = 2000,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Quality-ordered budget fill — the step that turns a scored
    corpus into a training mix: within each source, take documents in
    descending classifier-margin order until the source's token
    budget is spent. Everything is exact integers (the BIGINT
    micro-unit margin from :func:`quality_classifier`, BIGINT token
    counts, BIGINT running sum with a doc_id tie-break), so the
    selected set is identical on any engine or partitioning.

    One window shuffle keyed by source; the running sum is a ROWS
    frame (no peers ambiguity). A pathologically hot source is the
    same skew regime as :func:`cap_per_source` — same escape hatch
    (hash-threshold pre-sampling), same rationale.

    Returns ``doc_id, source, n_tokens, margin_micro, cum_tokens,
    selected`` — ``selected`` marks docs whose cumulative token count
    (inclusive) fits the budget.
    """
    scored = quality_classifier(docs, weights=weights, keep_cols=("source",))
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("margin_micro"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.select("doc_id", "source", "n_tokens", "margin_micro")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "selected", F.col("cum_tokens") <= int(budget_per_source)
        )
    )


def vocab_drift(
    docs_a: DataFrame, docs_b: DataFrame, top_n: int = 50
) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots — the
    check a pipeline runs before mixing a new crawl into an existing
    training set: which tokens' document-frequency RATES moved most?

    Rates are exact BIGINT ppm (``df * 1e6 div n_docs`` per side), the
    drift score is their absolute difference — integers end to end, so
    the ranked report is engine- and partitioning-exact, and a token
    absent from one side scores its full rate on the other (full outer
    join, zero-coalesced).

    Plan: one distinct-token explode + token-keyed count per side
    (map-side combine), one vocabulary-sized full outer join, top-n
    via TakeOrderedAndProject. The corpora are each touched once; the
    join never exceeds vocabulary cardinality.
    """
    def side(docs: DataFrame, name: str) -> tuple[DataFrame, DataFrame]:
        tok = docs.select(
            "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
        )
        return (
            tok.groupBy("token").agg(F.count("*").alias(f"df_{name}")),
            docs.select(F.count("*").alias(f"n_{name}")),
        )

    dfa, na = side(docs_a, "a")
    dfb, nb = side(docs_b, "b")
    joined = (
        dfa.join(dfb, "token", "full_outer")
        .join(F.broadcast(na))
        .join(F.broadcast(nb))
        .select(
            "token",
            F.coalesce("df_a", F.lit(0)).alias("df_a"),
            F.coalesce("df_b", F.lit(0)).alias("df_b"),
            F.expr("coalesce(df_a, 0L) * 1000000L div n_a").alias(
                "rate_a_ppm"
            ),
            F.expr("coalesce(df_b, 0L) * 1000000L div n_b").alias(
                "rate_b_ppm"
            ),
        )
        .withColumn(
            "drift_ppm",
            F.abs(F.col("rate_a_ppm") - F.col("rate_b_ppm")),
        )
    )
    return joined.orderBy(F.desc("drift_ppm"), "token").limit(int(top_n))


def hash_embed(docs: DataFrame, dim: int = 32) -> DataFrame:
    """Deterministic text featurization — signed feature hashing
    (the "hashing trick", Weinberger et al. 2009, public ICML paper)
    into a ``dim``-wide integer vector: every token occurrence adds
    ±1 to the bucket ``md5(token) mod dim``, sign taken from the next
    hash bits. No trained model, no float: the embedding is an exact
    BIGINT vector, identical on any engine (md5 is portable and the
    arithmetic is integer), which is what makes this entry
    oracle-checkable — and it bridges the TEXT corpus onto the whole
    embedding stack (semantic dedup, ANN, decontamination) without
    shipping a model into the engine.

    Plan: one explode, one (doc, bucket)-keyed aggregate with
    map-side combine, one doc-keyed map assembly; the dense array is
    built JVM-side from the sparse map (no pivot, no second shuffle
    beyond the doc key the caller needs anyway).
    """
    tok = docs.select("doc_id", F.explode(tokens()).alias("token")).filter(
        F.col("token") != ""
    )
    # 15 hex digits < 2^60 fit a BIGINT exactly; all further
    # arithmetic stays integer (div, %) — a double division here
    # would lose exactness above 2^53
    hashed = tok.select(
        "doc_id",
        F.expr(
            "cast(conv(substring(md5(token), 1, 15), 16, 10) as bigint)"
        ).alias("_h"),
    )
    buckets = (
        hashed.select(
            "doc_id",
            (F.col("_h") % int(dim)).alias("bucket"),
            F.when(
                F.expr(f"_h div {int(dim)}") % 2 == 0, F.lit(1)
            ).otherwise(F.lit(-1)).alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("v"))
    )
    return (
        buckets.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("_m")
        )
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {int(dim) - 1}), "
                "i -> coalesce(element_at(_m, cast(i as bigint)), 0L))"
            ).alias("vec"),
        )
    )


def corpus_card(docs: DataFrame) -> DataFrame:
    """The dataset card every corpus release ships: per-(source,
    lang), per-source, and overall rollups of document count, token
    count, char count, classifier keep-rate and mean decision margin
    — one ROLLUP aggregate over the classifier projection (a single
    scan feeding a single exchange with map-side combine; Expand
    produces the three grouping levels, not three passes).

    Every accumulator is an exact BIGINT (token counts, margins in
    micro-units, keep flags as 0/1); the two ratios are final double
    divisions of those integers — engine- and partitioning-exact, so
    the whole card hash-checks against the oracle.
    """
    scored = quality_classifier(docs, keep_cols=("source", "lang"))
    base = scored.select(
        "source",
        "lang",
        "n_tokens",
        "margin_micro",
        F.col("keep").cast("bigint").alias("_k"),
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("margin_micro").alias("sum_margin_micro"),
            F.sum("_k").alias("n_kept"),
        )
        .withColumn("keep_rate", F.col("n_kept") / F.col("n_docs"))
        .withColumn(
            "mean_margin_micro",
            F.col("sum_margin_micro") / F.col("n_docs"),
        )
    )


def temperature_mix(
    docs: DataFrame,
    target_total_tokens: int = 100_000,
    temperature: str = "sqrt",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/multi-source
    sampling scheme of public LLM recipes (e.g. the τ-scaled sampling
    of XLM-R, Conneau et al. 2020): up-weight small sources relative
    to proportional sampling so the head sources don't drown the tail.

    ``temperature='sqrt'`` uses w_s = floor(sqrt(n_tokens_s)) — the
    α=0.5 point, computed ENTIRELY in engine-portable arithmetic
    (IEEE sqrt is correctly rounded on every engine, floor is exact,
    all else is BIGINT), which is what lets a mixing policy be
    hash-checked across engines; ``'proportional'`` is α=1. Token
    allocations use largest-remainder apportionment: exact integer
    quotas, leftovers to the largest remainders (ties by source), so
    Σ alloc == target exactly.

    Plan: one corpus scan → per-source aggregate (map-side combine,
    source-cardinality exchange) → window over the tiny source table.
    Output: ``source, n_tokens, weight, alloc_tokens, share_ppm``.
    """
    if temperature not in ("sqrt", "proportional"):
        raise ValueError("temperature must be 'sqrt' or 'proportional'")
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(tokens())).cast("bigint").alias("n_tokens")
    )
    w = (
        F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
        if temperature == "sqrt"
        else F.col("n_tokens")
    )
    t = int(target_total_tokens)
    weighted = per_src.select("source", "n_tokens", w.alias("weight"))
    tot = weighted.agg(F.sum("weight").alias("_W")).select(
        F.col("_W").cast("bigint").alias("_W")
    )
    j = weighted.join(F.broadcast(tot))  # 1-row bounds table
    base = j.select(
        "source",
        "n_tokens",
        "weight",
        F.col("_W"),
        # W == 0 (all-empty corpus) must fail LOUDLY: integer `div 0`
        # is a silent NULL in Spark and an error in other engines —
        # neither is an allocation
        F.when(
            F.col("_W") > 0, F.expr(f"({t}L * weight) div _W")
        ).otherwise(
            F.raise_error(F.lit(
                "temperature_mix: total weight is 0 (no tokens in any "
                "source) — nothing to apportion"
            ))
        ).alias("_floor_alloc"),
        F.expr(f"({t}L * weight) % _W").alias("_rem"),
    )
    # unpartitioned window — safe ONLY because it runs post-aggregate
    # on the source-cardinality table (sources ≪ 10^4, one row per
    # source). Never point this at a document-cardinality frame
    # (VERDICT r4): apportionment is global by definition, so a huge
    # key domain needs a different algorithm, not this window. The
    # bound is ENFORCED in-plan below (VERDICT r5): past
    # MAX_MIX_SOURCES ranked rows the query raises loudly instead of
    # silently single-reducing.
    wnd = Window.orderBy(F.desc("_rem"), "source")
    leftover = F.lit(t) - F.sum("_floor_alloc").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    rank_guarded = F.when(
        F.row_number().over(wnd) <= MAX_MIX_SOURCES,
        F.row_number().over(wnd),
    ).otherwise(
        F.raise_error(F.lit(
            f"temperature_mix: more than {MAX_MIX_SOURCES} sources — "
            "apportionment ranks globally (unpartitioned window); a "
            "key domain this large needs a different algorithm, not "
            "this operator"
        ))
    )
    return (
        base.withColumn("_rank", rank_guarded)
        .withColumn("_left", leftover)
        .select(
            "source",
            "n_tokens",
            "weight",
            (
                F.col("_floor_alloc")
                # weight > 0 is provably redundant (leftover = Σrem/W
                # < #{rem>0}, and rem>0 ⇒ weight>0, so the remainder
                # ranking never reaches a zero-weight source) but kept
                # EXPLICIT so a future reweighting can't silently hand
                # a leftover token to an empty source (ADVICE r4)
                + F.when(
                    (F.col("_rank") <= F.col("_left"))
                    & (F.col("weight") > 0),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("alloc_tokens"),
        )
        .withColumn(
            "share_ppm",
            F.expr(f"alloc_tokens * 1000000 div {t}L").cast("bigint"),
        )
    )


def source_similarity(docs: DataFrame) -> DataFrame:
    """Pairwise source-vocabulary overlap — the corpus-curation
    signal for "are these two crawl sources near-mirrors?" (feeds
    source-level dedup/mixing decisions before any doc-level pass).

    Per source the DISTINCT token vocabulary; per unordered source
    pair the common-token count and exact-integer Jaccard in ppm
    (``common·1e6 div union``). All arithmetic BIGINT — oracle-exact.

    Plan: one corpus scan → (source, token) distinct (map-side
    combinable) → vocabulary self-join on token (vocabulary-sized,
    NOT corpus-sized) → pair aggregate joined against broadcast
    per-source sizes. Output: ``src_a, src_b, n_common, size_a,
    size_b, jaccard_ppm``.
    """
    # ONE vocabulary evaluation (optimization r12, guide §5.3): four
    # consumers (sizes twice, both self-join sides) otherwise each
    # re-run the tokenize + explode + distinct; lazy localCheckpoint
    # shares the cached result without a serialized staging job.
    vocab = docs.select(
        "source", F.explode(tokens()).alias("token")
    ).filter(F.col("token") != "").distinct().localCheckpoint(eager=False)
    sizes = vocab.groupBy("source").agg(
        F.count("*").cast("bigint").alias("size")
    )
    a = vocab.select(F.col("source").alias("src_a"), "token")
    b = vocab.select(F.col("source").alias("src_b"), "token")
    common = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.withColumnsRenamed(
                {"source": "src_a", "size": "size_a"})),
            "src_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed(
                {"source": "src_b", "size": "size_b"})),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "size_a",
            "size_b",
            F.expr(
                "n_common * 1000000 div (size_a + size_b - n_common)"
            ).cast("bigint").alias("jaccard_ppm"),
        )
    )


def dataset_diff(docs_a: DataFrame, docs_b: DataFrame) -> DataFrame:
    """Snapshot diff for dataset versioning — what changed between two
    corpus releases, keyed by doc_id with content compared by hash
    (so the diff is O(1) per row regardless of text size, and two
    re-crawls of identical text are "unchanged" even if bytes moved):

    ``status ∈ {added, removed, changed, unchanged}`` per doc_id, with
    both sides' content hashes for audit. One full outer join on
    doc_id; at scale both sides are hash-partitioned on the same key
    so the join co-locates.
    """
    a = docs_a.select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("hash_a")
    )
    b = docs_b.select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("hash_b")
    )
    return a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("hash_a", F.lit("")).alias("hash_a"),
        F.coalesce("hash_b", F.lit("")).alias("hash_b"),
        # status from the RAW (nullable) join columns — the aliased
        # coalesces above are not in scope for sibling expressions
        F.when(F.col("hash_a").isNull(), F.lit("added"))
        .when(F.col("hash_b").isNull(), F.lit("removed"))
        .when(F.col("hash_a") != F.col("hash_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def length_percentile_gate(
    docs: DataFrame, lo_pct: float = 0.05, hi_pct: float = 0.95
) -> DataFrame:
    """Corpus-relative length filtering — drop the extreme tails of
    the token-length distribution (truncated/garbage shorts, scraped
    dumps longs) using EXACT discrete percentiles of the corpus
    itself, not fixed thresholds that rot as the corpus drifts.

    ``percentile_disc`` picks actual observed lengths (exact and
    engine-portable, unlike interpolated continuous percentiles), the
    two cutoffs broadcast as a 1-row bounds table, and the verdict is
    a scan-speed projection. Output: ``doc_id, n_tokens, lo_cut,
    hi_cut, keep``.
    """
    lengths = docs.select(
        "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    )
    cuts = lengths.agg(
        F.expr(
            f"percentile_disc({float(lo_pct)}) WITHIN GROUP "
            "(ORDER BY n_tokens)"
        ).cast("bigint").alias("lo_cut"),
        F.expr(
            f"percentile_disc({float(hi_pct)}) WITHIN GROUP "
            "(ORDER BY n_tokens)"
        ).cast("bigint").alias("hi_cut"),
    )
    return lengths.join(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "lo_cut",
        "hi_cut",
        (
            (F.col("n_tokens") >= F.col("lo_cut"))
            & (F.col("n_tokens") <= F.col("hi_cut"))
        ).alias("keep"),
    )


def split_leak_check(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Eval-leakage QA gate: how many near-duplicate pairs STRADDLE
    the train/val/test boundary? The content-hash split guarantees
    EXACT duplicates land together (same text → same hash → same
    split); this check measures what it cannot guarantee — NEAR-dups
    (hamming ≤ ``max_hamming`` simhash pairs) crossing splits, the
    residual leakage a release report must disclose.

    Output: one row per unordered split pair with the crossing-pair
    count — ``split_a, split_b, n_pairs`` (split_a <= split_b
    lexically; diagonal rows = within-split near-dups, off-diagonal =
    leakage). Composition of two independently oracle-checked stages
    (stratified_split, simhash pairing), itself oracle-checked END TO
    END.

    Plan (optimization r12, guide §2.4): the split label is a pure
    function of the text (stratified_split is a projection), so it is
    evaluated INSIDE the simhash fingerprint projection and carried
    through the band join (``carry=``) — the old shape re-scanned the
    corpus for the split table and joined it back TWICE at pair
    cardinality (Catalyst clones the scan per join side). One corpus
    pass total, zero join-backs; the carried label costs one byte-ish
    column per band row.
    """
    import ceres_spark.operators.dedup as dd

    b = content_bucket()
    split_expr = (
        F.when(b <= _TRAIN_MAX, F.lit("train"))
        .when(b <= _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    pairs = dd.simhash_pairs(
        docs, max_hamming=max_hamming, block_col=None,
        carry={"_sp": split_expr},
    )
    return (
        pairs.select(
            F.least("_sp_a", "_sp_b").alias("split_a"),
            F.greatest("_sp_a", "_sp_b").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )
