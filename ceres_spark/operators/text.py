"""Text analysis for LLM-data pipelines (north-star §2.2).

Not in the ceres reference (which has no string functions at all —
SURVEY.md §2 "operators ceres does NOT have"); mandated by the
driver's north star: language-ID, quality scoring, token counting,
document fingerprinting over the ``documents`` table.

Everything here is built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen-friendly, zero Python in the hot path. At 100 TB
these are embarrassingly parallel per-row maps: no shuffle at all
until an aggregation is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: deterministic marker tokens per language for the n-gram/stopword
#: heuristic. Real deployments plug in real stopword tables; the
#: driver fixture's vocabulary is synthetic engine-speak, so accuracy
#: against the fixture's `lang` column is not meaningful — the
#: operator's semantics (deterministic scoring + argmax) are.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "die", "nicht", "ist"],
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.col(col)), " ")


def text_stats(docs: DataFrame) -> DataFrame:
    """Token counting + lexical stats per document."""
    t = tokens()
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        (F.col("n_chars") / F.size(t)).alias("avg_token_len"),
        (F.size(F.array_distinct(t)) / F.size(t)).alias("lexical_diversity"),
    )


#: GPT-2-style pre-tokenizer regex (contraction suffixes, letter runs,
#: digit runs, punctuation runs, whitespace). Deliberately NO
#: lookahead — Java regex (Spark) and RE2 (DuckDB/Go) then count the
#: same non-overlapping matches, so the count is engine-portable.
BPE_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
)


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting both ways the north star asks for: whitespace
    words and a BPE-ish pre-tokenizer match count (the cheap
    LLM-cost/length estimator — counts subword UNITS, not bytes,
    without shipping a tokenizer model to executors)."""
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_SPLIT_PATTERN)).alias(
            "n_bpe_tokens"
        ),
    )


def quality_score(docs: DataFrame, min_tokens: int = 20) -> DataFrame:
    """Heuristic quality scoring: length gate + lexical diversity +
    long-token share. One deterministic double per doc in [0, 1]."""
    t = tokens()
    n = F.size(t)
    distinct_ratio = F.size(F.array_distinct(t)) / n
    long_ratio = F.size(F.filter(t, lambda x: F.length(x) >= 4)) / n
    length_gate = F.when(n >= min_tokens, F.lit(1.0)).otherwise(
        n / F.lit(float(min_tokens))
    )
    return docs.select(
        "doc_id",
        "lang",
        (length_gate * (distinct_ratio + long_ratio) / F.lit(2.0)).alias(
            "quality"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-token language ID: score = |distinct tokens ∩ markers|
    per language; predict the max (ties broken alphabetically, the
    deterministic choice); no markers hit → 'unknown'."""
    dt = F.array_distinct(tokens())
    scores = {
        lang: F.size(F.array_intersect(dt, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in sorted(LANG_MARKERS.items())
    }
    best = None
    for lang, s in scores.items():  # alphabetical → first max wins
        best = s if best is None else F.greatest(best, s)
    pred = F.lit("unknown")
    for lang in reversed(sorted(LANG_MARKERS)):  # build CASE back-to-front
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    out = docs.select("doc_id", F.col("lang").alias("lang_actual"),
                      pred.alias("lang_pred"))
    return out


def enrich(docs: DataFrame) -> DataFrame:
    """All per-document derived columns in ONE projection (single
    scan, zero joins): quality, fingerprint, token count. The
    composition primitive for pipeline queries — deriving each via
    its own DataFrame and self-joining would scan the corpus once per
    feature."""
    t = tokens()
    n = F.size(t)
    distinct_ratio = F.size(F.array_distinct(t)) / n
    long_ratio = F.size(F.filter(t, lambda x: F.length(x) >= 4)) / n
    gate = F.when(n >= 20, F.lit(1.0)).otherwise(n / F.lit(20.0))
    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    return docs.select(
        "doc_id",
        "lang",
        (gate * (distinct_ratio + long_ratio) / F.lit(2.0)).alias("quality"),
        F.md5(norm).alias("fingerprint"),
        n.alias("n_tokens"),
    )


#: PII patterns, deliberately restricted to syntax BOTH Java regex
#: (Spark) and RE2 (DuckDB oracle) interpret identically: no
#: lookaround, no backreferences, ASCII classes only. Replacement is
#: applied alphabetically (email, ipv4, phone); the patterns are
#: shape-disjoint so order can't change the result.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d{3}[- .]\d{3}[- .]\d{4}",
}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the compliance pass every training-data
    pipeline runs before anything else. Counts each PII class and
    replaces matches with ``<class>`` placeholders; returns the md5 of
    the scrubbed text (join-key-sized proof of the exact output,
    instead of shipping megabytes of scrubbed text back).

    Pure per-row projection: JVM regex inside whole-stage codegen, no
    Python, no shuffle — at 100 TB this runs at scan speed.
    """
    col = F.col(text_col)
    counts = [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat in sorted(PII_PATTERNS.items())
    ]
    scrubbed = col
    for name, pat in sorted(PII_PATTERNS.items()):
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    return docs.select(
        "doc_id", *counts, F.md5(scrubbed).alias("scrubbed_md5")
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition quality signals (the Gopher/C4-style filters):
    top-token share (max unigram frequency / token count) and
    duplicate-bigram fraction. High values flag boilerplate and
    degenerate repetition.

    The bigram fraction is map-only (array ops per row). The unigram
    mode needs a per-(doc, token) count — explode + two-level
    aggregation with map-side partial combine. The two branches are
    kept SEPARATE and joined on doc_id: Catalyst has no let-binding,
    so a computed HOF column carried through the explode would be
    re-evaluated once per exploded token (~n_tokens× per doc — a
    measured 60× slowdown; see memory: catalyst-no-let-binding).
    n_tokens is recovered as Σ counts, so the explode branch carries
    nothing but (doc_id, tok).
    """
    t = tokens()
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dup_bigram_frac = F.when(
        n >= 2,
        F.lit(1.0) - F.size(F.array_distinct(bigrams)) / F.size(bigrams),
    )
    # (spread() was tried here and reverted: the tokenize/bigram work
    # is light next to the exchange it adds, and partial aggregation
    # already collapses the explode before any shuffle — §2.3 says
    # don't add an exchange in front of an aggregate that doesn't
    # need it; measured 0.26 s → 0.82 s at sf0.1)
    per_doc = docs.select(
        "doc_id", dup_bigram_frac.alias("dup_bigram_frac")
    )
    uni = (
        docs.select("doc_id", F.explode(t).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.max("_c").alias("_max_c"),
            F.sum("_c").cast("long").alias("n_tokens"),
        )
    )
    return uni.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.col("_max_c") / F.col("n_tokens")).alias("top_token_share"),
        "dup_bigram_frac",
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text. (The reference-free analogue of a rolling hash: stable,
    portable across engines, join-key-ready for exact dedup.)"""
    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def text_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Boilerplate-stripping text normalization — the first pass every
    web-crawl corpus runs before tokenization: drop HTML/XML tags,
    unescape the five XML entities, lowercase, strip non-word
    punctuation (keeping intra-word apostrophes and hyphens), and
    collapse runs of whitespace. One shuffle-free codegen projection.

    Every regex is restricted to syntax Java regex (Spark) and RE2
    (the DuckDB oracle) interpret identically — no lookaround, no
    backreferences (the pii_scrub portability contract) — so the
    normalized text is engine-exact and hash-checks.

    Output: ``doc_id, norm_text, n_norm_tokens, n_norm_chars``.
    """
    t = F.col(text_col)
    # 1. tags: <...> including attributes; non-greedy via [^>]*
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    # 2. the five XML entities (amp LAST so &amp;lt; stays literal)
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, rep)
    t = F.lower(t)
    # 3. punctuation → space, keeping letters/digits/space/'/-
    t = F.regexp_replace(t, r"[^a-z0-9\s'-]", " ")
    # 4. whitespace collapse + trim
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    out = docs.select("doc_id", t.alias("norm_text"))
    return out.select(
        "doc_id",
        "norm_text",
        F.when(F.col("norm_text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("norm_text"), " ")))
        .cast("int")
        .alias("n_norm_tokens"),
        F.length("norm_text").cast("int").alias("n_norm_chars"),
    )
