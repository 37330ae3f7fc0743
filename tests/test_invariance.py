"""Partitioning-independence: the determinism contract the oracle
gate relies on, checked directly. Every oracle-paired result must be
bit-identical no matter how the cluster partitions the work — that is
what makes a 1000-executor run reproduce local[32], and what makes
decimal accumulation + string-routed casts + order-pinned kernels
worth their cost. Representative queries (decimal sums, windowed
stats, exact-integer scores, vectorized numpy kernels) run under two
different shuffle-partition settings and once with the input
pre-repartitioned; all three result sets must match exactly.
"""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# float/decimal-heavy or kernel-backed queries — the ones where
# partitioning COULD leak into results if the contract were broken
QUERIES = [
    "tpch_q1",            # decimal money sums + decimal averages
    "tpch_q9",            # partsupp profit (derived doubles)
    "anomaly_zscore",     # string-routed Σx² (the sf0.1 regression)
    "moving_stddev",      # windowed string-routed sums
    "series_linreg",      # narrow-decimal closed form
    "series_functions",   # windowed decimal MA/integral
    "span_dup_ratio",     # hashed span counts + double ratio
    "token_rarity",       # exact-integer ppm
    "jaccard_pairs",      # vectorized incidence matmul
    "embedding_neardup",  # order-pinned numpy cosine
    "topk_cosine_q8",     # exact-integer int8 dots
    "quantize_lww",       # LWW max_by
    "corpus_filter_gate", # composite double thresholds
    "weighted_sample",    # md5-uniform vs diversity weight
    "dedup_materialize",  # components + quality window keeper
    "frequent_items",     # Space-Saving in the exact regime
    "series_transform",   # per-ts combinators
    "order_analytics",    # distributed exact ntile (rank offsets
                          # must not depend on the range split count)
    "slice_roundtrip",    # distributed slice export→import identity
    "bigram_lm",          # exact-integer bigram ppm
    "quality_classifier", # integer micro-unit margin
    "token_budget_fill",  # margin-ordered BIGINT running sums
    "vocab_drift",        # full-outer ppm rates + top-n total order
    "bpe_train",          # argmax-dependent merge learning
    "semantic_dedup",     # per-cluster GEMM + union-find
    "nation_pagerank",    # decimal-accumulated rank fixpoint
    "embedding_decontamination",  # fold-cosine threshold counts
    "hash_embed",         # md5-integer signed hashing
    "cusum_changepoints", # windowed decimal running sums
    "chunk_retrieval",    # chunk → hash-embed → fold-cosine top-k
    "corpus_card",        # rollup of exact-integer accumulators
    "bpe_segment",        # train + map-only merge application
]


def _rows(df):
    # repr-keyed sort: total order even with NULL grouping keys
    # (rollup rows carry None where Python's < would raise)
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partitioning(spark, name):
    fn = entrymod.queries()[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _rows(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        b = _rows(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: results changed with shuffle partitioning"
