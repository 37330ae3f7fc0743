"""Distributed BPE merge learning must be BIT-IDENTICAL to the
public Sennrich et al. 2016 algorithm (subword-nmt's learn_bpe):
same merge table (order, pairs, weighted counts) on arbitrary
corpora, same greedy left-to-right non-overlapping application.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ceres_spark.operators.bpe as bpe

# ---------------------------------------------------- pure-python ref


def ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_bpe(word_weights, n_merges):
    """learn_bpe: weighted vocabulary, most-frequent adjacent pair,
    deterministic tie-break (count desc, then lexicographic pair),
    stop below frequency 2."""
    vocab = {
        tuple(list(w) + [bpe.EOW]): c for w, c in word_weights.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, left + right, cnt))
        vocab = {
            ref_apply(s, left, right): c for s, c in vocab.items()
        }
    return merges


def ref_segment(text, merges):
    toks = []
    for w in text.lower().split(" "):
        if not w:
            continue
        syms = tuple(list(w) + [bpe.EOW])
        for _, left, right, _, _ in merges:
            syms = ref_apply(syms, left, right)
        toks.extend(syms)
    return toks


# ------------------------------------------------------------- tests


def spark_word_weights(docs_rows):
    ww = Counter()
    for _, text in docs_rows:
        for w in text.lower().split(" "):
            if w:
                ww[w] += 1
    return ww


def test_sennrich_example(spark):
    # the canonical low/lower/newest/widest corpus from the paper
    rows = [
        (0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6)),
        (1, " ".join(["widest"] * 3)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=6).collect()
    ]
    assert got == ref_bpe(spark_word_weights(rows), 6)
    # the first learned merges are the famous es / est / est</w>
    assert [g[3] for g in got[:3]] == ["es", "est", "est</w>"]


corpus_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=corpus_words, n_merges=st.integers(1, 10))
def test_bpe_matches_reference_on_random_corpora(spark, words, n_merges):
    rows = [(i, " ".join(words[i::3])) for i in range(min(3, len(words)))]
    rows = [(i, t) for i, t in rows if t]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=n_merges).collect()
    ]
    assert got == ref_bpe(spark_word_weights(rows), n_merges)


def test_segment_matches_reference(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cats sat on the mats"),
        (2, "a cat a mat a hat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = ref_bpe(spark_word_weights(rows), 8)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_distinct_bpe_tokens"])
        for r in bpe.bpe_segment(
            docs, [(m[1], m[2]) for m in merges]
        ).collect()
    }
    for i, text in rows:
        toks = ref_segment(text, merges)
        assert got[i] == (len(toks), len(set(toks)))


def test_single_doc_stops_below_frequency_two(spark):
    # every pair unique → zero merges learned, empty result
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    assert bpe.bpe_train(docs, n_merges=4).count() == 0


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=corpus_words, n_merges=st.integers(1, 6))
def test_distributed_path_bit_equal_to_local(spark, words, n_merges):
    # vocab_cap=0 forces the per-round distributed loop; the two
    # regimes must learn the identical merge table
    rows = [(0, " ".join(words))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    local = bpe.bpe_train(docs, n_merges=n_merges).collect()
    dist = bpe.bpe_train(docs, n_merges=n_merges, vocab_cap=0).collect()
    assert [tuple(r) for r in dist] == [tuple(r) for r in local]
    assert [tuple(r)[:4] for r in local] == [
        m[:3] + (m[1] + m[2],) for m in ref_bpe(spark_word_weights(rows), n_merges)
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=0, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"])
    ),
)
def test_sql_merge_fold_equals_reference(spark, syms, pair):
    # the pure-SQL aggregate() fold must implement greedy
    # left-to-right non-overlapping replace EXACTLY, incl. adjacent
    # repeats ("aaa" under (a,a) -> [aa, a]) and empty arrays
    left, right = pair
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(bpe._merge_expr(left, right).alias("out")).collect()[0][
        "out"
    ]
    assert tuple(got) == ref_apply(tuple(syms), left, right)
