"""Corpus-construction pipeline ops (split / vocab / tf-idf) —
invariants the SQL oracle doesn't pin: split determinism and
dup-consistency, vocab ordering, tf-idf integer-score semantics.
"""

import pytest
from pyspark.sql import functions as F

import ceres_spark.operators.corpus as corp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_assigns_every_doc_once(spark, docs):
    out = corp.stratified_split(docs)
    assert out.count() == docs.count()
    assert set(r["split"] for r in out.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }


def test_split_is_deterministic_and_content_keyed(spark, docs):
    a = {r["doc_id"]: r["split"] for r in corp.stratified_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in corp.stratified_split(docs).collect()}
    assert a == b
    # exact duplicates land in the same split: duplicate a doc under a
    # new id and check it follows its twin
    twin = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = {
        r["doc_id"]: r["split"]
        for r in corp.stratified_split(docs.limit(5).union(twin)).collect()
    }
    for doc_id in list(out):
        if doc_id >= 1_000_000:
            assert out[doc_id] == out[doc_id - 1_000_000]


def test_split_fractions_roughly_75_12_12(spark, docs):
    counts = {
        r["split"]: r["n"]
        for r in corp.stratified_split(docs)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    # md5 nibble is uniform; at n=100 allow wide tolerance
    assert counts.get("train", 0) / total > 0.55
    assert counts.get("val", 0) / total < 0.30
    assert counts.get("test", 0) / total < 0.30


def test_vocab_ordering_and_df_bound(spark, docs):
    rows = corp.vocab_top_n(docs, n=20).collect()
    occ = [r["n_occurrences"] for r in rows]
    assert occ == sorted(occ, reverse=True)
    n_docs = docs.count()
    for r in rows:
        assert 1 <= r["n_docs"] <= min(n_docs, r["n_occurrences"])


def test_tfidf_rare_term_beats_common_term(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha common"),
            (2, "beta common common"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = corp.tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["token"] for r in out}
    # 'common' appears in every doc (df=3) so the df=1 terms win
    assert top[1] == "alpha"
    assert top[2] == "beta"
    # doc 3 has only 'common'
    assert top[3] == "common"
    # exact integer score: tf=2, N=3, df=1 -> 2*1e6*3/1 = 6_000_000
    alpha = [r for r in out if r["token"] == "alpha"][0]
    assert alpha["score_ppm"] == 6_000_000


def test_corpus_filter_gate_flags(spark):
    long_clean = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "en", "s", long_clean),                      # keep
            (2, "en", "s", "tiny doc"),                      # short
            (3, "en", "s", "spam ham " * 30),                # repetitive
            (4, "en", "s", long_clean),                      # dup of 1 → boilerplate
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = {r["doc_id"]: r for r in corp.corpus_filter_gate(docs).collect()}
    assert out[2]["flag_short"] and not out[2]["keep"]
    assert out[3]["flag_repetitive"] and not out[3]["keep"]
    # docs 1 and 4 share every 8-token span → both boilerplate-flagged
    assert out[1]["flag_boilerplate"] and out[4]["flag_boilerplate"]


def test_weighted_sample_deterministic_and_weighted(spark):
    rich = " ".join(f"u{i}" for i in range(50))       # diversity 1.0
    poor = "rep " * 50                                 # diversity ~0.02
    docs = spark.createDataFrame(
        [(i, "en", "s", rich) for i in range(50)]
        + [(100 + i, "en", "s", poor.strip()) for i in range(50)],
        "doc_id long, lang string, source string, text string",
    )
    kept = {r["doc_id"] for r in corp.weighted_sample(docs).collect()}
    again = {r["doc_id"] for r in corp.weighted_sample(docs).collect()}
    assert kept == again                               # churn-free
    n_rich = sum(1 for d in kept if d < 100)
    n_poor = sum(1 for d in kept if d >= 100)
    assert n_rich == 50                                # p=1.0 keeps all
    assert n_poor <= 5                                 # p≈0.02 keeps few


def test_token_budget_fill_semantics(spark):
    import ceres_spark.operators.corpus as corp

    rows = [
        # (doc_id, text, source): margins order by diversity/length
        (1, "alpha beta gamma delta epsilon zeta eta theta", "s1"),
        (2, "alpha alpha alpha alpha alpha alpha alpha alpha", "s1"),
        (3, "one two three four five six seven eight nine ten", "s1"),
        (4, "solo document for another source entirely here now", "s2"),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    res = {
        r["doc_id"]: r
        for r in corp.token_budget_fill(docs, budget_per_source=18).collect()
    }
    # s1: docs 1 (8 tokens) and 3 (10 tokens) have full diversity and
    # outrank the repetitive doc 2; 8+10=18 fits exactly, doc 2 does not
    assert res[1]["selected"] and res[3]["selected"]
    assert not res[2]["selected"]
    assert res[4]["selected"]  # s2's budget is its own
    # cumulative sums are per-source and inclusive
    assert res[4]["cum_tokens"] == res[4]["n_tokens"]
    assert max(res[1]["cum_tokens"], res[3]["cum_tokens"]) == 18


def test_vocab_drift_planted(spark):
    import ceres_spark.operators.corpus as corp

    mk = lambda rows: spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # "new" appears in every B doc and no A doc; "old" the reverse;
    # "same" is everywhere
    a = mk([(i, "same old filler words here") for i in range(4)])
    b = mk([(10 + i, "same new filler words here") for i in range(4)])
    res = {r["token"]: r for r in corp.vocab_drift(a, b, top_n=10).collect()}
    assert res["old"]["drift_ppm"] == 1_000_000
    assert res["new"]["drift_ppm"] == 1_000_000
    assert res["same"]["drift_ppm"] == 0
    assert res["new"]["df_a"] == 0 and res["new"]["rate_b_ppm"] == 1_000_000


def test_hash_embed_properties(spark):
    import ceres_spark.operators.corpus as corp

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", "en", "s", 16),
            (2, "alpha beta alpha", "en", "s", 16),  # identical text
            (3, "gamma delta epsilon", "en", "s", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    res = {r["doc_id"]: r["vec"] for r in corp.hash_embed(docs, dim=16).collect()}
    assert len(res[1]) == 16
    assert res[1] == res[2]          # content-determined
    assert res[1] != res[3]

    # exact mirror of the spec: bucket = md5_int60 % dim, sign from
    # the next hash bits, per token OCCURRENCE
    import hashlib

    def ref_vec(text, dim=16):
        v = [0] * dim
        for t in text.lower().split(" "):
            if not t:
                continue
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            v[h % dim] += 1 if (h // dim) % 2 == 0 else -1
        return v

    for d, text in ((1, "alpha beta alpha"), (3, "gamma delta epsilon")):
        assert list(res[d]) == ref_vec(text), d


def test_dataset_diff_statuses(spark):
    import ceres_spark.operators.corpus as corp

    a = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "fresh")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"]
           for r in corp.dataset_diff(a, b).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_length_percentile_gate_cuts_tails(spark):
    import ceres_spark.operators.corpus as corp
    from pyspark.sql import functions as F

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(
        [1] + [50] * 18 + [500]  # one short + one long outlier
    )]
    out = corp.length_percentile_gate(
        spark.createDataFrame(rows, "doc_id long, text string"),
        lo_pct=0.10, hi_pct=0.90,
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["keep"] is False       # 1-token tail dropped
    assert by_id[19]["keep"] is False      # 500-token tail dropped
    assert all(by_id[i]["keep"] for i in range(1, 19))
    # cutoffs are observed values, not interpolations
    assert by_id[1]["lo_cut"] in (1, 50) and by_id[1]["hi_cut"] in (50, 500)


def test_temperature_mix_empty_corpus_raises(spark):
    import pytest

    import ceres_spark.operators.corpus as corp

    # NULL texts: n_tokens NULL → weight NULL → total weight not > 0
    # (an empty STRING still splits to one empty token; NULL is the
    # true no-content case)
    empty_texts = spark.createDataFrame(
        [(1, "s0", None), (2, "s1", None)],
        "doc_id long, source string, text string",
    )
    with pytest.raises(Exception, match="total weight is 0"):
        corp.temperature_mix(empty_texts, 1000).collect()


def test_temperature_mix_source_cardinality_guard(spark, monkeypatch):
    # VERDICT r5: apportionment ranks globally over an unpartitioned
    # window — past MAX_MIX_SOURCES the plan must raise loudly
    # in-plan, never silently single-reduce a huge key domain
    import pytest

    import ceres_spark.operators.corpus as corp

    docs = spark.createDataFrame(
        [(i, f"s{i}", "a b c") for i in range(6)],
        "doc_id long, source string, text string",
    )
    monkeypatch.setattr(corp, "MAX_MIX_SOURCES", 5)
    with pytest.raises(Exception, match="temperature_mix: more than"):
        corp.temperature_mix(docs, 1000).collect()
    monkeypatch.setattr(corp, "MAX_MIX_SOURCES", 6)
    out = corp.temperature_mix(docs, 1000)
    assert out.agg(F.sum("alloc_tokens")).collect()[0][0] == 1000
