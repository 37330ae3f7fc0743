"""Chunking / packing semantics on hand-built documents."""

import ceres_spark.operators.chunking as chk


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    out = chk.chunk_documents(
        docs(spark, [(1, "s", text)]), size=4, stride=3
    ).orderBy("chunk_idx").collect()
    # starts 1,4,7,10 → chunks of 4,4,4,1 tokens
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 1]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"        # 1-token overlap
    assert out[3]["chunk_text"] == "w9"                  # short tail kept


def test_chunk_short_doc_single_chunk(spark):
    out = chk.chunk_documents(
        docs(spark, [(1, "s", "a b")]), size=64, stride=48
    ).collect()
    assert len(out) == 1 and out[0]["n_chunk_tokens"] == 2


def test_packing_bins_by_running_count(spark):
    text = " ".join(f"w{i}" for i in range(16))  # 16 tokens
    # size=stride=4 → 4 chunks of 4 tokens; ctx=8 → 2 bins of 2 chunks
    chunks = chk.chunk_documents(
        docs(spark, [(1, "s", text)]), size=4, stride=4
    )
    out = {r["bin"]: r for r in chk.pack_sequences(chunks, ctx=8).collect()}
    assert set(out) == {0, 1}
    assert all(r["n_chunks"] == 2 and r["n_tokens"] == 8 for r in out.values())
    assert all(r["fill_frac"] == 1.0 for r in out.values())


def test_packing_is_per_source(spark):
    text = " ".join(f"w{i}" for i in range(8))
    chunks = chk.chunk_documents(
        docs(spark, [(1, "a", text), (2, "b", text)]), size=4, stride=4
    )
    out = chk.pack_sequences(chunks, ctx=8).collect()
    # each source packs independently from bin 0
    assert sorted((r["source"], r["bin"]) for r in out) == [("a", 0), ("b", 0)]


def test_chunk_retrieval_rejects_out_of_range_keys(spark):
    # ADVICE r3: the packed ckey is only injective for doc_id >= 0 and
    # chunk_idx < 1e6 — a violating row must fail LOUDLY in-plan, not
    # silently corrupt retrieval
    import pytest

    bad = docs(spark, [(-1, "s", "a b c d"), (1, "s", "e f g h")])
    with pytest.raises(Exception, match="ckey out of range"):
        chk.chunk_retrieval(bad, query_docs_below=2, k=2).collect()
