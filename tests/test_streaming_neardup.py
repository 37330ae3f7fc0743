"""Streaming cross-batch near-dup detection (streaming/neardup.py):
band-bucket state must accumulate across micro-batches, and the
single-batch result must equal the batch engine's simhash pairing
(losslessness of the pigeonhole bands, online flavor)."""

import pandas as pd
from pyspark.sql import functions as F

import ceres_spark.operators.dedup as dd
import ceres_spark.streaming.neardup as nd


DOCS = [
    # two exact dups of doc 1, one distinct doc, one near-dup of 1
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "completely different text about spark partitions and state"),
    (4, "the quick brown fox jumps over the lazy cat dog"),
    (5, "another unrelated document mentioning parquet files only"),
]


def _run_stream(spark, tmp_path, batches, max_hamming=3):
    src = str(tmp_path / "src")
    for rows in batches:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = nd.simhash_dedup_stream(stream, max_hamming=max_hamming)
    q = (
        out.writeStream.format("memory")
        .queryName("nds")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    return nd.combine_band_verdicts(spark.table("nds"))


def _expected_dup_of(spark, rows, max_hamming):
    """Ground truth from the BATCH engine: dup_of(d) = min earlier
    doc within max_hamming (pairs are emitted doc_a < doc_b)."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.simhash_pairs(
        docs, max_hamming=max_hamming, block_col=None
    ).collect()
    want = {d: None for d, _t in rows}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if want[b] is None or a < want[b]:
            want[b] = a
    return want


def test_single_batch_equals_batch_engine(spark, tmp_path):
    got = {
        r["doc_id"]: r["dup_of"]
        for r in _run_stream(spark, tmp_path, [DOCS]).collect()
    }
    assert got == _expected_dup_of(spark, DOCS, 3)
    # sanity on the fixture itself: the exact dup and near-dup hit
    assert got[2] == 1 and got[3] is None and got[5] is None


def test_cross_batch_state_finds_earlier_docs(spark, tmp_path):
    # doc 2 (exact dup of 1) and doc 4 arrive a batch LATER: the
    # verdict must come from band state persisted across batches
    batches = [DOCS[:3], DOCS[3:]]
    got = {
        r["doc_id"]: r["dup_of"]
        for r in _run_stream(spark, tmp_path, batches).collect()
    }
    assert got == _expected_dup_of(spark, DOCS, 3)
    assert got[2] == 1  # cross-batch exact dup caught


def test_near_dup_within_hamming_crosses_batches(spark, tmp_path):
    # craft a near-dup pair and confirm hamming<=8 catches it across
    # batches while an unrelated doc stays clean
    rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "totally different words entirely unrelated content here"),
        (12, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    fp = {
        r["doc_id"]: r["simhash"]
        for r in dd.simhash(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    h = bin((fp[10] ^ fp[12]) & ((1 << 64) - 1)).count("1")
    h_far = bin((fp[10] ^ fp[11]) & ((1 << 64) - 1)).count("1")
    # fixture premise: near pair clearly closer than the unrelated one
    assert h < h_far
    got = {
        r["doc_id"]: r["dup_of"]
        for r in _run_stream(
            spark, tmp_path, [rows[:2], rows[2:]], max_hamming=h
        ).collect()
    }
    assert got[12] == 10 and got[11] is None


def test_verdicts_deterministic_within_batch(spark, tmp_path):
    # three mutual dups in ONE batch: earliest doc_id wins for both
    rows = [
        (7, "same text every time here"),
        (8, "same text every time here"),
        (9, "same text every time here"),
    ]
    got = {
        r["doc_id"]: r["dup_of"]
        for r in _run_stream(spark, tmp_path, [rows]).collect()
    }
    assert got == {7: None, 8: 7, 9: 7}
