"""Streaming corpus ingestion (streaming/corpus_ingest.py): the
composed front-door must equal its batch constituents — classifier
gate + earliest-wins near-dup against all prior state — across
micro-batches."""

import pandas as pd
from pyspark.sql import functions as F

import ceres_spark.operators.corpus as corp
import ceres_spark.operators.dedup as dd
import ceres_spark.streaming.corpus_ingest as ci


def _mk_docs(n_base=6):
    """Long-enough docs to pass the quality gate, plus planted junk
    and near-dups."""
    base = (
        "spark scan filter join window agg shuffle partition broadcast "
        "codegen arrow batch column row value table metric series "
        "stream state store watermark trigger sink source plan stage "
        "task executor driver memory disk spill sort merge hash"
    )
    rows = []
    for i in range(n_base):
        rows.append((i, base + f" unique{i} marker{i} salt{i}"))
    # near-dup of doc 1 (1-token difference)
    rows.append((100, base + " unique1 marker1 salt1x"))
    # exact dup of doc 2
    rows.append((101, base + " unique2 marker2 salt2"))
    # junk that must fail the quality gate: pure stopword repetition
    # (max stop ratio, near-zero lexical diversity)
    rows.append((102, " ".join(["the"] * 40)))
    return rows


def _run(spark, tmp_path, batches):
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
    out = ci.corpus_ingest_stream(stream, max_hamming=3)
    q = (
        out.writeStream.format("memory")
        .queryName("ingest_bands")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    return ci.materialize_ingest_batch(spark.table("ingest_bands"))


def _expected(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in corp.quality_classifier(docs).filter("keep").collect()
    }
    gated = docs.filter(F.col("doc_id").isin(list(kept)))
    pairs = dd.simhash_pairs(gated, max_hamming=3, block_col=None).collect()
    dup_of = {d: None for d in kept}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if dup_of[b] is None or a < dup_of[b]:
            dup_of[b] = a
    return kept, dup_of


def test_stream_equals_batch_composition(spark, tmp_path):
    rows = _mk_docs()
    # split into two micro-batches: dup/near-dup arrive AFTER their
    # originals, so catching them requires cross-batch state
    batches = [rows[:4], rows[4:]]
    got = {
        r["doc_id"]: (r["dup_of"], r["ingest"])
        for r in _run(spark, tmp_path, batches).collect()
    }
    kept, dup_of = _expected(spark, rows)
    # the junk doc never reaches the state store or the output
    assert 102 not in got and 102 not in kept
    assert set(got) == kept
    for d in kept:
        assert got[d] == (dup_of[d], dup_of[d] is None), d


def test_exact_and_near_dups_rejected(spark, tmp_path):
    rows = _mk_docs()
    res = _run(spark, tmp_path, [rows]).collect()
    by_id = {r["doc_id"]: r for r in res}
    assert by_id[101]["ingest"] is False  # exact dup (hamming 0)
    assert by_id[100]["ingest"] is False  # near dup
    assert by_id[1]["ingest"] is True  # the original wins


def test_state_survives_query_restart(spark, tmp_path):
    """Stop the stream, append new arrivals, START A NEW QUERY on the
    same checkpoint: the band state must be restored, so a dup of a
    doc ingested before the restart is still caught."""
    rows = _mk_docs()
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once(batch_rows):
        spark.createDataFrame(
            batch_rows, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # the FILE sink is the recovery-capable one (memory sink
        # cannot restore from a checkpoint) — also the production
        # shape: verdicts land in a table
        q = (
            ci.corpus_ingest_stream(stream, max_hamming=3)
            .writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(180)

    run_once(rows[:6])        # originals ingested, then the query STOPS
    run_once(rows[6:])        # new query, same checkpoint: dups arrive
    res = ci.materialize_ingest_batch(spark.read.parquet(out))
    by_id = {r["doc_id"]: r for r in res.collect()}
    # docs 100/101 duplicate docs 1/2 from BEFORE the restart — only
    # restored state can know that
    assert by_id[100]["ingest"] is False and by_id[100]["dup_of"] == 1
    assert by_id[101]["ingest"] is False and by_id[101]["dup_of"] == 2
