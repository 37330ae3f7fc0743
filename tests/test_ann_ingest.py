"""Streaming ANN index maintenance: rows ingested via the stream
must be byte-identical in assignment and layout to a batch-built
index over the same vectors, and a probe over the merged index must
equal a probe over an all-batch index."""

import numpy as np
from pyspark.sql import functions as F

import ceres_spark.operators.ivf as ivf
import ceres_spark.streaming.ann_ingest as ai


def make_vectors(spark, lo, hi, dim=8):
    # vector is a pure function of its id, so any (lo, hi) slicing
    # produces identical rows
    rows = [
        (
            i,
            [
                float(x)
                for x in np.random.RandomState(1000 + i).randn(dim)
            ],
            int(i % 3),
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_stream_assignment_equals_batch(spark, tmp_path):
    base = make_vectors(spark, 0, 80)
    cents = ivf.train_centroids_cached(base, "ann-ingest-test", k=4)

    # batch ground truth over vectors 40..80 (the "late arrivals")
    late = make_vectors(spark, 40, 80)
    want = {
        r["vec_id"]: r["_list"]
        for r in ivf._assign(late, cents, "vec_id", "embedding").collect()
    }

    # stream the late arrivals through the maintenance path
    src = str(tmp_path / "src")
    for lo, hi in ((40, 60), (60, 80)):
        make_vectors(spark, lo, hi).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, label int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ai.index_sink(
        ai.assign_stream(stream, cents),
        str(tmp_path / "idx"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(str(tmp_path / "idx"))
    got = {r["vec_id"]: r["_list"] for r in got_df.collect()}
    assert got == want

    # the partitioned layout prunes: a one-list read touches only
    # that directory
    one_list = sorted(want.values())[0]
    pruned = got_df.filter(F.col("_list") == int(one_list))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() == sum(
        1 for v in want.values() if v == one_list
    )


def test_index_sink_checkpoint_restart_appends_only_new(spark, tmp_path):
    """Stop the ingest query, land MORE vectors in the source, start
    a NEW query on the SAME checkpoint: the restarted sink must
    process only the unseen files (no duplicate index rows) and the
    merged index must equal a one-shot batch assignment — the
    durability half of the maintenance contract (the assignment half
    is externally hash-checked by the stream_ann_ingest registry
    entry)."""
    base = make_vectors(spark, 0, 60)
    cents = ivf.train_centroids_cached(base, "ann-restart-test", k=4)
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")

    def run_once():
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>, label int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ai.index_sink(ai.assign_stream(stream, cents), idx, ck)
        assert q.awaitTermination(120)

    make_vectors(spark, 0, 30).coalesce(1).write.mode("append").parquet(src)
    run_once()
    n1 = spark.read.parquet(idx).count()
    assert n1 == 30
    # late arrivals land AFTER the first query finished
    make_vectors(spark, 30, 60).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {
        r["vec_id"]: r["_list"]
        for r in spark.read.parquet(idx).collect()
    }
    assert len(got) == 60  # each vector exactly once — no replays
    want = {
        r["vec_id"]: r["_list"]
        for r in ivf._assign(base, cents, "vec_id", "embedding").collect()
    }
    assert got == want
