"""Streaming ANN index maintenance — the online side of the IVF
family in :mod:`ceres_spark.operators.ivf`: new vectors arrive on a
stream, are assigned to their coarse list against the FROZEN trained
centroids (an index artifact — training happens at build time, not
per batch), and land in the same ``partitionBy("_list")`` layout the
batch-built index uses, so probes prune identically whether a row
arrived in the initial build or five minutes ago.

Why this shape scales: centroid assignment with frozen centroids is
STATELESS — a pandas_udf GEMM per Arrow batch, no state store, no
watermark, no shuffle (the partitioned sink does the clustering by
directory). Retraining the quantizer is an offline decision (drift
monitoring, e.g. :func:`ceres_spark.operators.corpus.vocab_drift`'s
embedding analogue), exactly as production IVF deployments treat it;
a retrain writes a NEW index generation, it never mutates the live
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ceres_spark.operators.ivf import _assign


def assign_stream(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stateless streaming coarse-assignment: adds ``_list`` against
    frozen centroids. Works identically on batch and streaming
    frames (no state, no time semantics) — THE property that makes
    stream-ingested rows indistinguishable from batch-built ones.
    """
    return _assign(vectors, centroids, id_col, vec_col)


def index_sink(stream_assigned: DataFrame, path: str, checkpoint: str):
    """Append the assigned stream into the partitioned index layout.
    One directory per coarse list — a probe with ``nprobe`` lists
    reads ``nprobe`` directories' files, arrival time irrelevant."""
    return (
        stream_assigned.writeStream.format("parquet")
        .partitionBy("_list")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
