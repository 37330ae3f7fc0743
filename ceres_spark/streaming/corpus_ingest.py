"""Streaming corpus ingestion — the production front-door composed
from pieces this engine already proves individually: an incoming
document stream is quality-gated (stateless classifier scan), then
near-dup-checked against EVERYTHING EVER INGESTED (the simhash band
state of :mod:`ceres_spark.streaming.neardup`), and the sink emits
one auditable verdict row per document.

Design choices that matter at crawl scale:

- The quality gate runs FIRST and stateless: rejected documents
  never touch the state store, so state growth tracks the accepted
  crawl, not the raw crawl.
- Exact duplicates are near-duplicates at Hamming distance 0, so the
  band state subsumes exact dedup — one stateful operator, not a
  dropDuplicates→applyInPandasWithState chain (multi-stateful
  streaming queries carry planner restrictions and double the state).
- The final verdict collapse is a plain batch transform meant for
  the sink (`foreachBatch`), like every decision materializer here.

State sizing is the WWW'07 simhash-service bound: b bands × 16 bytes
per ACCEPTED doc; TTL/retention is the same dial as the batch
engine's deleteBefore (see neardup module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import ceres_spark.operators.corpus as corp
import ceres_spark.streaming.neardup as nd


def corpus_ingest_stream(
    docs: DataFrame,
    max_hamming: int = 3,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Quality-gate then near-dup-check a streaming `doc_id, text`
    frame. Emits one (doc_id, band_id, dup_of) row per ACCEPTED doc
    per band; collapse in the sink with
    :func:`materialize_ingest_batch` (join the classifier margin
    back on there if the audit row needs it — it is a deterministic
    scan, so recomputing it batch-side is exact). Rejected docs are
    dropped before the state store and never create state.
    """
    gated = corp.quality_classifier(
        docs, weights=weights, keep_cols=("text",)
    ).filter(F.col("keep"))  # stateless: one projection, no join
    return nd.simhash_dedup_stream(
        gated.select("doc_id", "text"), max_hamming=max_hamming
    )


def materialize_ingest_batch(
    band_df: DataFrame, quality: DataFrame | None = None
) -> DataFrame:
    """Sink-side collapse: per-doc ``dup_of`` (smallest earlier
    near-dup ever seen, NULL if novel) and the final ``ingest``
    verdict — accepted docs that are not duplicates of anything
    already ingested. ``quality`` (optional) joins the margin back
    on for the audit row."""
    out = nd.combine_band_verdicts(band_df).withColumn(
        "ingest", ~F.col("is_dup")
    )
    if quality is not None:
        out = out.join(
            quality.select("doc_id", "margin_micro"), "doc_id", "left"
        )
    return out
