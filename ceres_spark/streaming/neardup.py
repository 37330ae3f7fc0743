"""Streaming cross-batch near-duplicate detection — the online twin
of operators/dedup.simhash_pairs, i.e. "dedup the incoming crawl
against everything ever seen", the shape of Manku-Jain-Sarma's
simhash dedup service (WWW'07: b permuted tables probed per query).

Construction (state = the b band tables, exactly that paper's
memory layout):

  1. fingerprint each incoming doc with the SAME md5-lower64 simhash
     as the batch op (bit-identical, so batch/stream agree);
  2. explode into ``b = max_hamming + 1`` disjoint bit-bands — the
     pigeonhole guarantee: any pair within ``max_hamming`` agrees
     exactly on ≥1 band, so band buckets are a LOSSLESS candidate
     index;
  3. ``applyInPandasWithState`` keyed by (band_id, band_value):
     group state is the list of (doc_id, fingerprint) ever filed in
     this bucket; each batch doc (processed in doc_id order) is
     verified with exact Hamming against the bucket's history and
     then filed. Emits one (doc_id, dup_of) row per batch doc per
     band — ``dup_of`` = the smallest earlier doc_id within
     ``max_hamming`` found via this band, NULL if none.
  4. :func:`combine_band_verdicts` (a plain batch transform, run in
     the sink/foreachBatch like every decision materializer here)
     collapses a doc's b band rows: ``dup_of = min`` over bands —
     by losslessness this equals the smallest earlier doc within
     ``max_hamming`` GLOBALLY, which is what the batch-equivalence
     test pins against operators/dedup.simhash_pairs.

Scale notes: state is per-bucket and holds fingerprints (16 B/doc/
band), not text — the b·N long pairs any production simhash service
keeps resident; buckets are distributed by the state store across
executors, and each micro-batch touches only the buckets its docs
hash into. An unbounded crawl would add state TTL (timeout) or a
retention rewrite of old fingerprints — the same dial as the batch
engine's deleteBefore.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

import ceres_spark.operators.dedup as dd

BAND_STATE_SCHEMA = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("fps", ArrayType(LongType())),
    ]
)

BAND_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("simhash", LongType()),
        StructField("band_id", IntegerType()),
        StructField("dup_of", LongType()),  # NULL: no match via this band
    ]
)

_MASK64 = (1 << 64) - 1


def _make_band_update(max_hamming: int):
    def _band_update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prior_ids, prior_fps = state.get
            prior_ids, prior_fps = list(prior_ids), list(prior_fps)
        else:
            prior_ids, prior_fps = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # doc_id order: "earlier doc wins" is deterministic within a
        # batch as well as across batches
        batch = batch.sort_values("doc_id", kind="stable")
        band_id = int(key[0])
        out_id, out_fp, out_dup = [], [], []
        for doc_id, h in zip(batch["doc_id"], batch["simhash"]):
            doc_id, h = int(doc_id), int(h)
            matches = [
                pid
                for pid, pfp in zip(prior_ids, prior_fps)
                if ((pfp ^ h) & _MASK64).bit_count() <= max_hamming
            ]
            out_id.append(doc_id)
            out_fp.append(h)
            out_dup.append(min(matches) if matches else None)
            prior_ids.append(doc_id)
            prior_fps.append(h)
        state.update((prior_ids, prior_fps))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_id, dtype="Int64"),
                "simhash": pd.array(out_fp, dtype="Int64"),
                "band_id": band_id,
                "dup_of": pd.array(out_dup, dtype="Int64"),
            }
        )

    return _band_update


def simhash_dedup_stream(
    docs: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Band-level near-dup verdict stream: one (doc_id, band_id,
    dup_of) row per incoming doc per band, state accumulating across
    micro-batches. Collapse per doc with
    :func:`combine_band_verdicts` in the sink."""
    b = n_bands if n_bands is not None else max_hamming + 1
    if b <= max_hamming:
        raise ValueError("n_bands must exceed max_hamming (pigeonhole)")
    fp = dd.simhash(docs)
    keyed = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*dd.simhash_bands(F.col("simhash"), b))
        ).alias("_band_id", "_band_val"),
    )
    return keyed.groupBy("_band_id", "_band_val").applyInPandasWithState(
        _make_band_update(int(max_hamming)),
        BAND_OUTPUT_SCHEMA,
        BAND_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def combine_band_verdicts(band_df: DataFrame) -> DataFrame:
    """Collapse band rows to per-doc verdicts (batch transform for
    the sink): ``dup_of`` = smallest earlier near-dup, ``is_dup`` =
    any band matched. Lossless banding makes this exactly "smallest
    earlier doc within max_hamming globally"."""
    return (
        band_df.groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .withColumn("is_dup", F.col("dup_of").isNotNull())
    )
