"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star §2.2).

The container has no image/audio libraries, so the decode kernels are
STUBS by design: ``decode_stub_features`` produces deterministic fake
features derived from the bytes; ``decode_real`` raises
``NotImplementedError`` until a real codec is plugged in. Everything
*around* the decode — schema, Arrow batching, ``mapInPandas``
signature, partition sizing — is real and tested, which is the part
that matters for the Spark plumbing.

Scale notes: decode is the textbook ``mapInPandas`` case — per-batch
Python with Arrow transfer, no shuffle; keep binary payloads in their
own table/column family so scans that don't need bytes never read
them (Parquet column pruning does this for free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media asset schema: payload + typed metadata, the pattern every
#: modality shares. Width/height/etc. live in metadata so planning
#: (filtering, bucketing) never touches bytes.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a fake asset table from ``documents`` (bytes = utf-8 of
    text) so the plumbing is exercised on real driver fixtures."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            # content-derived dims so geometry ops have real variety
            (F.lit(16) + F.col("n_chars") % 97).cast("int").alias("width"),
            (F.lit(16) + (F.col("n_chars") * 7) % 83).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, modality: str):
    """Real decode hook — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in "
        "this container; plug a codec in here and keep the "
        "mapInPandas plumbing unchanged"
    )


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake feature vector from content bytes."""
    h = hashlib.sha1(payload or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas``: Arrow batches in,
    Arrow batches out; one Python worker per partition, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "content_sha1": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "content_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": payloads.map(_stub_features),
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps from
    metadata (cheap, no decode), ready to join against a frame
    decoder. Shows the pattern: plan on metadata, decode late."""
    return assets.filter(F.col("modality") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(int(every_ms)),
            )
        ).alias("sample_ms"),
    )


def resize(
    assets: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    preserve_aspect: bool = True,
) -> DataFrame:
    """Image-resize plumbing (§2.2 multimodal: decode / feature /
    **resize** / frame-sample). The geometry — fit-inside aspect
    math, even-dimension rounding — is real and computed JVM-side
    from metadata alone; the pixel resample is the stubbed decode
    step (``decode_real``), exactly like ``extract_features``: plan
    and prune on metadata, touch bytes last.

    Output carries the payload through untouched (a real kernel
    would map it batch-wise in the same mapInPandas slot), so
    downstream stages see the final schema today."""
    w, h = F.col("meta.width"), F.col("meta.height")
    if preserve_aspect:
        # scale = min(tw/w, th/h), exact in doubles for sane dims
        scale = F.least(
            F.lit(float(target_w)) / w, F.lit(float(target_h)) / h
        )
        out_w = F.greatest(F.floor(w * scale).cast("int"), F.lit(1))
        out_h = F.greatest(F.floor(h * scale).cast("int"), F.lit(1))
    else:
        scale = F.lit(None).cast("double")
        out_w, out_h = F.lit(target_w), F.lit(target_h)
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        w.alias("in_w"),
        h.alias("in_h"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        scale.alias("scale"),
        "payload",
    )
