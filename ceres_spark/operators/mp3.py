"""MP3 container layer — the audio analog of :mod:`.mp4` (r6).

MP3 FRAME DECODE (hybrid filterbank, huffman spectral data) is
plug-in territory, same boundary call as H.264. But the FRAME
HEADERS are a public 32-bit grammar (ISO 11172-3 / 13818-3), and a
frame-header walk is exactly what a corpus pipeline needs to plan
work over audio at scale: duration, sample rate, CBR/VBR bitrate
census, channel mode, and byte extents — the ffprobe-style manifest,
computed WITHOUT any decoder. :func:`parse_mp3` walks ID3v2 +
frames; :func:`encode_mp3_frames` is the fixture muxer twin
(structurally valid headers, deterministic filler payloads — the
parser never reads spectral data, so fixtures don't need any).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: MPEG-1 Layer III bitrate table, kbit/s (index 0 = "free", 15 bad)
BITRATES_V1_L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
#: MPEG-2/2.5 Layer III bitrates
BITRATES_V2_L3 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
#: sample rates by version: MPEG1, MPEG2, MPEG2.5
SAMPLE_RATES = {
    3: (44100, 48000, 32000),   # version bits 11 = MPEG1
    2: (22050, 24000, 16000),   # 10 = MPEG2
    0: (11025, 12000, 8000),    # 00 = MPEG2.5
}


def frame_size_l3(version_bits: int, bitrate_kbps: int, rate: int,
                  padding: int) -> int:
    """Layer III frame byte length: 144·br/sr (MPEG1) or 72·br/sr
    (MPEG2/2.5), plus the padding slot."""
    factor = 144_000 if version_bits == 3 else 72_000
    return factor * bitrate_kbps // rate + padding


def samples_per_frame_l3(version_bits: int) -> int:
    return 1152 if version_bits == 3 else 576


def encode_mp3_frames(
    frame_bitrates: list[int],
    rate: int = 44100,
    version_bits: int = 3,
    channel_mode: int = 1,  # joint stereo
    padding_rule=lambda i: i % 2,
    id3_bytes: int = 0,
) -> bytes:
    """Mux structurally valid Layer III frames (VBR when bitrates
    differ): optional ID3v2 tag (syncsafe size), then one frame per
    requested bitrate with deterministic filler payload. The parser
    twin never touches spectral bytes, so the filler carries no
    sync-false-positive 0xFF runs."""
    out = bytearray()
    if id3_bytes:
        body = id3_bytes - 10
        if body < 0:
            raise ValueError("ID3v2 tag is at least 10 bytes")
        out += b"ID3\x04\x00\x00" + bytes([
            (body >> 21) & 0x7F, (body >> 14) & 0x7F,
            (body >> 7) & 0x7F, body & 0x7F,
        ]) + bytes(body)
    table = BITRATES_V1_L3 if version_bits == 3 else BITRATES_V2_L3
    sr_idx = SAMPLE_RATES[version_bits].index(rate)
    for i, br in enumerate(frame_bitrates):
        br_idx = table.index(br)
        pad = int(padding_rule(i)) & 1
        h = (
            (0x7FF << 21)            # sync
            | (version_bits << 19)   # version
            | (0b01 << 17)           # layer III
            | (1 << 16)              # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | (channel_mode << 6)
        )
        size = frame_size_l3(version_bits, br, rate, pad)
        hdr = h.to_bytes(4, "big")
        body = bytes((37 * (i + j)) % 255 for j in range(size - 4))
        out += hdr + body
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Frame-header walk: skip an ID3v2 tag if present, then read
    every Layer III frame header, deriving sizes from the public
    bitrate/samplerate tables. Returns the planning manifest —
    n_frames, sample rate, total samples, VBR flag, min/max/sum
    bitrate, audio byte extent, id3 bytes. Truncated or junk streams
    raise ValueError (the codec hook-routing contract)."""
    pos = 0
    id3 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14) \
            | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        id3 = 10 + sz
        pos = id3
    if pos + 4 > len(payload):
        raise ValueError("no MP3 frames")
    n = 0
    rate = None
    version_bits = None
    channel_mode = None
    brs = []
    samples = 0
    audio_start = pos
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("lost MP3 frame sync")
        vb = (h >> 19) & 3
        layer = (h >> 17) & 3
        if vb == 1 or layer != 0b01:
            raise NotImplementedError(
                "only Layer III frame grammar parses built-in"
            )
        br_idx = (h >> 12) & 15
        sr_idx = (h >> 10) & 3
        pad = (h >> 9) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid MP3 frame header")
        table = BITRATES_V1_L3 if vb == 3 else BITRATES_V2_L3
        br = table[br_idx]
        r = SAMPLE_RATES[vb][sr_idx]
        if rate is None:
            rate, version_bits = r, vb
            channel_mode = (h >> 6) & 3
        elif r != rate or vb != version_bits:
            raise ValueError("mixed sample rates in MP3 stream")
        size = frame_size_l3(vb, br, r, pad)
        if pos + size > len(payload):
            raise ValueError("truncated MP3 frame")
        brs.append(br)
        samples += samples_per_frame_l3(vb)
        n += 1
        pos += size
    if n == 0:
        raise ValueError("no MP3 frames")
    return {
        "n_frames": n,
        "sample_rate": rate,
        "version_bits": version_bits,
        "channel_mode": channel_mode,
        "total_samples": samples,
        "is_vbr": len(set(brs)) > 1,
        "bitrate_min": min(brs),
        "bitrate_max": max(brs),
        "bitrate_sum": sum(brs),
        "audio_bytes": pos - audio_start,
        "id3_bytes": id3,
    }


# ------------------------------------------------- Spark operators

AUDIO_MANIFEST_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("n_frames", T.LongType(), False),
    T.StructField("sample_rate", T.LongType(), False),
    T.StructField("total_samples", T.LongType(), False),
    T.StructField("is_vbr", T.BooleanType(), False),
    T.StructField("bitrate_min", T.LongType(), False),
    T.StructField("bitrate_max", T.LongType(), False),
    T.StructField("bitrate_sum", T.LongType(), False),
    T.StructField("audio_bytes", T.LongType(), False),
    T.StructField("id3_bytes", T.LongType(), False),
])


def audio_manifest(assets: DataFrame) -> DataFrame:
    """Per-asset MP3 planning manifest via one ``mapInPandas`` pass —
    the duration/bitrate census a corpus pipeline runs over 100 TB of
    audio BEFORE deciding what to hand a real decoder. Payload bytes
    never leave the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = parse_mp3(bytes(payload))
                rows.append({
                    "asset_id": int(aid),
                    "n_frames": m["n_frames"],
                    "sample_rate": m["sample_rate"],
                    "total_samples": m["total_samples"],
                    "is_vbr": m["is_vbr"],
                    "bitrate_min": m["bitrate_min"],
                    "bitrate_max": m["bitrate_max"],
                    "bitrate_sum": m["bitrate_sum"],
                    "audio_bytes": m["audio_bytes"],
                    "id3_bytes": m["id3_bytes"],
                })
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_MANIFEST_SCHEMA],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, AUDIO_MANIFEST_SCHEMA)


def mp3_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MP3 fixtures over the audio documents
    (``doc_id % 3 == 1``). Every container parameter is arithmetic
    in (doc_id, n_chars) so a SQL oracle recomputes the manifest:

    - n_frames    = 3 + n_chars % 6
    - bitrate_i   = [32, 40, 48, 56, 64][(n_chars + i) % 5]  (VBR)
    - sample_rate = [44100, 48000, 32000][n_chars % 3]  (MPEG1 L3)
    - padding_i   = i % 2
    - id3_bytes   = 10 + n_chars % 50
    """
    from pyspark.sql import functions as F

    rates = (44100, 48000, 32000)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, c in zip(pdf["doc_id"], pdf["n_chars"]):
                c = int(c)
                n = 3 + c % 6
                brs = [(32, 40, 48, 56, 64)[(c + i) % 5]
                       for i in range(n)]
                payload = encode_mp3_frames(
                    brs,
                    rate=rates[c % 3],
                    id3_bytes=10 + c % 50,
                )
                out.append({
                    "asset_id": int(doc_id),
                    "modality": "audio",
                    "payload": payload,
                })
            yield pd.DataFrame(
                out, columns=["asset_id", "modality", "payload"])

    schema = T.StructType([
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    auds = docs.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id", "n_chars")
    par = auds.sparkSession.sparkContext.defaultParallelism
    return auds.repartition(par).mapInPandas(enc, schema)
