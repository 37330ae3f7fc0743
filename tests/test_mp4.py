"""MP4/ISO-BMFF container layer (operators/mp4.py): mux/demux
round-trip, sample-table walk, spec-edge branches (constant-size
stsz, missing stss, 64-bit largesize), truncation contract, and the
frame-decode plug-in boundary."""

import struct

import numpy as np
import pytest

import ceres_spark.operators.mp4 as m4
import ceres_spark.operators.multimodal as mm


def _mk(n=5, base=64, **kw):
    samples = [bytes([i]) * (base + (i % 4)) for i in range(n)]
    defaults = dict(width=32, height=48, timescale=720,
                    sample_delta=100, keyframe_every=3,
                    profile=77, level=40)
    defaults.update(kw)
    return samples, m4.encode_mp4(samples, **defaults)


def test_roundtrip_manifest():
    samples, p = _mk()
    m = m4.parse_mp4(p)
    assert (m["brand"], m["codec"]) == ("isom", "avc1")
    assert (m["profile"], m["level"]) == (77, 40)
    assert (m["width"], m["height"]) == (32, 48)
    assert (m["timescale"], m["duration"]) == (720, 500)
    assert m["n_samples"] == 5
    assert m["sizes"] == [len(s) for s in samples]
    assert m["mdat_bytes"] == sum(len(s) for s in samples)


def test_sample_offset_walk_two_chunks():
    # ftyp is 24 bytes, mdat header 8 → first sample at 32; the
    # two-chunk stsc/stco walk must still yield contiguous offsets
    samples, p = _mk()
    m = m4.parse_mp4(p)
    offs, acc = [], 32
    for s in samples:
        offs.append(acc)
        acc += len(s)
    assert m["sample_offsets"] == offs
    assert m["keyframes"] == [1, 4]
    assert m["keyframe_offsets"] == [offs[0], offs[3]]


def test_single_sample_and_keyframe_every_1():
    _, p = _mk(n=1)
    m = m4.parse_mp4(p)
    assert m["n_samples"] == 1 and m["keyframe_offsets"] == [32]
    _, p = _mk(n=4, keyframe_every=1)
    m = m4.parse_mp4(p)
    assert m["keyframes"] == [1, 2, 3, 4]


def test_constant_size_stsz_branch():
    # rewrite the stsz of a 3-equal-sample file into the constant-
    # size form (sample_size != 0, no table) — parsers meet both
    samples = [b"x" * 50] * 3
    p = m4.encode_mp4(samples, width=16, height=16)
    old = m4._full(b"stsz", 0, 0, struct.pack(">II", 0, 3)
                   + b"".join(struct.pack(">I", 50) for _ in range(3)))
    new = m4._full(b"stsz", 0, 0, struct.pack(">II", 50, 3))
    assert old in p
    # splice, then fix every enclosing box size (moov/trak/mdia/
    # minf/stbl shrink by the 12 dropped table bytes)
    q = bytearray(p.replace(old, new))
    delta = len(old) - len(new)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = bytes(q).index(fourcc)
        (sz,) = struct.unpack(">I", q[i - 4:i])
        q[i - 4:i] = struct.pack(">I", sz - delta)
    m = m4.parse_mp4(bytes(q))
    assert m["sizes"] == [50, 50, 50]
    assert m["sample_offsets"] == [32, 82, 132]


def test_missing_stss_means_all_sync():
    samples = [b"ab" * 10] * 3
    p = m4.encode_mp4(samples, width=16, height=16)
    # drop the stss box entirely and fix enclosing sizes
    kf = [1]  # encoder wrote keyframes [1] for keyframe_every=3, n=3
    real = m4._full(b"stss", 0, 0, struct.pack(">I", len(kf))
                    + b"".join(struct.pack(">I", k) for k in kf))
    assert real in p
    q = bytearray(p.replace(real, b""))
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = bytes(q).index(fourcc)
        (sz,) = struct.unpack(">I", q[i - 4:i])
        q[i - 4:i] = struct.pack(">I", sz - len(real))
    m = m4.parse_mp4(bytes(q))
    assert m["keyframes"] == [1, 2, 3]  # no stss → every sample sync


def test_largesize_mdat():
    # rewrite mdat to the 64-bit largesize form (size field == 1)
    samples = [b"z" * 40] * 2
    p = m4.encode_mp4(samples, width=16, height=16)
    i = p.index(b"mdat") - 4
    (sz,) = struct.unpack(">I", p[i:i + 4])
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", sz + 8)
    q = p[:i] + big + p[i + 8:]
    # chunk offsets shift by 8 — fix stco (two chunks of 1 sample)
    j = q.index(b"stco") + 4 + 4 + 4
    o1, o2 = struct.unpack(">II", q[j:j + 8])
    q = q[:j] + struct.pack(">II", o1 + 8, o2 + 8) + q[j + 8:]
    m = m4.parse_mp4(q)
    assert m["mdat_bytes"] == 80
    assert m["sample_offsets"] == [40, 80]


def test_truncation_and_garbage_raise_value_error():
    _, p = _mk()
    for bad in (b"", b"\x00\x00\x00\x08ftyp", p[:10], p[:40],
                p[:len(p) // 2], b"RIFFxxxxWAVE....",
                p[:24]):  # ftyp only, no moov
        with pytest.raises(ValueError):
            m4.parse_mp4(bad)


def test_decode_real_routes_mp4_to_plugin_chain():
    _, p = _mk()
    with pytest.raises(NotImplementedError, match="codec plug-in"):
        mm.decode_real(p, "video", codecs=[])
    # a registered hook wins: fake decoder returns 2 frames
    fake = ("video", np.zeros((2, 4, 4, 3), np.uint8), 10)

    def hook(payload, modality):
        if payload[4:8] == b"ftyp":
            return fake
        return None

    assert mm.decode_real(p, "video", codecs=[hook])[0] == "video"


def test_video_manifest_operator(spark):
    docs = spark.createDataFrame(
        [(2, "hello world " * 9, 108), (5, "abc" * 40, 120),
         (7, "skipped: not a video slot", 25)],
        "doc_id long, text string, n_chars long",
    )
    out = {r["asset_id"]: r for r in m4.video_manifest(
        m4.mp4_assets_from_documents(docs)).collect()}
    assert set(out) == {2, 5}  # doc 7 % 3 == 1 → not video
    r = out[2]  # c=108: n=2+108%5=5, base=64+44=108
    assert r["n_samples"] == 5
    assert r["width"] == 16 * (1 + 108 % 4)
    assert r["timescale"] == 600 + (108 % 5) * 120
    assert r["mdat_bytes"] == sum(108 + (i % 4) for i in range(5))
    assert r["first_kf_offset"] == 32
    assert r["n_keyframes"] == 2
    # cross-check sum_kf_offsets against a driver-side parse walk
    offs, acc = [], 32
    for i in range(5):
        offs.append(acc)
        acc += 108 + (i % 4)
    assert r["sum_kf_offsets"] == offs[0] + offs[3]
