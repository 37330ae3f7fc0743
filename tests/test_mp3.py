"""MP3 container layer (operators/mp3.py): frame-header grammar,
ID3v2 skip, VBR census, size walk, truncation contract, and the
sample-decode plug-in boundary."""

import numpy as np
import pytest

import ceres_spark.operators.mp3 as m3
import ceres_spark.operators.multimodal as mm


def test_vbr_census_roundtrip():
    brs = [32, 64, 128, 320, 40]
    p = m3.encode_mp3_frames(brs, rate=44100, id3_bytes=25)
    m = m3.parse_mp3(p)
    assert m["n_frames"] == 5
    assert m["sample_rate"] == 44100
    assert m["total_samples"] == 5 * 1152
    assert m["is_vbr"] is True
    assert (m["bitrate_min"], m["bitrate_max"]) == (32, 320)
    assert m["bitrate_sum"] == sum(brs)
    assert m["id3_bytes"] == 25
    # the size walk: 144000·br//sr + padding (i % 2)
    assert m["audio_bytes"] == sum(
        144000 * b // 44100 + (i % 2) for i, b in enumerate(brs))


def test_cbr_and_no_id3():
    m = m3.parse_mp3(m3.encode_mp3_frames([128] * 4, rate=32000))
    assert m["is_vbr"] is False and m["id3_bytes"] == 0
    assert m["sample_rate"] == 32000


def test_mpeg2_sample_count_and_size_factor():
    # MPEG-2 Layer III: 576 samples/frame, 72000·br//sr sizes
    m = m3.parse_mp3(
        m3.encode_mp3_frames([64, 64], rate=22050, version_bits=2))
    assert m["total_samples"] == 2 * 576
    assert m["audio_bytes"] == sum(
        72000 * 64 // 22050 + (i % 2) for i in range(2))


def test_malformed_streams_raise():
    p = m3.encode_mp3_frames([64, 64], rate=44100, id3_bytes=20)
    for bad in (b"", b"\x12\x34\x56\x78", p[:30],
                b"ID3\x04\x00\x00\x00\x00\x00\x05",  # tag past EOF
                b"ID3\x04\x00\x00\x00\x00\x00"):     # short header
        with pytest.raises(ValueError):
            m3.parse_mp3(bad)
    # free-format (bitrate idx 0) is a loud ValueError, not a guess
    h = (0x7FF << 21) | (3 << 19) | (0b01 << 17) | (1 << 16) \
        | (0 << 12) | (0 << 10)
    with pytest.raises(ValueError, match="free-format"):
        m3.parse_mp3(h.to_bytes(4, "big") + bytes(100))
    # Layer I/II headers route to the plug-in chain
    h2 = (0x7FF << 21) | (3 << 19) | (0b11 << 17) | (1 << 16) \
        | (5 << 12) | (0 << 10)
    with pytest.raises(NotImplementedError):
        m3.parse_mp3(h2.to_bytes(4, "big") + bytes(100))


def test_decode_real_routes_mp3_to_plugin_chain():
    p = m3.encode_mp3_frames([128, 128], rate=44100, id3_bytes=15)
    with pytest.raises(NotImplementedError, match="codec plug-in"):
        mm.decode_real(p, "audio", codecs=[])
    # bare frame sync (no ID3) routes too
    p2 = m3.encode_mp3_frames([128], rate=44100)
    with pytest.raises(NotImplementedError, match="codec plug-in"):
        mm.decode_real(p2, "audio", codecs=[])
    # a registered hook claims it
    fake = ("audio", np.zeros((16, 1), np.int16), 44100)

    def hook(payload, modality):
        return fake if payload[:3] == b"ID3" else None

    assert mm.decode_real(p, "audio", codecs=[hook])[0] == "audio"


def test_audio_manifest_operator(spark):
    docs = spark.createDataFrame(
        [(1, 17), (4, 120), (6, 33)],  # 6 % 3 == 0 → not audio slot
        "doc_id long, n_chars long",
    )
    out = {r["asset_id"]: r for r in m3.audio_manifest(
        m3.mp3_assets_from_documents(docs)).collect()}
    assert set(out) == {1, 4}
    r = out[1]  # c=17: n=3+17%6=8, sr idx 17%3=2 → 32000
    assert r["n_frames"] == 8
    assert r["sample_rate"] == 32000
    assert r["total_samples"] == 8 * 1152
    assert r["id3_bytes"] == 10 + 17 % 50
    brs = [(32, 40, 48, 56, 64)[(17 + i) % 5] for i in range(8)]
    assert r["bitrate_sum"] == sum(brs)
    assert r["audio_bytes"] == sum(
        144000 * b // 32000 + (i % 2) for i, b in enumerate(brs))
