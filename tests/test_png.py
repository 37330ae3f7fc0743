"""Stdlib PNG codec (operators/multimodal.py encode_png/decode_png):
the first genuinely compressed container decoding built-in — zlib
inflate + the five predictive scanline unfilters, pure numpy."""

import struct
import zlib

import numpy as np
import pytest

import ceres_spark.operators.multimodal as mm


def _img(h=13, w=17, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_type(ft):
    img = _img()
    assert (mm.decode_png(mm.encode_png(img, filter_type=ft)) == img).all()


def test_roundtrip_extreme_values_wraparound():
    # all-0 / all-255 / hard steps: exercises mod-256 wraparound in
    # Sub/Up/Average/Paeth reconstruction
    img = np.zeros((5, 6, 3), np.uint8)
    img[::2] = 255
    img[:, ::3, 1] = 1
    for ft in range(5):
        assert (mm.decode_png(mm.encode_png(img, filter_type=ft)) == img).all()


def test_decode_real_routes_png_and_matches_ppm_pixels():
    img = _img(11, 9, seed=3)
    kind_png, px_png = mm.decode_real(mm.encode_png(img, 4), "image")
    kind_ppm, px_ppm = mm.decode_real(mm.encode_ppm(img), "image")
    assert kind_png == kind_ppm == "image"
    assert (px_png == px_ppm).all()


def _chunk(typ, data):
    c = typ + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


def _png_raw(w, h, depth, ctype, interlace, scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")
    )


def test_color_types_grey_rgba_greyalpha_palette():
    # grey (0): replicated to 3 channels
    g = bytes([0, 10, 200, 0, 30, 40])  # 2x2 grey, filter 0 rows
    out = mm.decode_png(_png_raw(2, 2, 8, 0, 0, g))
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == 10).all() and (out[1, 1] == 40).all()
    # RGBA (6): alpha dropped
    rgba = bytes([0] + [1, 2, 3, 9] * 2 + [0] + [4, 5, 6, 9] * 2)
    out = mm.decode_png(_png_raw(2, 2, 8, 6, 0, rgba))
    assert (out[0, 1] == [1, 2, 3]).all() and (out[1, 0] == [4, 5, 6]).all()
    # grey+alpha (4)
    ga = bytes([0, 7, 255, 8, 0])
    out = mm.decode_png(_png_raw(2, 1, 8, 4, 0, ga))
    assert (out[0, 0] == 7).all() and (out[0, 1] == 8).all()
    # palette (3): PLTE lookup
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    pal = bytes([0, 0, 1])
    out = mm.decode_png(_png_raw(2, 1, 8, 3, 0, pal, extra=plte))
    assert (out[0, 0] == [255, 0, 0]).all()
    assert (out[0, 1] == [0, 255, 0]).all()


def test_loud_gaps_invalid_combos_and_malformed_streams():
    # r7: sub-8-bit depths are FEATURES now — PNG has no dialect gaps
    # left; what stays loud is the spec-INVALID depth×color matrix
    # (ValueError, §11.2.2) and the malformed-stream ValueErrors
    img = _img(4, 4)
    ok = mm.encode_png(img)
    with pytest.raises(ValueError):
        mm.decode_png(_png_raw(2, 1, 16, 3, 0, bytes(3)))  # 16-bit pal
    with pytest.raises(ValueError):
        mm.decode_png(_png_raw(2, 1, 4, 2, 0, bytes(4)))  # 4-bit RGB
    with pytest.raises(ValueError):
        mm.decode_png(_png_raw(2, 1, 2, 6, 0, bytes(2)))  # 2-bit RGBA
    with pytest.raises(ValueError):
        mm.decode_png(_png_raw(2, 1, 8, 3, 0, bytes([0, 0, 1])))  # no PLTE
    with pytest.raises(ValueError):
        mm.decode_png(
            _png_raw(2, 1, 1, 3, 0, bytes([0, 0, 0]))  # 1-bit pal, no PLTE
        )
    with pytest.raises(ValueError):
        mm.decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        mm.decode_png(ok[:40])  # truncated scanlines/missing IEND path


def test_unsupported_codec_falls_through_to_hook():
    # the loud-gap → plug-in chain contract, exercised through a
    # still-unimplemented dialect (differential sequential, SOF5 —
    # arithmetic SOF9/SOF10 decode built-in since r8)
    claimed = []

    def hook(payload, modality):
        claimed.append(modality)
        return ("image", np.zeros((1, 1, 3), np.uint8))

    payload = b"\xff\xd8\xff\xc5" + struct.pack(">H", 8) + bytes(6)
    kind, px = mm.decode_real(payload, "image", codecs=(hook,))
    assert kind == "image" and claimed == ["image"]


# --------------------------------------- sub-8-bit depths (r7)

def test_subbyte_grey_roundtrip_matrix():
    rng = np.random.default_rng(11)
    for (h, w) in [(1, 1), (1, 8), (3, 5), (8, 8), (9, 13), (16, 31)]:
        for depth in (1, 2, 4):
            s = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
            scale = 255 // ((1 << depth) - 1)
            want = np.repeat((s * scale)[:, :, None], 3, axis=2)
            for ft in range(5):
                for il in (False, True):
                    out = mm.decode_png(mm.encode_png_packed(
                        s, depth, filter_type=ft, interlace=il))
                    assert np.array_equal(out, want), (h, w, depth, ft, il)


def test_subbyte_palette_roundtrip_matrix():
    rng = np.random.default_rng(13)
    for depth in (1, 2, 4):
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        for (h, w) in [(1, 3), (5, 7), (9, 16)]:
            s = rng.integers(0, n, (h, w), dtype=np.uint8)
            for ft in (0, 2, 4):
                for il in (False, True):
                    out = mm.decode_png(mm.encode_png_packed(
                        s, depth, palette=pal, filter_type=ft,
                        interlace=il))
                    assert np.array_equal(out, pal[s]), (depth, h, w, ft, il)


def test_subbyte_handbuilt_bit_packing_msb_first():
    # 1-bit grey, w=10: bits 1100000001 pack MSB-first into 0xC0 0x40
    p = _png_raw(10, 1, 1, 0, 0, bytes([0, 0xC0, 0x40]))
    out = mm.decode_png(p)
    assert out.shape == (1, 10, 3)
    assert out[0, :, 0].tolist() == [255, 255, 0, 0, 0, 0, 0, 0, 0, 255]
    # 2-bit grey: 0b11_00_01_10 -> samples 3,0,1,2 -> 255,0,85,170
    p = mm.decode_png(_png_raw(4, 1, 2, 0, 0, bytes([0, 0b11000110])))
    assert p[0, :, 0].tolist() == [255, 0, 85, 170]
    # 4-bit palette: byte 0x21 -> indices 2,1
    plte = _chunk(b"PLTE", bytes([9, 9, 9, 1, 2, 3, 200, 100, 50]))
    out = mm.decode_png(_png_raw(2, 1, 4, 3, 0, bytes([0, 0x21]), extra=plte))
    assert out[0, 0].tolist() == [200, 100, 50]
    assert out[0, 1].tolist() == [1, 2, 3]


def test_subbyte_rows_pad_to_byte_boundary_per_adam7_pass():
    # w=9 at depth 1: stride 2 bytes with 7 pad bits per row; Adam7
    # passes each pack to their OWN stride — a 9-wide pass-6 row
    # (4 samples) packs into 1 byte
    s = (np.arange(90, dtype=np.int64) % 2).astype(np.uint8).reshape(9, 10)
    for il in (False, True):
        out = mm.decode_png(mm.encode_png_packed(s, 1, interlace=il))
        assert np.array_equal(out[:, :, 0], s * 255), il


def test_encode_png_packed_validates():
    with pytest.raises(ValueError):
        mm.encode_png_packed(np.zeros((2, 2), np.uint8), 3)
    with pytest.raises(ValueError):
        mm.encode_png_packed(np.full((2, 2), 4, np.uint8), 2)  # range
    with pytest.raises(ValueError):
        mm.encode_png_packed(
            np.zeros((2, 2), np.uint8), 2,
            palette=np.zeros((5, 3), np.uint8),  # > 2^depth entries
        )


# --------------------------------------- Adam7 + 16-bit (r6)

def test_adam7_and_depth16_roundtrip_matrix():
    rng = np.random.default_rng(7)
    for (h, w) in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (31, 17)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            for il in (False, True):
                for depth in (8, 16):
                    out = mm.decode_png(mm.encode_png(
                        px, filter_type=ft, interlace=il, depth=depth))
                    assert np.array_equal(out, px), (h, w, ft, il, depth)


def test_adam7_pass_structure_small_images():
    # images smaller than the 8×8 Adam7 tile exercise EMPTY passes
    # (which must contribute zero bytes, not zero-size scanlines)
    for (h, w) in [(1, 1), (1, 8), (8, 1), (2, 2), (4, 5), (3, 9)]:
        px = (np.arange(h * w * 3, dtype=np.int64) % 251).astype(
            np.uint8).reshape(h, w, 3)
        assert np.array_equal(
            mm.decode_png(mm.encode_png(px, 2, interlace=True)), px)


def test_depth16_strips_to_msb():
    # hand-built 16-bit scanline: sample 0x1234 must decode to 0x12
    line = b"\x00" + bytes.fromhex("123456789abc")  # one RGB pixel
    p = _png_raw(1, 1, 16, 2, 0, line)
    assert mm.decode_png(p)[0, 0].tolist() == [0x12, 0x56, 0x9A]


def test_adam7_16bit_grey_and_rgba():
    # interlaced 16-bit grey (type 0): 2×2, values v*257 → MSB v
    vals = np.array([[3, 200], [117, 255]], np.uint8)
    # Adam7 on 2×2: pass1=(0,0), pass6=(0,1), pass7=(1,0),(1,1)
    def px16(v):
        return struct.pack(">H", int(v) * 257)
    body = (b"\x00" + px16(vals[0, 0])        # pass 1: 1×1
            + b"\x00" + px16(vals[0, 1])      # pass 6: 1×1
            + b"\x00" + px16(vals[1, 0]) + px16(vals[1, 1]))  # pass 7
    p = _png_raw(2, 2, 16, 0, 1, body)
    out = mm.decode_png(p)
    assert np.array_equal(out, np.repeat(vals[:, :, None], 3, axis=2))


def test_real_assets_alternate_ppm_png_with_identical_pixels(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (6, "delta " * 40), (3, "epsilon zeta")],
        "doc_id long, text string",
    )
    rows = {
        r["asset_id"]: bytes(r["payload"])
        for r in mm.real_assets_from_documents(docs).collect()
    }
    assert rows[0][:8] == b"\x89PNG\r\n\x1a\n"  # 0 % 6 == 0
    assert rows[6][:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[3][:2] == b"P6"
    # container-invariance: PNG pixels equal the PPM twin's pixels
    for did in (0, 6):
        raw = np.frombuffer(
            {0: b"alpha beta gamma", 6: b"delta " * 40}[did], np.uint8
        )
        w = 16 + len(raw) % 17
        h = 16 + (len(raw) * 7) % 13
        expect = np.resize(raw, (h, w, 3))
        assert (mm.decode_png(rows[did]) == expect).all()


def test_phash_pairs_across_containers(spark):
    # the SAME image planted as PPM and PNG must pair at hamming 0 —
    # near-dup detection is container-blind once decode is real
    base = _img(32, 32, seed=1)
    other = _img(32, 32, seed=2)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(mm.encode_ppm(base))),
         (2, "image", bytearray(mm.encode_png(base, filter_type=3))),
         (3, "image", bytearray(mm.encode_png(other, filter_type=4)))],
        "asset_id long, modality string, payload binary",
    )
    pairs = {(r["asset_a"], r["asset_b"]): r["hamming"]
             for r in mm.phash_pairs(assets, max_hamming=6).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
