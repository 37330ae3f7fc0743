"""The plug-in codec conformance kit end-to-end (VERDICT r7 #4):

1. A REFERENCE HOOK — a raw-container codec implemented with the
   repo's own decoders (lossless JPEG for image, FLAC for audio, Y4M
   for video, each wrapped in a private 'DNG0/1/2' magic, the DNG-
   wraps-lossless-JPEG shape) — passes every contract clause through
   the real harness, including the Spark operator flow. This is the
   worked example a codec vendor copies (docs/CODECS.md).
2. TAMPER TESTS — deliberately broken hooks (wrong dtype, raises on
   foreign payloads, garbage on truncation, nondeterministic decode,
   claiming a built-in container) each make the harness FAIL with the
   right clause named, proving the kit detects what it documents.
3. The engine's own built-ins honor the truncation clause: an
   exhaustive every-byte-cut sweep over all six public decoders
   raises only ValueError/NotImplementedError (the _loud_corruption
   boundary).
"""

import numpy as np
import pytest

import ceres_spark.operators.multimodal as mm
from ceres_spark.operators.codec_contract import (
    check_codec_contract,
    run_codec_contract,
)


def make_reference_hook():
    """The vendor-facing worked example: claim by magic, decline by
    None, convert internal accidents to ValueError (PIL raises
    OSError, pyav raises its own errors — a conformant wrapper maps
    them), return the decode_real tuple contract.

    Built as a CLOSURE, not a module-level function, and that is part
    of the lesson: the Spark operators snapshot the registry at
    plan-build time and cloudpickle ships the hook to executor
    workers — a closure (or any function whose module isn't
    importable on workers) is pickled BY VALUE and just works; a
    module-level function is pickled by reference and the workers
    must be able to import its module (ship your codec package with
    --py-files, or close over it like this)."""

    def hook(payload, modality):
        head = (payload or b"")[:4]
        try:
            if head == b"DNG0":
                return ("image", mm.decode_jpeg(bytes(payload[4:])))
            if head == b"DNG1":
                arr, rate = mm.decode_flac(bytes(payload[4:]))
                return ("audio", arr, rate)
            if head == b"DNG2":
                frames, fps = mm.decode_y4m(bytes(payload[4:]))
                return ("video", frames, fps)
        except NotImplementedError as e:
            # inner variant this codec can't do — damaged vs
            # unsupported both surface loud; ValueError is the
            # contract's verdict for a CLAIMED payload that can't
            # decode
            raise ValueError(str(e)) from e
        return None

    return hook


_reference_hook = make_reference_hook()


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    pcm = (rng.integers(-500, 500, (700, 2))).astype(np.int16)
    vid = rng.integers(0, 256, (5, 4, 4, 3), dtype=np.uint8)
    return [
        (b"DNG0" + mm.encode_jpeg_lossless(img, restart_interval=8),
         "image"),
        (b"DNG1" + mm.encode_flac(pcm, 8000), "audio"),
        (b"DNG2" + mm.encode_y4m(vid, 10.0), "video"),
    ]


def test_reference_hook_is_conformant(spark, samples):
    # the full kit, operator flow included — raises on any violation
    check_codec_contract(_reference_hook, samples, spark)


def test_reference_hook_decodes_expected_pixels(samples):
    kind, px = _reference_hook(samples[0][0], "image")
    assert kind == "image" and px.shape == (12, 9, 3)
    # lossless JPEG: the wrapped decode is bit-exact
    inner = mm.decode_jpeg(samples[0][0][4:])
    assert np.array_equal(px, inner)


# ------------------------------------------------- tamper tests:
# each broken hook must FAIL the clause that bans its defect


def _img_sample():
    img = np.full((6, 6, 3), 120, dtype=np.uint8)
    return b"DNG0" + mm.encode_jpeg_lossless(img)


def test_tamper_wrong_dtype_fails_claim():
    def bad(payload, modality):
        out = _reference_hook(payload, modality)
        if out is None:
            return None
        return ("image", out[1].astype(np.float64))  # wrong dtype

    fails = run_codec_contract(bad, [(_img_sample(), "image")])
    assert any("uint8" in f for f in fails)


def test_tamper_raises_on_foreign_fails_decline():
    def bad(payload, modality):
        if payload[:4] != b"DNG0":
            raise RuntimeError("not mine")  # must return None
        return _reference_hook(payload, modality)

    fails = run_codec_contract(bad, [(_img_sample(), "image")])
    assert any("foreign payload" in f for f in fails)


def test_tamper_garbage_on_truncation_fails():
    def bad(payload, modality):
        if (payload or b"")[:4] != b"DNG0":
            return None
        try:
            return ("image", mm.decode_jpeg(bytes(payload[4:])))
        except ValueError:
            # garbage instead of raising — the banned behavior
            return ("image", np.zeros((2, 2, 3), np.uint8))

    fails = run_codec_contract(bad, [(_img_sample(), "image")])
    assert any("truncation" in f and "DIFFERENT" in f for f in fails)


def test_tamper_nondeterministic_decode_fails():
    state = {"n": 0}

    def bad(payload, modality):
        out = _reference_hook(payload, modality)
        if out is None:
            return None
        state["n"] += 1
        px = out[1].copy()
        px[0, 0, 0] = state["n"] % 256
        return ("image", px)

    fails = run_codec_contract(bad, [(_img_sample(), "image")])
    assert any("nondeterministic" in f for f in fails)


def test_tamper_builtin_container_sample_fails_routing():
    # a PPM payload never reaches hooks — the kit must say so
    ppm = mm.encode_ppm(np.full((3, 3, 3), 5, dtype=np.uint8))

    def bad(payload, modality):
        if (payload or b"")[:2] == b"P6":
            return ("image", mm.decode_ppm(bytes(payload)))
        return None

    fails = run_codec_contract(bad, [(ppm, "image")])
    assert any("never reaches hooks" in f for f in fails)


# --------------------------------- the engine's own decoders honor
# clause 4 (exhaustive every-byte truncation sweep)

@pytest.mark.parametrize(
    "tag",
    ["ppm", "wav", "y4m", "png", "png_packed", "png_a7_16",
     "jpeg_base", "jpeg_prog", "jpeg_12", "jpeg_lossless", "flac"],
)
def test_builtin_truncation_is_always_valueerror(tag):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    pcm = rng.integers(-300, 300, (400, 1)).astype(np.int16)
    vid = rng.integers(0, 256, (3, 2, 2, 3), dtype=np.uint8)
    payload, dec = {
        "ppm": (mm.encode_ppm(img), mm.decode_ppm),
        "wav": (mm.encode_wav(pcm, 8000), mm.decode_wav),
        "y4m": (mm.encode_y4m(vid, 10.0), mm.decode_y4m),
        "png": (mm.encode_png(img), mm.decode_png),
        "png_packed": (
            mm.encode_png_packed((img[:, :, 0] % 4).astype(np.uint8), 2),
            mm.decode_png,
        ),
        "png_a7_16": (
            mm.encode_png(img, interlace=True, depth=16), mm.decode_png
        ),
        "jpeg_base": (mm.encode_jpeg(img, quality=85), mm.decode_jpeg),
        "jpeg_prog": (
            mm.encode_jpeg(img, quality=85, scans="progressive"),
            mm.decode_jpeg,
        ),
        "jpeg_12": (mm.encode_jpeg(img, quality=85, depth=12),
                    mm.decode_jpeg),
        "jpeg_lossless": (
            mm.encode_jpeg_lossless(img, restart_interval=4),
            mm.decode_jpeg,
        ),
        "flac": (mm.encode_flac(pcm, 8000), mm.decode_flac),
    }[tag]
    full = dec(payload)
    for cut in range(len(payload)):
        try:
            got = dec(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        # a successful decode of a cut payload must equal the full
        # decode (trailing-padding tolerance), never garbage. Y4M is
        # the one streaming container with NO declared total — a cut
        # exactly at a frame boundary is indistinguishable from a
        # shorter video, so an exact frame PREFIX is additionally
        # legal there (and only there).
        if tag == "y4m":
            frames, fps = got
            n = len(frames)
            assert fps == full[1] and np.array_equal(
                frames, full[0][:n]
            ), cut
        elif isinstance(full, tuple):
            assert all(
                np.array_equal(a, b) if isinstance(a, np.ndarray)
                else a == b
                for a, b in zip(got, full)
            ), cut
        else:
            assert np.array_equal(got, full), cut


# ------------------------- clause 4b (r10, VERDICT r9 #8): the T.81
# G.1 scan-band matrix — structurally invalid streams, not truncations


def _progressive_sample():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    return mm.encode_jpeg(img, scans="progressive")


def test_g1_generator_covers_both_scan_kinds():
    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    cases = jpeg_g1_malformed(_progressive_sample())
    whys = {why for _, _, why in cases}
    assert any("DC scan" in w for w in whys), whys
    assert any("Ss>Se" in w for w in whys), whys
    assert any("Se>63" in w for w in whys), whys


def test_reference_hook_passes_g1_malformed_matrix():
    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    prog = _progressive_sample()
    cases = jpeg_g1_malformed(prog, wrap=b"DNG0")
    fails = run_codec_contract(
        _reference_hook, [(b"DNG0" + prog, "image")], malformed=cases
    )
    assert fails == [], fails


def test_tamper_g1_tolerant_hook_fails_malformed_clause():
    # a decoder that swallows scan-band violations and emits pixels
    # anyway must be named by the clause
    def bad(payload, modality):
        if (payload or b"")[:4] != b"DNG0":
            return None
        try:
            return ("image", mm.decode_jpeg(bytes(payload[4:])))
        except ValueError:
            return ("image", np.zeros((12, 9, 3), np.uint8))

    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    prog = _progressive_sample()
    cases = jpeg_g1_malformed(prog, wrap=b"DNG0")
    fails = run_codec_contract(
        bad, [(b"DNG0" + prog, "image")], malformed=cases
    )
    assert any("G.1" in f and "DECODED" in f for f in fails), fails


def test_builtin_huffman_progressive_rejects_g1_bands():
    # the Huffman path itself (r10 — the arithmetic path gained this
    # in r9): every generated G.1-invalid stream raises ValueError
    # FROM THE SCAN-BAND VALIDATION, not from incidental entropy
    # garbage (the first generator cut emitted a spec-valid Ss=Se=63
    # header for the Ss>Se case and only the entropy decode happened
    # to fail — a conformant vendor decoder could have decoded it)
    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    cases = jpeg_g1_malformed(_progressive_sample())
    for payload, _, why in cases:
        with pytest.raises(ValueError, match="G.1|Ss <= Se"):
            mm.decode_jpeg(payload)


def test_g1_generator_survives_fill_bytes():
    # T.81 B.1.1.2 permits 0xFF fill bytes before any marker; the
    # marker walk must not parse a length out of the real marker byte
    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    prog = _progressive_sample()
    padded = prog[:2] + b"\xff" + prog[2:]  # fill byte after SOI
    plain = jpeg_g1_malformed(prog)
    with_fill = jpeg_g1_malformed(padded)
    assert len(with_fill) == len(plain)
    assert [w for _, _, w in with_fill] == [w for _, _, w in plain]


@pytest.mark.parametrize(
    "kwargs",
    [
        {"scans": "progressive"},
        {"scans": "progressive", "subsample": 2},
        # (restart_interval omitted: the encoder rejects DRI with
        # progressive scans by design)
        {"scans": "progressive", "depth": 12},
    ],
)
def test_g1_generator_across_progressive_dials(kwargs):
    # the generator must produce the full matrix (DC Se!=0, AC Ss>Se,
    # AC Se>63) and every case must trip the SCAN-BAND validation on
    # whatever progressive layout the encoder dials produce
    from ceres_spark.operators.codec_contract import jpeg_g1_malformed

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
    payload = mm.encode_jpeg(img, **kwargs)
    cases = jpeg_g1_malformed(payload)
    whys = {why for _, _, why in cases}
    assert {w.split(" with ")[0] for w in whys} == {
        "G.1 DC scan", "G.1 AC scan"
    }, whys
    for p, _, why in cases:
        with pytest.raises(ValueError, match="G.1|Ss <= Se"):
            mm.decode_jpeg(p)
