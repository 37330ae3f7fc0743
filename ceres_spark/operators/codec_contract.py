"""Conformance kit for third-party codec hooks (VERDICT r7 #4).

The engine decodes PPM/PNG/JPEG (all Huffman processes + the
SOF9/SOF10 arithmetic DCT processes)/WAV/FLAC/Y4M
built-in; everything else — MP3 samples, H.264/HEVC frames, the
differential-hierarchy and lossless-arithmetic JPEGs — is plug-in
territory behind
:func:`ceres_spark.operators.multimodal.register_codec`. This module
is the CONTRACT a vendor's hook must satisfy before the engine's
operators (extract_features / frame_sample_real / image_phash /
reencode_images) will behave correctly with it at scale, plus the
harness that machine-checks every clause. A vendor runs::

    from ceres_spark.operators.codec_contract import check_codec_contract
    check_codec_contract(my_hook, [(payload, "image"), ...], spark)

and ships when it raises nothing. The engine's own reference hook
(the repo's lossless-JPEG decoder wrapped as an external raw-container
codec) passes this harness end-to-end in tests/test_codec_contract.py;
docs/CODECS.md is the prose version of the contract.

THE CONTRACT (each clause maps to one check_* function):

1. CLAIM — ``hook(payload, modality)`` returns a decoded tuple for
   payloads of the hook's container: ``("image", (h,w,3) uint8)``,
   ``("audio", (frames, ch) int16, rate)`` or ``("video", (n,h,w,3)
   uint8, fps)``. Wrong dtype/shape corrupts every downstream feature.
2. DECLINE — foreign payloads (unknown magic, empty, None-ish) return
   ``None`` and NEVER raise: decode_real chains hooks, so a hook that
   raises on other vendors' containers breaks the chain.
3. DETERMINISM — two decodes of the same payload are bit-identical.
   Every dedup/fingerprint oracle in this engine hash-checks decoded
   content; a nondeterministic decode breaks external verification.
4. TRUNCATION — a damaged payload of the hook's OWN container raises
   ``ValueError`` (loud, routable), or — only while the magic window
   itself (first 12 bytes) is cut — returns None; it never returns
   garbage and never raises another exception type. Trailing-padding
   formats may alternatively decode a truncated payload to the EXACT
   full-payload result.
4b. MALFORMED (opt-in, r10) — complete streams whose HEADERS violate
   the container spec (vs truncation's damaged byte stream) raise
   ``ValueError``: the shipped :func:`jpeg_g1_malformed` generator
   covers T.81 G.1's scan-band cases (progressive DC scan with
   Se≠0, AC scan with Ss>Se / Se>63) — a decoder that quietly reads
   a DC-only scan out of them corrupts downstream fingerprints.
5. ROUTING — through ``decode_real``: the sample must be genuine
   plug-in territory (built-ins raise ``NotImplementedError`` without
   the hook), the hook's decode must come back unchanged with the
   hook installed, and built-in containers must NEVER reach hooks
   (built-ins win; checked with a tattletale hook on a PPM sample).
6. OPERATOR FLOW — registered for real (register_codec → plan-build
   snapshot → cloudpickle to executor workers), the hook's decodes
   must flow through the production Spark operators: extract_features
   equals ``real_features`` on the direct decode, image_phash equals
   the direct aHash, frame_sample_real yields every-Nth frame rows.
"""

from __future__ import annotations

import numpy as np

import ceres_spark.operators.multimodal as mm

#: decode_real dispatches on the first 12 payload bytes; a truncation
#: inside this window may legitimately make the container
#: unrecognizable (None) instead of damaged (ValueError)
MAGIC_WINDOW = 12


def _validate_decoded(out, modality: str) -> list[str]:
    """Clause 1: the decoded-tuple contract."""
    fails: list[str] = []
    if not isinstance(out, tuple) or len(out) < 2:
        return [f"decode returned {type(out).__name__}, not a tuple"]
    kind = out[0]
    if kind == "image":
        px = out[1]
        if not isinstance(px, np.ndarray) or px.dtype != np.uint8:
            fails.append("image pixels must be a uint8 ndarray")
        elif px.ndim != 3 or px.shape[2] != 3 or min(px.shape[:2]) < 1:
            fails.append(f"image shape {px.shape} != (h, w, 3)")
    elif kind == "audio":
        if len(out) != 3:
            return ["audio decode must be (kind, samples, rate)"]
        arr, rate = out[1], out[2]
        if not isinstance(arr, np.ndarray) or arr.dtype != np.int16:
            fails.append("audio samples must be an int16 ndarray")
        elif arr.ndim != 2 or arr.shape[1] < 1:
            fails.append(f"audio shape {arr.shape} != (frames, ch)")
        if not rate or rate <= 0:
            fails.append(f"audio rate {rate} must be > 0")
    elif kind == "video":
        if len(out) != 3:
            return ["video decode must be (kind, frames, fps)"]
        fr, fps = out[1], out[2]
        if not isinstance(fr, np.ndarray) or fr.dtype != np.uint8:
            fails.append("video frames must be a uint8 ndarray")
        elif fr.ndim != 4 or fr.shape[3] != 3:
            fails.append(f"video shape {fr.shape} != (n, h, w, 3)")
        if not fps or fps <= 0:
            fails.append(f"video fps {fps} must be > 0")
    else:
        fails.append(f"unknown decode kind {kind!r}")
    return fails


def _same_decode(a, b) -> bool:
    if type(a) is not type(b) or not isinstance(a, tuple):
        return a == b
    if len(a) != len(b) or a[0] != b[0]:
        return False
    if not np.array_equal(a[1], b[1]):
        return False
    return len(a) < 3 or a[2] == b[2]


def check_claim(hook, payload: bytes, modality: str) -> list[str]:
    out = hook(payload, modality)
    if out is None:
        return ["hook declined its own sample payload"]
    return _validate_decoded(out, modality)


def check_decline(hook, modality: str) -> list[str]:
    fails = []
    for foreign in (b"NOPE" + b"\x00" * 64, b"", b"\xde\xad\xbe\xef" * 8):
        try:
            if hook(foreign, modality) is not None:
                fails.append(
                    f"hook claimed a foreign payload {foreign[:4]!r}"
                )
        except Exception as e:  # noqa: BLE001 — the clause bans ALL raises
            fails.append(
                f"hook raised {type(e).__name__} on a foreign payload "
                "(must return None: decode_real chains hooks)"
            )
    return fails


def check_determinism(hook, payload: bytes, modality: str) -> list[str]:
    a, b = hook(payload, modality), hook(payload, modality)
    if not _same_decode(a, b):
        return ["decode is nondeterministic (hash-check oracles break)"]
    return []


def check_truncation(hook, payload: bytes, modality: str) -> list[str]:
    full = hook(payload, modality)
    fails = []
    for cut in sorted({1, 4, len(payload) // 2, len(payload) - 1}):
        if not 0 < cut < len(payload):
            continue
        try:
            got = hook(payload[:cut], modality)
        except ValueError:
            continue  # the contract's damaged-payload answer
        except Exception as e:  # noqa: BLE001 — anything else is a fail
            fails.append(
                f"truncation at {cut} raised {type(e).__name__} "
                "(must be ValueError)"
            )
            continue
        if got is None:
            if cut >= MAGIC_WINDOW:
                fails.append(
                    f"truncation at {cut} returned None past the magic "
                    "window (must raise ValueError — a silent decline "
                    "hides corruption)"
                )
        elif not _same_decode(got, full):
            fails.append(
                f"truncation at {cut} decoded to DIFFERENT content "
                "(garbage out — must raise ValueError)"
            )
    return fails


def check_malformed(hook, samples) -> list[str]:
    """Clause 4b (r10, VERDICT r9 #8): STRUCTURALLY invalid payloads
    of the hook's own container — not merely truncated ones — must
    raise ``ValueError``. Truncation damages the byte stream; these
    samples are complete streams whose headers violate the format
    spec (the shipped generators are the T.81 G.1 scan-band cases a
    progressive-JPEG decoder must reject: a DC scan with Se≠0, an AC
    scan with Ss>Se or Se>63). A decoder that quietly reads a
    DC-only scan or an empty AC band out of them corrupts every
    downstream fingerprint without a trace.

    ``samples`` is a list of ``(payload, modality, why)``; empty
    lists are fine (the clause is opt-in — not every container has
    known in-spec-shaped invalid forms worth pinning)."""
    fails = []
    for payload, modality, why in samples:
        try:
            got = hook(payload, modality)
        except ValueError:
            continue  # the contract's verdict for a damaged claim
        except Exception as e:  # noqa: BLE001 — anything else fails
            fails.append(
                f"malformed ({why}) raised {type(e).__name__} "
                "(must be ValueError)"
            )
            continue
        fails.append(
            f"malformed ({why}) "
            + ("returned None (silent decline hides the corruption)"
               if got is None
               else "DECODED (garbage out — must raise ValueError)")
        )
    return fails


def jpeg_g1_malformed(payload: bytes, wrap: bytes = b"") -> list:
    """Generate the T.81 G.1 scan-band tamper matrix from a VALID
    progressive JPEG: for each SOS header, patch the spectral
    selection bytes into the invalid forms G.1.1.1.1 bans — a DC
    scan (Ss=0) with Se≠0, an AC scan with Ss>Se, and an AC scan
    with Se>63. Returns ``(payload, "image", why)`` tuples for
    :func:`check_malformed`; ``wrap`` prefixes each variant with the
    hook's own magic (the DNG-wraps-JPEG shape in the conformance
    kit's reference hook).

    The marker walk skips entropy-coded data the standard way (a
    0xFF followed by a non-stuffing, non-RSTn byte ends a scan), so
    it works on any conformant stream regardless of scan count."""
    out = []
    i = 2  # past SOI
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional 0xFF fill bytes
            i += 1          # before any marker — skip, don't parse a
            continue        # length out of the real marker byte
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker == 0xDA:  # SOS: patch Ss/Se, then skip entropy
            ns = payload[i + 4]
            ss_at = i + 5 + 2 * ns
            ss, se = payload[ss_at], payload[ss_at + 1]
            def patched(new_ss, new_se):
                b = bytearray(payload)
                b[ss_at], b[ss_at + 1] = new_ss, new_se
                return wrap + bytes(b)
            if ss == 0:
                out.append((patched(0, 5), "image",
                            "G.1 DC scan with Se!=0"))
            else:
                # no cap on the patched Ss: se is 63 for most real AC
                # scans, and min(se+1, 63) would emit a spec-VALID
                # Ss=Se=63 header — a conformant vendor decoder could
                # legitimately decode it, failing the clause falsely.
                # Ss=se+1 (<=64, fits a byte) genuinely violates
                # G.1.1.1.1's 1 <= Ss <= Se <= 63.
                out.append((patched(se + 1, se), "image",
                            "G.1 AC scan with Ss>Se"))
                out.append((patched(ss, 64), "image",
                            "G.1 AC scan with Se>63"))
            i += 2 + ln
            while i + 1 < n and not (
                payload[i] == 0xFF
                and payload[i + 1] != 0x00
                and not 0xD0 <= payload[i + 1] <= 0xD7
            ):
                i += 1
        else:
            i += 2 + ln
    return out


def check_routing(hook, payload: bytes, modality: str) -> list[str]:
    fails = []
    # the sample must be genuine plug-in territory: the gap is loud
    # without the hook ...
    try:
        mm.decode_real(payload, modality, codecs=())
        fails.append(
            "built-ins decode this sample — it never reaches hooks; "
            "pick a payload of YOUR container"
        )
    except NotImplementedError:
        pass
    except ValueError:
        fails.append(
            "built-ins claim this container (ValueError) — hooks are "
            "only consulted after NotImplementedError"
        )
    # ... and the hook's decode comes back unchanged through the chain
    try:
        via = mm.decode_real(payload, modality, codecs=(hook,))
    except Exception as e:  # noqa: BLE001
        fails.append(
            f"decode_real with the hook raised {type(e).__name__}"
        )
    else:
        if not _same_decode(via, hook(payload, modality)):
            fails.append("decode_real altered the hook's decode")
    # built-in containers must never reach hooks
    calls = []

    def tattletale(p, m):
        calls.append(m)
        return None

    ppm = mm.encode_ppm(np.full((2, 2, 3), 9, dtype=np.uint8))
    mm.decode_real(ppm, "image", codecs=(tattletale,))
    if calls:
        fails.append("a built-in PPM decode consulted the hook chain")
    return fails


def check_operator_flow(hook, samples, spark) -> list[str]:
    """Clause 6: the hook through the REAL Spark operators (separate
    worker processes; the plan-build snapshot ships it)."""
    fails: list[str] = []
    rows = [
        (i, m, bytearray(p)) for i, (p, m) in enumerate(samples)
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary"
    )
    mm.register_codec(hook)
    try:
        feats = {
            r["asset_id"]: list(r["features"])
            for r in mm.extract_features(assets, real=True).collect()
        }
        for i, (p, m) in enumerate(samples):
            want = mm.real_features(p, m, (hook,))
            if len(feats[i]) != mm.FEATURE_DIM:
                fails.append(f"sample {i}: features != FEATURE_DIM")
            elif any(
                # FEATURES_SCHEMA stores float32: the operator value
                # must be EXACTLY the float32 rounding of the direct
                # double — strict, just at the declared precision
                a != float(np.float32(b))
                for a, b in zip(feats[i], want)
            ):
                fails.append(
                    f"sample {i}: operator features != direct "
                    "real_features"
                )
        img_idx = [i for i, (_, m) in enumerate(samples) if m == "image"]
        if img_idx:
            ph = {
                r["asset_id"]: r["phash"]
                for r in mm.image_phash(assets).collect()
            }
            for i in img_idx:
                px = hook(samples[i][0], "image")[1]
                if ph.get(i) != mm._ahash64(px, 8):
                    fails.append(f"sample {i}: image_phash mismatch")
        vid_idx = [i for i, (_, m) in enumerate(samples) if m == "video"]
        if vid_idx:
            fr_rows = mm.frame_sample_real(assets, every_n=2).collect()
            got = {}
            for r in fr_rows:
                got.setdefault(r["asset_id"], []).append(r["frame_idx"])
            for i in vid_idx:
                n = len(hook(samples[i][0], "video")[1])
                if sorted(got.get(i, [])) != list(range(0, n, 2)):
                    fails.append(
                        f"sample {i}: frame_sample_real indices wrong"
                    )
    finally:
        mm.unregister_codec(hook)
    return fails


def run_codec_contract(hook, samples, spark=None, malformed=None) -> list[str]:
    """Run every contract clause; returns failure strings (empty ==
    conformant). ``samples`` is a list of (payload, modality) of the
    HOOK'S OWN container. Pass ``spark`` to include the operator-flow
    clause (recommended — it is the production path). Pass
    ``malformed`` — a list of ``(payload, modality, why)``
    structurally invalid payloads of the hook's own container, e.g.
    from :func:`jpeg_g1_malformed` — to include the malformed-stream
    clause (r10; recommended for any container with known
    in-spec-shaped invalid forms)."""
    fails: list[str] = []
    seen_modalities = set()
    for idx, (payload, modality) in enumerate(samples):
        tag = f"sample {idx} ({modality}): "
        for check in (check_claim, check_determinism, check_truncation,
                      check_routing):
            fails.extend(tag + f for f in check(hook, payload, modality))
        seen_modalities.add(modality)
    for m in seen_modalities:
        fails.extend(f"decline ({m}): " + f for f in check_decline(hook, m))
    if malformed:
        fails.extend(check_malformed(hook, malformed))
    if spark is not None:
        fails.extend(check_operator_flow(hook, samples, spark))
    return fails


def check_codec_contract(hook, samples, spark=None, malformed=None) -> None:
    """Raise AssertionError listing every clause violation (vendor
    entry point); returns None when the hook is conformant."""
    fails = run_codec_contract(hook, samples, spark, malformed=malformed)
    if fails:
        raise AssertionError(
            "codec hook violates the contract:\n- " + "\n- ".join(fails)
        )
