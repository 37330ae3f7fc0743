"""Arithmetic-coded JPEG (T.81 Annexes D/F/G): SOF9 + SOF10 built-in.

Closes SURVEY §2.8 known-gap #2 (carried since r7): the
arithmetic-coded DCT processes — extended sequential (SOF9) and
progressive (SOF10), 8- and 12-bit — decode built-in, leaving only
the differential-hierarchy processes (SOF5-7/13-15) and
lossless-arithmetic (SOF11) on the codec plug-in chain. The public
reference (graphite-project/ceres, a series storage library) has no
media layer at all; this module extends the repo's own multimodal
codec family (operators/multimodal.py) the same way lossless JPEG
did in r7.

Everything here is derived from the published ITU-T T.81 spec:

- ``_QM_TABLE`` is Table D.3 verbatim (the 113-state Qe estimation
  machine) plus the conventional non-adapting 114th state used for
  the fixed (~equiprobable) decisions of F.1.4.4.1.2.
- ``_QMEncoder`` / ``_QMDecoder`` implement the Annex D QM-coder
  flowcharts (CODE/DECODE with conditional MPS/LPS exchange,
  RENORME/RENORMD, BYTEIN/BYTEOUT with 0xFF00 byte stuffing and
  carry resolution, INITENC/INITDEC, and the CLEARBITS flush).
  MPS owns the BOTTOM subinterval ``[0, A-Qe)`` and LPS the top
  ``Qe``, exchanged when ``A-Qe < Qe`` — the orientation Annex D
  fixes and tests/test_jpeg_arith.py pins with a hand-executed
  trace of the flowcharts (four decisions worked on paper,
  including both exchange branches, asserting the exact flush
  bytes). That trace is the twin-asymmetric fixture: it validates
  the implementation against the STANDARD's arithmetic, not
  against this module's own encoder.
- The DC model (F.1.4.4.1): per-component conditioning context
  classified from the previous diff into zero / ±small / ±large by
  the DAC ``(L, U)`` bounds, magnitude categories on the X1 bin
  chain, one shared mantissa bin per category.
- The AC model (F.1.4.4.2): per-k EOB and run decisions on 3-bin
  strides, sign on the fixed bin, magnitude chains split at the DAC
  ``Kx`` spectral boundary (X2/X3), per-block EOB (arithmetic
  coding has no Huffman-style cross-block EOB runs).
- Progressive (G.2): DC-first diffs at ``Al`` precision, DC
  refinement as one fixed-bin raw decision per block, AC-first over
  the spectral band, AC refinement with the previous-stage EOB
  index ``kex`` gating the per-k EOB decision and correction bits
  on the ``3(k-1)+2`` bins.

Statistics areas reset at every scan start and every restart marker
(F.1.4.4.1.4), as do DC predictors and conditioning contexts; the
entropy byte layer shares the Huffman path's segment treatment
(0xFF00 de-stuffing, RSTn splits, any other marker ends the scan
and the decoder then feeds zero bytes, per D.2.7).

Like the rest of the in-repo codec family, the per-block Python
loops are sized for fixture-scale payloads inside ``mapInPandas``
Arrow batches — a production deployment registers a native codec
via ``multimodal.register_codec`` for bulk media; what must be
exact here is the SEMANTICS, pinned by roundtrips against the
shared DCT plumbing (arithmetic and Huffman encodes of the same
coefficients must decode to identical pixels).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

# --------------------------------------------------- Table D.3 (QM)
#: (Qe, NMPS, NLPS, SWITCH) per state; index 113 is the conventional
#: non-adapting ~equiprobable state for fixed decisions (AC signs,
#: DC refinement bits) — NMPS == NLPS == 113, SWITCH 0, so the
#: estimation step is a no-op on it by construction.
_QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

#: index of the non-adapting state above
_FIXED_STATE = 113

# statistics-area sizes (F.1.4.4.1.3 / F.1.4.4.2.1): DC uses bins
# 0..19 (contexts) + 20..33 (X1 chain) + 34..48 (mantissae) — 64 is
# the conventional rounded allocation; AC uses 3*(k-1) strides up to
# 186, the X2/X3 chains at 189/217 and their mantissae up to 244.
_DC_BINS = 64
_AC_BINS = 256

# conditioning defaults when no DAC segment redefines them (B.2.4.3)
_DEFAULT_DC_COND = (0, 1)  # (L, U)
_DEFAULT_AC_KX = 5


class _QMDecoder:
    """Annex D.2 QM decoder over one (de-stuffed) entropy segment.

    The C register keeps ``ct`` look-ahead bits low so comparisons
    against the interval happen at ``A' << ct`` — the same lazy
    alignment the spec's software conventions permit (D.2: any
    register arrangement reproducing the flowchart arithmetic).
    Past the segment end it feeds zero bytes (D.2.7: a marker
    terminates the entropy data and decoding continues on zeros
    until the scan's units are complete)."""

    __slots__ = ("_d", "_p", "a", "c", "ct")

    def __init__(self, data: bytes):
        self._d = data
        self._p = 0
        # INITDEC: prime the code register with the first two bytes
        self.c = (self._next() << 8) | self._next()
        self.ct = 0
        self.a = 0x10000

    def _next(self) -> int:
        if self._p < len(self._d):
            b = self._d[self._p]
            self._p += 1
            return b
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        # registers cached in locals and RENORMD inlined (r13 §4.2:
        # ~1M decode() calls per 150 sf0.1 arith images — attribute
        # round-trips and the renorm call were half the kernel);
        # flowchart arithmetic unchanged, bit-identical
        sv = st[i]
        qe, nmps, nlps, sw = _QM_TABLE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        c = self.c
        ct = self.ct
        if c >= (a << ct):
            # code point in the TOP subinterval (size Qe)
            c -= a << ct
            if a < qe:  # conditional exchange: top decodes MPS
                d = mps
                st[i] = (sv & 0x80) | nmps
            else:
                d = mps ^ 1
                st[i] = ((mps ^ sw) << 7) | nlps
            a = qe
        elif a < 0x8000:
            # bottom subinterval, renormalization due → exchange test
            if a < qe:
                d = mps ^ 1
                st[i] = ((mps ^ sw) << 7) | nlps
            else:
                d = mps
                st[i] = (sv & 0x80) | nmps
        else:
            self.a = a
            return mps
        while a < 0x8000:  # RENORMD
            if ct == 0:
                c = (c << 8) | self._next()
                ct = 8
            a <<= 1
            ct -= 1
        self.a, self.c, self.ct = a, c, ct
        return d

    def _renorm(self) -> None:
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c = (c << 8) | self._next()
                ct = 8
            a <<= 1
            ct -= 1
        self.a, self.c, self.ct = a, c, ct


class _QMEncoder:
    """Annex D.1 QM encoder (CODE / RENORME / BYTEOUT / FLUSH).

    Carry is resolved by propagating into the buffered bytes (it
    terminates at the first non-0xFF byte), and the D.1.6 0xFF00
    stuffing is applied as a final pass over the resolved buffer —
    byte-for-byte the stream an emit-as-you-go stuffer produces,
    because stuffing is a pure function of the resolved bytes."""

    __slots__ = ("a", "c", "ct", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()

    def encode(self, st: bytearray, i: int, d: int) -> None:
        # registers in locals, RENORME inlined (r13 §4.2 — same
        # treatment as _QMDecoder.decode; flowchart arithmetic
        # unchanged, byte-identical output)
        sv = st[i]
        qe, nmps, nlps, sw = _QM_TABLE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if d == mps:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes top
                self.c += a
                a = qe
            st[i] = (sv & 0x80) | nmps
        else:
            if a >= qe:  # normal LPS: top subinterval, size Qe
                self.c += a
                a = qe
            # else exchange: LPS keeps the bottom (C unchanged)
            st[i] = ((mps ^ sw) << 7) | nlps
        c = self.c
        ct = self.ct
        while a < 0x8000:  # RENORME
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.c = c
                self._byteout()
                c = self.c
                ct = 8
        self.a, self.c, self.ct = a, c, ct

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            j = len(self.out) - 1
            while j >= 0:
                self.out[j] = (self.out[j] + 1) & 0xFF
                if self.out[j]:
                    break
                j -= 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        # CLEARBITS (D.1.8): largest low-zeros point inside [C, C+A)
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t if t >= self.c else t + 0x8000
        # drain: align the pending bits, then two byteouts empty the
        # register (CLEARBITS zeroed everything below bit 15)
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


# ------------------------------------------------ statistical models


class _ScanStats:
    """Per-scan statistics areas + DC conditioning state, reset at
    scan start and every restart marker (F.1.4.4.1.4)."""

    def __init__(self, scan_comps):
        # scan_comps: list of (cid, dc_tbl, ac_tbl)
        self.dc = {td: bytearray(_DC_BINS) for _, td, _ in scan_comps}
        self.ac = {ta: bytearray(_AC_BINS) for _, _, ta in scan_comps}
        self.fixed = bytearray([_FIXED_STATE])
        self.pred = {cid: 0 for cid, _, _ in scan_comps}
        self.ctx = {cid: 0 for cid, _, _ in scan_comps}


def _dc_class(m: int, sign: int, lo: int, up: int) -> int:
    """F.1.4.4.1.2: conditioning category of a nonzero diff whose
    magnitude category is ``m`` — 0 (near-zero), 4/8 (±small),
    12/16 (±large)."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + 4 * sign
    return 4 + 4 * sign


def _dec_dc_diff(dec, dc, ctx, lo, up):
    """Figures F.19/F.21-F.24 for one DC difference; returns
    (diff, next_context)."""
    b = ctx
    if dec.decode(dc, b) == 0:
        return 0, 0
    sign = dec.decode(dc, b + 1)
    if dec.decode(dc, b + 2 + sign) == 0:
        m = 0
        n = 0
    else:
        m = 1
        s = 20  # X1
        while dec.decode(dc, s):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG DC magnitude overflow")
            s += 1
        n = m
        mant = s + 14
        bit = m >> 1
        while bit:
            if dec.decode(dc, mant):
                n |= bit
            bit >>= 1
    v = n + 1
    return (-v if sign else v), _dc_class(m, sign, lo, up)


def _enc_dc_diff(enc, dc, ctx, diff, lo, up) -> int:
    """Encoder mirror of :func:`_dec_dc_diff`; returns the next
    conditioning context."""
    b = ctx
    if diff == 0:
        enc.encode(dc, b, 0)
        return 0
    enc.encode(dc, b, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dc, b + 1, sign)
    n = (-diff if sign else diff) - 1
    if n == 0:
        enc.encode(dc, b + 2 + sign, 0)
        m = 0
    else:
        enc.encode(dc, b + 2 + sign, 1)
        m = 1
        s = 20
        while n >= (m << 1):
            enc.encode(dc, s, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC diff exceeds the T.81 magnitude cap")
            s += 1
        enc.encode(dc, s, 0)
        mant = s + 14
        bit = m >> 1
        while bit:
            enc.encode(dc, mant, 1 if n & bit else 0)
            bit >>= 1
    return _dc_class(m, sign, lo, up)


def _dec_ac_mag(dec, ac, b2, xb):
    """Figures F.21/F.23/F.24 magnitude for one AC coefficient:
    decisions (n>=1) and (n>=2) on the ``3(k-1)+2`` bin, the rest of
    the category chain on the X2/X3 bins; returns n = |v| - 1."""
    if dec.decode(ac, b2) == 0:
        return 0
    if dec.decode(ac, b2) == 0:
        m = 1
        mant = b2 + 14
    else:
        m = 2
        s = xb
        while dec.decode(ac, s):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG AC magnitude overflow")
            s += 1
        mant = s + 14
    n = m
    bit = m >> 1
    while bit:
        if dec.decode(ac, mant):
            n |= bit
        bit >>= 1
    return n


def _enc_ac_mag(enc, ac, b2, xb, n) -> None:
    """Encoder mirror of :func:`_dec_ac_mag` (n = |v| - 1 >= 0)."""
    if n == 0:
        enc.encode(ac, b2, 0)
        return
    enc.encode(ac, b2, 1)
    if n == 1:
        enc.encode(ac, b2, 0)
        return  # category m=1 has no mantissa bits
    enc.encode(ac, b2, 1)
    m = 2
    s = xb
    while n >= (m << 1):
        enc.encode(ac, s, 1)
        m <<= 1
        if m == 0x8000:
            raise ValueError("AC value exceeds the T.81 magnitude cap")
        s += 1
    enc.encode(ac, s, 0)
    mant = s + 14
    bit = m >> 1
    while bit:
        enc.encode(ac, mant, 1 if n & bit else 0)
        bit >>= 1


def _dec_ac_band(dec, stats, ac, blk, ss, se, al, kx) -> None:
    """F.20 / G.2 AC decode of one block over the [ss, se] band into
    ``blk`` (zigzag-indexed), values scaled by ``1 << al``."""
    k = ss
    while k <= se:
        b = 3 * (k - 1)
        if dec.decode(ac, b):
            return  # EOB
        while dec.decode(ac, b + 1) == 0:
            b += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic JPEG AC run past Se")
        sign = dec.decode(stats.fixed, 0)
        xb = 189 if k <= kx else 217
        v = _dec_ac_mag(dec, ac, b + 2, xb) + 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _enc_ac_band(enc, stats, ac, vals, ss, se, kx) -> None:
    """Encoder mirror of :func:`_dec_ac_band` over pre-scaled
    ``vals`` (zigzag-indexed ints at the scan's Al precision)."""
    k = ss
    while k <= se:
        knz = next((j for j in range(k, se + 1) if vals[j]), None)
        b = 3 * (k - 1)
        if knz is None:
            enc.encode(ac, b, 1)  # EOB
            return
        enc.encode(ac, b, 0)
        while k < knz:
            enc.encode(ac, b + 1, 0)
            b += 3
            k += 1
        enc.encode(ac, b + 1, 1)
        v = vals[k]
        enc.encode(stats.fixed, 0, 1 if v < 0 else 0)
        xb = 189 if k <= kx else 217
        _enc_ac_mag(enc, ac, b + 2, xb, abs(v) - 1)
        k += 1


def _dec_ac_refine(dec, stats, ac, blk, ss, se, al) -> None:
    """G.2 AC refinement of one block: the previous-stage EOB index
    gates the per-k EOB decision; already-nonzero coefficients take
    one correction bit on the ``+2`` bin, newly-nonzero ones a
    significance decision on ``+1`` plus a fixed-bin sign."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        b = 3 * (k - 1)
        if k > kex and dec.decode(ac, b):
            return  # EOB
        while True:
            if blk[k]:
                if dec.decode(ac, b + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(ac, b + 1):
                blk[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            b += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic JPEG refinement past Se")
        k += 1


def _enc_ac_refine(enc, stats, ac, prev, cur, ss, se) -> None:
    """Encoder mirror of :func:`_dec_ac_refine`: ``prev`` holds the
    coefficients at the previous precision (Ah), ``cur`` at this
    scan's (Al) — both zigzag-indexed signed ints."""
    kex = se
    while kex > 0 and prev[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        b = 3 * (k - 1)
        if k > kex:
            if not any(cur[j] for j in range(k, se + 1)):
                enc.encode(ac, b, 1)  # EOB
                return
            enc.encode(ac, b, 0)
        while True:
            if prev[k]:
                enc.encode(ac, b + 2, abs(cur[k]) & 1)
                break
            if cur[k]:
                enc.encode(ac, b + 1, 1)
                enc.encode(stats.fixed, 0, 1 if cur[k] < 0 else 0)
                break
            enc.encode(ac, b + 1, 0)
            b += 3
            k += 1
        k += 1


# ------------------------------------------------------------ decode


def decode_jpeg_arith(payload: bytes) -> "np.ndarray":
    """Decode an arithmetic-coded JPEG (SOF9 extended sequential or
    SOF10 progressive, 8- or 12-bit) to (h, w, 3) uint8 — the
    arithmetic siblings of the Huffman processes decode_jpeg covers,
    sharing its geometry rules (interleaved MCU grids from the
    frame's hmax/vmax, T.81 A.2.2 ceil(dim/8) grids for
    single-component scans), restart handling (stats + predictors +
    conditioning contexts reset, fresh INITDEC per segment), its
    coefficient-store design (dequantize + batched IDCT once at
    EOI), and its truncation contract (missing EOI or undecoded
    components raise ValueError). DAC segments set the DC (L, U)
    conditioning bounds and the AC Kx spectral split; defaults per
    B.2.4.3. Differential-hierarchy and lossless-arithmetic frames
    stay on the codec plug-in chain."""
    from .multimodal import _ZIGZAG, _dct_matrix

    if not payload or payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_kx: dict[int, int] = {}
    sof = None
    progressive = False
    frame_prec = 8
    restart = 0
    coefs: dict[int, np.ndarray] | None = None
    decoded: set[int] = set()
    saw_eoi = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            saw_eoi = True
            break
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        data = payload[pos + 4:pos + 2 + ln]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(data):
                if data[i] >> 4:  # Pq=1 (12-bit frames)
                    qt[data[i] & 15] = np.frombuffer(
                        data[i + 1:i + 129], ">u2"
                    ).astype(np.int64)
                    i += 129
                else:
                    qt[data[i] & 15] = np.frombuffer(
                        data[i + 1:i + 65], np.uint8
                    ).astype(np.int64)
                    i += 65
        elif m == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(data):
                tc, tb = data[i] >> 4, data[i] & 15
                val = data[i + 1]
                if tc == 0:
                    lo, up = val & 15, val >> 4
                    if lo > up:
                        raise ValueError("DAC DC conditioning L > U")
                    dc_cond[tb] = (lo, up)
                else:
                    if not 1 <= val <= 63:
                        raise ValueError("DAC AC Kx out of range")
                    ac_kx[tb] = val
                i += 2
        elif m in (0xC9, 0xCA):  # SOF9 / SOF10
            frame_prec, ih, iw, nc = struct.unpack(">BHHB", data[:6])
            if frame_prec not in (8, 12):
                raise NotImplementedError(
                    f"{frame_prec}-bit JPEG needs the codec plug-in"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = data[6 + 3 * ci:9 + 3 * ci]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                    raise ValueError(
                        "JPEG sampling factors out of range"
                    )
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
            progressive = m == 0xCA
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ih, iw, comps = sof
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mx, my = -(-iw // (8 * hmax)), -(-ih // (8 * vmax))
            if coefs is None:
                coefs = {
                    cid: np.zeros((my * v, mx * hh, 64), np.int32)
                    for cid, hh, v, _ in comps
                }
            ns = data[0]
            scan = [(data[1 + 2 * i], data[2 + 2 * i] >> 4,
                     data[2 + 2 * i] & 15) for i in range(ns)]
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            ah, al = data[3 + 2 * ns] >> 4, data[3 + 2 * ns] & 15
            cmap = {cid: (hh, v, tq) for cid, hh, v, tq in comps}
            for cid, _, _ in scan:
                if cid not in cmap:
                    raise ValueError(
                        "JPEG scan references unknown component"
                    )
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError(
                    "sequential arithmetic scan with progressive "
                    "spectral parameters"
                )
            if progressive:
                # T.81 G.1.1.1.1: a DC scan (Ss=0) MUST have Se=0;
                # an AC scan needs 1 <= Ss <= Se <= 63. Reject the
                # malformed stream loudly instead of quietly reading
                # a DC-only scan out of it (ADVICE r8).
                if ss == 0 and se != 0:
                    raise ValueError(
                        "progressive DC scan requires Se=0 (T.81 G.1)"
                    )
                if ss > 0 and not ss <= se <= 63:
                    raise ValueError(
                        "progressive AC scan needs 1 <= Ss <= Se <= 63"
                    )
            # de-stuff THIS scan's entropy bytes, split at RSTn —
            # identical treatment to the Huffman path (D.2.7: a
            # marker ends the entropy data; RSTn resets everything)
            segments, cur = [], bytearray()
            i = pos + 2 + ln
            while i < len(payload):
                b = payload[i]
                if b == 0xFF:
                    nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn
                        segments.append(bytes(cur))
                        cur = bytearray()
                        i += 2
                        continue
                    break
                cur.append(b)
                i += 1
            segments.append(bytes(cur))

            stats = _ScanStats(scan)
            dec = _QMDecoder(segments[0])
            seg_i = 0
            n_unit = 0

            def unit_start():
                nonlocal dec, stats, seg_i, n_unit
                if restart and n_unit and n_unit % restart == 0:
                    seg_i += 1
                    dec = _QMDecoder(
                        segments[seg_i] if seg_i < len(segments)
                        else b""
                    )
                    stats = _ScanStats(scan)
                n_unit += 1

            conds = {
                cid: dc_cond.get(td, _DEFAULT_DC_COND)
                for cid, td, _ in scan
            }
            kxs = {
                cid: ac_kx.get(ta, _DEFAULT_AC_KX)
                for cid, _, ta in scan
            }
            dc_t = {cid: td for cid, td, _ in scan}
            ac_t = {cid: ta for cid, _, ta in scan}

            def grid_dims(cid):
                # T.81 A.2.2: single-component scans run over the
                # component's OWN ceil(dim/8) grid, not the MCU pad
                hh, v, _ = cmap[cid]
                ch = -(-ih * v // vmax)
                cw = -(-iw * hh // hmax)
                return -(-ch // 8), -(-cw // 8)

            def dc_unit(cid, by, bx):
                lo, up = conds[cid]
                diff, ctx = _dec_dc_diff(
                    dec, stats.dc[dc_t[cid]], stats.ctx[cid], lo, up
                )
                stats.pred[cid] += diff
                stats.ctx[cid] = ctx
                coefs[cid][by, bx, 0] = stats.pred[cid] << al

            def seq_block(cid, by, bx):
                dc_unit(cid, by, bx)
                _dec_ac_band(
                    dec, stats, stats.ac[ac_t[cid]],
                    coefs[cid][by, bx], 1, 63, 0, kxs[cid]
                )

            if not progressive:
                if ns == 1:
                    cid = scan[0][0]
                    bh_n, bw_n = grid_dims(cid)
                    for by in range(bh_n):
                        for bx in range(bw_n):
                            unit_start()
                            seq_block(cid, by, bx)
                else:
                    for m_y in range(my):
                        for m_x in range(mx):
                            unit_start()
                            for cid, _, _ in scan:
                                hh, v, _ = cmap[cid]
                                for by in range(v):
                                    for bx in range(hh):
                                        seq_block(
                                            cid, m_y * v + by,
                                            m_x * hh + bx,
                                        )
            elif ss == 0 and ah == 0:  # DC first
                if ns == 1:
                    cid = scan[0][0]
                    bh_n, bw_n = grid_dims(cid)
                    for by in range(bh_n):
                        for bx in range(bw_n):
                            unit_start()
                            dc_unit(cid, by, bx)
                else:
                    for m_y in range(my):
                        for m_x in range(mx):
                            unit_start()
                            for cid, _, _ in scan:
                                hh, v, _ = cmap[cid]
                                for by in range(v):
                                    for bx in range(hh):
                                        dc_unit(
                                            cid, m_y * v + by,
                                            m_x * hh + bx,
                                        )
            elif ss == 0:  # DC refinement: one fixed decision/block
                p1 = 1 << al
                if ns == 1:
                    cid = scan[0][0]
                    bh_n, bw_n = grid_dims(cid)
                    for by in range(bh_n):
                        for bx in range(bw_n):
                            unit_start()
                            if dec.decode(stats.fixed, 0):
                                coefs[cid][by, bx, 0] |= p1
                else:
                    for m_y in range(my):
                        for m_x in range(mx):
                            unit_start()
                            for cid, _, _ in scan:
                                hh, v, _ = cmap[cid]
                                for by in range(v):
                                    for bx in range(hh):
                                        if dec.decode(stats.fixed, 0):
                                            coefs[cid][
                                                m_y * v + by,
                                                m_x * hh + bx, 0,
                                            ] |= p1
            else:  # AC scans are single-component (G.1)
                if ns != 1:
                    raise ValueError(
                        "progressive AC scan with >1 component"
                    )
                cid = scan[0][0]
                bh_n, bw_n = grid_dims(cid)
                ac = stats.ac[ac_t[cid]]
                for by in range(bh_n):
                    for bx in range(bw_n):
                        unit_start()
                        blk = coefs[cid][by, bx]
                        if ah == 0:
                            _dec_ac_band(
                                dec, stats, ac, blk, ss, se, al,
                                kxs[cid],
                            )
                        else:
                            _dec_ac_refine(
                                dec, stats, ac, blk, ss, se, al
                            )
            decoded.update(cid for cid, _, _ in scan)
            pos = i
            continue
        pos = pos + 2 + ln
    if sof is None or coefs is None:
        raise ValueError("missing SOF/SOS in JPEG stream")
    if not saw_eoi:
        t = payload[pos:]
        while len(t) >= 3 and t[0] == 0xFF and t[1] == 0xFF:
            t = t[1:]
        saw_eoi = t[:2] == b"\xff\xd9"
    if not saw_eoi:
        raise ValueError("JPEG stream ended without EOI")
    ih, iw, comps = sof
    if decoded != {cid for cid, *_ in comps}:
        raise ValueError(
            "JPEG stream ended before all components were decoded"
        )
    # dequantize + batched IDCT per component (same epilogue design
    # as decode_jpeg's progressive path)
    C = _dct_matrix()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hh, v, tq in comps:
        if tq not in qt:
            raise ValueError(
                "JPEG component references undefined quantization table"
            )
        zz = coefs[cid].astype(np.int64) * qt[tq][None, None, :]
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz
        bh_, bw_ = nat.shape[:2]
        f = nat.reshape(bh_ * bw_, 8, 8).astype(np.float64)
        px = np.einsum("ij,njk,kl->nil", C.T, f, C) + float(
            1 << (frame_prec - 1)
        )
        planes[cid] = (
            px.reshape(bh_, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ * 8, bw_ * 8)
        )
    full = {}
    for cid, hh, v, _ in comps:
        if hmax % hh or vmax % v:
            raise NotImplementedError(
                "fractional JPEG sampling ratios need the codec plug-in"
            )
        p = np.repeat(
            np.repeat(planes[cid], vmax // v, axis=0),
            hmax // hh, axis=1,
        )
        full[cid] = p[:ih, :iw] / float(1 << (frame_prec - 8))
    if len(comps) == 1:
        g = np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError("CMYK/unknown JPEG needs the plug-in")
    yy = full[comps[0][0]]
    cb = full[comps[1][0]] - 128.0
    cr = full[comps[2][0]] - 128.0
    rgb = np.stack(
        [yy + 1.402 * cr,
         yy - 0.344136 * cb - 0.714136 * cr,
         yy + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ encode


def encode_jpeg_arith(
    arr: "np.ndarray",
    quality: int = 85,
    subsample: int = 1,
    restart_interval: int = 0,
    progressive: bool = False,
    depth: int = 8,
    dc_cond: tuple[int, int] = _DEFAULT_DC_COND,
    ac_kx: int = _DEFAULT_AC_KX,
) -> bytes:
    """Arithmetic-coded JPEG encoder (SOF9, or SOF10 with
    ``progressive=True``) — the fixture/roundtrip twin of
    :func:`decode_jpeg_arith`, sharing encode_jpeg's color/DCT/
    quantization plumbing exactly so an arithmetic and a Huffman
    encode of the same image carry IDENTICAL coefficients (the
    cross-entropy-coder pixel-equality test rests on that). Emits a
    DAC segment spelling out the conditioning even at the default
    values, so the decoder's DAC parse is always exercised.
    ``progressive=True`` mirrors the Huffman twin's Annex G script:
    interleaved DC first (Al=1), per-component AC first (1..63,
    Al=1), per-component AC refinement (Ah=1), DC refinement.
    ``restart_interval`` is sequential-only, like the twin."""
    from .multimodal import (
        _QUANT_CHROM,
        _QUANT_LUM,
        _ZIGZAG,
        _dct_matrix,
        _ijg_scale,
    )

    if depth not in (8, 12):
        raise ValueError("depth must be 8 or 12")
    if restart_interval and progressive:
        raise ValueError(
            "restart markers unsupported with progressive scans"
        )
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("DC conditioning needs 0 <= L <= U <= 15")
    if not 1 <= ac_kx <= 63:
        raise ValueError("AC conditioning Kx must be in 1..63")
    gray = arr.ndim == 2
    if gray:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(
            "encode_jpeg_arith expects (h, w, 3) or (h, w) uint8"
        )
    if subsample not in (1, 2) or (gray and subsample != 1):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    h, w, _ = arr.shape
    rgb = arr.astype(np.float64)
    y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
         + 0.114 * rgb[..., 2])
    cb = (128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
          + 0.5 * rgb[..., 2])
    cr = (128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
          - 0.081312 * rgb[..., 2])
    s = subsample
    mcu = 8 * s
    mx, my = -(-w // mcu), -(-h // mcu)

    def pad(p, hh, ww):
        return np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                      mode="edge")

    y = pad(y, my * mcu, mx * mcu)
    if s == 2:
        cb = pad(cb, my * mcu, mx * mcu)
        cr = pad(cr, my * mcu, mx * mcu)
        cb = cb.reshape(my * 8, 2, mx * 8, 2).mean(axis=(1, 3))
        cr = cr.reshape(my * 8, 2, mx * 8, 2).mean(axis=(1, 3))
    else:
        cb, cr = pad(cb, my * 8, mx * 8), pad(cr, my * 8, mx * 8)

    qlum = _ijg_scale(_QUANT_LUM, quality)
    qchrom = _ijg_scale(_QUANT_CHROM, quality)
    if depth == 12:
        y, cb, cr = y * 16.0, cb * 16.0, cr * 16.0
        qlum = qlum * 16
        qchrom = qchrom * 16
    level = float(1 << (depth - 1))
    C = _dct_matrix()

    def block_coefs(plane, t):
        qd = (qlum if t == 0 else qchrom).reshape(8, 8).astype(
            np.float64
        )
        hh_, ww_ = plane.shape
        nby, nbx = hh_ // 8, ww_ // 8
        out = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = plane[by * 8:by * 8 + 8,
                              bx * 8:bx * 8 + 8] - level
                fq = np.round((C @ block @ C.T) / qd).astype(np.int64)
                out[by, bx] = fq.reshape(64)[_ZIGZAG]
        return out

    if gray:
        planes = [(1, 0, 0, block_coefs(y, 0), 1)]
    else:
        planes = [
            (1, 0, 0, block_coefs(y, 0), s),
            (2, 1, 1, block_coefs(cb, 1), 1),
            (3, 1, 1, block_coefs(cr, 1), 1),
        ]
    scan_all = [(cid, td, ta) for cid, td, ta, _, _ in planes]

    def comp_grid_dims(f_):
        cw_ = -(-w * f_ // s)
        ch_ = -(-h * f_ // s)
        return -(-ch_ // 8), -(-cw_ // 8)

    def dc_encode(enc, stats, cid, td, dc_val):
        diff = dc_val - stats.pred[cid]
        stats.pred[cid] = dc_val
        stats.ctx[cid] = _enc_dc_diff(
            enc, stats.dc[td], stats.ctx[cid], diff, lo, up
        )

    scans: list[tuple[bytes, bytes]] = []
    if not progressive:
        enc = _QMEncoder()
        stats = _ScanStats(scan_all)
        blob = b""
        n_mcu, rst = 0, 0
        if gray:
            units = [
                [(1, 0, 0, by, bx)]
                for by in range(comp_grid_dims(1)[0])
                for bx in range(comp_grid_dims(1)[1])
            ]
        else:
            units = []
            for m_y in range(my):
                for m_x in range(mx):
                    u = []
                    for cid, td, ta, _, f_ in planes:
                        for byy in range(f_):
                            for bxx in range(f_):
                                u.append((cid, td, ta,
                                          m_y * f_ + byy,
                                          m_x * f_ + bxx))
                    units.append(u)
        grids = {cid: g for cid, _, _, g, _ in planes}
        for u in units:
            if restart_interval and n_mcu and (
                n_mcu % restart_interval == 0
            ):
                blob += enc.flush() + bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                enc = _QMEncoder()
                stats = _ScanStats(scan_all)
            n_mcu += 1
            for cid, td, ta, by, bx in u:
                blk = grids[cid][by, bx]
                dc_encode(enc, stats, cid, td, int(blk[0]))
                vals = [int(blk[k]) for k in range(64)]
                _enc_ac_band(enc, stats, stats.ac[ta], vals, 1, 63,
                             ac_kx)
        blob += enc.flush()
        ns_hdr = bytes([len(scan_all)]) + b"".join(
            bytes([cid, (td << 4) | ta]) for cid, td, ta in scan_all
        )
        scans.append((ns_hdr + bytes([0, 63, 0x00]), blob))
    else:
        # --- Annex G script, arithmetic edition ---
        grids = {cid: g for cid, _, _, g, _ in planes}
        factors = {cid: f_ for cid, _, _, _, f_ in planes}
        # scan 1: DC first, interleaved, Al=1
        enc = _QMEncoder()
        stats = _ScanStats(scan_all)
        for m_y in range(my):
            for m_x in range(mx):
                for cid, td, ta, _, f_ in planes:
                    for byy in range(f_):
                        for bxx in range(f_):
                            dc = int(
                                grids[cid][m_y * f_ + byy,
                                           m_x * f_ + bxx, 0]
                            ) >> 1
                            dc_encode(enc, stats, cid, td, dc)
        ns_hdr = bytes([len(scan_all)]) + b"".join(
            bytes([cid, (td << 4) | ta]) for cid, td, ta in scan_all
        )
        scans.append((ns_hdr + bytes([0, 0, 0x01]), enc.flush()))
        # scans 2..: per-comp AC first (Ss=1 Se=63 Ah=0 Al=1)
        for cid, td, ta, grid, f_ in planes:
            enc = _QMEncoder()
            stats = _ScanStats([(cid, td, ta)])
            nby, nbx = comp_grid_dims(f_)
            for by in range(nby):
                for bx in range(nbx):
                    blk = grid[by, bx]
                    vals = [0] * 64
                    for k in range(1, 64):
                        v = int(blk[k])
                        av = abs(v) >> 1  # Al=1, trunc toward zero
                        vals[k] = -av if v < 0 else av
                    _enc_ac_band(enc, stats, stats.ac[ta], vals,
                                 1, 63, ac_kx)
            scans.append((
                bytes([1, cid, (td << 4) | ta, 1, 63, 0x01]),
                enc.flush(),
            ))
        # per-comp AC refinement (Ah=1 -> Al=0)
        for cid, td, ta, grid, f_ in planes:
            enc = _QMEncoder()
            stats = _ScanStats([(cid, td, ta)])
            nby, nbx = comp_grid_dims(f_)
            for by in range(nby):
                for bx in range(nbx):
                    blk = grid[by, bx]
                    prev = [0] * 64
                    curv = [0] * 64
                    for k in range(1, 64):
                        v = int(blk[k])
                        av = abs(v)
                        prev[k] = (-(av >> 1)) if v < 0 else (av >> 1)
                        curv[k] = v
                    _enc_ac_refine(enc, stats, stats.ac[ta],
                                   prev, curv, 1, 63)
            scans.append((
                bytes([1, cid, (td << 4) | ta, 1, 63, 0x10]),
                enc.flush(),
            ))
        # final: DC refinement — one fixed-bin decision per block
        enc = _QMEncoder()
        stats = _ScanStats(scan_all)
        for m_y in range(my):
            for m_x in range(mx):
                for cid, _, _, _, f_ in planes:
                    for byy in range(f_):
                        for bxx in range(f_):
                            enc.encode(
                                stats.fixed, 0,
                                int(grids[cid][m_y * f_ + byy,
                                               m_x * f_ + bxx, 0]) & 1,
                            )
        scans.append((ns_hdr + bytes([0, 0, 0x10]), enc.flush()))

    def seg(marker, payload_):
        return marker + struct.pack(">H", len(payload_) + 2) + payload_

    def dqt(tid, tbl):
        zz = tbl[_ZIGZAG]
        if int(zz.max()) > 255:
            return bytes([0x10 | tid]) + zz.astype(">u2").tobytes()
        return bytes([tid]) + bytes(zz.tolist())

    sof_marker = b"\xff\xca" if progressive else b"\xff\xc9"
    out = b"\xff\xd8"
    out += seg(b"\xff\xe0",
               b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(b"\xff\xdb", dqt(0, qlum))
    dac = bytes([0x00, (up << 4) | lo, 0x10, ac_kx])
    if gray:
        out += seg(b"\xff\xcc", dac)
        out += seg(
            sof_marker,
            struct.pack(">BHHB", depth, h, w, 1) + bytes([1, 0x11, 0]),
        )
        if restart_interval:
            out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))
        for hdr, blob in scans:
            out += seg(b"\xff\xda", hdr) + blob
        return out + b"\xff\xd9"
    out += seg(b"\xff\xdb", dqt(1, qchrom))
    out += seg(b"\xff\xcc",
               dac + bytes([0x01, (up << 4) | lo, 0x11, ac_kx]))
    out += seg(
        sof_marker,
        struct.pack(">BHHB", depth, h, w, 3)
        + bytes([1, s << 4 | s, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))
    for hdr, blob in scans:
        out += seg(b"\xff\xda", hdr) + blob
    return out + b"\xff\xd9"


# ------------------------------------------------- Spark fixture flow


def arith_assets_from_documents(docs, stride: int = 1) -> "object":
    """Build REAL arithmetic-coded JPEG payloads from ``documents``:
    every doc becomes an image whose pixels tile the utf-8 text bytes
    (the same content-derived geometry real_assets_from_documents
    uses), with the dialect cycling by doc_id through the full SOF9/
    SOF10 matrix — sequential 4:4:4 / 4:2:0, restart intervals,
    progressive, 12-bit, non-default DAC conditioning, and grayscale
    — so no arithmetic decode path exists only in unit tests. One
    mapInPandas encode pass, no shuffle (payload bytes never leave
    the task); the registry entry ``multimodal_decode_arith`` runs
    the real decode + feature pass over these.

    ``stride`` lets a caller feed every stride-th doc while KEEPING
    the full 8-dialect cycle (the selector divides doc_id by the
    stride first) — the registry entry uses stride=4 because the QM
    decode is per-bit Python and the entry's purpose is external
    dialect lineage, not bulk throughput (that is plug-in-codec
    territory, same story as phash_neardup)."""
    import pandas as pd

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads, modalities = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(
                    (text or " ").encode("utf-8"), dtype=np.uint8
                )
                w = 16 + len(raw) % 17
                h = 16 + (len(raw) * 7) % 13
                px = np.resize(raw, (h, w, 3))
                d = int(doc_id) // int(stride)
                sel = d % 8
                if sel == 0:
                    payloads.append(encode_jpeg_arith(px, quality=95))
                elif sel == 1:
                    payloads.append(
                        encode_jpeg_arith(px, quality=95, subsample=2)
                    )
                elif sel == 2:
                    payloads.append(encode_jpeg_arith(
                        px, quality=95,
                        restart_interval=1 + (d // 8) % 3,
                    ))
                elif sel == 3:
                    payloads.append(
                        encode_jpeg_arith(px, quality=95,
                                          progressive=True)
                    )
                elif sel == 4:
                    payloads.append(
                        encode_jpeg_arith(px, quality=95, depth=12)
                    )
                elif sel == 5:
                    payloads.append(encode_jpeg_arith(
                        px, quality=95, progressive=True, subsample=2,
                    ))
                elif sel == 6:
                    lo = (d // 8) % 3
                    payloads.append(encode_jpeg_arith(
                        px, quality=95,
                        dc_cond=(lo, lo + 1 + (d // 8) % 4),
                        ac_kx=1 + (d // 8) % 63,
                    ))
                else:
                    payloads.append(
                        encode_jpeg_arith(px[:, :, 0], quality=95)
                    )
                modalities.append("image")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": modalities,
                    "payload": payloads,
                }
            )

    # same parallelism note as real_assets_from_documents: the encode
    # pass is CPU-bound Python and a toy-scale documents table
    # arrives as 1-2 parquet files — repartition to the session's
    # shuffle parallelism (shuffles only (doc_id, text); layout no-op
    # at production scale where the input already has many splits)
    return (
        docs.select("doc_id", "text")
        .repartition(
            int(
                docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        )
        .mapInPandas(
            enc,
            schema="asset_id long, modality string, payload binary",
        )
    )
