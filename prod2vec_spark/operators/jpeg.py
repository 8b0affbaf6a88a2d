"""Baseline JPEG (ITU-T T.81) codec, stdlib-only, for the MJPEG
(JPEG-in-AVI) video plane.

ENGINE scope beyond the reference (reference media anchor:
`/root/reference/Img/` ships static images only): round-11 adds a
compressed-video baseline so the AVI decoder is no longer limited to
uncompressed BGR24.  Grayscale is the contract — the whole video
plane (keyframe dHash, frame sampling, span pairs) runs on 8-bit
luma, and a JPEG's Y component IS BT.601 luma, so the decoder
entropy-decodes every component but only reconstructs Y (chroma
IDCTs are skipped: exact for our purposes, ~3x cheaper on 4:4:4).

Supported: baseline + extended-sequential DCT (SOF0/SOF1), 8-bit,
any component layout/subsampling for *decode* (Y plane out), restart
markers, 16-bit DQT entries — and, round-13, progressive DCT (SOF2):
spectral selection + successive approximation per T.81 Annex G
(coefficients accumulate across scans; chroma-ONLY scans are skipped
without entropy decode — scans are marker-delimited).  Rejected
loudly (never mis-decoded): lossless, arithmetic coding, hierarchical,
12-bit precision — the same explicit-rejection contract as interlaced
PNG in multimodal.py.

Encode: single-component grayscale (the fixture/write half of the
codec boundary) or 3-component 4:4:4 YCbCr with neutral chroma
(exercises the multi-component MCU interleave in tests), as baseline
(``encode_jpeg_gray``) or as a 6-scan progressive script
(``encode_jpeg_gray_progressive``) delivering IDENTICAL quantized
coefficients — so progressive and baseline encodings of the same
pixels decode bit-identically, the property the tests lock.  Standard
Annex-K quantization + Huffman tables, IJG quality scaling.

numpy (when importable) vectorizes the 8x8 DCT/IDCT; the pure-Python
path uses the same separable basis-matrix formulation and stays
correct without it (parity is tolerance-tested: float summation
order differs between BLAS and the scalar loops).

Scale notes: this codec runs inside the existing Arrow-batched
``mapInPandas`` media stages (multimodal.py) — per-blob Python is
the declared slow path there, batched through Arrow; nothing here
adds driver-side work or a shuffle.
"""

from __future__ import annotations

import math
import struct

try:  # optional accelerator, same pattern as multimodal.py
    import numpy as _np
except Exception:  # pragma: no cover
    _np = None

# ----------------------------------------------------------- tables
# Annex K.1 luminance quantization table (raster order).
_STD_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag[i] = raster index of the i-th coefficient in zigzag order
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 "typical" luminance Huffman tables.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal DCT-II basis: M[k][n] = c(k)/2 * cos((2n+1)kπ/16);
# forward D = M·B·Mᵀ, inverse B = Mᵀ·D·M.
_BASIS = [
    [
        (math.sqrt(0.5) if k == 0 else 1.0)
        / 2.0
        * math.cos((2 * n + 1) * k * math.pi / 16.0)
        for n in range(8)
    ]
    for k in range(8)
]
_BASIS_NP = _np.array(_BASIS) if _np is not None else None


def _quality_table(quality: int) -> list[int]:
    """IJG quality scaling of the Annex-K luminance table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in _STD_QUANT]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)


def _magnitude_category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing; flush pads
    with 1-bits (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self._acc &= (1 << self._n) - 1
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


# ------------------------------------------------------------ encode
def _fdct_quant_block(px: list[int], qtab: list[int]) -> list[int]:
    """Level-shift, DCT, quantize one raster-order 8x8 block; returns
    64 coefficients in ZIGZAG order."""
    if _np is not None:
        b = _np.asarray(px, dtype=_np.float64).reshape(8, 8) - 128.0
        d = _BASIS_NP @ b @ _BASIS_NP.T
        q = d.reshape(64) / _np.asarray(qtab, dtype=_np.float64)
        q = _np.floor(q + 0.5).astype(_np.int64)  # round half up
        return [int(q[_ZIGZAG[i]]) for i in range(64)]
    shifted = [v - 128.0 for v in px]
    tmp = [[0.0] * 8 for _ in range(8)]  # M·B
    for u in range(8):
        mu = _BASIS[u]
        for x in range(8):
            tmp[u][x] = sum(mu[y] * shifted[y * 8 + x] for y in range(8))
    out = []
    for i in range(64):
        r = _ZIGZAG[i]
        u, v = r // 8, r % 8
        d = sum(tmp[u][x] * _BASIS[v][x] for x in range(8))
        out.append(int(math.floor(d / qtab[r] + 0.5)))
    return out


def _encode_block(bw: _BitWriter, coefs: list[int], pred: int) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = coefs[0]
    diff = dc - pred
    cat = _magnitude_category(diff)
    code, ln = _DC_ENC[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        v = coefs[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = _AC_ENC[0xF0]  # ZRL
            bw.write(zc, zl)
            run -= 16
        cat = _magnitude_category(v)
        ac, al = _AC_ENC[(run << 4) | cat]
        bw.write(ac, al)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        ec, el = _AC_ENC[0x00]  # EOB
        bw.write(ec, el)
    return dc


def _block_at(frame: bytes, width: int, height: int, bx: int, by: int) -> list[int]:
    """Extract the 8x8 block at block coords (bx, by), edge-replicated."""
    out = []
    for dy in range(8):
        y = min(by * 8 + dy, height - 1)
        row = frame[y * width : (y + 1) * width]
        for dx in range(8):
            out.append(row[min(bx * 8 + dx, width - 1)])
    return out


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg_gray(
    frame: bytes,
    width: int,
    height: int,
    quality: int = 90,
    color: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from a top-down 8-bit grayscale buffer.  With
    ``color=True`` emits 3-component 4:4:4 YCbCr with neutral chroma
    (Cb=Cr=128 → all-zero chroma blocks): pixel-identical luma, but
    exercises the interleaved multi-component MCU path in decoders.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience structure real MJPEG streams carry)."""
    if len(frame) != width * height:
        raise ValueError("frame buffer does not match width*height")
    qtab = _quality_table(quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 JFIF 1.01, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zz_q = bytes(qtab[_ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT Pq=0 Tq=0
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # h=v=1, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht_segment(0x00, _DC_BITS, _DC_VALS)  # DC table 0
    out += _dht_segment(0x10, _AC_BITS, _AC_VALS)  # AC table 0
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00)  # DC/AC table 0
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    preds = [0] * ncomp
    zero_block = [0] * 64  # neutral-chroma blocks quantize to all-zero
    mcu_count = 0
    rst = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            mcu_count += 1
            coefs = _fdct_quant_block(_block_at(frame, width, height, bx, by), qtab)
            preds[0] = _encode_block(bw, coefs, preds[0])
            for c in range(1, ncomp):
                preds[c] = _encode_block(bw, zero_block, preds[c])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_magnitude(bw: _BitWriter, v: int, cat: int) -> None:
    """The cat-bit magnitude field of value v (T.81 F.1.2.2.1)."""
    if cat:
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)


def encode_jpeg_gray_progressive(
    frame: bytes,
    width: int,
    height: int,
    quality: int = 90,
    color: bool = False,
) -> bytes:
    """Progressive (SOF2) JPEG from a top-down 8-bit grayscale buffer —
    the test-input half of the round-13 progressive decode support.
    Quantized coefficients are IDENTICAL to ``encode_jpeg_gray`` at the
    same quality, delivered as a 6-scan script (DC first at Al=1 →
    AC 1-5 and 6-63 first at Al=2 → two AC refinements → DC
    refinement), so a conforming decoder reconstructs the EXACT pixels
    of the baseline encoding — the bit-identical-dHash property the
    tests lock.  EOB runs are not accumulated across blocks (each
    block ends with its own EOB, legal and table-compatible with the
    Annex-K AC table, which lacks EOBn>1 symbols).  With ``color=True``
    the DC scans interleave 3 components (neutral chroma, all-zero
    blocks); chroma AC scans are omitted entirely — exercising the
    decoder's chroma-scan-skip path."""
    if len(frame) != width * height:
        raise ValueError("frame buffer does not match width*height")
    qtab = _quality_table(quality)
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    blocks = [
        _fdct_quant_block(_block_at(frame, width, height, bx, by), qtab)
        for by in range(nby)
        for bx in range(nbx)
    ]
    ncomp = 3 if color else 1

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zz_q = bytes(qtab[_ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0x00, _DC_BITS, _DC_VALS)
    out += _dht_segment(0x10, _AC_BITS, _AC_VALS)

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += struct.pack(">BB", cid, 0x00)
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    all_ids = list(range(1, ncomp + 1))

    # ---- scan 1: DC first, Al=1, interleaved over all components
    out += sos_header(all_ids, 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for b in blocks:
        for ci in range(ncomp):
            dc = (b[0] >> 1) if ci == 0 else 0  # chroma blocks are zero
            diff = dc - preds[ci]
            preds[ci] = dc
            cat = _magnitude_category(diff)
            code, ln = _DC_ENC[cat]
            bw.write(code, ln)
            _emit_magnitude(bw, diff, cat)
    bw.flush()
    out += bw.buf

    # ---- scans 2+3: luma AC first passes at Al=2
    for ss, se in ((1, 5), (6, 63)):
        out += sos_header([1], ss, se, 0, 2)
        bw = _BitWriter()
        for b in blocks:
            r = 0
            for k in range(ss, se + 1):
                t2 = (b[k] if b[k] >= 0 else -b[k]) >> 2
                if t2 == 0:
                    r += 1
                    continue
                while r > 15:
                    zc, zl = _AC_ENC[0xF0]
                    bw.write(zc, zl)
                    r -= 16
                cat = t2.bit_length()
                ac, al_ = _AC_ENC[(r << 4) | cat]
                bw.write(ac, al_)
                _emit_magnitude(bw, t2 if b[k] >= 0 else -t2, cat)
                r = 0
            if r:
                ec, el = _AC_ENC[0x00]  # EOB (run of 1)
                bw.write(ec, el)
        bw.flush()
        out += bw.buf

    # ---- scans 4+5: luma AC refinements Al=2->1->0
    for al in (1, 0):
        out += sos_header([1], 1, 63, al + 1, al)
        bw = _BitWriter()
        for b in blocks:
            r = 0
            pending: list[int] = []  # buffered correction bits
            for k in range(1, 64):
                a = b[k] if b[k] >= 0 else -b[k]
                t2 = a >> al
                if t2 == 0:
                    r += 1
                    continue
                # ZRLs are due at ANY nonzero coefficient (jcphuff.c):
                # a history coefficient's correction bit must follow
                # the ZRL covering the zero run before it, or the
                # decoder pairs the bits with the wrong coefficients
                while r > 15:
                    zc, zl = _AC_ENC[0xF0]
                    bw.write(zc, zl)
                    r -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if t2 > 1:  # nonzero history: one correction bit
                    pending.append(t2 & 1)
                    continue
                ac, al_ = _AC_ENC[(r << 4) | 1]
                bw.write(ac, al_)
                bw.write(1 if b[k] >= 0 else 0, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                r = 0
            if r or pending:
                ec, el = _AC_ENC[0x00]
                bw.write(ec, el)
                for bit in pending:
                    bw.write(bit, 1)
        bw.flush()
        out += bw.buf

    # ---- scan 6: DC refinement Al=1->0, interleaved
    out += sos_header(all_ids, 0, 0, 1, 0)
    bw = _BitWriter()
    for b in blocks:
        for ci in range(ncomp):
            bw.write((b[0] & 1) if ci == 0 else 0, 1)
    bw.flush()
    out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------ decode
class _BitReader:
    """MSB-first entropy-segment reader: unstuffs 0xFF00, stops at
    any real marker (exposed via ``marker`` after a ValueError-free
    align), raises on truncation."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data ended at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("JPEG entropy data ended at marker")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # markers are byte-aligned right after the pad bits
            while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
                m = self.data[self.pos + 1]
                if m == 0x00:
                    break
                self.marker = m
                self.pos += 2
                break
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            raise ValueError("expected JPEG restart marker")
        self.marker = None


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ``cat``-bit magnitude to its value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _next_marker_pos(data: bytes, start: int) -> int:
    """Index of the 0xFF of the next REAL marker at or after ``start``:
    skips stuffed 0xFF00 pairs, 0xFF fill bytes, and standalone RSTn
    markers (all legal inside/after an entropy-coded segment).  Used to
    walk past a progressive scan's entropy data — either one we just
    decoded or a chroma-only scan we skip without decoding."""
    i = start
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        nxt = data[i + 1]
        if nxt == 0x00:  # stuffed
            i += 2
        elif nxt == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= nxt <= 0xD7:  # restart marker inside the scan
            i += 2
        else:
            return i
    raise ValueError("truncated JPEG: no marker after scan data")


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _idct_block(zz: list[int], qtab: list[int]):
    """Dequantize a zigzag block and IDCT to an 8x8 of clamped ints."""
    if _np is not None:
        d = _np.zeros(64, dtype=_np.float64)
        for i in range(64):
            d[_ZIGZAG[i]] = zz[i] * qtab[_ZIGZAG[i]]
        b = _BASIS_NP.T @ d.reshape(8, 8) @ _BASIS_NP
        return _np.clip(_np.floor(b + 128.5), 0, 255).astype(_np.uint8)
    d = [0.0] * 64
    for i in range(64):
        d[_ZIGZAG[i]] = zz[i] * qtab[_ZIGZAG[i]]
    tmp = [[0.0] * 8 for _ in range(8)]  # Mᵀ·D
    for y in range(8):
        for v in range(8):
            tmp[y][v] = sum(_BASIS[u][y] * d[u * 8 + v] for u in range(8))
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = sum(tmp[y][v] * _BASIS[v][x] for v in range(8))
            out[y][x] = min(255, max(0, int(math.floor(s + 128.5))))
    return out


def _prog_dc_scan(
    br: "_BitReader",
    scan_comps: list,
    luma_ci: "int | None",
    coefs: list,
    geom: dict,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """One progressive DC scan (T.81 G.2): first pass (Ah=0) Huffman-
    decodes DC/2^Al diffs, refinement (Ah>0) reads ONE raw bit per
    block.  Interleaved (ns>1) walks MCU geometry incl. pad blocks;
    single-component walks the component's own block grid.  Only the
    luma component's coefficients are stored; other components are
    entropy-decoded purely to keep bitstream sync."""
    ns = len(scan_comps)
    preds = [0] * ns
    mcu_count = 0

    def one_block(ci: int, by: int, bx: int) -> None:
        if ah == 0:
            cat = _decode_huff(br, scan_comps[ci][3])
            preds[ci] += _extend(br.receive(cat), cat)
            if ci == luma_ci and by < geom["nby_pad"] and bx < geom["nbx_pad"]:
                coefs[by * geom["nbx_pad"] + bx][0] = preds[ci] << al
        else:
            bit = br.read_bit()
            if bit and ci == luma_ci and by < geom["nby_pad"] and bx < geom["nbx_pad"]:
                coefs[by * geom["nbx_pad"] + bx][0] |= 1 << al

    if ns > 1:
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.restart()
                    preds[:] = [0] * ns
                mcu_count += 1
                for ci, (h, v, _, _, _) in enumerate(scan_comps):
                    for by in range(v):
                        for bx in range(h):
                            one_block(ci, my * v + by, mx * h + bx)
    else:
        # single-component scans reaching here are always luma (chroma-
        # only scans are skipped upstream without entropy decode)
        for by in range(geom["nby_real"]):
            for bx in range(geom["nbx_real"]):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.restart()
                    preds[:] = [0]
                mcu_count += 1
                one_block(0, by, bx)


def _prog_ac_scan(
    br: "_BitReader",
    act: dict,
    coefs: list,
    geom: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """One progressive AC scan over the LUMA component (T.81 G.2:
    AC scans are always single-component / non-interleaved).  First
    pass (Ah=0) decodes coefficients at 2^Al precision with EOB-run
    coding; refinement (Ah>0) appends one magnitude bit to already-
    nonzero coefficients and introduces newly-nonzero ±2^Al values —
    the jdphuff.c two-branch structure."""
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    mcu_count = 0
    for by in range(geom["nby_real"]):
        for bx in range(geom["nbx_real"]):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                eobrun = 0
            mcu_count += 1
            zz = coefs[by * geom["nbx_pad"] + bx]
            if ah == 0:  # -------- first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _decode_huff(br, act)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r != 15:  # EOBn
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    zz[k] = _extend(br.receive(s), s) << al
                    k += 1
            else:  # -------- refinement pass
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _decode_huff(br, act)
                        r, s = sym >> 4, sym & 0x0F
                        val = 0
                        if s == 0:
                            if r != 15:  # EOBn: rest of band is history-refine
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # ZRL: skip 16 zero-history slots below
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid JPEG AC refinement symbol"
                                )
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            if zz[k] != 0:
                                if br.read_bit() and (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0 and br.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


def decode_jpeg_gray(blob: bytes) -> tuple[bytes, int, int]:
    """Decode a baseline/extended-sequential (SOF0/SOF1) OR progressive
    (SOF2, round-13) JPEG to its luma plane: returns (top-down 8-bit
    grayscale bytes, width, height).  Every component is entropy-
    decoded where the bitstream interleaves them; chroma-ONLY
    progressive scans are skipped without decoding (scans are marker-
    delimited), and only Y is ever dequantized/IDCTed.  Arithmetic
    coding, lossless, hierarchical and 12-bit inputs raise — never
    mis-decode."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (width, height, comps) ; comps = [(cid, h, v, tq)]
    restart_interval = 0
    progressive = False
    prog_coefs: list | None = None  # luma blocks, zigzag order
    prog_geom: dict | None = None

    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: STANDALONE markers (T.81 B.1.1.3) carry
            # no length segment — reading one as length-prefixed would
            # consume arbitrary bytes of a decodable stream
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        seg = blob[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                raw = seg[p : p + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                vals = (
                    list(struct.unpack(f">{64}H", raw)) if pq else list(raw)
                )
                tab = [0] * 64
                for i in range(64):
                    tab[_ZIGZAG[i]] = vals[i]
                qtabs[tq] = tab
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                dec = {
                    (ln, code): sym
                    for sym, (code, ln) in _build_codes(bits, vals).items()
                }
                (ac_tabs if tc else dc_tabs)[th] = dec
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (width, height, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                h0, v0 = comps[0][1], comps[0][2]
                cw = (width * h0 + hmax - 1) // hmax
                ch = (height * v0 + vmax - 1) // vmax
                if (cw, ch) != (width, height):
                    raise ValueError("unsupported JPEG: subsampled luma")
                mcux = (width + 8 * hmax - 1) // (8 * hmax)
                mcuy = (height + 8 * vmax - 1) // (8 * vmax)
                prog_geom = {
                    "mcux": mcux,
                    "mcuy": mcuy,
                    "nbx_pad": mcux * h0,
                    "nby_pad": mcuy * v0,
                    "nbx_real": (cw + 7) // 8,
                    "nby_real": (ch + 7) // 8,
                }
                prog_coefs = [
                    [0] * 64
                    for _ in range(prog_geom["nbx_pad"] * prog_geom["nby_pad"])
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF{marker - 0xC0}); "
                "baseline/progressive only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA and progressive:  # progressive scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            width, height, comps = frame
            ns = seg[0]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            luma_id = comps[0][0]
            scan_ids = [seg[1 + 2 * i] for i in range(ns)]
            data_start = pos + 2 + seglen
            if luma_id not in scan_ids:
                # chroma-only scan: entropy data is marker-delimited —
                # skip without decoding (luma-only contract)
                pos = _next_marker_pos(blob, data_start)
                continue
            scan_comps = []  # (h, v, qtab?, dc_table, ac_table)
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c[0] == cs), None)
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                _, h, v, tq = comp
                scan_comps.append(
                    (h, v, tq, dc_tabs.get(tdta >> 4), ac_tabs.get(tdta & 0x0F))
                )
            luma_ci = scan_ids.index(luma_id)
            br = _BitReader(blob, data_start)
            if ss == 0:  # DC scan (Se must be 0 per T.81)
                if se != 0:
                    raise ValueError("JPEG progressive DC scan with Se != 0")
                if ah == 0 and any(s[3] is None for s in scan_comps):
                    raise ValueError("JPEG scan before its DHT")
                _prog_dc_scan(
                    br, scan_comps, luma_ci, prog_coefs, prog_geom,
                    ah, al, restart_interval,
                )
            else:  # AC scan: single-component per T.81 G.2
                if ns != 1:
                    raise ValueError("JPEG progressive AC scan must be 1-component")
                if scan_comps[0][4] is None:
                    raise ValueError("JPEG scan before its DHT")
                _prog_ac_scan(
                    br, scan_comps[0][4], prog_coefs, prog_geom,
                    ss, se, ah, al, restart_interval,
                )
            # advance to the marker after this scan's entropy data
            if br.marker is not None and not 0xD0 <= br.marker <= 0xD7:
                pos = br.pos - 2
            else:
                pos = _next_marker_pos(blob, br.pos)
            continue
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            width, height, comps = frame
            ns = seg[0]
            scan = []  # (h, v, qtab, dc_table, ac_table, is_luma)
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c[0] == cs), None)
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                _, h, v, tq = comp
                if tq not in qtabs:
                    raise ValueError("JPEG scan before its DQT")
                scan.append(
                    (h, v, qtabs[tq], dc_tabs.get(tdta >> 4), ac_tabs.get(tdta & 0x0F))
                )
            if any(s[3] is None or s[4] is None for s in scan):
                raise ValueError("JPEG scan before its DHT")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if ns == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved
                # — the MCU is ONE data unit and the block grid comes
                # from the component's own dimensions, NOT the frame's
                # hmax/vmax MCU geometry (which would silently permute
                # block placement).  Luma-only contract: the first scan
                # must be the first (luma) component at full resolution,
                # else reject loudly.
                if seg[1] != comps[0][0]:
                    raise ValueError(
                        "unsupported JPEG scan order; first scan must be "
                        "the luma component"
                    )
                h1, v1 = scan[0][0], scan[0][1]
                cw = (width * h1 + hmax - 1) // hmax
                ch = (height * v1 + vmax - 1) // vmax
                if (cw, ch) != (width, height):
                    raise ValueError("unsupported JPEG: subsampled luma")
                scan = [(1, 1) + scan[0][2:]]
                mcux = (width + 7) // 8
                mcuy = (height + 7) // 8
            else:
                mcux = (width + 8 * hmax - 1) // (8 * hmax)
                mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            # luma plane padded to whole MCUs (cropped at the end)
            h0, v0 = scan[0][0], scan[0][1]
            pw, ph = mcux * h0 * 8, mcuy * v0 * 8
            if _np is not None:
                plane = _np.zeros((ph, pw), dtype=_np.uint8)
            else:
                plane = [bytearray(pw) for _ in range(ph)]
            br = _BitReader(blob, pos + 2 + seglen)
            preds = [0] * ns
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        try:
                            br.restart()
                        except ValueError:
                            raise
                        preds = [0] * ns
                    mcu_count += 1
                    for ci, (h, v, qtab, dct, act) in enumerate(scan):
                        for by in range(v):
                            for bx in range(h):
                                cat = _decode_huff(br, dct)
                                diff = _extend(br.receive(cat), cat)
                                preds[ci] += diff
                                zz = [0] * 64
                                zz[0] = preds[ci]
                                k = 1
                                while k < 64:
                                    sym = _decode_huff(br, act)
                                    if sym == 0x00:  # EOB
                                        break
                                    if sym == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += sym >> 4
                                    if k > 63:
                                        raise ValueError("JPEG AC index overflow")
                                    zz[k] = _extend(br.receive(sym & 0x0F), sym & 0x0F)
                                    k += 1
                                if ci != 0:
                                    continue  # chroma: bitstream advanced, no IDCT
                                block = _idct_block(zz, qtab)
                                y0 = (my * v + by) * 8
                                x0 = (mx * h + bx) * 8
                                if _np is not None:
                                    plane[y0 : y0 + 8, x0 : x0 + 8] = block
                                else:
                                    for dy in range(8):
                                        row = plane[y0 + dy]
                                        for dx in range(8):
                                            row[x0 + dx] = block[dy][dx]
            if _np is not None:
                gray = plane[:height, :width].tobytes()
            else:
                gray = b"".join(bytes(r[:width]) for r in plane[:height])
            return gray, width, height
        # APPn / COM / anything skippable: fall through
        pos += 2 + seglen
    if progressive and prog_coefs is not None and frame is not None:
        # EOI (or stream end): reconstruct the accumulated luma plane
        width, height, comps = frame
        tq = comps[0][3]
        if tq not in qtabs:
            raise ValueError("JPEG progressive stream missing luma DQT")
        qtab = qtabs[tq]
        nbx, nby = prog_geom["nbx_real"], prog_geom["nby_real"]
        if _np is not None:
            plane = _np.zeros((nby * 8, nbx * 8), dtype=_np.uint8)
        else:
            plane = [bytearray(nbx * 8) for _ in range(nby * 8)]
        for by in range(nby):
            for bx in range(nbx):
                block = _idct_block(
                    prog_coefs[by * prog_geom["nbx_pad"] + bx], qtab
                )
                if _np is not None:
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
                else:
                    for dy in range(8):
                        row = plane[by * 8 + dy]
                        for dx in range(8):
                            row[bx * 8 + dx] = block[dy][dx]
        if _np is not None:
            return plane[:height, :width].tobytes(), width, height
        return (
            b"".join(bytes(r[:width]) for r in plane[:height]),
            width,
            height,
        )
    raise ValueError("JPEG has no SOS scan")
