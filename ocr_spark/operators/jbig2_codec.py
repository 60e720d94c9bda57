"""JBIG2 generic-region decoder (ITU-T T.88), pure Python+numpy.

The last raster format the PDF image path named-enveloped: scanners and
`jbig2enc`-class tools embed bilevel scans in PDFs as /JBIG2Decode
streams. This module implements, from the published ITU-T T.88 spec:

  * the MQ arithmetic coder — the 47-state probability table (Qe, NMPS,
    NLPS, SWITCH) shared with JPEG2000, INITDEC/BYTEIN/RENORMD/DECODE and
    the matching encoder (INITENC/CODEMPS/CODELPS/BYTEOUT/FLUSH) so
    fixtures round-trip real bitstreams;
  * generic region decoding (§6.2): templates 0-3 with their nominal
    adaptive (AT) pixel positions, context built in the spec figure's
    raster order, TPGDON typical-prediction rows (the per-template
    pseudo-pixel contexts 0x9B25/0x0795/0x00E5/0x0195), and MMR=1 regions
    delegated to the repo's T.6 decoder (fax_codec.g4_decode);
  * the PDF embedded-stream organization (§annex on embedded streams):
    sequential segment headers (page info 48, immediate generic region
    36/38/39, end-of-page/file 49/51/50 skipped), single-page compositing
    of region bitmaps at their (x, y) offsets.

Also implemented: arithmetic SYMBOL-DICTIONARY + TEXT-REGION coding (the
mode real scanner streams use) — the IAx/IAID arithmetic integer
decoders (Annex A), height-class symbol decoding with shared generic
contexts, export-flag runs, and strip-based symbol placement with the
four combination ops — and, since round 5 session 12, HALFTONE coding
(the mode scanned dithered/screened photos use): pattern dictionaries
(§6.7, one collective generic bitmap), halftone regions (§6.6) with
Annex C gray-coded bitplane decoding over a single shared arithmetic
decoder, and the 8.8 fixed-point (possibly skewed) rendering grid.
Out of scope (named ValueError envelopes): Huffman-coded variants,
refinement/aggregate coding, HENABLESKIP/MMR halftones, transposed
text regions.

Coding domain: 1 = black (JBIG2 pixel value 1), matching fax_codec;
callers map to gray. Cost: one context lookup + one MQ DECODE per pixel,
row-vectorized context seeding — runs inside the same Arrow-batched
image stages as every other codec (zero per-row Python at the Spark
layer)."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# MQ coder (T.88 Annex E; table shared with JPEG2000)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 software-conventions decoder (Chigh in the top 16 bits of C)."""

    __slots__ = ("data", "bp", "c", "a", "ct", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        b = d[bp] if bp < self.n else 0xFF
        if b == 0xFF:
            b1 = d[bp + 1] if bp + 1 < self.n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nb = d[self.bp] if self.bp < self.n else 0xFF
            self.c += nb << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        """cx = [index, mps] mutable context state."""
        i, mps = cx
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E encoder (CODEMPS/CODELPS/BYTEOUT/FLUSH), the fixture
    writer for round-trip tests. `b` is the one buffered not-yet-emitted
    byte (-1 before the first BYTEOUT; a carry cannot occur on the first
    BYTEOUT since C < 2^27 after only 12 renormalize shifts)."""

    __slots__ = ("a", "c", "ct", "b", "out")

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = -1
        self.out = bytearray()

    def _push(self) -> None:
        if self.b >= 0:
            self.out.append(self.b)

    def _byteout(self) -> None:
        # spec E.3.3: a buffered 0xFF stuffs 7 bits into the next byte;
        # a pending carry (C >= 0x8000000) bumps the buffered byte, which
        # cannot overflow because the 0xFF case was handled first
        if self.b == 0xFF:
            self._push()
            self.b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._push()
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.b += 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._push()
                self.b = (self.c >> 20) & 0xFF
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._push()
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorme(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: list, d: int) -> None:
        i, mps = cx
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
            self._renorme()
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - mps
            cx[0] = nlps
            self._renorme()

    def flush(self) -> bytes:
        # SETBITS: put as many 1 bits into C as A allows
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self._push()
        # trailing 0xFFs are redundant (the decoder resupplies 1s)
        while self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# generic region coding (T.88 §6.2) — templates with nominal AT pixels
# ---------------------------------------------------------------------------

# fixed template pixels per GBTEMPLATE (dx, dy), dy<0 above; AT nominal
# positions appended; context bits are assembled in raster order of the
# final pixel list (top row left->right, then the middle row, then the
# current row), matching the spec figures for nominal ATs.
_TEMPLATES = {
    0: (
        [(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    ),
    1: (
        [(-1, -2), (0, -2), (1, -2), (2, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1)],
    ),
    2: (
        [(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-2, 0), (-1, 0)],
        [(2, -1)],
    ),
    3: (
        [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(2, -1)],
    ),
}

# TPGDON pseudo-pixel contexts per template (T.88 §6.2.5.7)
_TPGD_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template_pixels(template: int, at: list[tuple[int, int]] | None):
    fixed, at_nominal = _TEMPLATES[template]
    if at is None:
        at = at_nominal
    if len(at) != len(at_nominal):
        raise ValueError(
            f"template {template} needs {len(at_nominal)} AT pixels, got {len(at)}"
        )
    pixels = fixed + list(at)
    # raster order: by row (dy), then column (dx) — the spec figure layout
    pixels.sort(key=lambda p: (p[1], p[0]))
    return pixels


def _region_pixel(bitmap: np.ndarray, x: int, y: int) -> int:
    if x < 0 or y < 0 or x >= bitmap.shape[1] or y >= bitmap.shape[0]:
        return 0
    return int(bitmap[y, x])


# per-template contiguous row windows for NOMINAL ATs: {dy: (lo, hi)} —
# with nominal adaptive pixels every template row is a contiguous span,
# enabling sliding-window context updates (3 shifts/pixel instead of a
# 10-16 pixel gather)
_NOMINAL_WINDOWS = {
    0: {-2: (-2, 2), -1: (-3, 3), 0: (-4, -1)},
    1: {-2: (-1, 2), -1: (-2, 3), 0: (-3, -1)},
    2: {-2: (-1, 1), -1: (-2, 2), 0: (-2, -1)},
    3: {-1: (-3, 2), 0: (-4, -1)},
}


def _generic_decode_fast(
    data: bytes, width: int, height: int, template: int, tpgdon: bool
) -> np.ndarray:
    """Nominal-AT fast path: sliding-window contexts + inlined MQ decode
    (local-variable coder state; ~5x the generic gather loop). Bit order
    matches _template_pixels' raster sort exactly, so fast and generic
    paths are interchangeable."""
    wins = _NOMINAL_WINDOWS[template]
    rows_above = sorted(dy for dy in wins if dy < 0)  # e.g. [-2, -1]
    w0_lo, w0_hi = wins[0]
    w0_bits = w0_hi - w0_lo + 1
    spans = [(dy, wins[dy][0], wins[dy][1]) for dy in rows_above]
    shifts = []  # bit shift for each above-row window in the context
    total = w0_bits
    for dy, lo, hi in reversed(spans):
        shifts.insert(0, total)
        total += hi - lo + 1
    nbits = total
    tp_ctx = _TPGD_CTX[template]
    # MQ decoder state, kept in locals for the pixel loop
    d8 = data
    n = len(d8)
    bp = 0
    c = (d8[0] if n else 0xFF) << 16
    # inline first BYTEIN
    if n and d8[0] == 0xFF:
        b1 = d8[1] if 1 < n else 0xFF
        if b1 > 0x8F:
            c += 0xFF00
            ct = 8
        else:
            bp = 1
            c += b1 << 9
            ct = 7
    else:
        bp = 1
        c += (d8[1] if 1 < n else 0xFF) << 8
        ct = 8
    c = (c << 7) & 0xFFFFFFFF
    ct -= 7
    a = 0x8000
    idx = [0] * (1 << nbits)
    mps = [0] * (1 << nbits)
    qe_t = _QE
    bitmap = np.zeros((height, width), dtype=np.uint8)
    zero_row = [0] * (width + 8)
    pad = 4  # left pad covers the most negative dx
    row_cache: dict[int, list[int]] = {}
    ltp = 0

    def _decode(ctx: int) -> int:
        nonlocal a, c, ct, bp
        i = idx[ctx]
        qe, nmps, nlps, switch = qe_t[i]
        a -= qe
        if ((c >> 16) & 0xFFFF) < qe:
            if a < qe:
                d = mps[ctx]
                idx[ctx] = nmps
            else:
                d = 1 - mps[ctx]
                if switch:
                    mps[ctx] = d
                idx[ctx] = nlps
            a = qe
        else:
            c = (c - (qe << 16)) & 0xFFFFFFFF
            if a & 0x8000:
                return mps[ctx]
            if a < qe:
                d = 1 - mps[ctx]
                if switch:
                    mps[ctx] = d
                idx[ctx] = nlps
            else:
                d = mps[ctx]
                idx[ctx] = nmps
        while True:
            if ct == 0:
                b = d8[bp] if bp < n else 0xFF
                if b == 0xFF:
                    b1 = d8[bp + 1] if bp + 1 < n else 0xFF
                    if b1 > 0x8F:
                        c += 0xFF00
                        ct = 8
                    else:
                        bp += 1
                        c += b1 << 9
                        ct = 7
                else:
                    bp += 1
                    c += (d8[bp] if bp < n else 0xFF) << 8
                    ct = 8
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        return d

    w0_mask = (1 << w0_bits) - 1
    for y in range(height):
        if tpgdon:
            if _decode(tp_ctx):
                ltp ^= 1
            if ltp:
                if y > 0:
                    bitmap[y] = bitmap[y - 1]
                    row_cache[y] = row_cache.get(y - 1, zero_row)
                else:
                    row_cache[y] = zero_row
                continue
        # padded source rows (python lists index faster than ndarray)
        srcs = []
        for dy, lo, hi in spans:
            yy = y + dy
            if yy < 0:
                srcs.append(zero_row)
            else:
                cached = row_cache.get(yy)
                if cached is None:
                    cached = [0] * pad + bitmap[yy].tolist() + [0] * pad
                    row_cache[yy] = cached
                srcs.append(cached)
        # initial windows at x=0: bits src[pad + lo .. pad + hi]
        ws = []
        for (dy, lo, hi), src in zip(spans, srcs):
            v = 0
            for xx in range(lo, hi + 1):
                v = (v << 1) | src[pad + xx]
            ws.append(v)
        masks = [(1 << (hi - lo + 1)) - 1 for _dy, lo, hi in spans]
        nexts = [pad + hi + 1 for _dy, _lo, hi in spans]
        w0 = 0
        out_row = [0] * (width + 2 * pad)
        brow = bitmap[y]
        for x in range(width):
            ctx = w0
            for k in range(len(ws)):
                ctx |= ws[k] << shifts[k]
            d = _decode(ctx)
            if d:
                brow[x] = 1
            out_row[pad + x] = d
            w0 = ((w0 << 1) | d) & w0_mask
            for k in range(len(ws)):
                src = srcs[k]
                nx = nexts[k] + x
                ws[k] = ((ws[k] << 1) | (src[nx] if nx < len(src) else 0)) & masks[k]
        row_cache[y] = out_row
        # drop rows that scrolled out of every window
        old = y + rows_above[0]
        if old - 1 in row_cache:
            del row_cache[old - 1]
    return bitmap


def generic_region_decode(
    data: bytes, width: int, height: int, template: int = 0,
    at: list[tuple[int, int]] | None = None, tpgdon: bool = False,
    mmr: bool = False,
) -> np.ndarray:
    """One generic region. mmr=True delegates to T.6 (fax_codec.g4_decode).
    Returns uint8 (H,W), 1=black."""
    if width <= 0 or height <= 0:
        raise ValueError("region dims must be positive")
    if width * height > _MAX_PIXELS:
        # the MQ decoder never fails on exhausted data (it feeds 1-bits),
        # so unbounded declared dims are a CPU/memory DoS from tiny streams
        raise ValueError(f"implausible JBIG2 region dims {width}x{height}")
    if mmr:
        from ocr_spark.operators.fax_codec import g4_decode

        return g4_decode(data, width, height)
    if template not in _TEMPLATES:
        raise ValueError(f"unknown GB template {template}")
    if at is None or at == _TEMPLATES[template][1]:
        return _generic_decode_fast(data, width, height, template, tpgdon)
    pixels = _template_pixels(template, at)
    dec = MQDecoder(data)
    # one [index, mps] state per context value, allocated on first touch:
    # a 16-pixel template addresses 64k contexts but a small bitmap only
    # visits a handful — eager allocation dominated tiny-region decode
    cx = _lazy_cx()
    return _generic_decode_with(dec, cx, width, height, template, pixels,
                                tpgdon)


def _lazy_cx():
    """Context store for the gather paths: defaultdict keyed by context
    value, materializing [index, mps] pairs on first touch."""
    from collections import defaultdict

    return defaultdict(lambda: [0, 0])


def _generic_decode_with(
    dec: "MQDecoder", cx: list, width: int, height: int, template: int,
    pixels: list, tpgdon: bool,
) -> np.ndarray:
    """Gather-loop generic decode over a CALLER-OWNED decoder + context
    set — the sharing the halftone grayscale bitplanes require (C.5: all
    planes run through one arithmetic decoder and one GB stats set)."""
    bitmap = np.zeros((height, width), dtype=np.uint8)
    ltp = 0
    tp_cx = cx[_TPGD_CTX[template]] if tpgdon else None
    for y in range(height):
        if tpgdon:
            if dec.decode(tp_cx):
                ltp ^= 1
            if ltp:
                if y > 0:
                    bitmap[y] = bitmap[y - 1]
                continue
        row = bitmap[y]
        for x in range(width):
            ctx = 0
            for dx, dy in pixels:
                ctx = (ctx << 1) | _region_pixel(bitmap, x + dx, y + dy)
            row[x] = dec.decode(cx[ctx])
    return bitmap


def generic_region_encode(
    img: np.ndarray, template: int = 0,
    at: list[tuple[int, int]] | None = None, tpgdon: bool = False,
) -> bytes:
    """Fixture encoder: the exact mirror of generic_region_decode."""
    img = (np.asarray(img) > 0).astype(np.uint8)
    if img.ndim != 2:
        raise ValueError("expected a 2-D bilevel array")
    pixels = _template_pixels(template, at)
    enc = MQEncoder()
    cx = _lazy_cx()
    _generic_encode_with(enc, cx, img, template, pixels, tpgdon)
    return enc.flush()


def _generic_encode_with(
    enc: "MQEncoder", cx: list, img: np.ndarray, template: int,
    pixels: list, tpgdon: bool,
) -> None:
    """Mirror of _generic_decode_with over a caller-owned encoder state."""
    height, width = img.shape
    tp_cx = cx[_TPGD_CTX[template]] if tpgdon else None
    ltp = 0
    for y in range(height):
        if tpgdon:
            same = y > 0 and bool(np.array_equal(img[y], img[y - 1]))
            want_ltp = 1 if same else 0
            enc.encode(tp_cx, 1 if want_ltp != ltp else 0)
            ltp = want_ltp
            if ltp:
                continue
        for x in range(width):
            ctx = 0
            for dx, dy in pixels:
                ctx = (ctx << 1) | _region_pixel(img, x + dx, y + dy)
            enc.encode(cx[ctx], int(img[y, x]))


# ---------------------------------------------------------------------------
# embedded (PDF) segment stream
# ---------------------------------------------------------------------------


_MAX_PIXELS = 64_000_000  # matches the PDF image-path implausibility guard


def _parse_segment_header(data: bytes, pos: int):
    """Returns (number, type, page, data_length, data_start)."""
    try:
        return _parse_segment_header_inner(data, pos)
    except (struct.error, IndexError):
        raise ValueError("truncated JBIG2 segment header") from None


def _parse_segment_header_inner(data: bytes, pos: int):
    if pos + 11 > len(data):
        raise ValueError("truncated JBIG2 segment header")
    number, flags = struct.unpack_from(">IB", data, pos)
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    count = rts >> 5
    if count == 7:
        (count,) = struct.unpack_from(">I", data, pos)
        count &= 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # 4-byte count + retain bits
    else:
        pos += 1
    # referred segment numbers: size depends on THIS segment's number
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    pos += count * ref_size
    if page_assoc_4:
        (page,) = struct.unpack_from(">I", data, pos)
        pos += 4
    else:
        page = data[pos]
        pos += 1
    (length,) = struct.unpack_from(">I", data, pos)
    pos += 4
    if length == 0xFFFFFFFF:
        raise ValueError("unknown-length JBIG2 segments not supported")
    return number, seg_type, page, length, pos


def _parse_region_info(data: bytes, pos: int):
    w, h, x, y, comb = struct.unpack_from(">IIIIB", data, pos)
    return w, h, x, y, comb & 7, pos + 17


def jbig2_decode(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded-organization JBIG2 (the PDF /JBIG2Decode layout: bare
    segment sequence, no file header). Supports page-info, generic-region,
    symbol-dictionary + text-region, and pattern-dictionary + halftone-
    region segments (one dictionary of each kind per stream);
    refinement/Huffman layouts raise a NAMED ValueError (the per-image
    envelope upstream keeps accounting honest). Returns uint8 (H,W),
    1=black."""
    stream = bytes(globals_data) + bytes(data)
    pos = 0
    page_w = page_h = None
    page_default = 0
    regions: list[tuple[int, int, np.ndarray]] = []
    symbols: list[np.ndarray] = []
    patterns: list[np.ndarray] = []
    while pos < len(stream):
        if len(stream) - pos < 11:
            break  # trailing pad
        number, seg_type, _page, length, dstart = _parse_segment_header(
            stream, pos
        )
        body = stream[dstart : dstart + length]
        if len(body) < length:
            raise ValueError(f"segment {number} body truncated")
        pos = dstart + length
        if seg_type == 48:  # page info
            if len(body) < 17:
                raise ValueError("truncated JBIG2 page-info segment")
            page_w, page_h = struct.unpack_from(">II", body, 0)
            flags = body[16]
            page_default = (flags >> 2) & 1
        elif seg_type in (36, 38, 39):  # (intermediate/)immediate generic
            if len(body) < 18:
                raise ValueError("truncated JBIG2 region segment")
            w, h, x, y, comb, bpos = _parse_region_info(body, 0)
            gflags = body[bpos]
            bpos += 1
            mmr = bool(gflags & 1)
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            at = None
            if not mmr:
                n_at = 4 if template == 0 else 1
                at = []
                for _ in range(n_at):
                    ax, ay = struct.unpack_from(">bb", body, bpos)
                    at.append((ax, ay))
                    bpos += 2
            bmp = generic_region_decode(
                body[bpos:], w, h, template=template, at=at,
                tpgdon=tpgdon, mmr=mmr,
            )
            regions.append((x, y, comb, bmp))
        elif seg_type == 0:  # symbol dictionary (arithmetic)
            if symbols:
                # a second dictionary changes SBSYMCODELEN scoping per
                # referred segments, which this decoder does not model —
                # decoding on would silently desync, so fail by name
                raise ValueError(
                    "multiple symbol dictionaries (referred-segment "
                    "scoping) not supported"
                )
            symbols.extend(symbol_dict_decode(body))
        elif seg_type in (4, 6, 7):  # (intermediate/)immediate text region
            # single-dictionary scoping: the symbol table is THE one
            # dictionary (the layout scanner streams use)
            x, y, comb, bmp = text_region_decode(body, symbols)
            regions.append((x, y, comb, bmp))
        elif seg_type == 16:  # pattern dictionary
            if patterns:
                # same single-dictionary scoping simplification as the
                # symbol dictionary above: fail by name, never desync
                raise ValueError(
                    "multiple pattern dictionaries (referred-segment "
                    "scoping) not supported"
                )
            patterns.extend(pattern_dict_decode(body))
        elif seg_type in (20, 22, 23):  # (intermediate/)immediate halftone
            x, y, comb, bmp = halftone_region_decode(body, patterns)
            regions.append((x, y, comb, bmp))
        elif seg_type in (49, 50, 51, 62):  # end-of-page/stripe/file, ext
            continue
        elif seg_type in (40, 42, 43, 53):
            raise ValueError(
                f"JBIG2 segment type {seg_type} (refinement/tables) "
                "not supported"
            )
        else:
            raise ValueError(f"unknown JBIG2 segment type {seg_type}")
    if not regions:
        raise ValueError("JBIG2 stream has no region")
    # recompute ONLY the unknown dimension(s): striped pages declare
    # height 0xFFFFFFFF with a valid width
    if page_w is None or page_w == 0xFFFFFFFF:
        page_w = max(x + r.shape[1] for x, _y, _c, r in regions)
    if page_h is None or page_h == 0xFFFFFFFF:
        page_h = max(y + r.shape[0] for _x, y, _c, r in regions)
    if page_w <= 0 or page_h <= 0 or page_w * page_h > _MAX_PIXELS:
        raise ValueError(f"implausible JBIG2 page dims {page_w}x{page_h}")
    page = np.full(
        (page_h, page_w), 1 if page_default else 0, dtype=np.uint8
    )
    for x, y, comb, bmp in regions:
        if x >= page_w or y >= page_h:
            continue
        # conformant decoders clip regions to the page
        bmp = bmp[: page_h - y, : page_w - x]
        h, w = bmp.shape
        tgt = page[y : y + h, x : x + w]
        if comb == 0:
            tgt |= bmp
        elif comb == 1:
            tgt &= bmp
        elif comb == 2:
            tgt ^= bmp
        elif comb == 3:
            tgt ^= bmp ^ 1  # XNOR
        else:  # 4 = REPLACE
            tgt[:] = bmp
    return page


_FILE_MAGIC = b"\x97JB2\r\n\x1a\n"


def jbig2_file_decode(data: bytes) -> np.ndarray:
    """Standalone JBIG2 file organization (T.88 Annex D): the 8-byte magic,
    a file-header flags byte (bit 0 = sequential, bit 1 = number-of-pages
    unknown), optional 4-byte page count, then the same segment stream as
    the embedded organization (sequential only; random-access files carry
    all headers first and are rejected with a named error). Returns uint8
    (H,W), 1=black, gray mapping left to the caller."""
    data = bytes(data)
    if data[:8] != _FILE_MAGIC:
        raise ValueError("not a JBIG2 file (bad magic)")
    if len(data) < 9:
        raise ValueError("truncated JBIG2 file header")
    flags = data[8]
    pos = 9
    if not flags & 1:
        raise ValueError("random-access JBIG2 file organization not supported")
    if not flags & 2:  # known number of pages: 4-byte count present
        pos += 4
    return jbig2_decode(data[pos:])


def jbig2_file_encode(img: np.ndarray) -> bytes:
    """Fixture writer: sequential file organization, one page."""
    return _FILE_MAGIC + b"\x01" + struct.pack(">I", 1) + jbig2_encode(img)


def jbig2_encode(
    img: np.ndarray, template: int = 0, tpgdon: bool = False,
    x: int = 0, y: int = 0, page_size: tuple[int, int] | None = None,
) -> bytes:
    """Fixture writer: embedded-organization stream with one page-info
    segment and one immediate lossless generic region at (x, y)."""
    img = (np.asarray(img) > 0).astype(np.uint8)
    h, w = img.shape
    if page_size is None:
        page_size = (w + x, h + y)
    pw, ph = page_size

    def seg(number: int, seg_type: int, body: bytes) -> bytes:
        return (
            struct.pack(">IB", number, seg_type)
            + b"\x00"  # 0 referred segments
            + b"\x01"  # page association 1
            + struct.pack(">I", len(body))
            + body
        )

    page_info = struct.pack(">IIIIB", pw, ph, 0, 0, 0) + b"\x00\x00"
    at = _TEMPLATES[template][1]
    gflags = (template << 1) | (8 if tpgdon else 0)
    at_bytes = b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    region = (
        struct.pack(">IIIIB", w, h, x, y, 0)
        + bytes([gflags])
        + at_bytes
        + generic_region_encode(img, template=template, tpgdon=tpgdon)
    )
    return (
        seg(0, 48, page_info)
        + seg(1, 38, region)  # immediate lossless generic region
        + seg(2, 49, b"")  # end of page
    )


# ---------------------------------------------------------------------------
# arithmetic integer decoding (T.88 Annex A) — IAx and IAID procedures,
# plus the matching encoders for fixture writing. Each IAx category owns a
# 512-state context bank; IAID owns a (1 << SBSYMCODELEN+1) bank.
# ---------------------------------------------------------------------------

_OOB = object()  # out-of-band marker returned by IAx decode


class IntCtx:
    """One IAx category: 512 MQ contexts driven by the PREV tree."""

    __slots__ = ("cx",)

    def __init__(self):
        self.cx = [[0, 0] for _ in range(512)]


def _ia_decode(dec: MQDecoder, ic: IntCtx):
    """Decode one integer (or _OOB) per A.2."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(ic.cx[prev])
        prev = ((prev << 1) | b) if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    if not bit():
        v = (bit() << 1) | bit()
    elif not bit():
        v = 4
        for _ in range(4):
            v = (v << 1) | bit()
        v = (v & 0xF) + 4
    elif not bit():
        v = 0
        for _ in range(6):
            v = (v << 1) | bit()
        v += 20
    elif not bit():
        v = 0
        for _ in range(8):
            v = (v << 1) | bit()
        v += 84
    elif not bit():
        v = 0
        for _ in range(12):
            v = (v << 1) | bit()
        v += 340
    else:
        v = 0
        for _ in range(32):
            v = (v << 1) | bit()
        v += 4436
    if s and v == 0:
        return _OOB
    return -v if s else v


def _ia_encode(enc: MQEncoder, ic: IntCtx, value) -> None:
    """Mirror of _ia_decode (A.3)."""
    prev = 1

    def put(b: int) -> None:
        nonlocal prev
        enc.encode(ic.cx[prev], b)
        prev = ((prev << 1) | b) if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is _OOB:
        put(1)  # S = 1
        put(0)
        put(0)
        put(0)  # V = 0 in the 2-bit class
        return
    s = 1 if value < 0 else 0
    v = -value if s else value
    put(s)
    if v < 4:
        put(0)
        put((v >> 1) & 1)
        put(v & 1)
    elif v < 20:
        put(1)
        put(0)
        for i in range(3, -1, -1):
            put(((v - 4) >> i) & 1)
    elif v < 84:
        put(1)
        put(1)
        put(0)
        for i in range(5, -1, -1):
            put(((v - 20) >> i) & 1)
    elif v < 340:
        put(1)
        put(1)
        put(1)
        put(0)
        for i in range(7, -1, -1):
            put(((v - 84) >> i) & 1)
    elif v < 4436:
        put(1)
        put(1)
        put(1)
        put(1)
        put(0)
        for i in range(11, -1, -1):
            put(((v - 340) >> i) & 1)
    else:
        put(1)
        put(1)
        put(1)
        put(1)
        put(1)
        for i in range(31, -1, -1):
            put(((v - 4436) >> i) & 1)


class IdCtx:
    """IAID: symbol-ID decoding over a binary-tree context bank."""

    __slots__ = ("cx", "nbits")

    def __init__(self, nbits: int):
        self.nbits = nbits
        self.cx = [[0, 0] for _ in range(1 << (nbits + 1))]


def _iaid_decode(dec: MQDecoder, ic: IdCtx) -> int:
    prev = 1
    for _ in range(ic.nbits):
        b = dec.decode(ic.cx[prev])
        prev = (prev << 1) | b
    return prev - (1 << ic.nbits)


def _iaid_encode(enc: MQEncoder, ic: IdCtx, value: int) -> None:
    prev = 1
    for i in range(ic.nbits - 1, -1, -1):
        b = (value >> i) & 1
        enc.encode(ic.cx[prev], b)
        prev = (prev << 1) | b


# ---------------------------------------------------------------------------
# symbol dictionary (type 0) + text region (types 4/6/7), arithmetic
# coding only (SDHUFF/SBHUFF=0), no refinement/aggregation — the layout
# jbig2enc-class encoders emit for scanned text. Shared generic-region
# pixel machinery: symbols are decoded with the same template contexts,
# one shared MQ decoder and GB context bank across the whole dictionary.
# ---------------------------------------------------------------------------


def _decode_symbol_bitmap(
    dec: MQDecoder, cx: list, template: int, w: int, h: int
) -> np.ndarray:
    """One symbol's bitmap via generic decoding with SHARED contexts (the
    dictionary form of §6.5.8.2.1): same pixel walk as the nominal-AT
    fast path but over an existing decoder/context bank."""
    pixels = _template_pixels(template, None)
    bitmap = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            ctx = 0
            for dx, dy in pixels:
                ctx = (ctx << 1) | _region_pixel(bitmap, x + dx, y + dy)
            bitmap[y, x] = dec.decode(cx[ctx])
    return bitmap


def _encode_symbol_bitmap(
    enc: MQEncoder, cx: list, template: int, bmp: np.ndarray
) -> None:
    pixels = _template_pixels(template, None)
    h, w = bmp.shape
    for y in range(h):
        for x in range(w):
            ctx = 0
            for dx, dy in pixels:
                ctx = (ctx << 1) | _region_pixel(bmp, x + dx, y + dy)
            enc.encode(cx[ctx], int(bmp[y, x]))


def symbol_dict_decode(data: bytes) -> list[np.ndarray]:
    """Symbol-dictionary segment body -> exported symbol bitmaps."""
    try:
        return _symbol_dict_decode_inner(data)
    except (struct.error, IndexError):
        raise ValueError("truncated JBIG2 symbol dictionary") from None


def _symbol_dict_decode_inner(data: bytes) -> list[np.ndarray]:
    if len(data) < 4:
        raise ValueError("truncated JBIG2 symbol dictionary")
    flags = struct.unpack_from(">H", data, 0)[0]
    if flags & 1:
        raise ValueError("Huffman-coded symbol dictionary not supported")
    if flags & 2:
        raise ValueError("refinement/aggregate symbol coding not supported")
    template = (flags >> 10) & 3
    pos = 2
    n_at = 4 if template == 0 else 1
    at = []
    for _ in range(n_at):
        ax, ay = struct.unpack_from(">bb", data, pos)
        at.append((ax, ay))
        pos += 2
    if at != _TEMPLATES[template][1]:
        raise ValueError("non-nominal symbol-dictionary AT pixels not supported")
    n_ex, n_new = struct.unpack_from(">II", data, pos)
    pos += 8
    if n_new > 10_000 or n_ex > 10_000:
        raise ValueError(f"implausible symbol counts new={n_new} ex={n_ex}")
    dec = MQDecoder(data[pos:])
    iadh, iadw, iaex, iaai = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    gb_cx = [[0, 0] for _ in range(1 << len(_template_pixels(template, None)))]
    symbols: list[np.ndarray] = []
    hcheight = 0
    total_px = 0
    while len(symbols) < n_new:
        dh = _ia_decode(dec, iadh)
        if dh is _OOB:
            raise ValueError("unexpected OOB in IADH")
        hcheight += dh
        if hcheight <= 0 or hcheight > 4096:
            raise ValueError(f"implausible symbol height {hcheight}")
        symwidth = 0
        while True:
            dw = _ia_decode(dec, iadw)
            if dw is _OOB:
                break  # end of height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 4096:
                raise ValueError(f"implausible symbol width {symwidth}")
            if len(symbols) >= n_new:
                raise ValueError("more symbols than declared")
            total_px += symwidth * hcheight
            # symbols are glyphs: 2M px of dictionary bitmaps is already
            # far beyond any real page's character set — and the budget
            # must trip BEFORE the first huge symbol decodes (Python MQ
            # decode is ~0.1 Mpx/s)
            if total_px > 2_000_000:
                raise ValueError(
                    "symbol dictionary exceeds the pixel budget"
                )
            symbols.append(
                _decode_symbol_bitmap(dec, gb_cx, template, symwidth, hcheight)
            )
    # export flags: alternating skip/export run lengths via IAEX. Zero
    # runs are legal but must not repeat forever: cap iterations (a
    # crafted stream of endless run=0 would otherwise spin, since the MQ
    # decoder never exhausts)
    exported: list[np.ndarray] = []
    i = 0
    exflag = False
    iters = 0
    while i < len(symbols) and len(exported) < n_ex:
        iters += 1
        if iters > 2 * len(symbols) + 4:
            raise ValueError("IAEX export runs do not converge")
        run = _ia_decode(dec, iaex)
        if run is _OOB or run < 0:
            raise ValueError("bad IAEX run")
        if exflag:
            exported.extend(symbols[i : i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise ValueError(
            f"exported {len(exported)} symbols, declared {n_ex}"
        )
    return exported


def symbol_dict_encode(
    symbols: list[np.ndarray], template: int = 0
) -> tuple[bytes, list[int]]:
    """Fixture writer: one height class per distinct height, all symbols
    exported."""
    flags = template << 10
    out = struct.pack(">H", flags)
    for ax, ay in _TEMPLATES[template][1]:
        out += struct.pack(">bb", ax, ay)
    out += struct.pack(">II", len(symbols), len(symbols))
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape[0])
    enc = MQEncoder()
    iadh, iadw, iaex, _ = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    gb_cx = [[0, 0] for _ in range(1 << len(_template_pixels(template, None)))]
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        _ia_encode(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            _ia_encode(enc, iadw, w - symwidth)
            symwidth = w
            _encode_symbol_bitmap(enc, gb_cx, template, symbols[order[i]])
            i += 1
        _ia_encode(enc, iadw, _OOB)
    _ia_encode(enc, iaex, 0)  # skip none
    _ia_encode(enc, iaex, len(symbols))  # export all
    return out + enc.flush(), order


def text_region_decode(
    data: bytes, symbols: list[np.ndarray]
) -> tuple[int, int, int, np.ndarray]:
    """Text-region segment body + symbol table -> (x, y, comb, bitmap)."""
    try:
        return _text_region_decode_inner(data, symbols)
    except (struct.error, IndexError):
        raise ValueError("truncated JBIG2 text region") from None


def _text_region_decode_inner(
    data: bytes, symbols: list[np.ndarray]
) -> tuple[int, int, int, np.ndarray]:
    w, h, x, y, comb, pos = _parse_region_info(data, 0)
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible text region dims {w}x{h}")
    flags = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if flags & 1:
        raise ValueError("Huffman-coded text region not supported")
    if (flags >> 1) & 1:
        raise ValueError("refinement-coded text region not supported")
    log_strips = (flags >> 2) & 3
    strips = 1 << log_strips
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    if transposed:
        raise ValueError("transposed text regions not supported")
    n_inst = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    if n_inst > 100_000:
        raise ValueError(f"implausible instance count {n_inst}")
    nsyms = len(symbols)
    if nsyms == 0:
        raise ValueError("text region with no symbols in scope")
    codelen = max(1, (nsyms - 1).bit_length())
    dec = MQDecoder(data[pos:])
    iadt, iafs, iads, iait = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(codelen)
    bitmap = np.full((h, w), def_pixel, dtype=np.uint8)
    dt0 = _ia_decode(dec, iadt)
    if dt0 is _OOB:
        raise ValueError("unexpected OOB in initial IADT")
    stript = -(dt0 * strips)
    firsts = 0
    placed = 0
    while placed < n_inst:
        dt = _ia_decode(dec, iadt)
        if dt is _OOB:
            raise ValueError("unexpected OOB in IADT")
        stript += dt * strips
        dfs = _ia_decode(dec, iafs)
        if dfs is _OOB:
            raise ValueError("unexpected OOB in IAFS")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = _ia_decode(dec, iads)
                if ids is _OOB:
                    break  # end of strip
                curs += ids + ds_offset
            first = False
            if strips > 1:
                curt = _ia_decode(dec, iait)
                if curt is _OOB:
                    raise ValueError("unexpected OOB in IAIT")
            else:
                curt = 0
            t = stript + curt
            sid = _iaid_decode(dec, iaid)
            if not 0 <= sid < nsyms:
                raise ValueError(f"symbol id {sid} out of range")
            sym = symbols[sid]
            sh, sw = sym.shape
            # refcorner: 0=BL, 1=TL, 2=BR, 3=TR (S along x, T along y)
            sx = curs
            # right corners (2, 3) still place the LEFT edge at S per spec
            sy = t if refcorner in (1, 3) else t - sh + 1
            # clip to region
            if sx < w and sy < h:
                x0, y0 = max(sx, 0), max(sy, 0)
                x1, y1 = min(sx + sw, w), min(sy + sh, h)
                if x1 > x0 and y1 > y0:
                    sub = sym[y0 - sy : y1 - sy, x0 - sx : x1 - sx]
                    tgt = bitmap[y0:y1, x0:x1]
                    if comb_op == 0:
                        tgt |= sub
                    elif comb_op == 1:
                        tgt &= sub
                    elif comb_op == 2:
                        tgt ^= sub
                    else:
                        tgt ^= sub ^ 1
            curs += sw - 1
            placed += 1
            if placed >= n_inst:
                break
    return x, y, comb, bitmap


def text_region_encode(
    placements: list[tuple[int, int, int]], symbols: list[np.ndarray],
    w: int, h: int, x: int = 0, y: int = 0,
) -> bytes:
    """Fixture writer: placements = [(sym_idx, sx, sy_top)] sorted however;
    encodes with TL refcorner, 1-px strips, OR composition."""
    nsyms = len(symbols)
    codelen = max(1, (nsyms - 1).bit_length())
    out = struct.pack(">IIIIB", w, h, x, y, 0)
    flags = (1 << 4)  # refcorner TL, log_strips 0, arithmetic, no refine
    out += struct.pack(">H", flags)
    out += struct.pack(">I", len(placements))
    enc = MQEncoder()
    iadt, iafs, iads, iait = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(codelen)
    del iait  # strips == 1: CURT never coded
    # group placements by row (T), ascending
    rows: dict[int, list[tuple[int, int]]] = {}
    for sid, sx, sy in placements:
        rows.setdefault(sy, []).append((sx, sid))
    _ia_encode(enc, iadt, 0)  # STRIPT init: 0
    stript = 0
    firsts = 0
    for t in sorted(rows):
        _ia_encode(enc, iadt, t - stript)
        stript = t
        insts = sorted(rows[t])
        fs = insts[0][0]
        _ia_encode(enc, iafs, fs - firsts)
        firsts = fs
        curs = fs
        for j, (sx, sid) in enumerate(insts):
            if j > 0:
                _ia_encode(enc, iads, sx - curs)
                curs = sx
            _iaid_encode(enc, iaid, sid)
            curs += symbols[sid].shape[1] - 1
        _ia_encode(enc, iads, _OOB)
    return out + enc.flush()


# ---------------------------------------------------------------------------
# halftone coding (T.88 §6.6 halftone region, §6.7 pattern dictionary,
# Annex C grayscale image decoding) — the mode scanned dithered/screened
# photos inside bilevel documents use
# ---------------------------------------------------------------------------

_MAX_PATTERN_PIXELS = 1 << 22  # pattern dictionary budget (DoS guard)


def _gray_at(template: int) -> list[tuple[int, int]]:
    """Annex C.5 adaptive pixels for grayscale bitplane decoding."""
    at = [((3 if template <= 1 else 2), -1), (-3, -1), (2, -2), (-2, -2)]
    return at if template == 0 else at[:1]


def _pattern_at(template: int, hdpw: int) -> list[tuple[int, int]]:
    """§6.7.5 adaptive pixels for the collective pattern bitmap."""
    at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
    return at if template == 0 else at[:1]


def pattern_dict_decode(body: bytes) -> list[np.ndarray]:
    """Pattern dictionary segment (type 16): one collective generic
    bitmap of (GRAYMAX+1) patterns side by side, split on decode."""
    if len(body) < 7:
        raise ValueError("truncated JBIG2 pattern dictionary")
    flags = body[0]
    if flags & 1:
        raise ValueError("MMR-coded pattern dictionary not supported")
    template = (flags >> 1) & 3
    hdpw, hdph = body[1], body[2]
    (graymax,) = struct.unpack_from(">I", body, 3)
    if hdpw < 1 or hdph < 1:
        raise ValueError("invalid pattern size")
    n = graymax + 1
    if n * hdpw * hdph > _MAX_PATTERN_PIXELS:
        raise ValueError(
            f"implausible pattern dictionary ({n} patterns of {hdpw}x{hdph})"
        )
    collective = generic_region_decode(
        body[7:], n * hdpw, hdph, template=template,
        at=_pattern_at(template, hdpw),
    )
    return [collective[:, k * hdpw : (k + 1) * hdpw] for k in range(n)]


def pattern_dict_encode(
    patterns: list[np.ndarray], template: int = 0
) -> bytes:
    """Fixture writer: the exact mirror of pattern_dict_decode."""
    if not patterns:
        raise ValueError("empty pattern list")
    hdph, hdpw = patterns[0].shape
    if any(p.shape != (hdph, hdpw) for p in patterns):
        raise ValueError("patterns must share one size")
    collective = np.hstack([(np.asarray(p) > 0).astype(np.uint8)
                            for p in patterns])
    data = generic_region_encode(
        collective, template=template, at=_pattern_at(template, hdpw)
    )
    return (
        bytes([template << 1, hdpw, hdph])
        + struct.pack(">I", len(patterns) - 1)
        + data
    )


def _compose_at(page: np.ndarray, bmp: np.ndarray, x: int, y: int,
                op: int) -> None:
    """Composite bmp onto page at (x, y) with clipping on all four sides
    and the five §6.6.5.1 combination operators."""
    ph, pw = page.shape
    bh, bw = bmp.shape
    sx, sy = max(0, -x), max(0, -y)
    ex = min(bw, pw - x)
    ey = min(bh, ph - y)
    if ex <= sx or ey <= sy:
        return
    src = bmp[sy:ey, sx:ex]
    tgt = page[y + sy : y + ey, x + sx : x + ex]
    if op == 0:
        tgt |= src
    elif op == 1:
        tgt &= src
    elif op == 2:
        tgt ^= src
    elif op == 3:
        tgt ^= src ^ 1  # XNOR
    else:  # 4 = REPLACE
        tgt[:] = src


def halftone_region_decode(
    body: bytes, patterns: list[np.ndarray]
) -> tuple[int, int, int, np.ndarray]:
    """Halftone region segment (types 20/22/23): decode the grayscale
    index image (Annex C, gray-coded bitplanes over ONE shared arithmetic
    decoder/context set) and stamp patterns along the 8.8 fixed-point
    grid (x = HGX + mg·HRY + ng·HRX, y = HGY + mg·HRX − ng·HRY).
    Returns (x, y, external_comb_op, bitmap)."""
    if not patterns:
        raise ValueError("halftone region without a pattern dictionary")
    w, h, x, y, comb, bpos = _parse_region_info(body, 0)
    if len(body) < bpos + 21:
        raise ValueError("truncated JBIG2 halftone region")
    flags = body[bpos]
    bpos += 1
    if flags & 1:
        raise ValueError("MMR-coded halftone region not supported")
    template = (flags >> 1) & 3
    if (flags >> 3) & 1:
        raise ValueError("HENABLESKIP halftone regions not supported")
    hcomb = (flags >> 4) & 7
    defpix = (flags >> 7) & 1
    hgw, hgh = struct.unpack_from(">II", body, bpos)
    bpos += 8
    hgx, hgy = struct.unpack_from(">ii", body, bpos)
    bpos += 8
    hrx, hry = struct.unpack_from(">HH", body, bpos)
    bpos += 4
    if w < 1 or h < 1 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible halftone region dims {w}x{h}")
    if hgw < 1 or hgh < 1 or hgw * hgh > _MAX_PIXELS:
        raise ValueError(f"implausible halftone grid {hgw}x{hgh}")
    if hcomb > 4:
        raise ValueError(f"unknown halftone combination operator {hcomb}")
    npats = len(patterns)
    bpp = (npats - 1).bit_length()
    gi = np.zeros((hgh, hgw), np.int64)
    if bpp:
        dec = MQDecoder(body[bpos:])
        pixels = _template_pixels(template, _gray_at(template))
        cx = _lazy_cx()
        prev = np.zeros((hgh, hgw), np.uint8)
        for j in range(bpp - 1, -1, -1):
            plane = _generic_decode_with(
                dec, cx, hgw, hgh, template, pixels, False
            )
            bit = plane ^ prev  # gray-code: bit_j = plane_j XOR bit_{j+1}
            gi |= bit.astype(np.int64) << j
            prev = bit
    region = np.full((h, w), defpix, np.uint8)
    np.minimum(gi, npats - 1, out=gi)  # spec: clamp out-of-range indices
    for mg in range(hgh):
        xx = hgx + mg * hry
        yy = hgy + mg * hrx
        for ng in range(hgw):
            _compose_at(region, patterns[gi[mg, ng]], xx >> 8, yy >> 8,
                        hcomb)
            xx += hrx
            yy -= hry
    return x, y, comb, region


def halftone_region_encode(
    gi: np.ndarray,
    patterns: list[np.ndarray],
    region_size: tuple[int, int],
    origin: tuple[int, int] = (0, 0),
    grid: tuple[int, int, int, int] | None = None,
    template: int = 0,
    comb: int = 0,
    hcomb: int = 0,
    defpix: int = 0,
) -> bytes:
    """Fixture writer: the exact mirror of halftone_region_decode.
    gi = (HGH, HGW) pattern indices; region_size = (w, h); grid =
    (HGX, HGY, HRX, HRY) in 8.8 fixed point (default: regular grid with
    the pattern width as the cell)."""
    gi = np.asarray(gi, np.int64)
    hgh, hgw = gi.shape
    npats = len(patterns)
    if npats < 1 or int(gi.max(initial=0)) >= npats or int(gi.min(initial=0)) < 0:
        raise ValueError("grayscale indices out of pattern range")
    hdph, hdpw = patterns[0].shape
    if grid is None:
        grid = (0, 0, hdpw << 8, 0)
    hgx, hgy, hrx, hry = grid
    w, h = region_size
    bpp = (npats - 1).bit_length()
    enc = MQEncoder()
    pixels = _template_pixels(template, _gray_at(template))
    cx = _lazy_cx()
    prev = np.zeros((hgh, hgw), np.uint8)
    for j in range(bpp - 1, -1, -1):
        bit = ((gi >> j) & 1).astype(np.uint8)
        plane = bit ^ prev  # gray-code: plane_j = bit_j XOR bit_{j+1}
        _generic_encode_with(enc, cx, plane, template, pixels, False)
        prev = bit
    data = enc.flush() if bpp else b""
    flags = (template << 1) | (hcomb << 4) | (defpix << 7)
    return (
        struct.pack(">IIIIB", w, h, origin[0], origin[1], comb)
        + bytes([flags])
        + struct.pack(">IIii", hgw, hgh, hgx, hgy)
        + struct.pack(">HH", hrx, hry)
        + data
    )


def jbig2_encode_halftone(
    gi: np.ndarray,
    patterns: list[np.ndarray],
    template: int = 0,
) -> bytes:
    """Fixture writer: embedded stream with page info, ONE pattern
    dictionary and ONE immediate halftone region on a regular grid."""
    gi = np.asarray(gi, np.int64)
    hgh, hgw = gi.shape
    hdph, hdpw = patterns[0].shape
    pw = (hgw - 1) * hdpw + hdpw
    ph = (hgh - 1) * hdpw + hdph  # row step is HRX>>8 = hdpw

    def seg(number: int, seg_type: int, body: bytes) -> bytes:
        return (
            struct.pack(">IB", number, seg_type)
            + b"\x00\x01"
            + struct.pack(">I", len(body))
            + body
        )

    page_info = struct.pack(">IIIIB", pw, ph, 0, 0, 0) + b"\x00\x00"
    dict_body = pattern_dict_encode(patterns, template=template)
    ht_body = halftone_region_encode(
        gi, patterns, (pw, ph), template=template
    )
    return (
        seg(0, 48, page_info)
        + seg(1, 16, dict_body)
        + seg(2, 22, ht_body)  # immediate halftone region
        + seg(3, 49, b"")
    )


def jbig2_encode_text(
    symbols: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    page_size: tuple[int, int],
    template: int = 0,
) -> bytes:
    """Fixture writer: embedded stream with page info, ONE symbol
    dictionary (all symbols exported; the dictionary reorders by height,
    the placement ids are remapped automatically) and ONE immediate text
    region. placements = [(symbol_index, x, y_top)]."""
    pw, ph = page_size

    def seg(number: int, seg_type: int, body: bytes) -> bytes:
        return (
            struct.pack(">IB", number, seg_type)
            + b"\x00\x01"
            + struct.pack(">I", len(body))
            + body
        )

    dict_body, order = symbol_dict_encode(symbols, template=template)
    new_id = {orig: i for i, orig in enumerate(order)}
    remapped = [(new_id[sid], x, y) for sid, x, y in placements]
    reordered = [symbols[i] for i in order]
    text_body = text_region_encode(remapped, reordered, pw, ph)
    page_info = struct.pack(">IIIIB", pw, ph, 0, 0, 0) + b"\x00\x00"
    return (
        seg(0, 48, page_info)
        + seg(1, 0, dict_body)
        + seg(2, 6, text_body)  # immediate text region
        + seg(3, 49, b"")
    )
