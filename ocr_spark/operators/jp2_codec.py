"""JPEG2000 lossless decoder (ITU-T T.800 / ISO 15444-1), pure
Python+numpy — the last raster format the PDF image path envelopes.

Scope: the REVERSIBLE path that PDF /JPXDecode scans and JP2 stills use
for lossless bilevel/gray/RGB — raw codestreams (SOC..EOC) and JP2 boxes:

  * markers: SIZ (image/tile geometry), COD (coding style, resolution
    levels, code-block size, progression), QCD (reversible no-quant
    signalling), SOT/SOD tile-parts, EOC;
  * packet headers: tag trees (B.10.2) for code-block inclusion and
    zero-bit-planes, coding-pass counts, Lblock length coding;
  * T1 code-block coding (Annex D): three passes per bit-plane
    (significance propagation, magnitude refinement, cleanup) over the
    MQ coder (shared with jbig2_codec), the 9 zero-coding contexts per
    band orientation, 5 sign contexts with XOR-bit, 3 refinement
    contexts, run-length + UNIFORM contexts in cleanup, stripe-column
    scan order;
  * the reversible 5'3 wavelet (lifting inverse, F.3.8) across
    resolution levels, and the reversible component transform (RCT);
  * the matching ENCODER for every layer (tag trees, T1 passes, packet
    assembly, forward 5/3, codestream writer) so fixtures round-trip
    real codestreams bit-exactly.

Also in scope since round 5 session 12: the IRREVERSIBLE path —
9/7 float wavelet (F.4.8, spec scaling so band log2 gains are 0/1/2),
scalar quantization with E.1 (εb, μb)-coded steps (QCD styles 1 scalar
derived and 2 scalar expounded, midpoint r=0.5 reconstruction), and the
ICT (G.2) for RGB — the photographic profile real crawl JPX assets use —
plus MULTI-TILE grids (B.3, raster order, tile dims a multiple of
2^levels so tile origins stay even at every DWT level) and multiple
tile-parts per tile (A.4.2, TPsot-ordered concatenation). The matching
encoder emits real quantized/tiled codestreams for round-trips.

Out of scope (named ValueError envelopes): multiple layers/precincts
beyond the defaults, offset reference grids, ROI, and JPIP.

Layout notes kept deliberately simple and spec-conformant: one tile, one
layer, LRCP progression, full-size precincts, no SOP/EPH markers — which
is exactly what `opj_compress -r 1` class encoders emit for lossless.
"""

from __future__ import annotations

import struct

import numpy as np

from ocr_spark.operators.jbig2_codec import _QE as _QE_JP2
from ocr_spark.operators.jbig2_codec import MQDecoder, MQEncoder

# ---------------------------------------------------------------------------
# tag trees (T.800 B.10.2)
# ---------------------------------------------------------------------------


class _BitWriter:
    """Packet-header bit writer with 0xFF stuffing (B.10.1)."""

    def __init__(self):
        self.bytes = bytearray()
        self.bits = 0
        self.nbits = 0

    def put(self, bit: int) -> None:
        limit = 7 if self.bytes and self.bytes[-1] == 0xFF else 8
        self.bits = (self.bits << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == limit:
            self.bytes.append(self.bits)
            self.bits = 0
            self.nbits = 0

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1)

    def flush(self) -> bytes:
        while self.nbits:
            self.put(0)
        if self.bytes and self.bytes[-1] == 0xFF:
            self.bytes.append(0)  # a packet may not end on 0xFF
        return bytes(self.bytes)


class _BitReader:
    """Packet-header bit reader with 0xFF stuffing removal."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("packet header truncated")
            b = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
            self.bits = b
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def byte_pos(self) -> int:
        return self.pos


def _tt_levels(h: int, w: int):
    levels = []
    while True:
        levels.append((h, w))
        if h == 1 and w == 1:
            break
        h, w = (h + 1) // 2, (w + 1) // 2
    return levels


class TagTree:
    """B.10.2 tag tree over (h, w) leaves. One instance per role per
    precinct: the ENCODER pre-sets true node values with set_values(); the
    DECODER starts empty and discovers them. Node state follows the
    classic formulation: `value` is the current lower bound (exact when
    `known`), `low` the per-node emitted bound; a 0 bit raises the bound,
    a single 1 bit pins the value."""

    def __init__(self, h: int, w: int):
        if h <= 0 or w <= 0:
            raise ValueError("tag tree dims must be positive")
        self.levels = _tt_levels(h, w)
        self.n = len(self.levels)
        self.value = [[[0] * aw for _ in range(ah)] for ah, aw in self.levels]
        self.low = [[[0] * aw for _ in range(ah)] for ah, aw in self.levels]
        self.known = [
            [[False] * aw for _ in range(ah)] for ah, aw in self.levels
        ]

    def set_values(self, leaves) -> None:
        """Encoder init: leaf values, parents = min over children."""
        h0, w0 = self.levels[0]
        for y in range(h0):
            for x in range(w0):
                self.value[0][y][x] = int(leaves[y][x])
        for li in range(1, self.n):
            ah, aw = self.levels[li]
            ph, pw = self.levels[li - 1]
            prev = self.value[li - 1]
            cur = self.value[li]
            for y in range(ah):
                for x in range(aw):
                    vals = [
                        prev[2 * y + dy][2 * x + dx]
                        for dy in (0, 1)
                        for dx in (0, 1)
                        if 2 * y + dy < ph and 2 * x + dx < pw
                    ]
                    cur[y][x] = min(vals)

    def encode(self, wr: _BitWriter, y: int, x: int, threshold: int) -> None:
        low = 0
        for li in range(self.n - 1, -1, -1):
            yy, xx = y >> li, x >> li
            if low > self.low[li][yy][xx]:
                self.low[li][yy][xx] = low
            else:
                low = self.low[li][yy][xx]
            v = self.value[li][yy][xx]
            while low < threshold:
                if low >= v:
                    if not self.known[li][yy][xx]:
                        wr.put(1)
                        self.known[li][yy][xx] = True
                    break
                wr.put(0)
                low += 1
            self.low[li][yy][xx] = low

    def decode(self, rd: _BitReader, y: int, x: int, threshold: int) -> bool:
        """True iff value(y, x) < threshold (then self.value[0][y][x] is
        the exact value)."""
        low = 0
        for li in range(self.n - 1, -1, -1):
            yy, xx = y >> li, x >> li
            if low > self.low[li][yy][xx]:
                self.low[li][yy][xx] = low
            else:
                low = self.low[li][yy][xx]
            while low < threshold and not self.known[li][yy][xx]:
                if rd.get():
                    self.known[li][yy][xx] = True
                else:
                    low += 1
            self.value[li][yy][xx] = low
            self.low[li][yy][xx] = low
        return self.known[0][y][x] and self.value[0][y][x] < threshold


# ---------------------------------------------------------------------------
# T1 code-block coding (T.800 Annex D): three passes per bit-plane over the
# MQ coder. Context numbering: 0-8 zero coding, 9-13 sign coding (with XOR
# bit), 14-16 magnitude refinement, 17 run-length, 18 UNIFORM. Initial MQ
# states per Table D.7: UNIFORM=46, RL=3, ZC context 0=4, all others 0.
# ---------------------------------------------------------------------------


def _zc_lut(orient: str):
    """Zero-coding context from (H, V, D) neighbor significance sums."""
    lut = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if orient == "HL":
                    h_, v_ = v, h  # HL: transpose roles
                else:
                    h_, v_ = h, v
                if orient == "HH":
                    hv = h + v
                    if d >= 3:
                        cx = 8
                    elif d == 2:
                        cx = 7 if hv >= 1 else 6
                    elif d == 1:
                        cx = 5 if hv >= 2 else (4 if hv == 1 else 3)
                    else:
                        cx = 2 if hv >= 2 else (1 if hv == 1 else 0)
                else:
                    if h_ == 2:
                        cx = 8
                    elif h_ == 1:
                        cx = 7 if v_ >= 1 else (6 if d >= 1 else 5)
                    else:
                        if v_ == 2:
                            cx = 4
                        elif v_ == 1:
                            cx = 3
                        else:
                            cx = 2 if d >= 2 else (1 if d == 1 else 0)
                lut[(h, v, d)] = cx
    return lut


_ZC_LUTS = {o: _zc_lut(o) for o in ("LL", "LH", "HL", "HH")}

# sign-coding: (Hc, Vc) -> (context, xor_bit), Hc/Vc in {-1, 0, 1}
_SC_LUT = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}

_N_CTX = 19
_CTX_UNIFORM = 18
_CTX_RL = 17


def _t1_init_states():
    st = [[0, 0] for _ in range(_N_CTX)]
    st[_CTX_UNIFORM][0] = 46
    st[_CTX_RL][0] = 3
    st[0][0] = 4  # ZC context 0
    return st


class _T1:
    """Shared state machinery for the T1 encoder and decoder: significance,
    sign, visited maps with border padding, context formation."""

    def __init__(self, h: int, w: int, orient: str):
        self.h, self.w = h, w
        self.zc = _ZC_LUTS[orient]
        # padded maps (1-px border) so neighbor reads never branch
        self.sig = [[0] * (w + 2) for _ in range(h + 2)]
        self.sgn = [[0] * (w + 2) for _ in range(h + 2)]  # +1 / -1
        self.visited = [[False] * (w + 2) for _ in range(h + 2)]
        self.refined = [[False] * (w + 2) for _ in range(h + 2)]

    def zc_ctx(self, y: int, x: int) -> int:
        s = self.sig
        yy, xx = y + 1, x + 1
        hsum = s[yy][xx - 1] + s[yy][xx + 1]
        vsum = s[yy - 1][xx] + s[yy + 1][xx]
        dsum = (
            s[yy - 1][xx - 1] + s[yy - 1][xx + 1]
            + s[yy + 1][xx - 1] + s[yy + 1][xx + 1]
        )
        return self.zc[(hsum, vsum, dsum)]

    def sc_ctx(self, y: int, x: int):
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1
        hc = min(1, max(-1, s[yy][xx - 1] * g[yy][xx - 1]
                        + s[yy][xx + 1] * g[yy][xx + 1]))
        vc = min(1, max(-1, s[yy - 1][xx] * g[yy - 1][xx]
                        + s[yy + 1][xx] * g[yy + 1][xx]))
        return _SC_LUT[(hc, vc)]

    def mr_ctx(self, y: int, x: int) -> int:
        if self.refined[y + 1][x + 1]:
            return 16
        s = self.sig
        yy, xx = y + 1, x + 1
        any_sig = (
            s[yy][xx - 1] or s[yy][xx + 1] or s[yy - 1][xx] or s[yy + 1][xx]
            or s[yy - 1][xx - 1] or s[yy - 1][xx + 1]
            or s[yy + 1][xx - 1] or s[yy + 1][xx + 1]
        )
        return 15 if any_sig else 14

    def has_sig_neighbor(self, y: int, x: int) -> bool:
        s = self.sig
        yy, xx = y + 1, x + 1
        return bool(
            s[yy][xx - 1] or s[yy][xx + 1] or s[yy - 1][xx] or s[yy + 1][xx]
            or s[yy - 1][xx - 1] or s[yy - 1][xx + 1]
            or s[yy + 1][xx - 1] or s[yy + 1][xx + 1]
        )


def _stripe_cols(h: int, w: int):
    """Scan order: stripes of 4 rows, columns left->right, 4 rows each."""
    for y0 in range(0, h, 4):
        for x in range(w):
            yield y0, x


def t1_encode_block(
    coeffs: np.ndarray, orient: str, numbps: int
) -> tuple[bytes, int]:
    """Encode one code-block of signed integer coefficients. Returns
    (codeword segment, n_passes). numbps = magnitude bit-planes coded
    (plane numbps-1 down to 0); caller guarantees |coeff| < 2**numbps."""
    h, w = coeffs.shape
    t1 = _T1(h, w, orient)
    mag = np.abs(coeffs).astype(np.int64)
    sign = (coeffs < 0).astype(np.int64)
    enc = MQEncoder()
    cx = _t1_init_states()
    n_passes = 0
    for plane in range(numbps - 1, -1, -1):
        bit = ((mag >> plane) & 1).tolist()
        maglist = mag.tolist()
        if plane < numbps - 1:
            # significance propagation pass
            for y0, x in _stripe_cols(h, w):
                for y in range(y0, min(y0 + 4, h)):
                    if t1.sig[y + 1][x + 1]:
                        t1.visited[y + 1][x + 1] = False
                        continue
                    if not t1.has_sig_neighbor(y, x):
                        t1.visited[y + 1][x + 1] = False
                        continue
                    b = bit[y][x]
                    enc.encode(cx[t1.zc_ctx(y, x)], b)
                    if b:
                        sctx, xbit = t1.sc_ctx(y, x)
                        enc.encode(cx[sctx], int(sign[y][x]) ^ xbit)
                        t1.sig[y + 1][x + 1] = 1
                        t1.sgn[y + 1][x + 1] = -1 if sign[y][x] else 1
                    t1.visited[y + 1][x + 1] = True
            n_passes += 1
            # magnitude refinement pass
            for y0, x in _stripe_cols(h, w):
                for y in range(y0, min(y0 + 4, h)):
                    if not t1.sig[y + 1][x + 1] or t1.visited[y + 1][x + 1]:
                        continue
                    if maglist[y][x] >> (plane + 1) == 0:
                        continue  # became significant this plane: skip
                    enc.encode(cx[t1.mr_ctx(y, x)], bit[y][x])
                    t1.refined[y + 1][x + 1] = True
            n_passes += 1
        # cleanup pass
        for y0, x in _stripe_cols(h, w):
            full = y0 + 4 <= h
            run_mode = False
            if full:
                ok = True
                for y in range(y0, y0 + 4):
                    if (
                        t1.sig[y + 1][x + 1]
                        or t1.visited[y + 1][x + 1]
                        or t1.has_sig_neighbor(y, x)
                    ):
                        ok = False
                        break
                if ok:
                    run_mode = True
                    first = -1
                    for y in range(y0, y0 + 4):
                        if bit[y][x]:
                            first = y - y0
                            break
                    if first < 0:
                        enc.encode(cx[_CTX_RL], 0)
                        for y in range(y0, y0 + 4):
                            t1.visited[y + 1][x + 1] = False
                        continue
                    enc.encode(cx[_CTX_RL], 1)
                    enc.encode(cx[_CTX_UNIFORM], (first >> 1) & 1)
                    enc.encode(cx[_CTX_UNIFORM], first & 1)
                    y = y0 + first
                    sctx, xbit = t1.sc_ctx(y, x)
                    enc.encode(cx[sctx], int(sign[y][x]) ^ xbit)
                    t1.sig[y + 1][x + 1] = 1
                    t1.sgn[y + 1][x + 1] = -1 if sign[y][x] else 1
                    start = first + 1
                else:
                    start = 0
            else:
                start = 0
            for yi in range(start if run_mode else 0, 4):
                y = y0 + yi
                if y >= h:
                    break
                if t1.sig[y + 1][x + 1] or t1.visited[y + 1][x + 1]:
                    t1.visited[y + 1][x + 1] = False
                    continue
                b = bit[y][x]
                enc.encode(cx[t1.zc_ctx(y, x)], b)
                if b:
                    sctx, xbit = t1.sc_ctx(y, x)
                    enc.encode(cx[sctx], int(sign[y][x]) ^ xbit)
                    t1.sig[y + 1][x + 1] = 1
                    t1.sgn[y + 1][x + 1] = -1 if sign[y][x] else 1
                t1.visited[y + 1][x + 1] = False
        # clear visited for next plane
        for row in t1.visited:
            for i in range(len(row)):
                row[i] = False
        n_passes += 1
    return enc.flush(), n_passes


def _zc_flat(orient: str):
    """Flat ZC LUT: index (h*3+v)*5+d."""
    lut = _ZC_LUTS[orient]
    return [lut[(h, v, d)] for h in range(3) for v in range(3) for d in range(5)]


_ZC_FLAT = {o: _zc_flat(o) for o in ("LL", "LH", "HL", "HH")}


def t1_decode_block(
    data: bytes, h: int, w: int, orient: str, numbps: int, n_passes: int
) -> np.ndarray:
    """Decode one code-block segment back to signed integer coefficients.

    Hot path of JPX decode: flat padded state arrays, LUT-indexed contexts
    and an inlined MQ loop with local-variable coder state (the same shape
    as jbig2_codec's fast path; ~1.3x the gather version it replaced —
    the floor is pixels x planes x passes, not call overhead). Behavior
    is pinned by the round-trip
    matrix in tests/test_jp2.py against the gather-style encoder."""
    W2 = w + 2
    size = (h + 2) * W2
    sig = [0] * size
    sgn = [0] * size
    visited = [0] * size
    refined = [0] * size
    mag = [0] * (h * w)
    zc = _ZC_FLAT[orient]
    # MQ decoder state in locals
    d8 = data
    n = len(d8)
    bp = 0
    c = (d8[0] if n else 0xFF) << 16
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
    idx = [0] * _N_CTX
    mps = [0] * _N_CTX
    idx[_CTX_UNIFORM] = 46
    idx[_CTX_RL] = 3
    idx[0] = 4
    qe_t = _QE_JP2

    def _dec(cxi: int) -> int:
        nonlocal a, c, ct, bp
        i = idx[cxi]
        qe, nmps, nlps, switch = qe_t[i]
        a -= qe
        if ((c >> 16) & 0xFFFF) < qe:
            if a < qe:
                d = mps[cxi]
                idx[cxi] = nmps
            else:
                d = 1 - mps[cxi]
                if switch:
                    mps[cxi] = d
                idx[cxi] = nlps
            a = qe
        else:
            c = (c - (qe << 16)) & 0xFFFFFFFF
            if a & 0x8000:
                return mps[cxi]
            if a < qe:
                d = 1 - mps[cxi]
                if switch:
                    mps[cxi] = d
                idx[cxi] = nlps
            else:
                d = mps[cxi]
                idx[cxi] = nmps
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

    def _sc(p: int):
        l, r = sig[p - 1] * sgn[p - 1], sig[p + 1] * sgn[p + 1]
        u, dn = sig[p - W2] * sgn[p - W2], sig[p + W2] * sgn[p + W2]
        hc = l + r
        hc = 1 if hc > 0 else (-1 if hc < 0 else 0)
        vc = u + dn
        vc = 1 if vc > 0 else (-1 if vc < 0 else 0)
        return _SC_LUT[(hc, vc)]

    passes_done = 0
    plane = numbps - 1
    first_plane = True
    while passes_done < n_passes and plane >= 0:
        bitval = 1 << plane
        if not first_plane:
            # significance propagation
            for y0 in range(0, h, 4):
                ylim = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, ylim):
                        p = (y + 1) * W2 + x + 1
                        if sig[p]:
                            visited[p] = 0
                            continue
                        hsum = sig[p - 1] + sig[p + 1]
                        vsum = sig[p - W2] + sig[p + W2]
                        dsum = (
                            sig[p - W2 - 1] + sig[p - W2 + 1]
                            + sig[p + W2 - 1] + sig[p + W2 + 1]
                        )
                        if not (hsum or vsum or dsum):
                            visited[p] = 0
                            continue
                        if _dec(zc[(hsum * 3 + vsum) * 5 + dsum]):
                            sctx, xbit = _sc(p)
                            sbit = _dec(sctx) ^ xbit
                            mag[y * w + x] |= bitval
                            sig[p] = 1
                            sgn[p] = -1 if sbit else 1
                        visited[p] = 1
            passes_done += 1
            if passes_done >= n_passes:
                break
            # magnitude refinement
            for y0 in range(0, h, 4):
                ylim = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, ylim):
                        p = (y + 1) * W2 + x + 1
                        if not sig[p] or visited[p]:
                            continue
                        if mag[y * w + x] >> (plane + 1) == 0:
                            continue
                        if refined[p]:
                            cxi = 16
                        elif (
                            sig[p - 1] or sig[p + 1] or sig[p - W2]
                            or sig[p + W2] or sig[p - W2 - 1]
                            or sig[p - W2 + 1] or sig[p + W2 - 1]
                            or sig[p + W2 + 1]
                        ):
                            cxi = 15
                        else:
                            cxi = 14
                        if _dec(cxi):
                            mag[y * w + x] |= bitval
                        refined[p] = 1
            passes_done += 1
            if passes_done >= n_passes:
                break
        # cleanup
        for y0 in range(0, h, 4):
            full = y0 + 4 <= h
            ylim = min(y0 + 4, h)
            for x in range(w):
                start = 0
                run_mode = False
                if full:
                    ok = True
                    for y in range(y0, y0 + 4):
                        p = (y + 1) * W2 + x + 1
                        if sig[p] or visited[p] or (
                            sig[p - 1] or sig[p + 1] or sig[p - W2]
                            or sig[p + W2] or sig[p - W2 - 1]
                            or sig[p - W2 + 1] or sig[p + W2 - 1]
                            or sig[p + W2 + 1]
                        ):
                            ok = False
                            break
                    if ok:
                        run_mode = True
                        if not _dec(_CTX_RL):
                            for y in range(y0, y0 + 4):
                                visited[(y + 1) * W2 + x + 1] = 0
                            continue
                        first = (_dec(_CTX_UNIFORM) << 1) | _dec(_CTX_UNIFORM)
                        y = y0 + first
                        p = (y + 1) * W2 + x + 1
                        sctx, xbit = _sc(p)
                        sbit = _dec(sctx) ^ xbit
                        mag[y * w + x] |= bitval
                        sig[p] = 1
                        sgn[p] = -1 if sbit else 1
                        start = first + 1
                for yi in range(start if run_mode else 0, 4):
                    y = y0 + yi
                    if y >= ylim:
                        break
                    p = (y + 1) * W2 + x + 1
                    if sig[p] or visited[p]:
                        visited[p] = 0
                        continue
                    hsum = sig[p - 1] + sig[p + 1]
                    vsum = sig[p - W2] + sig[p + W2]
                    dsum = (
                        sig[p - W2 - 1] + sig[p - W2 + 1]
                        + sig[p + W2 - 1] + sig[p + W2 + 1]
                    )
                    if _dec(zc[(hsum * 3 + vsum) * 5 + dsum]):
                        sctx, xbit = _sc(p)
                        sbit = _dec(sctx) ^ xbit
                        mag[y * w + x] |= bitval
                        sig[p] = 1
                        sgn[p] = -1 if sbit else 1
                    visited[p] = 0
        passes_done += 1
        for i in range(size):
            visited[i] = 0
        plane -= 1
        first_plane = False
    out = np.zeros((h, w), dtype=np.int64)
    flat = out.reshape(-1)
    for y in range(h):
        base = (y + 1) * W2 + 1
        row = y * w
        for x in range(w):
            v = mag[row + x]
            if v and sgn[base + x] < 0:
                v = -v
            flat[row + x] = v
    return out


# ---------------------------------------------------------------------------
# reversible 5/3 wavelet (T.800 Annex F) + reversible component transform
# ---------------------------------------------------------------------------


def dwt53_forward(img: np.ndarray, levels: int):
    """Multi-level 2-D forward 5/3: returns (LL, [(HL, LH, HH) per level,
    finest first])."""
    ll = img.astype(np.int64)
    bands = []
    for _ in range(levels):
        # columns then rows (consistently mirrored in the inverse)
        lo_c, hi_c = _dwt53_fwd_axis(ll, axis=0)
        ll_, hl = _dwt53_fwd_axis(lo_c, axis=1)
        lh, hh = _dwt53_fwd_axis(hi_c, axis=1)
        bands.append((hl, lh, hh))
        ll = ll_
    return ll, bands


def _dwt53_fwd_axis(a: np.ndarray, axis: int):
    if axis == 1:
        lo, hi = _dwt53_fwd_axis(a.T, 0)
        return lo.T, hi.T
    if a.shape[0] == 1:
        return a.astype(np.int64), a[:0].astype(np.int64)
    ev = a[0::2].astype(np.int64)
    od = a[1::2].astype(np.int64)
    ns, nd = ev.shape[0], od.shape[0]
    if nd:
        ev_right = np.empty_like(od)
        ev_right[: min(nd, ns - 1)] = ev[1 : min(nd, ns - 1) + 1]
        if nd > ns - 1:
            ev_right[ns - 1 :] = ev[-1]
        d = od - ((ev[:nd] + ev_right) >> 1)
    else:
        d = od
    dl = _dl2(d, ns)
    dr = _dr2(d, ns)
    s = ev + ((dl + dr + 2) >> 2)
    return s, d


def _dl2(d: np.ndarray, ns: int) -> np.ndarray:
    if d.shape[0] == 0:
        return np.zeros((ns,) + d.shape[1:], np.int64)
    idx = np.clip(np.arange(ns) - 1, 0, d.shape[0] - 1)
    return d[idx]


def _dr2(d: np.ndarray, ns: int) -> np.ndarray:
    if d.shape[0] == 0:
        return np.zeros((ns,) + d.shape[1:], np.int64)
    idx = np.clip(np.arange(ns), 0, d.shape[0] - 1)
    return d[idx]


def _dwt53_inv_axis(s: np.ndarray, d: np.ndarray, axis: int) -> np.ndarray:
    if axis == 1:
        return _dwt53_inv_axis(s.T, d.T, 0).T
    ns, nd = s.shape[0], d.shape[0]
    ev = s.astype(np.int64) - ((_dl2(d, ns) + _dr2(d, ns) + 2) >> 2)
    if nd:
        ev_right = np.empty_like(d)
        ev_right[: min(nd, ns - 1)] = ev[1 : min(nd, ns - 1) + 1]
        if nd > ns - 1:
            ev_right[ns - 1 :] = ev[-1]
        od = d + ((ev[:nd] + ev_right) >> 1)
    else:
        od = d.astype(np.int64)
    out = np.empty((ns + nd,) + s.shape[1:], np.int64)
    out[0::2] = ev
    out[1::2] = od
    return out


def dwt53_inverse(ll: np.ndarray, bands) -> np.ndarray:
    for hl, lh, hh in reversed(bands):
        lo_c = _dwt53_inv_axis(ll, hl, axis=1)
        hi_c = _dwt53_inv_axis(lh, hh, axis=1)
        ll = _dwt53_inv_axis(lo_c, hi_c, axis=0)
    return ll


# ---------------------------------------------------------------------------
# irreversible 9/7 wavelet (T.800 F.4.8.1/F.4.8.2, Table F.4 constants).
# Same even/odd clamped-neighbor structure as the 5/3 above — the index
# clamping IS whole-sample symmetric extension for these 2-tap lifting
# supports. Scaling convention matches the spec/OpenJPEG: the stored low
# band is s/K and the stored high band is d*(K/2), so a constant image has
# LL == the constant (analysis lowpass DC gain 1, band log2 gains 0/1/2 as
# assumed by the E.1 dequantization table).
# ---------------------------------------------------------------------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _lift_pair(ev: np.ndarray, od: np.ndarray, coef: float):
    """od[i] += coef * (ev[i] + ev[i+1]) with right-edge clamp."""
    nd, ns = od.shape[0], ev.shape[0]
    ev_right = np.empty_like(od)
    ev_right[: min(nd, ns - 1)] = ev[1 : min(nd, ns - 1) + 1]
    if nd > ns - 1:
        ev_right[ns - 1 :] = ev[-1]
    return od + coef * (ev[:nd] + ev_right)


def _lift_pair_rev(od: np.ndarray, ev: np.ndarray, coef: float):
    """ev[i] += coef * (od[i-1] + od[i]) with edge clamps (ns samples)."""
    ns = ev.shape[0]
    return ev + coef * (_dl2(od, ns) + _dr2(od, ns))


def _dwt97_fwd_axis(a: np.ndarray, axis: int):
    if axis == 1:
        lo, hi = _dwt97_fwd_axis(a.T, 0)
        return lo.T, hi.T
    a = a.astype(np.float64)
    if a.shape[0] == 1:
        return a, a[:0]
    ev, od = a[0::2], a[1::2]
    if od.shape[0] == 0:
        return ev, od
    d = _lift_pair(ev, od, _A97)
    s = _lift_pair_rev(d, ev, _B97)
    d = _lift_pair(s, d, _G97)
    s = _lift_pair_rev(d, s, _D97)
    return s * (1.0 / _K97), d * (_K97 / 2.0)


def _dwt97_inv_axis(s: np.ndarray, d: np.ndarray, axis: int) -> np.ndarray:
    if axis == 1:
        return _dwt97_inv_axis(s.T, d.T, 0).T
    ns, nd = s.shape[0], d.shape[0]
    if nd == 0:
        out = np.asarray(s, np.float64).copy()
        return out
    s = np.asarray(s, np.float64) * _K97
    d = np.asarray(d, np.float64) * (2.0 / _K97)
    s = _lift_pair_rev(d, s, -_D97)
    d = _lift_pair(s, d, -_G97)
    ev = _lift_pair_rev(d, s, -_B97)
    od = _lift_pair(ev, d, -_A97)
    out = np.empty((ns + nd,) + s.shape[1:], np.float64)
    out[0::2] = ev
    out[1::2] = od
    return out


def dwt97_forward(img: np.ndarray, levels: int):
    """Multi-level 2-D forward 9/7 (float): returns (LL, [(HL, LH, HH)
    per level, finest first]) — same layout contract as dwt53_forward."""
    ll = img.astype(np.float64)
    bands = []
    for _ in range(levels):
        lo_c, hi_c = _dwt97_fwd_axis(ll, axis=0)
        ll_, hl = _dwt97_fwd_axis(lo_c, axis=1)
        lh, hh = _dwt97_fwd_axis(hi_c, axis=1)
        bands.append((hl, lh, hh))
        ll = ll_
    return ll, bands


def dwt97_inverse(ll: np.ndarray, bands) -> np.ndarray:
    for hl, lh, hh in reversed(bands):
        lo_c = _dwt97_inv_axis(ll, hl, axis=1)
        hi_c = _dwt97_inv_axis(lh, hh, axis=1)
        ll = _dwt97_inv_axis(lo_c, hi_c, axis=0)
    return ll


def ict_forward(rgb: np.ndarray):
    """Irreversible component transform (T.800 G.2: the JPEG YCbCr)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def ict_inverse(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _qstep(rb: int, eps: int, mu: int) -> float:
    """E.1 quantization step: Δb = 2^(Rb-εb) · (1 + μb/2^11)."""
    return (1.0 + mu / 2048.0) * 2.0 ** (rb - eps)


def _qstep_to_code(delta: float, rb: int) -> tuple[int, int]:
    """Inverse of _qstep: the (εb, μb) pair whose coded step is closest to
    (and deterministically derived from) the requested delta."""
    import math

    if delta <= 0:
        raise ValueError("quantization step must be positive")
    f = math.floor(math.log2(delta))
    eps = rb - f
    mu = round((delta / 2.0 ** f - 1.0) * 2048.0)
    if mu > 2047:  # mantissa rounding crossed the octave
        mu = 0
        eps -= 1
    if not 0 <= eps <= 31:
        raise ValueError(f"quantization exponent {eps} out of range for Rb={rb}")
    return eps, mu


def rct_forward(rgb: np.ndarray):
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (r + 2 * g + b) >> 2
    cb = b - g
    cr = r - g
    return y, cb, cr


def rct_inverse(y, cb, cr) -> np.ndarray:
    g = y - ((cb + cr) >> 2)
    r = cr + g
    b = cb + g
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# codestream (T.800 Annex A markers + B.9/B.10 packets): single tile, one
# layer, LRCP, full precincts, reversible path
# ---------------------------------------------------------------------------

_GUARD_BITS = 2
# tighter than the general raster guard (64 Mpx): T1 decode is ~0.1
# Mpx/s of sequential Python (cost = pixels x bit-planes x 3 passes), so
# unbounded declared dims are a CPU DoS; 16 Mpx covers A4 at 400 dpi
_MAX_PIXELS = 16_000_000


def _cb_grid(bh: int, bw: int, cb: int):
    """Code-block tiling of a band (origin 0): rows x cols of (y0,x0,h,w)."""
    rows = (bh + cb - 1) // cb
    cols = (bw + cb - 1) // cb
    grid = []
    for r in range(rows):
        for c in range(cols):
            y0, x0 = r * cb, c * cb
            grid.append((y0, x0, min(cb, bh - y0), min(cb, bw - x0)))
    return rows, cols, grid


def _npasses_put(wr: _BitWriter, n: int) -> None:
    if n == 1:
        wr.put(0)
    elif n == 2:
        wr.put_bits(0b10, 2)
    elif n <= 5:
        wr.put_bits(0b11, 2)
        wr.put_bits(n - 3, 2)
    elif n <= 36:
        wr.put_bits(0b1111, 4)
        wr.put_bits(n - 6, 5)
    elif n <= 164:
        wr.put_bits(0b111111111, 9)
        wr.put_bits(n - 37, 7)
    else:
        raise ValueError(f"too many coding passes {n}")


def _npasses_get(rd: _BitReader) -> int:
    if not rd.get():
        return 1
    if not rd.get():
        return 2
    v = rd.get_bits(2)
    if v < 3:
        return 3 + v
    v = rd.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + rd.get_bits(7)


def _encode_packet(bands: list) -> bytes:
    """One packet (one resolution, one component, layer 0). bands =
    [(orient, coeffs_2d, Mb)]. Returns header+bodies bytes (the header is
    byte-aligned; code-block bodies follow in header order)."""
    import math

    wr = _BitWriter()
    body = bytearray()
    if not any(b[1].size for b in bands):
        wr.put(0)
        return wr.flush()
    wr.put(1)  # non-empty
    for orient, coeffs, mb in bands:
        if coeffs.size == 0:
            continue
        bh, bw = coeffs.shape
        rows, cols, grid = _cb_grid(bh, bw, _CB)
        incl = TagTree(rows, cols)
        zbp_tt = TagTree(rows, cols)
        incl.set_values([[0] * cols for _ in range(rows)])
        zbps, segs = [], []
        for y0, x0, h, w in grid:
            blk = coeffs[y0 : y0 + h, x0 : x0 + w]
            maxa = int(np.abs(blk).max()) if blk.size else 0
            nb = maxa.bit_length()
            zbp = mb - nb if nb else mb
            if zbp < 0:
                raise ValueError(
                    f"band {orient}: coefficient needs {nb} bits > Mb={mb}"
                )
            numbps = mb - zbp
            if numbps > 0:
                data, np_ = t1_encode_block(blk, orient, numbps)
            else:
                data, np_ = b"", 1  # all-zero block: one empty cleanup
            zbps.append(zbp)
            segs.append((data, np_))
        zbp_tt.set_values(
            [[zbps[r * cols + c] for c in range(cols)] for r in range(rows)]
        )
        for i in range(len(grid)):
            r, c = i // cols, i % cols
            incl.encode(wr, r, c, 1)  # all included (value 0 < 1)
            t = 1
            while True:
                zbp_tt.encode(wr, r, c, t)
                if zbps[i] < t:
                    break
                t += 1
            data, np_ = segs[i]
            _npasses_put(wr, np_)
            extra = int(math.floor(math.log2(np_))) if np_ > 1 else 0
            lblock = 3
            nbits = max(1, len(data).bit_length())
            while lblock + extra < nbits:
                wr.put(1)
                lblock += 1
            wr.put(0)
            wr.put_bits(len(data), lblock + extra)
            body.extend(data)
    return wr.flush() + bytes(body)


def _decode_packet(data: bytes, pos: int, bands: list) -> int:
    """Mirror of _encode_packet over the tile byte stream starting at pos.
    bands = [(orient, out_array, Mb)]; fills out_array in place. Returns
    the position just past this packet."""
    import math

    rd = _BitReader(data[pos:])
    if not rd.get():
        return pos + rd.pos + (1 if rd.prev_ff else 0)
    todo = []  # (orient, out, y0, x0, h, w, numbps, npasses, seglen)
    for orient, out, mb in bands:
        if out.size == 0:
            continue
        bh, bw = out.shape
        rows, cols, grid = _cb_grid(bh, bw, _CB)
        incl = TagTree(rows, cols)
        zbp_tt = TagTree(rows, cols)
        for i, (y0, x0, h, w) in enumerate(grid):
            r, c = i // cols, i % cols
            if not incl.decode(rd, r, c, 1):
                continue
            t = 1
            while not zbp_tt.decode(rd, r, c, t):
                t += 1
            zbp = zbp_tt.value[0][r][c]
            np_ = _npasses_get(rd)
            extra = int(math.floor(math.log2(np_))) if np_ > 1 else 0
            lblock = 3
            while rd.get():
                lblock += 1
            seglen = rd.get_bits(lblock + extra)
            todo.append((orient, out, y0, x0, h, w, mb - zbp, np_, seglen))
    bpos = pos + rd.pos + (1 if rd.prev_ff else 0)
    for orient, out, y0, x0, h, w, numbps, np_, seglen in todo:
        seg = data[bpos : bpos + seglen]
        if len(seg) < seglen:
            raise ValueError("packet body truncated")
        bpos += seglen
        if numbps <= 0:
            continue
        out[y0 : y0 + h, x0 : x0 + w] = t1_decode_block(
            seg, h, w, orient, numbps, np_
        )
    return bpos


_CB = 64  # code-block nominal size (xcb=6)


def _band_eps(mb: int) -> int:
    """QCD exponent for a band coded with mb bit-planes (E.1: Mb = G +
    eps - 1)."""
    eps = mb - _GUARD_BITS + 1
    if not 0 <= eps <= 31:
        raise ValueError(f"QCD exponent {eps} out of range")
    return eps


def _component_bands(comp: np.ndarray, levels: int):
    """Forward DWT -> [(resolution, [(orient, coeffs)])] plus per-band Mb
    from the actual coefficient range."""
    ll, hbands = dwt53_forward(comp, levels)
    out = [[("LL", ll)]]
    for r in range(1, levels + 1):
        hl, lh, hh = hbands[levels - r]
        out.append([("HL", hl), ("LH", lh), ("HH", hh)])
    return out


def _tile_grid(h: int, w: int, tiles, levels: int):
    """((th, tw), [(y0, x0, th_, tw_) raster order]) for the writer side.
    Tile dims must be multiples of 2^levels whenever the grid is real —
    same constraint the decoder enforces (origin parity at every level)."""
    if tiles is None:
        return (h, w), [(0, 0, h, w)]
    th, tw = int(tiles[0]), int(tiles[1])
    if th <= 0 or tw <= 0:
        raise ValueError(f"invalid tile size {tw}x{th}")
    if (h > th or w > tw) and (th % (1 << levels) or tw % (1 << levels)):
        raise ValueError(
            f"tile size {tw}x{th} not a multiple of 2^levels={1 << levels}"
        )
    grid = [
        (y0, x0, min(th, h - y0), min(tw, w - x0))
        for y0 in range(0, h, th)
        for x0 in range(0, w, tw)
    ]
    return (th, tw), grid


def _emit_tile(isot: int, packets: list[bytes], tile_parts: int) -> bytes:
    """SOT/SOD tile-part frames for one tile. tile_parts > 1 splits the
    packet list across that many parts (at packet boundaries, per A.4.2)."""
    tile_parts = max(1, min(int(tile_parts), len(packets) or 1))
    chunks: list[bytes] = []
    per = (len(packets) + tile_parts - 1) // tile_parts
    for i in range(0, len(packets), per):
        chunks.append(b"".join(packets[i : i + per]))
    if not chunks:
        chunks = [b""]
    out = bytearray()
    for tp, chunk in enumerate(chunks):
        psot = 12 + 2 + len(chunk)
        out += b"\xff\x90" + struct.pack(
            ">HHIBB", 10, isot, psot, tp, len(chunks)
        )
        out += b"\xff\x93" + chunk
    return bytes(out)


def jp2k_encode(
    img: np.ndarray, levels: int = 2, bitdepth: int = 8,
    irreversible: bool = False, delta: float = 1.0 / 32.0,
    tiles: tuple[int, int] | None = None, tile_parts: int = 1,
) -> bytes:
    """Raw JPEG2000 codestream (SOC..EOC): one layer, LRCP. Default:
    5/3 reversible (lossless), RCT for 3-component input, single tile.
    irreversible=True: the 9/7 float wavelet with scalar-expounded
    quantization (QCD style 2) at nominal step `delta`, ICT for RGB —
    the photographic/lossy profile real JPX crawl assets use.
    tiles=(th, tw) tiles the image (the layout scanners use for large
    masters); tile_parts > 1 additionally splits each tile's packets
    across several SOT segments. img: uint gray (H,W) or RGB (H,W,3)."""
    img = np.asarray(img)
    if irreversible:
        return _jp2k_encode_lossy(img, levels, bitdepth, delta, tiles,
                                  tile_parts)
    if img.ndim == 2:
        comps_in = [img.astype(np.int64)]
        mct = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        y, cb, cr = rct_forward(img.astype(np.int64))
        comps_in = [y, cb, cr]
        mct = 1
    else:
        raise ValueError("expected gray (H,W) or RGB (H,W,3)")
    h, w = img.shape[:2]
    if h <= 0 or w <= 0 or h * w > _MAX_PIXELS:
        raise ValueError(f"implausible image dims {w}x{h}")
    levels = max(0, min(int(levels), 6))
    dc = 1 << (bitdepth - 1)
    # DC level shift on component 0 (and all comps for gray/RCT-Y only per
    # spec: unsigned comps are shifted; RCT chroma are signed already)
    comps = []
    for ci, c in enumerate(comps_in):
        if mct and ci > 0:
            comps.append(c)  # Cb/Cr already signed
        else:
            comps.append(c - dc)
    # forward transform per tile + per-band Mb (shared across components
    # AND tiles per band position: one QCD marker governs the image)
    (gth, gtw), grid = _tile_grid(h, w, tiles, levels)
    tile_bands = [
        [_component_bands(c[y0 : y0 + th_, x0 : x0 + tw_], levels)
         for c in comps]
        for (y0, x0, th_, tw_) in grid
    ]
    n_res = levels + 1
    mbs: list[list[int]] = []  # per resolution, per band: Mb
    for r in range(n_res):
        row = []
        for bi in range(len(tile_bands[0][0][r])):
            maxa = max(
                int(np.abs(ab[r][bi][1]).max()) if ab[r][bi][1].size else 0
                for tb in tile_bands
                for ab in tb
            )
            row.append(max(1, maxa.bit_length()))
        mbs.append(row)
    out = bytearray()
    out += b"\xff\x4f"  # SOC
    # SIZ
    ncomp = len(comps)
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, gtw, gth, 0, 0, ncomp
    )
    for ci in range(ncomp):
        signed = 0x80 if (mct and ci > 0) else 0
        depth = bitdepth if not (mct and ci > 0) else bitdepth + 1
        siz += bytes([(depth - 1) | signed, 1, 1])
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    # COD
    cod = bytes([0])  # Scod: default precincts, no SOP/EPH
    cod += bytes([0]) + struct.pack(">H", 1) + bytes([mct])  # LRCP, 1 layer
    cod += bytes([levels, 4, 4, 0, 1])  # 64x64 cb, no styles, 5/3
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    # QCD: style 0 (no quant), guard bits; exponents in band order
    eps_bytes = bytearray()
    for r in range(n_res):
        for mb in mbs[r]:
            eps_bytes.append(_band_eps(mb) << 3)
    sqcd = bytes([(_GUARD_BITS << 5) | 0])
    out += b"\xff\x5c" + struct.pack(">H", len(sqcd) + len(eps_bytes) + 2)
    out += sqcd + eps_bytes
    # tiles: SOT + SOD + packets (LRCP: layer->res->comp), raster order
    for ti, tb in enumerate(tile_bands):
        packets = []
        for r in range(n_res):
            for ab in tb:
                bands = [
                    (orient, coeffs, mbs[r][bi])
                    for bi, (orient, coeffs) in enumerate(ab[r])
                ]
                packets.append(_encode_packet(bands))
        out += _emit_tile(ti, packets, tile_parts)
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _jp2k_encode_lossy(
    img: np.ndarray, levels: int, bitdepth: int, delta: float,
    tiles: tuple[int, int] | None = None, tile_parts: int = 1,
) -> bytes:
    """The irreversible twin of jp2k_encode: 9/7 forward DWT, deadzone
    scalar quantization with the E.1 (εb, μb)-coded step per band (QCD
    style 2, scalar expounded), ICT for RGB. Guard bits are computed from
    the actual quantized magnitudes so Mb = G + εb - 1 always covers the
    coded bit-planes (the image-wide QCD constraint)."""
    if img.ndim == 2:
        comps_in = [img.astype(np.float64)]
        mct = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        mct = 1
    else:
        raise ValueError("expected gray (H,W) or RGB (H,W,3)")
    h, w = img.shape[:2]
    if h <= 0 or w <= 0 or h * w > _MAX_PIXELS:
        raise ValueError(f"implausible image dims {w}x{h}")
    levels = max(0, min(int(levels), 6))
    dc = 1 << (bitdepth - 1)
    if mct:
        y, cb, cr = ict_forward(img.astype(np.float64) - dc)
        comps = [y, cb, cr]
    else:
        comps = [comps_in[0] - dc]
    ncomp = len(comps)
    n_res = levels + 1

    # forward 9/7 per tile per component, arranged like _component_bands
    (gth, gtw), grid = _tile_grid(h, w, tiles, levels)
    tile_bands = []
    for (y0, x0, th_, tw_) in grid:
        per_comp = []
        for c in comps:
            ll, hbands = dwt97_forward(c[y0 : y0 + th_, x0 : x0 + tw_], levels)
            ob = [[("LL", ll)]]
            for r in range(1, levels + 1):
                hl, lh, hh = hbands[levels - r]
                ob.append([("HL", hl), ("LH", lh), ("HH", hh)])
            per_comp.append(ob)
        tile_bands.append(per_comp)

    # per-band coded quantization step + quantized indices; the step is
    # shared across components AND tiles (one QCD marker governs all)
    qcodes: list[list[tuple[int, int]]] = []
    quantized = [
        [
            [[None] * len(tile_bands[0][0][r]) for r in range(n_res)]
            for _ in range(ncomp)
        ]
        for _ in grid
    ]
    min_mb_slack = None
    for r in range(n_res):
        row = []
        for bi, (orient, _a) in enumerate(tile_bands[0][0][r]):
            rb = bitdepth + _BAND_GAIN[orient]
            # delta may be a callable (orient, resolution) -> step, the
            # shape gain-scaled/derived-profile encoders use
            d = delta(orient, r) if callable(delta) else delta
            eps, mu = _qstep_to_code(d, rb)
            dlt = _qstep(rb, eps, mu)
            row.append((eps, mu))
            for ti in range(len(grid)):
                for ci in range(ncomp):
                    coeffs = tile_bands[ti][ci][r][bi][1]
                    q = np.sign(coeffs) * np.floor(np.abs(coeffs) / dlt)
                    q = q.astype(np.int64)
                    quantized[ti][ci][r][bi] = q
                    maxa = int(np.abs(q).max()) if q.size else 0
                    nb = max(1, maxa.bit_length())
                    # Mb = guard + eps - 1 must be >= nb
                    slack = eps - 1 - nb
                    if min_mb_slack is None or slack < min_mb_slack:
                        min_mb_slack = slack
        qcodes.append(row)
    guard = max(_GUARD_BITS, -(min_mb_slack if min_mb_slack is not None else 0))
    if guard > 7:
        raise ValueError(
            f"quantization step {delta} needs {guard} guard bits (max 7); "
            "choose a coarser step"
        )

    out = bytearray()
    out += b"\xff\x4f"  # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, gtw, gth, 0, 0, ncomp)
    for _ci in range(ncomp):
        siz += bytes([bitdepth - 1, 1, 1])  # unsigned; ICT keeps depths
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = bytes([0])  # Scod
    cod += bytes([0]) + struct.pack(">H", 1) + bytes([mct])
    cod += bytes([levels, 4, 4, 0, 0])  # 64x64 cb, no styles, 9/7
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    # QCD style 2 (scalar expounded): 16-bit (eps<<11 | mu) per band
    qbody = bytearray([(guard << 5) | 2])
    for r in range(n_res):
        for eps, mu in qcodes[r]:
            qbody += struct.pack(">H", (eps << 11) | mu)
    out += b"\xff\x5c" + struct.pack(">H", len(qbody) + 2) + bytes(qbody)
    for ti in range(len(grid)):
        packets = []
        for r in range(n_res):
            for ci in range(ncomp):
                bands = [
                    (orient, quantized[ti][ci][r][bi],
                     guard + qcodes[r][bi][0] - 1)
                    for bi, (orient, _a) in enumerate(tile_bands[ti][ci][r])
                ]
                packets.append(_encode_packet(bands))
        out += _emit_tile(ti, packets, tile_parts)
    out += b"\xff\xd9"
    return bytes(out)


def _band_shapes(h: int, w: int, levels: int):
    """Per-resolution band shapes for an image of (h, w) at origin 0."""
    shapes = []
    hh_, ww_ = h, w
    level_shapes = []
    for _ in range(levels):
        lo_h, hi_h = (hh_ + 1) // 2, hh_ // 2
        lo_w, hi_w = (ww_ + 1) // 2, ww_ // 2
        level_shapes.append(((hi_h, lo_w), (lo_h, hi_w), (hi_h, hi_w),
                             (lo_h, lo_w)))
        hh_, ww_ = lo_h, lo_w
    # resolution 0: LL_levels
    res = [[("LL", (hh_, ww_))]]
    for r in range(1, levels + 1):
        lh_s, hl_s, hh_s, _ll_s = level_shapes[levels - r]
        # NOTE orientation shapes: HL = (lo_h, hi_w) high horizontally;
        # LH = (hi_h, lo_w); HH = (hi_h, hi_w)
        res.append([("HL", hl_s), ("LH", lh_s), ("HH", hh_s)])
    return res


def jp2k_decode(data: bytes) -> np.ndarray:
    """Decode a raw lossless codestream produced by this module's writer
    or any encoder emitting the same profile (single tile, one layer,
    LRCP, full precincts, 5/3, <=6 levels). Unsupported features raise
    named ValueError."""
    try:
        return _jp2k_decode_inner(bytes(data))
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt codestream: {e}") from None


def _jp2k_decode_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\x4f":
        raise ValueError("not a JPEG2000 codestream (no SOC)")
    pos = 2
    w = h = None
    ncomp = 0
    depths = []
    signeds = []
    levels = None
    mct = 0
    eps_list = []
    guard = _GUARD_BITS
    qstyle = 0
    irreversible = False
    tiles_acc: dict[int, list[bytes]] = {}
    while pos + 4 <= len(data):
        marker = data[pos : pos + 2]
        if marker == b"\xff\xd9":
            break
        if marker[0] != 0xFF:
            raise ValueError(f"bad marker at {pos}")
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + ln]
        if marker == b"\xff\x51":  # SIZ
            (_rsiz, w, h, x0, y0, tw, th, tx0, ty0, ncomp) = struct.unpack_from(
                ">HIIIIIIIIH", body, 0
            )
            if x0 or y0 or tx0 or ty0:
                raise ValueError("offset reference grids not supported")
            if tw < 1 or th < 1:
                raise ValueError("invalid tile size")
            if w * h > _MAX_PIXELS:
                raise ValueError(f"implausible image dims {w}x{h}")
            if not 1 <= ncomp <= 4:
                raise ValueError(f"{ncomp} components not supported")
            for ci in range(ncomp):
                ssiz, xr, yr = body[36 + 3 * ci : 39 + 3 * ci]
                if xr != 1 or yr != 1:
                    raise ValueError("subsampled components not supported")
                depths.append((ssiz & 0x7F) + 1)
                signeds.append(bool(ssiz & 0x80))
        elif marker == b"\xff\x52":  # COD
            scod = body[0]
            if scod & 0b111:
                raise ValueError("precincts/SOP/EPH not supported")
            prog = body[1]
            (layers,) = struct.unpack_from(">H", body, 2)
            mct = body[4]
            levels = body[5]
            xcb, ycb = body[6], body[7]
            cbstyle, transform = body[8], body[9]
            if prog != 0 or layers != 1:
                raise ValueError("only LRCP single-layer supported")
            if xcb != 4 or ycb != 4:
                raise ValueError("only 64x64 code-blocks supported")
            if cbstyle != 0:
                raise ValueError("code-block style modes not supported")
            if transform not in (0, 1):
                raise ValueError(f"unknown wavelet transform {transform}")
            irreversible = transform == 0
            if levels > 6:
                raise ValueError("more than 6 decomposition levels")
        elif marker == b"\xff\x5c":  # QCD
            sqcd = body[0]
            qstyle = sqcd & 0x1F
            guard = sqcd >> 5
            if qstyle == 0:  # no quantization (reversible path)
                eps_list = [(b >> 3, 0) for b in body[1:]]
            elif qstyle in (1, 2):  # scalar derived / scalar expounded
                nvals = (len(body) - 1) // 2
                if nvals < 1:
                    raise ValueError("QCD: empty quantization value list")
                vals = struct.unpack_from(f">{nvals}H", body, 1)
                eps_list = [(v >> 11, v & 0x7FF) for v in vals]
            else:
                raise ValueError(f"QCD quantization style {qstyle} not supported")
        elif marker in (
            b"\xff\x53", b"\xff\x5d", b"\xff\x5e",
            b"\xff\x5f", b"\xff\x60", b"\xff\x61",
        ):
            names = {0x53: "COC", 0x5D: "QCC", 0x5E: "RGN",
                     0x5F: "POC", 0x60: "PPM", 0x61: "PPT"}
            raise ValueError(
                f"{names[marker[1]]} marker (per-component/packed coding "
                "overrides) not supported"
            )
        elif marker == b"\xff\x90":  # SOT (any tile, any tile-part)
            (isot, psot, tpsot, _tnsot) = struct.unpack_from(
                ">HIBB", body, 0
            )
            sod_at = pos + 2 + ln
            if data[sod_at : sod_at + 2] != b"\xff\x93":
                raise ValueError("expected SOD after SOT")
            if psot:
                end = pos + psot
            else:  # Psot 0: tile extends to EOC (tolerate trailing pad)
                end = data.rfind(b"\xff\xd9")
                if end < sod_at:
                    raise ValueError("Psot=0 stream missing EOC")
            parts = tiles_acc.setdefault(isot, [])
            if tpsot != len(parts):
                raise ValueError(
                    f"tile {isot}: tile-part {tpsot} out of order "
                    f"(expected {len(parts)})"
                )
            parts.append(data[sod_at + 2 : end])
            pos = end
            continue
        pos += 2 + ln
    if w is None or levels is None or not tiles_acc:
        raise ValueError("missing SIZ/COD/tile data")
    if irreversible and qstyle == 0:
        raise ValueError("9/7 stream without quantization signalling (QCD style 0)")
    if not irreversible and qstyle != 0:
        raise ValueError("reversible 5/3 stream with quantized subbands")
    n_res = levels + 1
    qs = []  # per resolution, per band: (eps, mu)
    mbs = []
    ei = 0
    for r in range(n_res):
        qrow, row = [], []
        for _ in range(1 if r == 0 else 3):
            if qstyle == 1:
                # scalar derived (E-5): eps_b = eps0 - r + 1 below res 0
                e0, m0 = eps_list[0]
                e, m = (e0, m0) if r == 0 else (e0 - r + 1, m0)
            else:
                if ei >= len(eps_list):
                    raise ValueError("QCD exponent list too short")
                e, m = eps_list[ei]
                ei += 1
            if guard + e - 1 < 0 or e < 0:
                raise ValueError(f"invalid QCD exponent {e}")
            qrow.append((e, m))
            row.append(guard + e - 1)
        qs.append(qrow)
        mbs.append(row)
    if depths[0] > 8 or (not mct and any(signeds)):
        raise ValueError(
            f"bit depth {depths[0]}/signed components beyond the 8-bit "
            "unsigned output contract not supported"
        )
    # tile grid (B.3): tiles are independent codestream segments decoded
    # into their raster-order slot. Tile dims must be multiples of
    # 2^levels so every tile origin is even at every DWT level (the
    # shape/phase formulas assume origin-0 parity; real encoders use
    # power-of-two tiles)
    ntx = (w + tw - 1) // tw
    nty = (h + th - 1) // th
    ntiles = ntx * nty
    if ntiles > 1 and (tw % (1 << levels) or th % (1 << levels)):
        raise ValueError(
            f"tile size {tw}x{th} not a multiple of 2^levels={1 << levels}"
        )
    if set(tiles_acc) != set(range(ntiles)):
        raise ValueError(
            f"tile data mismatch: expected {ntiles} tiles, "
            f"got indices {sorted(tiles_acc)}"
        )
    comps = [
        np.zeros((h, w), np.float64 if irreversible else np.int64)
        for _ in range(ncomp)
    ]
    for ti in range(ntiles):
        ty, tx = divmod(ti, ntx)
        y0, x0 = ty * th, tx * tw
        th_, tw_ = min(th, h - y0), min(tw, w - x0)
        tile_data = b"".join(tiles_acc[ti])
        shapes = _band_shapes(th_, tw_, levels)
        comp_bands = [
            [
                [(orient, np.zeros(shape, np.int64), mbs[r][bi])
                 for bi, (orient, shape) in enumerate(shapes[r])]
                for r in range(n_res)
            ]
            for _ in range(ncomp)
        ]
        tpos = 0
        for r in range(n_res):
            for ci in range(ncomp):
                tpos = _decode_packet(tile_data, tpos, comp_bands[ci][r])
        for ci in range(ncomp):
            if irreversible:
                # E.1 dequantization with midpoint reconstruction (r = 0.5,
                # the Annex E recommended value for nonzero indices)
                def _deq(r_i: int, bi: int, arr: np.ndarray, orient: str):
                    e, m = qs[r_i][bi]
                    dlt = _qstep(depths[ci] + _BAND_GAIN[orient], e, m)
                    return np.where(
                        arr == 0, 0.0, (np.abs(arr) + 0.5) * dlt * np.sign(arr)
                    )

                ll = _deq(0, 0, comp_bands[ci][0][0][1], "LL")
                hbands = []
                for r in range(n_res - 1, 0, -1):
                    hbands.append(
                        tuple(
                            _deq(r, bi, comp_bands[ci][r][bi][1], orient)
                            for bi, orient in enumerate(("HL", "LH", "HH"))
                        )
                    )
                tile_out = dwt97_inverse(ll, hbands)
            else:
                ll = comp_bands[ci][0][0][1]
                hbands = []
                for r in range(n_res - 1, 0, -1):
                    hl = comp_bands[ci][r][0][1]
                    lh = comp_bands[ci][r][1][1]
                    hh = comp_bands[ci][r][2][1]
                    hbands.append((hl, lh, hh))
                tile_out = dwt53_inverse(ll, hbands)
            comps[ci][y0 : y0 + th_, x0 : x0 + tw_] = tile_out
    maxv = (1 << depths[0]) - 1
    if mct and ncomp == 3:
        if irreversible:
            rgb = ict_inverse(comps[0], comps[1], comps[2])
            out = np.rint(rgb + (1 << (depths[0] - 1)))
        else:
            rgb = rct_inverse(comps[0], comps[1], comps[2])
            out = rgb + (1 << (depths[0] - 1))
        return np.clip(out, 0, maxv).astype(np.uint8)
    outs = []
    for ci, c in enumerate(comps):
        if irreversible:
            c = np.rint(c + (1 << (depths[ci] - 1)))
        else:
            c = c + (1 << (depths[ci] - 1))
        outs.append(np.clip(c, 0, (1 << depths[ci]) - 1))
    if ncomp == 1:
        return outs[0].astype(np.uint8)
    return np.stack(outs, axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# JP2 file container (ISO 15444-1 Annex I boxes)
# ---------------------------------------------------------------------------

_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def jp2_wrap(codestream: bytes, w: int, h: int, ncomp: int, bpc: int = 8) -> bytes:
    """Minimal JP2 box file around a raw codestream: signature, ftyp,
    jp2h(ihdr + colr), jp2c."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", h, w, ncomp, bpc - 1, 7, 0, 0),
    )
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 17 if ncomp == 1 else 16))
    jp2h = box(b"jp2h", ihdr + colr)
    return _JP2_SIG + ftyp + jp2h + box(b"jp2c", codestream)


def jp2_unwrap(data: bytes) -> bytes:
    """Extract the contiguous codestream from a JP2 box file (or pass a
    raw codestream through)."""
    data = bytes(data)
    if data[:2] == b"\xff\x4f":
        return data
    if data[:12] != _JP2_SIG:
        raise ValueError("not a JP2 file (bad signature box)")
    pos = 12
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        if ln == 1:  # extended length
            (xln,) = struct.unpack_from(">Q", data, pos + 8)
            if xln < 16:
                raise ValueError("JP2 extended box length too small")
            body = data[pos + 16 : pos + xln]
            nxt = pos + xln
        elif ln == 0:  # to end of file
            body = data[pos + 8 :]
            nxt = len(data)
        else:
            body = data[pos + 8 : pos + ln]
            nxt = pos + ln
        if btype == b"jp2c":
            return body
        if nxt <= pos:  # zero/backward box length: would loop forever
            raise ValueError("JP2 box length does not advance")
        pos = nxt
    raise ValueError("JP2 file has no jp2c codestream box")


def jp2_decode(data: bytes) -> np.ndarray:
    """Decode a JP2 box file or raw codestream to uint8 gray/RGB."""
    return jp2k_decode(jp2_unwrap(data))


def jp2_encode(img: np.ndarray, levels: int = 2, **kw) -> bytes:
    """Encode to a JP2 box file. Keyword args pass through to
    jp2k_encode (irreversible/delta/tiles/tile_parts)."""
    img = np.asarray(img, np.uint8)
    cs = jp2k_encode(img, levels=levels, **kw)
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    return jp2_wrap(cs, img.shape[1], img.shape[0], ncomp)
