"""CCITT Group 3 / Group 4 fax codecs (ITU-T T.4 / T.6), pure Python+numpy.

The scanned-document OCR feed's last missing wire format: real-world fax
scans travel as TIFF compression 2 (T.4 Modified Huffman 1-D), 3 (Group 3
with EOLs, 1-D or mixed 2-D) and 4 (T.6 / G4 "MMR" pure 2-D), and inside
PDFs as /CCITTFaxDecode streams (ref ocr_workflow_orchestrator.py:153-178
loads any PIL-supported input, which includes G3/G4 TIFFs;
OCR-X_Component_Breakdown_OptionB.md:11-18 lists TIFF as a required
format). Everything here is implemented from the published ITU-T T.4/T.6
specifications:

  * Modified Huffman run-length alphabet — white/black terminating codes
    (runs 0..63), per-colour make-up codes (64..1728) and the shared
    extended make-ups (1792..2560); a run > 63 is one or more make-ups
    plus a mandatory terminating code.
  * T.4 1-D coding: each line is alternating white-first runs summing to
    the row width. TIFF compression 2 byte-aligns every line and has no
    EOLs; G3 proper prefixes lines with EOL (eleven 0s + 1, optionally
    fill-padded) — the decoder accepts both framings (≥11 zeros before a
    1 is unambiguously fill+EOL: the longest zero prefix of any MH code
    is 8, so the two framings can't collide).
  * T.6 2-D coding (G4/MMR): vertical (V0, VR1-3, VL1-3), horizontal
    (001 + two MH runs) and pass (0001) modes against the previous line's
    changing elements, imaginary all-white reference line above row 0,
    EOFB terminator tolerated-but-optional.
  * G3 2-D lines (TIFF compression 3 with the T4Options 2-D bit, PDF
    /CCITTFaxDecode with K>0) are EOL + 1 tag bit (1 = next line 1-D,
    0 = 2-D) followed by the same mode alphabet as G4.

Decoders return uint8 (H,W) arrays with 1 = black run, 0 = white run —
the CODING domain; callers map to pixel gray via photometric/BlackIs1
flags. Decode cost is proportional to the number of RUNS, not pixels, so
a 1728-wide page line is typically a handful of table lookups; the whole
codec runs inside the repo's Arrow-batched image stages (zero per-row
Python at the Spark layer). Fixture encoders (g3_1d_encode / g4_encode)
write real bitstreams so tests round-trip the actual wire format, and the
unit tests pin spec-published codewords (white 4 = 1011, black 2 = 11,
white make-up 1728 = 010011011, ...) so encoder/decoder can't drift
together away from the standard.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 Modified Huffman tables (terminating + make-up + shared extended)
# ---------------------------------------------------------------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# shared extended make-ups, colour-independent
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"

# 2-D mode codewords (prefix-free; probed longest-prefix by order)
_MODE_CODES = (
    ("1", "V", 0),
    ("011", "V", 1),      # VR1: a1 one right of b1
    ("010", "V", -1),     # VL1
    ("001", "H", 0),
    ("0001", "P", 0),
    ("000011", "V", 2),
    ("000010", "V", -2),
    ("0000011", "V", 3),
    ("0000010", "V", -3),
)

_V_CODE = {0: "1", 1: "011", -1: "010", 2: "000011",
           -2: "000010", 3: "0000011", -3: "0000010"}


def _build_decode_table(term: dict, makeup: dict) -> dict:
    tbl: dict[str, tuple[int, bool]] = {}
    for run, code in term.items():
        tbl[code] = (run, True)
    for run, code in makeup.items():
        tbl[code] = (run, False)
    for run, code in _EXT_MAKEUP.items():
        tbl[code] = (run, False)
    return tbl


_WHITE_DECODE = _build_decode_table(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DECODE = _build_decode_table(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 13  # longest MH/make-up codeword


class _BitReader:
    """MSB-first bit cursor over bytes."""

    __slots__ = ("s", "pos", "n")

    def __init__(self, data: bytes):
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        # vectorized '0'/'1' string build (a per-bit Python join costs ~10%
        # of a full-page decode)
        self.s = (bits + ord("0")).astype(np.uint8).tobytes().decode("ascii")
        self.pos = 0
        self.n = len(self.s)

    def peek(self, k: int) -> str:
        return self.s[self.pos:self.pos + k]

    def skip(self, k: int) -> None:
        self.pos += k

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack: int = 0) -> bool:
        return self.pos >= self.n - slack


def _read_run(br: _BitReader, table: dict) -> int:
    """One complete MH run: zero or more make-ups + a terminating code."""
    total = 0
    while True:
        probe = br.peek(_MAX_CODE_LEN)
        for ln in range(2, len(probe) + 1):
            hit = table.get(probe[:ln])
            if hit is not None:
                run, is_term = hit
                br.skip(ln)
                total += run
                if is_term:
                    return total
                break
        else:
            raise ValueError(f"bad MH codeword at bit {br.pos}: {probe!r}")


def _skip_fill_eols(br: _BitReader) -> bool:
    """Consume any fill+EOL prefixes (k>=11 zeros then a 1 is always
    fill+EOL — no MH code has more than 8 leading zeros). Returns True if
    at least one EOL was consumed."""
    saw = False
    while not br.exhausted():
        look = br.peek(br.n - br.pos)
        i = look.find("1")
        if i >= 11:
            br.skip(i + 1)
            saw = True
            continue
        if i == -1:  # nothing but trailing zeros left
            br.skip(len(look))
        return saw
    return saw


def _decode_1d_line(br: _BitReader, width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    pos, color = 0, 0
    while pos < width:
        run = _read_run(br, _BLACK_DECODE if color else _WHITE_DECODE)
        if pos + run > width:
            raise ValueError(f"MH run overflows row: {pos}+{run} > {width}")
        if color:
            row[pos:pos + run] = 1
        pos += run
        color ^= 1
    return row


def _changing_elements(line: np.ndarray) -> np.ndarray:
    """Positions where colour changes vs the previous pixel (first pixel
    counts as changing if black), plus two sentinels at width. Index
    parity encodes colour: even = white->black, odd = black->white (lines
    start white)."""
    w = line.shape[0]
    prev = np.concatenate([[0], line[:-1]])
    idx = np.nonzero(line != prev)[0]
    return np.concatenate([idx, [w, w]])


def _b1_b2(ref_changes: np.ndarray, a0: int, color: int, width: int) -> tuple[int, int]:
    """b1 = first changing element on the reference line strictly right of
    a0 whose colour is opposite the coding colour; b2 = the next one."""
    i = int(np.searchsorted(ref_changes, a0 + 1))
    if i % 2 != color:  # even index flips to black == what white coding needs
        i += 1
    b1 = int(ref_changes[i]) if i < len(ref_changes) else width
    b2 = int(ref_changes[i + 1]) if i + 1 < len(ref_changes) else width
    return min(b1, width), min(b2, width)


def _decode_2d_line(
    br: _BitReader, ref_changes: np.ndarray, width: int
) -> np.ndarray:
    """One 2-D coded line (shared by G4 and G3-2D tagged lines)."""
    row = np.zeros(width, dtype=np.uint8)
    a0, color = -1, 0
    while a0 < width:
        probe = br.peek(7)
        mode = param = None
        for code, m, p in _MODE_CODES:
            if probe.startswith(code):
                mode, param = m, p
                br.skip(len(code))
                break
        if mode is None:
            raise ValueError(f"bad 2-D mode codeword {probe!r} at bit {br.pos}")
        start = max(a0, 0)
        b1, b2 = _b1_b2(ref_changes, a0, color, width)
        if mode == "P":
            if color:
                row[start:b2] = 1
            a0 = b2
        elif mode == "V":
            a1 = b1 + param
            if a1 < 0 or a1 > width:
                raise ValueError(f"vertical mode out of range a1={a1}")
            if color:
                row[start:a1] = 1
            a0, color = a1, color ^ 1
        else:  # horizontal: two MH-coded runs from a0
            r1 = _read_run(br, _BLACK_DECODE if color else _WHITE_DECODE)
            r2 = _read_run(br, _WHITE_DECODE if color else _BLACK_DECODE)
            if start + r1 + r2 > width:
                raise ValueError(
                    f"horizontal runs overflow row: {start}+{r1}+{r2} > {width}"
                )
            if color:
                row[start:start + r1] = 1
            else:
                row[start + r1:start + r1 + r2] = 1
            a0 = start + r1 + r2
    return row


def g3_1d_decode(
    data: bytes, width: int, height: int | None = None,
    byte_align: bool = False,
) -> np.ndarray:
    """T.4 1-D Modified Huffman. byte_align=True is TIFF compression-2
    framing (every line starts on a byte boundary, no EOLs); G3-proper
    EOL/fill framing is consumed transparently either way. Returns uint8
    (H,W), 1=black."""
    if width <= 0:
        raise ValueError("width must be positive")
    br = _BitReader(data)
    rows: list[np.ndarray] = []
    while height is None or len(rows) < height:
        if byte_align:
            br.byte_align()
        _skip_fill_eols(br)
        rem = br.n - br.pos
        if rem <= 0:
            break
        if rem < 8 and "1" not in br.peek(rem):  # final-byte padding
            break
        rows.append(_decode_1d_line(br, width))
    if height is not None and len(rows) != height:
        raise ValueError(f"decoded {len(rows)} rows, expected {height}")
    if not rows:
        raise ValueError("no rows decoded")
    return np.stack(rows)


def g4_decode(
    data: bytes, width: int, height: int | None = None,
    byte_align: bool = False,
) -> np.ndarray:
    """T.6 (Group 4 / MMR) pure 2-D decode; reference line above row 0 is
    imaginary all-white; EOFB (EOL EOL) tolerated or absent. Returns uint8
    (H,W), 1=black."""
    if width <= 0:
        raise ValueError("width must be positive")
    br = _BitReader(data)
    ref_changes = _changing_elements(np.zeros(width, dtype=np.uint8))
    rows: list[np.ndarray] = []
    while height is None or len(rows) < height:
        if byte_align:
            br.byte_align()
        rem = br.n - br.pos
        if rem <= 0:
            break
        if br.peek(12) == _EOL:  # EOFB (or lone/truncated terminator)
            break
        if rem < 8 and "1" not in br.peek(rem):  # final-byte padding
            break
        row = _decode_2d_line(br, ref_changes, width)
        rows.append(row)
        ref_changes = _changing_elements(row)
    if height is not None and len(rows) != height:
        raise ValueError(f"decoded {len(rows)} rows, expected {height}")
    if not rows:
        raise ValueError("no rows decoded")
    return np.stack(rows)


def g3_2d_decode(
    data: bytes, width: int, height: int | None = None,
    require_eol: bool = True,
) -> np.ndarray:
    """Group 3 two-dimensional framing (T.4 §4.2; TIFF compression 3 with
    the 2-D T4Options bit; PDF /CCITTFaxDecode K>0): every line is
    fill+EOL + one tag bit — 1 = the line is 1-D MH, 0 = 2-D coded against
    the previous line. require_eol=False tolerates streams written with
    the PDF default /EndOfLine false (only the tag bit per line); any EOLs
    present are still consumed. Returns uint8 (H,W), 1=black."""
    if width <= 0:
        raise ValueError("width must be positive")
    br = _BitReader(data)
    ref = np.zeros(width, dtype=np.uint8)
    rows: list[np.ndarray] = []
    while height is None or len(rows) < height:
        saw_eol = _skip_fill_eols(br)
        rem = br.n - br.pos
        if rem <= 0:
            break
        if not saw_eol and rem < 8 and "1" not in br.peek(rem):
            break  # final-byte padding
        if not saw_eol and require_eol:
            raise ValueError(f"G3 2-D line missing EOL at bit {br.pos}")
        tag = br.peek(1)
        br.skip(1)
        if tag == "1":
            row = _decode_1d_line(br, width)
        else:
            row = _decode_2d_line(br, _changing_elements(ref), width)
        rows.append(row)
        ref = row
    if height is not None and len(rows) != height:
        raise ValueError(f"decoded {len(rows)} rows, expected {height}")
    if not rows:
        raise ValueError("no rows decoded")
    return np.stack(rows)


# ---------------------------------------------------------------------------
# fixture encoders — real wire bitstreams so tests round-trip the format
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("parts", "nbits")

    def __init__(self):
        self.parts: list[str] = []
        self.nbits = 0

    def write(self, bits: str) -> None:
        self.parts.append(bits)
        self.nbits += len(bits)

    def byte_align(self) -> None:
        pad = (-self.nbits) % 8
        if pad:
            self.write("0" * pad)

    def getvalue(self) -> bytes:
        s = "".join(self.parts)
        s += "0" * ((-len(s)) % 8)
        if not s:
            return b""
        return np.packbits(
            np.frombuffer(s.encode(), np.uint8) - ord("0")
        ).tobytes()


def _encode_run(bw: _BitWriter, run: int, color: int) -> None:
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    while run > 2623:  # 2560 (largest make-up) + 63 (largest terminator)
        bw.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run > 63:
        mk = (run // 64) * 64
        bw.write(_EXT_MAKEUP[mk] if mk > 1728 else makeup[mk])
        run -= mk
    bw.write(term[run])


def _row_runs(row: np.ndarray) -> list[tuple[int, int]]:
    """[(run_len, colour)] alternating white-first (a line that starts
    black gets a 0-length white run, per the standard)."""
    w = row.shape[0]
    changes = np.nonzero(np.diff(row.astype(np.int8)))[0] + 1
    bounds = np.concatenate([[0], changes, [w]])
    runs = []
    color = int(row[0]) if w else 0
    if color == 1:
        runs.append((0, 0))
    for i in range(len(bounds) - 1):
        runs.append((int(bounds[i + 1] - bounds[i]), color))
        color ^= 1
    return runs


def g3_1d_encode(
    img: np.ndarray, byte_align: bool = True, with_eol: bool = False,
) -> bytes:
    """T.4 1-D MH fixture encoder. byte_align=True writes TIFF
    compression-2 framing; with_eol=True writes G3-proper EOL framing
    (plus the six-EOL RTC trailer)."""
    img = (np.asarray(img) > 0).astype(np.uint8)
    if img.ndim != 2:
        raise ValueError("expected a 2-D bilevel array")
    bw = _BitWriter()
    for row in img:
        if with_eol:
            bw.write(_EOL)
        elif byte_align:
            bw.byte_align()
        for run, color in _row_runs(row):
            _encode_run(bw, run, color)
    if with_eol:
        for _ in range(6):  # RTC
            bw.write(_EOL)
    return bw.getvalue()


def _encode_2d_line(
    bw: _BitWriter, row: np.ndarray, ref_changes: np.ndarray, width: int
) -> None:
    row_changes = _changing_elements(row)
    a0, color = -1, 0
    while a0 < width:
        i = int(np.searchsorted(row_changes, a0 + 1))
        a1 = min(int(row_changes[i]) if i < len(row_changes) else width, width)
        a2 = min(
            int(row_changes[i + 1]) if i + 1 < len(row_changes) else width, width
        )
        b1, b2 = _b1_b2(ref_changes, a0, color, width)
        if b2 < a1:
            bw.write("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write(_V_CODE[a1 - b1])
            a0, color = a1, color ^ 1
        else:
            bw.write("001")  # horizontal
            start = max(a0, 0)
            _encode_run(bw, a1 - start, color)
            _encode_run(bw, a2 - a1, color ^ 1)
            a0 = a2


def g4_encode(img: np.ndarray, with_eofb: bool = True) -> bytes:
    """T.6 (G4/MMR) fixture encoder following the standard's mode-selection
    procedure (pass if b2<a1, vertical if |a1-b1|<=3, else horizontal)."""
    img = (np.asarray(img) > 0).astype(np.uint8)
    if img.ndim != 2:
        raise ValueError("expected a 2-D bilevel array")
    h, w = img.shape
    bw = _BitWriter()
    ref_changes = _changing_elements(np.zeros(w, dtype=np.uint8))
    for r in range(h):
        _encode_2d_line(bw, img[r], ref_changes, w)
        ref_changes = _changing_elements(img[r])
    if with_eofb:
        bw.write(_EOL + _EOL)
    return bw.getvalue()


def g3_2d_encode(img: np.ndarray, k: int = 2, with_eol: bool = True) -> bytes:
    """G3 2-D fixture encoder: every k-th line 1-D (tag 1), others 2-D
    (tag 0), each prefixed by EOL — the K>0 /CCITTFaxDecode layout.
    with_eol=False writes the PDF /EndOfLine-false layout (tag bits
    only, no EOLs, no RTC)."""
    img = (np.asarray(img) > 0).astype(np.uint8)
    if img.ndim != 2:
        raise ValueError("expected a 2-D bilevel array")
    h, w = img.shape
    bw = _BitWriter()
    ref_changes = None
    for r in range(h):
        if with_eol:
            bw.write(_EOL)
        if r % max(k, 1) == 0 or ref_changes is None:
            bw.write("1")
            for run, color in _row_runs(img[r]):
                _encode_run(bw, run, color)
        else:
            bw.write("0")
            _encode_2d_line(bw, img[r], ref_changes, w)
        ref_changes = _changing_elements(img[r])
    if with_eol:
        for _ in range(6):  # RTC
            bw.write(_EOL)
    return bw.getvalue()
