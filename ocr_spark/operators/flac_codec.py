"""Real FLAC codec: a from-scratch decoder + fixture encoder (RFC 9639).

Upgrades the compressed-audio surface past WAV-container codecs
(`audio_codecs.py`): FLAC is the dominant lossless format in crawled audio,
and a corpus pipeline that can only error-envelope it loses the whole
archival-music / speech-dataset slice. This module implements the public
FLAC bitstream spec (RFC 9639 / xiph.org format docs) directly:

decoder
  - fLaC magic + metadata-block walk (STREAMINFO parsed, others skipped)
  - frame header: 14-bit sync, blocking strategy, coded block-size /
    sample-rate / channel-assignment / sample-size fields, UTF-8-style
    coded frame/sample number, CRC-8 (verified)
  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    (quantized coefficients + signed shift), wasted-bits unary prefix
  - residual: Rice / Rice2 partitions incl. the 5-bit escape to raw
    binary (n == 0 -> all-zero partition)
  - inter-channel decorrelation: left/side, right/side, mid/side
  - frame CRC-16 (verified)
  - STREAMINFO MD5 check (when present) against the decoded PCM

encoder (fixtures are self-contained; also a real, valid encoder)
  - per-frame subframe choice among CONSTANT / FIXED 0-2 by residual
    magnitude, Rice parameter estimation, configurable partition order
  - stereo modes: independent, left/side, mid/side (exercises every
    decoder decorrelation path)
  - `force=` hook emits VERBATIM or LPC subframes so those decoder paths
    are golden-testable without third-party vectors

Everything is stdlib + numpy. Per-asset decode runs inside Arrow batches
(`multimodal.decode_audio`), the same scale posture as the WAV/ADPCM
codecs: vectorized across assets, sequential within one (the format is
sequential within a frame by construction).

Reference parity: the reference leaves audio at a spec doc
(`OCR-X_Component_Breakdown_OptionB.md`); semantics here follow the public
FLAC format specification only.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor residual weights, order 0..4 (RFC 9639 §4.2.2)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (the two FLAC polynomials, table-driven)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# MSB-first bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.pos = start_byte * 8  # bit cursor
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("FLAC bitstream truncated")
        end = self.pos + n
        first, last = self.pos >> 3, (end - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        chunk >>= (last + 1) * 8 - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        n = 0
        while True:
            if self.pos >= self.nbits:
                raise ValueError("FLAC bitstream truncated in unary code")
            byte = self.data[self.pos >> 3]
            rem = 8 - (self.pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                self.pos += rem
                continue
            lead = rem - window.bit_length()
            self.pos += lead + 1
            return n + lead

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0, "unaligned bitstream"
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# stream / frame parsing
# ---------------------------------------------------------------------------


def flac_parse_streaminfo(content: bytes) -> dict:
    """Parse the fLaC magic + metadata blocks; return STREAMINFO fields and
    the byte offset where audio frames begin."""
    if len(content) < 8 or content[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    info: dict | None = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("FLAC metadata truncated")
        hdr = content[pos]
        last, btype = bool(hdr & 0x80), hdr & 0x7F
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("STREAMINFO block too short")
            br = _BitReader(body)
            info = {
                "min_block_size": br.read(16),
                "max_block_size": br.read(16),
                "min_frame_size": br.read(24),
                "max_frame_size": br.read(24),
                "sample_rate": br.read(20),
                "n_channels": br.read(3) + 1,
                "bits_per_sample": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    info["frames_offset"] = pos
    return info


def _read_coded_number(br: _BitReader) -> int:
    """UTF-8-style variable-length number, extended to 36 bits (7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("invalid coded number prefix")
    val = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid coded number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    # a NEGATIVE first partition ((block_size >> porder) < order) raises at
    # the count check below; an exactly-empty first partition is legal (the
    # libFLAC convention: its check is strict <, not <=)
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("invalid residual partitioning")
        param = br.read(plen)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                out[w : w + count] = 0
            else:
                for i in range(count):
                    out[w + i] = br.read_signed(nbits)
        else:
            for i in range(count):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out[w + i] = (v >> 1) ^ -(v & 1)  # zigzag
        w += count
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(bps) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        x = out
        if order == 0:
            x[:] = resid
        else:
            r = resid
            for i in range(order, block_size):
                acc = r[i - order]
                for j, c in enumerate(coefs):
                    acc += c * x[i - 1 - j]
                x[i] = acc
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0x0F:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        x = out
        r = resid
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = r[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def flac_decode_frame(
    content: bytes, offset: int, streaminfo: dict
) -> tuple[np.ndarray, int, int]:
    """Decode one frame at byte `offset`; return (samples (n, ch) int64,
    sample_rate, next_offset). Verifies header CRC-8 and frame CRC-16."""
    br = _BitReader(content, offset)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"bad frame sync at byte {offset}")
    if br.read(1):
        raise ValueError("frame header reserved bit set")
    br.read(1)  # blocking strategy (affects coded-number meaning only)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("frame header reserved bit set")
    _read_coded_number(br)

    if bs_code == 0:
        raise ValueError("reserved block size code")
    elif bs_code == 1:
        block_size = 192
    elif bs_code <= 5:
        block_size = 576 << (bs_code - 2)
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = 256 << (bs_code - 8)

    if sr_code == 0:
        sample_rate = streaminfo["sample_rate"]
    elif sr_code in _SAMPLE_RATE_CODES:
        sample_rate = _SAMPLE_RATE_CODES[sr_code]
    elif sr_code == 12:
        sample_rate = br.read(8) * 1000
    elif sr_code == 13:
        sample_rate = br.read(16)
    elif sr_code == 14:
        sample_rate = br.read(16) * 10
    else:
        raise ValueError("invalid sample rate code")

    bps = streaminfo["bits_per_sample"] if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
    if bps is None:
        raise ValueError(f"reserved sample size code {ss_code}")

    header_end = br.byte_pos()
    expect_crc8 = br.read(8)
    if crc8(content[offset:header_end]) != expect_crc8:
        raise ValueError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        chans = [_decode_subframe(br, block_size, bps) for _ in range(n_ch)]
        stacked = np.stack(chans, axis=1)
    elif ch_code in (8, 9, 10):
        # stereo decorrelation: the SIDE subframe carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            stacked = np.stack([left, left - side], axis=1)
        elif ch_code == 9:  # side/right
            side = _decode_subframe(br, block_size, bps + 1)
            right = _decode_subframe(br, block_size, bps)
            stacked = np.stack([right + side, right], axis=1)
        else:  # mid/side
            mid = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            m2 = (mid << 1) | (side & 1)
            stacked = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
    else:
        raise ValueError(f"reserved channel assignment {ch_code}")

    br.align()
    body_end = br.byte_pos()
    expect_crc16 = br.read(16)
    if crc16(content[offset:body_end]) != expect_crc16:
        raise ValueError("frame CRC-16 mismatch")
    return stacked, sample_rate, br.byte_pos()


def flac_decode(content: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload -> (int32 samples (n_frames, n_channels),
    sample_rate). Verifies per-frame CRCs always and the STREAMINFO MD5
    when the encoder recorded one (non-zero)."""
    info = flac_parse_streaminfo(content)
    pos = info["frames_offset"]
    frames: list[np.ndarray] = []
    sample_rate = info["sample_rate"]
    total = info["total_samples"]
    got = 0
    while pos < len(content) and (total == 0 or got < total):
        block, sample_rate, pos = flac_decode_frame(content, pos, info)
        frames.append(block)
        got += block.shape[0]
    out = (
        np.concatenate(frames, axis=0)
        if frames
        else np.zeros((0, info["n_channels"]), dtype=np.int64)
    )
    if total:
        out = out[:total]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _pcm_md5(out, info["bits_per_sample"]) != info["md5"]:
            raise ValueError("decoded PCM fails the STREAMINFO MD5 check")
    return out.astype(np.int32), sample_rate


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    """STREAMINFO MD5: interleaved little-endian signed samples, bps/8
    bytes each (integrity check per the spec; not a security use)."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    buf = bytearray()
    if nbytes == 2:
        buf = flat.astype("<i2").tobytes()
    elif nbytes == 1:
        buf = flat.astype(np.int8).tobytes()
    else:
        for v in flat:
            buf += int(v).to_bytes(nbytes, "little", signed=True)
    return hashlib.md5(bytes(buf)).digest()


# ---------------------------------------------------------------------------
# encoder (valid streams; fixture-oriented subframe search)
# ---------------------------------------------------------------------------


def _zigzag(resid: np.ndarray) -> np.ndarray:
    return np.where(resid >= 0, resid << 1, (-resid << 1) - 1)


def _best_rice_param(zz: np.ndarray, plen: int) -> int:
    if len(zz) == 0:
        return 0
    mean = max(1.0, float(zz.mean()))
    param = max(0, int(np.log2(mean)))
    return min(param, (1 << plen) - 2)


def _write_residual(
    bw: _BitWriter, resid: np.ndarray, block_size: int, order: int, porder: int
) -> None:
    while porder > 0 and (block_size % (1 << porder) or (block_size >> porder) <= order):
        porder -= 1
    bw.write(0, 2)  # method 0: 4-bit rice
    bw.write(porder, 4)
    nparts = 1 << porder
    w = 0
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        part = resid[w : w + count]
        zz = _zigzag(part.astype(np.int64))
        param = _best_rice_param(zz, 4)
        bw.write(param, 4)
        for v in zz:
            v = int(v)
            bw.write_unary(v >> param)
            bw.write(v, param)
        w += count


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(
    bw: _BitWriter, x: np.ndarray, bps: int, porder: int, force: str | None
) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if force == "verbatim":
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    if force == "lpc":
        # order-2 LPC x[i] ~= (2*x[i-1] - 1*x[i-2]) with shift 0 — a real
        # quantized-coefficient path distinct from the FIXED encoding
        order, coefs, shift, prec = 2, [2, -1], 0, 4
        bw.write(0, 1); bw.write(32 + order - 1, 6); bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        resid = np.array(
            [x[i] - ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift)
             for i in range(order, n)],
            dtype=np.int64,
        )
        _write_residual(bw, resid, n, order, porder)
        return
    if n and np.all(x == x[0]) and force is None:
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    best_order, best_cost = 0, None
    for order in range(0, 3):
        if order >= n:
            break
        r = _fixed_residual(x, order)
        cost = int(np.abs(r).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
    for v in x[:order]:
        bw.write(int(v), bps)
    _write_residual(bw, _fixed_residual(x, order), n, order, porder)


def flac_encode(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    force: str | None = None,
) -> bytes:
    """Encode int PCM (n, ch) as a valid FLAC stream.

    stereo_mode: 'independent' | 'left_side' | 'mid_side' (2-ch only).
    force: None (search constant/fixed) | 'verbatim' | 'lpc' — pins every
    subframe to that type so decoder paths are individually testable.
    """
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    x = x.astype(np.int64)
    lim = 1 << (bps - 1)
    if x.size and (x.max() >= lim or x.min() < -lim):
        raise ValueError(f"samples exceed {bps}-bit range")
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")

    out = bytearray(FLAC_MAGIC)
    si = _BitWriter()
    si.write(block_size, 16); si.write(block_size, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20); si.write(ch - 1, 3); si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + _pcm_md5(x, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize strategy
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
        else:
            bw.write(ch - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        bw.write(ss_code, 3)
        bw.write(0, 1)  # reserved
        # coded frame number (UTF-8 style; fixture frames stay < 2^31)
        fno = frame_no
        if fno < 0x80:
            bw.write(fno, 8)
        else:
            # canonical UTF-8-style length: ntail continuation bytes carry
            # 6 bits each; the lead byte carries (6 - ntail) bits
            ntail = 1
            while fno >= (1 << (6 * ntail + (6 - ntail))):
                ntail += 1
            tail = []
            for _ in range(ntail):
                tail.append(0x80 | (fno & 0x3F))
                fno >>= 6
            lead = ((0xFE << (6 - ntail)) & 0xFF) | fno
            bw.write(lead, 8)
            for t in reversed(tail):
                bw.write(t, 8)
        bw.write(bs - 1, 16)
        hdr = bw.getvalue()
        bw.write(crc8(hdr), 8)

        if stereo_mode == "left_side":
            left = blk[:, 0]
            side = blk[:, 0] - blk[:, 1]
            _write_subframe(bw, left, bps, partition_order, force)
            _write_subframe(bw, side, bps + 1, partition_order, force)
        elif stereo_mode == "mid_side":
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            _write_subframe(bw, mid, bps, partition_order, force)
            _write_subframe(bw, side, bps + 1, partition_order, force)
        else:
            for c in range(ch):
                _write_subframe(bw, blk[:, c], bps, partition_order, force)
        bw.align()
        frame = bw.getvalue()
        out += frame + struct.pack(">H", crc16(frame))
        frame_no += 1
    return bytes(out)
