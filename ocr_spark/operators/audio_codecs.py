"""Real compressed-audio codecs: G.711 mu-law / A-law and IMA ADPCM in WAV.

The stdlib `wave` module only reads WAVE_FORMAT_PCM, so a corpus crawl that
hits telephony (G.711) or legacy-game/voice (IMA ADPCM) WAVs would degrade to
error envelopes. This module adds a RIFF chunk walker plus pure-numpy
decoders for format tags 6 (A-law), 7 (mu-law) and 0x11 (IMA/DVI ADPCM),
and matching encoders so fixtures are self-contained. Everything is
vectorized: G.711 is a closed-form per-sample transform (one numpy
expression over the whole buffer); IMA ADPCM is sequential WITHIN a block
by construction, so the decoder loops over the ~505 sample positions of a
block while staying vectorized ACROSS blocks — at corpus scale each Arrow
batch carries many independent blocks, which is the axis that matters.

Reference parity: the reference loads media via PIL and leaves audio to a
spec doc (`OCR-X_Component_Breakdown_OptionB.md`); semantics here follow the
public G.711 (CCITT, classic Sun g711.c) and IMA ADPCM (IMA Digital Audio
Pack, as stored by WAVE_FORMAT_IMA_ADPCM) algorithms. Encode/decode are
golden-tested against stdlib `audioop` where it exists (removed in 3.13)
plus literal vectors so the goldens outlive it.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011

# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP14 = 8159  # 14-bit clip (sox / CPython audioop variant)
_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 mu-law (G.711, the 14-bit sox/audioop variant:
    arithmetic >>2 first, so negative half-LSBs round like C), vectorized."""
    v = np.asarray(pcm, dtype=np.int32) >> 2  # 16 -> 14 bit, floors negatives
    mask = np.where(v >= 0, 0xFF, 0x7F)
    mag = np.minimum(np.abs(v), _ULAW_CLIP14) + (_ULAW_BIAS >> 2)
    seg = np.searchsorted(_ULAW_SEG_END, mag, side="left").astype(np.int32)
    uval = np.where(
        seg >= 8,
        0x7F,
        (np.minimum(seg, 7) << 4) | ((mag >> (np.minimum(seg, 7) + 1)) & 0x0F),
    )
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16 linear (G.711), vectorized."""
    u = ~np.asarray(codes, dtype=np.uint8) & 0xFF
    u = u.astype(np.int32)
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


# ---------------------------------------------------------------------------
# G.711 A-law
# ---------------------------------------------------------------------------

_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 A-law (G.711, classic g711.c semantics)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3  # 16 -> 13 bit
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left").astype(np.int32)
    low = (mag >> 1) & 0x0F  # segments 0-1: linear region
    high = (mag >> np.maximum(seg, 1)) & 0x0F
    aval = np.where(seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | np.where(seg < 2, low, high))
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law -> int16 linear (G.711)."""
    a = (np.asarray(codes, dtype=np.uint8).astype(np.int32)) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAV format tag 0x11)
# ---------------------------------------------------------------------------

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def _ima_step(pred: np.ndarray, index: np.ndarray, nib: np.ndarray):
    """One IMA decode step, vectorized over an axis of independent streams.

    Returns (new_pred, new_index, sample) — sample == new_pred."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    diff = np.where(nib & 8, -diff, diff)
    pred = np.clip(pred + diff, -32768, 32767)
    index = np.clip(index + _IMA_INDEX_TABLE[nib & 7], 0, 88)
    return pred, index


def ima_adpcm_decode_blocks(
    data: bytes, block_align: int, n_channels: int = 1
) -> np.ndarray:
    """Decode WAVE_FORMAT_IMA_ADPCM payload bytes -> int16 (n_frames, ch).

    Block layout per channel: 4-byte header (predictor int16 LE, step index
    uint8, reserved), then nibble data in 4-byte words that alternate
    channels; low nibble of each byte is the earlier sample. Sequential per
    block, vectorized across blocks (the corpus-scale axis)."""
    ba, ch = int(block_align), int(n_channels)
    if ba <= 4 * ch or (ba - 4 * ch) % (4 * ch) != 0:
        raise ValueError(f"invalid IMA ADPCM block_align {ba} for {ch} ch")
    usable = len(data) - (len(data) % ba)
    if usable <= 0:
        return np.zeros((0, ch), dtype=np.int16)
    blocks = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, ba)
    n_blocks = blocks.shape[0]
    spb = (ba - 4 * ch) * 2 // ch + 1  # samples per block per channel

    out = np.empty((n_blocks, spb, ch), dtype=np.int16)
    preds = np.empty((n_blocks, ch), dtype=np.int32)
    idxs = np.empty((n_blocks, ch), dtype=np.int32)
    for c in range(ch):
        hdr = blocks[:, 4 * c : 4 * c + 4]
        preds[:, c] = (
            hdr[:, :2].copy().view("<i2").reshape(-1).astype(np.int32)
        )
        idxs[:, c] = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        out[:, 0, c] = preds[:, c].astype(np.int16)

    # nibble payload: 4-byte words alternating channels
    body = blocks[:, 4 * ch :].reshape(n_blocks, -1, ch, 4)  # (B, words, ch, 4)
    lo = body & 0x0F
    hi = body >> 4
    # per channel, per word: 8 nibbles in time order lo0,hi0,lo1,hi1,...
    nibs = np.empty(body.shape[:3] + (8,), dtype=np.uint8)
    nibs[..., 0::2] = lo
    nibs[..., 1::2] = hi
    nibs = nibs.reshape(n_blocks, -1, ch, 8).transpose(0, 2, 1, 3).reshape(
        n_blocks, ch, -1
    )  # (B, ch, spb-1) in time order

    pred, index = preds, idxs
    for t in range(spb - 1):
        pred, index = _ima_step(pred, index, nibs[:, :, t].astype(np.int32))
        out[:, t + 1, :] = pred.astype(np.int16)
    return out.reshape(-1, ch)


def ima_adpcm_encode_blocks(
    samples: np.ndarray, block_align: int = 256
) -> bytes:
    """Encode mono/stereo int16 (n, ch) -> WAVE_FORMAT_IMA_ADPCM bytes.

    Fixture-grade encoder using the canonical IMA quantizer; the decoder's
    update rule is reused so encode->decode is self-consistent. Vectorized
    across blocks like the decoder. Pads the tail block by repeating the
    final sample (standard practice; `fact` chunk records true length)."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    ba = int(block_align)
    spb = (ba - 4 * ch) * 2 // ch + 1
    if n == 0:
        return b""
    n_blocks = -(-n // spb)
    padded = np.empty((n_blocks * spb, ch), dtype=np.int16)
    padded[:n] = x
    padded[n:] = x[-1]
    xb = padded.reshape(n_blocks, spb, ch).astype(np.int32)

    pred = xb[:, 0, :].copy()  # (B, ch) header predictor = first sample
    # Seed each block's step index from its own mean |delta| so blocks stay
    # independent (block-parallel encode — the header stores the index, so
    # any seed decodes spec-conformantly) without the index-0 attack
    # transient a per-block reset would otherwise cause every block.
    mean_d = np.abs(np.diff(xb, axis=1)).mean(axis=1)  # (B, ch)
    index0 = np.clip(
        np.searchsorted(_IMA_STEP_TABLE, mean_d).astype(np.int32), 0, 88
    )
    index = index0.copy()
    nibs = np.empty((n_blocks, spb - 1, ch), dtype=np.uint8)
    for t in range(spb - 1):
        target = xb[:, t + 1, :]
        step = _IMA_STEP_TABLE[index]
        diff = target - pred
        sign = np.where(diff < 0, 8, 0)
        diff = np.abs(diff)
        delta = np.zeros_like(diff)
        tmp = step.copy()
        for bit in (4, 2, 1):
            take = diff >= tmp
            delta = delta | np.where(take, bit, 0)
            diff = diff - np.where(take, tmp, 0)
            tmp = tmp >> 1
        nib = (delta | sign).astype(np.int32)
        pred, index = _ima_step(pred, index, nib)
        nibs[:, t, :] = nib.astype(np.uint8)

    blocks = np.zeros((n_blocks, ba), dtype=np.uint8)
    hdr_pred = xb[:, 0, :].astype("<i2")
    hdr_index = index0.astype(np.uint8)
    for c in range(ch):
        blocks[:, 4 * c : 4 * c + 2] = hdr_pred[:, c : c + 1].copy().view(np.uint8)
        blocks[:, 4 * c + 2] = hdr_index[:, c]
    # pack nibbles back into alternating 4-byte words
    tn = nibs.transpose(0, 2, 1).reshape(n_blocks, ch, -1, 8)  # (B,ch,words,8)
    packed = (tn[..., 0::2] | (tn[..., 1::2] << 4)).astype(np.uint8)  # (B,ch,w,4)
    body = packed.transpose(0, 2, 1, 3).reshape(n_blocks, -1)
    blocks[:, 4 * ch :] = body
    return blocks.tobytes()


# ---------------------------------------------------------------------------
# RIFF/WAVE container
# ---------------------------------------------------------------------------


def wav_parse(content: bytes) -> dict:
    """Walk RIFF chunks; return fmt fields + data payload + fact length.

    Tolerates trailing garbage and odd-sized chunks (RIFF pads to even)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(content)
    info: dict = {"fact_samples": None, "data": None}
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            (tag, ch, sr, _br, ba, bits) = struct.unpack_from("<HHIIHH", body, 0)
            info.update(
                format_tag=tag, n_channels=ch, sample_rate=sr,
                block_align=ba, bits_per_sample=bits,
            )
        elif cid == b"fact" and len(body) >= 4:
            info["fact_samples"] = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            info["data"] = bytes(body)
        pos += 8 + size + (size & 1)
    if "format_tag" not in info or info["data"] is None:
        raise ValueError("WAVE payload missing fmt or data chunk")
    return info


def wav_decode(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload of format PCM(8/16), A-law, mu-law or IMA ADPCM
    -> (int16 samples (n_frames, n_channels), sample_rate)."""
    info = wav_parse(content)
    tag, ch = info["format_tag"], max(1, info["n_channels"])
    data = info["data"]
    if tag == WAVE_FORMAT_PCM:
        bits = info["bits_per_sample"]
        if bits == 16:
            arr = np.frombuffer(data[: len(data) - (len(data) % (2 * ch))], "<i2")
        elif bits == 8:  # 8-bit WAV is unsigned; center and widen
            arr = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) * 256
        else:
            raise ValueError(f"unsupported PCM sample width {bits}")
        return arr.reshape(-1, ch), info["sample_rate"]
    if tag == WAVE_FORMAT_MULAW:
        arr = ulaw_decode(np.frombuffer(data, np.uint8))
        return arr.reshape(-1, ch), info["sample_rate"]
    if tag == WAVE_FORMAT_ALAW:
        arr = alaw_decode(np.frombuffer(data, np.uint8))
        return arr.reshape(-1, ch), info["sample_rate"]
    if tag == WAVE_FORMAT_IMA_ADPCM:
        out = ima_adpcm_decode_blocks(data, info["block_align"], ch)
        fact = info["fact_samples"]
        if fact is not None and 0 <= fact <= len(out):
            out = out[:fact]  # drop tail-block padding
        return out, info["sample_rate"]
    raise ValueError(f"unsupported WAVE format tag 0x{tag:04x}")


def wav_encode(
    samples: np.ndarray, sample_rate: int, fmt: str = "pcm16",
    block_align: int = 256,
) -> bytes:
    """Write int16 (n, ch) samples as a WAV payload in the given format
    ('pcm16' | 'ulaw' | 'alaw' | 'ima_adpcm'). Compressed formats carry the
    mandatory `fact` chunk (true frame count)."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if fmt == "pcm16":
        tag, bits, ba, data = WAVE_FORMAT_PCM, 16, 2 * ch, x.astype("<i2").tobytes()
        byte_rate = sample_rate * ba
    elif fmt == "ulaw":
        tag, bits, ba = WAVE_FORMAT_MULAW, 8, ch
        data = ulaw_encode(x.reshape(-1)).tobytes()
        byte_rate = sample_rate * ba
    elif fmt == "alaw":
        tag, bits, ba = WAVE_FORMAT_ALAW, 8, ch
        data = alaw_encode(x.reshape(-1)).tobytes()
        byte_rate = sample_rate * ba
    elif fmt == "ima_adpcm":
        tag, bits, ba = WAVE_FORMAT_IMA_ADPCM, 4, int(block_align)
        data = ima_adpcm_encode_blocks(x, ba)
        spb = (ba - 4 * ch) * 2 // ch + 1
        byte_rate = (sample_rate * ba + spb - 1) // spb
    else:
        raise ValueError(f"unknown wav encode fmt {fmt!r}")

    if tag == WAVE_FORMAT_PCM:
        fmt_chunk = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, byte_rate, ba, bits
        )
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        spb = (ba - 4 * ch) * 2 // ch + 1
        fmt_chunk = struct.pack(
            "<HHIIHHHH", tag, ch, sample_rate, byte_rate, ba, bits, 2, spb
        )
    else:
        fmt_chunk = struct.pack(
            "<HHIIHHH", tag, ch, sample_rate, byte_rate, ba, bits, 0
        )
    chunks = [(b"fmt ", fmt_chunk)]
    if tag != WAVE_FORMAT_PCM:
        chunks.append((b"fact", struct.pack("<I", n)))
    chunks.append((b"data", data))
    body = b"WAVE"
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_fft(x: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Fourier-domain resampling (the classic zero-pad/truncate-spectrum
    method): float (n,) or (n, ch) samples at from_rate -> (m,) / (m, ch)
    at to_rate with m = n * to_rate // from_rate. Pure tones below the
    output Nyquist survive with their frequency exact; energy above it is
    removed (the spectrum is truncated, i.e. an ideal brick-wall filter).
    Deterministic (numpy rfft/irfft only)."""
    if from_rate <= 0 or to_rate <= 0:
        raise ValueError("rates must be positive")
    x = np.asarray(x, np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[0]
    if from_rate == to_rate or n == 0:
        out = x.copy()
        return out[:, 0] if squeeze else out
    m = n * to_rate // from_rate
    if m == 0:
        out = np.zeros((0, x.shape[1]))
        return out[:, 0] if squeeze else out
    X = np.fft.rfft(x, axis=0)
    Y = np.zeros((m // 2 + 1, x.shape[1]), complex)
    k = min(X.shape[0], Y.shape[0])
    Y[:k] = X[:k]
    if k < X.shape[0] and m % 2 == 0:
        # truncation landed ON the new Nyquist bin: keep it real (its
        # imaginary part has no conjugate partner in the shorter spectrum)
        Y[k - 1] = Y[k - 1].real
    out = np.fft.irfft(Y, n=m, axis=0) * (m / n)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# log-mel spectrogram — the acoustic-model front end (public formulation:
# Davis & Mermelstein 1980 mel filterbanks; the 25 ms / 10 ms / 80-bin
# configuration is the one modern speech encoders standardized on)
# ---------------------------------------------------------------------------


def mel_hz_to_mel(f):
    """HTK mel scale: 2595 * log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters, HTK mel spacing, peak 1.0."""
    if fmax is None:
        fmax = rate / 2.0
    pts = mel_mel_to_hz(
        np.linspace(mel_hz_to_mel(fmin), mel_hz_to_mel(fmax), n_mels + 2)
    )
    bins = np.fft.rfftfreq(n_fft, 1.0 / rate)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, ctr, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-12)
        down = (hi - bins) / max(hi - ctr, 1e-12)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def logmel_frames(
    mono: np.ndarray,
    rate: int,
    n_mels: int = 80,
    frame_ms: int = 25,
    hop_ms: int = 10,
    floor_db: float = -80.0,
) -> np.ndarray:
    """(n_frames, n_mels) log10 mel energies in dB relative to full scale,
    clamped at floor_db. mono is float in [-1, 1]. Hann window, rfft at the
    frame length, triangular HTK mel filters. Vectorized: ONE strided
    frame matrix -> ONE rfft -> ONE matmul against the filterbank."""
    mono = np.asarray(mono, np.float64)
    flen = max(2, rate * frame_ms // 1000)
    hop = max(1, rate * hop_ms // 1000)
    if len(mono) < flen:
        return np.zeros((0, n_mels))
    n_frames = 1 + (len(mono) - flen) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hanning(flen)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(n_mels, flen, rate)
    mel = spec @ fb.T
    # dB relative to a full-scale sine's frame energy (coherent gain of the
    # hann window), so levels are comparable across frame lengths
    ref = (0.5 * np.hanning(flen).sum()) ** 2 / 2.0
    db = 10.0 * np.log10(np.maximum(mel / ref, 10.0 ** (floor_db / 10.0)))
    return db
