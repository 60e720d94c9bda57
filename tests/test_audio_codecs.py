"""Compressed-audio codecs: G.711 mu-law/A-law + IMA ADPCM WAV.

Goldens: exhaustive equality vs stdlib audioop where present (removed in
3.13), literal vectors that outlive it, a scalar pure-Python IMA reference
cross-checking the block-vectorized decoder, container roundtrips, and the
e2e Spark audio_features path over compressed fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.audio_codecs import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    alaw_decode,
    alaw_encode,
    ima_adpcm_decode_blocks,
    ima_adpcm_encode_blocks,
    ulaw_decode,
    ulaw_encode,
    wav_decode,
    wav_encode,
    wav_parse,
)

try:
    import audioop  # noqa: F401  (deprecated; removed in 3.13)

    HAVE_AUDIOOP = True
except ImportError:
    HAVE_AUDIOOP = False

ALL_INT16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


# --- G.711 vs audioop (exhaustive) -----------------------------------------


@pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
def test_ulaw_encode_matches_audioop_exhaustive():
    import audioop

    ref = np.frombuffer(audioop.lin2ulaw(ALL_INT16.astype("<i2").tobytes(), 2), np.uint8)
    assert np.array_equal(ulaw_encode(ALL_INT16), ref)


@pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
def test_ulaw_decode_matches_audioop_exhaustive():
    import audioop

    ref = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), "<i2")
    assert np.array_equal(ulaw_decode(ALL_CODES), ref)


@pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
def test_alaw_matches_audioop_exhaustive():
    import audioop

    assert np.array_equal(
        alaw_encode(ALL_INT16),
        np.frombuffer(audioop.lin2alaw(ALL_INT16.astype("<i2").tobytes(), 2), np.uint8),
    )
    assert np.array_equal(
        alaw_decode(ALL_CODES),
        np.frombuffer(audioop.alaw2lin(ALL_CODES.tobytes(), 2), "<i2"),
    )


# --- G.711 literal goldens (audioop-independent) ----------------------------

# (pcm, ulaw_code, alaw_code) triples computed once from CPython 3.11 audioop
G711_GOLDEN = [
    (-32768, 0x00, 0x2A),
    (-16384, 0x0F, 0x3A),
    (-4096, 0x2F, 0x1A),
    (-1000, 0x4E, 0x7A),
    (-128, 0x6F, 0x52),
    (-8, 0x7E, 0x55),
    (-1, 0x7E, 0x55),
    (0, 0xFF, 0xD5),
    (1, 0xFF, 0xD5),
    (8, 0xFE, 0xD5),
    (128, 0xEF, 0xDD),
    (1000, 0xCE, 0xFA),
    (4096, 0xAF, 0x85),
    (16384, 0x8F, 0xA5),
    (32767, 0x80, 0xAA),
]


def test_g711_literal_goldens():
    pcm = np.array([g[0] for g in G711_GOLDEN], dtype=np.int16)
    assert list(ulaw_encode(pcm)) == [g[1] for g in G711_GOLDEN]
    assert list(alaw_encode(pcm)) == [g[2] for g in G711_GOLDEN]


def test_g711_roundtrip_monotone_error_bound():
    # G.711 quantization error is bounded by half the local step size:
    # <= 1024 absolute for mu-law, <= 512 for A-law at full scale
    for enc, dec, bound in [
        (ulaw_encode, ulaw_decode, 1024),
        (alaw_encode, alaw_decode, 512),
    ]:
        rt = dec(enc(ALL_INT16)).astype(np.int32)
        assert np.abs(rt - ALL_INT16.astype(np.int32)).max() <= bound


# --- IMA ADPCM ---------------------------------------------------------------


def _ima_decode_scalar(data: bytes, block_align: int, ch: int) -> np.ndarray:
    """Pure-Python scalar reference decoder (the executable spec)."""
    step_t, idx_t = [int(s) for s in _IMA_STEP_TABLE], [int(i) for i in _IMA_INDEX_TABLE]
    out = []
    for b0 in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[b0 : b0 + block_align]
        preds, idxs, chans = [], [], []
        for c in range(ch):
            h = block[4 * c : 4 * c + 4]
            preds.append(int.from_bytes(h[:2], "little", signed=True))
            idxs.append(min(max(h[2], 0), 88))
            chans.append([preds[c]])
        body = block[4 * ch :]
        # 4-byte words alternate channels; low nibble first
        for w0 in range(0, len(body), 4 * ch):
            for c in range(ch):
                word = body[w0 + 4 * c : w0 + 4 * c + 4]
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = step_t[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            diff = -diff
                        preds[c] = min(max(preds[c] + diff, -32768), 32767)
                        idxs[c] = min(max(idxs[c] + idx_t[nib & 7], 0), 88)
                        chans[c].append(preds[c])
        n = min(len(cc) for cc in chans)
        out.extend(
            [chans[c][i] for c in range(ch)] for i in range(n)
        )
    return np.array(out, dtype=np.int16).reshape(-1, ch)


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_vectorized_decode_matches_scalar_reference(ch):
    rng = np.random.default_rng(11 + ch)
    ba = 64 * ch
    data = rng.integers(0, 256, size=ba * 5, dtype=np.uint8).tobytes()
    got = ima_adpcm_decode_blocks(data, ba, ch)
    ref = _ima_decode_scalar(data, ba, ch)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_ima_roundtrip_snr_and_length():
    t = np.arange(4000) / 8000
    sig = (np.sin(2 * np.pi * 440 * t) * 12000 + np.sin(2 * np.pi * 97 * t) * 6000).astype(
        np.int16
    )
    enc = ima_adpcm_encode_blocks(sig[:, None], 256)
    dec = ima_adpcm_decode_blocks(enc, 256, 1)[: len(sig), 0]
    err = sig.astype(np.float64) - dec.astype(np.float64)
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25.0


def test_ima_stereo_roundtrip():
    t = np.arange(2000) / 8000
    left = (np.sin(2 * np.pi * 300 * t) * 10000).astype(np.int16)
    st = np.stack([left, left[::-1]], axis=1)
    enc = ima_adpcm_encode_blocks(st, 256)
    dec = ima_adpcm_decode_blocks(enc, 256, 2)[: len(st)]
    err = st.astype(np.float64) - dec.astype(np.float64)
    snr = 10 * np.log10((st.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25.0


def test_ima_bad_block_align_raises():
    with pytest.raises(ValueError):
        ima_adpcm_decode_blocks(b"\x00" * 64, 4, 1)  # header-only block
    with pytest.raises(ValueError):
        ima_adpcm_decode_blocks(b"\x00" * 64, 7, 1)  # not word-aligned


# --- WAV container -----------------------------------------------------------


@pytest.mark.parametrize(
    "fmt,tol",
    [("pcm16", 0), ("ulaw", 1024), ("alaw", 512), ("ima_adpcm", 1500)],
)
def test_wav_container_roundtrip(fmt, tol):
    t = np.arange(1777) / 8000  # non-multiple of any block size
    sig = (np.sin(2 * np.pi * 333 * t) * 15000).astype(np.int16)
    payload = wav_encode(sig, 8000, fmt)
    got, sr = wav_decode(payload)
    assert sr == 8000
    assert got.shape == (len(sig), 1)  # fact chunk trims ADPCM tail padding
    err = np.abs(got[:, 0].astype(np.int32) - sig.astype(np.int32)).max()
    assert err <= tol


def test_wav_parse_rejects_garbage():
    with pytest.raises(ValueError):
        wav_parse(b"not a riff payload at all")
    with pytest.raises(ValueError):
        wav_parse(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data


def test_wav_decode_matches_stdlib_wave_for_pcm():
    import io
    import wave

    sig = (np.sin(np.arange(500) / 10) * 9000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.astype("<i2").tobytes())
    got, sr = wav_decode(buf.getvalue())
    assert sr == 8000 and np.array_equal(got[:, 0], sig)


def test_wav_odd_data_chunk_padding():
    # odd-length chunks are padded to even per RIFF; parser must skip the pad
    sig = np.array([100], dtype=np.int16)
    payload = wav_encode(sig, 8000, "ulaw")  # 1-byte data chunk -> padded
    got, sr = wav_decode(payload)
    assert got.shape == (1, 1)


# --- e2e through the Spark audio pipeline ------------------------------------


def test_audio_features_over_compressed_fixtures(spark):
    from ocr_spark.operators.multimodal import audio_assets_df, audio_features, decode_audio
    from ocr_spark.sources.media import synth_audio_compressed_bytes

    refs = spark.createDataFrame(
        [(f"audio://c{i}",) for i in range(12)], "media_ref string"
    )
    rows = {
        r["media_ref"]: r
        for r in audio_features(audio_assets_df(refs, encoding="compressed")).collect()
    }
    assert len(rows) == 12
    fmts = set()
    for ref, row in rows.items():
        assert row["error"] is None, row
        payload = synth_audio_compressed_bytes(ref)
        samples, sr = decode_audio(payload)
        x = samples[:, 0].astype(np.float64) / 32768.0
        assert row["sample_rate"] == sr
        assert row["duration_sec"] == pytest.approx(len(samples) / sr)
        assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
        fmts.add(wav_parse(payload)["format_tag"])
    assert len(fmts) >= 2  # the seeded corpus exercises multiple format tags


def test_audio_features_error_envelope_for_unknown_tag(spark):
    import struct

    from ocr_spark.operators.multimodal import AUDIO_FEATURE_SCHEMA, audio_features

    # hand-build a WAV with an unsupported format tag (0x55 = MP3-in-WAV)
    fmtc = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assets = spark.createDataFrame(
        [("audio://bad", "audio", payload, {"n_bytes": len(payload)})],
        "media_ref string, media_type string, content binary, meta map<string,int>",
    )
    row = audio_features(assets.select("media_ref", "content")).collect()[0]
    assert row["error"] is not None and "0x0055" in row["error"]
    assert row["sample_rate"] is None
