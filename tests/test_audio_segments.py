"""Energy-VAD audio segmentation (multimodal.audio_segments): boundary
goldens over synthesized tone/silence layouts through the REAL WAV and FLAC
codecs, gap bridging, minimum-length drop, clipping stats, the zero-segment
accounting row, and the per-asset error envelope."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.audio_codecs import wav_encode
from ocr_spark.operators.flac_codec import flac_encode
from ocr_spark.operators.multimodal import segment_audio_array

SR = 16000


def tone(sec: float, amp: int = 8000, freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(SR * sec))
    return (amp * np.sin(2 * np.pi * freq * t / SR)).astype(np.int16)


def silence(sec: float) -> np.ndarray:
    return np.zeros(int(SR * sec), dtype=np.int16)


def layout(*parts: np.ndarray) -> np.ndarray:
    return np.concatenate(parts).reshape(-1, 1)


FRAME = 0.025  # operator default frame_ms=25


def test_segment_boundaries_two_utterances():
    x = layout(silence(0.5), tone(1.0), silence(0.7), tone(0.5), silence(0.2))
    segs = segment_audio_array(x[:, 0].astype(np.float64) / 32768.0, SR)
    assert len(segs) == 2
    assert segs[0]["start_sec"] == pytest.approx(0.5, abs=2 * FRAME)
    assert segs[0]["end_sec"] == pytest.approx(1.5, abs=2 * FRAME)
    assert segs[1]["start_sec"] == pytest.approx(2.2, abs=2 * FRAME)
    assert segs[1]["end_sec"] == pytest.approx(2.7, abs=2 * FRAME)
    for s in segs:
        assert s["rms"] > 0.1 and s["clip_ratio"] == 0.0


def test_short_gap_bridged_short_blip_dropped():
    # 100 ms gap <= min_gap 150 ms: one merged segment
    x = layout(tone(0.3), silence(0.1), tone(0.3))
    segs = segment_audio_array(x[:, 0] / 32768.0, SR)
    assert len(segs) == 1
    assert segs[0]["end_sec"] - segs[0]["start_sec"] == pytest.approx(
        0.7, abs=2 * FRAME
    )
    # a 100 ms blip < min_len 200 ms: dropped entirely
    y = layout(silence(0.5), tone(0.1), silence(0.5))
    assert segment_audio_array(y[:, 0] / 32768.0, SR) == []


def test_all_silence_yields_no_segments():
    # the -60 dBFS absolute floor: all-silence has peak_rms 0 and must not
    # self-normalize into "everything is active"
    assert segment_audio_array(silence(1.0).astype(np.float64), SR) == []
    # near-silent dither stays below the absolute floor too
    dither = (np.random.default_rng(7).integers(-2, 3, SR) / 32768.0)
    assert segment_audio_array(dither, SR) == []


def test_clipping_ratio_on_square_wave():
    sq = np.tile(
        np.concatenate([np.full(40, 32767), np.full(40, -32768)]), 100
    ).astype(np.int16)
    segs = segment_audio_array(sq.astype(np.float64) / 32768.0, SR)
    assert len(segs) == 1
    assert segs[0]["clip_ratio"] == pytest.approx(1.0, abs=0.01)
    assert segs[0]["peak"] == pytest.approx(1.0, abs=1e-4)


def test_audio_segments_spark_surface(spark):
    from ocr_spark.operators.multimodal import audio_segments

    wav = wav_encode(
        layout(silence(0.5), tone(1.0), silence(0.7), tone(0.5)), SR, "pcm16"
    )
    flac = flac_encode(layout(silence(0.4), tone(0.6)).astype(np.int32), SR)
    quiet = wav_encode(layout(silence(1.0)), SR, "pcm16")
    rows = [
        ("a.wav", bytearray(wav)),
        ("b.flac", bytearray(flac)),
        ("c.quiet", bytearray(quiet)),
        ("d.bad", bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    out = {}
    for r in audio_segments(df).collect():
        out.setdefault(r["media_ref"], []).append(r)

    a = sorted(out["a.wav"], key=lambda r: r["seg_idx"])
    assert len(a) == 2 and all(r["n_segments"] == 2 for r in a)
    assert a[0]["start_sec"] == pytest.approx(0.5, abs=2 * FRAME)

    (b,) = out["b.flac"]
    assert b["seg_idx"] == 0 and b["start_sec"] == pytest.approx(0.4, abs=2 * FRAME)

    # all-silence: ONE accounting row, not a vanished asset
    (c,) = out["c.quiet"]
    assert c["seg_idx"] is None and c["n_segments"] == 0 and c["error"] is None

    (d,) = out["d.bad"]
    assert d["error"] is not None and d["seg_idx"] is None


def test_per_channel_clipping_not_hidden_by_downmix():
    # ch0 hard-clipped square, ch1 quiet: the stereo mean never clips, but
    # the per-channel stats must report it
    n = SR  # 1 s
    ch0 = np.tile(np.array([32767, -32768] * 40), n // 80).astype(np.float64)
    ch1 = (4000 * np.sin(2 * np.pi * 440 * np.arange(len(ch0)) / SR))
    stereo = np.stack([ch0, ch1], axis=1) / 32768.0
    mono = stereo.mean(axis=1)
    segs = segment_audio_array(mono, SR, stats_x=stereo)
    assert len(segs) == 1
    assert segs[0]["clip_ratio"] == pytest.approx(0.5, abs=0.01)
    assert segs[0]["peak"] == pytest.approx(1.0, abs=1e-4)
    # without stats_x the downmix hides it — the exact failure reviewed
    hidden = segment_audio_array(mono, SR)
    assert hidden[0]["clip_ratio"] == 0.0


def test_audio_segments_stereo_clip_spark(spark):
    from ocr_spark.operators.audio_codecs import wav_encode
    from ocr_spark.operators.multimodal import audio_segments

    n = SR
    ch0 = np.tile(np.array([32767, -32768] * 40), n // 80).astype(np.int16)
    ch1 = (4000 * np.sin(2 * np.pi * 440 * np.arange(len(ch0)) / SR)).astype(
        np.int16
    )
    wav = wav_encode(np.stack([ch0, ch1], axis=1), SR, "pcm16")
    df = spark.createDataFrame(
        [("s.wav", bytearray(wav))], "media_ref string, content binary"
    )
    (r,) = audio_segments(df).collect()
    assert r["clip_ratio"] == pytest.approx(0.5, abs=0.01)
