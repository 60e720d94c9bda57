"""Speech-corpus audio standardization: Fourier resampling (pure tones
survive with exact frequency) + mono downmix + peak normalization ->
16-bit PCM WAV. Golden per the binary-asset board convention."""

import math

import numpy as np

from ocr_spark.operators.audio_codecs import resample_fft, wav_decode, wav_encode
from ocr_spark.operators.multimodal import audio_standardize


def _sine(freq: float, rate: int, n: int, amp: float = 0.5) -> np.ndarray:
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)


def _dominant_hz(x: np.ndarray, rate: int) -> float:
    spec = np.abs(np.fft.rfft(x))
    return spec.argmax() * rate / len(x)


class TestResampleFft:
    def test_downsample_preserves_tone(self):
        x = _sine(440.0, 44100, 44100, amp=1.0)
        y = resample_fft(x, 44100, 16000)
        assert len(y) == 16000
        assert _dominant_hz(y, 16000) == 440.0
        spec = np.abs(np.fft.rfft(y))
        assert abs(spec.max() * 2 / len(y) - 1.0) < 1e-9  # amplitude exact

    def test_upsample_preserves_tone(self):
        x = _sine(1000.0, 16000, 16000)
        y = resample_fft(x, 16000, 48000)
        assert len(y) == 48000
        assert _dominant_hz(y, 48000) == 1000.0

    def test_above_new_nyquist_is_removed(self):
        # 10 kHz tone cannot exist at 16 kHz output (Nyquist 8 kHz)
        x = _sine(10_000.0, 44100, 44100, amp=1.0)
        y = resample_fft(x, 44100, 16000)
        assert float(np.abs(y).max()) < 1e-9

    def test_same_rate_is_identity(self):
        x = _sine(123.0, 8000, 800)
        assert np.array_equal(resample_fft(x, 8000, 8000), x)

    def test_multichannel_and_empty(self):
        x = np.stack([_sine(100.0, 8000, 8000), _sine(200.0, 8000, 8000)], axis=1)
        y = resample_fft(x, 8000, 4000)
        assert y.shape == (4000, 2)
        assert _dominant_hz(y[:, 0], 4000) == 100.0
        assert _dominant_hz(y[:, 1], 4000) == 200.0
        assert resample_fft(np.zeros(0), 8000, 4000).shape == (0,)


class TestAudioStandardize:
    def _std(self, spark, payloads, **kw):
        df = spark.createDataFrame(
            [(r, bytearray(c)) for r, c in payloads],
            "media_ref string, content binary",
        )
        return {r["media_ref"]: r for r in audio_standardize(df, **kw).collect()}

    def test_stereo_44k_to_mono_16k(self, spark):
        pcm = (
            np.stack(
                [_sine(440.0, 44100, 44100), _sine(440.0, 44100, 44100)], axis=1
            )
            * 32767
        ).astype(np.int16)
        wav = wav_encode(pcm, 44100)
        got = self._std(spark, [("a.wav", wav)])["a.wav"]
        assert got["error"] is None
        assert got["sample_rate"] == 16000 and got["src_rate"] == 44100
        assert got["src_channels"] == 2 and got["n_samples"] == 16000
        assert got["duration_ms"] == 1000
        out, rate = wav_decode(bytes(got["content"]))
        assert rate == 16000
        mono = out[:, 0] / 32768.0
        assert _dominant_hz(mono, 16000) == 440.0
        # peak normalized to -1 dBFS
        peak_db = 20 * math.log10(np.abs(mono).max())
        assert abs(peak_db - (-1.0)) < 0.05

    def test_silence_skips_normalization(self, spark):
        wav = wav_encode(np.zeros((8000, 1), np.int16), 8000)
        got = self._std(spark, [("s.wav", wav)])["s.wav"]
        assert got["error"] is None
        assert got["peak_src_dbfs"] is None
        out, _ = wav_decode(bytes(got["content"]))
        assert int(np.abs(out).max()) == 0

    def test_opposite_phase_stereo_cancels(self, spark):
        x = _sine(500.0, 16000, 16000)
        pcm = (np.stack([x, -x], axis=1) * 32767).astype(np.int16)
        got = self._std(spark, [("c.wav", wav_encode(pcm, 16000))])["c.wav"]
        out, _ = wav_decode(bytes(got["content"]))
        assert int(np.abs(out).max()) <= 1  # downmix is the channel mean

    def test_error_envelope_for_perceptual_codec(self, spark):
        got = self._std(spark, [("x.mp3", b"\xff\xfb\x90\x00junk")])["x.mp3"]
        assert got["error"] is not None and got["content"] is None

    def test_no_normalize_preserves_level(self, spark):
        pcm = (_sine(440.0, 16000, 16000, amp=0.25) * 32768).astype(np.int16)
        got = self._std(
            spark, [("q.wav", wav_encode(pcm[:, None], 16000))], normalize=False
        )["q.wav"]
        out, _ = wav_decode(bytes(got["content"]))
        peak = np.abs(out[:, 0]).max() / 32767.0
        assert abs(peak - 0.25) < 0.01


class TestLogMel:
    def test_tone_lands_in_correct_mel_bin(self):
        from ocr_spark.operators.audio_codecs import (
            logmel_frames,
            mel_hz_to_mel,
            mel_mel_to_hz,
        )

        x = 0.9 * _sine(1000.0, 16000, 16000, amp=1.0)
        lm = logmel_frames(x, 16000)
        assert lm.shape == (1 + (16000 - 400) // 160, 80)
        centers = mel_mel_to_hz(
            np.linspace(mel_hz_to_mel(0.0), mel_hz_to_mel(8000.0), 82)
        )[1:-1]
        k = int(lm[lm.shape[0] // 2].argmax())
        # the tone's energy peaks in the mel bin whose center is nearest
        assert abs(centers[k] - 1000.0) == abs(centers - 1000.0).min()
        # full-scale-referenced level: a 0.9 sine sits near -0.9 dBFS
        assert abs(lm.max() - 20 * math.log10(0.9)) < 2.5

    def test_silence_is_floored_and_short_input_empty(self):
        from ocr_spark.operators.audio_codecs import logmel_frames

        assert float(logmel_frames(np.zeros(16000), 16000).max()) == -80.0
        assert logmel_frames(np.zeros(100), 16000).shape == (0, 80)

    def test_spark_surface_composes_with_standardize(self, spark):
        from ocr_spark.operators.multimodal import audio_logmel

        pcm = (_sine(440.0, 44100, 44100) * 32767).astype(np.int16)
        wav = wav_encode(pcm[:, None], 44100)
        assets = spark.createDataFrame(
            [("t.wav", bytearray(wav)), ("bad.mp3", bytearray(b"\xff\xfbxx"))],
            "media_ref string, content binary",
        )
        std = audio_standardize(assets).where("error IS NULL")
        got = {
            r["media_ref"]: r
            for r in audio_logmel(std.select("media_ref", "content")).collect()
        }
        r = got["t.wav"]
        assert r["error"] is None
        assert r["n_frames"] == 1 + (16000 - 400) // 160 and r["n_mels"] == 80
        assert len(r["feats"]) == r["n_frames"] * 80
        assert r["max_db"] > -3.0  # standardize normalized to -1 dBFS
        # the mp3 was dropped by standardize's envelope before logmel
        assert set(got) == {"t.wav"}
