"""Audio provenance tags (operators/audio_tags): ID3v2.2/2.3/2.4 across
all four text encodings + unsynchronisation, Vorbis comments via FLAC /
Ogg Vorbis / Ogg Opus, RIFF INFO, container dispatch, corrupt-input
hardening, and the Spark surface with error envelopes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.operators.audio_tags import (
    add_flac_tags,
    add_wav_info,
    audio_tags_parse,
    flac_tags,
    id3v2_tags,
    ogg_tags,
    synth_id3v2,
    synth_ogg_tagged,
    vorbis_comment_parse,
    wav_info_tags,
)

TAGS = {
    "title": "Söng — テスト",
    "artist": "A/B",
    "album": "Al",
    "date": "2024",
    "genre": "g",
    "track": "3",
    "language": "ja",
}


class TestId3:
    @pytest.mark.parametrize("version", [2, 3, 4])
    @pytest.mark.parametrize("encoding", [0, 1, 2, 3])
    def test_version_encoding_matrix(self, version, encoding):
        tags = dict(TAGS)
        if encoding == 0:
            tags["title"] = "Plain Song"  # latin-1 cannot carry CJK
        blk = synth_id3v2(tags, version=version, encoding=encoding)
        got = id3v2_tags(blk + b"\xff\xfb" + b"\x00" * 16)
        assert got["title"] == tags["title"], (version, encoding)
        assert got["artist"] == "A/B" and got["date"] == "2024"
        assert got["language"] == "ja" and got["track"] == "3"

    def test_global_unsynchronisation(self):
        blk = synth_id3v2(TAGS, version=4, encoding=1, unsync=True)
        assert id3v2_tags(blk)["title"] == TAGS["title"]

    def test_no_id3_returns_none(self):
        assert id3v2_tags(b"\xff\xfb" + b"\x00" * 32) is None

    def test_padding_terminates_walk(self):
        blk = synth_id3v2({"title": "x"}, version=4)
        # declare a bigger tag and pad with zeros (routine in real files)
        body = blk[10:] + b"\x00" * 64
        size = bytes((len(body) >> s) & 0x7F for s in (21, 14, 7, 0))
        padded = blk[:6] + size + body
        assert id3v2_tags(padded)["title"] == "x"

    def test_hardening(self):
        with pytest.raises(ValueError, match="sanity cap"):
            id3v2_tags(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")
        with pytest.raises(ValueError, match="truncated"):
            id3v2_tags(b"ID3\x04\x00\x00\x00\x00\x01\x00" + b"TIT2")
        with pytest.raises(ValueError, match="unsupported"):
            id3v2_tags(b"ID3\x09\x00\x00\x00\x00\x00\x00")


class TestVorbisFamilies:
    def test_flac_roundtrip_and_stream_still_decodes(self):
        from ocr_spark.operators.flac_codec import flac_decode, flac_encode

        x = (np.sin(np.arange(4000) / 20) * 8000).astype(np.int16)[:, None]
        tagged = add_flac_tags(flac_encode(x, 8000), TAGS)
        got = flac_tags(tagged)
        assert got["title"] == TAGS["title"] and got["track"] == "3"
        y, sr = flac_decode(tagged)  # CRC + MD5 verified inside
        assert sr == 8000 and np.array_equal(y, x)

    def test_flac_without_comment_block_all_none(self):
        from ocr_spark.operators.flac_codec import flac_encode

        x = np.zeros((800, 1), dtype=np.int16)
        assert all(v is None for v in flac_tags(flac_encode(x, 8000)).values())

    @pytest.mark.parametrize("codec", ["vorbis", "opus"])
    def test_ogg_roundtrip_probe_intact(self, codec):
        from ocr_spark.operators.media_probe import ogg_probe

        o = synth_ogg_tagged(TAGS, codec=codec)
        assert ogg_tags(o)["title"] == TAGS["title"]
        assert ogg_probe(o)["codec"] == codec  # CRCs still valid

    def test_comment_hardening(self):
        with pytest.raises(ValueError, match="truncated"):
            vorbis_comment_parse(b"\x00")
        with pytest.raises(ValueError, match="sanity cap"):
            vorbis_comment_parse(struct.pack("<II", 0, 1 << 20))
        with pytest.raises(ValueError, match="overruns"):
            vorbis_comment_parse(struct.pack("<III", 0, 1, 999))

    def test_unknown_keys_ignored(self):
        body = struct.pack("<I", 0) + struct.pack("<I", 2)
        for e in (b"X_WEIRD=1", b"TITLE=t"):
            body += struct.pack("<I", len(e)) + e
        got = vorbis_comment_parse(body)
        assert got["title"] == "t" and got["artist"] is None


class TestWavInfo:
    def test_roundtrip_and_decode_intact(self):
        from ocr_spark.operators.audio_codecs import wav_decode, wav_encode

        x = (np.arange(1000) % 256 * 50).astype(np.int16)[:, None]
        tagged = add_wav_info(wav_encode(x, 8000), TAGS)
        got = wav_info_tags(tagged)
        assert got["title"] == TAGS["title"] and got["language"] == "ja"
        y, sr = wav_decode(tagged)
        assert sr == 8000 and np.array_equal(y, x)

    def test_wav_without_info_all_none(self):
        from ocr_spark.operators.audio_codecs import wav_encode

        w = wav_encode(np.zeros((100, 1), dtype=np.int16), 8000)
        assert all(v is None for v in wav_info_tags(w).values())

    def test_overrun_raises(self):
        bad = b"RIFF\x10\x00\x00\x00WAVELIST\xff\xff\xff\x00INFO"
        with pytest.raises(ValueError, match="overruns"):
            wav_info_tags(bad)


class TestDispatchAndSpark:
    def test_dispatch_all_containers(self):
        from ocr_spark.operators.audio_codecs import wav_encode
        from ocr_spark.operators.flac_codec import flac_encode

        x = np.zeros((400, 1), dtype=np.int16)
        payloads = [
            synth_id3v2(TAGS) + b"\xff\xfb" + b"\x00" * 16,
            add_flac_tags(flac_encode(x, 8000), TAGS),
            synth_ogg_tagged(TAGS, codec="opus"),
            add_wav_info(wav_encode(x, 8000), TAGS),
        ]
        for p in payloads:
            assert audio_tags_parse(p)["title"] == TAGS["title"]
        with pytest.raises(ValueError, match="unrecognized"):
            audio_tags_parse(b"\x00\x01\x02\x03garbage")

    def test_spark_surface(self, spark):
        from ocr_spark.operators.audio_codecs import wav_encode
        from ocr_spark.operators.audio_tags import audio_tags

        x = np.zeros((400, 1), dtype=np.int16)
        assets = spark.createDataFrame(
            [
                ("tagged.mp3", bytearray(synth_id3v2(TAGS) + b"\xff\xfb" + b"\x00" * 16)),
                ("plain.wav", bytearray(wav_encode(x, 8000))),
                ("bad.bin", bytearray(b"\x00\x01garbage")),
            ],
            "media_ref string, content binary",
        )
        out = {r.media_ref: r for r in audio_tags(assets).collect()}
        assert out["tagged.mp3"].title == TAGS["title"]
        assert out["tagged.mp3"].language == "ja" and out["tagged.mp3"].error is None
        assert out["plain.wav"].title is None and out["plain.wav"].error is None
        assert out["bad.bin"].error is not None
