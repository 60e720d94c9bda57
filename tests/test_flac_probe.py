"""FLAC codec (RFC 9639) + container probes (MP3 / Ogg / MP4 / FLAC / WAV).

Goldens: bit-level literal vectors for the FLAC primitives (CRC-8/16,
zigzag Rice, UTF-8-style coded numbers), encode→decode roundtrips across
every subframe type × stereo mode × partition order, corruption detection
(frame CRC, MD5), and container-metadata probes against synthesized valid
streams (MPEG frame-header tables, Ogg page CRC, ISO-BMFF box tree). The
Spark surface (`media_probe`) is exercised end-to-end over a mixed-codec
asset DataFrame with the per-asset error-envelope contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.flac_codec import (
    _BitReader,
    _BitWriter,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
    flac_parse_streaminfo,
)
from ocr_spark.operators.media_probe import (
    mp3_probe,
    mp4_probe,
    ogg_crc,
    ogg_probe,
    probe_bytes,
    synth_mp3,
    synth_mp4,
    synth_ogg,
)

RNG = np.random.default_rng(20260818)


def tonal(n: int, ch: int = 1, amp: int = 3000) -> np.ndarray:
    t = np.arange(n)
    cols = [
        (amp * np.sin(t / (19 + 6 * c)) + RNG.integers(-40, 40, n)).astype(np.int32)
        for c in range(ch)
    ]
    return np.stack(cols, axis=1)


# --- bit-level primitives ---------------------------------------------------


def test_crc8_literal_vectors():
    # CRC-8 poly 0x07, init 0 — classic check value for "123456789" is 0xF4
    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0


def test_crc16_literal_vectors():
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): check = 0xFEE8
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0


def test_ogg_crc_literal_vector():
    # CRC-32/MPEG-2 family but init=0, no reflect, no xorout (the Ogg
    # variant): check value for "123456789" is 0x89A1897F
    assert ogg_crc(b"123456789") == 0x89A1897F


def test_bitreader_msb_first():
    br = _BitReader(bytes([0b10110100, 0b01100000]))
    assert br.read(1) == 1
    assert br.read(3) == 0b011
    assert br.read(6) == 0b010001
    assert br.read_signed(4) == -8  # 1000


def test_bitwriter_roundtrips_reader():
    bw = _BitWriter()
    vals = [(5, 3), (0x3FFE, 14), (1, 1), (0, 7), (123456, 20), (7, 3)]
    for v, n in vals:
        bw.write(v, n)
    bw.align()
    br = _BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(n) == v


def test_unary_across_byte_boundaries():
    bw = _BitWriter()
    for q in (0, 1, 7, 8, 37, 100):
        bw.write_unary(q)
    bw.align()
    br = _BitReader(bw.getvalue())
    for q in (0, 1, 7, 8, 37, 100):
        assert br.read_unary() == q


# --- FLAC roundtrips --------------------------------------------------------


@pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
@pytest.mark.parametrize("force", [None, "verbatim", "lpc"])
def test_flac_stereo_roundtrip(mode, force):
    x = tonal(3000, ch=2)
    enc = flac_encode(x, 44100, stereo_mode=mode, force=force)
    dec, sr = flac_decode(enc)
    assert sr == 44100
    assert np.array_equal(dec, x)


@pytest.mark.parametrize("porder", [0, 1, 3])
def test_flac_rice_partition_orders(porder):
    x = tonal(2048, ch=1)
    enc = flac_encode(x, 32000, block_size=1024, partition_order=porder)
    dec, sr = flac_decode(enc)
    assert np.array_equal(dec, x) and sr == 32000


def test_flac_constant_and_multiframe():
    c = np.full((700, 1), -123, dtype=np.int32)
    enc = flac_encode(c, 8000, block_size=192)
    dec, _ = flac_decode(enc)
    assert np.array_equal(dec, c)
    # >0x7F frames exercises the multi-byte coded frame number
    big = RNG.integers(-2000, 2000, (40000, 1)).astype(np.int32)
    enc = flac_encode(big, 22050, block_size=256)
    assert np.array_equal(flac_decode(enc)[0], big)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_flac_sample_widths(bps):
    lim = 1 << (bps - 1)
    x = RNG.integers(-lim, lim, (1500, 1)).astype(np.int64)
    enc = flac_encode(x, 16000, bps=bps)
    dec, _ = flac_decode(enc)
    assert np.array_equal(dec.astype(np.int64), x)


def test_flac_compresses_tonal_audio():
    x = tonal(20000, ch=2)
    enc = flac_encode(x, 44100)
    assert len(enc) < 0.7 * x.size * 2  # beats raw int16 PCM comfortably


def test_flac_empty_stream():
    enc = flac_encode(np.zeros((0, 1), dtype=np.int32), 16000)
    dec, sr = flac_decode(enc)
    assert dec.shape == (0, 1) and sr == 16000


def test_flac_streaminfo_fields():
    x = tonal(5000, ch=2)
    si = flac_parse_streaminfo(flac_encode(x, 48000))
    assert si["sample_rate"] == 48000
    assert si["n_channels"] == 2
    assert si["bits_per_sample"] == 16
    assert si["total_samples"] == 5000


def test_flac_detects_payload_corruption():
    enc = bytearray(flac_encode(tonal(4000, ch=1), 44100))
    enc[-40] ^= 0x55  # flip bits inside the last frame body
    with pytest.raises(ValueError):
        flac_decode(bytes(enc))


def test_flac_rejects_non_flac():
    with pytest.raises(ValueError):
        flac_decode(b"RIFF\x00\x00\x00\x00WAVE")


def test_flac_through_decode_audio_int16_contract():
    from ocr_spark.operators.multimodal import decode_audio

    x = tonal(4410, ch=2)
    samples, sr = decode_audio(flac_encode(x, 44100))
    assert sr == 44100 and samples.dtype == np.int16
    assert np.array_equal(samples.astype(np.int32), x)
    # 24-bit payloads downshift to the pipeline's int16 contract
    x24 = (x.astype(np.int64) << 8).astype(np.int64)
    samples, _ = decode_audio(flac_encode(x24, 44100, bps=24))
    assert np.array_equal(samples.astype(np.int32), x)


# --- MP3 probe --------------------------------------------------------------


def test_mp3_cbr_duration_and_tables():
    b = synth_mp3(n_frames=20, version="1", layer=3, bitrate_kbps=128, sample_rate=44100)
    p = mp3_probe(b)
    assert p["codec"] == "mpeg1-layer3"
    assert p["n_frames"] == 20 and not p["vbr"]
    assert p["duration_sec"] == pytest.approx(20 * 1152 / 44100)
    assert p["bitrate_kbps"] == 128.0 and p["n_channels"] == 2


@pytest.mark.parametrize(
    "version,layer,kbps,sr,spf",
    [
        ("1", 1, 192, 48000, 384),
        ("1", 2, 160, 32000, 1152),
        ("2", 3, 64, 22050, 576),
        ("2.5", 2, 48, 8000, 1152),
        ("2.5", 3, 32, 11025, 576),
    ],
)
def test_mp3_version_layer_matrix(version, layer, kbps, sr, spf):
    p = mp3_probe(synth_mp3(n_frames=9, version=version, layer=layer,
                            bitrate_kbps=kbps, sample_rate=sr))
    assert p["codec"] == f"mpeg{version}-layer{layer}"
    assert p["sample_rate"] == sr
    assert p["duration_sec"] == pytest.approx(9 * spf / sr)


def test_mp3_id3_and_xing():
    b = synth_mp3(n_frames=50, id3=b"\x00" * 300, xing=True, mono=True)
    p = mp3_probe(b)
    assert p["n_frames"] == 50 and p["vbr"] and p["n_channels"] == 1


def test_mp3_xing_authoritative_on_truncation():
    b = synth_mp3(n_frames=50, xing=True)
    p = mp3_probe(b[: len(b) * 2 // 3])  # cut the tail off mid-stream
    assert p["n_frames"] == 50  # Xing count survives truncation


def test_mp3_resync_over_junk():
    one = synth_mp3(n_frames=1)
    p = mp3_probe(one + b"\xde\xad\xbe\xef" * 16 + one)
    assert p["n_frames"] == 2


def test_mp3_rejects_garbage():
    with pytest.raises(ValueError):
        mp3_probe(b"\x00" * 4096)


# --- Ogg probe --------------------------------------------------------------


def test_ogg_vorbis_ident_and_duration():
    b = synth_ogg("vorbis", sample_rate=48000, n_channels=2, total_samples=96000)
    p = ogg_probe(b)
    assert p == {
        "container": "ogg", "codec": "vorbis", "sample_rate": 48000,
        "n_channels": 2, "n_frames": 2, "duration_sec": 2.0,
        "bitrate_kbps": 112.0, "vbr": None,
    }


def test_ogg_opus_preskip_subtracted():
    b = synth_ogg("opus", n_channels=1, total_samples=48000 * 3, pre_skip=312)
    p = ogg_probe(b)
    assert p["codec"] == "opus" and p["duration_sec"] == pytest.approx(3.0)
    assert p["sample_rate"] == 48000


def test_ogg_crc_verified():
    b = bytearray(synth_ogg("vorbis"))
    b[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_probe(bytes(b))


def test_ogg_rejects_truncated_page():
    b = synth_ogg("vorbis")
    with pytest.raises(ValueError):
        ogg_probe(b[: len(b) - 10])


# --- MP4 probe --------------------------------------------------------------


def test_mp4_box_tree():
    p = mp4_probe(synth_mp4(duration_sec=12.5, width=1280, height=720))
    assert p["brand"] == "isom" and p["duration_sec"] == 12.5
    assert p["width"] == 1280 and p["height"] == 720
    assert p["n_tracks"] == 2 and p["codec"] == "avc1"
    assert [t["handler"] for t in p["tracks"]] == ["vide", "soun"]
    assert p["tracks"][1]["codec"] == "mp4a"


def test_mp4_rejects_invalid_box_size():
    b = bytearray(synth_mp4())
    b[0:4] = (3).to_bytes(4, "big")  # box size < 8
    with pytest.raises(ValueError):
        mp4_probe(bytes(b))


def test_mp4_rejects_non_bmff():
    with pytest.raises(ValueError):
        mp4_probe(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


# --- sniffing dispatcher + Spark surface ------------------------------------


def test_probe_bytes_sniffs_all_containers():
    from ocr_spark.operators.audio_codecs import wav_encode

    x = tonal(4410, ch=1)
    cases = {
        "flac": flac_encode(x, 44100),
        "wav": wav_encode(x.astype(np.int16), 44100, "ulaw"),
        "ogg": synth_ogg("vorbis"),
        "mp4": synth_mp4(),
        "mp3": synth_mp3(n_frames=3),
    }
    for want, payload in cases.items():
        assert probe_bytes(payload)["container"] == want
    with pytest.raises(ValueError):
        probe_bytes(b"GIF89a" + b"\x00" * 32)


def test_media_probe_spark_surface(spark):
    from ocr_spark.operators.audio_codecs import wav_encode
    from ocr_spark.operators.media_probe import media_probe

    x = tonal(2205, ch=1)
    rows = [
        ("a.flac", bytearray(flac_encode(x, 22050))),
        ("b.wav", bytearray(wav_encode(x.astype(np.int16), 22050, "pcm16"))),
        ("c.mp3", bytearray(synth_mp3(n_frames=8))),
        ("d.ogg", bytearray(synth_ogg("opus", total_samples=48000))),
        ("e.mp4", bytearray(synth_mp4(duration_sec=4.0))),
        ("f.bad", bytearray(b"not media at all")),
        ("g.null", None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    out = {r["media_ref"]: r.asDict() for r in media_probe(df).collect()}
    assert len(out) == 7
    assert out["a.flac"]["container"] == "flac"
    assert out["a.flac"]["duration_sec"] == pytest.approx(0.1)
    assert out["b.wav"]["codec"] == "pcm"
    assert out["c.mp3"]["n_frames"] == 8
    assert out["d.ogg"]["codec"] == "opus"
    assert out["d.ogg"]["duration_sec"] == pytest.approx(1.0)
    assert out["e.mp4"]["duration_sec"] == pytest.approx(4.0)
    assert out["e.mp4"]["width"] == 640 and out["e.mp4"]["n_tracks"] == 2
    for ref in ("f.bad", "g.null"):
        assert out[ref]["error"] is not None and out[ref]["container"] is None
    # green rows carry no error
    assert all(out[r]["error"] is None for r in ("a.flac", "b.wav", "c.mp3", "d.ogg", "e.mp4"))


def test_audio_features_over_flac(spark):
    """audio_features decodes FLAC assets through the same Arrow path."""
    from ocr_spark.operators.multimodal import audio_features

    x = tonal(22050, ch=2, amp=8000)
    df = spark.createDataFrame(
        [("t.flac", bytearray(flac_encode(x, 22050)))],
        "media_ref string, content binary",
    )
    row = audio_features(df).collect()[0]
    assert row["error"] is None
    assert row["sample_rate"] == 22050 and row["n_channels"] == 2
    assert row["duration_sec"] == pytest.approx(1.0)
    ref = x[:, 0].astype(np.float64) / 32768.0
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(ref * ref))), rel=1e-9)


# --- round-5 session-6 review regressions ------------------------------------


def test_mp3_info_tag_is_cbr():
    # 'Info' is LAME's explicit CBR marker: frame count authoritative,
    # vbr must be False (a 'vbr' corpus filter would otherwise misclassify
    # virtually every LAME/ffmpeg CBR file)
    b = synth_mp3(n_frames=40, tag="Info")
    p = mp3_probe(b)
    assert p["n_frames"] == 40
    assert p["vbr"] is False
    b2 = synth_mp3(n_frames=40, tag="Xing")
    assert mp3_probe(b2)["vbr"] is True


def test_mp3_truncated_xing_bitrate_from_bytes_field():
    b = synth_mp3(n_frames=100, bitrate_kbps=128, tag="Xing", with_bytes=True)
    full = mp3_probe(b)
    cut = mp3_probe(b[: len(b) // 2])
    # the header BYTES field keeps the average honest under truncation
    # (previously: bytes-walked / claimed-frames understated by the ratio)
    assert full["bitrate_kbps"] == pytest.approx(128.0, rel=0.02)
    assert cut["bitrate_kbps"] == pytest.approx(full["bitrate_kbps"])
    assert cut["n_frames"] == 100 and cut["duration_sec"] == full["duration_sec"]


def test_mp3_xing_behind_crc_protection():
    # protection_bit=0 inserts a 2-byte CRC before the side info; the tag
    # offset must shift or the authoritative count is silently missed
    b = synth_mp3(n_frames=30, tag="Xing", protect=True)
    p = mp3_probe(b)
    assert p["n_frames"] == 30 and p["vbr"] is True


def test_probe_bytes_mp3_with_leading_junk():
    mp3 = synth_mp3(n_frames=3)
    p = probe_bytes(b"\x00\x01GLUE" + mp3)  # crawl truncation/glue artifact
    assert p["container"] == "mp3" and p["n_frames"] == 3
    with pytest.raises(ValueError, match="unrecognized"):
        probe_bytes(b"\x00\x7f" * 2048)  # junk with no valid frame header


# --- MP4 sample tables (stts/stsz/stsc/stco/stss) ---------------------------


def _planted(n, base=10, step=7):
    return [bytes([i]) * (base + step * i) for i in range(n)]


def test_mp4_sample_index_round_trip():
    from ocr_spark.operators.media_probe import mp4_sample_index

    samples = _planted(10)
    b = synth_mp4(
        video_samples=samples, fps=25.0, samples_per_chunk=4, keyframe_every=5
    )
    idx = mp4_sample_index(b)
    assert idx["n"] == 10 and idx["codec"] == "avc1"
    for i in range(10):
        off, sz = int(idx["offset"][i]), int(idx["size"][i])
        # byte ranges land EXACTLY on the planted payloads inside mdat
        assert b[off : off + sz] == samples[i]
        assert idx["time_sec"][i] == pytest.approx(i * 0.04)
    assert list(np.nonzero(idx["keyframe"])[0]) == [0, 5]


def test_mp4_sample_index_constant_size_and_multirun_stsc():
    from ocr_spark.operators.media_probe import mp4_sample_index

    # 7 equal-size samples in chunks of 3 → stsz constant form + a short
    # trailing chunk (second stsc run)
    samples = [bytes([i]) * 32 for i in range(7)]
    idx = mp4_sample_index(synth_mp4(video_samples=samples, samples_per_chunk=3))
    assert idx["n"] == 7 and (idx["size"] == 32).all()
    assert idx["keyframe"].all()  # no stss box ⇒ every sample is sync
    b = synth_mp4(video_samples=samples, samples_per_chunk=3)
    for i in range(7):
        off = int(idx["offset"][i])
        assert b[off : off + 32] == samples[i]


def test_mp4_sample_index_co64():
    from ocr_spark.operators.media_probe import mp4_sample_index

    samples = _planted(5)
    b = synth_mp4(video_samples=samples, force_co64=True)
    idx = mp4_sample_index(b)
    for i in range(5):
        off, sz = int(idx["offset"][i]), int(idx["size"][i])
        assert b[off : off + sz] == samples[i]


def test_mp4_sample_index_raises_without_tables():
    from ocr_spark.operators.media_probe import mp4_sample_index

    with pytest.raises(ValueError, match="stsz"):
        mp4_sample_index(synth_mp4())  # metadata-only synth: no stbl tables
    with pytest.raises(ValueError, match="stsz"):
        mp4_sample_index(synth_mp4(video_samples=_planted(3)), handler="soun")
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        mp4_sample_index(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_mp4_sample_index_truncated_table():
    from ocr_spark.operators.media_probe import mp4_sample_index

    b = bytearray(synth_mp4(video_samples=_planted(6), samples_per_chunk=2))
    # corrupt the stsz sample count upward so the size table under-covers
    at = bytes(b).find(b"stsz")
    assert at > 0
    b[at + 12 : at + 16] = (1000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated"):
        mp4_sample_index(bytes(b))


def test_mp4_probe_reports_frame_count():
    p = mp4_probe(synth_mp4(video_samples=_planted(9), fps=30.0))
    assert p["n_frames"] == 9
    assert p["duration_sec"] == pytest.approx(0.3)
    # metadata-only synth keeps the old contract (no frame count)
    assert mp4_probe(synth_mp4())["n_frames"] is None


def test_video_frame_index_spark_surface(spark):
    from ocr_spark.operators.multimodal import video_frame_index

    samples = _planted(10)
    good = synth_mp4(video_samples=samples, keyframe_every=4)
    trunc = bytearray(synth_mp4(video_samples=samples))[: 80]  # mdat cut short
    # keep the header walkable: ftyp survives, moov is gone
    rows = [
        ("v1.mp4", bytearray(good)),
        ("v2.bad", bytearray(b"not a video")),
        ("v3.cut", trunc),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")

    out = video_frame_index(df, with_payload=True).collect()
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r)
    v1 = sorted(by_ref["v1.mp4"], key=lambda r: r["frame_idx"])
    assert len(v1) == 10 and all(r["error"] is None for r in v1)
    for i, r in enumerate(v1):
        assert bytes(r["payload"]) == samples[i]
        assert r["is_keyframe"] == (i % 4 == 0)
        assert r["n_frames"] == 10 and r["codec"] == "avc1"
    # non-BMFF asset: one envelope row, batch survives
    (v2,) = by_ref["v2.bad"]
    assert v2["frame_idx"] is None and "ValueError" in v2["error"]
    (v3,) = by_ref["v3.cut"]
    assert v3["error"] is not None

    # keyframe-only sampling composed with a stride and a cap
    kf = video_frame_index(
        df.where("media_ref = 'v1.mp4'"),
        keyframes_only=True,
        every_n=2,
        max_frames=2,
        with_payload=False,
    ).collect()
    assert sorted(r["frame_idx"] for r in kf) == [0, 8]
    assert all(r["payload"] is None and r["is_keyframe"] for r in kf)


def test_video_frame_index_truncated_mdat_row_level_error(spark):
    from ocr_spark.operators.multimodal import video_frame_index

    samples = _planted(4, base=50)
    b = bytearray(synth_mp4(video_samples=samples))
    # inflate the LAST per-sample stsz entry so its byte range runs past the
    # payload (the crawl artifact: mdat cut short / size field lies) — the
    # index still parses; only the out-of-range sample errors row-level
    at = bytes(b).find(b"stsz")
    last = at + 16 + 4 * (len(samples) - 1)
    b[last : last + 4] = (1 << 20).to_bytes(4, "big")
    df = spark.createDataFrame(
        [("t.mp4", b)], "media_ref string, content binary"
    )
    rows = sorted(
        video_frame_index(df, with_payload=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(rows) == 4
    assert [r["error"] is None for r in rows] == [True, True, True, False]
    assert bytes(rows[0]["payload"]) == samples[0]
    assert "truncated mdat" in rows[3]["error"] and rows[3]["payload"] is None


# --- AVC SPS / avcC (coded resolution without a decoder) --------------------


def test_avc_sps_round_trip_sizes():
    from ocr_spark.operators.media_probe import avc_sps_parse, synth_avc_sps

    # MB-multiple and cropped sizes, baseline and high profile
    for w, h in [(1920, 1080), (1280, 720), (640, 360), (426, 240), (322, 178)]:
        for profile in (66, 100):
            info = avc_sps_parse(synth_avc_sps(w, h, profile_idc=profile))
            assert (info["width"], info["height"]) == (w, h)
            assert info["profile_idc"] == profile
    with pytest.raises(ValueError):
        synth_avc_sps(641, 360)  # odd coded size invalid at 4:2:0
    with pytest.raises(ValueError):
        avc_sps_parse(b"")


def test_avc_emulation_prevention_round_trip():
    from ocr_spark.operators.media_probe import (
        _strip_emulation,
        avc_sps_parse,
        synth_avc_sps,
    )

    # level_idc=0 puts a 0x00 byte early; wide sizes add long zero runs —
    # the writer must escape any 00 00 0[0-3] and the reader must unescape
    sps = synth_avc_sps(4096, 2048, level_idc=0)
    info = avc_sps_parse(sps)
    assert (info["width"], info["height"]) == (4096, 2048)
    assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert _strip_emulation(b"\x00\x00\x02") == b"\x00\x00\x02"


def test_avcc_record_parse():
    from ocr_spark.operators.media_probe import (
        avcc_parse,
        synth_avc_sps,
        synth_avcc,
    )

    rec = synth_avcc(synth_avc_sps(854, 480), profile_idc=66, level_idc=31)
    info = avcc_parse(rec)
    assert info["width"] == 854 and info["height"] == 480
    assert info["n_sps"] == 1
    with pytest.raises(ValueError, match="configuration"):
        avcc_parse(b"\x02\x42\x00\x1e")


def test_mp4_probe_sps_coded_size_fallback():
    import struct as _s

    b = bytearray(synth_mp4(width=854, height=480, with_avcc=True))
    p = mp4_probe(bytes(b))
    # tkhd present: display size wins, avc info still exposed on the track
    assert (p["width"], p["height"]) == (854, 480)
    assert p["tracks"][0]["avc"]["profile_idc"] == 66

    # zero out the tkhd display size (routine in crawled files) → the SPS
    # coded size is the fallback
    at = bytes(b).find(b"tkhd")
    te = at + 4 + _s.unpack_from(">I", b, at - 4)[0] - 8
    b[te - 8 : te] = b"\x00" * 8
    p2 = mp4_probe(bytes(b))
    assert (p2["width"], p2["height"]) == (854, 480)

    # metadata-only synth keeps the old contract: no avc record
    assert "avc" not in mp4_probe(synth_mp4())["tracks"][0]


def test_mp4_sample_tables_compose_with_avcc():
    from ocr_spark.operators.media_probe import mp4_sample_index

    samples = _planted(6)
    b = synth_mp4(video_samples=samples, with_avcc=True, keyframe_every=3)
    idx = mp4_sample_index(b)
    assert idx["n"] == 6 and idx["codec"] == "avc1"
    for i in range(6):
        off, sz = int(idx["offset"][i]), int(idx["size"][i])
        assert b[off : off + sz] == samples[i]


# --- session-7 review fixes (corrupt-table hardening) ------------------------


def test_stsz_implausible_count_raises_before_alloc():
    import struct as _s

    from ocr_spark.operators.media_probe import mp4_sample_index

    b = bytearray(synth_mp4(video_samples=[b"x" * 32] * 4))
    at = bytes(b).find(b"stsz")
    # constant-size form with a 4-billion sample count: must be a
    # ValueError, not a 34 GB np.full
    b[at + 8 : at + 16] = _s.pack(">II", 32, 0xFFFFFFF0)
    with pytest.raises(ValueError, match="implausible sample count"):
        mp4_sample_index(bytes(b))


def test_stts_huge_run_capped_not_allocated():
    import struct as _s

    from ocr_spark.operators.media_probe import mp4_sample_index

    b = bytearray(synth_mp4(video_samples=_planted(4)))
    at = bytes(b).find(b"stts")
    # one run claiming 4 billion samples: expansion is capped at n, and the
    # index still round-trips (coverage >= n is all stts must provide)
    b[at + 12 : at + 16] = _s.pack(">I", 0xFFFFFFF0)
    idx = mp4_sample_index(bytes(b))
    assert idx["n"] == 4


def test_co64_wrapped_offset_raises():
    import struct as _s

    from ocr_spark.operators.media_probe import mp4_sample_index

    b = bytearray(synth_mp4(video_samples=_planted(4), force_co64=True))
    at = bytes(b).find(b"co64")
    b[at + 12 : at + 20] = _s.pack(">Q", 1 << 63)  # wraps negative in int64
    with pytest.raises(ValueError, match="int64"):
        mp4_sample_index(bytes(b))


def test_sps_garbage_is_valueerror_and_probe_survives():
    from ocr_spark.operators.media_probe import (
        _BitWriter,
        avc_sps_parse,
        avcc_parse,
        synth_avcc,
    )

    # chroma_format_idc=4 (high profile): ValueError, never KeyError
    w = _BitWriter()
    w.u(0x67, 8); w.u(100, 8); w.u(0, 8); w.u(30, 8)
    w.ue(0)   # sps id
    w.ue(4)   # chroma_format_idc out of range
    w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1)
    w.ue(4); w.ue(0); w.ue(4); w.ue(1); w.u(0, 1)
    w.ue(39); w.ue(21); w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    with pytest.raises(ValueError, match="chroma"):
        avc_sps_parse(w.bytes_rbsp())

    # implausible coded size (pic_width_in_mbs ~ 2^20): ValueError
    w2 = _BitWriter()
    w2.u(0x67, 8); w2.u(66, 8); w2.u(0, 8); w2.u(30, 8)
    w2.ue(0); w2.ue(4); w2.ue(0); w2.ue(4); w2.ue(1); w2.u(0, 1)
    w2.ue((1 << 20) - 1); w2.ue(21); w2.u(1, 1); w2.u(1, 1)
    w2.u(0, 1); w2.u(0, 1)
    with pytest.raises(ValueError, match="implausible coded size"):
        avc_sps_parse(w2.bytes_rbsp())

    # 7-byte avcC record: ValueError, never struct.error
    with pytest.raises(ValueError, match="configuration"):
        avcc_parse(bytes([1, 66, 0, 30, 0xFF, 0xE1, 0x00]))

    # a corrupt avcC inside an otherwise-fine mp4 keeps the probe's other
    # metadata (best-effort catch at the probe level)
    good = bytearray(synth_mp4(width=854, height=480, with_avcc=True))
    at = bytes(good).find(b"avcC")
    good[at + 4] = 2  # bad configurationVersion
    p = mp4_probe(bytes(good))
    assert p["duration_sec"] == pytest.approx(5.0)
    assert "avc" not in p["tracks"][0]


def test_synth_stsc_single_chunk_is_one_row():
    import struct as _s

    b = synth_mp4(video_samples=_planted(3))  # 3 < samples_per_chunk=4
    at = b.find(b"stsc")
    (n_runs,) = _s.unpack_from(">I", b, at + 8)
    assert n_runs == 1  # strictly-increasing first_chunk (one chunk, one row)
    assert _s.unpack_from(">III", b, at + 12) == (1, 3, 1)
    from ocr_spark.operators.media_probe import mp4_sample_index

    idx = mp4_sample_index(b)
    for i in range(3):
        off, sz = int(idx["offset"][i]), int(idx["size"][i])
        assert b[off : off + sz] == _planted(3)[i]


def test_video_frame_index_corrupt_size_row_error(spark):
    import struct as _s

    from ocr_spark.operators.multimodal import video_frame_index

    b = bytearray(synth_mp4(video_samples=_planted(4)))
    at = bytes(b).find(b"stsz")
    # per-sample form: inflate the 3rd size past int32 — the row must carry
    # the error (not overflow the int32 n_bytes column and kill the batch)
    b[at + 16 + 8 : at + 16 + 12] = _s.pack(">I", 0x90000000)
    df = spark.createDataFrame(
        [("c.mp4", b), ("ok.mp4", bytearray(synth_mp4(video_samples=_planted(2))))],
        "media_ref string, content binary",
    )
    rows = video_frame_index(df, with_payload=True).collect()
    bad = [r for r in rows if r["media_ref"] == "c.mp4" and r["frame_idx"] == 2]
    assert len(bad) == 1 and "corrupt range" in bad[0]["error"]
    assert bad[0]["n_bytes"] is None
    ok = [r for r in rows if r["media_ref"] == "ok.mp4"]
    assert len(ok) == 2 and all(r["error"] is None for r in ok)


def test_video_frame_index_zero_frame_accounting_row(spark):
    from ocr_spark.operators.multimodal import video_frame_index

    df = spark.createDataFrame(
        [
            ("empty.mp4", bytearray(synth_mp4(video_samples=[]))),
            ("capped.mp4", bytearray(synth_mp4(video_samples=_planted(3)))),
        ],
        "media_ref string, content binary",
    )
    rows = video_frame_index(df, max_frames=0).collect()
    # BOTH assets surface exactly one accounting row: frame_idx null,
    # n_frames set, error null — never silently vanish
    assert len(rows) == 2
    by = {r["media_ref"]: r for r in rows}
    assert by["empty.mp4"]["n_frames"] == 0 and by["empty.mp4"]["error"] is None
    assert by["capped.mp4"]["n_frames"] == 3
    assert all(r["frame_idx"] is None for r in rows)


# --- HEVC SPS / hvcC ----------------------------------------------------------


def test_hevc_sps_round_trip_sizes():
    from ocr_spark.operators.media_probe import hevc_sps_parse, synth_hevc_sps

    # CB-grid multiples and conformance-window (cropped) sizes
    for w, h in [(1920, 1080), (3840, 2160), (1280, 720), (426, 240), (322, 178)]:
        info = hevc_sps_parse(synth_hevc_sps(w, h))
        assert (info["width"], info["height"]) == (w, h)
        assert info["profile_idc"] == 1 and info["chroma_format_idc"] == 1
    with pytest.raises(ValueError):
        synth_hevc_sps(641, 360)
    with pytest.raises(ValueError, match="empty"):
        hevc_sps_parse(b"")


def test_hvcc_record_parse_and_errors():
    from ocr_spark.operators.media_probe import (
        hvcc_parse,
        synth_hevc_sps,
        synth_hvcc,
    )

    rec = synth_hvcc(synth_hevc_sps(854, 480, level_idc=120, tier=1))
    info = hvcc_parse(rec)
    assert (info["width"], info["height"]) == (854, 480)
    assert info["level_idc"] == 120 and info["tier_flag"] == 1
    with pytest.raises(ValueError, match="configuration"):
        hvcc_parse(b"\x02" + b"\x00" * 30)
    with pytest.raises(ValueError, match="truncated"):
        hvcc_parse(rec[: len(rec) - 4])
    # a record whose arrays hold no SPS
    with pytest.raises(ValueError, match="no SPS"):
        hvcc_parse(bytes([1]) + b"\x00" * 21 + bytes([0]))


def test_mp4_probe_hevc_coded_size_fallback():
    import struct as _s

    b = bytearray(
        synth_mp4(width=854, height=480, with_avcc=True, video_codec=b"hvc1")
    )
    p = mp4_probe(bytes(b))
    assert p["codec"] == "hvc1"
    assert p["tracks"][0]["hevc"]["profile_idc"] == 1
    at = bytes(b).find(b"tkhd")
    te = at + 4 + _s.unpack_from(">I", b, at - 4)[0] - 8
    b[te - 8 : te] = b"\x00" * 8
    p2 = mp4_probe(bytes(b))
    assert (p2["width"], p2["height"]) == (854, 480)


def test_hevc_sps_interleaved_sublayer_flags():
    from ocr_spark.operators.media_probe import _BitWriter, hevc_sps_parse

    # msl=2 with per-sub-layer (profile, level) flags INTERLEAVED per
    # H.265 §7.3.3: (pp0=1, ll0=1), (pp1=0, ll1=0) — a grouped read
    # miscounts the 88/8-bit skips and exhausts the bitstream
    w = _BitWriter()
    w.u(0x42, 8); w.u(0x01, 8)          # NAL header
    w.u(0, 4); w.u(2, 3); w.u(1, 1)     # vps id, msl=2, nesting
    w.u(0, 2); w.u(0, 1); w.u(1, 5)     # profile space/tier/idc
    w.u(0, 32); w.u(0, 48); w.u(93, 8)  # compat, constraints, level
    w.u(1, 1); w.u(1, 1)                # sub-layer 0: pp=1, ll=1
    w.u(0, 1); w.u(0, 1)                # sub-layer 1: pp=0, ll=0
    w.u(0, 12)                          # reserved_zero_2bits ×6
    w.u(0, 88); w.u(0, 8)               # sub-layer 0 profile + level
    w.ue(0); w.ue(1)                    # sps id, chroma 4:2:0
    w.ue(1920); w.ue(1080); w.u(0, 1)   # luma size, no conf window
    info = hevc_sps_parse(w.bytes_rbsp())
    assert (info["width"], info["height"]) == (1920, 1080)
