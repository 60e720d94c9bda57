"""CCITT G3/G4 fax codec unit tests (ITU-T T.4/T.6).

Round-trips go through REAL wire bitstreams (the fixture encoders write
standard MH/MMR codes), and the spec-published codewords are pinned
directly so the encoder/decoder pair cannot drift away from the standard
together."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.fax_codec import (
    _BLACK_DECODE,
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_DECODE,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    g3_1d_decode,
    g3_1d_encode,
    g3_2d_decode,
    g3_2d_encode,
    g4_decode,
    g4_encode,
)


def _bits_to_bytes(s: str) -> bytes:
    s += "0" * ((-len(s)) % 8)
    return np.packbits(
        np.frombuffer(s.encode(), np.uint8) - ord("0")
    ).tobytes()


def _rand_page(rng, h, w, p=0.3):
    return (rng.random((h, w)) < p).astype(np.uint8)


class TestTables:
    def test_spec_pinned_codewords(self):
        # T.4 published values — transcription guard
        assert _WHITE_TERM[0] == "00110101"
        assert _WHITE_TERM[4] == "1011"
        assert _WHITE_TERM[63] == "00110100"
        assert _WHITE_MAKEUP[64] == "11011"
        assert _WHITE_MAKEUP[1664] == "011000"
        assert _WHITE_MAKEUP[1728] == "010011011"
        assert _BLACK_TERM[0] == "0000110111"
        assert _BLACK_TERM[1] == "010"
        assert _BLACK_TERM[2] == "11"
        assert _BLACK_TERM[3] == "10"
        assert _BLACK_MAKEUP[64] == "0000001111"
        assert _EXT_MAKEUP[2560] == "000000011111"

    def test_table_sizes(self):
        assert len(_WHITE_TERM) == 64 and len(_BLACK_TERM) == 64
        assert len(_WHITE_MAKEUP) == 27 and len(_BLACK_MAKEUP) == 27
        assert len(_EXT_MAKEUP) == 13
        assert len(_WHITE_DECODE) == 104 and len(_BLACK_DECODE) == 104

    @pytest.mark.parametrize("table", [_WHITE_DECODE, _BLACK_DECODE])
    def test_prefix_free(self, table):
        # a mis-transcribed codeword almost surely collides as a prefix
        codes = sorted(table, key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a) or a == b, (a, b)

    def test_no_eol_collision(self):
        # no code may have >=11 leading zeros (that's the EOL/fill space)
        for code in list(_WHITE_DECODE) + list(_BLACK_DECODE):
            assert not code.startswith("0" * 11)


class TestG31D:
    def test_hand_computed_bitstream(self):
        # row of 12: 4 white, 2 black, 6 white -> 1011 11 1110 (spec codes)
        img = np.array([[0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0]], np.uint8)
        assert g3_1d_encode(img, byte_align=True) == _bits_to_bytes("1011111110")
        out = g3_1d_decode(_bits_to_bytes("1011111110"), 12, 1, byte_align=True)
        np.testing.assert_array_equal(out, img)

    def test_black_first_line_gets_zero_white_run(self):
        # line starting black: white-0 (00110101) then black-3 (10) white-5 (1100)
        img = np.array([[1, 1, 1, 0, 0, 0, 0, 0]], np.uint8)
        enc = g3_1d_encode(img, byte_align=True)
        assert enc == _bits_to_bytes("00110101" + "10" + "1100")
        np.testing.assert_array_equal(g3_1d_decode(enc, 8, 1, True), img)

    def test_makeup_runs(self):
        # 1728 white in a 1792-wide row: makeup 1728 + white 0? no:
        # 1728+64: white run of 1792 = ext makeup 1792 + term 0
        img = np.zeros((1, 1792), np.uint8)
        enc = g3_1d_encode(img, byte_align=True)
        assert enc == _bits_to_bytes("00000001000" + "00110101")
        np.testing.assert_array_equal(g3_1d_decode(enc, 1792, 1, True), img)

    def test_all_white_standard_width(self):
        # the classic: 1728 white = makeup 1728 + terminating 0
        img = np.zeros((1, 1728), np.uint8)
        enc = g3_1d_encode(img, byte_align=True)
        assert enc == _bits_to_bytes("010011011" + "00110101")

    def test_long_black_run_over_2560(self):
        img = np.ones((1, 3000), np.uint8)
        enc = g3_1d_encode(img, byte_align=True)
        # white 0 + black: ext2560 + makeup 384 + term 56... 3000-2560=440
        # 440 = 384 makeup + 56 term
        np.testing.assert_array_equal(g3_1d_decode(enc, 3000, 1, True), img)

    @pytest.mark.parametrize("framing", ["tiff", "eol"])
    def test_roundtrip_random(self, framing):
        rng = np.random.default_rng(7)
        for trial in range(6):
            h, w = int(rng.integers(1, 12)), int(rng.integers(1, 400))
            img = _rand_page(rng, h, w, p=float(rng.random()))
            if framing == "tiff":
                enc = g3_1d_encode(img, byte_align=True)
                out = g3_1d_decode(enc, w, h, byte_align=True)
            else:
                enc = g3_1d_encode(img, byte_align=False, with_eol=True)
                out = g3_1d_decode(enc, w, h)
            np.testing.assert_array_equal(out, img, err_msg=f"trial {trial}")

    def test_height_inference_with_eol_framing(self):
        rng = np.random.default_rng(3)
        img = _rand_page(rng, 9, 64)
        enc = g3_1d_encode(img, byte_align=False, with_eol=True)
        out = g3_1d_decode(enc, 64)  # height=None: stop at RTC
        np.testing.assert_array_equal(out, img)

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            g3_1d_decode(b"\xaa\xaa\xaa\xaa", 64, 4, byte_align=True)

    def test_run_overflow_raises(self):
        # white 63 into an 8-wide row
        with pytest.raises(ValueError, match="overflows"):
            g3_1d_decode(_bits_to_bytes("00110100" * 4), 8, 1, True)


class TestG4:
    def test_all_white_page_is_v0_per_line(self):
        # every line identical to the imaginary white reference: one V0 bit
        img = np.zeros((3, 64), np.uint8)
        enc = g4_encode(img, with_eofb=False)
        assert enc == _bits_to_bytes("1" * 3)
        np.testing.assert_array_equal(g4_decode(enc, 64, 3), img)

    def test_vertical_modes(self):
        # row0: black run [10,20); row1 shifted right by 1 -> VR1 codes
        img = np.zeros((2, 40), np.uint8)
        img[0, 10:20] = 1
        img[1, 11:21] = 1
        enc = g4_encode(img)
        np.testing.assert_array_equal(g4_decode(enc, 40, 2), img)

    def test_pass_mode(self):
        # ref has a short black run that the coding line skips entirely
        img = np.zeros((2, 60), np.uint8)
        img[0, 10:14] = 1
        img[1, 40:50] = 1
        enc = g4_encode(img)
        np.testing.assert_array_equal(g4_decode(enc, 60, 2), img)

    def test_horizontal_mode(self):
        # coding line far from any reference transition
        img = np.zeros((2, 100), np.uint8)
        img[1, 50:70] = 1
        enc = g4_encode(img)
        np.testing.assert_array_equal(g4_decode(enc, 100, 2), img)

    def test_line_starting_black(self):
        img = np.zeros((2, 32), np.uint8)
        img[0, 0:8] = 1
        img[1, 0:5] = 1
        enc = g4_encode(img)
        np.testing.assert_array_equal(g4_decode(enc, 32, 2), img)

    def test_eofb_tolerated_and_absent(self):
        rng = np.random.default_rng(11)
        img = _rand_page(rng, 5, 80)
        for eofb in (True, False):
            enc = g4_encode(img, with_eofb=eofb)
            np.testing.assert_array_equal(g4_decode(enc, 80, 5), img)

    def test_height_inference_needs_eofb(self):
        rng = np.random.default_rng(13)
        img = _rand_page(rng, 4, 48)
        enc = g4_encode(img, with_eofb=True)
        np.testing.assert_array_equal(g4_decode(enc, 48), img)

    def test_roundtrip_random_dense_and_sparse(self):
        rng = np.random.default_rng(17)
        for trial in range(8):
            h = int(rng.integers(1, 16))
            w = int(rng.integers(1, 300))
            img = _rand_page(rng, h, w, p=float(rng.random()))
            enc = g4_encode(img)
            np.testing.assert_array_equal(
                g4_decode(enc, w, h), img, err_msg=f"trial {trial}"
            )

    def test_checkerboard_worst_case(self):
        # max transition density: alternating single pixels, alternating rows
        img = np.indices((6, 33)).sum(axis=0) % 2
        img = img.astype(np.uint8)
        enc = g4_encode(img)
        np.testing.assert_array_equal(g4_decode(enc, 33, 6), img)

    def test_g4_compresses_vs_raw(self):
        # text-like page: glyph-ish STROKES (runs), not noise; 2-D coding
        # exploits the line-to-line coherence of real scans
        rng = np.random.default_rng(23)
        img = np.zeros((64, 512), np.uint8)
        for r in range(8, 56, 8):
            x = 30
            while x < 470:
                wgl = int(rng.integers(6, 18))
                img[r:r + 5, x:x + wgl] = 1
                x += wgl + int(rng.integers(4, 12))
        enc = g4_encode(img)
        assert len(enc) < (512 // 8) * 64 / 3  # >3x vs packed raw

    def test_corrupt_mode_raises(self):
        with pytest.raises(ValueError):
            g4_decode(b"\x00\x00\xff\x00" * 8, 64, 8)


class TestG32D:
    def test_roundtrip_mixed_tags(self):
        rng = np.random.default_rng(29)
        img = _rand_page(rng, 10, 120)
        for k in (1, 2, 4):
            enc = g3_2d_encode(img, k=k)
            np.testing.assert_array_equal(g3_2d_decode(enc, 120, 10), img)

    def test_height_inference(self):
        rng = np.random.default_rng(31)
        img = _rand_page(rng, 7, 96)
        np.testing.assert_array_equal(
            g3_2d_decode(g3_2d_encode(img), 96), img
        )

    def test_missing_eol_raises(self):
        with pytest.raises(ValueError, match="EOL"):
            g3_2d_decode(b"\xb4\x00\x00\x00", 16, 1)


@pytest.mark.usefixtures("spark")
class TestSparkE2E:
    def test_fax_tiff_through_image_features(self, spark):
        """A G4/G3 fax TIFF is just another image asset: the sniffer routes
        it to tiff_decode and the S1 feature kernels run unchanged."""
        import pyspark.sql.functions as F

        from ocr_spark.operators.image_codecs import tiff_encode
        from ocr_spark.operators.multimodal import image_features

        rng = np.random.default_rng(41)
        page = np.full((40, 120), 255, np.uint8)
        for r in range(5, 35, 8):
            page[r:r + 3, 10:110] = np.where(
                rng.random((3, 100)) < 0.6, 0, 255
            )
        rows = [
            ("fax#g4", tiff_encode(page, compression="g4")),
            ("fax#g3", tiff_encode(page, compression="g3")),
            ("fax#g3_2d", tiff_encode(page, compression="g3_2d")),
        ]
        assets = spark.createDataFrame(
            rows, "media_ref string, content binary"
        ).select(
            "media_ref",
            F.lit("image").alias("media_type"),
            "content",
            F.struct(
                F.lit(120).alias("width"),
                F.lit(40).alias("height"),
                F.length("content").cast("long").alias("n_bytes"),
                F.lit("tiff").alias("codec"),
            ).alias("meta"),
        )
        feats = {r["media_ref"]: r for r in image_features(assets).collect()}
        assert len(feats) == 3
        want_mean = float(page.mean())
        for ref, r in feats.items():
            assert r["error"] is None, (ref, r["error"])
            assert (r["width"], r["height"]) == (120, 40)
            assert r["mean_intensity"] == pytest.approx(want_mean)

    def test_fax_tiff_drives_ocr_loop(self, spark):
        """Container transparency for fax scans: the SAME bilevel page
        delivered as a G4 TIFF sidecar asset extracts the SAME span text
        as a direct PNG of it (extract_documents OCR kernels)."""
        from ocr_spark.operators.cloud_engine import png_encode
        from ocr_spark.operators.image_codecs import tiff_encode
        from ocr_spark.pipeline import extract_documents
        from ocr_spark.schema import DOC_SCHEMA
        from ocr_spark.sources.media import synth_media_bytes

        scan = np.frombuffer(
            synth_media_bytes("media://fax-1"), np.uint8
        )[: 32 * 32].reshape(32, 32)
        page = np.where(scan < 128, 0, 255).astype(np.uint8)  # bilevel
        sidecar = spark.createDataFrame(
            [
                ("fax.tif", bytearray(tiff_encode(page, compression="g4"))),
                ("direct.png", bytearray(png_encode(page))),
            ],
            "media_ref string, content binary",
        )
        docs = spark.createDataFrame(
            [
                ("from_fax", [("media", None, "fax.tif", 0)]),
                ("direct", [("media", None, "direct.png", 0)]),
            ],
            DOC_SCHEMA,
        )
        out = {
            r.doc_id: r
            for r in extract_documents(docs, media_sidecar=sidecar).collect()
        }
        assert out["from_fax"].error is None and out["direct"].error is None
        assert out["from_fax"].spans[0].text == out["direct"].spans[0].text


class TestG32DNoEol:
    def test_tag_bit_only_layout(self):
        rng = np.random.default_rng(37)
        img = _rand_page(rng, 8, 100)
        enc = g3_2d_encode(img, k=3, with_eol=False)
        out = g3_2d_decode(enc, 100, 8, require_eol=False)
        np.testing.assert_array_equal(out, img)
        # the strict default still rejects the EOL-less stream
        with pytest.raises(ValueError, match="EOL"):
            g3_2d_decode(enc, 100, 8)

    def test_eol_streams_still_pass_with_tolerant_flag(self):
        rng = np.random.default_rng(39)
        img = _rand_page(rng, 6, 70)
        enc = g3_2d_encode(img, k=2, with_eol=True)
        out = g3_2d_decode(enc, 70, 6, require_eol=False)
        np.testing.assert_array_equal(out, img)
