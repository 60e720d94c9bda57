"""JBIG2 generic-region codec tests (ITU-T T.88).

The MQ coder's 47-state probability table is pinned against the published
values; round-trips go through real MQ bitstreams written by the module's
own spec-following encoder, and the nominal-AT fast decode path is
exercised against the generic gather-loop encoder on every template."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.jbig2_codec import (
    _QE,
    MQDecoder,
    MQEncoder,
    generic_region_decode,
    generic_region_encode,
    jbig2_decode,
    jbig2_encode,
)


class TestMQ:
    def test_qe_table_pinned(self):
        # published T.88/JPEG2000 values — transcription guard
        assert _QE[0] == (0x5601, 1, 1, 1)
        assert _QE[5] == (0x0221, 38, 33, 0)
        assert _QE[14] == (0x5601, 15, 14, 1)
        assert _QE[45] == (0x0001, 45, 43, 0)
        assert _QE[46] == (0x5601, 46, 46, 0)
        assert len(_QE) == 47

    def test_qe_state_graph_closed(self):
        for qe, nmps, nlps, switch in _QE:
            assert 0 < qe <= 0x5601
            assert 0 <= nmps < 47 and 0 <= nlps < 47
            assert switch in (0, 1)

    def test_roundtrip_single_context(self):
        rng = np.random.default_rng(1)
        for trial in range(8):
            p = float(rng.random())
            bits = (rng.random(int(rng.integers(5, 4000))) < p).astype(int)
            enc = MQEncoder()
            cx = [0, 0]
            for b in bits:
                enc.encode(cx, int(b))
            data = enc.flush()
            dec = MQDecoder(data)
            cx = [0, 0]
            got = [dec.decode(cx) for _ in bits]
            assert got == bits.tolist(), f"trial {trial}"

    def test_roundtrip_many_contexts(self):
        rng = np.random.default_rng(2)
        n_cx = 16
        seq = [(int(rng.integers(n_cx)), int(rng.random() < 0.3))
               for _ in range(5000)]
        enc = MQEncoder()
        states = [[0, 0] for _ in range(n_cx)]
        for c, b in seq:
            enc.encode(states[c], b)
        data = enc.flush()
        dec = MQDecoder(data)
        states = [[0, 0] for _ in range(n_cx)]
        got = [dec.decode(states[c]) for c, _b in seq]
        assert got == [b for _c, b in seq]

    def test_skewed_stream_compresses(self):
        # 10k highly-skewed bits must code well under 10k bits
        bits = [0] * 10_000
        bits[17] = bits[4096] = 1
        enc = MQEncoder()
        cx = [0, 0]
        for b in bits:
            enc.encode(cx, b)
        assert len(enc.flush()) < 60


class TestGenericRegion:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    @pytest.mark.parametrize("tpgdon", [False, True])
    def test_roundtrip(self, template, tpgdon):
        rng = np.random.default_rng(template * 10 + int(tpgdon))
        for h, w, p in ((1, 1, 0.5), (3, 64, 0.15), (25, 33, 0.5), (40, 7, 0.85)):
            img = (rng.random((h, w)) < p).astype(np.uint8)
            data = generic_region_encode(img, template=template, tpgdon=tpgdon)
            out = generic_region_decode(
                data, w, h, template=template, tpgdon=tpgdon
            )
            np.testing.assert_array_equal(out, img, err_msg=f"{h}x{w} p={p}")

    def test_custom_at_pixels_generic_path(self):
        # non-nominal ATs route decode through the gather loop; the
        # encoder shares the same context order, so this cross-validates
        # the generic path end to end
        rng = np.random.default_rng(9)
        img = (rng.random((20, 30)) < 0.4).astype(np.uint8)
        at = [(1, -2), (-3, -1), (2, -2), (-2, -2)]
        data = generic_region_encode(img, template=0, at=at)
        out = generic_region_decode(data, 30, 20, template=0, at=at)
        np.testing.assert_array_equal(out, img)

    def test_tpgdon_wins_on_banded_pages(self):
        img = np.zeros((64, 100), np.uint8)
        img[20:40, 10:90] = 1  # long identical-row bands
        with_tp = generic_region_encode(img, tpgdon=True)
        without = generic_region_encode(img, tpgdon=False)
        assert len(with_tp) < len(without)
        out = generic_region_decode(with_tp, 100, 64, tpgdon=True)
        np.testing.assert_array_equal(out, img)

    def test_mmr_region_delegates_to_t6(self):
        from ocr_spark.operators.fax_codec import g4_encode

        rng = np.random.default_rng(4)
        img = (rng.random((12, 40)) < 0.3).astype(np.uint8)
        data = g4_encode(img)
        out = generic_region_decode(data, 40, 12, mmr=True)
        np.testing.assert_array_equal(out, img)

    def test_text_page_compresses(self):
        # stroke-structured page: JBIG2 generic must beat packed raw
        rng = np.random.default_rng(7)
        img = np.zeros((128, 512), np.uint8)
        for r in range(8, 120, 9):
            x = 20
            while x < 480:
                gw = int(rng.integers(5, 15))
                img[r:r + 5, x:x + gw] = 1
                x += gw + int(rng.integers(4, 10))
        data = generic_region_encode(img)
        assert len(data) < (512 // 8) * 128 / 4  # >4x vs packed raw
        out = generic_region_decode(data, 512, 128)
        np.testing.assert_array_equal(out, img)


class TestEmbeddedStream:
    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        img = (rng.random((22, 31)) < 0.35).astype(np.uint8)
        np.testing.assert_array_equal(jbig2_decode(jbig2_encode(img)), img)

    def test_region_offset_composites_onto_page(self):
        rng = np.random.default_rng(12)
        img = (rng.random((10, 14)) < 0.5).astype(np.uint8)
        out = jbig2_decode(jbig2_encode(img, x=6, y=4, page_size=(30, 20)))
        assert out.shape == (20, 30)
        np.testing.assert_array_equal(out[4:14, 6:20], img)
        assert out[:4].sum() == 0 and out[:, :6].sum() == 0

    @pytest.mark.parametrize("template,tpgdon", [(0, False), (2, True)])
    def test_template_variants_through_stream(self, template, tpgdon):
        rng = np.random.default_rng(13)
        img = (rng.random((16, 24)) < 0.4).astype(np.uint8)
        stream = jbig2_encode(img, template=template, tpgdon=tpgdon)
        np.testing.assert_array_equal(jbig2_decode(stream), img)

    def test_truncated_symbol_dict_named_error(self):
        import struct

        seg = (
            struct.pack(">IB", 0, 0)  # segment 0, type 0 = symbol dict
            + b"\x00\x01" + struct.pack(">I", 2) + b"\x00\x00"
        )
        with pytest.raises(ValueError, match="symbol dictionary"):
            jbig2_decode(seg)

    def test_halftone_region_without_dictionary_named_error(self):
        # halftone decodes for real since session 12; a bare region with
        # no pattern dictionary is the remaining named case here
        import struct

        seg = (
            struct.pack(">IB", 0, 20)  # type 20 = halftone region
            + b"\x00\x01" + struct.pack(">I", 2) + b"\x00\x00"
        )
        with pytest.raises(ValueError, match="without a pattern dictionary"):
            jbig2_decode(seg)

    def test_truncated_segment_raises(self):
        stream = jbig2_encode(np.ones((16, 16), np.uint8))
        # cut inside the generic-region segment body
        with pytest.raises(ValueError, match="truncated|no generic region"):
            jbig2_decode(stream[: 30 + 12])

    def test_empty_stream_raises(self):
        with pytest.raises(ValueError, match="no region"):
            jbig2_decode(b"")


class TestReviewHardening:
    """Regressions for the adversarial-review findings."""

    def test_implausible_region_dims_rejected(self):
        import struct

        # 30-byte stream declaring a giant region: must be a cheap error,
        # not minutes of MQ pixel loop or an 8 GB page allocation
        region = (
            struct.pack(">IIIIB", 50_000, 50_000, 0, 0, 0) + b"\x00"
            + b"\x03\xff" * 4 + b"\x00" * 4
        )
        seg = (
            struct.pack(">IB", 0, 38) + b"\x00\x01"
            + struct.pack(">I", len(region)) + region
        )
        with pytest.raises(ValueError, match="implausible"):
            jbig2_decode(seg)

    def test_huge_region_offset_rejected(self):
        rng = np.random.default_rng(21)
        img = (rng.random((6, 8)) < 0.5).astype(np.uint8)
        stream = bytearray(jbig2_encode(img))
        # page-info at offset 11: patch page W/H to giant values
        import struct

        stream[11:19] = struct.pack(">II", 0xFFFFFF00, 0xFFFFFF00)
        with pytest.raises(ValueError, match="implausible"):
            jbig2_decode(bytes(stream))

    def test_page_default_one_with_and_composition(self):
        import struct

        rng = np.random.default_rng(22)
        img = (rng.random((9, 13)) < 0.5).astype(np.uint8)
        stream = bytearray(jbig2_encode(img))
        # set page default-pixel flag (bit 2) and region comb op AND (1)
        # page-info body: 11-byte header + 16 bytes -> flags at 11+16
        stream[11 + 16] |= 0b100
        # region segment starts at 30: 11-byte header + 16 -> comb byte
        stream[30 + 11 + 16] = 1
        out = jbig2_decode(bytes(stream))
        np.testing.assert_array_equal(out, img)  # 1 AND bmp == bmp

    def test_replace_composition(self):
        import struct

        rng = np.random.default_rng(23)
        img = (rng.random((7, 11)) < 0.5).astype(np.uint8)
        stream = bytearray(jbig2_encode(img))
        stream[11 + 16] |= 0b100  # default-1 page
        stream[30 + 11 + 16] = 4  # REPLACE
        out = jbig2_decode(bytes(stream))
        np.testing.assert_array_equal(out, img)

    def test_region_clipped_to_page(self):
        img = np.ones((8, 8), np.uint8)
        # region at x=4 on an 8-wide page: right half clipped, no crash
        out = jbig2_decode(jbig2_encode(img, x=4, y=0, page_size=(8, 8)))
        assert out.shape == (8, 8)
        np.testing.assert_array_equal(out[:, 4:], np.ones((8, 4), np.uint8))
        assert out[:, :4].sum() == 0

    def test_striped_height_keeps_declared_width(self):
        import struct

        rng = np.random.default_rng(24)
        img = (rng.random((5, 10)) < 0.5).astype(np.uint8)
        stream = bytearray(jbig2_encode(img, page_size=(32, 5)))
        # declare height unknown (striped form); width 32 must survive
        stream[15:19] = struct.pack(">I", 0xFFFFFFFF)
        out = jbig2_decode(bytes(stream))
        assert out.shape == (5, 32)
        np.testing.assert_array_equal(out[:, :10], img)

    def test_truncated_header_is_valueerror(self):
        import struct

        # 4-byte page-association flag set, then truncation
        seg = struct.pack(">IB", 0, 0x40 | 38) + b"\x00" * 7
        with pytest.raises(ValueError, match="truncated"):
            jbig2_decode(seg)

    def test_pdf_jbig2globals_named_envelope(self):
        from ocr_spark.operators.pdf_layout import pdf_images, pdf_write_images

        gray = (np.arange(12 * 16).reshape(12, 16) % 251).astype(np.uint8)
        pdf = pdf_write_images([], [(gray, "jbig2")])
        pdf2 = pdf.replace(
            b"/Filter /JBIG2Decode ",
            b"/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 9 0 R >> ",
        )
        img = pdf_images(pdf2)[0]
        assert img["error"] is not None and "JBIG2Globals" in img["error"]


class TestFileOrganization:
    def test_roundtrip_through_decode_image(self):
        from ocr_spark.operators.jbig2_codec import jbig2_file_encode
        from ocr_spark.operators.multimodal import decode_image, detect_codec

        rng = np.random.default_rng(31)
        img = (rng.random((18, 27)) < 0.4).astype(np.uint8)
        data = jbig2_file_encode(img)
        assert detect_codec(data[:12]) == "jbig2"
        got = decode_image(data)  # auto-sniffed
        want = ((1 - img) * 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_random_access_named_error(self):
        from ocr_spark.operators.jbig2_codec import (
            jbig2_file_decode,
            jbig2_file_encode,
        )

        data = bytearray(jbig2_file_encode(np.ones((4, 4), np.uint8)))
        data[8] = 0  # clear the sequential bit
        with pytest.raises(ValueError, match="random-access"):
            jbig2_file_decode(bytes(data))

    def test_bad_magic(self):
        from ocr_spark.operators.jbig2_codec import jbig2_file_decode

        with pytest.raises(ValueError, match="magic"):
            jbig2_file_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)

    def test_jbig2_through_image_features(self, spark):
        """A standalone .jb2 scan is just another image asset: the sniffer
        routes it through jbig2_file_decode inside the feature stage."""
        import pyspark.sql.functions as F

        from ocr_spark.operators.jbig2_codec import jbig2_file_encode
        from ocr_spark.operators.multimodal import image_features

        img = np.zeros((30, 50), np.uint8)
        img[8:22, 10:40] = 1
        data = jbig2_file_encode(img)
        assets = spark.createDataFrame(
            [("scan.jb2", bytearray(data))],
            "media_ref string, content binary",
        ).select(
            "media_ref",
            F.lit("image").alias("media_type"),
            "content",
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.length("content").cast("long").alias("n_bytes"),
                F.lit("jbig2").alias("codec"),
            ).alias("meta"),
        )
        row = image_features(assets).collect()[0]
        assert row["error"] is None
        assert (row["width"], row["height"]) == (50, 30)
        want_mean = float(((1 - img) * 255).mean())
        assert row["mean_intensity"] == pytest.approx(want_mean)


class TestSymbolText:
    """Arithmetic symbol-dictionary + text-region coding (T.88 §6.4/6.5,
    Annex A integer decoding) — the layout real scanner streams use."""

    @staticmethod
    def _glyphs(rng, n=5):
        syms = []
        for _ in range(n):
            h, w = int(rng.integers(4, 13)), int(rng.integers(3, 11))
            g = (rng.random((h, w)) < 0.5).astype(np.uint8)
            g[0, 0] = 1
            syms.append(g)
        return syms

    def test_ia_integer_roundtrip(self):
        from ocr_spark.operators.jbig2_codec import (
            _OOB,
            IntCtx,
            MQDecoder,
            MQEncoder,
            _ia_decode,
            _ia_encode,
        )

        rng = np.random.default_rng(41)
        values = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
                  100000, -54321]
        values += [int(v) for v in rng.integers(-5000, 5000, 60)]
        values.append(_OOB)
        enc = MQEncoder()
        ic = IntCtx()
        for v in values:
            _ia_encode(enc, ic, v)
        dec = MQDecoder(enc.flush())
        ic = IntCtx()
        got = [_ia_decode(dec, ic) for _ in values]
        assert got == values

    def test_iaid_roundtrip(self):
        from ocr_spark.operators.jbig2_codec import (
            IdCtx,
            MQDecoder,
            MQEncoder,
            _iaid_decode,
            _iaid_encode,
        )

        rng = np.random.default_rng(42)
        for nbits in (1, 3, 6):
            ids = [int(v) for v in rng.integers(0, 1 << nbits, 200)]
            enc = MQEncoder()
            ic = IdCtx(nbits)
            for v in ids:
                _iaid_encode(enc, ic, v)
            dec = MQDecoder(enc.flush())
            ic = IdCtx(nbits)
            assert [_iaid_decode(dec, ic) for _ in ids] == ids

    def test_symbol_dict_roundtrip(self):
        from ocr_spark.operators.jbig2_codec import (
            symbol_dict_decode,
            symbol_dict_encode,
        )

        rng = np.random.default_rng(43)
        syms = self._glyphs(rng, 7)
        body, order = symbol_dict_encode(syms)
        out = symbol_dict_decode(body)
        assert len(out) == len(syms)
        for i, orig in enumerate(order):
            np.testing.assert_array_equal(out[i], syms[orig])

    def test_text_e2e_or_composition(self):
        from ocr_spark.operators.jbig2_codec import (
            jbig2_decode,
            jbig2_encode_text,
        )

        rng = np.random.default_rng(44)
        syms = self._glyphs(rng, 5)
        placements, x = [], 2
        for i in (0, 3, 1, 4, 2, 2, 0):
            placements.append((i, x, 4))
            x += syms[i].shape[1] + 2
        x = 3
        for i in (4, 1, 0):
            placements.append((i, x, 25))
            x += syms[i].shape[1] + 3
        out = jbig2_decode(jbig2_encode_text(syms, placements, (95, 45)))
        want = np.zeros((45, 95), np.uint8)
        for sid, sx, sy in placements:
            g = syms[sid]
            want[sy : sy + g.shape[0], sx : sx + g.shape[1]] |= g
        np.testing.assert_array_equal(out, want)

    def test_overlapping_symbols_and_clipping(self):
        from ocr_spark.operators.jbig2_codec import (
            jbig2_decode,
            jbig2_encode_text,
        )

        g = np.ones((6, 6), np.uint8)
        # overlap + placement running past the right region edge (clipped)
        placements = [(0, 0, 0), (0, 3, 2), (0, 17, 1)]
        out = jbig2_decode(jbig2_encode_text([g], placements, (20, 10)))
        want = np.zeros((10, 20), np.uint8)
        want[0:6, 0:6] = 1
        want[2:8, 3:9] = 1
        want[1:7, 17:20] = 1
        np.testing.assert_array_equal(out, want)

    def test_many_symbols_wide_id_codes(self):
        from ocr_spark.operators.jbig2_codec import (
            jbig2_decode,
            jbig2_encode_text,
        )

        rng = np.random.default_rng(45)
        syms = self._glyphs(rng, 19)  # codelen 5
        placements = []
        x = y = 1
        for i in range(19):
            placements.append((i, x, y))
            x += syms[i].shape[1] + 1
            if x > 150:
                x = 1
                y += 16
        out = jbig2_decode(jbig2_encode_text(syms, placements, (170, 70)))
        want = np.zeros((70, 170), np.uint8)
        for sid, sx, sy in placements:
            g = syms[sid]
            want[sy : sy + g.shape[0], sx : sx + g.shape[1]] |= g
        np.testing.assert_array_equal(out, want)

    def test_huffman_dict_named_error(self):
        from ocr_spark.operators.jbig2_codec import symbol_dict_decode

        import struct

        body = struct.pack(">H", 1) + b"\x00" * 16  # SDHUFF set
        with pytest.raises(ValueError, match="Huffman"):
            symbol_dict_decode(body)

    def test_text_compresses_repeated_glyphs(self):
        from ocr_spark.operators.jbig2_codec import (
            generic_region_encode,
            jbig2_encode_text,
        )

        rng = np.random.default_rng(46)
        g = (rng.random((12, 9)) < 0.5).astype(np.uint8)
        placements = [(0, 2 + 12 * k, 3 + 15 * (k % 4)) for k in range(40)]
        stream = jbig2_encode_text([g], placements, (520, 70))
        page = np.zeros((70, 520), np.uint8)
        for _, sx, sy in placements:
            page[sy : sy + 12, sx : sx + 9] |= g
        generic = generic_region_encode(page)
        # one shared glyph + 40 placements beats generic re-coding (the
        # margin is modest: MQ context adaptation also learns the texture)
        assert len(stream) < len(generic)


class TestSymbolTextHardening:
    """Regressions for the symbol/text review findings."""

    def test_iaex_zero_runs_terminate(self):
        from ocr_spark.operators.jbig2_codec import (
            IntCtx,
            MQEncoder,
            _encode_symbol_bitmap,
            _ia_encode,
            _template_pixels,
            symbol_dict_decode,
        )

        # one 1x1 symbol, then endless run=0 export flags
        import struct

        enc = MQEncoder()
        iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
        gb = [[0, 0] for _ in range(1 << len(_template_pixels(0, None)))]
        _ia_encode(enc, iadh, 1)
        _ia_encode(enc, iadw, 1)
        _encode_symbol_bitmap(enc, gb, 0, np.ones((1, 1), np.uint8))
        import ocr_spark.operators.jbig2_codec as J

        _ia_encode(enc, iadw, J._OOB)
        for _ in range(50):
            _ia_encode(enc, iaex, 0)
        body = (
            struct.pack(">H", 0)
            + b"".join(struct.pack(">bb", ax, ay) for ax, ay in
                       J._TEMPLATES[0][1])
            + struct.pack(">II", 1, 1)
            + enc.flush()
        )
        with pytest.raises(ValueError, match="converge|export"):
            symbol_dict_decode(body)

    def test_symbol_pixel_budget(self):
        from ocr_spark.operators.jbig2_codec import (
            IntCtx,
            MQEncoder,
            _ia_encode,
        )
        import struct

        import ocr_spark.operators.jbig2_codec as J

        # declare 10000 symbols of 4096x4096: must die on the budget, not
        # start decoding terapixels
        enc = MQEncoder()
        iadh, iadw = IntCtx(), IntCtx()
        _ia_encode(enc, iadh, 4096)
        for _ in range(40):
            _ia_encode(enc, iadw, 4096 if _ == 0 else 0)
        body = (
            struct.pack(">H", 0)
            + b"".join(struct.pack(">bb", ax, ay) for ax, ay in
                       J._TEMPLATES[0][1])
            + struct.pack(">II", 10_000, 10_000)
            + enc.flush()
        )
        with pytest.raises(ValueError, match="budget|implausible"):
            J.symbol_dict_decode(body)

    def test_second_dictionary_named_error(self):
        from ocr_spark.operators.jbig2_codec import (
            jbig2_decode,
            jbig2_encode_text,
            symbol_dict_encode,
        )
        import struct

        g = np.ones((3, 3), np.uint8)
        stream = bytearray(jbig2_encode_text([g], [(0, 1, 1)], (10, 8)))
        dict_body, _ = symbol_dict_encode([g])
        extra = (
            struct.pack(">IB", 9, 0) + b"\x00\x01"
            + struct.pack(">I", len(dict_body)) + dict_body
        )
        # splice a second dictionary before the text region (offset: after
        # page info (30 bytes) + first dict segment)
        first_dict_len = 11 + len(dict_body)
        insert_at = 30 + first_dict_len
        patched = bytes(stream[:insert_at]) + extra + bytes(stream[insert_at:])
        with pytest.raises(ValueError, match="multiple symbol"):
            jbig2_decode(patched)


class TestHalftone:
    """Round-5 session-12 layer: pattern dictionary (T.88 6.7) + halftone
    region (6.6) with Annex C gray-coded bitplane decoding."""

    def _pats(self, n=5, size=4):
        bayer = np.array(
            [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]]
        )
        t = np.kron(bayer, np.ones((size // 4, size // 4), int)) if size != 4 else bayer
        return [(t < (16 * lvl) // (n - 1)).astype(np.uint8) for lvl in range(n)]

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_pattern_dict_roundtrip(self, template):
        from ocr_spark.operators.jbig2_codec import (
            pattern_dict_decode,
            pattern_dict_encode,
        )

        pats = self._pats()
        out = pattern_dict_decode(pattern_dict_encode(pats, template=template))
        assert len(out) == len(pats)
        for a, b in zip(out, pats):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_halftone_e2e_regular_grid(self, template):
        from ocr_spark.operators.jbig2_codec import jbig2_encode_halftone

        rng = np.random.default_rng(template)
        pats = self._pats()
        gi = rng.integers(0, len(pats), (9, 13))
        page = jbig2_decode(jbig2_encode_halftone(gi, pats, template=template))
        want = np.zeros((9 * 4, 13 * 4), np.uint8)
        for m in range(9):
            for n in range(13):
                want[4 * m : 4 * m + 4, 4 * n : 4 * n + 4] |= pats[gi[m, n]]
        np.testing.assert_array_equal(page, want)

    def test_gray_code_is_really_gray(self):
        # adjacent density levels differ in ONE coded bitplane: a smooth
        # ramp must compress far better than a bit-packed binary coding
        # would — pin the gray mapping directly instead
        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
        )

        pats = self._pats(8)
        gi = np.tile(np.arange(8), (4, 1))  # ramp hits every adjacent pair
        body = halftone_region_encode(gi, pats, (8 * 4, 4 * 4))
        x, y, comb, bmp = halftone_region_decode(body, pats)
        assert (x, y) == (0, 0)
        want = np.zeros((16, 32), np.uint8)
        for m in range(4):
            for n in range(8):
                want[4 * m : 4 * m + 4, 4 * n : 4 * n + 4] |= pats[gi[m, n]]
        np.testing.assert_array_equal(bmp, want)

    def test_skewed_grid_vectors(self):
        # (HRX, HRY) = (4<<8, 1<<8): columns advance (+4, -1), rows (+1, +4)
        # in pixels — the 8.8 fixed-point skewed-grid formula of 6.6.5.1
        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
        )

        pats = self._pats(2)
        gi = np.ones((3, 3), int)
        w, h = 24, 24
        body = halftone_region_encode(
            gi, pats, (w, h), grid=(0, 8 << 8, 4 << 8, 1 << 8)
        )
        _x, _y, _c, bmp = halftone_region_decode(body, pats)
        want = np.zeros((h, w), np.uint8)
        pat = pats[1]
        for mg in range(3):
            xx, yy = 0 + mg * (1 << 8), (8 << 8) + mg * (4 << 8)
            for ng in range(3):
                px, py = xx >> 8, yy >> 8
                want[max(0, py) : py + 4, max(0, px) : px + 4] |= pat[
                    max(0, -py) : h - py, max(0, -px) : w - px
                ]
                xx += 4 << 8
                yy -= 1 << 8
        np.testing.assert_array_equal(bmp, want)

    def test_default_pixel_and_combops(self):
        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
        )

        pats = self._pats(2)
        gi = np.zeros((2, 2), int)  # all pattern 0 (empty)
        body = halftone_region_encode(gi, pats, (8, 8), defpix=1, hcomb=1)
        _x, _y, _c, bmp = halftone_region_decode(body, pats)
        # AND of empty patterns onto an all-1 region clears the stamped
        # cells and keeps the default elsewhere
        assert bmp[:8, :8].sum() == 0

    def test_out_of_range_index_clamped(self):
        # spec: a grayscale value beyond HNUMPATS-1 uses the last pattern
        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
        )

        pats3 = self._pats(3)
        pats2 = pats3[:2]
        gi = np.full((2, 2), 2)
        body = halftone_region_encode(gi, pats3, (8, 8))
        _x, _y, _c, bmp = halftone_region_decode(body, pats2)
        want = np.zeros((8, 8), np.uint8)
        for m in range(2):
            for n in range(2):
                want[4 * m : 4 * m + 4, 4 * n : 4 * n + 4] |= pats2[1]
        np.testing.assert_array_equal(bmp, want)

    def test_named_errors(self):
        import struct

        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
            jbig2_encode_halftone,
            pattern_dict_decode,
        )

        pats = self._pats(2)
        # MMR pattern dictionary
        with pytest.raises(ValueError, match="MMR-coded pattern"):
            pattern_dict_decode(bytes([1, 4, 4]) + b"\x00\x00\x00\x01")
        # implausible pattern count
        with pytest.raises(ValueError, match="implausible pattern"):
            pattern_dict_decode(bytes([0, 255, 255]) + b"\x00\x01\x00\x00")
        # MMR halftone region
        body = bytearray(halftone_region_encode(np.zeros((2, 2), int), pats, (8, 8)))
        body[17] |= 1
        with pytest.raises(ValueError, match="MMR-coded halftone"):
            halftone_region_decode(bytes(body), pats)
        # HENABLESKIP
        body = bytearray(halftone_region_encode(np.zeros((2, 2), int), pats, (8, 8)))
        body[17] |= 8
        with pytest.raises(ValueError, match="HENABLESKIP"):
            halftone_region_decode(bytes(body), pats)
        # second pattern dictionary in one stream
        stream = jbig2_encode_halftone(np.zeros((2, 2), int), pats)
        # duplicate the dict segment (number 1, type 16)
        i = stream.find(struct.pack(">IB", 1, 16))
        j = stream.find(struct.pack(">IB", 2, 22))
        with pytest.raises(ValueError, match="multiple pattern dictionaries"):
            jbig2_decode(stream[:j] + stream[i:j] + stream[j:])

    def test_single_pattern_needs_no_planes(self):
        # HNUMPATS == 1 -> bpp 0: no arithmetic data at all
        from ocr_spark.operators.jbig2_codec import (
            halftone_region_decode,
            halftone_region_encode,
        )

        pats = [np.ones((4, 4), np.uint8)]
        body = halftone_region_encode(np.zeros((2, 3), int), pats, (12, 8))
        _x, _y, _c, bmp = halftone_region_decode(body, pats)
        assert bmp[:8, :12].all()
