"""CID/Type0 PDF text extraction: hex show strings, TJ kern arrays and
ToUnicode CMap decoding (pdf_layout.py round-5 additions).

Real exporters with subset-embedded fonts write text as 2-byte CIDs in hex
strings inside TJ arrays, with inter-word spaces encoded as kern
adjustments; the CIDs map back to Unicode only through the font's
/ToUnicode CMap (PDF 32000-1 §9.10.3). Reference anchor: the input contract
accepts arbitrary real-world PDFs (OCR-X_Component_Breakdown_OptionB.md:11-18);
these fixtures are built by pdf_write_cid, the repo's own synthesizer."""

import pytest

from ocr_spark.operators.pdf_layout import (
    _parse_hex_string,
    _parse_tounicode,
    extract_pdf_text,
    pdf_parse_blocks,
    pdf_write,
    pdf_write_cid,
)


def _extract(pdf_bytes: bytes) -> str:
    return extract_pdf_text(pdf_bytes.decode("latin-1"))


class TestCidRoundTrip:
    BLOCKS = [
        {"x": 50, "y": 60, "text": "Héllo wörld from CID land"},
        {"x": 50, "y": 90, "text": "Second line — em dash ✓"},
    ]

    def test_kern_spaces(self):
        # spaces exist ONLY as -250 TJ kerns; no space glyph is mapped
        pdf = pdf_write_cid(self.BLOCKS, kern_spaces=True)
        assert b"(" not in pdf.split(b"stream")[1].split(b"endstream")[0]
        assert _extract(pdf) == "\n".join(b["text"] for b in self.BLOCKS)

    def test_space_glyphs(self):
        pdf = pdf_write_cid(self.BLOCKS, kern_spaces=False)
        assert _extract(pdf) == "\n".join(b["text"] for b in self.BLOCKS)

    def test_astral_char_survives(self):
        # a surrogate-pair ToUnicode target (4-byte UTF-16 dst)
        pdf = pdf_write_cid([{"x": 10, "y": 10, "text": "ok 😀 ok"}])
        assert _extract(pdf) == "ok 😀 ok"

    def test_xy_cut_order_preserved(self):
        shuffled = [self.BLOCKS[1], self.BLOCKS[0]]
        pdf = pdf_write_cid(shuffled)
        assert _extract(pdf).splitlines()[0].startswith("Héllo")


class TestHexAndTjWithoutCmap:
    """Hex strings / TJ arrays shown with a plain (non-CID) font decode as
    raw latin-1 bytes — the pre-CMap behavior the goldens lock."""

    def _patched(self, replacement: str) -> str:
        base = pdf_write([{"x": 50, "y": 60, "text": "PLACEHOLDER"}])
        return base.decode("latin-1").replace("(PLACEHOLDER) Tj", replacement)

    def test_hex_show_latin1(self):
        raw = self._patched("<" + b"hex shown".hex() + "> Tj")
        assert extract_pdf_text(raw) == "hex shown"

    def test_hex_whitespace_and_odd_pad(self):
        # '7' pads to 0x70 = 'p'; whitespace inside the hex string is inert
        raw = self._patched("<6f 6b 2 0 7> Tj")
        assert extract_pdf_text(raw) == "ok p"

    def test_tj_kern_threshold(self):
        # -30 is letter kerning (joined), -250 is a word gap (space)
        raw = self._patched("[(Wo) -30 (rd) -250 (gap)] TJ")
        assert extract_pdf_text(raw) == "Word gap"

    def test_tj_single_block(self):
        # the array is ONE show: its pieces must not become separate
        # blocks that XY-cut could reorder
        raw = self._patched("[(a) -250 (b)] TJ")
        blocks, _, _ = pdf_parse_blocks(raw)
        assert [b["text"] for b in blocks] == ["a b"]

    def test_dash_pattern_array_ignored(self):
        # '[2 1] 0 d' is a graphics-state operand, legal inside BT
        raw = self._patched("[2 1] 0 d (after) Tj")
        assert extract_pdf_text(raw) == "after"

    def test_inline_dict_ignored(self):
        raw = self._patched("<< /Foo /Bar >> (after) Tj")
        assert extract_pdf_text(raw) == "after"

    def test_quote_show_advances_line(self):
        # ' = T* + show (PDF 9.4.3): each show lands one leading lower,
        # so XY-cut keeps the emission order
        raw = self._patched("14 TL (first) Tj (second) ' (third) '")
        assert extract_pdf_text(raw) == "first\nsecond\nthird"

    def test_double_quote_show(self):
        # " = aw ac + T* + show; the spacing operands are consumed inertly
        raw = self._patched('14 TL (one) Tj 0.25 0 (two) "')
        assert extract_pdf_text(raw) == "one\ntwo"

    def test_quote_with_hex_string(self):
        raw = self._patched(
            "14 TL (lead) Tj <" + b"hexline".hex() + "> '"
        )
        assert extract_pdf_text(raw) == "lead\nhexline"

    def test_apostrophe_inside_string_not_an_operator(self):
        raw = self._patched("(it's fine) Tj")
        assert extract_pdf_text(raw) == "it's fine"


class TestHexStringParser:
    def test_basic(self):
        assert _parse_hex_string("<414243>", 0) == (b"ABC", 8)

    def test_odd_pads_zero(self):
        assert _parse_hex_string("<414>", 0)[0] == b"\x41\x40"

    def test_unterminated_raises(self):
        with pytest.raises(ValueError):
            _parse_hex_string("<4142", 0)

    def test_non_hex_raises(self):
        with pytest.raises(ValueError):
            _parse_hex_string("</Type>", 0)


class TestToUnicodeParser:
    def test_bfchar(self):
        codelen, m = _parse_tounicode(
            "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            "2 beginbfchar\n<0001> <0048>\n<0002> <00E9>\nendbfchar"
        )
        assert codelen == 2
        assert m == {1: "H", 2: "é"}

    def test_bfrange_scalar_increments_last_unit(self):
        _, m = _parse_tounicode(
            "1 beginbfrange\n<0010> <0012> <0061>\nendbfrange"
        )
        assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")

    def test_bfrange_array_form(self):
        _, m = _parse_tounicode(
            "1 beginbfrange\n<0005> <0007> [<0058> <0059> <005A>]\nendbfrange"
        )
        assert (m[5], m[6], m[7]) == ("X", "Y", "Z")

    def test_array_elements_not_misread_as_scalar_range(self):
        # [<d0> <d1> <d2>] must not also match the scalar <lo> <hi> <dst>
        # pattern: 0x58..0x59 would gain bogus entries
        _, m = _parse_tounicode(
            "1 beginbfrange\n<0005> <0007> [<0058> <0059> <005A>]\nendbfrange"
        )
        assert 0x58 not in m

    def test_surrogate_pair_dst(self):
        _, m = _parse_tounicode(
            "1 beginbfchar\n<0003> <D83DDE00>\nendbfchar"
        )
        assert m[3] == "😀"

    def test_codelen_one_byte(self):
        codelen, m = _parse_tounicode(
            "1 begincodespacerange <00> <FF> endcodespacerange\n"
            "1 beginbfchar\n<41> <0041>\nendbfchar"
        )
        assert codelen == 1 and m[0x41] == "A"


class TestUnmappedFallback:
    def test_unmapped_cid_is_replacement_char(self):
        pdf = pdf_write_cid([{"x": 10, "y": 10, "text": "ab"}])
        # splice in a CID far outside the subset's map
        raw = pdf.decode("latin-1").replace("[<", "[<0FFF", 1)
        assert extract_pdf_text(raw).startswith("�")


class TestDifferencesEncoding:
    """Simple-font /Encoding /Differences arrays — the OTHER real-world
    text-mapping mechanism (older Type1/TrueType PDFs), glyph names
    resolved through the Adobe Glyph List subset."""

    def _font_patched(self, font_dict: str, show: str, extra_obj: str = "") -> str:
        base = pdf_write([{"x": 50, "y": 60, "text": "PLACEHOLDER"}])
        raw = base.decode("latin-1").replace(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", font_dict
        ).replace("(PLACEHOLDER) Tj", show)
        if extra_obj:
            raw = raw.replace("trailer", extra_obj + "\ntrailer")
        return raw

    def test_inline_differences(self):
        raw = self._font_patched(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            "/Encoding << /Differences [ 65 /bullet 233 /Euro ] >> >>",
            r"(A caf\351) Tj",
        )
        assert extract_pdf_text(raw) == "• caf€"

    def test_indirect_encoding_object(self):
        raw = self._font_patched(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding 6 0 R >>",
            "(A ok) Tj",
            "6 0 obj\n<< /Type /Encoding /Differences [ 65 /emdash ] >>\nendobj",
        )
        assert extract_pdf_text(raw) == "— ok"

    def test_unmapped_bytes_stay_latin1(self):
        raw = self._font_patched(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            "/Encoding << /Differences [ 65 /bullet ] >> >>",
            r"(caf\351 B) Tj",
        )
        assert extract_pdf_text(raw) == "café B"

    def test_unknown_glyph_name_skipped(self):
        raw = self._font_patched(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            "/Encoding << /Differences [ 65 /g12345 66 /bullet ] >> >>",
            "(AB) Tj",
        )
        # unknown name for 65 → latin-1 'A'; 66 is explicitly bullet
        assert extract_pdf_text(raw) == "A•"

    def test_consecutive_names_advance_code(self):
        raw = self._font_patched(
            "<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            "/Encoding << /Differences [ 65 /endash /emdash /bullet ] >> >>",
            "(ABC) Tj",
        )
        assert extract_pdf_text(raw) == "–—•"


class TestGlyphNames:
    @pytest.mark.parametrize(
        "name,want",
        [
            ("eacute", "é"), ("Agrave", "À"), ("ccedilla", "ç"),
            ("ntilde", "ñ"), ("uuml", None), ("udieresis", "ü"),
            ("aring", "å"), ("oslash", "ø"), ("germandbls", "ß"),
            ("quotedblleft", "“"), ("endash", "–"), ("ellipsis", "…"),
            ("fi", "ﬁ"), ("Euro", "€"), ("uni20AC", "€"),
            ("uni00480065", "He"), ("u1F600", "😀"),
            ("a.sc", "a"), ("one.oldstyle", "1"), ("nonsense", None),
        ],
    )
    def test_agl_subset(self, name, want):
        from ocr_spark.operators.pdf_layout import _glyph_to_unicode

        assert _glyph_to_unicode(name) == want


class TestParserRobustness:
    def test_fuzz_never_raises_unexpected(self):
        """Property: arbitrary latin-1 content-stream soup inside a valid
        PDF skeleton either parses or raises ValueError — never anything
        else, and never hangs on unterminated constructs."""
        from hypothesis import given, settings, strategies as st

        tokens = st.sampled_from([
            "BT", "ET", "Tj", "TJ", "Tf", "Td", "TD", "Tm", "TL", "T*",
            "'", '"', "(abc)", "(a\\351b", "<41", "<4142>", "[", "]",
            "<<", ">>", "/F1", "/Differences", "12", "-250", "0.5", ".",
            "(nested (parens))", "<zz>", "\\", ")",
        ])

        @settings(max_examples=200, deadline=None)
        @given(parts=st.lists(tokens, min_size=0, max_size=30))
        def run(parts):
            base = pdf_write([{"x": 10, "y": 10, "text": "X"}])
            raw = base.decode("latin-1").replace("(X) Tj", " ".join(parts))
            try:
                blocks, w, h = pdf_parse_blocks(raw)
            except ValueError:
                return
            assert isinstance(blocks, list)

        run()


class TestPipelineE2E:
    def test_cid_pdf_through_extract_documents(self, spark):
        """A Type0/ToUnicode PDF (hex TJ arrays, kern-encoded spaces) must
        extract through the production dispatch path, not just the unit
        parser."""
        from ocr_spark.pipeline import extract_documents
        from ocr_spark.schema import DOC_SCHEMA

        cid = pdf_write_cid(
            [
                {"x": 10, "y": 40, "text": "Zwei — unten"},
                {"x": 10, "y": 10, "text": "Éins oben"},
            ]
        ).decode("latin-1")
        df = spark.createDataFrame(
            [("d1", [{"kind": "pdf", "text": cid, "media_ref": None,
                      "offset": 0}])],
            DOC_SCHEMA,
        )
        rows = extract_documents(df).collect()
        assert len(rows) == 1 and rows[0].error is None
        # XY-cut reading order recovered from the CID blocks
        assert rows[0].spans[0].text == "Éins oben\nZwei — unten"


class TestPerPageFontScope:
    """Real exporters reuse resource names (/F1) across pages for DIFFERENT
    fonts; a document-wide name map decoded one page's shows through another
    page's CMap (round-5 review finding). Fonts must bind per page."""

    @staticmethod
    def _two_page_pdf() -> str:
        cmap = (
            "/CIDInit /ProcSet findresource begin\n"
            "12 dict begin begincmap\n"
            "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            "2 beginbfchar\n"
            "<0001> <0058>\n<0002> <0059>\nendbfchar\n"
            "endcmap end end\n"
        )
        objs = {
            1: "<< /Type /Catalog /Pages 2 0 R >>",
            2: "<< /Type /Pages /Kids [3 0 R 8 0 R] /Count 2 >>",
            # page 1: /F1 is a SIMPLE font with /Differences (A->é, B->ö)
            3: (
                "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
            ),
            4: "<< >>\nstream\nBT /F1 12 Tf 50 700 Td (AB) Tj ET\nendstream",
            5: (
                "<< /Type /Font /Subtype /Type1 /Encoding "
                "<< /Differences [ 65 /eacute 66 /odieresis ] >> >>"
            ),
            # page 2: /F1 is a Type0 font with a 2-byte ToUnicode CMap
            8: (
                "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                "/Contents 9 0 R /Resources << /Font << /F1 6 0 R >> >> >>"
            ),
            9: (
                "<< >>\nstream\nBT /F1 12 Tf 50 600 Td <00010002> Tj ET"
                "\nendstream"
            ),
            6: (
                "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
                "/ToUnicode 7 0 R >>"
            ),
            7: "<< >>\nstream\n" + cmap + "\nendstream",
        }
        out = ["%PDF-1.4\n"]
        for num, body in objs.items():
            out.append(f"{num} 0 obj\n{body}\nendobj\n")
        out.append("%%EOF\n")
        return "".join(out)

    def test_each_page_uses_its_own_f1(self):
        text = extract_pdf_text(self._two_page_pdf())
        assert "éö" in text    # page 1 via /Differences, NOT the CMap
        assert "XY" in text    # page 2 via the ToUnicode CMap

    def test_single_page_fallback_unchanged(self):
        # the page-less/global path still decodes (goldens lock this)
        pdf = pdf_write_cid([{"x": 10, "y": 10, "text": "plain ok"}])
        assert extract_pdf_text(pdf.decode("latin-1")) == "plain ok"
