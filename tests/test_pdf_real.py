"""Real-PDF text-layer tests: the in-repo writer (valid xref'd single-page
PDFs), the content-stream parser (BT/ET, Tf/Td/TD/Tm/T*, Tj, escapes,
MediaBox), and the pdf-kind pipeline path over actual PDF bytes."""

import re

import numpy as np
import pytest

from ocr_spark.operators.pdf_layout import (
    extract_pdf_text,
    pdf_parse_blocks,
    pdf_write,
)

BLOCKS = [
    {"x": 50, "y": 60, "text": "left top"},
    {"x": 320, "y": 60, "text": "right top"},
    {"x": 50, "y": 400, "text": "left bottom"},
    {"x": 320, "y": 400, "text": "right bottom"},
]


def test_writer_emits_valid_xref():
    pdf = pdf_write(BLOCKS)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    xref_off = int(re.search(rb"startxref\n(\d+)", pdf).group(1))
    assert pdf[xref_off : xref_off + 4] == b"xref"
    for i, off in enumerate(re.findall(rb"(\d{10}) 00000 n", pdf), start=1):
        assert pdf[int(off) :].startswith(f"{i} 0 obj".encode())
    m = re.search(rb"/Length (\d+) >>\nstream\n", pdf)
    ln = int(m.group(1))
    assert pdf[m.end() + ln : m.end() + ln + 10] == b"\nendstream"


def test_roundtrip_positions_and_text():
    pdf = pdf_write(BLOCKS)
    parsed, w, h = pdf_parse_blocks(pdf)
    assert (w, h) == (612.0, 792.0)
    got = {(round(b["x"]), round(b["y"]), b["text"]) for b in parsed}
    assert got == {(b["x"], b["y"], b["text"]) for b in BLOCKS}


def test_string_escapes_roundtrip():
    weird = [{"x": 10, "y": 10, "text": "par(en)s \\ back\nline\ttab \x07bel"}]
    # \x07 survives as octal escape? writer only escapes \\ ( ) — control
    # bytes pass through latin-1 verbatim, parser returns them as-is
    parsed, _, _ = pdf_parse_blocks(pdf_write(weird))
    assert parsed[0]["text"] == weird[0]["text"]


def test_octal_and_nested_parens_parse():
    body = "%PDF-1.4\nBT /F1 10 Tf 5 700 Td (a\\101b (nested) \\) done) Tj ET"
    parsed, _, _ = pdf_parse_blocks(body)
    assert parsed[0]["text"] == "aAb (nested) ) done"
    assert parsed[0]["h"] == 10.0


def test_td_tm_tstar_positioning():
    body = (
        "%PDF-1.4\n"
        "BT /F1 12 Tf 100 700 Td (first) Tj 0 -20 TD (second) Tj T* (third) Tj ET\n"
        "BT 1 0 0 1 300 500 Tm (via tm) Tj ET"
    )
    parsed, _, h = pdf_parse_blocks(body)
    ys = {b["text"]: b["y"] for b in parsed}
    # Td is cumulative; TD also sets leading for T*
    assert ys["second"] == ys["first"] + 20
    assert ys["third"] == ys["second"] + 20
    assert ys["via tm"] == pytest.approx(h - 500 - 12)
    xs = {b["text"]: b["x"] for b in parsed}
    assert xs["via tm"] == 300


def test_mediabox_respected():
    pdf = pdf_write([{"x": 10, "y": 20, "text": "t"}], page_w=200, page_h=100)
    parsed, w, h = pdf_parse_blocks(pdf)
    assert (w, h) == (200.0, 100.0)
    assert parsed[0]["y"] == pytest.approx(20.0)


def test_flate_roundtrip_matches_uncompressed():
    """compress=True writes a real FlateDecode content stream; the parser
    inflates it via stdlib zlib and produces the identical block set."""
    plain, _, _ = pdf_parse_blocks(pdf_write(BLOCKS))
    inflated, w, h = pdf_parse_blocks(pdf_write(BLOCKS, compress=True))
    assert inflated == plain
    # str input path inflates too (latin-1 is byte-preserving)
    via_str, _, _ = pdf_parse_blocks(
        pdf_write(BLOCKS, compress=True).decode("latin-1")
    )
    assert via_str == plain


def test_flate_unsupported_variants_and_not_a_pdf_rejected():
    # corrupt deflate payload → explicit error, not a zlib traceback
    with pytest.raises(ValueError, match="inflate"):
        pdf_parse_blocks(
            b"%PDF-1.5\n<< /Filter /FlateDecode /Length 2 >>\nstream\nxx\nendstream"
        )
    # filter CHAIN is out of scope and must say so
    with pytest.raises(ValueError, match="filter chain"):
        pdf_parse_blocks(
            b"%PDF-1.5\n<< /Filter [/ASCII85Decode /FlateDecode] /Length 2 "
            b">>\nstream\nxx\nendstream"
        )
    # out-of-range predictor values still fail loudly (supported: 1,2,10-15)
    import zlib

    body = zlib.compress(b"BT ET")
    with pytest.raises(ValueError, match="unsupported /Predictor"):
        pdf_parse_blocks(
            b"%PDF-1.5\n<< /Filter /FlateDecode /DecodeParms << /Predictor 99 "
            b">> /Length " + str(len(body)).encode() + b" >>\nstream\n"
            + body + b"\nendstream"
        )
    with pytest.raises(ValueError, match="BitsPerComponent"):
        pdf_parse_blocks(
            b"%PDF-1.5\n<< /Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/BitsPerComponent 16 >> /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream"
        )
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_parse_blocks(b"hello")
    # an INDIRECT /DecodeParms (legal per spec 7.3.8) can't be resolved by
    # the structural scan: must fail to the per-doc envelope, not silently
    # parse row-filtered bytes as garbage operators
    with pytest.raises(ValueError, match="DecodeParms"):
        pdf_parse_blocks(
            b"%PDF-1.5\n<< /Filter /FlateDecode /DecodeParms 7 0 R /Length "
            + str(len(body)).encode() + b" >>\nstream\n" + body + b"\nendstream"
        )


@pytest.mark.parametrize("predictor,columns", [(2, 64), (10, 64), (12, 64), (12, 7), (15, 32)])
def test_flate_predictor_roundtrip(predictor, columns):
    """/DecodeParms predictor streams (TIFF 2 and PNG 10-15) inflate and
    un-filter to the identical block set (VERDICT r3 #4; the rejection
    sites previously at pdf_layout.py:199-215 are now real decoders)."""
    plain, _, _ = pdf_parse_blocks(pdf_write(BLOCKS))
    dec, w, h = pdf_parse_blocks(
        pdf_write(BLOCKS, compress=True, predictor=predictor, columns=columns)
    )
    assert dec == plain


def test_flate_length_slices_literal_endstream():
    """Deflate stored-blocks may contain the bytes b'endstream'; the dict's
    /Length must bound the stream body (ADVICE r3: find(b'endstream')
    truncated such streams)."""
    import zlib

    content = zlib.compress(
        b"BT /F1 12 Tf 50 720 Td (sliced endstream ok) Tj ET", 0
    )  # level 0 = stored blocks, literal bytes survive
    assert b"endstream" in content
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /MediaBox [0 0 612 792] >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    parsed, _, _ = pdf_parse_blocks(pdf)
    assert [b["text"] for b in parsed] == ["sliced endstream ok"]


def test_flate_indirect_length_falls_back_to_endstream_scan():
    import zlib

    content = zlib.compress(b"BT /F1 12 Tf 50 720 Td (indirect len) Tj ET")
    pdf = (
        b"%PDF-1.4\n4 0 obj\n<< /Filter /FlateDecode /Length 9 0 R "
        b">>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"9 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
    )
    parsed, _, _ = pdf_parse_blocks(pdf)
    assert [b["text"] for b in parsed] == ["indirect len"]


def test_string_escape_octal_and_non_octal_digits():
    """'\\101' is octal 'A'; '\\8'/'\\9' are NOT octal and must stay literal
    (ADVICE r3: isdigit() let them into int(...,8) which raised and dropped
    the enclosing string)."""
    from ocr_spark.operators.pdf_layout import _parse_pdf_string

    s, end = _parse_pdf_string(r"(a\101\8\9b)", 0)
    assert s == "aA89b"
    assert end == len(r"(a\101\8\9b)")


def test_extract_pdf_text_sniffs_real_vs_json():
    pdf = pdf_write(BLOCKS).decode("latin-1")
    assert extract_pdf_text(pdf) == "left top\nright top\nleft bottom\nright bottom"
    json_payload = '{"blocks": [{"x": 1, "y": 1, "w": 5, "h": 5, "text": "j"}]}'
    assert extract_pdf_text(json_payload) == "j"
    assert extract_pdf_text("") == ""


def test_xycut_recovers_reading_order_from_shuffled_pdf():
    rng = np.random.default_rng(0)
    shuffled = [BLOCKS[i] for i in rng.permutation(4)]
    text = extract_pdf_text(pdf_write(shuffled).decode("latin-1"))
    assert text == "left top\nright top\nleft bottom\nright bottom"


def test_pdf_real_pipeline_e2e(spark):
    """Actual writer-produced PDF bytes through the FULL pipeline: the
    pdf-kind span carries the PDF as latin-1 text, the Arrow stage parses
    the text layer and XY-cuts reading order."""
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    pdf = pdf_write(BLOCKS).decode("latin-1")
    docs = spark.createDataFrame(
        [("p1", [("pdf", pdf, None, 0)]), ("p2", [("pdf", "%PDF-garbage", None, 0)])],
        DOC_SCHEMA,
    )
    rows = {r.doc_id: r for r in extract_documents(docs, rules=[]).collect()}
    assert rows["p1"].error is None
    assert rows["p1"].spans[0].text == "left top\nright top\nleft bottom\nright bottom"
    # a %PDF- payload with no BT/ET text objects extracts to empty, no error
    assert rows["p2"].spans[0].text == "" and rows["p2"].error is None


def test_pdf_compressed_pipeline_e2e(spark):
    """FlateDecode'd PDFs (the real-world default) through the FULL
    pipeline: inflation happens inside the Arrow stage and the extracted
    reading order matches the uncompressed twin."""
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    pdf_c = pdf_write(BLOCKS, compress=True).decode("latin-1")
    docs = spark.createDataFrame(
        [("pc", [("pdf", pdf_c, None, 0)])], DOC_SCHEMA
    )
    row = extract_documents(docs, rules=[]).collect()[0]
    assert row.error is None
    assert row.spans[0].text == "left top\nright top\nleft bottom\nright bottom"


def test_encrypted_pdf_named_envelope():
    """A /Encrypt trailer entry must fail LOUD (ciphertext streams would
    otherwise inflate-fail confusingly or silently emit garbage)."""
    import pytest

    from ocr_spark.operators.pdf_layout import pdf_parse_blocks, pdf_write

    plain = pdf_write([{"x": 72, "y": 72, "text": "hello"}])
    # splice an /Encrypt ref into the trailer dict
    enc = plain.replace(b"trailer", b"trailer", 1)
    assert b"trailer" in enc
    enc = enc.replace(b"<<", b"<< /Encrypt 9 0 R ", 1)
    with pytest.raises(ValueError, match="encrypted PDF"):
        pdf_parse_blocks(enc)
    # the plain doc still parses (guard is not a false positive)
    blocks, _, _ = pdf_parse_blocks(plain)
    assert any("hello" in b["text"] for b in blocks)


class TestMultiPage:
    def test_pages_read_sequentially_not_interleaved(self):
        from ocr_spark.operators.pdf_layout import extract_pdf_text, pdf_write_pages

        pdf = pdf_write_pages(
            [
                [{"x": 40, "y": 40, "text": "P1 first"},
                 {"x": 40, "y": 70, "text": "P1 second"}],
                [{"x": 40, "y": 40, "text": "P2 first"},
                 {"x": 40, "y": 70, "text": "P2 second"}],
                [{"x": 40, "y": 40, "text": "P3 only"}],
            ]
        )
        got = extract_pdf_text(pdf.decode("latin-1"))
        assert got == "P1 first\nP1 second\nP2 first\nP2 second\nP3 only"

    def test_page_tree_order_beats_file_order(self):
        # content streams stored in REVERSED byte order; /Kids is the truth
        from ocr_spark.operators.pdf_layout import extract_pdf_text, pdf_write_pages

        pdf = pdf_write_pages(
            [
                [{"x": 40, "y": 40, "text": "First page"}],
                [{"x": 40, "y": 40, "text": "Second page"}],
            ],
            shuffle_objects=True,
        )
        got = extract_pdf_text(pdf.decode("latin-1"))
        assert got == "First page\nSecond page"

    def test_single_page_unchanged(self):
        from ocr_spark.operators.pdf_layout import (
            extract_pdf_text,
            pdf_write,
            pdf_write_pages,
        )

        blocks = [{"x": 40, "y": 40, "text": "Only page"}]
        assert extract_pdf_text(
            pdf_write_pages([blocks]).decode("latin-1")
        ) == extract_pdf_text(pdf_write(blocks).decode("latin-1"))

    def test_bottom_edge_block_stays_on_its_page(self):
        # a block at the page's very bottom must not merge into page 2's top
        from ocr_spark.operators.pdf_layout import extract_pdf_text, pdf_write_pages

        pdf = pdf_write_pages(
            [
                [{"x": 40, "y": 779, "text": "P1 footer", "size": 12}],
                [{"x": 40, "y": 1, "text": "P2 header", "size": 12}],
            ]
        )
        assert extract_pdf_text(pdf.decode("latin-1")) == "P1 footer\nP2 header"


class TestPdfInfoMetadata:
    """Round-5 session-12: trailer /Info document metadata (§14.3.3)."""

    def _doc(self, info_body: bytes) -> bytes:
        from ocr_spark.operators.pdf_layout import pdf_write

        plain = pdf_write([{"x": 40, "y": 50, "text": "hello world"}])
        obj = b"6 0 obj\n" + info_body + b"\nendobj\n"
        return plain.replace(b"xref\n", obj + b"xref\n", 1).replace(
            b"/Root 1 0 R", b"/Root 1 0 R /Info 6 0 R", 1
        )

    def test_info_fields_and_utf16(self):
        from ocr_spark.operators.pdf_layout import pdf_info

        doc = self._doc(
            b"<< /Title (My Report) "
            b"/Author (\xfe\xff\x00J\x00 \x00D\x00o\x00e) "
            b"/Subject (testing) "
            b"/CreationDate (D:20260821120000+02'00') "
            b"/ModDate (D:20260821) >>"
        )
        meta = pdf_info(doc)
        assert meta["title"] == "My Report"
        assert meta["author"] == "J Doe"  # UTF-16BE with BOM
        assert meta["subject"] == "testing"
        assert meta["date"] == "2026-08-21T12:00:00+02:00"
        assert meta["moddate"] == "2026-08-21T00:00:00"  # partial date

    def test_absent_info_is_empty_not_error(self):
        from ocr_spark.operators.pdf_layout import pdf_info, pdf_write

        assert pdf_info(pdf_write([{"x": 1, "y": 1, "text": "t"}])) == {}
        assert pdf_info(b"%PDF-1.4\ngarbage") == {}

    def test_doc_formats_surface_carries_metadata(self):
        from ocr_spark.operators.doc_formats import pdf_text_extract

        r = pdf_text_extract(
            self._doc(b"<< /Title (T1) /Author (A1) "
                      b"/CreationDate (D:20250101120000Z) >>")
        )
        assert (r["title"], r["creator"], r["date"]) == (
            "T1", "A1", "2025-01-01T12:00:00+00:00"
        )
        assert r["text"] == "hello world"

    @pytest.mark.parametrize("variant", ["rc4-128", "aesv2", "aesv3"])
    def test_metadata_survives_encryption(self, variant):
        # /Info strings are encrypted like any others; the decrypt path
        # and the trailer /Info preservation must both hold
        from ocr_spark.operators.doc_formats import pdf_text_extract
        from ocr_spark.operators.pdf_crypt import encrypt_pdf

        doc = self._doc(b"<< /Title (Secret Title) /Author (Anon) >>")
        enc = encrypt_pdf(doc, variant=variant)
        assert b"Secret Title" not in enc  # actually hidden at rest
        r = pdf_text_extract(enc)
        assert (r["title"], r["creator"]) == ("Secret Title", "Anon")
        assert r["text"] == "hello world"

    def test_binary_stream_cannot_fake_info(self):
        # '/Info 9 0 R' BYTES inside a compressed stream body are masked
        import zlib

        from ocr_spark.operators.pdf_layout import pdf_info

        payload = zlib.compress(b"fake /Info 9 0 R marker")
        doc = (
            b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
            + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n"
        )
        assert pdf_info(doc) == {}
