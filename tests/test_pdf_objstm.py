"""PDF 1.5 object streams (/ObjStm) + cross-reference streams (/XRef):
the layout modern exporters emit, where page trees and font dicts live
inside a compressed container the structural scan must expand
(ISO 32000-1 §7.5.7/§7.5.8; ref parity anchor: the reference loads any
PDF the OS hands it, ocr_workflow_orchestrator.py:153-178)."""

from __future__ import annotations

import zlib

import pytest

from ocr_spark.operators.pdf_layout import (
    _expand_objstm,
    pdf_parse_blocks,
    pdf_write,
    pdf_write_objstm,
)

BLOCKS = [
    {"x": 50, "y": 60, "text": "Hello ObjStm world"},
    {"x": 50, "y": 120, "text": "Second block (parens) kept"},
    {"x": 300, "y": 60, "text": "right column"},
]


class TestObjStmParse:
    def test_identical_to_classic_layout(self):
        classic = pdf_parse_blocks(pdf_write(BLOCKS, compress=True))
        modern = pdf_parse_blocks(pdf_write_objstm(BLOCKS))
        assert modern == classic
        assert len(modern[0]) == 3

    def test_xref_stream_body_never_leaks_blocks(self):
        # the XRef stream body is binary; if it survived into the scan it
        # could fabricate operators — assert block count is exact
        blocks, w, h = pdf_parse_blocks(pdf_write_objstm(BLOCKS))
        assert [b["text"] for b in blocks] == [
            "Hello ObjStm world",
            "Second block (parens) kept",
            "right column",
        ]

    def test_differences_font_inside_objstm(self):
        # a simple font with /Encoding /Differences packed in the ObjStm:
        # code 65 ('A') remaps to U+017E via the uniXXXX AGL pattern
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
            b"/Encoding << /Differences [ 65 /uni017E ] >> >>"
        )
        data = pdf_write_objstm(
            [{"x": 10, "y": 20, "text": "A"}], font_body=font
        )
        blocks, _, _ = pdf_parse_blocks(data)
        assert blocks[0]["text"] == "ž"

    def test_pipeline_batch_path(self):
        from ocr_spark.operators.pdf_layout import extract_pdf_text

        payload = pdf_write_objstm(BLOCKS).decode("latin-1")
        text = extract_pdf_text(payload)
        assert "Hello ObjStm world" in text
        assert "right column" in text


class TestObjStmErrors:
    def _wrap(self, ddict_extra: str, plain: bytes) -> bytes:
        stm = zlib.compress(plain)
        return (
            b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /Filter /FlateDecode "
            + ddict_extra.encode()
            + b" /Length " + str(len(stm)).encode()
            + b" >>\nstream\n" + stm + b"\nendstream\nendobj\n"
        )

    def test_missing_n_raises(self):
        with pytest.raises(ValueError, match="missing /N"):
            pdf_parse_blocks(self._wrap("/First 4", b"1 0\nx"))

    def test_garbage_header_raises(self):
        with pytest.raises(ValueError, match="integer pairs"):
            pdf_parse_blocks(self._wrap("/N 1 /First 8", b"abc def\nbody"))

    def test_short_header_raises(self):
        with pytest.raises(ValueError, match="pairs"):
            pdf_parse_blocks(self._wrap("/N 3 /First 4", b"1 0\nbody"))

    def test_expand_unit(self):
        plain = b"7 0 9 11\n<< /A 1 >>\n<< /B 2 >>\n"
        got = _expand_objstm("/N 2 /First 9", plain)
        assert b"7 0 obj\n<< /A 1 >>\nendobj\n" in got
        assert b"9 0 obj\n<< /B 2 >>\nendobj\n" in got
