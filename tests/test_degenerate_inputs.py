"""Degenerate-input probe (the verify recipe, promoted to a test): empty
span arrays, null text, unresolvable media refs, malformed pdf/html payloads
— every row must survive with the error envelope set only where the
reference's semantics set it."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def degenerate_out(spark):
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    docs = spark.createDataFrame(
        [
            ("empty", []),
            ("null_text", [("text", None, None, 0)]),
            ("null_html", [("html", None, None, 0)]),
            ("bad_pdf_json", [("pdf", "{not json", None, 0)]),
            ("bad_media", [("media", None, "", 0), ("text", "ok  here", None, 1)]),
            ("normal", [("text", "  a  b ", None, 0)]),
        ],
        DOC_SCHEMA,
    )
    return {
        r.doc_id: r
        for r in extract_documents(docs, rules=[["a", "A"]]).collect()
    }


def test_all_rows_survive(degenerate_out):
    assert set(degenerate_out) == {
        "empty", "null_text", "null_html", "bad_pdf_json", "bad_media", "normal",
    }


def test_empty_spans_doc(degenerate_out):
    r = degenerate_out["empty"]
    assert r.spans == [] and r.error is None and r.confidence is None


def test_null_text_passthrough(degenerate_out):
    # F12 guards: None text flows through the native path unchanged
    r = degenerate_out["null_text"]
    assert r.error is None
    assert r.spans[0].text is None


def test_null_html_and_bad_pdf_yield_empty_not_error(degenerate_out):
    # the extractors treat empty/unparseable payloads as empty documents
    # (reference returns "" rather than raising for these shapes)
    for d in ("null_html", "bad_pdf_json"):
        r = degenerate_out[d]
        assert r.error is None, (d, r.error)
        assert r.spans[0].text == ""


def test_unresolvable_media_envelope(degenerate_out):
    r = degenerate_out["bad_media"]
    assert r.error is not None and "unresolvable" in r.error
    assert r.error_source == "media"
    # the doc keeps flowing: its text span still extracted
    assert r.spans[1].text == "ok here"


def test_normal_doc(degenerate_out):
    r = degenerate_out["normal"]
    assert r.error is None and r.spans[0].text == "A b"
