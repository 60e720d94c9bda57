"""Email archive ingestion tests (`ocr_spark/sources/mail.py`).

All fixtures are REAL RFC 5322/MIME wire bytes produced by the stdlib
generator (and hand-built byte layouts for the adversarial cases), so
the parser is exercised against the same framing real archives carry.
"""

from __future__ import annotations

from email.message import EmailMessage

import pytest

from ocr_spark.sources.mail import (
    eml_extract,
    mail_messages,
    mbox_split,
    synth_eml,
    synth_mbox,
)


class TestEmlExtract:
    def test_plain_message(self):
        info = eml_extract(synth_eml("Hi", text="line one\nline two"))
        assert info["subject"] == "Hi"
        assert info["sender"] == "a@example.com"
        assert info["text"] == "line one\nline two"
        assert info["n_attachments"] == 0
        assert info["date"] == "2026-08-21T12:00:00+00:00"
        assert info["message_id"]

    def test_alternative_prefers_plain(self):
        m = synth_eml("A", text="the plain part",
                      html="<html><body><p>the html part</p></body></html>")
        info = eml_extract(m)
        assert info["text"] == "the plain part"

    def test_html_only_is_block_extracted(self):
        m = synth_eml(
            "H", text=None,
            html="<html><body><div>kept text</div>"
                 "<script>dropped()</script></body></html>",
        )
        info = eml_extract(m)
        assert "kept text" in info["text"]
        assert "dropped" not in info["text"]

    def test_attachments_counted_not_inlined(self):
        info = eml_extract(synth_eml("S", text="body", attachments=3))
        assert info["n_attachments"] == 3
        assert info["text"] == "body"

    def test_rfc2047_subject_and_qp_body(self):
        msg = EmailMessage()
        msg["Subject"] = "Grüße aus Köln"
        msg["From"] = "x@example.com"
        msg["Date"] = "Fri, 21 Aug 2026 09:30:00 +0200"
        msg.set_content("äöü ß €", charset="utf-8", cte="quoted-printable")
        raw = msg.as_bytes()
        assert b"=?utf-8?" in raw or b"Gr=C3=BC" in raw or b"utf-8" in raw
        info = eml_extract(raw)
        assert info["subject"] == "Grüße aus Köln"
        assert info["text"] == "äöü ß €"

    def test_base64_body(self):
        msg = EmailMessage()
        msg["From"] = "x@example.com"
        msg["Subject"] = "b64"
        msg.set_content("base sixty-four body", cte="base64")
        assert b"base64" in msg.as_bytes()
        assert eml_extract(msg.as_bytes())["text"] == "base sixty-four body"

    def test_nested_rfc822_recurses_bounded(self):
        inner = EmailMessage()
        inner["Subject"] = "inner subject"
        inner["From"] = "i@example.com"
        inner.set_content("inner body")
        outer = EmailMessage()
        outer["Subject"] = "outer"
        outer["From"] = "o@example.com"
        outer.set_content("outer body")
        outer.add_attachment(inner)  # message/rfc822
        info = eml_extract(outer.as_bytes())
        assert "outer body" in info["text"]
        assert "inner body" in info["text"]
        assert "Forwarded: inner subject" in info["text"]
        # depth bomb: 8 levels, bound at _MAX_NESTED, no blowup
        m = EmailMessage()
        m["Subject"] = "leaf"
        m["From"] = "l@example.com"
        m.set_content("leaf body")
        for k in range(8):
            w = EmailMessage()
            w["Subject"] = f"wrap{k}"
            w["From"] = "w@example.com"
            w.set_content(f"wrap body {k}")
            w.add_attachment(m)
            m = w
        info = eml_extract(m.as_bytes())
        assert "wrap body 7" in info["text"]

    def test_named_errors(self):
        with pytest.raises(ValueError, match="empty mail"):
            eml_extract(b"   ")
        with pytest.raises(ValueError, match="no RFC 5322 headers"):
            eml_extract(b"just some text\nwith no headers at all\n")


class TestMboxSplit:
    def test_split_and_reparse(self):
        msgs = [
            synth_eml("First", text="body one\nFrom here looks like mbox"),
            synth_eml("Second", text="zwei"),
            synth_eml("Third", text=None, html="<p>drei</p>"),
        ]
        parts = mbox_split(synth_mbox(msgs))
        assert len(parts) == 3
        subjects = [eml_extract(p)["subject"] for p in parts]
        assert subjects == ["First", "Second", "Third"]
        # mboxrd round-trip: the quoted body 'From ' line came back exact
        assert "From here looks like mbox" in eml_extract(parts[0])["text"]

    def test_body_from_line_without_blank_does_not_split(self):
        raw = (
            b"From env Fri Aug 21 12:00:00 2026\n"
            b"From: a@example.com\nSubject: s\n\n"
            b"line\nFrom the middle of a paragraph\nmore\n"
        )
        parts = mbox_split(raw)
        assert len(parts) == 1
        assert "From the middle" in eml_extract(parts[0])["text"]

    def test_not_mbox_named_error(self):
        with pytest.raises(ValueError, match="not an MBOX"):
            mbox_split(b"Subject: x\n\nbody\n")


class TestDocumentRouting:
    def test_sniff_and_extract(self):
        from ocr_spark.operators.doc_formats import (
            document_sniff,
            extract_document_bytes,
        )

        raw = synth_eml("Routed", text="routed body")
        assert document_sniff(raw) == "eml"
        info = extract_document_bytes(raw)
        assert info["format"] == "eml"
        assert info["title"] == "Routed"
        assert info["text"] == "routed body"

    def test_http_response_not_sniffed_as_mail(self):
        from ocr_spark.operators.doc_formats import document_sniff

        http = (
            b"HTTP/1.1 200 OK\r\nDate: Fri, 21 Aug 2026 12:00:00 GMT\r\n"
            b"Content-Type: text/html\r\n\r\n<html>x</html>"
        )
        assert document_sniff(http) != "eml"


@pytest.mark.usefixtures("spark")
class TestSparkSurface:
    def test_mixed_archive_explosion(self, spark):
        msgs = [synth_eml(f"M{i}", text=f"body {i}") for i in range(3)]
        docs = spark.createDataFrame(
            [
                ("a1", synth_mbox(msgs).decode("latin-1")),
                ("a2", synth_eml("Solo", text="solo body").decode("latin-1")),
                ("a3", "not mail at all"),
                ("a4", None),
            ],
            "doc_id string, payload string",
        )
        rows = {r["media_ref"]: r for r in mail_messages(docs).collect()}
        assert set(rows) == {
            "a1#m0", "a1#m1", "a1#m2", "a2#m0", "a3#m0", "a4#m0"
        }
        assert rows["a1#m1"]["subject"] == "M1"
        assert rows["a1#m1"]["text"] == "body 1"
        assert rows["a2#m0"]["subject"] == "Solo"
        assert rows["a3#m0"]["error"] is not None
        assert rows["a4#m0"]["error"] == "ValueError: null payload"
        # the archive with one bad sibling still yielded its good rows
        assert rows["a1#m0"]["error"] is None

    def test_zero_exchange_plan(self, spark):
        docs = spark.createDataFrame(
            [("d", synth_eml("p", text="b").decode("latin-1"))],
            "doc_id string, payload string",
        )
        out = mail_messages(docs)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan


class TestReviewHardening:
    """Regressions for the session-12 second review pass."""

    def test_mbox_routes_as_archive_not_single_message(self):
        from ocr_spark.operators.doc_formats import (
            document_sniff,
            extract_document_bytes,
        )

        box = synth_mbox(
            [synth_eml("First", text="body one"),
             synth_eml("Second", text="body two")]
        )
        assert document_sniff(box) == "mbox"
        info = extract_document_bytes(box)
        assert info["format"] == "mbox"
        assert info["n_blocks"] == 2
        assert "body one" in info["text"] and "body two" in info["text"]
        # raw RFC headers must NOT leak into the corpus text
        assert "Message-ID" not in info["text"]
        assert "From corpus@example" not in info["text"]
        assert info["title"] == "First"

    def test_empty_plain_alternative_falls_through_to_html(self):
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = "stub"
        msg["From"] = "x@example.com"
        msg.set_content("   \n  ")  # whitespace-only plain stub
        msg.add_alternative(
            "<html><body><p>the real content here</p></body></html>",
            subtype="html",
        )
        info = eml_extract(msg.as_bytes())
        assert "the real content here" in info["text"]

    def test_mbox_split_scales_without_prefix_copies(self):
        # behavioral guard for the bounded-endswith boundary check: a
        # body line starting 'From ' mid-paragraph still never splits
        import time

        msgs = [synth_eml(f"S{i}", text=f"b{i}\nFrom line {i}") for i in range(300)]
        box = synth_mbox(msgs)
        t0 = time.time()
        parts = mbox_split(box)
        assert time.time() - t0 < 2.0
        assert len(parts) == 300

    def test_multipage_fax_archive_pixel_budget(self):
        # a 17-page 2000x2000 archive (68 Mpx) exceeds the OLD single-page
        # aggregate cap but is a legitimate scan — must decode
        import numpy as np

        from ocr_spark.operators.image_codecs import (
            tiff_decode_pages,
            tiff_encode_pages,
        )

        page = np.zeros((2000, 2000), np.uint8)
        page[::7, ::3] = 255
        data = tiff_encode_pages([page] * 17, compression="g4")
        pages = tiff_decode_pages(data)
        assert len(pages) == 17
        np.testing.assert_array_equal(pages[16], page)
