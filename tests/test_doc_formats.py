"""Office/ebook/markup document extraction goldens (docx/epub/odt/rtf/tex)
+ zip hardening + the one-stage Spark surface."""

from __future__ import annotations

import io
import zipfile

import pytest

from ocr_spark.operators.doc_formats import (
    DOC_TEXT_SCHEMA,
    docx_extract,
    document_sniff,
    document_text,
    epub_extract,
    extract_document_bytes,
    latex_extract,
    odt_extract,
    rtf_extract,
    synth_docx,
    synth_epub,
    synth_odt,
    synth_rtf,
)


class TestDocx:
    def test_runs_join_and_structure(self):
        d = synth_docx(
            [
                ("Heading1", "Intro"),
                "Hello world from docx.",
                ("list", "first item"),
                ("list2", "nested item"),
            ],
            title="My Doc",
            creator="A. Writer",
            table=[["a", "b"], ["c", "d"]],
        )
        info = docx_extract(d)
        assert info["text"] == (
            "# Intro\nHello world from docx.\n- first item\n  - nested item\n"
            "a | b\nc | d"
        )
        assert info["title"] == "My Doc"
        assert info["creator"] == "A. Writer"
        assert info["n_blocks"] == 6

    def test_tab_br_and_preserved_space(self):
        doc = (
            '<?xml version="1.0"?>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            "<w:body><w:p><w:r>"
            '<w:t xml:space="preserve">lead </w:t><w:tab/>'
            "<w:t>mid</w:t><w:br/><w:t>tail</w:t>"
            "</w:r></w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", doc)
        info = docx_extract(buf.getvalue())
        assert info["text"] == "lead \tmid\ntail"

    def test_instr_and_deleted_text_skipped(self):
        doc = (
            '<?xml version="1.0"?>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            "<w:body><w:p><w:r>"
            "<w:instrText>HYPERLINK foo</w:instrText>"
            "<w:delText>gone</w:delText><w:t>kept</w:t>"
            "</w:r></w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", doc)
        assert docx_extract(buf.getvalue())["text"] == "kept"

    def test_missing_document_xml_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="word/document.xml"):
            docx_extract(buf.getvalue())

    def test_corrupt_zip_raises(self):
        with pytest.raises(ValueError, match="bad zip"):
            docx_extract(b"PK\x03\x04garbage-not-a-zip")


class TestZipHardening:
    def test_entry_inflate_cap(self, monkeypatch):
        import ocr_spark.operators.doc_formats as DF

        monkeypatch.setattr(DF, "MAX_ENTRY_BYTES", 1024)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            # 1 MiB of zeros deflates to ~1 KiB: a bomb-shaped payload
            zf.writestr("word/document.xml", b"\x00" * (1 << 20))
        with pytest.raises(ValueError, match="exceeds"):
            docx_extract(buf.getvalue())

    def test_entry_count_cap(self, monkeypatch):
        import ocr_spark.operators.doc_formats as DF

        monkeypatch.setattr(DF, "MAX_ZIP_ENTRIES", 3)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for i in range(5):
                zf.writestr(f"f{i}", b"x")
        with pytest.raises(ValueError, match="entry count"):
            docx_extract(buf.getvalue())


class TestEpub:
    def test_spine_order_and_all_blocks_kept(self):
        # 2-word paragraph: boilerplate scoring would drop it; book text keeps it
        e = synth_epub(
            [("ch1", "<h1>One</h1><p>First chapter text.</p>"),
             ("ch2", "<p>He left.</p>")],
            title="Novel", creator="B. Author",
        )
        info = epub_extract(e)
        assert info["text"] == "One\nFirst chapter text.\n\nHe left."
        assert info["title"] == "Novel"
        assert info["creator"] == "B. Author"
        assert info["lang"] == "en"
        assert info["n_blocks"] == 2

    def test_href_url_escape_and_subdir(self):
        e = synth_epub([("my chapter", "<p>Spaced href works.</p>")])
        # rewrite the OPF href with %20 escaping to prove unquoting
        zf = zipfile.ZipFile(io.BytesIO(e))
        entries = {n: zf.read(n) for n in zf.namelist()}
        entries["OEBPS/content.opf"] = entries["OEBPS/content.opf"].replace(
            b"text/my chapter.xhtml", b"text/my%20chapter.xhtml"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z2:
            for n, d in entries.items():
                z2.writestr(n, d)
        assert epub_extract(buf.getvalue())["text"] == "Spaced href works."

    def test_nonlinear_spine_item_skipped(self):
        e = synth_epub([("a", "<p>Main text here.</p>"), ("b", "<p>Cover page.</p>")])
        raw = zipfile.ZipFile(io.BytesIO(e)).read("OEBPS/content.opf")
        patched = raw.replace(
            b'<itemref idref="c1"/>', b'<itemref idref="c1" linear="no"/>'
        )
        buf = io.BytesIO()
        zf = zipfile.ZipFile(io.BytesIO(e))
        with zipfile.ZipFile(buf, "w") as z2:
            for n in zf.namelist():
                z2.writestr(n, patched if n == "OEBPS/content.opf" else zf.read(n))
        assert epub_extract(buf.getvalue())["text"] == "Main text here."

    def test_missing_container_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/epub+zip")
        with pytest.raises(ValueError, match="container.xml"):
            epub_extract(buf.getvalue())


class TestOdt:
    def test_structure(self):
        o = synth_odt(
            [("h", 2, "Head"), "Body para one.", ("list", ["x", "y"])],
            title="OD", table=[["p", "q"]],
        )
        info = odt_extract(o)
        assert info["text"] == "## Head\nBody para one.\n- x\n- y\np | q"
        assert info["title"] == "OD"

    def test_space_tab_break_expansion_and_note_skip(self):
        t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        o = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        content = (
            f'<office:document-content xmlns:office="{o}" xmlns:text="{t}">'
            "<office:body><office:text>"
            '<text:p>a<text:s text:c="3"/>b<text:tab/>c<text:line-break/>d'
            "<text:note><text:p>footnote body</text:p></text:note>!</text:p>"
            "</office:text></office:body></office:document-content>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
            zf.writestr("content.xml", content)
        info = odt_extract(buf.getvalue())
        assert info["text"] == "a   b\tc\nd!"


class TestRtf:
    def test_plain_paragraphs(self):
        r = synth_rtf(["Hello RTF world.", "Second para."])
        assert rtf_extract(r)["text"] == "Hello RTF world.\nSecond para."

    def test_destinations_and_hex_escape(self):
        r = (
            b"{\\rtf1\\ansi\\ansicpg1252{\\fonttbl{\\f0 X;}}"
            b"{\\*\\generator Foo 1.0;}{\\info{\\author Hidden}}"
            b"caf\\'e9 ok\\par}"
        )
        assert rtf_extract(r)["text"] == "caf\u00e9 ok"

    def test_codepage_switch(self):
        # cp1251: 0xcf 0xf0 0xe8 = 'При'
        r = b"{\\rtf1\\ansi\\ansicpg1251 \\'cf\\'f0\\'e8vet\\par}"
        assert rtf_extract(r)["text"] == "\u041f\u0440\u0438vet"

    def test_unicode_negative_surrogate_and_uc_skip(self):
        r = (
            b"{\\rtf1\\ansi\\uc1 A\\u21543?B \\u-10179?\\u-8704?! \\uc2 \\u65??C}"
        )
        got = rtf_extract(r)["text"]
        # \u21543 -> chr(21543), '?' fallback skipped; surrogate pair folds to
        # U+1F600; \uc2 makes \u65 swallow TWO fallback chars ('??')
        assert got == "A" + chr(21543) + "B \U0001f600! AC"

    def test_special_chars_and_table(self):
        r = (
            b"{\\rtf1 one\\emdash two\\~three\\_four\\par "
            b"c1\\cell c2\\cell\\row done}"
        )
        assert rtf_extract(r)["text"] == "one\u2014two three-four\nc1\tc2\t\ndone"

    def test_bin_skip(self):
        r = b"{\\rtf1 pre\\bin5 {\\**}post}"
        # \bin5 swallows exactly 5 raw bytes ('{\\**}'), then 'post' flows
        assert rtf_extract(r)["text"] == "prepost"

    def test_uc_state_restored_on_group_close(self):
        r = b"{\\rtf1\\uc1 {\\uc0 \\u65 }\\u66?C}"
        # inner group uc=0 (no fallback after \u65); outer uc=1 restored
        assert rtf_extract(r)["text"] == "ABC"

    def test_not_rtf_raises(self):
        with pytest.raises(ValueError, match="not an RTF"):
            rtf_extract(b"plain text")


class TestLatex:
    TEX = rb"""
\documentclass{article}
\title{The Paper}
\usepackage{amsmath}
\begin{document}
\section{Intro} % trailing comment
Text with $x^2$ math and \textbf{bold} words~here. \cite{smith2020}
\begin{itemize}
\item one
\item two
\end{itemize}
\begin{equation} E = mc^2 \end{equation}
\begin{figure}\includegraphics{x.png}\caption{A nice figure}\end{figure}
Caf\'e and na\"ive, 100\% sure.
\end{document}
"""

    def test_full_pass(self):
        info = latex_extract(self.TEX)
        assert info["title"] == "The Paper"
        assert info["text"] == (
            "# Intro\nText with math and bold words here.\n- one\n- two\n"
            "A nice figure\nCaf\u00e9 and na\u00efve, 100% sure."
        )

    def test_verbatim_kept_raw(self):
        tex = (
            "\\begin{document}before\n\\begin{verbatim}\nx = $raw\\kept$\n"
            "\\end{verbatim}\nafter\\end{document}"
        )
        got = latex_extract(tex)["text"]
        assert "x = $raw\\kept$" in got
        assert "before" in got and "after" in got

    def test_math_and_group_braces_removed(self):
        got = latex_extract(r"a {\it styled} b \[ displayed \] c $$d$$ e")["text"]
        assert got == "a styled b c e"

    def test_nested_unwrap_and_url(self):
        got = latex_extract(r"\emph{\textbf{deep}} \url{http://x.y/z}")["text"]
        assert got == "deep http://x.y/z"

    def test_texorpdfstring_keeps_tex_arm(self):
        got = latex_extract(r"\section{\texorpdfstring{$x$ tex}{pdf}}")["text"]
        assert "pdf" not in got and "tex" in got

    def test_brace_wrapped_accents(self):
        # regression: \'{e} used to emit '{e' (the brace arg was never read)
        got = latex_extract(r"Caf\'{e} fa\c{c}ade na\"{\i}ve \v{s}kola")["text"]
        assert got == "Café façade naïve škola"

    def test_letter_commands_and_case(self):
        got = latex_extract(r"\ss{} street, W\l{}adys\l{}aw, \OE uvre, \'Ecole")["text"]
        # TeX eats the space after a control word: \OE uvre renders Œuvre
        assert got == "ß street, Władysław, Œuvre, École"

    def test_accent_over_plain_letter_not_letter_command(self):
        # regression: \H{o} routed 'o' through the \o letter map and emitted 'ø'
        assert latex_extract(r"\H{o} \r{a} \k{a} \b{x}")["text"] == "ő å ą x"


class TestSniff:
    def test_all_formats(self):
        assert document_sniff(synth_docx(["x"])) == "docx"
        assert document_sniff(synth_epub([("c", "<p>x</p>")])) == "epub"
        assert document_sniff(synth_odt(["x"])) == "odt"
        assert document_sniff(synth_rtf(["x"])) == "rtf"
        assert document_sniff(b"\\documentclass{article}") == "tex"
        assert document_sniff(b"") is None
        assert document_sniff(b"just words") is None
        assert document_sniff(b"PK\x03\x04 broken") is None

    def test_zip_without_doc_markers_is_none(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("data.bin", b"x")
        assert document_sniff(buf.getvalue()) is None

    def test_extract_document_bytes_dispatch(self):
        info = extract_document_bytes(synth_rtf(["dispatched"]))
        assert info["format"] == "rtf"
        assert info["text"] == "dispatched"
        with pytest.raises(ValueError, match="unrecognized"):
            extract_document_bytes(b"???")


class TestSparkSurface:
    def test_mixed_formats_and_envelope(self, spark):
        rows = [
            ("a.docx", synth_docx(["Doc body text."], title="T1")),
            ("b.epub", synth_epub([("c", "<p>Epub body text.</p>")], title="T2")),
            ("c.odt", synth_odt(["Odt body text."])),
            ("d.rtf", synth_rtf(["Rtf body text."])),
            ("e.tex", b"\\begin{document}Tex body text.\\end{document}"),
            ("f.bad", b"not a document at all"),
            ("g.null", None),
        ]
        df = spark.createDataFrame(rows, "media_ref string, content binary")
        got = {r["media_ref"]: r for r in document_text(df).collect()}
        assert len(got) == 7
        assert got["a.docx"]["format"] == "docx"
        assert got["a.docx"]["title"] == "T1"
        assert got["a.docx"]["text"] == "Doc body text."
        assert got["b.epub"]["text"] == "Epub body text."
        assert got["c.odt"]["text"] == "Odt body text."
        assert got["d.rtf"]["text"] == "Rtf body text."
        assert got["e.tex"]["text"] == "Tex body text."
        for ref in ("f.bad", "g.null"):
            assert got[ref]["error"] is not None
            assert got[ref]["text"] is None
        assert got["a.docx"]["n_chars"] == len("Doc body text.")

    def test_plan_exchange_free(self, spark):
        df = spark.createDataFrame(
            [("x", b"{\\rtf1 hi}")], "media_ref string, content binary"
        )
        plan = document_text(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_schema_stable(self, spark):
        df = spark.createDataFrame([], "media_ref string, content binary")
        assert document_text(df).schema == DOC_TEXT_SCHEMA


class TestWarcDocumentTexts:
    def test_routing_by_magic_not_header(self, spark, tmp_path):
        from ocr_spark.operators.doc_formats import synth_docx, synth_rtf
        from ocr_spark.sources.warc import (
            build_warc_gz,
            warc_document_texts,
            warc_records_df,
        )

        gz = build_warc_gz(
            [
                ("https://e/page", b"<p>html page body</p>"),
                # correctly-typed office payload
                (
                    "https://e/report.docx",
                    synth_docx(["Quarterly report body."], title="Q1"),
                    "application/vnd.openxmlformats-officedocument"
                    ".wordprocessingml.document",
                ),
                # MISLABELED rtf (the crawl reality): routed by magic anyway
                (
                    "https://e/memo",
                    synth_rtf(["Memo body text."]),
                    "application/octet-stream",
                ),
                # unrecognized binary -> error envelope row
                ("https://e/blob", b"\x00\x01\x02\x03", "image/png"),
            ]
        )
        (tmp_path / "f.warc.gz").write_bytes(gz)
        out = warc_document_texts(warc_records_df(spark, str(tmp_path)))
        got = {r["media_ref"]: r for r in out.collect()}
        # the html response is excluded by content type (it belongs to T8)
        assert set(got) == {"https://e/report.docx", "https://e/memo", "https://e/blob"}
        assert got["https://e/report.docx"]["format"] == "docx"
        assert got["https://e/report.docx"]["title"] == "Q1"
        assert got["https://e/report.docx"]["text"] == "Quarterly report body."
        assert got["https://e/memo"]["format"] == "rtf"
        assert got["https://e/memo"]["text"] == "Memo body text."
        assert got["https://e/blob"]["error"] is not None


class TestPdfRoute:
    def test_sniff_and_extract(self):
        from ocr_spark.operators.pdf_layout import pdf_write

        pdf = pdf_write(
            [{"x": 40, "y": 40, "text": "Alpha line"},
             {"x": 40, "y": 80, "text": "Beta line"}]
        )
        pdf = pdf.replace(
            b"/Root 1 0 R",
            b"/Root 1 0 R /Info << /Title (My \\(Scanned\\) Doc) >>",
        )
        assert document_sniff(pdf) == "pdf"
        info = extract_document_bytes(pdf)
        assert info["format"] == "pdf"
        assert info["text"] == "Alpha line\nBeta line"
        assert info["title"] == "My (Scanned) Doc"
        assert info["n_blocks"] == 2

    def test_warc_pdf_payload(self, spark, tmp_path):
        from ocr_spark.operators.pdf_layout import pdf_write
        from ocr_spark.sources.warc import (
            build_warc_gz,
            warc_document_texts,
            warc_records_df,
        )

        gz = build_warc_gz(
            [
                (
                    "https://e/scan.pdf",
                    pdf_write([{"x": 10, "y": 10, "text": "Crawled pdf text"}]),
                    "application/pdf",
                ),
            ]
        )
        (tmp_path / "p.warc.gz").write_bytes(gz)
        got = warc_document_texts(warc_records_df(spark, str(tmp_path))).collect()
        assert len(got) == 1
        assert got[0]["format"] == "pdf"
        assert got[0]["text"] == "Crawled pdf text"
        assert got[0]["error"] is None


class TestXlsx:
    def test_sheets_shared_and_types(self):
        from ocr_spark.operators.doc_formats import synth_xlsx, xlsx_extract

        x = synth_xlsx(
            [("Revenue", [["Region", "Q1", True], ["EMEA", 1250, False]]),
             ("Notes", [["hello world"]])]
        )
        info = xlsx_extract(x)
        assert info["text"] == (
            "# Revenue\nRegion | Q1 | TRUE\nEMEA | 1250 | FALSE\n"
            "# Notes\nhello world"
        )
        assert info["n_blocks"] == 5

    def test_inline_strings_and_single_sheet_title(self):
        from ocr_spark.operators.doc_formats import synth_xlsx, xlsx_extract

        x = synth_xlsx([("Data", [["a", "b"], ["c"]])], inline=True)
        info = xlsx_extract(x)
        assert info["text"] == "a | b\nc"  # single sheet: no heading
        assert info["title"] == "Data"

    def test_sniff_and_route(self):
        from ocr_spark.operators.doc_formats import (
            document_sniff,
            extract_document_bytes,
            synth_xlsx,
        )

        x = synth_xlsx([("S", [["v"]])])
        assert document_sniff(x) == "xlsx"
        assert extract_document_bytes(x)["format"] == "xlsx"

    def test_missing_workbook_raises(self):
        from ocr_spark.operators.doc_formats import _zip_bytes, xlsx_extract

        with pytest.raises(ValueError, match="workbook"):
            xlsx_extract(_zip_bytes([("xl/other.xml", b"<x/>")]))


class TestPptx:
    def test_titles_and_slide_order(self):
        from ocr_spark.operators.doc_formats import pptx_extract, synth_pptx

        pp = synth_pptx(
            [("Roadmap", ["Phase one ships.", "Phase two later."]),
             (None, ["Appendix line"])]
        )
        info = pptx_extract(pp)
        assert info["text"] == (
            "# Roadmap\nPhase one ships.\nPhase two later.\nAppendix line"
        )
        assert info["n_blocks"] == 2
        assert info["title"] == "Roadmap"

    def test_sniff_and_route(self):
        from ocr_spark.operators.doc_formats import (
            document_sniff,
            extract_document_bytes,
            synth_pptx,
        )

        pp = synth_pptx([("T", ["body"])])
        assert document_sniff(pp) == "pptx"
        assert extract_document_bytes(pp)["format"] == "pptx"

    def test_rels_missing_falls_back_to_numeric_order(self):
        import io as _io
        import zipfile as _zf

        from ocr_spark.operators.doc_formats import pptx_extract, synth_pptx

        pp = synth_pptx([("A", ["one"]), ("B", ["two"])])
        src = _zf.ZipFile(_io.BytesIO(pp))
        buf = _io.BytesIO()
        with _zf.ZipFile(buf, "w") as out:
            for n in src.namelist():
                if n.endswith(".rels"):
                    continue  # drop the rels: force the fallback
                out.writestr(n, src.read(n))
        info = pptx_extract(buf.getvalue())
        assert info["text"] == "# A\none\n# B\ntwo"


class TestOoxmlEdgeCases:
    """Round-5 review regressions: spec-legal layouts mainstream writers
    don't emit but the ECMA/ISO specs allow."""

    def test_pptx_absolute_rel_targets(self):
        """Relationship Target='/ppt/slides/slideN.xml' (package-root
        absolute) must resolve instead of silently dropping the slide."""
        from ocr_spark.operators.doc_formats import (
            _zip_bytes,
            pptx_extract,
            synth_pptx,
        )

        base = synth_pptx([("One", ["alpha"]), ("Two", ["beta"])])
        import io as _io
        import zipfile as _zf

        entries = []
        with _zf.ZipFile(_io.BytesIO(base)) as z:
            for n in z.namelist():
                data = z.read(n)
                if n == "ppt/_rels/presentation.xml.rels":
                    data = data.replace(
                        b'Target="slides/', b'Target="/ppt/slides/'
                    )
                entries.append((n, data))
        info = pptx_extract(_zip_bytes(entries))
        assert info["n_blocks"] == 2
        assert "alpha" in info["text"] and "beta" in info["text"]
        assert info["text"].index("alpha") < info["text"].index("beta")

    def test_xlsx_cells_without_refs_keep_document_order(self):
        """Cells lacking the optional r= attribute must keep document
        order, not get re-sorted by value."""
        from ocr_spark.operators.doc_formats import _zip_bytes, xlsx_extract

        wb = (
            b'<?xml version="1.0"?><workbook xmlns="http://schemas.open'
            b'xmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
            b'schemas.openxmlformats.org/officeDocument/2006/relationships">'
            b'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
            b"</workbook>"
        )
        rels = (
            b'<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            b'openxmlformats.org/package/2006/relationships"><Relationship '
            b'Id="rId1" Type="http://schemas.openxmlformats.org/office'
            b'Document/2006/relationships/worksheet" '
            b'Target="worksheets/sheet1.xml"/></Relationships>'
        )
        # values chosen so value-sorting would yield "apple | zebra"
        ws = (
            b'<?xml version="1.0"?><worksheet xmlns="http://schemas.open'
            b'xmlformats.org/spreadsheetml/2006/main"><sheetData><row>'
            b'<c t="inlineStr"><is><t>zebra</t></is></c>'
            b'<c t="inlineStr"><is><t>apple</t></is></c>'
            b"</row></sheetData></worksheet>"
        )
        x = _zip_bytes(
            [
                ("xl/workbook.xml", wb),
                ("xl/_rels/workbook.xml.rels", rels),
                ("xl/worksheets/sheet1.xml", ws),
            ]
        )
        info = xlsx_extract(x)
        assert info["text"] == "zebra | apple"
