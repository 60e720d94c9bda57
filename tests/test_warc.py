"""WARC ingestion (sources/warc): writer/reader roundtrip, gzip member
split, HTTP parse (content-length slice, dechunking, charset fallback),
error envelopes, and the end-to-end archive → extract_documents path."""

import zlib

import pytest

from ocr_spark.sources.warc import (
    _decode_text,
    _parse_http,
    build_warc_gz,
    http_response_block,
    iter_gzip_members,
    parse_warc_buffer,
    parse_warc_file,
    warc_extract,
    warc_html_docs,
    warc_records_df,
    write_warc_fixture,
)

DOCS = [
    (f"https://example.org/page/{i}", f"<html><body><p>body text {i} with several words of content here</p></body></html>")
    for i in range(10)
]


def _records(data):
    recs = [r for r, e in parse_warc_file(data) if e is None]
    errs = [e for _, e in parse_warc_file(data) if e is not None]
    return recs, errs


class TestRoundtrip:
    def test_per_member_roundtrip(self):
        gz = build_warc_gz([(u, b.encode()) for u, b in DOCS])
        recs, errs = _records(gz)
        assert errs == []
        assert recs[0]["warc_type"] == "warcinfo"
        resp = [r for r in recs if r["warc_type"] == "response"]
        assert [r["target_uri"] for r in resp] == [u for u, _ in DOCS]
        # one gzip member per record (warcinfo + N responses)
        assert sum(1 for _ in iter_gzip_members(gz)) == len(DOCS) + 1

    def test_whole_stream_roundtrip(self):
        gz = build_warc_gz([(u, b.encode()) for u, b in DOCS], per_member=False)
        assert sum(1 for _ in iter_gzip_members(gz)) == 1
        recs, errs = _records(gz)
        assert errs == []
        assert len([r for r in recs if r["warc_type"] == "response"]) == len(DOCS)

    def test_plain_uncompressed_warc(self):
        gz = build_warc_gz([(u, b.encode()) for u, b in DOCS[:3]])
        plain = b"".join(iter_gzip_members(gz))
        recs, errs = _records(plain)
        assert errs == []
        assert len([r for r in recs if r["warc_type"] == "response"]) == 3

    def test_body_containing_record_header_bytes(self):
        # Content-Length must drive the slice: a body embedding 'WARC/1.0'
        # and CRLFCRLF must not split the record
        evil = b"<p>WARC/1.0\r\n\r\nWARC-Type: response\r\n\r\n fake</p>"
        gz = build_warc_gz([("https://e/x", evil), ("https://e/y", b"<p>ok</p>")])
        recs, errs = _records(gz)
        assert errs == []
        resp = [r for r in recs if r["warc_type"] == "response"]
        assert len(resp) == 2
        _, _, body = _parse_http(resp[0]["block"])
        assert body == evil


class TestHttpParse:
    def test_content_length_truncates_trailing_garbage(self):
        body = b"hello"
        block = http_response_block(body) + b"trailing-garbage"
        status, ctype, got = _parse_http(block)
        assert (status, got) == (200, body)
        assert ctype.startswith("text/html")

    def test_chunked_dechunking(self):
        body = bytes(range(256)) * 20  # 5120 bytes -> 6 chunks
        block = http_response_block(body, chunked=True)
        assert b"Transfer-Encoding: chunked" in block
        status, _, got = _parse_http(block)
        assert (status, got) == (200, body)

    def test_non_200_status(self):
        status, _, _ = _parse_http(http_response_block(b"gone", status=404))
        assert status == 404

    def test_charset_decode_fallbacks(self):
        assert _decode_text("café".encode("utf-8"), "text/html; charset=utf-8") == "café"
        # latin-1 labeled
        assert _decode_text("café".encode("latin-1"), "text/html; charset=ISO-8859-1") == "café"
        # mislabeled utf-8-as-ascii still decodes via utf-8 fallback
        assert _decode_text("café".encode("utf-8"), "text/html; charset=us-ascii") == "café"
        # invalid-everywhere bytes never raise
        assert isinstance(_decode_text(b"\xff\xfe\xfd", "text/html"), str)

    def test_bom_beats_label(self):
        # WHATWG: a BOM wins over every transport/in-content label
        assert _decode_text(
            b"\xef\xbb\xbf" + "café".encode("utf-8"),
            "text/html; charset=ISO-8859-1",
        ) == "café"
        assert _decode_text(
            b"\xff\xfe" + "hé".encode("utf-16-le"),
            "text/html; charset=utf-8",
        ) == "hé"
        assert _decode_text(
            b"\xfe\xff" + "hé".encode("utf-16-be"), None
        ) == "hé"

    def test_meta_charset_prescan(self):
        html = '<html><head><meta charset="iso-8859-1"></head>café'.encode(
            "latin-1"
        )
        assert "café" in _decode_text(html, "text/html")
        html2 = (
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1252">d’oh'
        ).encode("cp1252")
        assert "d’oh" in _decode_text(html2, None)
        # an in-content utf-16 label is a lie (the tag itself read as
        # ASCII) — spec says treat it as utf-8
        html3 = '<meta charset="utf-16">café'.encode("utf-8")
        assert "café" in _decode_text(html3, None)

    def test_utf16_label_without_bom(self):
        assert _decode_text(
            "hi".encode("utf-16-le"), "text/html; charset=utf-16"
        ) == "hi"
        assert _decode_text(
            "hi".encode("utf-16-be"), "text/html; charset=UTF-16BE"
        ) == "hi"

    def test_cp1252_c1_passthrough_total(self):
        # the five bytes Python's cp1252 rejects decode as C1 controls —
        # windows-1252 must be total so the fallback can never raise
        out = _decode_text(b"a\x81\x8d\x8f\x90\x9db", "text/plain; charset=windows-1252")
        assert out == "a\x81\x8d\x8f\x90\x9db"
        # curly quote: the byte cp1252 and latin-1 disagree on
        assert _decode_text(b"\x93hi\x94", None) == "“hi”"

    def test_x_user_defined_ascii_half(self):
        assert _decode_text(b"plain", "text/html; charset=x-user-defined") == "plain"

    def test_unknown_label_falls_through(self):
        assert _decode_text("café".encode("utf-8"), "text/html; charset=bogus-enc") == "café"

    def test_header_case_insensitive(self):
        raw = (b"HTTP/1.1 200 OK\r\ncontent-TYPE: text/html\r\n"
               b"CONTENT-length: 2\r\n\r\nhiXX")
        status, ctype, body = _parse_http(raw)
        assert (status, ctype, body) == (200, "text/html", b"hi")


class TestErrorEnvelopes:
    def test_corrupt_member_skipped_rest_parsed(self):
        good = build_warc_gz([("https://e/a", b"<p>a</p>")])
        bad = b"\x1f\x8b" + b"\x00" * 30  # gzip magic, garbage stream
        gz1 = build_warc_gz([("https://e/b", b"<p>b</p>")])
        recs, errs = _records(good + bad + gz1)
        uris = [r["target_uri"] for r in recs if r["warc_type"] == "response"]
        assert uris == ["https://e/a", "https://e/b"]
        assert len(errs) == 1 and "error" in errs[0].lower()

    def test_truncated_record_is_error(self):
        gz = build_warc_gz([("https://e/a", b"<p>aaaa</p>")])
        member = next(iter_gzip_members(gz))
        with pytest.raises(ValueError):
            list(parse_warc_buffer(member[: len(member) // 2]))

    def test_missing_content_length_is_error(self):
        buf = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
        with pytest.raises(ValueError, match="Content-Length"):
            list(parse_warc_buffer(buf))


class TestSparkPath:
    def test_records_df_end_to_end(self, spark, tmp_path):
        write_warc_fixture(str(tmp_path), DOCS, n_files=3, chunked_every=4)
        df = warc_records_df(spark, str(tmp_path))
        rows = df.collect()
        resp = [r for r in rows if r.warc_type == "response"]
        assert len(resp) == len(DOCS)
        assert len([r for r in rows if r.warc_type == "warcinfo"]) == 3
        assert all(r.error is None for r in rows)
        assert all(r.http_status == 200 for r in resp)
        got = {r.target_uri: r.text for r in resp}
        assert got == {u: b for u, b in DOCS}

    def test_html_docs_shape_and_filter(self, spark, tmp_path):
        write_warc_fixture(str(tmp_path), DOCS, n_files=2)
        docs = warc_html_docs(warc_records_df(spark, str(tmp_path)))
        rows = docs.collect()
        assert len(rows) == len(DOCS)  # warcinfo records filtered out
        assert docs.columns == ["doc_id", "spans"]
        s = rows[0].spans[0]
        assert (s.kind, s.media_ref, s.offset) == ("html", None, 0)

    def test_warc_extract_matches_direct_extraction(self, spark, tmp_path):
        from ocr_spark.operators.dispatch import _postprocess_text
        from ocr_spark.operators.html_extract import extract_main_text

        write_warc_fixture(str(tmp_path), DOCS, n_files=3)
        out = warc_extract(spark, str(tmp_path)).collect()
        got = {r.doc_id: r.spans[0].text for r in out}
        want = {
            u: _postprocess_text(extract_main_text(h), []) for u, h in DOCS
        }
        assert got == want
        assert all(r.error is None for r in out)

    def test_corrupt_shard_yields_error_rows_not_failure(self, spark, tmp_path):
        write_warc_fixture(str(tmp_path), DOCS[:4], n_files=1)
        (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"\x99" * 40)
        rows = warc_records_df(spark, str(tmp_path)).collect()
        errs = [r for r in rows if r.error is not None]
        ok = [r for r in rows if r.warc_type == "response"]
        assert len(errs) == 1 and len(ok) == 4


class TestNonLatinCharsets:
    """Labels outside the WHATWG Latin/UTF fold map pass through to
    Python's codec registry — a correctly-labeled CJK/Cyrillic page must
    decode as labeled, never as cp1252 mojibake."""

    def test_shift_jis_label(self):
        body = "日本語のページ".encode("shift_jis")
        assert _decode_text(body, "text/html; charset=shift_jis") == "日本語のページ"
        assert _decode_text(body, "text/html; charset=Shift_JIS") == "日本語のページ"

    def test_gbk_and_koi8r(self):
        assert _decode_text("中文".encode("gbk"), "text/html; charset=GBK") == "中文"
        assert _decode_text(
            "привет".encode("koi8_r"), "text/plain; charset=koi8-r"
        ) == "привет"

    def test_euc_jp_meta_prescan(self):
        html = '<meta charset="euc-jp">水'.encode("euc_jp")
        assert "水" in _decode_text(html, "text/html")

    def test_bogus_transport_label_falls_to_meta(self):
        # an unknown transport label must not block the meta prescan
        html = '<meta charset="shift_jis">日本'.encode("shift_jis")
        assert "日本" in _decode_text(html, "text/html; charset=totally-bogus")

    def test_mislabeled_utf8_as_sjis_falls_back(self):
        # utf-8 bytes that are NOT valid shift_jis fall through to utf-8
        body = "héllo • wörld".encode("utf-8")
        assert _decode_text(body, "text/html; charset=shift_jis") == "héllo • wörld"
