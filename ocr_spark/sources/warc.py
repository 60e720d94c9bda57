"""WARC web-archive ingestion (Common Crawl layout) feeding the HTML
main-content extractor (T8, `operators/html_extract`).

The reference acquires documents one file at a time
(ref ocr_workflow_orchestrator.py:153-178 loads local paths); a web-scale
corpus build ingests WARC: the ISO 28500 record format Common Crawl
publishes, stored as `.warc.gz` with ONE GZIP MEMBER PER RECORD so archives
are splittable at member boundaries.

Scale shape (the cc-pyspark architecture): `spark.read.format("binaryFile")`
yields one row per archive file — Common Crawl shards are ~1 GB, so a
100 TB crawl is ~100k files = 100k independent tasks, parallelism from the
file listing alone with zero shuffle. Each task streams its archive through
a zlib decompressobj member-by-member (bounded memory: one record
decompressed at a time, never the whole archive) inside ONE mapInArrow
stage that emits a typed record row per WARC record. Downstream is ordinary
DataFrame code: filters on (warc_type, http_status, content_type) prune
records, and the HTML payloads flow into the same dispatch/extract stage
the interleaved-spans pipeline uses.

Per-record failures are ERROR ENVELOPES (a row with `error` set), never
task failures — one corrupt member in a 1 GB shard must not kill the other
~50k records in it.

Writer half (`build_warc_gz` / `write_warc_fixture`) exists for fixtures
and tests: this sandbox has no crawl data, so archives are synthesized
deterministically from the documents table and parsed back through the real
reader — the roundtrip is what the correctness row locks.
"""

from __future__ import annotations

import codecs as _codecs
import io
import re as _re
import zlib

CRLF = b"\r\n"
_FIXED_DATE = "2026-01-01T00:00:00Z"  # deterministic WARC-Date for fixtures


# ---------------------------------------------------------------------------
# writer (fixture side)
# ---------------------------------------------------------------------------


def warc_record_bytes(headers: dict[str, str], block: bytes) -> bytes:
    """Serialize one WARC/1.0 record: version line, named headers,
    Content-Length, blank line, block, two CRLF terminators."""
    out = [b"WARC/1.0"]
    for k, v in headers.items():
        out.append(f"{k}: {v}".encode())
    out.append(f"Content-Length: {len(block)}".encode())
    out.append(b"")
    head = CRLF.join(out) + CRLF
    return head + block + CRLF + CRLF


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
) -> bytes:
    """An HTTP/1.1 response as captured on the wire (what a WARC `response`
    record's block contains). `chunked=True` emits Transfer-Encoding:
    chunked framing — crawlers store the raw bytes, so readers must
    dechunk."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Unknown"
    )
    hdrs = [f"HTTP/1.1 {status} {reason}".encode()]
    hdrs.append(f"Content-Type: {content_type}".encode())
    if chunked:
        hdrs.append(b"Transfer-Encoding: chunked")
        chunks, i = [], 0
        while i < len(body):
            n = min(1024, len(body) - i)
            chunks.append(f"{n:x}".encode() + CRLF + body[i : i + n] + CRLF)
            i += n
        chunks.append(b"0" + CRLF + CRLF)
        payload = b"".join(chunks)
    else:
        hdrs.append(f"Content-Length: {len(body)}".encode())
        payload = body
    return CRLF.join(hdrs) + CRLF + CRLF + payload


def build_warc_gz(
    records: list[tuple[str, bytes]],
    per_member: bool = True,
    chunked_every: int = 0,
    filename: str = "fixture.warc.gz",
) -> bytes:
    """A .warc.gz archive: a `warcinfo` record then one `response` record
    per (target_uri, html_body_bytes). `per_member=True` (Common Crawl
    layout) gzips every record as its own member; False gzips the whole
    archive as one stream (also legal — readers must accept both).
    `chunked_every=k` stores every k-th response with chunked framing.
    A record may also be a (uri, body, content_type) triple for non-HTML
    payloads (office formats etc.)."""
    info_block = (
        f"software: ocr-spark-fixture\r\nformat: WARC File Format 1.0\r\n"
    ).encode()
    recs = [
        warc_record_bytes(
            {
                "WARC-Type": "warcinfo",
                "WARC-Date": _FIXED_DATE,
                "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
                "WARC-Filename": filename,
                "Content-Type": "application/warc-fields",
            },
            info_block,
        )
    ]
    for i, rec in enumerate(records):
        uri, body = rec[0], rec[1]
        ctype = rec[2] if len(rec) > 2 else "text/html; charset=utf-8"
        chunked = bool(chunked_every) and (i % chunked_every == chunked_every - 1)
        block = http_response_block(body, content_type=ctype, chunked=chunked)
        recs.append(
            warc_record_bytes(
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": uri,
                    "WARC-Date": _FIXED_DATE,
                    "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
                    "Content-Type": "application/http; msgtype=response",
                },
                block,
            )
        )
    if per_member:
        return b"".join(
            _gzip_member(r) for r in recs
        )
    return _gzip_member(b"".join(recs))


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def write_warc_fixture(
    dir_path: str, docs: list[tuple[str, str]], n_files: int = 4, **kw
) -> list[str]:
    """Shard (uri, html_text) docs round-robin into `n_files` .warc.gz
    archives under dir_path; returns the written paths. Deterministic."""
    import os

    os.makedirs(dir_path, exist_ok=True)
    shards: list[list[tuple[str, bytes]]] = [[] for _ in range(n_files)]
    for i, (uri, html) in enumerate(docs):
        shards[i % n_files].append((uri, html.encode("utf-8")))
    paths = []
    for fi, shard in enumerate(shards):
        name = f"part-{fi:04d}.warc.gz"
        p = os.path.join(dir_path, name)
        with open(p, "wb") as f:
            f.write(build_warc_gz(shard, filename=name, **kw))
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# reader (executor side)
# ---------------------------------------------------------------------------


def iter_gzip_members(data: bytes):
    """Yield each gzip member of a multi-member stream decompressed, one at
    a time (bounded memory). Non-gzip input is yielded whole (plain .warc)."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        yield d.decompress(data[pos:])
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)


def _parse_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from a raw captured HTTP response.
    Dechunks Transfer-Encoding: chunked; truncates to Content-Length when
    present (trailing garbage after the entity is not body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(CRLF)
    status = None
    parts = lines[0].split(None, 2)
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    ctype, clen, chunked = None, None, False
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        lk = k.strip().lower()
        if lk == b"content-type":
            ctype = v.strip().decode("latin-1")
        elif lk == b"content-length":
            try:
                clen = int(v.strip())
            except ValueError:
                pass
        elif lk == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
    if chunked:
        out, pos = [], 0
        while True:
            nl = body.find(CRLF, pos)
            if nl < 0:
                break
            try:
                n = int(body[pos:nl].split(b";")[0], 16)
            except ValueError:
                break
            if n == 0:
                break
            out.append(body[nl + 2 : nl + 2 + n])
            pos = nl + 2 + n + 2  # skip chunk body + CRLF
        body = b"".join(out)
    elif clen is not None and 0 <= clen <= len(body):
        body = body[:clen]
    return status, ctype, body


# WHATWG-style charset sniffing. Label map: the WHATWG Encoding standard
# folds the whole Latin-1 family (iso-8859-1, latin1, ascii, us-ascii, and
# the empty label) into windows-1252, and bare "utf-16" into the LE variant.
# x-user-defined is windows-1252 for extraction purposes (its PUA mapping
# exists for legacy font hacks; the ASCII half — the extractable text — is
# identical).
_CHARSET_LABELS = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "x-user-defined": "cp1252",
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

# WHATWG windows-1252 is total: the five bytes Python's cp1252 leaves
# undefined (81 8D 8F 90 9D) map to the corresponding C1 controls.
def _c1_passthrough(exc):
    return (
        "".join(chr(b) for b in exc.object[exc.start : exc.end]),
        exc.end,
    )


_codecs.register_error("ocr_spark_c1", _c1_passthrough)

# meta prescan (HTML spec "determining the character encoding" step 6):
# <meta charset=X> or <meta http-equiv=content-type content="...charset=X">
# — one pattern catches both, bounded to the first 1024 bytes.
_META_CHARSET_RE = _re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_:.\-]+)",
    _re.IGNORECASE,
)


def _charset_from_label(label: str | None) -> str | None:
    """WHATWG fold for the Latin-1/UTF families; any OTHER label passes
    through verbatim to Python's codec registry — a correctly-labeled
    shift_jis/gbk/koi8-r page must decode as labeled, not as cp1252
    mojibake. Bogus labels surface as LookupError at decode time and fall
    through the chain (bytes-to-bytes codecs like base64 also raise
    LookupError from bytes.decode, so they cannot be injected here)."""
    if not label:
        return None
    lab = label.strip(" \"'").lower()
    if not lab:
        return None
    if lab in _CHARSET_LABELS:
        return _CHARSET_LABELS[lab]
    try:
        _codecs.lookup(lab)  # unknown label -> None, so meta prescan runs
    except LookupError:
        return None
    return lab


def _decode_text(body: bytes, content_type: str | None) -> str:
    """Decode a textual HTTP body, WHATWG sniffing order (never raises —
    a crawl always contains mislabeled pages):

    1. BOM (UTF-8 / UTF-16 LE / UTF-16 BE) wins over every label;
    2. transport-layer charset= parameter;
    3. in-content <meta charset> prescan of the first 1024 bytes (HTML
       bodies / unlabeled payloads);
    4. strict UTF-8;
    5. windows-1252 (total — every byte decodes, C1 passthrough for the
       five bytes Python leaves undefined).

    One deliberate deviation from the letter of the spec: under any label
    except the UTF-16 family, a body that strict-decodes as UTF-8 is
    returned as UTF-8 — mislabeled UTF-8 is rampant in crawls, and
    genuine cp1252/shift_jis/gbk/koi8 text virtually never forms valid
    multi-byte UTF-8 sequences (CCNet makes the same call). The label is
    consulted only when the body is NOT valid UTF-8. UTF-16 is exempt
    because its bodies are routinely UTF-8-invalid anyway and its labels
    are reliable."""
    if body.startswith(b"\xef\xbb\xbf"):
        return body[3:].decode("utf-8", "replace")
    if body.startswith(b"\xff\xfe"):
        return body[2:].decode("utf-16-le", "replace")
    if body.startswith(b"\xfe\xff"):
        return body[2:].decode("utf-16-be", "replace")

    label = None
    if content_type and "charset=" in content_type:
        label = content_type.split("charset=", 1)[1].split(";")[0]
    enc = _charset_from_label(label)
    if enc is None:
        m = _META_CHARSET_RE.search(body[:1024])
        if m:
            # spec: an in-content utf-16 label is treated as utf-8 (a
            # meta tag readable as ASCII can't be telling the truth)
            meta = _charset_from_label(m.group(1).decode("latin-1"))
            enc = "utf-8" if meta in ("utf-16-le", "utf-16-be") else meta

    if enc in ("utf-16-le", "utf-16-be"):
        try:
            return body.decode(enc)
        except UnicodeDecodeError:
            pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        pass
    # body is not valid UTF-8: now the label decides (see deviation note)
    if enc not in (None, "utf-8", "cp1252", "utf-16-le", "utf-16-be"):
        try:
            return body.decode(enc)
        except (UnicodeDecodeError, LookupError):
            pass
    return body.decode("cp1252", "ocr_spark_c1")


def parse_warc_buffer(buf: bytes):
    """Yield record dicts from one decompressed WARC buffer (which holds one
    record in per-member archives, many in whole-stream ones). Content-Length
    drives the block slice — a body containing the literal bytes 'WARC/1.0'
    must NOT split a record."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"bad record header at offset {pos}")
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated record header")
        headers: dict[str, str] = {}
        for ln in buf[pos:hdr_end].split(CRLF)[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError("record missing Content-Length")
        block_start = hdr_end + 4
        if block_start + clen > n:
            raise ValueError("truncated record block")
        yield {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "warc_content_type": headers.get("content-type"),
            "block": buf[block_start : block_start + clen],
        }
        pos = block_start + clen


def parse_warc_file(data: bytes):
    """All records of one (possibly multi-member gzip) archive, as
    (record_dict, error) pairs: a corrupt member yields (None, msg) and
    parsing RESYNCS at the next gzip magic so one bad member never hides
    the rest of a 1 GB shard."""
    if data[:2] != b"\x1f\x8b":
        try:
            yield from ((r, None) for r in parse_warc_buffer(data))
        except ValueError as ex:
            yield None, f"{type(ex).__name__}: {ex}"
        return
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            member = d.decompress(data[pos:])
        except zlib.error as ex:
            yield None, f"zlib.error: {ex}"
            nxt = data.find(b"\x1f\x8b\x08", pos + 2)
            if nxt < 0:
                return
            pos = nxt
            continue
        try:
            yield from ((r, None) for r in parse_warc_buffer(member))
        except ValueError as ex:
            yield None, f"{type(ex).__name__}: {ex}"
        tail = d.unused_data
        if not tail:
            return
        pos = n - len(tail)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

WARC_RECORD_SCHEMA = (
    "warc_file string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, "
    "payload binary, text string, error string"
)


def warc_records_df(spark, path: str):
    """One typed row per WARC record under `path` (*.warc.gz). binaryFile
    scan (one task per shard, no shuffle) → one mapInArrow stage that
    splits gzip members, parses records, parses/dechunks the captured HTTP
    response, and decodes textual bodies. Non-response records keep
    payload/status null; corrupt members become error-envelope rows."""
    import pyarrow as pa

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )

    def gen(batches):
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content")
            cols = {k: [] for k in (
                "warc_file", "record_idx", "warc_type", "target_uri",
                "warc_date", "http_status", "content_type", "payload",
                "text", "error",
            )}
            for i, p in enumerate(paths):
                data = contents[i].as_py()
                for idx, (rec, err) in enumerate(parse_warc_file(data)):
                    cols["warc_file"].append(p)
                    cols["record_idx"].append(idx)
                    if err is not None:
                        for k in ("warc_type", "target_uri", "warc_date",
                                  "http_status", "content_type", "payload",
                                  "text"):
                            cols[k].append(None)
                        cols["error"].append(err)
                        continue
                    cols["warc_type"].append(rec["warc_type"])
                    cols["target_uri"].append(rec["target_uri"])
                    cols["warc_date"].append(rec["warc_date"])
                    wct = rec["warc_content_type"] or ""
                    if "msgtype=response" in wct.replace(" ", ""):
                        status, ctype, body = _parse_http(rec["block"])
                        cols["http_status"].append(status)
                        cols["content_type"].append(ctype)
                        cols["payload"].append(body)
                        is_text = ctype is not None and (
                            ctype.startswith("text/")
                            or "json" in ctype
                            or "xml" in ctype
                        )
                        cols["text"].append(
                            _decode_text(body, ctype) if is_text else None
                        )
                    else:
                        cols["http_status"].append(None)
                        cols["content_type"].append(rec["warc_content_type"])
                        cols["payload"].append(rec["block"])
                        cols["text"].append(None)
                    cols["error"].append(None)
            yield pa.RecordBatch.from_pydict(
                {
                    "warc_file": pa.array(cols["warc_file"], pa.string()),
                    "record_idx": pa.array(cols["record_idx"], pa.int32()),
                    "warc_type": pa.array(cols["warc_type"], pa.string()),
                    "target_uri": pa.array(cols["target_uri"], pa.string()),
                    "warc_date": pa.array(cols["warc_date"], pa.string()),
                    "http_status": pa.array(cols["http_status"], pa.int32()),
                    "content_type": pa.array(cols["content_type"], pa.string()),
                    "payload": pa.array(cols["payload"], pa.binary()),
                    "text": pa.array(cols["text"], pa.string()),
                    "error": pa.array(cols["error"], pa.string()),
                }
            )

    return raw.mapInArrow(gen, schema=WARC_RECORD_SCHEMA)


def warc_html_docs(records):
    """Successful text/html responses as an interleaved-spans documents
    frame (doc_id = WARC-Target-URI, one html span) — the north-rule input
    shape, so the records feed the SAME extract_documents pipeline as the
    spans table. Pure codegen'd filter/projection, no Python."""
    from pyspark.sql import functions as F

    span = F.struct(
        F.lit("html").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return (
        records.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
            & F.col("error").isNull()
            & F.col("text").isNotNull()
        )
        .select(F.col("target_uri").alias("doc_id"), F.array(span).alias("spans"))
    )


def warc_document_texts(records):
    """Successful NON-html responses routed through the office/ebook/markup
    sniffing extractor (operators/doc_formats): DOCX/EPUB/ODT/RTF/LaTeX
    payloads in a crawl become text rows keyed by target URI; anything the
    sniffer rejects degrades to a per-asset error row. The content-type
    header is only trusted to EXCLUDE text/html (that path belongs to the
    boilerplate extractor) — crawls mislabel office payloads routinely, so
    routing is by payload magic, not by header. Codegen'd filter + the ONE
    Arrow extraction stage; no shuffle."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.doc_formats import document_text

    assets = records.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("error").isNull()
        & F.col("payload").isNotNull()
        & (
            F.col("content_type").isNull()
            | ~F.col("content_type").startswith("text/html")
        )
    ).select(F.col("target_uri").alias("media_ref"), F.col("payload").alias("content"))
    return document_text(assets)


def warc_extract(spark, path: str, rules=None):
    """End-to-end: WARC shards → records → html docs → the real
    extract_documents pipeline (dispatch Arrow stage + postprocess).
    Returns the standard extraction frame keyed by target URI. Non-HTML
    document payloads (office/ebook/markup) are the `warc_document_texts`
    surface over the same records frame."""
    from ocr_spark.pipeline import extract_documents

    docs = warc_html_docs(warc_records_df(spark, path))
    return extract_documents(docs, rules=rules or [])
