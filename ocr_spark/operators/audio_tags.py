"""Audio provenance tags — the audio analogue of the image EXIF layer
(`operators/exif.py`): a speech/music crawl carries embedded metadata
(title, artist, album, date, genre, language) that curation needs for
dataset cards, language routing and duplicate collapsing (same
title+artist+album across re-encodes is the cheapest audio near-dup
signal, exactly as canonical URLs are for pages).

Four tag systems cover the containers this repo decodes or probes, all
from their public specs:

  * ID3v2.2/2.3/2.4 (id3.org) — the MP3 header block `mp3_probe` only
    SKIPS today: syncsafe sizes, global unsynchronisation, per-version
    frame layouts, the four text encodings (latin-1, utf-16 w/BOM,
    utf-16be, utf-8);
  * Vorbis comments (xiph.org) — FLAC METADATA_BLOCK type 4, Ogg Vorbis
    packet "\\x03vorbis", Ogg Opus packet "OpusTags", one shared
    length-prefixed KEY=value parser;
  * RIFF LIST/INFO chunks — WAV sidecar tags (INAM/IART/...).

`audio_tags_parse(content)` sniffs the container and returns the
canonical dict; `audio_tags(assets)` is the Arrow-batched Spark surface
with per-asset error envelopes (the multimodal.py convention). Tag-free
assets yield the all-None row — absence is data, not an error. Fixture
writers (`synth_id3v2`, `add_flac_tags`, `synth_ogg_tagged`,
`add_wav_info`) build real tag blocks so every path round-trips with
zero third-party media, the repo-wide convention.

Corrupt-input hardening follows media_probe.py: sizes are sanity-capped
BEFORE any dependent read, every slice is bounds-checked, and failures
raise ValueError for the envelope to catch.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_TAG_BYTES = 1 << 22  # 4 MiB: real tag blocks are KBs; covers cover-art

_FIELDS = ("title", "artist", "album", "date", "genre", "track", "language")
_NO_TAGS = dict.fromkeys(_FIELDS)

# ---------------------------------------------------------------------------
# ID3v2
# ---------------------------------------------------------------------------

# frame id -> canonical field, per version family (v2.2 uses 3-char ids)
_ID3_V23_MAP = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album", "TCON": "genre",
    "TRCK": "track", "TLAN": "language", "TDRC": "date", "TYER": "date",
}
_ID3_V22_MAP = {
    "TT2": "title", "TP1": "artist", "TAL": "album", "TCO": "genre",
    "TRK": "track", "TLA": "language", "TYE": "date",
}

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("ID3 syncsafe byte has high bit set")
    out = 0
    for x in b:
        out = (out << 7) | x
    return out


def _id3_text(data: bytes) -> str | None:
    """Decode one ID3 text-frame body: encoding byte + string(s); multiple
    NUL-separated values join with '/'."""
    if not data:
        return None
    enc = _ID3_ENCODINGS.get(data[0])
    if enc is None:
        raise ValueError(f"ID3 unknown text encoding {data[0]}")
    nul = b"\x00\x00" if enc.startswith("utf-16") else b"\x00"
    body = data[1:]
    parts = []
    for chunk in body.split(nul):
        if not chunk:
            continue
        parts.append(chunk.decode(enc, "replace").strip("\x00"))
    text = "/".join(p for p in parts if p)
    return text or None


def id3v2_tags(content: bytes) -> dict | None:
    """Canonical tag dict from a leading ID3v2 block, or None when the
    payload has no ID3v2 header. Handles v2.2/2.3/2.4 frame layouts and
    the global unsynchronisation flag (FF 00 -> FF)."""
    if content[:3] != b"ID3" or len(content) < 10:
        return None
    major, flags = content[3], content[5]
    size = _syncsafe(content[6:10])
    if size > MAX_TAG_BYTES:
        raise ValueError(f"ID3 tag size {size} exceeds sanity cap")
    body = bytes(content[10 : 10 + size])
    if len(body) < size:
        raise ValueError("ID3 tag truncated")
    if flags & 0x80:  # global unsynchronisation
        body = body.replace(b"\xff\x00", b"\xff")
    if flags & 0x40 and major >= 3:  # extended header: skip it
        if major == 4:
            eh = _syncsafe(body[:4])
        else:
            eh = struct.unpack(">I", body[:4])[0] + 4
        body = body[eh:]

    out = dict(_NO_TAGS)
    pos = 0
    if major == 2:
        id_len, mapping = 3, _ID3_V22_MAP
        while pos + 6 <= len(body):
            fid = body[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break  # padding
            fsz = int.from_bytes(body[pos + 3 : pos + 6], "big")
            frame = body[pos + 6 : pos + 6 + fsz]
            if len(frame) < fsz:
                raise ValueError("ID3v2.2 frame truncated")
            key = mapping.get(fid.decode("latin-1"))
            if key and out[key] is None:
                out[key] = _id3_text(frame)
            pos += 6 + fsz
        return out
    if major not in (3, 4):
        raise ValueError(f"ID3v2.{major} unsupported")
    while pos + 10 <= len(body):
        fid = body[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_sz = body[pos + 4 : pos + 8]
        fsz = _syncsafe(raw_sz) if major == 4 else struct.unpack(">I", raw_sz)[0]
        fflags = struct.unpack(">H", body[pos + 8 : pos + 10])[0]
        frame = body[pos + 10 : pos + 10 + fsz]
        if len(frame) < fsz:
            raise ValueError("ID3 frame truncated")
        if major == 4 and fflags & 0x02:  # per-frame unsynchronisation
            frame = frame.replace(b"\xff\x00", b"\xff")
        key = _ID3_V23_MAP.get(fid.decode("latin-1"))
        if key and out[key] is None and not fflags & 0x0C:  # skip compressed/encrypted
            out[key] = _id3_text(frame)
        pos += 10 + fsz
    return out


# ---------------------------------------------------------------------------
# Vorbis comments (FLAC / Ogg Vorbis / Ogg Opus)
# ---------------------------------------------------------------------------

_VORBIS_MAP = {
    "title": "title", "artist": "artist", "album": "album", "date": "date",
    "genre": "genre", "tracknumber": "track", "language": "language",
}


def vorbis_comment_parse(data: bytes) -> dict:
    """Length-prefixed KEY=value list (Vorbis I §5) -> canonical dict."""
    if len(data) < 8:
        raise ValueError("vorbis comment truncated")
    (vlen,) = struct.unpack_from("<I", data, 0)
    pos = 4 + vlen
    if pos + 4 > len(data):
        raise ValueError("vorbis comment vendor overruns")
    (count,) = struct.unpack_from("<I", data, pos)
    if count > 4096:
        raise ValueError(f"vorbis comment count {count} exceeds sanity cap")
    pos += 4
    out = dict(_NO_TAGS)
    for _ in range(count):
        if pos + 4 > len(data):
            raise ValueError("vorbis comment entry truncated")
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if ln > MAX_TAG_BYTES or pos + ln > len(data):
            raise ValueError("vorbis comment entry overruns")
        entry = data[pos : pos + ln].decode("utf-8", "replace")
        pos += ln
        k, sep, v = entry.partition("=")
        key = _VORBIS_MAP.get(k.lower()) if sep else None
        if key and v and out[key] is None:
            out[key] = v
    return out


def flac_tags(content: bytes) -> dict:
    """Walk fLaC metadata blocks for VORBIS_COMMENT (type 4)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos, n = 4, len(content)
    while pos + 4 <= n:
        hdr = content[pos]
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        if pos + 4 + size > n:
            raise ValueError("FLAC metadata truncated")
        if hdr & 0x7F == 4:
            return vorbis_comment_parse(content[pos + 4 : pos + 4 + size])
        pos += 4 + size
        if hdr & 0x80:
            break  # last block
    return dict(_NO_TAGS)


def _ogg_packets(content: bytes, max_pages: int = 8) -> Iterator[bytes]:
    """Reassemble the first packets of an Ogg stream from page lacing
    (a segment < 255 ends a packet; 255 continues into the next)."""
    pos, n = 0, len(content)
    packet = bytearray()
    for _ in range(max_pages):
        if pos + 27 > n or content[pos : pos + 4] != b"OggS":
            return
        nsegs = content[pos + 26]
        seg_table = content[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise ValueError("Ogg segment table truncated")
        body = pos + 27 + nsegs
        for seg in seg_table:
            if body + seg > n:
                raise ValueError("Ogg page body truncated")
            packet += content[body : body + seg]
            body += seg
            if seg < 255:
                yield bytes(packet)
                packet = bytearray()
        pos = body


def ogg_tags(content: bytes) -> dict:
    """Comment packet from an Ogg stream: '\\x03vorbis' (Vorbis I) or
    'OpusTags' (RFC 7845) — both wrap the same Vorbis-comment body."""
    for pkt in _ogg_packets(content):
        if pkt.startswith(b"\x03vorbis"):
            return vorbis_comment_parse(pkt[7:])
        if pkt.startswith(b"OpusTags"):
            return vorbis_comment_parse(pkt[8:])
    return dict(_NO_TAGS)


# ---------------------------------------------------------------------------
# RIFF LIST/INFO (WAV)
# ---------------------------------------------------------------------------

_INFO_MAP = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album", b"ICRD": "date",
    b"IGNR": "genre", b"ITRK": "track", b"ILNG": "language",
}


def wav_info_tags(content: bytes) -> dict:
    """INFO tags from a WAV's LIST chunk (strings are NUL-padded ASCII/
    UTF-8 by convention)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    out = dict(_NO_TAGS)
    pos, n = 12, len(content)
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", content, pos + 4)
        end = pos + 8 + ln
        if end > n:
            raise ValueError("WAV chunk overruns")
        if cid == b"LIST" and content[pos + 8 : pos + 12] == b"INFO":
            sub, send = pos + 12, end
            while sub + 8 <= send:
                sid = content[sub : sub + 4]
                (sln,) = struct.unpack_from("<I", content, sub + 4)
                sdata_end = sub + 8 + sln
                if sdata_end > send:
                    raise ValueError("WAV INFO sub-chunk overruns")
                key = _INFO_MAP.get(sid)
                if key and out[key] is None:
                    val = (
                        content[sub + 8 : sdata_end]
                        .split(b"\x00", 1)[0]
                        .decode("utf-8", "replace")
                    )
                    if val:
                        out[key] = val
                sub = sdata_end + (sln & 1)
        pos = end + (ln & 1)
    return out


# ---------------------------------------------------------------------------
# dispatch + Spark surface
# ---------------------------------------------------------------------------


def audio_tags_parse(content: bytes) -> dict:
    """Canonical provenance tags from any supported audio payload. Tag-free
    payloads yield the all-None dict — absence is data, not an error."""
    if content[:3] == b"ID3" or content[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2", b"\xff\xfa"):
        return id3v2_tags(content) or dict(_NO_TAGS)
    if content[:4] == b"fLaC":
        return flac_tags(content)
    if content[:4] == b"OggS":
        return ogg_tags(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return wav_info_tags(content)
    raise ValueError("unrecognized audio container")


AUDIO_TAGS_SCHEMA = T.StructType(
    [T.StructField("media_ref", T.StringType(), False)]
    + [T.StructField(f, T.StringType(), True) for f in _FIELDS]
    + [T.StructField("error", T.StringType(), True)]
)


def audio_tags(assets: DataFrame) -> DataFrame:
    """(media_ref, content, ...) -> AUDIO_TAGS_SCHEMA: one provenance row
    per asset, ONE Arrow stage, no shuffle, per-asset error envelope. At
    crawl scale this feeds dataset cards, language routing
    (`temperature_sample` on the language field) and metadata-level
    duplicate collapsing before any content hash runs."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_TAGS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = dict.fromkeys(cols)
                row["media_ref"] = ref
                try:
                    row.update(audio_tags_parse(bytes(content)))
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(gen, schema=AUDIO_TAGS_SCHEMA)


# ---------------------------------------------------------------------------
# fixture writers — real tag blocks, round-trip-testable in-repo
# ---------------------------------------------------------------------------


def synth_id3v2(tags: dict, version: int = 4, encoding: int = 3, unsync: bool = False) -> bytes:
    """A real ID3v2.{2,3,4} block from a canonical dict (inverse of the
    maps above). `encoding` is the ID3 text-encoding byte."""
    enc_name = _ID3_ENCODINGS[encoding]
    rev = {v: k for k, v in (_ID3_V22_MAP if version == 2 else _ID3_V23_MAP).items()}
    if version != 2:
        rev["date"] = "TDRC" if version == 4 else "TYER"
    frames = bytearray()
    for field, value in tags.items():
        if value is None:
            continue
        fid = rev[field].encode("latin-1")
        body = bytes([encoding]) + value.encode(enc_name)
        if version == 2:
            frames += fid + len(body).to_bytes(3, "big") + body
        else:
            if version == 4:
                sz = bytes((len(body) >> s) & 0x7F for s in (21, 14, 7, 0))
            else:
                sz = struct.pack(">I", len(body))
            frames += fid + sz + b"\x00\x00" + body
    body = bytes(frames)
    flags = 0
    if unsync:
        body = body.replace(b"\xff", b"\xff\x00")
        flags |= 0x80
    size = bytes(((len(body)) >> s) & 0x7F for s in (21, 14, 7, 0))
    return b"ID3" + bytes([version, 0, flags]) + size + body


def _vorbis_comment_block(tags: dict, vendor: bytes = b"ocr_spark") -> bytes:
    entries = [
        f"{k.upper() if k != 'track' else 'TRACKNUMBER'}={v}".encode()
        for k, v in tags.items()
        if v is not None
    ]
    out = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", len(entries))
    for e in entries:
        out += struct.pack("<I", len(e)) + e
    return out


def add_flac_tags(flac: bytes, tags: dict) -> bytes:
    """Insert a VORBIS_COMMENT block after STREAMINFO (whose last-block
    flag moves to the inserted block if it was set)."""
    if flac[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    hdr = flac[4]
    size = int.from_bytes(flac[5:8], "big")
    si_end = 8 + size
    was_last = hdr & 0x80
    body = _vorbis_comment_block(tags)
    block = bytes([(0x80 if was_last else 0) | 4]) + len(body).to_bytes(3, "big") + body
    patched_si = bytes([hdr & 0x7F]) + flac[5:si_end]
    return flac[:4] + patched_si + block + flac[si_end:]


def synth_ogg_tagged(tags: dict, codec: str = "vorbis", **kw) -> bytes:
    """synth_ogg plus a comment page between BOS and the data page."""
    from ocr_spark.operators.media_probe import _ogg_page, synth_ogg

    base = synth_ogg(codec=codec, **kw)
    # split the two synth_ogg pages: second page starts at the second OggS
    second = base.index(b"OggS", 4)
    serial = struct.unpack_from("<I", base, 14)[0]
    body = _vorbis_comment_block(tags)
    pkt = (b"\x03vorbis" if codec == "vorbis" else b"OpusTags") + body
    comment_page = _ogg_page(pkt, serial, 1, 0, 0x00)
    # renumber the data page to seq 2 (recompute its CRC)
    data_page = bytearray(base[second:])
    struct.pack_into("<I", data_page, 18, 2)
    data_page[22:26] = b"\x00\x00\x00\x00"
    from ocr_spark.operators.media_probe import ogg_crc

    struct.pack_into("<I", data_page, 22, ogg_crc(bytes(data_page)))
    return base[:second] + comment_page + bytes(data_page)


def add_wav_info(wav: bytes, tags: dict) -> bytes:
    """Append a LIST/INFO chunk to a WAV and rewrite the RIFF size."""
    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rev = {v: k for k, v in _INFO_MAP.items()}
    sub = bytearray()
    for field, value in tags.items():
        if value is None:
            continue
        data = value.encode("utf-8") + b"\x00"
        sub += rev[field] + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            sub += b"\x00"
    body = b"INFO" + bytes(sub)
    out = bytearray(wav)
    out += b"LIST" + struct.pack("<I", len(body)) + body
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)
