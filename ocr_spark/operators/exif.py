"""EXIF metadata extraction + PII strip for image corpora.

A web image crawl carries EXIF blocks (TIFF 6.0 IFD trees embedded in a
JPEG APP1 segment, or native in TIFF files) holding capture metadata a
curation pipeline needs on both sides of the ledger:

  * KEEP for curation: orientation (pixels need rotating before any
    vision model sees them), capture timestamps, camera make/model
    (dataset-card provenance stats);
  * DROP for privacy: GPS coordinates are location PII — publishing a
    scraped photo corpus with intact GPS tags leaks home addresses. The
    standard remedy (what Common Crawl-derived image sets do) is to strip
    the metadata segments entirely while leaving the coded pixels
    byte-identical.

`exif_parse` reads the tags curation uses; `exif_strip` removes ALL
metadata segments (EXIF + XMP APP1, IPTC APP13) from a JPEG without
recoding — pixels stay bit-identical, verified by decode equality in
tests. `exif_build` writes a real EXIF block so round-trips are testable
with zero third-party media (the repo-wide fixture convention).

Spark surfaces are Arrow-batched mapInPandas with per-asset error
envelopes (the multimodal.py convention): `image_exif` emits one metadata
row per asset, `strip_exif_pii` rewrites payloads and accounts for every
byte it removed.

Reference anchor: the reference app loads images via PIL, which silently
applies/ignores EXIF (ocr_workflow_orchestrator.py:153-178); corpus-scale
curation must surface and scrub it explicitly instead.

Structure notes (TIFF 6.0 / EXIF 2.3, public specs): a TIFF block is a
byte-order header ("II"/"MM" + magic 42 + IFD0 offset), then linked IFDs
— each a u16 entry count, 12-byte entries (tag, type, count,
value-or-offset; values <= 4 bytes are inline), u32 next-IFD pointer.
EXIF hangs two private IFDs off IFD0: tag 0x8769 (Exif) and 0x8825 (GPS).
All offsets are relative to the TIFF header start. Corrupt-input
hardening follows media_probe.py: counts are sanity-capped BEFORE sizing
any read, every slice is bounds-checked, and all failures raise
ValueError so the Spark stage's envelope catches them.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_IFD_ENTRIES = 512  # sanity cap: real EXIF IFDs hold dozens of entries

# type code -> element byte width (TIFF 6.0 §2)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# tags read from IFD0 / Exif IFD / GPS IFD
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_SOFTWARE = 0x0131
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


def _read_ifd(data: bytes, off: int, bo: str) -> tuple[dict[int, tuple], int]:
    """One IFD at `off` -> ({tag: (type, count, value_field_offset)}, next).
    Bounds-checked; entry count capped before any dependent read."""
    if off + 2 > len(data):
        raise ValueError("EXIF IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", data, off)
    if n > MAX_IFD_ENTRIES:
        raise ValueError(f"EXIF IFD entry count {n} exceeds sanity cap")
    end = off + 2 + 12 * n
    if end + 4 > len(data):
        raise ValueError("EXIF IFD truncated")
    entries: dict[int, tuple] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        entries[tag] = (typ, cnt, e + 8)
    (nxt,) = struct.unpack_from(bo + "I", data, end)
    return entries, nxt


def _value_bytes(data: bytes, bo: str, typ: int, cnt: int, field_off: int) -> bytes:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"EXIF unknown type {typ}")
    total = size * cnt
    if total > 1 << 20:
        raise ValueError("EXIF value size exceeds sanity cap")
    if total <= 4:
        return data[field_off : field_off + total]
    (off,) = struct.unpack_from(bo + "I", data, field_off)
    if off + total > len(data):
        raise ValueError("EXIF value offset out of range")
    return data[off : off + total]


def _ascii(data: bytes, bo: str, ent: tuple) -> str | None:
    raw = _value_bytes(data, bo, *ent)
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace") or None


def _u16(data: bytes, bo: str, ent: tuple) -> int:
    raw = _value_bytes(data, bo, *ent)
    if len(raw) < 2:
        raise ValueError("EXIF SHORT value truncated")
    return struct.unpack(bo + "H", raw[:2])[0]


def _u32ptr(data: bytes, bo: str, ent: tuple) -> int:
    raw = _value_bytes(data, bo, *ent)
    if len(raw) < 4:
        raise ValueError("EXIF LONG value truncated")
    return struct.unpack(bo + "I", raw[:4])[0]


def _rationals(data: bytes, bo: str, ent: tuple) -> list[float]:
    raw = _value_bytes(data, bo, *ent)
    out = []
    for i in range(0, len(raw) - 7, 8):
        num, den = struct.unpack_from(bo + "II", raw, i)
        out.append(num / den if den else 0.0)
    return out


def _gps_degrees(dms: list[float], ref: str | None) -> float | None:
    if len(dms) < 3 or ref is None:
        return None
    deg = dms[0] + dms[1] / 60.0 + dms[2] / 3600.0
    return -deg if ref.upper() in ("S", "W") else deg


_NO_EXIF = {
    "orientation": None,
    "make": None,
    "model": None,
    "software": None,
    "datetime": None,
    "datetime_original": None,
    "gps_lat": None,
    "gps_lon": None,
}


def tiff_exif_parse(data: bytes) -> dict:
    """Parse a TIFF block (the APP1 payload after 'Exif\\0\\0', or a bare
    .tif file) into the curation tag dict. Unknown tags are skipped."""
    if len(data) < 8:
        raise ValueError("EXIF TIFF header truncated")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("EXIF TIFF byte-order marker missing")
    if struct.unpack_from(bo + "H", data, 2)[0] != 42:
        raise ValueError("EXIF TIFF magic != 42")
    (ifd0_off,) = struct.unpack_from(bo + "I", data, 4)
    ifd0, _ = _read_ifd(data, ifd0_off, bo)

    out: dict = dict(_NO_EXIF)
    if _TAG_ORIENTATION in ifd0:
        out["orientation"] = _u16(data, bo, ifd0[_TAG_ORIENTATION])
    for tag, key in (
        (_TAG_MAKE, "make"),
        (_TAG_MODEL, "model"),
        (_TAG_SOFTWARE, "software"),
        (_TAG_DATETIME, "datetime"),
    ):
        if tag in ifd0:
            out[key] = _ascii(data, bo, ifd0[tag])
    if _TAG_EXIF_IFD in ifd0:
        exif_ifd, _ = _read_ifd(data, _u32ptr(data, bo, ifd0[_TAG_EXIF_IFD]), bo)
        if _TAG_DT_ORIGINAL in exif_ifd:
            out["datetime_original"] = _ascii(data, bo, exif_ifd[_TAG_DT_ORIGINAL])
    if _TAG_GPS_IFD in ifd0:
        gps, _ = _read_ifd(data, _u32ptr(data, bo, ifd0[_TAG_GPS_IFD]), bo)
        lat_ref = _ascii(data, bo, gps[_GPS_LAT_REF]) if _GPS_LAT_REF in gps else None
        lon_ref = _ascii(data, bo, gps[_GPS_LON_REF]) if _GPS_LON_REF in gps else None
        if _GPS_LAT in gps:
            out["gps_lat"] = _gps_degrees(_rationals(data, bo, gps[_GPS_LAT]), lat_ref)
        if _GPS_LON in gps:
            out["gps_lon"] = _gps_degrees(_rationals(data, bo, gps[_GPS_LON]), lon_ref)
    return out


# ---------------------------------------------------------------------------
# JPEG segment walk (shared by parse + strip)
# ---------------------------------------------------------------------------

_STANDALONE = frozenset([0xD8, 0xD9, 0x01]) | frozenset(range(0xD0, 0xD8))


def _jpeg_segments(data: bytes) -> Iterator[tuple[int, int, int]]:
    """Yield (marker, start, end) for each segment before SOS; the caller
    handles the entropy tail. start/end span the whole segment including
    the FF-marker bytes. Legal 0xFF fill bytes before a marker (ISO
    10918-1 B.1.1.2) are skipped; callers that rewrite must copy the gaps
    between yielded spans verbatim."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    yield 0xD8, 0, 2
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 2 <= n and data[pos + 1] == 0xFF:
            pos += 1  # fill byte run: FF FF ... FF <marker>
        if pos + 2 > n:
            return
        marker = data[pos + 1]
        if marker in _STANDALONE:
            yield marker, pos, pos + 2
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("JPEG segment header truncated")
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > n:
            raise ValueError("JPEG segment length out of range")
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln
        if marker == 0xDA:  # SOS: entropy data follows, stop walking
            return


# ---------------------------------------------------------------------------
# PNG / WebP chunk walks — both containers carry EXIF in a dedicated chunk
# (PNG eXIf holds a bare TIFF block; WebP EXIF holds a TIFF block with an
# optional "Exif\0\0" prefix), removable chunk-granular without recoding.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(raw: bytes) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, start, end) spans covering each chunk (length + type +
    data + crc). Bounds-checked; stops at IEND."""
    pos, n = 8, len(raw)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", raw, pos)
        typ = raw[pos + 4 : pos + 8]
        end = pos + 12 + ln
        if ln > n or end > n:
            raise ValueError("PNG chunk length out of range")
        yield typ, pos, end
        pos = end
        if typ == b"IEND":
            return
    raise ValueError("PNG truncated (no IEND chunk)")


def _webp_chunks(raw: bytes) -> Iterator[tuple[bytes, int, int, int]]:
    """Yield (fourcc, start, data_end, padded_end) for each RIFF chunk."""
    pos, n = 12, len(raw)
    while pos + 8 <= n:
        fourcc = raw[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", raw, pos + 4)
        data_end = pos + 8 + ln
        end = data_end + (ln & 1)
        if data_end > n:
            raise ValueError("WebP chunk length out of range")
        yield fourcc, pos, data_end, min(end, n)
        pos = end


def exif_parse(content: bytes) -> dict:
    """EXIF tags from a JPEG (APP1 walk), bare TIFF, PNG (eXIf chunk) or
    WebP (EXIF chunk). Formats that cannot carry EXIF (GIF, BMP) and
    EXIF-free files yield the all-None dict — absence is data, not an
    error; only corrupt/unrecognized payloads raise ValueError."""
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return tiff_exif_parse(content)
    if content[:2] == b"\xff\xd8":
        for marker, s, e in _jpeg_segments(content):
            if marker == 0xE1 and content[s + 4 : s + 10] == b"Exif\x00\x00":
                return tiff_exif_parse(content[s + 10 : e])
        return dict(_NO_EXIF)
    if content[:8] == _PNG_SIG:
        for typ, s, e in _png_chunks(content):
            if typ == b"eXIf":
                return tiff_exif_parse(content[s + 8 : e - 4])
        return dict(_NO_EXIF)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        for cc, s, de, _e in _webp_chunks(content):
            if cc == b"EXIF":
                blk = content[s + 8 : de]
                if blk.startswith(b"Exif\x00\x00"):
                    blk = blk[6:]
                return tiff_exif_parse(blk)
        return dict(_NO_EXIF)
    if content[:6] in (b"GIF87a", b"GIF89a") or content[:2] == b"BM":
        return dict(_NO_EXIF)  # no EXIF slot in these containers
    raise ValueError("unrecognized image container")


# APP1 namespaces to strip: standard XMP AND ExtendedXMP (the >64KB
# overflow packets phone cameras write — they can carry exif:GPS* too)
_XMP_PREFIXES = (
    b"http://ns.adobe.com/xap/1.0/",
    b"http://ns.adobe.com/xmp/extension/",
)


def exif_strip(content: bytes) -> tuple[bytes, int]:
    """Remove metadata segments from a JPEG — EXIF APP1, XMP/ExtendedXMP
    APP1, IPTC/Photoshop APP13 — copying every other byte verbatim (no
    recode; the entropy-coded pixels are untouched). Returns
    (stripped, n_removed)."""
    out = bytearray()
    removed = 0
    last_end = 0
    for marker, s, e in _jpeg_segments(content):
        out += content[last_end:s]  # fill bytes between segments, verbatim
        body = content[s + 4 : e]
        drop = (
            marker == 0xE1
            and (body.startswith(b"Exif\x00\x00") or body.startswith(_XMP_PREFIXES))
        ) or marker == 0xED
        if drop:
            removed += e - s
        else:
            out += content[s:e]
        last_end = e
    out += content[last_end:]  # entropy data + EOI verbatim
    return bytes(out), removed


def _png_strip(raw: bytes) -> tuple[bytes, int]:
    """Remove eXIf chunks from a PNG, chunk-granular (pixels untouched)."""
    out = bytearray()
    removed = 0
    last_end = 8
    for typ, s, e in _png_chunks(raw):
        out += raw[last_end:s]
        if typ == b"eXIf":
            removed += e - s
        else:
            out += raw[s:e]
        last_end = e
    if not removed:
        return raw, 0
    return _PNG_SIG + bytes(out) + raw[last_end:], removed


def _webp_strip(raw: bytes) -> tuple[bytes, int]:
    """Remove EXIF and XMP chunks from a WebP and clear the matching VP8X
    feature flags (bit 3 EXIF, bit 2 XMP); the RIFF size header is
    rewritten to the new length."""
    out = bytearray(raw[:12])
    removed = 0
    vp8x_flags_at = None
    for cc, s, de, e in _webp_chunks(raw):
        if cc in (b"EXIF", b"XMP "):
            removed += e - s
            continue
        if cc == b"VP8X" and de - s >= 9:
            vp8x_flags_at = len(out) + 8
        out += raw[s:e]
    if not removed:
        return raw, 0
    if vp8x_flags_at is not None:
        out[vp8x_flags_at] &= ~0x0C  # clear EXIF (0x08) + XMP (0x04)
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out), removed


def strip_metadata(content: bytes) -> tuple[bytes, int, str | None]:
    """Format-dispatching metadata strip -> (payload, n_removed,
    skipped_reason). JPEG/PNG/WebP strip losslessly; TIFF is SKIPPED with
    a reason (its metadata tags live in the same IFD tree as the image
    structure — stripping requires a re-encode, and silence here would be
    a false all-clear on GPS-bearing files); GIF/BMP have no EXIF slot
    and pass through clean. Unrecognized payloads raise ValueError."""
    if content[:2] == b"\xff\xd8":
        stripped, removed = exif_strip(content)
        return stripped, removed, None
    if content[:8] == _PNG_SIG:
        stripped, removed = _png_strip(content)
        return stripped, removed, None
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        stripped, removed = _webp_strip(content)
        return stripped, removed, None
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return content, 0, (
            "TIFF metadata tags are structural (same IFD tree as the "
            "image); route through a re-encode to strip"
        )
    if content[:6] in (b"GIF87a", b"GIF89a") or content[:2] == b"BM":
        return content, 0, None
    raise ValueError("unrecognized image container")


# ---------------------------------------------------------------------------
# fixture writer — a real EXIF block, round-trip-testable in-repo
# ---------------------------------------------------------------------------


def _deg_to_dms_rationals(deg: float) -> bytes:
    d = abs(deg)
    whole = int(d)
    minutes = int((d - whole) * 60)
    # seconds as a /100 rational keeps two decimals exactly
    sec_num = round(((d - whole) * 60 - minutes) * 60 * 100)
    return struct.pack("<IIIIII", whole, 1, minutes, 1, sec_num, 100)


def exif_build(
    make: str = "SynthCam",
    model: str = "SC-1",
    orientation: int = 1,
    datetime: str = "2026:01:01 00:00:00",
    datetime_original: str | None = "2026:01:01 00:00:00",
    gps: tuple[float, float] | None = None,
) -> bytes:
    """A little-endian TIFF block holding IFD0 + Exif IFD (+ GPS IFD when
    `gps` is given), spec-conformant: entries ascending by tag, ASCII
    values NUL-terminated, out-of-line values in a trailing data area."""

    def ascii_val(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    # entry rows: (tag, type, count, payload). Pointer tags get patched
    # after the layout is known.
    ifd0_rows = [
        (_TAG_MAKE, 2, ascii_val(make)),
        (_TAG_MODEL, 2, ascii_val(model)),
        (_TAG_ORIENTATION, 3, struct.pack("<H", orientation)),
        (_TAG_DATETIME, 2, ascii_val(datetime)),
        (_TAG_EXIF_IFD, 4, b"\x00\x00\x00\x00"),
    ]
    exif_rows = []
    if datetime_original is not None:
        exif_rows.append((_TAG_DT_ORIGINAL, 2, ascii_val(datetime_original)))
    gps_rows = []
    if gps is not None:
        lat, lon = gps
        ifd0_rows.append((_TAG_GPS_IFD, 4, b"\x00\x00\x00\x00"))
        gps_rows = [
            (_GPS_LAT_REF, 2, ascii_val("N" if lat >= 0 else "S")),
            (_GPS_LAT, 5, _deg_to_dms_rationals(lat)),
            (_GPS_LON_REF, 2, ascii_val("E" if lon >= 0 else "W")),
            (_GPS_LON, 5, _deg_to_dms_rationals(lon)),
        ]
    ifd0_rows.sort()

    def ifd_size(rows: list) -> int:
        return 2 + 12 * len(rows) + 4

    ifd0_off = 8
    exif_off = ifd0_off + ifd_size(ifd0_rows)
    gps_off = exif_off + ifd_size(exif_rows)
    data_off = gps_off + (ifd_size(gps_rows) if gps_rows else 0)

    data_area = bytearray()

    def pack_ifd(rows: list) -> bytes:
        nonlocal data_area
        out = struct.pack("<H", len(rows))
        for tag, typ, payload in rows:
            if tag == _TAG_EXIF_IFD:
                cnt, field = 1, struct.pack("<I", exif_off)
            elif tag == _TAG_GPS_IFD:
                cnt, field = 1, struct.pack("<I", gps_off)
            else:
                cnt = len(payload) // _TYPE_SIZE[typ]
                if len(payload) <= 4:
                    field = payload.ljust(4, b"\x00")
                else:
                    field = struct.pack("<I", data_off + len(data_area))
                    data_area += payload
            out += struct.pack("<HHI", tag, typ, cnt) + field
        return out + b"\x00\x00\x00\x00"  # no next IFD

    blocks = pack_ifd(ifd0_rows) + pack_ifd(exif_rows)
    if gps_rows:
        blocks += pack_ifd(gps_rows)
    return b"II*\x00" + struct.pack("<I", ifd0_off) + blocks + bytes(data_area)


def insert_exif(jpeg: bytes, tiff_block: bytes) -> bytes:
    """Insert an EXIF APP1 segment right after SOI (before any APP0 —
    readers accept either order; first-position matches most cameras)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    payload = b"Exif\x00\x00" + tiff_block
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF block too large for one APP1 segment")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def apply_exif_orientation(img, orientation: int | None):
    """Rotate/flip pixels upright per the TIFF orientation tag (1-8) —
    cameras store sensor-order pixels and record how to display them; a
    vision stage that ignores the tag trains on sideways images. Accepts
    (H,W) or (H,W,C) arrays; values outside 1-8 (or None) pass through.

    Tag semantics (row-0/col-0 placement, TIFF 6.0 §orientation):
      1 top-left (no-op)   2 top-right (mirror H)   3 bottom-right (180°)
      4 bottom-left (mirror V)   5 left-top (transpose)
      6 right-top (rot 90° CW)   7 right-bottom (transverse)
      8 left-bottom (rot 90° CCW)"""
    import numpy as np

    if orientation is None or not 2 <= orientation <= 8:
        return img
    x = np.asarray(img)
    hw_axes = (0, 1)
    if orientation == 2:
        return np.flip(x, axis=1)
    if orientation == 3:
        return np.flip(x, axis=hw_axes)
    if orientation == 4:
        return np.flip(x, axis=0)
    if orientation == 5:
        return np.swapaxes(x, 0, 1)
    if orientation == 6:
        return np.flip(np.swapaxes(x, 0, 1), axis=1)  # 90 CW
    if orientation == 7:
        return np.flip(np.swapaxes(x, 0, 1), axis=hw_axes)
    return np.flip(np.swapaxes(x, 0, 1), axis=0)  # 8: 90 CCW


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------

EXIF_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("software", T.StringType(), True),
        T.StructField("datetime", T.StringType(), True),
        T.StructField("datetime_original", T.StringType(), True),
        T.StructField("gps_lat", T.DoubleType(), True),
        T.StructField("gps_lon", T.DoubleType(), True),
        T.StructField("has_gps", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

STRIP_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes_removed", T.IntegerType(), True),
        T.StructField("had_metadata", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def image_exif(assets: DataFrame) -> DataFrame:
    """(media_ref, content, ...) -> EXIF_SCHEMA: one metadata row per
    asset. No-EXIF assets yield all-null tags with has_gps=False (absence
    is data); parse failures set the error envelope. ONE Arrow stage, no
    shuffle — at crawl scale this is the selector that routes GPS-bearing
    images into strip_exif_pii before anything is published."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EXIF_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = dict.fromkeys(cols)
                row["media_ref"] = ref
                try:
                    tags = exif_parse(bytes(content))
                    row.update(tags)
                    row["has_gps"] = (
                        tags["gps_lat"] is not None and tags["gps_lon"] is not None
                    )
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(gen, schema=EXIF_SCHEMA)


def strip_exif_pii(assets: DataFrame) -> DataFrame:
    """(media_ref, content, ...) -> STRIP_SCHEMA: payloads with every
    metadata segment removed, coded pixels byte-identical — JPEG (EXIF +
    XMP/ExtendedXMP APP1, IPTC APP13), PNG (eXIf chunk), WebP (EXIF/XMP
    chunks + VP8X flag clear). TIFF is NOT silently passed: its tags are
    load-bearing structure, so the row carries error='SkippedFormat: ...'
    and had_metadata=null — never a false all-clear on a GPS-bearing
    file. GIF/BMP (no EXIF slot) pass through clean. Per-asset error
    envelope for corrupt payloads."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in STRIP_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = dict.fromkeys(cols)
                row["media_ref"] = ref
                try:
                    stripped, removed, skipped = strip_metadata(bytes(content))
                    row["content"] = stripped
                    row["n_bytes_removed"] = removed
                    if skipped is not None:
                        row["error"] = f"SkippedFormat: {skipped}"
                    else:
                        row["had_metadata"] = removed > 0
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(gen, schema=STRIP_SCHEMA)
