"""EXIF metadata extraction + PII strip (operators/exif): round-trips
through the in-repo JPEG codec, GPS sign/precision, big-endian TIFF,
segment-strip byte accounting + pixel identity, corrupt-input hardening,
and the two Spark surfaces with error envelopes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.operators.exif import (
    exif_build,
    exif_parse,
    exif_strip,
    insert_exif,
    tiff_exif_parse,
)
from ocr_spark.operators.image_codecs import jpeg_decode, jpeg_encode


@pytest.fixture(scope="module")
def jpeg():
    img = (np.arange(48 * 32).reshape(48, 32) % 251).astype(np.uint8)
    return jpeg_encode(img, quality=90)


class TestRoundTrip:
    def test_all_tags(self, jpeg):
        blk = exif_build(
            make="Maker", model="M-9", orientation=8,
            datetime="2025:06:15 12:00:00",
            datetime_original="2025:06:15 11:59:58",
            gps=(51.5007, -0.1246),
        )
        tags = exif_parse(insert_exif(jpeg, blk))
        assert tags["make"] == "Maker" and tags["model"] == "M-9"
        assert tags["orientation"] == 8
        assert tags["datetime"] == "2025:06:15 12:00:00"
        assert tags["datetime_original"] == "2025:06:15 11:59:58"
        # /100-second rationals: half of 0.01 arcsec = ~1.4e-6 degrees
        assert abs(tags["gps_lat"] - 51.5007) < 2e-6
        assert abs(tags["gps_lon"] + 0.1246) < 2e-6

    def test_gps_sign_quadrants(self, jpeg):
        for lat, lon in [(10.5, 20.25), (-10.5, 20.25), (10.5, -20.25), (-33.9, -70.7)]:
            tags = exif_parse(insert_exif(jpeg, exif_build(gps=(lat, lon))))
            assert abs(tags["gps_lat"] - lat) < 2e-6, (lat, lon)
            assert abs(tags["gps_lon"] - lon) < 2e-6, (lat, lon)

    def test_no_gps_block(self, jpeg):
        tags = exif_parse(insert_exif(jpeg, exif_build(gps=None)))
        assert tags["gps_lat"] is None and tags["gps_lon"] is None
        assert tags["make"] == "SynthCam"

    def test_plain_jpeg_is_all_none(self, jpeg):
        tags = exif_parse(jpeg)
        assert all(v is None for v in tags.values())

    def test_bare_tiff_block_parses(self):
        # the TIFF block itself (a .tif file's header) parses directly
        tags = exif_parse(exif_build(orientation=3))
        assert tags["orientation"] == 3

    def test_big_endian_tiff(self):
        # hand-built MM block: IFD0 with one SHORT orientation entry
        ifd = struct.pack(">H", 1)
        ifd += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 6) + b"\x00\x00"
        ifd += b"\x00\x00\x00\x00"
        blk = b"MM\x00*" + struct.pack(">I", 8) + ifd
        assert tiff_exif_parse(blk)["orientation"] == 6


class TestStrip:
    def test_strip_removes_and_preserves_pixels(self, jpeg):
        jj = insert_exif(jpeg, exif_build(gps=(1.0, 2.0)))
        stripped, removed = exif_strip(jj)
        assert removed == len(jj) - len(stripped) > 0
        assert exif_parse(stripped)["make"] is None
        assert np.array_equal(jpeg_decode(stripped), jpeg_decode(jj))

    def test_strip_idempotent_and_passthrough(self, jpeg):
        jj = insert_exif(jpeg, exif_build())
        once, n1 = exif_strip(jj)
        twice, n2 = exif_strip(once)
        assert n2 == 0 and twice == once
        same, n0 = exif_strip(jpeg)
        assert n0 == 0 and same == jpeg

    def test_strip_xmp_and_app13(self, jpeg):
        xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
        seg_xmp = b"\xff\xe1" + struct.pack(">H", len(xmp) + 2) + xmp
        iptc = b"Photoshop 3.0\x008BIM\x04\x04"
        seg_13 = b"\xff\xed" + struct.pack(">H", len(iptc) + 2) + iptc
        jj = jpeg[:2] + seg_xmp + seg_13 + jpeg[2:]
        stripped, removed = exif_strip(jj)
        assert removed == len(seg_xmp) + len(seg_13)
        assert stripped == jpeg

    def test_non_exif_app1_kept(self, jpeg):
        # an APP1 that is neither Exif nor XMP (rare but legal) survives
        other = b"Other\x00data"
        seg = b"\xff\xe1" + struct.pack(">H", len(other) + 2) + other
        jj = jpeg[:2] + seg + jpeg[2:]
        stripped, removed = exif_strip(jj)
        assert removed == 0 and stripped == jj


class TestHardening:
    def test_entry_count_capped_before_allocation(self):
        blk = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0xFFFF)
        with pytest.raises(ValueError, match="sanity cap"):
            tiff_exif_parse(blk)

    def test_value_offset_out_of_range(self):
        ifd = struct.pack("<H", 1)
        # ASCII count 64 -> out-of-line, offset points past the block
        ifd += struct.pack("<HHI", 0x010F, 2, 64) + struct.pack("<I", 9999)
        ifd += b"\x00\x00\x00\x00"
        blk = b"II*\x00" + struct.pack("<I", 8) + ifd
        with pytest.raises(ValueError, match="out of range"):
            tiff_exif_parse(blk)

    def test_truncated_header_and_bad_magic(self):
        with pytest.raises(ValueError):
            tiff_exif_parse(b"II*")
        with pytest.raises(ValueError, match="magic"):
            tiff_exif_parse(b"II\x2b\x00" + b"\x00" * 8)
        with pytest.raises(ValueError, match="byte-order"):
            tiff_exif_parse(b"XX\x2a\x00" + b"\x00" * 8)

    def test_corrupt_inputs_raise(self):
        with pytest.raises(ValueError, match="unrecognized"):
            exif_parse(b"\x89PNG0000")  # 8-byte PNG sig mismatch
        with pytest.raises(ValueError):
            exif_parse(b"\xff\xd8\x00\x00")  # marker desync
        with pytest.raises(ValueError, match="length"):
            exif_parse(b"\xff\xd8\xff\xe1\x00\x01")
        with pytest.raises(ValueError, match="PNG"):
            exif_parse(b"\x89PNG\r\n\x1a\nrest")  # bogus chunk length

    def test_oversize_exif_block_rejected(self, jpeg):
        with pytest.raises(ValueError, match="too large"):
            insert_exif(jpeg, b"\x00" * 0x10000)


class TestSparkSurfaces:
    def test_image_exif_rows(self, spark, jpeg):
        from ocr_spark.operators.exif import image_exif

        assets = spark.createDataFrame(
            [
                ("gps.jpg", bytearray(insert_exif(jpeg, exif_build(gps=(48.85, 2.35))))),
                ("plain.jpg", bytearray(jpeg)),
                ("bad.jpg", bytearray(b"\xff\xd8garbage")),
            ],
            "media_ref string, content binary",
        )
        out = {r.media_ref: r for r in image_exif(assets).collect()}
        assert out["gps.jpg"].has_gps and abs(out["gps.jpg"].gps_lat - 48.85) < 2e-6
        assert out["gps.jpg"].error is None
        assert out["plain.jpg"].has_gps is False and out["plain.jpg"].error is None
        assert out["bad.jpg"].error is not None

    def test_strip_exif_pii_rows(self, spark, jpeg):
        from ocr_spark.operators.exif import strip_exif_pii

        from ocr_spark.operators.cloud_engine import png_encode

        jj = insert_exif(jpeg, exif_build(gps=(1.0, 1.0)))
        png = png_encode(np.zeros((4, 4), dtype=np.uint8))
        assets = spark.createDataFrame(
            [
                ("meta.jpg", bytearray(jj)),
                ("plain.jpg", bytearray(jpeg)),
                ("img.png", bytearray(png)),
                ("gps.tif", bytearray(exif_build(gps=(2.0, 3.0)))),
                ("trunc.png", bytearray(b"\x89PNG\r\n\x1a\nrest")),
                ("bad.jpg", bytearray(b"\xff\xd8\xff\xe1\x00\x01")),
            ],
            "media_ref string, content binary",
        )
        out = {r.media_ref: r for r in strip_exif_pii(assets).collect()}
        assert out["meta.jpg"].had_metadata
        assert out["meta.jpg"].n_bytes_removed == len(jj) - len(out["meta.jpg"].content)
        assert bytes(out["plain.jpg"].content) == jpeg
        assert not out["plain.jpg"].had_metadata
        # EXIF-free PNG passes through byte-identical, affirmatively clean
        assert bytes(out["img.png"].content) == png
        assert out["img.png"].n_bytes_removed == 0
        assert out["img.png"].had_metadata is False and out["img.png"].error is None
        # TIFF is a SKIP, never a false all-clear on a GPS-bearing file
        assert out["gps.tif"].error.startswith("SkippedFormat")
        assert out["gps.tif"].had_metadata is None
        assert out["trunc.png"].error is not None
        assert out["bad.jpg"].error is not None and out["bad.jpg"].content is None


class TestOrientation:
    """apply_exif_orientation: each tag, applied to the stored pixels,
    must reproduce the upright original — verified by round-tripping the
    INVERSE transform (what a camera does when writing the file)."""

    @staticmethod
    def _store(upright, orientation):
        # inverse of apply: produce the sensor-order pixels a camera would
        # store alongside this orientation tag
        import numpy as np

        inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}[orientation]
        from ocr_spark.operators.exif import apply_exif_orientation

        return apply_exif_orientation(upright, inv)

    @pytest.mark.parametrize("orientation", list(range(1, 9)))
    @pytest.mark.parametrize("channels", [None, 3])
    def test_round_trip_every_tag(self, orientation, channels):
        from ocr_spark.operators.exif import apply_exif_orientation

        rng = np.arange(5 * 7 * (channels or 1), dtype=np.uint8)
        upright = rng.reshape((5, 7) if channels is None else (5, 7, channels))
        stored = self._store(upright, orientation)
        assert np.array_equal(
            apply_exif_orientation(stored, orientation), upright
        ), orientation

    def test_passthrough_values(self):
        from ocr_spark.operators.exif import apply_exif_orientation

        img = np.ones((3, 4), dtype=np.uint8)
        for o in (None, 0, 1, 9, -1):
            assert apply_exif_orientation(img, o) is img or np.array_equal(
                apply_exif_orientation(img, o), img
            )

    def test_tag6_is_90_clockwise(self):
        # concrete anchor: a 2x3 stored image rotated 90 CW becomes 3x2
        # with the first stored column ending up as the last row reversed
        from ocr_spark.operators.exif import apply_exif_orientation

        stored = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
        out = apply_exif_orientation(stored, 6)
        assert out.shape == (3, 2)
        assert out.tolist() == [[4, 1], [5, 2], [6, 3]]


def _webp_with_metadata(exif_tiff: bytes) -> bytes:
    """Wrap a real VP8L payload in an extended (VP8X) WebP container
    carrying EXIF + XMP chunks, flags set per spec."""
    from ocr_spark.operators.webp_codec import webp_encode

    base = webp_encode(
        (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    )
    vp8l = base[12:]  # the VP8L chunk verbatim

    def chunk(cc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return cc + struct.pack("<I", len(data)) + data + pad

    vp8x = chunk(b"VP8X", bytes([0x0C, 0, 0, 0]) + b"\x07\x00\x00\x07\x00\x00")
    exif = chunk(b"EXIF", b"Exif\x00\x00" + exif_tiff)
    xmp = chunk(b"XMP ", b"<x:xmpmeta/>")
    body = b"WEBP" + vp8x + exif + xmp + vp8l
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestPngWebp:
    def test_png_exif_roundtrip_and_strip(self):
        import zlib as _z

        from ocr_spark.operators.cloud_engine import png_encode
        from ocr_spark.operators.exif import strip_metadata

        img = (np.arange(8 * 8).reshape(8, 8) % 251).astype(np.uint8)
        base = png_encode(img)
        blk = exif_build(orientation=5, gps=(12.5, -45.25))
        chunk = struct.pack(">I", len(blk)) + b"eXIf" + blk
        chunk += struct.pack(">I", _z.crc32(b"eXIf" + blk))
        # insert after IHDR (ends at 8 + 25)
        ihdr_end = 8 + 12 + 13
        png = base[:ihdr_end] + chunk + base[ihdr_end:]
        tags = exif_parse(png)
        assert tags["orientation"] == 5
        assert abs(tags["gps_lat"] - 12.5) < 2e-6
        assert abs(tags["gps_lon"] + 45.25) < 2e-6
        stripped, removed, skipped = strip_metadata(png)
        assert skipped is None and removed == len(chunk)
        assert stripped == base
        assert exif_parse(stripped)["orientation"] is None

    def test_png_without_exif_all_none(self):
        from ocr_spark.operators.cloud_engine import png_encode

        base = png_encode(np.zeros((4, 4), dtype=np.uint8))
        assert all(v is None for v in exif_parse(base).values())

    def test_webp_exif_roundtrip_and_strip(self):
        from ocr_spark.operators.exif import strip_metadata
        from ocr_spark.operators.webp_codec import webp_decode

        w = _webp_with_metadata(exif_build(orientation=6, gps=(-5.0, 100.5)))
        tags = exif_parse(w)
        assert tags["orientation"] == 6
        assert abs(tags["gps_lat"] + 5.0) < 2e-6
        stripped, removed, skipped = strip_metadata(w)
        assert skipped is None and removed > 0
        assert len(stripped) == len(w) - removed
        # RIFF size header rewritten, VP8X EXIF/XMP flags cleared
        assert struct.unpack_from("<I", stripped, 4)[0] == len(stripped) - 8
        assert stripped[20] & 0x0C == 0
        assert all(v is None for v in exif_parse(stripped).values())
        # pixels still decode (container remains valid)
        assert webp_decode(stripped).shape[:2] == (8, 8)

    def test_tiff_strip_is_skipped_not_all_clear(self):
        from ocr_spark.operators.exif import strip_metadata

        blk = exif_build(gps=(1.0, 2.0))
        out, removed, skipped = strip_metadata(blk)
        assert out == blk and removed == 0
        assert skipped is not None and "re-encode" in skipped

    def test_gif_bmp_pass_clean(self):
        from ocr_spark.operators.exif import strip_metadata

        for payload in (b"GIF89a\x01\x00\x01\x00", b"BM\x1e\x00\x00\x00"):
            assert all(v is None for v in exif_parse(payload).values())
            out, removed, skipped = strip_metadata(payload)
            assert out == payload and removed == 0 and skipped is None


class TestFillBytesAndExtendedXmp:
    def test_fill_bytes_between_segments(self, jpeg):
        # legal FF padding before a marker (ISO 10918-1 B.1.1.2)
        padded = jpeg[:2] + b"\xff\xff\xff" + jpeg[2:]
        assert exif_parse(padded) == exif_parse(jpeg)
        stripped, removed = exif_strip(padded)
        assert removed == 0 and stripped == padded  # fills preserved

    def test_fill_bytes_with_exif(self, jpeg):
        jj = insert_exif(jpeg, exif_build(gps=(3.0, 4.0)))
        padded = jj[:2] + b"\xff\xff" + jj[2:]
        assert exif_parse(padded)["gps_lat"] is not None
        stripped, removed = exif_strip(padded)
        assert exif_parse(stripped)["gps_lat"] is None
        assert len(stripped) == len(padded) - removed

    def test_extended_xmp_stripped(self, jpeg):
        ext = b"http://ns.adobe.com/xmp/extension/\x00" + b"G" * 40
        seg = b"\xff\xe1" + struct.pack(">H", len(ext) + 2) + ext
        jj = jpeg[:2] + seg + jpeg[2:]
        stripped, removed = exif_strip(jj)
        assert removed == len(seg) and stripped == jpeg
