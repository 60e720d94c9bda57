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

    def test_corrupt_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            exif_parse(b"\x89PNG0000")
        with pytest.raises(ValueError):
            exif_parse(b"\xff\xd8\x00\x00")  # marker desync
        with pytest.raises(ValueError, match="length"):
            exif_parse(b"\xff\xd8\xff\xe1\x00\x01")

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

        jj = insert_exif(jpeg, exif_build(gps=(1.0, 1.0)))
        assets = spark.createDataFrame(
            [
                ("meta.jpg", bytearray(jj)),
                ("plain.jpg", bytearray(jpeg)),
                ("img.png", bytearray(b"\x89PNG\r\n\x1a\nrest")),
                ("bad.jpg", bytearray(b"\xff\xd8\xff\xe1\x00\x01")),
            ],
            "media_ref string, content binary",
        )
        out = {r.media_ref: r for r in strip_exif_pii(assets).collect()}
        assert out["meta.jpg"].had_metadata
        assert out["meta.jpg"].n_bytes_removed == len(jj) - len(out["meta.jpg"].content)
        assert bytes(out["plain.jpg"].content) == jpeg
        assert not out["plain.jpg"].had_metadata
        # non-JPEG passes through byte-identical
        assert bytes(out["img.png"].content).startswith(b"\x89PNG")
        assert out["img.png"].n_bytes_removed == 0
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
