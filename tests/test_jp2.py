"""JPEG2000 lossless codec tests (ITU-T T.800).

Every layer round-trips through real wire formats written by the module's
own spec-following encoder: tag trees, T1 MQ-coded pass data, packet
headers with 0xFF stuffing, markers, JP2 boxes. The MQ coder itself is
pinned/tested in test_jbig2 (shared module)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.jp2_codec import (
    TagTree,
    _BitReader,
    _BitWriter,
    dwt53_forward,
    dwt53_inverse,
    jp2_decode,
    jp2_encode,
    jp2_unwrap,
    jp2k_decode,
    jp2k_encode,
    rct_forward,
    rct_inverse,
    t1_decode_block,
    t1_encode_block,
)


class TestTagTree:
    def test_roundtrip_random_trees(self):
        rng = np.random.default_rng(5)
        for trial in range(20):
            h, w = int(rng.integers(1, 9)), int(rng.integers(1, 9))
            vals = rng.integers(0, 7, (h, w))
            enc = TagTree(h, w)
            enc.set_values(vals)
            wr = _BitWriter()
            order = [(y, x) for y in range(h) for x in range(w)]
            for y, x in order:
                t = 1
                while True:
                    enc.encode(wr, y, x, t)
                    if vals[y][x] < t:
                        break
                    t += 1
            rd = _BitReader(wr.flush())
            dec = TagTree(h, w)
            for y, x in order:
                t = 1
                while not dec.decode(rd, y, x, t):
                    t += 1
                assert dec.value[0][y][x] == vals[y][x], (trial, y, x)

    def test_bit_stuffing(self):
        # a run of 1-bits forces 0xFF bytes; the reader must unstuff
        wr = _BitWriter()
        for _ in range(30):
            wr.put(1)
        data = wr.flush()
        assert 0xFF in data
        rd = _BitReader(data)
        assert [rd.get() for _ in range(30)] == [1] * 30


class TestDWT:
    def test_roundtrip_matrix(self):
        rng = np.random.default_rng(7)
        for trial in range(15):
            h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
            lv = int(rng.integers(1, 6))
            img = rng.integers(-1000, 1000, (h, w)).astype(np.int64)
            ll, bands = dwt53_forward(img, lv)
            assert np.array_equal(dwt53_inverse(ll, bands), img), (h, w, lv)

    def test_flat_image_has_zero_detail(self):
        img = np.full((32, 32), 77, np.int64)
        ll, bands = dwt53_forward(img, 3)
        for hl, lh, hh in bands:
            assert abs(hl).max() == 0 and abs(lh).max() == 0
            assert abs(hh).max() == 0

    def test_rct_exact(self):
        rng = np.random.default_rng(8)
        rgb = rng.integers(0, 256, (21, 17, 3)).astype(np.int64)
        y, cb, cr = rct_forward(rgb)
        assert np.array_equal(rct_inverse(y, cb, cr), rgb)


class TestT1:
    @pytest.mark.parametrize("orient", ["LL", "LH", "HL", "HH"])
    def test_roundtrip(self, orient):
        rng = np.random.default_rng(ord(orient[0]) + ord(orient[1]))
        for h, w, bps in ((1, 1, 1), (4, 64, 5), (17, 13, 8), (64, 64, 3)):
            mag = rng.integers(0, 1 << bps, (h, w))
            sgn = rng.choice([-1, 1], (h, w))
            coeffs = (mag * sgn).astype(np.int64)
            data, n = t1_encode_block(coeffs, orient, bps)
            out = t1_decode_block(data, h, w, orient, bps, n)
            assert np.array_equal(out, coeffs), (orient, h, w, bps)

    def test_sparse_block_compresses(self):
        coeffs = np.zeros((64, 64), np.int64)
        coeffs[10, 20] = 100
        coeffs[50, 3] = -7
        data, n = t1_encode_block(coeffs, "HL", 7)
        assert len(data) < 100
        out = t1_decode_block(data, 64, 64, "HL", 7, n)
        assert np.array_equal(out, coeffs)

    def test_pass_count(self):
        # numbps planes -> 3*numbps - 2 passes (first plane cleanup-only)
        coeffs = np.array([[5, -3], [2, 7]], np.int64)
        _, n = t1_encode_block(coeffs, "LL", 3)
        assert n == 7


class TestCodestream:
    def test_gray_roundtrip_matrix(self):
        rng = np.random.default_rng(9)
        for trial in range(8):
            h, w = int(rng.integers(1, 120)), int(rng.integers(1, 120))
            lv = int(rng.integers(0, 6))
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            out = jp2k_decode(jp2k_encode(img, levels=lv))
            assert np.array_equal(out, img), (trial, h, w, lv)

    def test_rgb_rct_roundtrip(self):
        rng = np.random.default_rng(10)
        rgb = rng.integers(0, 256, (37, 22, 3), dtype=np.uint8)
        out = jp2k_decode(jp2k_encode(rgb, levels=3))
        assert np.array_equal(out, rgb)

    def test_multiple_codeblocks_per_band(self):
        # >64px per side at level 0 forces a code-block grid
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (130, 150), dtype=np.uint8)
        out = jp2k_decode(jp2k_encode(img, levels=1))
        assert np.array_equal(out, img)

    def test_text_page_compresses_losslessly(self):
        page = np.full((256, 512), 255, np.uint8)
        for r in range(16, 240, 12):
            page[r : r + 5, 30:480:9] = 0
        data = jp2k_encode(page, levels=4)
        assert len(data) < 256 * 512 // 4
        assert np.array_equal(jp2k_decode(data), page)

    def test_lossy_stream_named_error(self):
        img = np.zeros((16, 16), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x52")
        cs[i + 13] = 0  # transform -> 9/7 irreversible
        with pytest.raises(ValueError, match="9/7"):
            jp2k_decode(bytes(cs))

    def test_quantized_stream_named_error(self):
        img = np.zeros((16, 16), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x5c")
        cs[i + 4] |= 0x02  # Sqcd style: scalar derived quantization
        with pytest.raises(ValueError, match="quantized"):
            jp2k_decode(bytes(cs))

    def test_implausible_dims_rejected(self):
        import struct

        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x51")
        # patch Xsiz AND XTsiz (offsets +6 and +22) to a giant width
        cs[i + 6 : i + 10] = struct.pack(">I", 1 << 30)
        cs[i + 22 : i + 26] = struct.pack(">I", 1 << 30)
        with pytest.raises(ValueError, match="implausible"):
            jp2k_decode(bytes(cs))

    def test_truncated_stream_raises(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        cs = jp2k_encode(img)
        with pytest.raises(ValueError):
            jp2k_decode(cs[: len(cs) // 2])


class TestJP2Container:
    def test_box_roundtrip(self):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (24, 33), dtype=np.uint8)
        data = jp2_encode(img, levels=2)
        assert data[:4] == b"\x00\x00\x00\x0c"
        assert np.array_equal(jp2_decode(data), img)

    def test_raw_codestream_passthrough(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        cs = jp2k_encode(img)
        assert jp2_unwrap(cs) == cs
        assert np.array_equal(jp2_decode(cs), img)

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature|SOC"):
            jp2_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)

    def test_sniffed_through_decode_image(self):
        from ocr_spark.operators.multimodal import decode_image, detect_codec

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (19, 26), dtype=np.uint8)
        data = jp2_encode(img)
        assert detect_codec(data[:12]) == "jp2"
        assert np.array_equal(decode_image(data), img)


@pytest.mark.usefixtures("spark")
class TestSparkE2E:
    def test_jp2_through_image_features(self, spark):
        import pyspark.sql.functions as F

        from ocr_spark.operators.multimodal import image_features

        img = np.zeros((40, 60), np.uint8)
        img[10:30, 15:45] = 200
        assets = spark.createDataFrame(
            [("scan.jp2", bytearray(jp2_encode(img)))],
            "media_ref string, content binary",
        ).select(
            "media_ref",
            F.lit("image").alias("media_type"),
            "content",
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.length("content").cast("long").alias("n_bytes"),
                F.lit("jp2").alias("codec"),
            ).alias("meta"),
        )
        row = image_features(assets).collect()[0]
        assert row["error"] is None
        assert (row["width"], row["height"]) == (60, 40)
        assert row["mean_intensity"] == pytest.approx(float(img.mean()))


class TestReviewHardening:
    """Regressions for the adversarial-review findings."""

    def test_zero_length_box_no_hang(self):
        import struct

        from ocr_spark.operators.jp2_codec import _JP2_SIG

        bad = _JP2_SIG + struct.pack(">I", 1) + b"abcd" + struct.pack(">Q", 0)
        with pytest.raises(ValueError, match="box length"):
            jp2_unwrap(bad)

    def test_component_count_bounded(self):
        import struct

        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x51")
        cs[i + 38 : i + 40] = struct.pack(">H", 50)  # Csiz: 50 components
        with pytest.raises(ValueError, match="components"):
            jp2k_decode(bytes(cs))

    def test_deep_component_named_error(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x51")
        cs[i + 40] = 15  # Ssiz: 16-bit depth
        with pytest.raises(ValueError, match="bit depth"):
            jp2k_decode(bytes(cs))

    def test_multi_tile_part_named_error(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x90")
        cs[i + 10] = 1  # TPsot = 1 (a later tile-part)
        with pytest.raises(ValueError, match="tile-part"):
            jp2k_decode(bytes(cs))

    def test_coc_marker_named_error(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x5c")  # overwrite QCD marker id with COC
        cs[i + 1] = 0x53
        with pytest.raises(ValueError, match="COC"):
            jp2k_decode(bytes(cs))

    def test_psot_zero_with_trailing_pad(self):
        import struct

        img = np.arange(120, dtype=np.uint8).reshape(10, 12)
        cs = bytearray(jp2k_encode(img, levels=1))
        i = cs.find(b"\xff\x90")
        cs[i + 6 : i + 10] = struct.pack(">I", 0)  # Psot = 0
        padded = bytes(cs) + b"\x00" * 7  # pad after EOC
        assert np.array_equal(jp2k_decode(padded), img)

    def test_pdf_jpx_geometry_from_codestream(self):
        from ocr_spark.operators.pdf_layout import pdf_images, pdf_write_images

        gray = (np.arange(12 * 16).reshape(12, 16) % 251).astype(np.uint8)
        pdf = pdf_write_images([], [(gray, "jpx")])
        # inflate the dict /Width /Height: the codestream must win
        pdf2 = pdf.replace(b"/Width 16 /Height 12", b"/Width 99 /Height 77")
        img = pdf_images(pdf2)[0]
        assert img["error"] is None
        assert (img["width"], img["height"]) == (16, 12)
