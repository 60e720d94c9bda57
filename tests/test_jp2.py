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

    def test_mismatched_transform_quant_named_errors(self):
        # a 9/7 COD with style-0 QCD (and the converse) is inconsistent
        # signalling — named errors, never a silent wrong decode
        img = np.zeros((16, 16), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x52")
        cs[i + 13] = 0  # transform -> 9/7 irreversible, QCD still style 0
        with pytest.raises(ValueError, match="without quantization"):
            jp2k_decode(bytes(cs))
        cs2 = bytearray(jp2k_encode(img, irreversible=True))
        i = cs2.find(b"\xff\x52")
        cs2[i + 13] = 1  # transform -> 5/3, QCD still quantized
        with pytest.raises(ValueError, match="reversible 5/3 stream with quantized"):
            jp2k_decode(bytes(cs2))

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

    def test_out_of_order_tile_part_named_error(self):
        # tile-parts are supported since session 12, but a first part with
        # TPsot=1 means part 0 is missing — ordering error, never a
        # silent partial decode
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jp2k_encode(img))
        i = cs.find(b"\xff\x90")
        cs[i + 10] = 1  # TPsot = 1 (a later tile-part)
        with pytest.raises(ValueError, match="tile-part 1 out of order"):
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


class TestIrreversible97:
    """Round-5 session-12 layer: the 9/7 float wavelet + E.1 quantization
    + ICT (the photographic JPX profile)."""

    def _page(self, h=80, w=96):
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        return (128 + 60 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)

    def test_dwt97_identity_across_shapes(self):
        from ocr_spark.operators.jp2_codec import dwt97_forward, dwt97_inverse

        rng = np.random.default_rng(0)
        for shape in [(64, 64), (37, 53), (1, 40), (40, 1), (5, 5), (2, 3)]:
            img = rng.random(shape) * 255
            ll, bands = dwt97_forward(img, 3)
            out = dwt97_inverse(ll, bands)
            assert out.shape == img.shape
            assert np.abs(out - img).max() < 1e-9

    def test_dwt97_dc_gain_one(self):
        # analysis lowpass DC gain 1 (the E.1 band-gain table assumption):
        # a constant image yields LL == the constant and zero high bands
        from ocr_spark.operators.jp2_codec import dwt97_forward

        ll, bands = dwt97_forward(np.full((32, 48), 77.0), 2)
        assert np.abs(ll - 77.0).max() < 1e-9
        for trio in bands:
            for b in trio:
                assert np.abs(b).max() < 1e-9

    def test_ict_roundtrip_spec_constants(self):
        # G.2 constants are rounded to 6 decimals in the spec; the matrix
        # inverse reproduces RGB to ~1e-4 of an intensity level
        from ocr_spark.operators.jp2_codec import ict_forward, ict_inverse

        rng = np.random.default_rng(1)
        rgb = rng.random((9, 11, 3)) * 255
        y, cb, cr = ict_forward(rgb)
        assert np.abs(ict_inverse(y, cb, cr) - rgb).max() < 1e-3
        # grayscale maps to zero chroma
        g = np.full((4, 4, 3), 100.0)
        _y, cb, cr = ict_forward(g)
        assert np.abs(cb).max() < 1e-9 and np.abs(cr).max() < 1e-9

    def test_qstep_code_roundtrip(self):
        from ocr_spark.operators.jp2_codec import _qstep, _qstep_to_code

        for rb in (8, 9, 10):
            for d in (1 / 64, 1 / 32, 0.3, 0.5, 1.0, 1.7, 2.0):
                eps, mu = _qstep_to_code(d, rb)
                assert 0 <= eps <= 31 and 0 <= mu <= 2047
                got = _qstep(rb, eps, mu)
                # mantissa has 11 bits: relative error < 2^-11
                assert abs(got - d) / d < 1.0 / 2048 + 1e-12

    def test_qstep_e1_formula_pin(self):
        # Δb = 2^(Rb−εb) · (1 + μb/2^11) — hand-computed values
        from ocr_spark.operators.jp2_codec import _qstep

        assert _qstep(8, 8, 0) == 1.0
        assert _qstep(8, 9, 0) == 0.5
        assert _qstep(9, 9, 1024) == 1.5
        assert _qstep(10, 8, 512) == 5.0

    @pytest.mark.parametrize("levels", [0, 1, 2, 3])
    def test_gray_roundtrip_bounded(self, levels):
        img = self._page()
        cs = jp2k_encode(img, levels=levels, irreversible=True, delta=0.5)
        dec = jp2k_decode(cs)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    def test_rgb_ict_roundtrip_bounded(self):
        g = self._page()
        rgb = np.stack([g, 255 - g, np.roll(g, 7, 1)], -1)
        cs = jp2k_encode(rgb, levels=2, irreversible=True, delta=0.5)
        dec = jp2k_decode(cs)
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 6

    def test_rate_distortion_monotone(self):
        # coarser steps must shrink the stream; reconstruction error stays
        # within a small multiple of the step through synthesis
        img = self._page(200, 256)
        sizes = []
        for d in (1 / 8, 1 / 2, 2.0):
            cs = jp2k_encode(img, levels=3, irreversible=True, delta=d)
            err = np.abs(jp2k_decode(cs).astype(int) - img.astype(int)).max()
            assert err <= max(1, int(8 * d))
            sizes.append(len(cs))
        assert sizes[0] > sizes[1] > sizes[2]
        # and real compression vs the lossless twin at a moderate step
        assert sizes[1] < len(jp2k_encode(img, levels=3))

    def test_scalar_derived_style1_decodes(self):
        # craft a scalar-DERIVED (QCD style 1) stream: encode expounded
        # with per-band steps following the E-5 derivation pattern, then
        # rewrite the QCD to the single-value style-1 form — decodes must
        # be identical, proving the εb = ε0 − r + 1 expansion
        import struct

        from ocr_spark.operators.jp2_codec import _BAND_GAIN, _qstep

        eps0, mu0 = 10, 512
        img = self._page()

        def derived_delta(orient, r):
            eps = eps0 if r == 0 else eps0 - r + 1
            return _qstep(8 + _BAND_GAIN[orient], eps, mu0)

        cs = bytearray(jp2k_encode(img, levels=2, irreversible=True,
                                   delta=derived_delta))
        ref = jp2k_decode(bytes(cs))
        i = cs.find(b"\xff\x5c")
        (ln,) = struct.unpack_from(">H", cs, i + 2)
        sqcd = cs[i + 4]
        assert sqcd & 0x1F == 2
        n_bands = (ln - 3) // 2
        assert n_bands == 7  # LL + 2 levels x 3
        # all coded values must collapse to the derived pattern's first
        v0 = struct.unpack_from(">H", cs, i + 5)[0]
        assert v0 == (eps0 << 11) | mu0
        style1 = (
            bytes([(sqcd & ~0x1F) | 1]) + struct.pack(">H", v0)
        )
        cs2 = cs[: i + 2] + struct.pack(">H", len(style1) + 2) + style1 + cs[i + 2 + ln :]
        dec = jp2k_decode(bytes(cs2))
        assert np.array_equal(dec, ref)

    def test_guard_bit_escalation(self):
        # a very fine step on a high-contrast image needs more than the
        # default 2 guard bits; the encoder computes them, the decoder
        # honors them (round-trip is the proof)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        cs = jp2k_encode(img, levels=2, irreversible=True, delta=1 / 256)
        dec = jp2k_decode(cs)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


class TestMultiTile:
    """Round-5 session-12 layer: tile grids (B.3) + tile-parts (A.4.2),
    the layout large scanned masters ship with."""

    def _page(self, h, w):
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        return (128 + 60 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)

    @pytest.mark.parametrize("tiles", [(64, 64), (128, 64), (64, 128)])
    def test_lossless_tiled_roundtrip(self, tiles):
        img = self._page(160, 200)  # edge tiles are partial both ways
        cs = jp2k_encode(img, levels=2, tiles=tiles)
        assert np.array_equal(jp2k_decode(cs), img)

    def test_tiled_stream_really_has_tiles(self):
        img = self._page(160, 200)
        cs = jp2k_encode(img, levels=2, tiles=(64, 64))
        # 3x4 grid -> 12 SOT markers with Isot 0..11
        import struct

        isots = []
        pos = 0
        while True:
            i = cs.find(b"\xff\x90", pos)
            if i < 0:
                break
            isots.append(struct.unpack_from(">H", cs, i + 4)[0])
            pos = i + 2
        assert isots == list(range(12))

    def test_rgb_tiled_roundtrip(self):
        g = self._page(96, 128)
        rgb = np.stack([g, 255 - g, np.roll(g, 3, 1)], -1)
        cs = jp2k_encode(rgb, levels=2, tiles=(64, 64))
        assert np.array_equal(jp2k_decode(cs), rgb)

    @pytest.mark.parametrize("tile_parts", [2, 3])
    def test_tile_parts_concatenate(self, tile_parts):
        img = self._page(96, 96)
        one = jp2k_encode(img, levels=2, tiles=(64, 64))
        many = jp2k_encode(img, levels=2, tiles=(64, 64),
                           tile_parts=tile_parts)
        assert many.count(b"\xff\x93") > one.count(b"\xff\x93")
        assert np.array_equal(jp2k_decode(many), jp2k_decode(one))

    def test_lossy_tiled_roundtrip_bounded(self):
        img = self._page(160, 200)
        cs = jp2k_encode(img, levels=2, irreversible=True, delta=0.5,
                         tiles=(64, 64), tile_parts=2)
        dec = jp2k_decode(cs)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    def test_single_column_tiles(self):
        # tile grid degenerate in one dimension
        img = self._page(200, 48)
        cs = jp2k_encode(img, levels=2, tiles=(64, 64))
        assert np.array_equal(jp2k_decode(cs), img)

    def test_unaligned_tile_size_named_error(self):
        img = self._page(100, 100)
        with pytest.raises(ValueError, match="multiple of 2\\^levels"):
            jp2k_encode(img, levels=2, tiles=(50, 50))
        # and the decoder enforces the same constraint on foreign streams
        import struct

        cs = bytearray(jp2k_encode(img, levels=2, tiles=(64, 64)))
        i = cs.find(b"\xff\x51")
        cs[i + 22 : i + 26] = struct.pack(">I", 63)  # XTsiz -> 63
        with pytest.raises(ValueError):
            jp2k_decode(bytes(cs))

    def test_missing_tile_named_error(self):
        img = self._page(96, 96)
        cs = jp2k_encode(img, levels=1, tiles=(64, 64))
        # chop the last tile (find its SOT, cut to EOC)
        import struct

        pos, last = 0, -1
        while True:
            i = cs.find(b"\xff\x90", pos)
            if i < 0:
                break
            last = i
            pos = i + 2
        bad = cs[:last] + b"\xff\xd9"
        with pytest.raises(ValueError, match="tile data mismatch"):
            jp2k_decode(bad)

    def test_jp2_container_tiled(self):
        img = self._page(96, 128)
        data = jp2_encode(img, levels=2, tiles=(64, 64))
        assert np.array_equal(jp2_decode(data), img)
