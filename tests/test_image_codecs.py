"""Image codec tests: baseline JPEG (decode+encode), BMP, uncompressed TIFF,
GIF/LZW — pure stdlib/numpy implementations of the published formats
(S1 media scan; ref ocr_workflow_orchestrator.py:153-178 loads any
PIL-supported format, OCR-X_Component_Breakdown_OptionB.md:11-18 lists
TIFF/BMP/JPG/PNG as required inputs)."""

import numpy as np
import pytest

from ocr_spark.operators.image_codecs import (
    bmp_decode,
    bmp_encode,
    gif_decode_frames,
    gif_encode,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
    tiff_decode,
    tiff_encode,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="module")
def gray():
    rng = np.random.default_rng(7)
    x = np.linspace(0, 255, 61)[None, :] + np.linspace(0, 60, 45)[:, None]
    return np.clip(x + rng.normal(0, 8, (45, 61)), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def rgb(gray):
    return np.stack([gray, 255 - gray, np.roll(gray, 7, axis=1)], axis=2)


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


class TestJpeg:
    def test_gray_roundtrip_psnr(self, gray):
        out = jpeg_decode(jpeg_encode(gray, quality=90))
        assert out.shape == gray.shape and out.dtype == np.uint8
        assert _psnr(gray, out) > 33

    def test_rgb_444_roundtrip_psnr(self, rgb):
        out = jpeg_decode(jpeg_encode(rgb, quality=90))
        assert out.shape == rgb.shape
        assert _psnr(rgb, out) > 28

    def test_rgb_420_subsampled_roundtrip(self, rgb):
        """4:2:0 exercises MCU interleaving and the decoder's upsampling."""
        out = jpeg_decode(jpeg_encode(rgb, quality=90, subsample=True))
        assert out.shape == rgb.shape
        assert _psnr(rgb, out) > 20  # chroma is decimated by design

    def test_quality_monotone(self, gray):
        hi = jpeg_decode(jpeg_encode(gray, quality=95))
        lo = jpeg_decode(jpeg_encode(gray, quality=10))
        assert _psnr(gray, hi) > _psnr(gray, lo)
        assert len(jpeg_encode(gray, quality=10)) < len(jpeg_encode(gray, quality=95))

    def test_flat_image_exact_dc(self):
        flat = np.full((16, 24), 128, np.uint8)
        out = jpeg_decode(jpeg_encode(flat, quality=90))
        assert (out == 128).all()

    def test_non_multiple_of_8_sizes(self):
        for shape in [(1, 1), (7, 9), (8, 8), (17, 31)]:
            img = np.arange(shape[0] * shape[1], dtype=np.uint8).reshape(shape)
            out = jpeg_decode(jpeg_encode(img, quality=95))
            assert out.shape == shape

    def test_corrupt_inputs_raise(self, gray):
        with pytest.raises(ValueError, match="not a JPEG"):
            jpeg_decode(b"\x00" * 100)
        with pytest.raises(ValueError):
            jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI then EOI, no frame
        enc = bytearray(jpeg_encode(gray))
        with pytest.raises(ValueError):
            jpeg_decode(bytes(enc[: len(enc) // 2]))  # truncated entropy data

    def test_unsupported_process_rejected(self, gray):
        enc = bytearray(jpeg_encode(gray))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC3  # flip SOF0 → SOF3 (lossless sequential)
        with pytest.raises(ValueError, match="unsupported JPEG coding"):
            jpeg_decode(bytes(enc))


class TestJpegProgressive:
    """SOF2 decode (VERDICT r3 #3): the progressive encoder emits a 6-scan
    script — DC first Al=1 / DC refine / per-component AC first Al=1 / AC
    refine — so decoding exercises spectral selection, successive
    approximation, EOB runs and correction bits. The baseline encoding of
    the same image carries IDENTICAL quantized coefficients, so the two
    decodes must agree bit-for-bit."""

    @pytest.mark.parametrize("quality", [30, 85, 95])
    def test_matches_baseline_gray(self, gray, quality):
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        b = jpeg_decode(jpeg_encode(gray, quality=quality))
        p = jpeg_decode(jpeg_encode_progressive(gray, quality=quality))
        assert np.array_equal(b, p)

    @pytest.mark.parametrize("quality", [30, 85, 95])
    def test_matches_baseline_rgb(self, rgb, quality):
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        b = jpeg_decode(jpeg_encode(rgb, quality=quality))
        p = jpeg_decode(jpeg_encode_progressive(rgb, quality=quality))
        assert np.array_equal(b, p)

    def test_flat_image_long_eob_runs(self):
        """An all-flat image makes every AC scan one long EOB run — the
        EOBn accumulation/flush path on both sides."""
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        img = np.full((64, 48, 3), 200, np.uint8)
        assert np.array_equal(
            jpeg_decode(jpeg_encode_progressive(img)), jpeg_decode(jpeg_encode(img))
        )

    def test_odd_dimensions_and_noise(self):
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (33, 17, 3), dtype=np.uint8)
        assert np.array_equal(
            jpeg_decode(jpeg_encode_progressive(img, quality=30)),
            jpeg_decode(jpeg_encode(img, quality=30)),
        )

    def test_is_actually_progressive(self, gray):
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        enc = jpeg_encode_progressive(gray)
        assert b"\xff\xc2" in enc  # SOF2
        assert enc.count(b"\xff\xda") == 4  # gray: DC first/refine + AC x2

    def test_truncated_progressive_raises(self, gray):
        from ocr_spark.operators.image_codecs import jpeg_encode_progressive

        enc = jpeg_encode_progressive(gray)
        with pytest.raises(ValueError):
            jpeg_decode(enc[: len(enc) // 3])


# ---------------------------------------------------------------------------
# BMP / TIFF (lossless roundtrips)
# ---------------------------------------------------------------------------


class TestBmpTiff:
    def test_bmp_rgb_lossless(self, rgb):
        assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb)

    def test_bmp_gray_input(self, gray):
        out = bmp_decode(bmp_encode(gray))  # encoded as 24-bit
        assert np.array_equal(out, np.stack([gray] * 3, axis=2))

    def test_bmp_row_padding(self):
        img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)  # w=3 → pad
        assert np.array_equal(bmp_decode(bmp_encode(img)), img)

    def test_tiff_gray_lossless(self, gray):
        out = tiff_decode(tiff_encode(gray))
        assert out.ndim == 2 and np.array_equal(out, gray)

    def test_tiff_rgb_lossless(self, rgb):
        assert np.array_equal(tiff_decode(tiff_encode(rgb)), rgb)

    def test_corrupt_raise(self):
        with pytest.raises(ValueError):
            bmp_decode(b"XX" + b"\x00" * 60)
        with pytest.raises(ValueError):
            tiff_decode(b"II\x00\x00" + b"\x00" * 20)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


class TestGif:
    def test_single_frame_exact(self, gray):
        f = np.stack([gray] * 3, axis=2)
        dec = gif_decode_frames(gif_encode(f))
        assert len(dec) == 1 and np.array_equal(dec[0], f)

    def test_multi_frame_exact(self, gray):
        frames = [
            np.stack([np.roll(gray, s, axis=1)] * 3, axis=2) for s in (0, 4, 9)
        ]
        dec = gif_decode_frames(gif_encode(frames))
        assert len(dec) == 3
        for a, b in zip(dec, frames):
            assert np.array_equal(a, b)

    def test_large_palette_quantizes(self):
        rng = np.random.default_rng(1)
        noisy = rng.integers(0, 256, (20, 20, 3), np.uint8)  # >256 colors
        dec = gif_decode_frames(gif_encode(noisy))[0]
        assert dec.shape == noisy.shape
        # uniform quantizer coarsens until the palette fits: ≤6-bit shift
        assert np.abs(dec.astype(int) - noisy.astype(int)).max() <= 63

    def test_lzw_table_reset_on_long_input(self):
        """Enough distinct sequences to overflow the 12-bit LZW table forces
        the clear-and-restart path on both sides."""
        rng = np.random.default_rng(2)
        big = np.stack([((rng.integers(0, 256, (96, 96))) >> 4 << 4).astype(np.uint8)] * 3, axis=2)
        dec = gif_decode_frames(gif_encode(big))[0]
        assert np.array_equal(dec, big)

    def test_corrupt_raise(self):
        with pytest.raises(ValueError):
            gif_decode_frames(b"GIF00a" + b"\x00" * 30)
        with pytest.raises(ValueError):
            gif_decode_frames(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no frames


# ---------------------------------------------------------------------------
# decode_image auto-sniffing + sidecar e2e over real files of every format
# ---------------------------------------------------------------------------


def test_decode_image_sniffs_all_formats(gray, rgb):
    from ocr_spark.operators.multimodal import decode_image, detect_codec

    payloads = {
        "jpeg": jpeg_encode(gray, quality=95),
        "bmp": bmp_encode(rgb),
        "tiff": tiff_encode(rgb),
        "gif": gif_encode(np.stack([gray] * 3, axis=2)),
    }
    for codec, blob in payloads.items():
        assert detect_codec(blob[:12]) == codec
        img = decode_image(blob)  # auto
        assert img.shape[:2] == gray.shape
    # synthetic raw payloads still fall through to the fixture decoder
    assert detect_codec(b"\x00" * 12) is None


def test_sidecar_mixed_formats_end_to_end(spark, tmp_path, gray):
    """REAL image files of four formats on disk feed the SAME pipeline: the
    binaryFile sidecar join resolves payloads, the Arrow stage sniffs the
    codec, decodes, aspect-fits and recognizes — the full S1 production
    path with no stubs for any of PNG/JPEG/BMP/TIFF/GIF."""
    from ocr_spark.operators.cloud_engine import png_encode
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA
    from ocr_spark.sources.media import sidecar_df, synth_media_batch

    from ocr_spark.operators.webp_codec import webp_encode

    base = synth_media_batch(["mix-a"])[0]  # 32x32 native kernel size
    d = tmp_path / "mix"
    d.mkdir()
    (d / "a.png").write_bytes(png_encode(base))
    (d / "b.jpg").write_bytes(jpeg_encode(base, quality=95))
    (d / "c.bmp").write_bytes(bmp_encode(base))
    (d / "d.tif").write_bytes(tiff_encode(base))
    (d / "e.gif").write_bytes(gif_encode(np.stack([base] * 3, axis=2)))
    (d / "f.jpeg").write_bytes(jpeg_encode_progressive(base, quality=95))
    # round-5 formats: WebP lossless (plain + through both transforms),
    # Adam7-interlaced PNG, interlaced GIF
    (d / "g.webp").write_bytes(webp_encode(base))
    (d / "h.webp").write_bytes(
        webp_encode(base, subtract_green=True, predictor_mode=11)
    )
    (d / "i.png").write_bytes(png_encode(base, interlace=True))
    (d / "j.gif").write_bytes(
        gif_encode(np.stack([base] * 3, axis=2), interlace=True)
    )

    sidecar = sidecar_df(spark, str(d) + "/*")
    uris = {r.media_ref.rsplit("/", 1)[-1]: r.media_ref for r in sidecar.collect()}
    assert set(uris) == {
        "a.png", "b.jpg", "c.bmp", "d.tif", "e.gif", "f.jpeg",
        "g.webp", "h.webp", "i.png", "j.gif",
    }
    docs = spark.createDataFrame(
        [(name, [("media", None, uri, 0)]) for name, uri in uris.items()],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r for r in extract_documents(docs, media_sidecar=sidecar).collect()}
    assert all(r.error is None for r in out.values()), {
        k: r.error for k, r in out.items()
    }
    # lossless formats decode to the identical image → identical extraction
    texts = {k: out[k].spans[0].text for k in out}
    assert (
        texts["a.png"] == texts["c.bmp"] == texts["d.tif"] == texts["e.gif"]
        == texts["g.webp"] == texts["h.webp"] == texts["i.png"]
        == texts["j.gif"]
    )
    assert all(isinstance(t, str) for t in texts.values())


# ---------------------------------------------------------------------------
# round 5: WebP VP8L codec + Adam7 PNG + interlaced GIF
# ---------------------------------------------------------------------------


class TestAdam7Png:
    def test_roundtrip_all_shapes(self):
        from ocr_spark.operators.cloud_engine import png_decode, png_encode

        rng = np.random.RandomState(3)
        for shape in [(1, 1), (2, 3), (7, 5), (8, 8), (13, 17), (64, 48)]:
            g = rng.randint(0, 256, size=shape).astype(np.uint8)
            assert np.array_equal(png_decode(png_encode(g, interlace=True)), g)
            rgb = rng.randint(0, 256, size=shape + (3,)).astype(np.uint8)
            assert np.array_equal(
                png_decode(png_encode(rgb, interlace=True)), rgb
            )


class TestInterlacedGif:
    def test_roundtrip(self):
        rng = np.random.RandomState(5)
        for shape in [(1, 1), (7, 5), (13, 17)]:
            g = (rng.randint(0, 8, size=shape) * 32).astype(np.uint8)
            dec = gif_decode_frames(gif_encode(g, interlace=True))[0]
            assert np.array_equal(dec, np.stack([g] * 3, axis=2)), shape

    def test_multiframe_interlaced(self):
        rng = np.random.RandomState(6)
        fr = [(rng.randint(0, 8, size=(9, 11)) * 30).astype(np.uint8) for _ in range(3)]
        decs = gif_decode_frames(gif_encode(fr, interlace=True))
        assert len(decs) == 3
        assert np.array_equal(decs[-1], np.stack([fr[-1]] * 3, axis=2))


class TestWebPVp8l:
    def test_roundtrip_plain_and_transforms(self):
        from ocr_spark.operators.webp_codec import webp_decode, webp_encode

        rng = np.random.RandomState(11)
        for shape in [(1, 1), (5, 7), (16, 16), (23, 17)]:
            rgb = rng.randint(0, 256, size=shape + (3,)).astype(np.uint8)
            assert np.array_equal(webp_decode(webp_encode(rgb)), rgb)
            assert np.array_equal(
                webp_decode(webp_encode(rgb, subtract_green=True)), rgb
            )
            assert np.array_equal(
                webp_decode(
                    webp_encode(rgb, subtract_green=True, predictor_mode=11)
                ),
                rgb,
            )

    def test_all_14_predictor_modes_invert(self):
        from ocr_spark.operators.webp_codec import webp_decode, webp_encode

        rng = np.random.RandomState(12)
        rgb = rng.randint(0, 256, size=(9, 13, 3)).astype(np.uint8)
        for mode in range(14):
            got = webp_decode(webp_encode(rgb, predictor_mode=mode))
            assert np.array_equal(got, rgb), f"predictor mode {mode}"

    def test_lossy_vp8_raises_named_envelope(self):
        import struct

        from ocr_spark.operators.webp_codec import webp_decode

        payload = b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError, match="VP8"):
            webp_decode(data)

    def test_decode_image_sniffs_webp(self):
        from ocr_spark.operators.multimodal import decode_image, detect_codec
        from ocr_spark.operators.webp_codec import webp_encode

        rng = np.random.RandomState(13)
        rgb = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        blob = webp_encode(rgb)
        assert detect_codec(blob[:12]) == "webp"
        assert np.array_equal(decode_image(blob), rgb)

    # -- hand-crafted streams for the paths the literal-only encoder
    #    never emits: LZ77 backward refs, color cache, color indexing -----

    @staticmethod
    def _wrap(payload: bytes) -> bytes:
        import struct

        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    @staticmethod
    def _header(bw, w, h):
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms

    @staticmethod
    def _green_code_two_symbols(bw, sym_a, sym_b):
        """Code-length-coded green code with exactly two length-1 symbols
        (sym_a < sym_b can exceed 255 — e.g. length/cache symbols, which
        SIMPLE codes cannot express). Uses 17/18 zero-runs, so this also
        covers the repeat paths of the code-length decoder."""
        assert sym_a < sym_b
        # plan the code-length-symbol emissions first: max_symbol counts
        # read ITERATIONS (each 17/18 repeat is ONE read filling many
        # slots), so it must equal the emission count, not the slot count
        ops = []

        def plan_zero_run(n):
            # split into 18-runs (11..138) and 17-runs (3..10), keeping any
            # remainder >= 3; callers never pass n in 1..2
            assert n >= 3
            while n > 0:
                if n >= 11:
                    take = min(n, 138)
                    if 0 < n - take < 3:
                        take = n - 3
                    ops.append(("18", take))
                else:
                    take = n
                    ops.append(("17", take))
                n -= take

        if sym_a > 0:
            plan_zero_run(sym_a)
        ops.append(("one",))
        gap = sym_b - sym_a - 1
        if gap:
            plan_zero_run(gap)
        ops.append(("one",))

        bw.write(0, 1)  # not simple
        # code-length code over symbols {1, 17, 18}: lengths 1, 2, 2
        # kOrder = [17,18,0,1,...]: index0=17, index1=18, symbol 1 at index 3
        bw.write(4 - 4, 4)  # num_code_lengths = 4
        bw.write(2, 3)  # 17 -> len 2
        bw.write(2, 3)  # 18 -> len 2
        bw.write(0, 3)  # 0  -> unused
        bw.write(1, 3)  # 1  -> len 1
        bw.write(1, 1)  # use max_symbol
        bw.write(3, 3)  # length_nbits = 8
        assert 2 <= len(ops) <= 257
        bw.write(len(ops) - 2, 8)  # stop after the planned reads
        # canonical: symbol1 -> '0'; 17 -> '10'; 18 -> '11'
        for op in ops:
            if op[0] == "one":
                bw.write(0, 1)
            elif op[0] == "17":
                bw.write(1, 1)
                bw.write(0, 1)
                bw.write(op[1] - 3, 3)
            else:
                bw.write(1, 1)
                bw.write(1, 1)
                bw.write(op[1] - 11, 7)

    def test_lz77_backward_reference_and_distance_map(self):
        """Green code carries a literal and length-symbol 256; distance code
        is simple(13) + 5 extra bits -> prefix value 121 -> plain distance 1
        (the >120 branch). Stream: literal pixel, then a backref copying it
        3 more times."""
        from ocr_spark.operators.webp_codec import (
            _BitWriter,
            _write_simple_1symbol,
            webp_decode,
        )

        bw = _BitWriter()
        self._header(bw, 4, 1)
        bw.write(0, 1)  # no meta
        bw.write(0, 1)  # no cache
        self._green_code_two_symbols(bw, 7, 256)  # literal g=7, len code 0
        _write_simple_1symbol(bw, 200)  # red
        _write_simple_1symbol(bw, 100)  # blue
        _write_simple_1symbol(bw, 255)  # alpha
        _write_simple_1symbol(bw, 13)  # distance prefix code 13
        # pixel 0: literal (green code '0')
        bw.write(0, 1)
        # pixels 1-3: length symbol 256 (code '1'), length prefix 0 has no
        # extra bits in the GREEN alphabet? length code = sym-256 = 0 ->
        # value 1; emit three backrefs of length 1
        for _ in range(3):
            bw.write(1, 1)  # green symbol 256 -> length code 0 -> len 1
            # distance code symbol 13 costs 0 bits (single-symbol code),
            # then 5 extra bits valued 24 -> 96+24+1 = 121 -> dist 1
            bw.write(24, 5)
        img = webp_decode(self._wrap(bw.done()))
        assert img.shape == (1, 4, 3)
        assert (img == np.array([200, 7, 100], dtype=np.uint8)).all()

    def test_color_cache_hit(self):
        """cache_bits=4; literal pixel inserted into the cache, then the
        cache symbol re-emits it."""
        from ocr_spark.operators.webp_codec import (
            _BitWriter,
            _write_simple_1symbol,
            webp_decode,
        )

        px = (0xFF << 24) | (200 << 16) | (7 << 8) | 100
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - 4)
        bw = _BitWriter()
        self._header(bw, 2, 1)
        bw.write(0, 1)  # no meta
        bw.write(1, 1)  # cache on
        bw.write(4, 4)  # cache_bits = 4
        self._green_code_two_symbols(bw, 7, 256 + 24 + idx)
        _write_simple_1symbol(bw, 200)
        _write_simple_1symbol(bw, 100)
        _write_simple_1symbol(bw, 255)
        _write_simple_1symbol(bw, 0)  # distance unused
        bw.write(0, 1)  # literal
        bw.write(1, 1)  # cache symbol
        img = webp_decode(self._wrap(bw.done()))
        assert (img == np.array([200, 7, 100], dtype=np.uint8)).all()
        assert img.shape == (1, 2, 3)

    def test_color_indexing_with_bundling(self):
        """4-color palette -> width_bits=2 (four 2-bit indices per green
        byte): exercises palette delta-decoding AND sub-8-bit bundling."""
        from ocr_spark.operators.webp_codec import (
            _BitWriter,
            _write_literal_image,
            webp_decode,
        )

        palette = [
            (0xFF << 24) | (10 << 16) | (20 << 8) | 30,
            (0xFF << 24) | (50 << 16) | (60 << 8) | 70,
            (0xFF << 24) | (90 << 16) | (100 << 8) | 110,
            (0xFF << 24) | (130 << 16) | (140 << 8) | 150,
        ]
        # palette stream is delta-coded per channel
        deltas = []
        prev = 0
        for p in palette:
            d = 0
            for shift in (24, 16, 8, 0):
                d |= (((p >> shift) - (prev >> shift)) & 0xFF) << shift
            deltas.append(d)
            prev = p
        w, h = 6, 2  # packed width ceil(6/4) = 2
        indices = np.array([[0, 1, 2, 3, 2, 1], [3, 2, 1, 0, 1, 2]])
        packed = np.zeros((h, 2), dtype=np.uint32)
        for y in range(h):
            for x in range(w):
                byte_i = x >> 2
                packed[y, byte_i] |= indices[y, x] << ((x % 4) * 2)
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(4 - 1, 8)  # n_colors = 4
        _write_literal_image(bw, np.array(deltas, dtype=np.uint32), main=False)
        bw.write(0, 1)  # no more transforms
        main = (0xFF000000 | (packed << 8)).astype(np.uint32).reshape(-1)
        _write_literal_image(bw, main, main=True)
        img = webp_decode(self._wrap(bw.done()))
        assert img.shape == (2, 6, 3)
        for y in range(h):
            for x in range(w):
                p = palette[indices[y, x]]
                want = [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]
                assert list(img[y, x]) == want, (y, x)


def test_webp_select_predictor_ties_toward_top():
    # libwebp's Select: pa_minus_pb <= 0 -> TOP; a tie picking LEFT decodes
    # real lossless files wrong from the tied pixel onward
    from ocr_spark.operators.webp_codec import _pack, _predict

    left = _pack(0xFF, 10, 10, 10)
    top = _pack(0xFF, 20, 20, 20)
    tl = _pack(0xFF, 15, 15, 15)  # |T-TL| == |L-TL| per channel: a tie
    assert _predict(11, left, top, tl, 0) == top


def test_webp_encode_rejects_oversized_dimensions():
    from ocr_spark.operators.webp_codec import webp_encode

    with pytest.raises(ValueError, match="16384"):
        webp_encode(np.zeros((1, 16385, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="16384"):
        webp_encode(np.zeros((16385, 1, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# TIFF compression variants: LZW (MSB-first, EarlyChange), PackBits,
# Predictor 2
# ---------------------------------------------------------------------------


class TestTiffCompression:
    GRAY = (np.arange(40 * 56).reshape(40, 56) % 251).astype(np.uint8)

    def test_all_roundtrips(self):
        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (30, 20, 3), dtype=np.uint8)
        for img in (self.GRAY, rgb):
            for comp in ("none", "lzw", "packbits", "deflate"):
                preds = (1, 2) if comp in ("lzw", "deflate") else (1,)
                for pred in preds:
                    got = tiff_decode(
                        tiff_encode(img, compression=comp, predictor=pred)
                    )
                    assert np.array_equal(got, img), (comp, pred)

    def test_lzw_early_change_and_12bit_clear(self):
        # >40k distinct-ish bytes forces the table through every width up
        # to 12 bits and across the mid-stream CLEAR
        from ocr_spark.operators.image_codecs import (
            _tiff_lzw_decode,
            _tiff_lzw_encode,
        )

        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data

    def test_packbits_no_op_and_runs(self):
        from ocr_spark.operators.image_codecs import (
            _packbits_decode,
            _packbits_encode,
        )

        row = b"\x00" * 200 + b"abcdef" + b"\xff" * 3
        enc = _packbits_encode(row)
        assert len(enc) < len(row)
        assert _packbits_decode(enc, len(row)) == row
        # 0x80 header bytes are no-ops
        assert _packbits_decode(b"\x80\x00A", 1) == b"A"

    def test_multi_strip_lzw(self):
        # hand-build a 2-strip LZW TIFF (RowsPerStrip = 20 over 40 rows):
        # strips must decompress as INDEPENDENT streams
        import struct

        from ocr_spark.operators.image_codecs import (
            _tiff_lzw_encode,
            tiff_decode,
        )

        img = self.GRAY
        h, w = img.shape
        s1 = _tiff_lzw_encode(img[:20].tobytes())
        s2 = _tiff_lzw_encode(img[20:].tobytes())
        off1 = 8
        off2 = off1 + len(s1)
        arrays_off = off2 + len(s2)
        # StripOffsets/ByteCounts arrays (2 longs each) precede the IFD
        ifd_off = arrays_off + 16
        entries = []

        def entry(tag, typ, cnt, val):
            entries.append(
                struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
            )

        def entry_short(tag, val):
            entries.append(struct.pack("<HHIHH", tag, 3, 1, val, 0))

        entry_short(256, w)
        entry_short(257, h)
        entry_short(258, 8)
        entry_short(259, 5)  # LZW
        entry_short(262, 1)
        entry(273, 4, 2, arrays_off)
        entry_short(277, 1)
        entry_short(278, 20)  # RowsPerStrip
        entry(279, 4, 2, arrays_off + 8)
        data = (
            b"II*\x00"
            + struct.pack("<I", ifd_off)
            + s1
            + s2
            + struct.pack("<II", off1, off2)
            + struct.pack("<II", len(s1), len(s2))
            + struct.pack("<H", len(entries))
            + b"".join(entries)
            + struct.pack("<I", 0)
        )
        assert np.array_equal(tiff_decode(data), img)

    def test_unsupported_compression_still_named(self):
        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        import struct

        # splice compression tag 6 (old-style JPEG, deprecated by TTN2
        # and genuinely unsupported) in place of 1
        raw = tiff_encode(self.GRAY)
        idx = raw.find(struct.pack("<HHIHH", 259, 3, 1, 1, 0))
        assert idx > 0
        patched = (
            raw[:idx] + struct.pack("<HHIHH", 259, 3, 1, 6, 0)
            + raw[idx + 12 :]
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="compression 6"):
            tiff_decode(patched)


class TestBmpRle8:
    def test_roundtrip_matrix(self):
        from ocr_spark.operators.image_codecs import bmp_decode, bmp_encode_rle8

        rng = np.random.default_rng(5)
        imgs = [
            rng.integers(0, 256, (17, 31), dtype=np.uint8),   # noisy
            np.full((9, 40), 77, np.uint8),                    # constant
            (np.arange(25 * 33).reshape(25, 33) // 7 % 256).astype(np.uint8),
            np.zeros((1, 1), np.uint8),
        ]
        for img in imgs:
            assert np.array_equal(bmp_decode(bmp_encode_rle8(img)), img)

    def test_compresses_flat_image(self):
        from ocr_spark.operators.image_codecs import bmp_encode, bmp_encode_rle8

        flat = np.full((64, 64), 128, np.uint8)
        assert len(bmp_encode_rle8(flat)) < len(bmp_encode(flat)) // 4

    def test_other_compression_still_named(self):
        import struct

        from ocr_spark.operators.image_codecs import bmp_decode, bmp_encode_rle8

        raw = bytearray(bmp_encode_rle8(np.zeros((4, 4), np.uint8)))
        raw[30:34] = struct.pack("<I", 4)  # BI_JPEG
        with pytest.raises(ValueError, match="compression 4"):
            bmp_decode(bytes(raw))


class TestTiffCcitt:
    """CCITT G3/G4 fax TIFFs (compressions 2/3/4) through the container."""

    @staticmethod
    def _page(seed=5, h=48, w=130):
        rng = np.random.default_rng(seed)
        img = np.full((h, w), 255, np.uint8)  # white page
        for r in range(6, h - 6, 9):
            x = 8
            while x < w - 20:
                gw = int(rng.integers(5, 14))
                img[r:r + 4, x:x + gw] = 0  # black strokes
                x += gw + int(rng.integers(3, 9))
        return img

    @pytest.mark.parametrize("comp", ["g3", "g3_2d", "g4"])
    def test_roundtrip(self, comp):
        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        img = self._page()
        got = tiff_decode(tiff_encode(img, compression=comp))
        assert np.array_equal(got, img)

    def test_gray_input_thresholded(self):
        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        img = np.full((8, 16), 200, np.uint8)  # light gray -> white
        img[2:5, 3:9] = 60  # dark gray -> black
        got = tiff_decode(tiff_encode(img, compression="g4"))
        want = np.where(img < 128, 0, 255).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_g4_smaller_than_uncompressed(self):
        from ocr_spark.operators.image_codecs import tiff_encode

        img = self._page(h=128, w=512)
        g4 = tiff_encode(img, compression="g4")
        raw = tiff_encode(img, compression="none")
        assert len(g4) < len(raw) // 10

    def test_photometric_one_inverts(self):
        import struct

        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        img = self._page(h=16, w=64)
        data = bytearray(tiff_encode(img, compression="g4"))
        # IFD entries are 12 bytes after a 2-byte count; patch tag 262 -> 1
        (ifd_off,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            (tag,) = struct.unpack("<H", data[off:off + 2])
            if tag == 262:
                data[off + 8:off + 10] = struct.pack("<H", 1)
        got = tiff_decode(bytes(data))
        assert np.array_equal(got, 255 - img)

    def test_fill_order_lsb(self):
        import struct

        from ocr_spark.operators.fax_codec import g4_encode
        from ocr_spark.operators.image_codecs import (
            _tiff_wrap_ifd,
            tiff_decode,
        )

        img = self._page(h=12, w=80)
        body = g4_encode((img < 128).astype(np.uint8))
        # reverse bits within each byte (FillOrder 2 wire layout)
        rev = np.packbits(
            np.unpackbits(np.frombuffer(body, np.uint8), bitorder="little")
        ).tobytes()
        tif = bytearray(_tiff_wrap_ifd(rev, 80, 12, 1, 4, bps=1, photometric=0))
        # append a FillOrder=2 entry by rewriting the IFD: easier to patch
        # an existing tag is absent, so hand-build: insert via tags parse is
        # overkill — instead patch compression tag stays, add entry count+1
        (ifd_off,) = struct.unpack("<I", tif[4:8])
        (n,) = struct.unpack("<H", tif[ifd_off:ifd_off + 2])
        entries = bytes(tif[ifd_off + 2:ifd_off + 2 + 12 * n])
        fill_entry = struct.pack("<HHIHH", 266, 3, 1, 2, 0)
        # keep ascending tag order: 266 sorts after 262, before 273
        chunks = [entries[i:i + 12] for i in range(0, len(entries), 12)]
        tags = [struct.unpack("<H", c[:2])[0] for c in chunks]
        pos = next(i for i, t in enumerate(tags) if t > 266)
        chunks.insert(pos, fill_entry)
        new_ifd = (
            struct.pack("<H", n + 1) + b"".join(chunks) + struct.pack("<I", 0)
        )
        out = bytes(tif[:ifd_off]) + new_ifd
        assert np.array_equal(tiff_decode(out), img)

    def test_multi_strip_g4(self):
        import struct

        from ocr_spark.operators.fax_codec import g4_encode
        from ocr_spark.operators.image_codecs import tiff_decode

        img = self._page(h=40, w=96)
        bits = (img < 128).astype(np.uint8)
        s1 = g4_encode(bits[:20])  # strips restart the reference line
        s2 = g4_encode(bits[20:])
        off1 = 8
        off2 = off1 + len(s1)
        ifd_off = off2 + len(s2)
        entries = []

        def eshort(tag, val):
            entries.append(struct.pack("<HHIHH", tag, 3, 1, val, 0))

        def elong(tag, typ, cnt, val):
            entries.append(
                struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
            )

        eshort(256, 96)
        eshort(257, 40)
        eshort(258, 1)
        eshort(259, 4)
        eshort(262, 0)
        elong(273, 4, 2, ifd_off + 2 + 12 * 10 + 4)  # offsets array after IFD
        eshort(277, 1)
        eshort(278, 20)
        elong(279, 4, 2, ifd_off + 2 + 12 * 10 + 4 + 8)
        eshort(320 + 0, 0)  # placeholder to keep count at 10 (tag 320 unused)
        ifd = (
            struct.pack("<H", len(entries))
            + b"".join(entries)
            + struct.pack("<I", 0)
        )
        arrays = struct.pack("<II", off1, off2) + struct.pack(
            "<II", len(s1), len(s2)
        )
        data = (
            b"II*\x00"
            + struct.pack("<I", ifd_off)
            + s1
            + s2
            + ifd
            + arrays
        )
        assert np.array_equal(tiff_decode(data), img)

    def test_non_bilevel_ccitt_raises(self):
        import struct

        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        data = bytearray(tiff_encode(self._page(h=8, w=32), compression="g4"))
        (ifd_off,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            (tag,) = struct.unpack("<H", data[off:off + 2])
            if tag == 258:
                data[off + 8:off + 10] = struct.pack("<H", 8)
        with pytest.raises(ValueError, match="bilevel"):
            tiff_decode(bytes(data))


class TestTiffJpeg:
    """TIFF compression 7 (new-style JPEG-in-TIFF, TTN2)."""

    GRAY = (np.arange(40 * 56).reshape(40, 56) % 251).astype(np.uint8)

    def test_full_stream_strip_roundtrip(self):
        from ocr_spark.operators.image_codecs import (
            jpeg_decode,
            jpeg_encode,
            tiff_decode,
            tiff_encode,
        )

        got = tiff_decode(tiff_encode(self.GRAY, compression="jpeg"))
        want = jpeg_decode(jpeg_encode(self.GRAY))  # same quantization
        assert np.array_equal(got, want)

    def test_rgb(self):
        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
        got = tiff_decode(tiff_encode(rgb, compression="jpeg"))
        assert got.shape == rgb.shape
        assert abs(got.astype(int) - rgb.astype(int)).mean() < 30

    def test_abbreviated_streams_with_jpegtables(self):
        """Real-world layout: DQT/DHT hoisted into the JPEGTables tag,
        strips carry abbreviated streams. Built by segment-splitting the
        repo's own encoder output."""
        import struct

        from ocr_spark.operators.image_codecs import (
            jpeg_decode,
            jpeg_encode,
            tiff_decode,
        )

        full = jpeg_encode(self.GRAY)
        # walk segments: pull DQT (FFDB) / DHT (FFC4) out
        tables, rest = [], []
        i = 2
        while i < len(full):
            assert full[i] == 0xFF
            marker = full[i + 1]
            if marker == 0xD9:
                rest.append(full[i:])
                break
            (seglen,) = struct.unpack(">H", full[i + 2 : i + 4])
            seg = full[i : i + 2 + seglen]
            if marker in (0xDB, 0xC4):
                tables.append(seg)
            else:
                rest.append(seg)
                if marker == 0xDA:  # SOS: entropy data follows to EOI
                    rest.append(full[i + 2 + seglen :])
                    break
            i += 2 + seglen
        jpegtables = b"\xff\xd8" + b"".join(tables) + b"\xff\xd9"
        abbrev = b"\xff\xd8" + b"".join(rest)
        h, w = self.GRAY.shape
        body = abbrev
        data_off = 8
        tbl_off = data_off + len(body)
        ifd_off = tbl_off + len(jpegtables)
        entries = []

        def eshort(tag, val):
            entries.append(struct.pack("<HHIHH", tag, 3, 1, val, 0))

        def elong(tag, typ, cnt, val):
            entries.append(
                struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
            )

        eshort(256, w)
        eshort(257, h)
        eshort(258, 8)
        eshort(259, 7)
        eshort(262, 1)
        elong(273, 4, 1, data_off)
        eshort(277, 1)
        eshort(278, h)
        elong(279, 4, 1, len(body))
        elong(347, 7, len(jpegtables), tbl_off)
        ifd = (
            struct.pack("<H", len(entries))
            + b"".join(entries)
            + struct.pack("<I", 0)
        )
        tif = (
            b"II*\x00"
            + struct.pack("<I", ifd_off)
            + body
            + jpegtables
            + ifd
        )
        got = tiff_decode(tif)
        want = jpeg_decode(full)
        assert np.array_equal(got, want)

    def test_bad_strip_raises(self):
        import struct

        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        data = bytearray(tiff_encode(self.GRAY, compression="jpeg"))
        data[8:10] = b"\x00\x00"  # clobber the strip's SOI
        with pytest.raises(ValueError, match="SOI"):
            tiff_decode(bytes(data))


class TestTiffReviewHardening:
    def test_rgb_jpeg_tiff_bits_per_sample_array(self):
        # TIFF 6.0: BitsPerSample count must equal SamplesPerPixel
        import struct

        from ocr_spark.operators.image_codecs import tiff_encode

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        for comp in ("none", "jpeg", "deflate"):
            data = tiff_encode(rgb, compression=comp)
            (ifd_off,) = struct.unpack("<I", data[4:8])
            (n,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
            found = {}
            for i in range(n):
                off = ifd_off + 2 + 12 * i
                tag, typ, cnt = struct.unpack("<HHI", data[off:off + 8])
                found[tag] = (typ, cnt)
            assert found[258] == (3, 3), comp
            assert found[277][1] == 1 and found[258][1] == 3

    def test_zero_height_ccitt_is_valueerror(self):
        import struct

        from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

        data = bytearray(
            tiff_encode(np.full((8, 16), 255, np.uint8), compression="g4")
        )
        (ifd_off,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            (tag,) = struct.unpack("<H", data[off:off + 2])
            if tag == 257:  # ImageLength -> 0
                data[off + 8:off + 10] = struct.pack("<H", 0)
        with pytest.raises(ValueError):
            tiff_decode(bytes(data))


class TestTiffTiled:
    """Tiled TIFF organization (tags 322-325, TIFF 6.0 §15)."""

    @staticmethod
    def _img(h, w, spp=1, seed=3):
        rng = np.random.default_rng(seed)
        shape = (h, w) if spp == 1 else (h, w, spp)
        return rng.integers(0, 256, shape, dtype=np.uint8)

    @pytest.mark.parametrize("comp", ["none", "lzw", "deflate", "packbits"])
    def test_roundtrip_gray(self, comp):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        # 150x130 with 64x64 tiles: 3x3 grid with cropped edges
        img = self._img(130, 150)
        got = tiff_decode(tiff_encode_tiled(img, compression=comp))
        assert np.array_equal(got, img), comp

    def test_roundtrip_rgb(self):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        img = self._img(70, 90, spp=3)
        got = tiff_decode(tiff_encode_tiled(img, compression="deflate"))
        assert np.array_equal(got, img)

    def test_single_tile_inline_offsets(self):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        img = self._img(40, 50)  # fits one 64x64 tile
        got = tiff_decode(tiff_encode_tiled(img))
        assert np.array_equal(got, img)

    def test_g4_bilevel_tiles(self):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        img = np.full((100, 140), 255, np.uint8)
        img[20:80, 30:110:7] = 0
        got = tiff_decode(tiff_encode_tiled(img, compression="g4"))
        assert np.array_equal(got, img)

    def test_jpeg_tiles_within_quantization(self):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        img = self._img(80, 96)
        got = tiff_decode(tiff_encode_tiled(img, compression="jpeg"))
        assert got.shape == img.shape
        assert abs(got.astype(int) - img.astype(int)).mean() < 6

    def test_bad_tile_size_rejected(self):
        import struct

        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_encode_tiled,
        )

        data = bytearray(tiff_encode_tiled(self._img(40, 40)))
        (ifd_off,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            (tag,) = struct.unpack("<H", data[off:off + 2])
            if tag == 322:
                data[off + 8:off + 10] = struct.pack("<H", 60)  # not %16
        with pytest.raises(ValueError, match="tile size"):
            tiff_decode(bytes(data))


class TestTiffMultiPage:
    """Round-5 session-12: the IFD chain (TIFF 6.0 §2) — multi-page
    scanned-document/fax archives previously truncated silently to page 1."""

    def _pages(self, n=4):
        rng = np.random.default_rng(42)
        return [
            rng.integers(0, 256, (20 + 3 * i, 30 + 2 * i), dtype=np.uint8)
            for i in range(n)
        ]

    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits", "jpeg"])
    def test_chain_roundtrip(self, comp):
        from ocr_spark.operators.image_codecs import (
            tiff_decode,
            tiff_decode_pages,
            tiff_encode_pages,
        )

        pages = self._pages()
        data = tiff_encode_pages(pages, compression=comp)
        dec = tiff_decode_pages(data)
        assert len(dec) == len(pages)
        for a, b in zip(dec, pages):
            if comp == "jpeg":
                assert a.shape == b.shape
                assert np.abs(a.astype(int) - b.astype(int)).mean() < 20
            else:
                np.testing.assert_array_equal(a, b)
        # the single-page API still reads page 1 (back-compat)
        np.testing.assert_array_equal(tiff_decode(data), dec[0])

    def test_g4_fax_archive(self):
        # the canonical case: a multi-page G4 fax archive
        from ocr_spark.operators.image_codecs import (
            tiff_decode_pages,
            tiff_encode_pages,
        )

        pages = [np.where(p > 127, np.uint8(255), np.uint8(0))
                 for p in self._pages(5)]
        dec = tiff_decode_pages(tiff_encode_pages(pages, compression="g4"))
        assert len(dec) == 5
        for a, b in zip(dec, pages):
            np.testing.assert_array_equal(a, b)

    def test_rgb_out_of_line_pointer_shift(self):
        # RGB pages carry an out-of-line BitsPerSample array: the rebase
        # must shift the entry's value pointer, not just tag 273 values
        from ocr_spark.operators.image_codecs import (
            tiff_decode_pages,
            tiff_encode_pages,
        )

        rng = np.random.default_rng(7)
        rgb = [rng.integers(0, 256, (12, 17, 3), dtype=np.uint8) for _ in range(3)]
        dec = tiff_decode_pages(tiff_encode_pages(rgb, compression="lzw"))
        assert len(dec) == 3
        for a, b in zip(dec, rgb):
            np.testing.assert_array_equal(a, b)

    def test_single_page_has_one_entry(self):
        from ocr_spark.operators.image_codecs import (
            tiff_decode_pages,
            tiff_encode,
        )

        img = self._pages(1)[0]
        pages = tiff_decode_pages(tiff_encode(img))
        assert len(pages) == 1
        np.testing.assert_array_equal(pages[0], img)

    def test_cycle_and_budget_named_errors(self):
        import struct

        from ocr_spark.operators.image_codecs import (
            tiff_decode_pages,
            tiff_encode_pages,
        )

        data = bytearray(tiff_encode_pages(self._pages(2)))
        # point the second IFD's next pointer back at the first (cycle)
        (first_ifd,) = struct.unpack_from("<I", data, 4)
        (n1,) = struct.unpack_from("<H", data, first_ifd)
        (second_ifd,) = struct.unpack_from("<I", data, first_ifd + 2 + 12 * n1)
        (n2,) = struct.unpack_from("<H", data, second_ifd)
        struct.pack_into("<I", data, second_ifd + 2 + 12 * n2, first_ifd)
        with pytest.raises(ValueError, match="cycle"):
            tiff_decode_pages(bytes(data))
        # page budget
        pages = [np.zeros((2, 2), np.uint8)] * 3
        with pytest.raises(ValueError, match="chain budget"):
            tiff_decode_pages(tiff_encode_pages(pages), max_pages=2)

    def test_frame_sample_over_tiff_pages(self, spark):
        from ocr_spark.operators.image_codecs import tiff_encode_pages
        from ocr_spark.operators.multimodal import frame_sample

        pages = self._pages(5)
        payload = tiff_encode_pages(pages, compression="lzw")
        assets = spark.createDataFrame(
            [("scan#0", bytearray(payload)), ("bad#1", bytearray(b"II*\x00junk"))],
            "media_ref string, content binary",
        )
        rows = frame_sample(assets, every_n=2).collect()
        good = [r for r in rows if r["media_ref"] == "scan#0"]
        assert [r["frame_idx"] for r in good] == [0, 2, 4]
        assert all(r["n_frames"] == 5 for r in good)
        for r in good:
            assert (r["height"], r["width"]) == pages[r["frame_idx"]].shape
            exp = float(
                np.mean(pages[r["frame_idx"]].astype(np.float64))
            )
            assert abs(r["mean_intensity"] - exp) < 1e-6
        bad = [r for r in rows if r["media_ref"] == "bad#1"]
        assert len(bad) == 1 and bad[0]["error"] is not None
