"""Adversarial byte-fuzz over the session-11 decoders.

The per-image/per-asset envelope upstream catches EXCEPTIONS — it cannot
catch hangs, and callers that filter on ValueError would crash on foreign
exception types. So for every new decoder: deterministic corruption
sweeps (bit flips, truncations, random tails) must terminate fast and
raise nothing but ValueError (or return a valid array). Seeds are fixed;
each case is time-boxed by construction (small inputs + the decoders'
dimension budgets)."""

from __future__ import annotations

import numpy as np
import pytest

N_FLIPS = 40
N_TRUNC = 12


def _corruptions(rng, data: bytes):
    """Deterministic corruption stream: single byte flips, truncations,
    random garbage with the same prefix."""
    data = bytearray(data)
    for _ in range(N_FLIPS):
        i = int(rng.integers(0, len(data)))
        out = bytearray(data)
        out[i] ^= int(rng.integers(1, 256))
        yield bytes(out)
    for _ in range(N_TRUNC):
        yield bytes(data[: int(rng.integers(0, len(data)))])
    for _ in range(6):
        n = int(rng.integers(4, 80))
        yield bytes(rng.integers(0, 256, n, dtype=np.uint8))


def _sweep(decode, payload: bytes, seed: int):
    rng = np.random.default_rng(seed)
    ok = err = 0
    for cand in _corruptions(rng, payload):
        try:
            out = decode(cand)
            assert isinstance(out, np.ndarray)
            ok += 1
        except ValueError:
            err += 1
        # anything else (TypeError, struct.error, IndexError, OverflowError,
        # RecursionError, hang) fails the test by propagating/timeout
    assert ok + err == N_FLIPS + N_TRUNC + 6


def test_fuzz_fax_g4():
    from ocr_spark.operators.fax_codec import g4_decode, g4_encode

    rng = np.random.default_rng(1)
    img = (rng.random((20, 60)) < 0.3).astype(np.uint8)
    payload = g4_encode(img)
    _sweep(lambda d: g4_decode(d, 60, 20), payload, 101)


def test_fuzz_fax_g3():
    from ocr_spark.operators.fax_codec import g3_1d_decode, g3_1d_encode

    rng = np.random.default_rng(2)
    img = (rng.random((12, 48)) < 0.4).astype(np.uint8)
    payload = g3_1d_encode(img, byte_align=True)
    _sweep(lambda d: g3_1d_decode(d, 48, 12, byte_align=True), payload, 102)


def test_fuzz_tiff_ccitt():
    from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

    img = np.full((24, 64), 255, np.uint8)
    img[6:18, 10:50:5] = 0
    _sweep(tiff_decode, tiff_encode(img, compression="g4"), 103)


def test_fuzz_tiff_tiled():
    from ocr_spark.operators.image_codecs import (
        tiff_decode,
        tiff_encode_tiled,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 70), dtype=np.uint8)
    _sweep(tiff_decode, tiff_encode_tiled(img, compression="deflate"), 104)


def test_fuzz_tiff_jpeg7():
    from ocr_spark.operators.image_codecs import tiff_decode, tiff_encode

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    _sweep(tiff_decode, tiff_encode(img, compression="jpeg"), 105)


def test_fuzz_jbig2_generic():
    from ocr_spark.operators.jbig2_codec import jbig2_decode, jbig2_encode

    rng = np.random.default_rng(5)
    img = (rng.random((18, 40)) < 0.35).astype(np.uint8)
    _sweep(jbig2_decode, jbig2_encode(img), 106)


def test_fuzz_jbig2_text():
    from ocr_spark.operators.jbig2_codec import (
        jbig2_decode,
        jbig2_encode_text,
    )

    rng = np.random.default_rng(6)
    syms = [
        (rng.random((int(rng.integers(4, 9)), int(rng.integers(3, 8)))) < 0.5)
        .astype(np.uint8)
        for _ in range(4)
    ]
    placements = [(i, 2 + 9 * i, 3) for i in range(4)]
    _sweep(jbig2_decode, jbig2_encode_text(syms, placements, (50, 16)), 107)


def test_fuzz_jp2():
    from ocr_spark.operators.jp2_codec import jp2_decode, jp2_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 28), dtype=np.uint8)
    _sweep(jp2_decode, jp2_encode(img, levels=2), 108)


def test_fuzz_jp2_raw_codestream():
    from ocr_spark.operators.jp2_codec import jp2k_decode, jp2k_encode

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 22), dtype=np.uint8)
    _sweep(jp2k_decode, jp2k_encode(img, levels=1), 109)


def test_fuzz_jp2_irreversible():
    # the 9/7 quantized profile: corrupt QCD (eps, mu) pairs, float DWT
    # inputs and packet bodies must all stay inside the ValueError contract
    from ocr_spark.operators.jp2_codec import jp2k_decode, jp2k_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 22), dtype=np.uint8)
    _sweep(jp2k_decode, jp2k_encode(img, levels=1, irreversible=True), 121)


def test_fuzz_jp2_tiled():
    # multi-tile + tile-part streams: SOT bookkeeping (Isot/Psot/TPsot)
    # under corruption must stay inside the ValueError contract
    from ocr_spark.operators.jp2_codec import jp2k_decode, jp2k_encode

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    _sweep(jp2k_decode, jp2k_encode(img, levels=1, tiles=(32, 32),
                                    tile_parts=2), 122)


def test_fuzz_jbig2_halftone():
    # pattern-dictionary + halftone-region streams: grid arithmetic,
    # gray-plane decode and pattern stamping under corruption stay inside
    # the ValueError contract
    from ocr_spark.operators.jbig2_codec import (
        jbig2_decode,
        jbig2_encode_halftone,
    )

    rng = np.random.default_rng(11)
    bayer = np.array([[0, 8, 2, 10], [12, 4, 14, 6],
                      [3, 11, 1, 9], [15, 7, 13, 5]])
    pats = [(bayer < 4 * lvl).astype(np.uint8) for lvl in range(5)]
    gi = rng.integers(0, 5, (6, 8))
    _sweep(jbig2_decode, jbig2_encode_halftone(gi, pats), 123)


# -- pre-existing decoders: same contract, older code ----------------------


def test_fuzz_png():
    from ocr_spark.operators.cloud_engine import png_decode, png_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (20, 26), dtype=np.uint8)
    _sweep(png_decode, png_encode(img), 110)


def test_fuzz_jpeg():
    from ocr_spark.operators.image_codecs import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    _sweep(jpeg_decode, jpeg_encode(img), 111)


def test_fuzz_gif():
    from ocr_spark.operators.image_codecs import (
        gif_decode_frames,
        gif_encode,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    _sweep(lambda d: gif_decode_frames(d)[0], gif_encode(img), 112)


def test_fuzz_bmp():
    from ocr_spark.operators.image_codecs import bmp_decode, bmp_encode

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (14, 18, 3), dtype=np.uint8)
    _sweep(bmp_decode, bmp_encode(img), 113)


def test_fuzz_webp():
    from ocr_spark.operators.webp_codec import webp_decode, webp_encode

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    _sweep(webp_decode, webp_encode(img), 114)


def test_fuzz_wav():
    from ocr_spark.operators.audio_codecs import wav_decode, wav_encode

    rng = np.random.default_rng(14)
    samples = rng.integers(-3000, 3000, (500, 1)).astype(np.int16)
    payload = wav_encode(samples, 8000)

    def dec(d):
        out, _sr = wav_decode(d)
        return out

    _sweep(dec, payload, 115)


def test_fuzz_flac():
    from ocr_spark.operators.flac_codec import flac_decode, flac_encode

    rng = np.random.default_rng(15)
    samples = (
        np.cumsum(rng.integers(-80, 80, (400, 1)), axis=0)
        .clip(-30000, 30000)
        .astype(np.int16)
    )
    payload = flac_encode(samples, 8000)

    def dec(d):
        out, _sr = flac_decode(d)
        return out

    _sweep(dec, payload, 116)


def test_fuzz_pdf_decrypt():
    """decrypt_pdf under the same corruption stream: every corrupted
    encrypted document either decrypts (bytes out) or raises ValueError —
    never struct.error/IndexError/TypeError, never hangs. Corruptions hit
    the /Encrypt dict, the O/U/UE hex strings, stream ciphertext, and the
    trailer alike."""
    from ocr_spark.operators.pdf_crypt import decrypt_pdf, encrypt_pdf
    from ocr_spark.operators.pdf_layout import pdf_write

    plain = pdf_write([{"x": 40, "y": 50, "text": "fuzz target"}], compress=True)
    for variant, seed in (("rc4-128", 117), ("aesv2", 118), ("aesv3", 119)):
        payload = encrypt_pdf(plain, variant=variant)
        rng = np.random.default_rng(seed)
        ok = err = 0
        for cand in _corruptions(rng, payload):
            try:
                out = decrypt_pdf(cand)
                assert isinstance(out, bytes)
                ok += 1
            except ValueError:
                err += 1
        assert ok + err == N_FLIPS + N_TRUNC + 6


def test_fuzz_tiff_multipage():
    # IFD chain walking: corrupt next pointers / entry counts must stay
    # inside the ValueError contract (cycle + budget guards, no hangs)
    from ocr_spark.operators.image_codecs import (
        tiff_decode_pages,
        tiff_encode_pages,
    )

    rng = np.random.default_rng(12)
    pages = [rng.integers(0, 256, (10, 14), dtype=np.uint8) for _ in range(3)]
    payload = tiff_encode_pages(pages, compression="lzw")
    rng = np.random.default_rng(124)
    ok = err = 0
    for cand in _corruptions(rng, payload):
        try:
            out = tiff_decode_pages(cand)
            assert isinstance(out, list)
            ok += 1
        except ValueError:
            err += 1
    assert ok + err == N_FLIPS + N_TRUNC + 6
