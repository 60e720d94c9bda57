"""Embedded PDF image XObjects -> media assets (the scanned-document OCR
feed). Ref anchor: the reference's acquisition layer loads scanned pages
(ocr_workflow_orchestrator.py:153-178); on the web those travel inside PDFs
as image XObjects, so pdf_images is the S7-analog surface for them.

Binary payloads are not SQL-expressible — pytest-golden per the board
convention (SURVEY §5.2): fixture PDFs are written by the repo's own
pdf_write_images and every decode path round-trips bit-exactly (JPEG within
quantization noise)."""

import re

import numpy as np
import pytest

from ocr_spark.operators.multimodal import decode_image, image_features, pdf_image_assets
from ocr_spark.operators.pdf_layout import (
    pdf_images,
    pdf_parse_blocks,
    pdf_write,
    pdf_write_images,
)

GRAY = (np.arange(24 * 32).reshape(24, 32) % 251).astype(np.uint8)
RNG = np.random.default_rng(7)
RGB = RNG.integers(0, 256, (16, 20, 3), dtype=np.uint8)
BIL = RNG.integers(0, 2, (18, 26), dtype=np.uint8) * 255


def test_roundtrip_all_codecs():
    pdf = pdf_write_images(
        [{"x": 40, "y": 40, "text": "Scan cover sheet"}],
        [(GRAY, "jpeg"), (RGB, "flate"), (GRAY, "flate_png"), (BIL, "bilevel")],
    )
    imgs = pdf_images(pdf)
    assert [r["error"] for r in imgs] == [None] * 4
    assert [(r["width"], r["height"]) for r in imgs] == [
        (32, 24), (20, 16), (32, 24), (26, 18)
    ]
    assert imgs[0]["format"] == "jpeg" and imgs[0]["content"][:2] == b"\xff\xd8"
    jr = decode_image(imgs[0]["content"])
    assert jr.shape == GRAY.shape
    assert abs(jr.astype(int) - GRAY.astype(int)).mean() < 4  # quantization
    assert np.array_equal(decode_image(imgs[1]["content"]), RGB)
    assert np.array_equal(decode_image(imgs[2]["content"]), GRAY)
    assert np.array_equal(decode_image(imgs[3]["content"]), BIL)


def test_text_layer_survives_images():
    pdf = pdf_write_images([{"x": 40, "y": 40, "text": "Cover"}], [(RGB, "flate")])
    blocks, _, _ = pdf_parse_blocks(pdf)
    assert any("Cover" in b["text"] for b in blocks)


def test_lossy_jpx_decodes_and_truncated_stream_named_envelope():
    # a lossy (9/7 quantized) JPX stream decodes for REAL since session 12;
    # reconstruction must stay within a few intensity levels of the source
    pdf = pdf_write_images([], [(GRAY, "jpx_lossy"), (GRAY, "flate")])
    imgs = pdf_images(pdf)
    assert imgs[0]["error"] is None
    lossy = decode_image(imgs[0]["content"])
    assert lossy.shape == GRAY.shape
    assert np.abs(lossy.astype(int) - GRAY.astype(int)).max() <= 4
    assert imgs[1]["error"] is None
    assert np.array_equal(decode_image(imgs[1]["content"]), GRAY)
    # a corrupted JPX stream still degrades to a named row, peers
    # untouched: force an undefined QCD quantization style (3)
    qcd = pdf.find(b"\xff\x5c")
    assert qcd > 0
    sqcd = pdf[qcd + 4]
    bad = pdf[: qcd + 4] + bytes([(sqcd & ~0x1F) | 3]) + pdf[qcd + 5 :]
    imgs2 = pdf_images(bad)
    assert imgs2[0]["error"] is not None and imgs2[0]["content"] is None
    assert "style 3" in imgs2[0]["error"]
    assert np.array_equal(decode_image(imgs2[1]["content"]), GRAY)


def test_jpx_lossless_decode():
    pdf = pdf_write_images([], [(GRAY, "jpx")])
    img = pdf_images(pdf)[0]
    assert img["error"] is None and img["format"] == "png"
    assert np.array_equal(decode_image(img["content"]), GRAY)


def test_jbig2_generic_region_decode():
    pdf = pdf_write_images([], [(GRAY, "jbig2")])
    img = pdf_images(pdf)[0]
    assert img["error"] is None and img["format"] == "png"
    want = np.where(GRAY < 128, 0, 255).astype(np.uint8)
    assert np.array_equal(decode_image(img["content"]), want)
    # /Decode [1 0] inverts
    pdf_inv = pdf.replace(
        b"/BitsPerComponent 1 ", b"/BitsPerComponent 1 /Decode [1 0] "
    )
    got = decode_image(pdf_images(pdf_inv)[0]["content"])
    assert np.array_equal(got, 255 - want)


def test_jbig2_text_region_decode():
    # symbol-dictionary + text-region stream (the scanner layout)
    pdf = pdf_write_images([], [(GRAY, "jbig2_text")])
    img = pdf_images(pdf)[0]
    assert img["error"] is None and img["format"] == "png"
    h, w = GRAY.shape
    bl = (GRAY < 128).astype(np.uint8)
    want = np.zeros((h, w), np.uint8)
    want[: h // 2, : w // 2] = bl[: h // 2, : w // 2]
    want[h // 2 :, w // 2 :] = bl[h // 2 :, w // 2 :]
    got = decode_image(img["content"])
    assert np.array_equal(got, ((1 - want) * 255).astype(np.uint8))


def test_jbig2_halftone_decodes():
    # halftone-coded JBIG2 decodes for REAL since session 12: the fixture
    # quantizes to 5 density levels through a Bayer 4x4 pattern bank —
    # reproduce that rendering independently and compare exactly
    pdf = pdf_write_images([], [(GRAY, "jbig2_halftone"), (GRAY, "jbig2")])
    imgs = pdf_images(pdf)
    assert imgs[0]["error"] is None
    assert imgs[1]["error"] is None
    bayer = np.array(
        [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]]
    )
    h, w = GRAY.shape
    gh, gw = (h + 3) // 4, (w + 3) // 4
    pad = np.full((gh * 4, gw * 4), 255, np.uint8)
    pad[:h, :w] = GRAY
    cells = pad.reshape(gh, 4, gw, 4).mean(axis=(1, 3))
    gi = np.clip(((255.0 - cells) / 51.0).round(), 0, 4).astype(int)
    want = np.zeros((gh * 4, gw * 4), np.uint8)
    for m in range(gh):
        for n in range(gw):
            want[4 * m : 4 * m + 4, 4 * n : 4 * n + 4] = (
                bayer < 4 * gi[m, n]
            )
    got = decode_image(imgs[0]["content"])
    assert np.array_equal(got, ((1 - want) * 255).astype(np.uint8))


def test_ccitt_fax_decode():
    # real G4 (K=-1) and G3 1-D (K=0) CCITTFaxDecode streams
    pdf = pdf_write_images([], [(GRAY, "ccitt"), (GRAY, "ccitt_g3")])
    imgs = pdf_images(pdf)
    assert [r["error"] for r in imgs] == [None, None]
    want = np.where(GRAY < 128, 0, 255).astype(np.uint8)
    for r in imgs:
        assert r["format"] == "png"
        assert np.array_equal(decode_image(r["content"]), want)


def test_ccitt_blackis1_and_decode_inversion():
    pdf = pdf_write_images([], [(GRAY, "ccitt")])
    want = np.where(GRAY < 128, 0, 255).astype(np.uint8)
    # /BlackIs1 true flips the filter's sample sense -> inverted pixels
    pdf_b1 = pdf.replace(b"/K -1 ", b"/K -1 /BlackIs1 true ")
    got = decode_image(pdf_images(pdf_b1)[0]["content"])
    assert np.array_equal(got, 255 - want)
    # /Decode [1 0] on top of BlackIs1 cancels back to the original
    pdf_both = pdf_b1.replace(
        b"/BitsPerComponent 1 ", b"/BitsPerComponent 1 /Decode [1 0] "
    )
    got2 = decode_image(pdf_images(pdf_both)[0]["content"])
    assert np.array_equal(got2, want)


def test_decode_array_inversion():
    pdf = pdf_write_images([], [(BIL, "bilevel")])
    # splice /Decode [1 0] into the image dict (writer emits default sense)
    pdf2 = pdf.replace(b"/BitsPerComponent 1 ", b"/BitsPerComponent 1 /Decode [1 0] ")
    plain = decode_image(pdf_images(pdf)[0]["content"])
    inv = decode_image(pdf_images(pdf2)[0]["content"])
    assert np.array_equal(inv, 255 - plain)


def test_truncated_image_body_is_per_image_error():
    pdf = pdf_write_images([], [(RGB, "flate")])
    # corrupt the zlib body: flip bytes mid-stream
    i = pdf.find(b"stream\n", pdf.find(b"/Subtype /Image")) + len(b"stream\n")
    bad = pdf[: i + 8] + bytes([pdf[i + 8] ^ 0xFF]) + pdf[i + 9 :]
    imgs = pdf_images(bad)
    assert len(imgs) == 1 and imgs[0]["error"] is not None


def test_no_images_yields_empty():
    assert pdf_images(pdf_write([{"x": 1, "y": 1, "text": "t"}])) == []


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_assets_and_feature_composition(self, spark):
        pdf_imgs = pdf_write_images(
            [{"x": 40, "y": 40, "text": "Cover"}],
            [(GRAY, "jpeg"), (RGB, "flate"), (GRAY, "ccitt"),
             (GRAY, "jpx_lossy")],
        )
        pdf_plain = pdf_write([{"x": 1, "y": 1, "text": "text only"}])
        docs = spark.createDataFrame(
            [
                ("d1", pdf_imgs.decode("latin-1")),
                ("d2", pdf_plain.decode("latin-1")),
                ("d3", "not a pdf"),
                ("d4", None),
            ],
            "doc_id string, payload string",
        )
        assets = pdf_image_assets(docs)
        rows = {r["media_ref"]: r for r in assets.collect()}
        # d1: four image rows (one errored); d2: none; d3/d4: doc envelopes
        assert set(rows) == {
            "d1#img0", "d1#img1", "d1#img2", "d1#img3", "d3#img", "d4#img"
        }
        assert rows["d1#img0"]["format"] == "jpeg"
        assert rows["d1#img1"]["format"] == "png"
        assert rows["d1#img2"]["format"] == "png"  # real G4 fax decode
        assert rows["d1#img3"]["error"] is None  # lossy JPX decodes for real
        assert rows["d1#img3"]["format"] == "png"
        assert "not a PDF" in rows["d3#img"]["error"]
        assert "null payload" in rows["d4#img"]["error"]
        # zero Exchange: one Arrow stage over the scan
        plan = assets._sc._jvm.PythonSQLUtils.explainString(
            assets._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        # composition: the extracted assets feed the image feature kernels
        # (format is the codec — pdf_image_assets emits self-describing
        # JPEG/PNG bodies, so meta.codec routes to the real decoders)
        from pyspark.sql import functions as F

        feats = image_features(
            assets.where(assets.error.isNull()).select(
                "media_ref",
                F.lit("image").alias("media_type"),
                "content",
                F.struct(
                    F.col("width"),
                    F.col("height"),
                    F.length("content").cast("long").alias("n_bytes"),
                    F.col("format").alias("codec"),
                ).alias("meta"),
            )
        ).collect()
        got = {r["media_ref"]: r for r in feats}
        assert got["d1#img1"]["width"] == 20 and got["d1#img1"]["height"] == 16
        assert got["d1#img0"]["error"] is None


class TestOcrLoop:
    def test_pdf_scan_to_ocr_spans(self, spark):
        """The full scanned-document loop: a crawl PDF carrying an embedded
        scan -> pdf_image_assets -> media sidecar -> extract_documents OCR
        kernels -> spans. Invariant: the SAME image delivered as a direct
        PNG sidecar asset extracts the SAME span text as the one recovered
        from inside the PDF (the container must be transparent)."""
        from ocr_spark.pipeline import extract_documents
        from ocr_spark.schema import DOC_SCHEMA
        from ocr_spark.operators.cloud_engine import png_encode
        from ocr_spark.sources.media import synth_media_bytes

        # a deterministic fake scan from the fixture generator family
        scan = np.frombuffer(
            synth_media_bytes("media://scan-1"), np.uint8
        )[: 32 * 32].reshape(32, 32)
        pdf = pdf_write_images(
            [{"x": 40, "y": 40, "text": "cover"}], [(scan, "flate")]
        )
        pdf_docs = spark.createDataFrame(
            [("p1", pdf.decode("latin-1"))], "doc_id string, payload string"
        )
        assets = pdf_image_assets(pdf_docs).where("error IS NULL")

        sidecar = assets.select("media_ref", "content").union(
            spark.createDataFrame(
                [("direct.png", bytearray(png_encode(scan)))],
                "media_ref string, content binary",
            )
        )
        docs = spark.createDataFrame(
            [
                ("from_pdf", [("media", None, "p1#img0", 0)]),
                ("direct", [("media", None, "direct.png", 0)]),
            ],
            DOC_SCHEMA,
        )
        out = {
            r.doc_id: r
            for r in extract_documents(docs, media_sidecar=sidecar).collect()
        }
        assert out["from_pdf"].error is None and out["direct"].error is None
        assert out["from_pdf"].spans[0].text == out["direct"].spans[0].text


def test_ccitt_review_hardening():
    """Interop tolerances from the adversarial review: /Rows 0 means 'not
    predetermined' (fall back to /Height), and K>0 streams written with
    the PDF-default /EndOfLine false (tag bits only, no EOLs) decode."""
    want = np.where(GRAY < 128, 0, 255).astype(np.uint8)
    # /Rows 0 must behave like an absent /Rows
    pdf = pdf_write_images([], [(GRAY, "ccitt")])
    h = GRAY.shape[0]
    pdf_r0 = pdf.replace(f"/Rows {h}".encode(), b"/Rows 0")
    assert pdf_r0 != pdf
    img = pdf_images(pdf_r0)[0]
    assert img["error"] is None
    assert np.array_equal(decode_image(img["content"]), want)
    # K>0 without EOLs (the G3 2-D tag-bit-only layout)
    pdf2 = pdf_write_images([], [(GRAY, "ccitt_g3_2d")])
    img2 = pdf_images(pdf2)[0]
    assert img2["error"] is None
    assert np.array_equal(decode_image(img2["content"]), want)
