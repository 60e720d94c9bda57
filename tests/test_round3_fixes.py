"""Regression tests for the round-3 ADVICE fixes: byte-string conf parsing,
aspect-preserving sidecar fit, DB-path F6 area filter, checkpoint commit
exception (the latter lives in test_checkpoint.py)."""

import numpy as np
import pytest

from ocr_spark.operators.dedup import byte_string_as_bytes


class TestByteStringAsBytes:
    """spark.sql.files.maxPartitionBytes may carry a unit suffix; digit-only
    parsing read '128m' as 128 bytes and silently skipped the protective
    repartition exactly when the user tuned the conf."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("134217728b", 134217728),
            ("134217728", 134217728),
            ("128m", 128 << 20),
            ("64MB", 64 << 20),
            ("1g", 1 << 30),
            ("2GB", 2 << 30),
            ("512k", 512 << 10),
            ("512kb", 512 << 10),
            ("1t", 1 << 40),
            (" 16m ", 16 << 20),
        ],
    )
    def test_suffixes(self, raw, expected):
        assert byte_string_as_bytes(raw) == expected

    @pytest.mark.parametrize("raw", ["", "garbage", "12x", "m128", "1.5g"])
    def test_unparseable_falls_back_to_default(self, raw):
        assert byte_string_as_bytes(raw) == 134217728
        assert byte_string_as_bytes(raw, default=7) == 7


class TestFitPadGray:
    def test_aspect_preserved_landscape(self):
        from ocr_spark.operators.dispatch import _fit_pad_gray

        g = np.full((48, 64), 200, np.uint8)  # ratio 0.5 → 24x32 content
        out = _fit_pad_gray(g, 32)
        assert out.shape == (32, 32)
        assert (out[:24, :32] > 0).all()
        assert (out[24:] == 0).all()  # bottom zero-pad, no distortion

    def test_aspect_preserved_portrait(self):
        from ocr_spark.operators.dispatch import _fit_pad_gray

        g = np.full((64, 16), 100, np.uint8)  # ratio 0.5 → 32x8 content
        out = _fit_pad_gray(g, 32)
        assert out.shape == (32, 32)
        assert (out[:, :8] > 0).all()
        assert (out[:, 8:] == 0).all()  # right zero-pad

    def test_native_size_identity(self):
        from ocr_spark.operators.dispatch import _fit_pad_gray

        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, (32, 32), np.uint8)
        assert (_fit_pad_gray(g, 32) == g).all()


class TestDbF6AreaFilter:
    def test_sheared_sliver_dropped(self, monkeypatch):
        """A sheared parallelogram with both edge norms >= min_box_size but
        shoelace area < min_box_size² passes F4 yet must be dropped by F6
        before warping (ref local_ocr_engine.py:294-296) — previously the DB
        path skipped the area check the quad path applies."""
        import ocr_spark.operators.db_detect as dbd

        # edges ~5px long but nearly collinear: area = |e1 x e2| ≈ 1.5 < 9
        sliver = np.array(
            [[0.0, 0.0], [5.0, 0.3], [10.0, 0.9], [5.0, 0.6]], dtype=np.float64
        )
        from ocr_spark.operators.quad_geometry import quad_areas

        assert quad_areas(sliver[None])[0] < 9.0
        monkeypatch.setattr(dbd, "db_detect_quads", lambda g, **kw: sliver[None])
        text, conf = dbd.recognize_db_image(np.full((32, 32), 128, np.uint8))
        assert text == "" and conf == 0.0
