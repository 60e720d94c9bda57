"""Quad-geometry tests: W1 ordering, F6 area filter, K9 dims, K10 perspective
warp, and the full quad-path recognizer (batch ≡ scalar).

Reference semantics: ocr_components/local_ocr_engine.py:255-264 (W1),
:294-296 (F6), :270-281 (K9), :283-342 (K10)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.quad_geometry import (
    REC_IMG_H,
    REC_IMG_W,
    detect_quads,
    get_perspective_transform,
    order_quad,
    order_quads,
    quad_areas,
    recognize_quad_batch,
    recognize_quads_image,
    target_crop_dims,
    warp_perspective,
    warp_quad,
)


def _grays(n: int, offset: int = 0) -> np.ndarray:
    from ocr_spark.sources.media import synth_media_batch

    return synth_media_batch([f"q{i + offset}" for i in range(n)])


# ---------------------------------------------------------------------------
# W1: ordering
# ---------------------------------------------------------------------------


def _ref_order(points: np.ndarray) -> np.ndarray:
    """Direct transcription of the reference's ordering (ref :258-264)."""
    rect = np.zeros((4, 2))
    s = points.sum(axis=1)
    rect[0] = points[np.argmin(s)]
    rect[2] = points[np.argmax(s)]
    diff = np.diff(points, axis=1)
    rect[1] = points[np.argmin(diff)]
    rect[3] = points[np.argmax(diff)]
    return rect


def test_order_quad_axis_aligned_all_rolls():
    base = np.array([[2.0, 3.0], [10.0, 3.0], [10.0, 8.0], [2.0, 8.0]])
    for roll in range(4):
        got = order_quad(np.roll(base, roll, axis=0))
        np.testing.assert_array_equal(got, base)


def test_order_quads_matches_reference_on_random():
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 100, size=(200, 4, 2))
    batched = order_quads(pts)
    for i in range(len(pts)):
        np.testing.assert_array_equal(batched[i], _ref_order(pts[i]))


def test_order_quad_rotated():
    # a 10°-rotated rectangle: ordering must still find the TL,TR,BR,BL roles
    theta = np.radians(10.0)
    c, s = np.cos(theta), np.sin(theta)
    base = np.array([[-5.0, -2.0], [5.0, -2.0], [5.0, 2.0], [-5.0, 2.0]])
    rot = base @ np.array([[c, s], [-s, c]]) + 50.0
    got = order_quad(np.roll(rot, 2, axis=0))
    np.testing.assert_allclose(got, rot, atol=1e-12)


# ---------------------------------------------------------------------------
# F6: areas
# ---------------------------------------------------------------------------


def test_quad_areas_shoelace():
    sq = np.array([[[0.0, 0], [4, 0], [4, 4], [0, 4]]])
    assert quad_areas(sq)[0] == 16.0
    tri_ish = np.array([[[0.0, 0], [6, 0], [6, 3], [0, 3]]])
    assert quad_areas(tri_ish)[0] == 18.0
    degenerate = np.array([[[1.0, 1], [1, 1], [1, 1], [1, 1]]])
    assert quad_areas(degenerate)[0] == 0.0


# ---------------------------------------------------------------------------
# K9: target dims (reference math)
# ---------------------------------------------------------------------------


def test_target_crop_dims_reference_math():
    # 20 wide × 5 tall → aspect 4 → width = int(48*4) = 192
    q = np.array([[[0.0, 0], [19, 0], [19, 4], [0, 4]]])
    # edges: w = 19, h = 4  → aspect 4.75 → int(48*4.75) = 228
    assert target_crop_dims(q)[0] == 228
    # degenerate → width 10 (ref :277)
    z = np.array([[[1.0, 1], [1, 1], [1, 1], [1, 1]]])
    assert target_crop_dims(z)[0] == 10
    # clamp to max width
    wide = np.array([[[0.0, 0], [999, 0], [999, 2], [0, 2]]])
    assert target_crop_dims(wide)[0] == REC_IMG_W
    # clamp to min 1
    tall = np.array([[[0.0, 0], [1, 0], [1, 400], [0, 400]]])
    assert target_crop_dims(tall)[0] == 1


# ---------------------------------------------------------------------------
# K10: homography + warp
# ---------------------------------------------------------------------------


def test_homography_maps_corners_exactly():
    rng = np.random.default_rng(7)
    for _ in range(20):
        src = rng.uniform(0, 31, size=(4, 2))
        dst = np.array([[0.0, 0], [99, 0], [99, 47], [0, 47]])
        try:
            h = get_perspective_transform(src, dst)
        except np.linalg.LinAlgError:
            continue  # collinear sample — cv2 would fail the same way
        ones = np.hstack([src, np.ones((4, 1))])
        mapped = ones @ h.T
        mapped = mapped[:, :2] / mapped[:, 2:3]
        np.testing.assert_allclose(mapped, dst, atol=1e-8)


def test_warp_identity_crop():
    # axis-aligned quad warped to its own size == plain crop
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    x0, y0, w, h = 4, 10, 12, 6
    src = np.array(
        [[x0, y0], [x0 + w - 1, y0], [x0 + w - 1, y0 + h - 1], [x0, y0 + h - 1]],
        dtype=np.float64,
    )
    dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], dtype=np.float64)
    hm = get_perspective_transform(src, dst)
    warped = warp_perspective(img, hm, w, h)
    np.testing.assert_allclose(warped, img[y0 : y0 + h, x0 : x0 + w], atol=1e-9)


def test_warp_rotation_roundtrip():
    # warping a rotated quad of a smooth gradient recovers the upright crop
    yy, xx = np.mgrid[0:32, 0:32]
    img = (4 * xx + 2 * yy).astype(np.uint8)
    theta = np.radians(10.0)
    c, s = np.cos(theta), np.sin(theta)
    base = np.array([[-8.0, -3.0], [8.0, -3.0], [8.0, 3.0], [-8.0, 3.0]])
    src = base @ np.array([[c, s], [-s, c]]) + 16.0
    dst = np.array([[0.0, 0], [16, 0], [16, 6], [0, 6]])
    hm = get_perspective_transform(src, dst)
    warped = warp_perspective(img, hm, 17, 7)
    # interior of the warped region should follow the same gradient direction
    dx = np.diff(warped[3, 2:-2])
    assert (dx > 0).all()


def test_warp_out_of_bounds_is_zero():
    img = np.full((32, 32), 200, dtype=np.uint8)
    src = np.array([[20.0, 20], [60, 20], [60, 40], [20, 40]])  # exceeds image
    dst = np.array([[0.0, 0], [40, 0], [40, 20], [0, 20]])
    hm = get_perspective_transform(src, dst)
    warped = warp_perspective(img, hm, 41, 21)
    assert warped[0, 0] == 200.0  # inside
    assert warped[20, 40] == 0.0  # outside → border 0


def test_axis_aligned_fast_path_matches_general():
    """The axis-aligned warp shortcut must reproduce the homography path
    (same corner-anchored sampling model) to FP tolerance."""
    from ocr_spark.operators.quad_geometry import (
        _warp_axis_aligned,
        get_perspective_transform,
        warp_perspective,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 32), np.uint8)
    for x0, y0, x1, y1 in [(2, 3, 20, 9), (0, 0, 31, 31), (5, 5, 6, 6)]:
        quad = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
        )
        tw = int(target_crop_dims(quad[None])[0])
        dst = np.array(
            [[0, 0], [tw - 1, 0], [tw - 1, REC_IMG_H - 1], [0, REC_IMG_H - 1]],
            dtype=np.float64,
        )
        general = warp_perspective(
            img, get_perspective_transform(quad, dst), tw, REC_IMG_H
        )
        fast = _warp_axis_aligned(img, quad, tw, REC_IMG_H)
        np.testing.assert_allclose(fast, general, atol=1e-8)


def test_warp_quad_normalize_and_pad():
    img = np.full((32, 32), 255, dtype=np.uint8)
    q = np.array([[0.0, 0], [15, 0], [15, 7], [0, 7]])
    padded = warp_quad(img, q)
    assert padded.shape == (REC_IMG_H, REC_IMG_W)
    tw = int(target_crop_dims(q[None])[0])
    np.testing.assert_allclose(padded[:, :tw], 1.0)  # 255 → +1
    np.testing.assert_allclose(padded[:, tw:], -1.0)  # pad value −1


# ---------------------------------------------------------------------------
# detector + full path
# ---------------------------------------------------------------------------


def test_detect_quads_deterministic_and_in_bounds():
    g = _grays(6)
    for img in g:
        q1, q2 = detect_quads(img), detect_quads(img.copy())
        np.testing.assert_array_equal(q1, q2)
        if len(q1):
            assert q1[..., 0].min() >= 0 and q1[..., 0].max() <= 31
            assert q1[..., 1].min() >= 0 and q1[..., 1].max() <= 31


def test_detect_quads_scrambles_but_orders_back():
    g = _grays(10, offset=50)
    any_rotated = False
    for img in g:
        quads = detect_quads(img)
        if not len(quads):
            continue
        ordered = order_quads(quads)
        # ordered TL must be the lexicographically-smallest corner by (x+y)
        for oq in ordered:
            sums = oq.sum(axis=1)
            assert sums[0] == sums.min()
            assert sums[2] == sums.max()
        if not np.allclose(quads, order_quads(quads)):
            any_rotated = True
    assert any_rotated, "scrambling should produce at least one reordering"


def test_recognize_quad_batch_matches_scalar():
    g = _grays(24, offset=100)
    texts_b, confs_b = recognize_quad_batch(g)
    for i in range(len(g)):
        t, c = recognize_quads_image(g[i])
        assert texts_b[i] == t
        assert confs_b[i] == pytest.approx(c, abs=1e-12)


def test_quad_engine_e2e(spark):
    from ocr_spark.fixtures import generate_docs
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    docs = spark.createDataFrame(generate_docs(30), DOC_SCHEMA)
    out = extract_documents(docs, media_engine="local_warp")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 30
    rows2 = {
        r.doc_id: r
        for r in extract_documents(docs, media_engine="local_warp").collect()
    }
    assert rows == rows2


def test_warp_quad_degenerate_width_no_crash():
    """A thin rotated strip passes F6 (area >= 9) but K9 clamps its target
    width to 1 — the dst rectangle degenerates and the DLT system is
    singular; the bilinear-surface fallback must handle it (review finding:
    previously LinAlgError killed the task)."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (32, 32), np.uint8)
    quad = np.array([[10.0, 1.0], [10.5, 1.0], [11.2, 30.0], [10.7, 30.0]])
    tw = int(target_crop_dims(quad[None])[0])
    assert tw == 1
    padded = warp_quad(img, quad)
    assert padded.shape == (REC_IMG_H, REC_IMG_W)
    assert np.isfinite(padded).all()
    # collinear src corners also fall back instead of raising
    collinear = np.array([[0.0, 0], [10, 10], [20, 20], [5, 5]])
    padded2 = warp_quad(img, collinear, tw=8)
    assert np.isfinite(padded2).all()
