"""Fidelity tests for the K2/K3/K4/K6 preprocessing kernels upgraded in
round 2: minAreaRect skew estimation (≤0.5° — the reference's own deskew
accuracy target, OCR-X_Requirements_Specification.md:22), bicubic rotation,
gaussian adaptive threshold, and the detection preprocess leg."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators import media_kernels as MK


def bands_img(h=96, w=96):
    img = np.full((h, w), 255, np.uint8)  # white page, dark text bands
    for y0 in range(20, 80, 14):
        img[y0 : y0 + 5, 10:86] = 20
    return img


# ---------------------------------------------------------------------------
# K2: min_area_rect + skew estimate
# ---------------------------------------------------------------------------


def _brute_min_area(points, steps=3600):
    best = np.inf
    for th in np.linspace(0, np.pi / 2, steps, endpoint=False):
        u = np.array([np.cos(th), np.sin(th)])
        v = np.array([-u[1], u[0]])
        pu, pv = points @ u, points @ v
        best = min(best, (pu.max() - pu.min()) * (pv.max() - pv.min()))
    return best


def test_min_area_rect_is_optimal():
    rng = np.random.default_rng(3)
    for _ in range(20):
        pts = rng.uniform(0, 50, size=(60, 2))
        _c, (w, h), _a = MK.min_area_rect(pts)
        assert w * h <= _brute_min_area(pts) * (1 + 1e-9)


def test_min_area_rect_axis_aligned():
    pts = np.array([[0.0, 0], [10, 0], [10, 4], [0, 4], [5, 2]])
    c, (w, h), a = MK.min_area_rect(pts)
    np.testing.assert_allclose(c, [5, 2], atol=1e-9)
    assert sorted([round(w, 6), round(h, 6)]) == [4.0, 10.0]
    assert -90.0 <= a < 0.0


def test_min_area_rect_rotated_rect():
    theta = np.radians(25.0)
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    base = np.array([[-6.0, -2], [6, -2], [6, 2], [-6, 2]])
    pts = base @ r.T + 30.0
    _c, (w, h), _a = MK.min_area_rect(pts)
    assert sorted([round(w, 4), round(h, 4)]) == [4.0, 12.0]


def test_deskew_accuracy_within_half_degree():
    """The reference's own target: ≤0.5° average angle error
    (OCR-X_Requirements_Specification.md:22)."""
    base = bands_img()
    errs = []
    for alpha in np.arange(-10, 10.5, 1.37):
        if abs(alpha) < 0.3:
            continue
        skewed = MK.rotate_image(base, float(alpha), border_white=True)
        est = MK.estimate_skew_angle(skewed)
        errs.append(abs(est - (-alpha)))
    assert np.mean(errs) <= 0.5, f"mean deskew error {np.mean(errs):.3f}°"
    assert max(errs) <= 1.0


def test_skew_guards_still_hold():
    blank = np.full((32, 32), 255, dtype=np.uint8)
    assert MK.estimate_skew_angle(blank) == 0.0  # <50 fg px
    assert MK.estimate_skew_angle(bands_img()) == 0.0  # |angle|<0.1
    # pca stand-in still available
    assert MK.estimate_skew_angle(bands_img(), method="pca") == 0.0


# ---------------------------------------------------------------------------
# K3: bicubic rotation
# ---------------------------------------------------------------------------


def test_cubic_weights_partition_of_unity():
    # Σ w(f - d) over the 4 taps == 1 for any phase f ∈ [0,1)
    for f in np.linspace(0, 0.999, 50):
        s = sum(MK._cubic_weight(np.array([f - d]))[0] for d in range(-1, 3))
        assert abs(s - 1.0) < 1e-12


def test_rotate_cubic_constant_and_identity():
    img = np.full((20, 20), 137, np.uint8)
    assert (MK.rotate_image(img, 0.0, True) == img).all()
    rot = MK.rotate_image(img, 7.0, border_white=False, interp="cubic")
    # interior stays at the constant value (kernel sums to 1)
    assert (rot[8:12, 8:12] == 137).all()


def test_rotate_cubic_beats_nearest_against_analytic_truth():
    # smooth field with a known closed form: the interpolation error against
    # the exactly-rotated field is the fidelity criterion
    def f(x, y):
        return 100.0 + 80.0 * np.sin(x / 9.0) * np.cos(y / 7.0)

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.clip(np.rint(f(xx, yy)), 0, 255).astype(np.uint8)
    angle = 5.0
    # replicate the kernel's inverse map to evaluate the truth analytically
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = np.radians(-angle)
    xs = np.cos(theta) * (xx - cx) + np.sin(theta) * (yy - cy) + cx
    ys = -np.sin(theta) * (xx - cx) + np.cos(theta) * (yy - cy) + cy
    truth = f(xs, ys)
    sl = np.s_[16:48, 16:48]
    rot_c = MK.rotate_image(img, angle, True, "cubic")
    rot_n = MK.rotate_image(img, angle, True, "nearest")
    err_c = np.abs(rot_c[sl].astype(float) - truth[sl]).mean()
    err_n = np.abs(rot_n[sl].astype(float) - truth[sl]).mean()
    assert err_c < err_n
    assert err_c < 1.0  # sub-quantum mean error on a smooth field


# ---------------------------------------------------------------------------
# K4: gaussian adaptive threshold
# ---------------------------------------------------------------------------


def test_gaussian_kernel_matches_cv2_tables():
    np.testing.assert_allclose(MK.gaussian_kernel_1d(3), [0.25, 0.5, 0.25])
    np.testing.assert_allclose(
        MK.gaussian_kernel_1d(5), [0.0625, 0.25, 0.375, 0.25, 0.0625]
    )
    k11 = MK.gaussian_kernel_1d(11)
    assert abs(k11.sum() - 1.0) < 1e-12
    assert k11[5] == k11.max() and (np.diff(k11[:6]) > 0).all()  # symmetric peak


def test_binarize_gaussian_semantics():
    const = np.full((16, 16), 100, np.uint8)
    assert (MK.binarize_adaptive(const) == 255).all()  # x > x - C
    # a hard edge: gaussian weighting reacts more locally than the box mean
    img = np.zeros((16, 16), np.uint8)
    img[:, 8:] = 200
    g = MK.binarize_adaptive(img, method="gaussian")
    m = MK.binarize_adaptive(img, method="mean")
    assert set(np.unique(g)).issubset({0, 255})
    assert not (g == m).all()  # genuinely different weighting
    # beyond the 11-wide window's reach of the edge, both agree
    assert (g[:, :3] == m[:, :3]).all() and (g[:, 14:] == m[:, 14:]).all()


# ---------------------------------------------------------------------------
# K6: bilinear resize + detection preprocess
# ---------------------------------------------------------------------------


def test_resize_bilinear_identity_and_constant():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 9), np.uint8)
    np.testing.assert_allclose(MK.resize_bilinear(img, 12, 9), img)
    const = np.full((10, 10), 55, np.uint8)
    np.testing.assert_allclose(MK.resize_bilinear(const, 23, 7), 55.0)


def test_resize_bilinear_known_upscale():
    img = np.array([[0, 100]], dtype=np.uint8)  # 1×2 → 1×4
    out = MK.resize_bilinear(img, 1, 4)
    # half-pixel centers: xs = [-0.25, 0.25, 0.75, 1.25] → clamp/lerp
    np.testing.assert_allclose(out[0], [0.0, 25.0, 75.0, 100.0])


def test_detection_preprocess_contract():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (32, 24), np.uint8)
    tensor, ratio = MK.detection_preprocess(img, 48, 48)
    assert tensor.shape == (1, 3, 48, 48) and tensor.dtype == np.float32
    assert ratio == pytest.approx(48 / 32)
    new_h, new_w = int(32 * ratio), int(24 * ratio)
    assert (new_h, new_w) == (48, 36)
    # padded region normalizes the zero pixel: (0 − mean)/std per channel
    pad_col = tensor[0, :, 0, new_w:]
    expect = ((0.0 - MK.IMAGENET_MEAN) / MK.IMAGENET_STD)[:, None]
    np.testing.assert_allclose(pad_col, np.broadcast_to(expect, pad_col.shape), rtol=1e-6)
    # content region: spot-check one pixel end to end
    resized = MK.resize_bilinear(np.stack([img] * 3, axis=2), new_h, new_w)
    want = (resized[5, 5, 0] / 255.0 - MK.IMAGENET_MEAN[0]) / MK.IMAGENET_STD[0]
    assert tensor[0, 0, 5, 5] == pytest.approx(want, rel=1e-6)


def test_quad_path_uses_det_preprocess():
    """detect_quads now runs through K6: boxes come back rescaled by 1/ratio
    and still land inside the image."""
    from ocr_spark.operators.quad_geometry import detect_quads
    from ocr_spark.sources.media import synth_media_batch

    g = synth_media_batch(["k6-check-1", "k6-check-2", "k6-check-3"])
    found = 0
    for img in g:
        q = detect_quads(img)
        if len(q):
            found += 1
            assert q[..., 0].max() <= 31 and q[..., 1].max() <= 31
            assert q[..., 0].min() >= 0 and q[..., 1].min() >= 0
    assert found
