"""Rotated-quad geometry for the local media engine: W1 point ordering,
F6 degenerate-box filter, K9 crop dimensioning, K10 perspective warp.

Numpy re-derivations of the reference's rotated-text-box path
(ref ocr_components/local_ocr_engine.py):

  * W1 ordering (ref :258-264): TL = argmin(x+y), BR = argmax(x+y),
    TR = argmin(y-x), BL = argmax(y-x) — exactly the reference's
    argmin/argmax over coordinate sums and diffs (np.diff semantics).
  * F6 (ref :294-296): skip quads with contourArea < det_min_box_size²
    (shoelace area — identical to cv2.contourArea for simple polygons).
  * K9 (ref :270-281): target height = rec image height; width =
    int(h × avg_width/avg_height) clamped to [1, rec_w_max]; degenerate
    (zero-dim) quads get width 10.
  * K10 (ref :283-342): getPerspectiveTransform (8×8 DLT solve, H₃₃=1) +
    warpPerspective with bilinear sampling and constant-0 border (cv2
    defaults), then (x/255 − 0.5)/0.5 normalization and right-pad to the
    configured width with −1 (the mean=0.5 padding branch, ref :337).

The detector stays a deterministic fake (task directive): `detect_quads`
rotates the band proposer's boxes by a content-derived angle and scrambles
the corner start (simulating minAreaRect's varying start vertex) so W1 has
real work to do. All geometry ops are batch-vectorized over every quad in an
image batch; only the warp samples per quad (variable output widths), with a
vectorized inner grid — the quad engine is an alternate media path, not the
default hot path.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.operators.media_kernels import (
    CHARSET,
    DET_MIN_BOX_SIZE,
    REC_T,
    block_mean_resize,
    ctc_greedy_decode,
    detect_bands,
)

REC_IMG_H = 48  # reference rec_image_shape height (ref local_ocr_engine.py:47)
REC_IMG_W = 320  # reference rec_image_shape max width


# ---------------------------------------------------------------------------
# W1: quad point ordering (ref :258-264)
# ---------------------------------------------------------------------------


def order_quad(pts: np.ndarray) -> np.ndarray:
    """Order one (4,2) quad TL,TR,BR,BL — scalar twin of order_quads."""
    return order_quads(pts[None])[0]


def order_quads(pts: np.ndarray) -> np.ndarray:
    """(N,4,2) → (N,4,2) ordered TL,TR,BR,BL, reference argmin/argmax
    semantics (first-occurrence tie-breaks, same as np.argmin)."""
    pts = np.asarray(pts, dtype=np.float64)
    s = pts.sum(axis=2)  # x+y per corner
    d = pts[:, :, 1] - pts[:, :, 0]  # np.diff(points, axis=1): y-x
    n = np.arange(len(pts))
    out = np.empty_like(pts)
    out[:, 0] = pts[n, s.argmin(axis=1)]
    out[:, 2] = pts[n, s.argmax(axis=1)]
    out[:, 1] = pts[n, d.argmin(axis=1)]
    out[:, 3] = pts[n, d.argmax(axis=1)]
    return out


# ---------------------------------------------------------------------------
# F6: degenerate-box filter (ref :294-296)
# ---------------------------------------------------------------------------


def quad_areas(quads: np.ndarray) -> np.ndarray:
    """(N,4,2) → (N,) shoelace areas (== cv2.contourArea on simple quads)."""
    x, y = quads[..., 0], quads[..., 1]
    x2, y2 = np.roll(x, -1, axis=1), np.roll(y, -1, axis=1)
    return 0.5 * np.abs((x * y2 - x2 * y).sum(axis=1))


# ---------------------------------------------------------------------------
# K9: target crop dimensions (ref :270-281)
# ---------------------------------------------------------------------------


def target_crop_dims(
    quads: np.ndarray, rec_h: int = REC_IMG_H, rec_w_max: int = REC_IMG_W
) -> np.ndarray:
    """(N,4,2) ordered quads → (N,) int target widths (height is rec_h for
    all). Reference math: mean of opposite-edge norms, aspect → width."""
    tl, tr, br, bl = (quads[:, i] for i in range(4))
    avg_w = (
        np.linalg.norm(tr - tl, axis=1) + np.linalg.norm(br - bl, axis=1)
    ) / 2.0
    avg_h = (
        np.linalg.norm(bl - tl, axis=1) + np.linalg.norm(br - tr, axis=1)
    ) / 2.0
    degenerate = (avg_h == 0) | (avg_w == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        aspect = np.where(degenerate, 0.0, avg_w / np.maximum(avg_h, 1e-300))
    widths = np.clip((rec_h * aspect).astype(np.int64), 1, rec_w_max)
    return np.where(degenerate, 10, widths)


# ---------------------------------------------------------------------------
# K10: perspective transform + warp (ref :304-312)
# ---------------------------------------------------------------------------


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography H with H[2,2]=1 mapping src (4,2) → dst (4,2) — the
    standard 8×8 DLT solve (numpy twin of cv2.getPerspectiveTransform)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8))
    b = np.empty(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(
    img: np.ndarray, h_mat: np.ndarray, out_w: int, out_h: int
) -> np.ndarray:
    """Inverse-map warp with bilinear sampling, constant-0 border (cv2
    warpPerspective defaults). Returns float64 (out_h, out_w)."""
    hh, ww = img.shape
    hinv = np.linalg.inv(h_mat)
    uu, vv = np.meshgrid(
        np.arange(out_w, dtype=np.float64), np.arange(out_h, dtype=np.float64)
    )
    denom = hinv[2, 0] * uu + hinv[2, 1] * vv + hinv[2, 2]
    xs = (hinv[0, 0] * uu + hinv[0, 1] * vv + hinv[0, 2]) / denom
    ys = (hinv[1, 0] * uu + hinv[1, 1] * vv + hinv[1, 2]) / denom
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    wx = xs - x0
    wy = ys - y0
    imgf = img.astype(np.float64)

    def sample(yi: np.ndarray, xi: np.ndarray) -> np.ndarray:
        valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
        out = np.zeros_like(xs)
        out[valid] = imgf[yi[valid], xi[valid]]
        return out

    return (
        sample(y0, x0) * (1 - wx) * (1 - wy)
        + sample(y0, x0 + 1) * wx * (1 - wy)
        + sample(y0 + 1, x0) * (1 - wx) * wy
        + sample(y0 + 1, x0 + 1) * wx * wy
    )


def _warp_axis_aligned(
    gray: np.ndarray, quad: np.ndarray, tw: int, rec_h: int
) -> np.ndarray:
    """Exact fast path for axis-aligned ordered quads: the homography from
    an upright rectangle to the [0,tw-1]×[0,rec_h-1] grid degenerates to an
    independent linear map per axis (denominator ≡ 1), so we skip the 8×8
    solve, the matrix inverse, and the per-tap bounds masks (in-image crop ⇒
    all taps valid; the +1 taps are index-clipped, their weight is exactly 0
    at the only positions the clip changes). Bit-compatible sampling model
    with warp_perspective — corner-anchored linear interpolation."""
    (x0, y0), (x1, _), (_, y1) = quad[0], quad[1], quad[3]
    hh, ww = gray.shape
    xs = x0 + (np.arange(tw) * ((x1 - x0) / (tw - 1)) if tw > 1 else np.zeros(1))
    ys = y0 + (np.arange(rec_h) * ((y1 - y0) / (rec_h - 1)) if rec_h > 1 else np.zeros(1))
    x0i = np.clip(np.floor(xs).astype(np.int64), 0, ww - 1)
    y0i = np.clip(np.floor(ys).astype(np.int64), 0, hh - 1)
    x1i = np.minimum(x0i + 1, ww - 1)
    y1i = np.minimum(y0i + 1, hh - 1)
    fx = xs - x0i
    fy = (ys - y0i)[:, None]
    imgf = gray.astype(np.float64)
    top = imgf[y0i][:, x0i] * (1 - fx) + imgf[y0i][:, x1i] * fx
    bot = imgf[y1i][:, x0i] * (1 - fx) + imgf[y1i][:, x1i] * fx
    return top * (1 - fy) + bot * fy


def _is_axis_aligned(quad: np.ndarray) -> bool:
    return (
        quad[0, 1] == quad[1, 1]
        and quad[3, 1] == quad[2, 1]
        and quad[0, 0] == quad[3, 0]
        and quad[1, 0] == quad[2, 0]
        and quad[1, 0] > quad[0, 0]
        and quad[3, 1] > quad[0, 1]
    )


def _warp_bilinear_surface(
    gray: np.ndarray, quad: np.ndarray, tw: int, rec_h: int
) -> np.ndarray:
    """Degenerate-geometry fallback: map the output grid onto the quad by
    bilinear corner interpolation (always well-defined, equals the
    homography on parallelograms), masked 4-tap sampling with 0 border.
    Used when the DLT system is singular — e.g. a K9 target width of 1
    collapses the dst rectangle onto a line, which a real
    cv2.getPerspectiveTransform would also refuse."""
    hh, ww = gray.shape
    a = (np.arange(tw) / (tw - 1)) if tw > 1 else np.zeros(1)
    b = (np.arange(rec_h) / (rec_h - 1)) if rec_h > 1 else np.zeros(1)
    aa, bb = np.meshgrid(a, b)
    tl, tr, br, bl = quad
    xs = (
        (1 - aa) * (1 - bb) * tl[0]
        + aa * (1 - bb) * tr[0]
        + aa * bb * br[0]
        + (1 - aa) * bb * bl[0]
    )
    ys = (
        (1 - aa) * (1 - bb) * tl[1]
        + aa * (1 - bb) * tr[1]
        + aa * bb * br[1]
        + (1 - aa) * bb * bl[1]
    )
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    wx = xs - x0
    wy = ys - y0
    imgf = gray.astype(np.float64)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
        out = np.zeros_like(xs)
        out[valid] = imgf[yi[valid], xi[valid]]
        return out

    return (
        sample(y0, x0) * (1 - wx) * (1 - wy)
        + sample(y0, x0 + 1) * wx * (1 - wy)
        + sample(y0 + 1, x0) * (1 - wx) * wy
        + sample(y0 + 1, x0 + 1) * wx * wy
    )


def warp_quad(
    gray: np.ndarray,
    quad: np.ndarray,
    rec_h: int = REC_IMG_H,
    rec_w_max: int = REC_IMG_W,
    tw: int | None = None,
) -> np.ndarray:
    """K10 for one ordered quad: warp → normalize (x/255−0.5)/0.5 → right-pad
    with −1 to rec_w_max. Returns (rec_h, rec_w_max) float64. Pass `tw` when
    the caller already ran target_crop_dims (avoids recomputing).

    Degenerate targets (tw or rec_h of 1 — e.g. a thin rotated strip whose
    K9 aspect clamps the width to 1 — or a collinear src quad) cannot form a
    homography; they take the bilinear-surface fallback instead of crashing
    the task with a singular 8×8 system."""
    if tw is None:
        tw = int(target_crop_dims(quad[None], rec_h, rec_w_max)[0])
    if _is_axis_aligned(quad):
        warped = _warp_axis_aligned(gray, quad, tw, rec_h)
    elif tw <= 1 or rec_h <= 1:
        warped = _warp_bilinear_surface(gray, quad, tw, rec_h)
    else:
        dst = np.array(
            [[0, 0], [tw - 1, 0], [tw - 1, rec_h - 1], [0, rec_h - 1]],
            dtype=np.float64,
        )
        try:
            h_mat = get_perspective_transform(quad, dst)
            warped = warp_perspective(gray, h_mat, tw, rec_h)
        except np.linalg.LinAlgError:  # collinear src corners
            warped = _warp_bilinear_surface(gray, quad, tw, rec_h)
    norm = (warped / 255.0 - 0.5) / 0.5
    return np.pad(norm, ((0, 0), (0, rec_w_max - tw)), constant_values=-1.0)


# ---------------------------------------------------------------------------
# deterministic rotated-quad proposer (fake detector, quad mode)
# ---------------------------------------------------------------------------


DET_TARGET = 48  # detector input square for the quad path (736 in the ref)


def detect_quads(gray: np.ndarray, det_target: int = DET_TARGET) -> np.ndarray:
    """Rotated-quad variant of the band proposer, run through the REAL K6
    preprocess leg: aspect-preserving resize + ImageNet normalization into
    the detector's input square (ref local_ocr_engine.py:145-179), fake
    detection on that tensor (de-normalized channel-mean = the probability
    map), then box coordinates divided by the resize ratio on the way back
    (K8, ref :247) and clipped to the image (ref :248-249).

    Each rescaled band box is rotated about its center by a content-derived
    angle in [-10°, 10°], min-size-checked on the clipped edges
    (ref :251-253), and its corner sequence rolled by a content-derived
    offset — simulating cv2.minAreaRect's varying start vertex, which is
    exactly why the reference needs W1 reordering. Returns (N,4,2) float64
    in scrambled corner order."""
    from ocr_spark.operators.media_kernels import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        detection_preprocess,
    )

    tensor, ratio = detection_preprocess(gray, det_target, det_target)
    # fake detection model: undo the normalization and collapse channels —
    # a [0,1] probability map with the same structure DBNet would score
    seg = (tensor[0].astype(np.float64) * IMAGENET_STD[:, None, None]
           + IMAGENET_MEAN[:, None, None]).mean(axis=0)
    det_map = np.clip(np.rint(seg * 255.0), 0, 255).astype(np.uint8)
    det_boxes = detect_bands(det_map)
    if not det_boxes:
        return np.zeros((0, 4, 2))
    h, w = gray.shape
    # K8 rescale: det-space coords / resize_ratio → image coords
    boxes = [
        (x / ratio, y / ratio, bw / ratio, bh / ratio) for (x, y, bw, bh) in det_boxes
    ]
    total = int(gray.sum(dtype=np.int64))
    quads = []
    for bi, (x, y, bw, bh) in enumerate(boxes):
        ang = ((total >> (3 * bi)) % 21) - 10  # degrees
        theta = np.radians(float(ang))
        cx, cy = x + (bw - 1) / 2.0, y + (bh - 1) / 2.0
        corners = np.array(
            [
                [x, y],
                [x + bw - 1, y],
                [x + bw - 1, y + bh - 1],
                [x, y + bh - 1],
            ],
            dtype=np.float64,
        )
        c, s = np.cos(theta), np.sin(theta)
        rel = corners - [cx, cy]
        rot = rel @ np.array([[c, s], [-s, c]]) + [cx, cy]
        rot[:, 0] = np.clip(rot[:, 0], 0, w - 1)
        rot[:, 1] = np.clip(rot[:, 1], 0, h - 1)
        # post-clip min-size check on edge norms (ref :251-253)
        rw = np.linalg.norm(rot[0] - rot[1])
        rh = np.linalg.norm(rot[1] - rot[2])
        if min(rw, rh) < DET_MIN_BOX_SIZE:
            continue
        roll = (total >> (2 * bi)) % 4
        quads.append(np.roll(rot, roll, axis=0))
    if not quads:
        return np.zeros((0, 4, 2))
    return np.stack(quads)


# ---------------------------------------------------------------------------
# full quad-path recognizer (W1 → F6 → K9 → K10 → fake rec → K12/A1/A2)
# ---------------------------------------------------------------------------


def _decode_warped(padded: np.ndarray) -> tuple[str, float]:
    """Fake recognition over a warped+normalized (rec_h, rec_w_max) tensor:
    map back to pixel scale, block-mean to (T, C), same logit affine as the
    band path, CTC decode."""
    n_classes = len(CHARSET) + 1
    pix = (padded + 1.0) * 127.5  # [-1,1] → [0,255]; -1 padding → 0
    logits = (block_mean_resize(pix, REC_T, n_classes) - 128.0) / 16.0
    return ctc_greedy_decode(logits)


def decode_quad_crops(
    gray: np.ndarray, quads: np.ndarray, widths: np.ndarray
) -> list[tuple[str, float]]:
    """Warp + fake-decode each ordered quad of one image, with the
    deterministic F7/F8 failure injection (keyed on the warped crop's mean
    pixel intensity — parity with the band path). Shared by the quad and
    db engines so the injection scheme cannot fork."""
    parts: list[tuple[str, float]] = []
    for q, tw in zip(quads, widths):
        tw = int(tw)
        padded = warp_quad(gray, q, tw=tw)
        text, conf = _decode_warped(padded)
        mean_i = int(((padded[:, :tw] + 1.0) * 127.5).mean())
        if mean_i % 13 == 0:
            text, conf = "Error: Rec Inference Failed", 0.0
        elif mean_i % 17 == 0:
            text, conf = "REC_FAIL", 0.0
        parts.append((text, conf))
    return parts


def assemble_parts(parts: list[tuple[str, float]]) -> tuple[str, float]:
    """K12/A1/A2 assembly (ref local_ocr_engine.py:443-464): error parts
    excluded from text and conf-zeroed; overall confidence = mean of
    positive confs, 0.0 when none. Shared by every local media engine."""
    total, n = 0.0, 0
    texts = []
    for text, conf in parts:
        if text.startswith("Error:") or text == "REC_FAIL":
            conf = 0.0
        else:
            texts.append(text)
        if conf > 0.0:
            total += conf
            n += 1
    return "\n".join(texts), (total / n) if n else 0.0


def recognize_quads_image(gray: np.ndarray) -> tuple[str, float]:
    """Scalar quad-path pipeline for one grayscale image."""
    quads = detect_quads(gray)
    if not len(quads):
        return "", 0.0
    ordered = order_quads(quads)
    keep = quad_areas(ordered) >= DET_MIN_BOX_SIZE * DET_MIN_BOX_SIZE  # F6
    ordered = ordered[keep]
    widths = target_crop_dims(ordered)  # K9
    return assemble_parts(decode_quad_crops(gray, ordered, widths))


def recognize_quad_batch(grays: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Batch twin of recognize_quads_image with the geometry stages
    (detection, W1 ordering, F6 areas, K9 dims) vectorized across every quad
    in the batch; the warp+decode samples per quad (variable widths).
    Same (texts, confs) contract as the other media engines."""
    n_img = len(grays)
    all_quads: list[np.ndarray] = []
    quad_img: list[int] = []
    for i in range(n_img):
        q = detect_quads(grays[i])
        if len(q):
            all_quads.append(q)
            quad_img.extend([i] * len(q))
    texts = [""] * n_img
    confs = np.zeros(n_img, dtype=np.float64)
    if not all_quads:
        return texts, confs
    quads = np.concatenate(all_quads)
    img_of = np.asarray(quad_img, dtype=np.int64)
    ordered = order_quads(quads)  # W1, vectorized
    keep = quad_areas(ordered) >= DET_MIN_BOX_SIZE * DET_MIN_BOX_SIZE  # F6
    ordered, img_of = ordered[keep], img_of[keep]
    widths = target_crop_dims(ordered)  # K9, vectorized
    for i in np.unique(img_of):
        sel = img_of == i
        texts[i], confs[i] = assemble_parts(
            decode_quad_crops(grays[i], ordered[sel], widths[sel])
        )
    return texts, confs
