"""K8: DB-style detection postprocess — contours → minAreaRect → mask score
→ unclip → rescale → clip → min-size → W1 order (ref
ocr_components/local_ocr_engine.py:193-268), in pure numpy.

Pipeline parity, stage by stage:
  * binary map  = seg > det_db_thresh (F2, ref :202)
  * findContours(RETR_LIST) ≈ 8-connected components in scan order
    (ref :203; solid components — the reference fills each contour, which
    for hole-free regions is the component itself)
  * per contour (capped at det_max_candidates, F5, ref :208): skip <3 px;
    min-area rect via rotating calipers (ref :213-214)
  * box score = mean probability under the filled mask (F3, ref :218-222)
  * unclip (ref :225-246): pyclipper round-join offset of the box, reduced
    back to the minAreaRect when >4 points — for a rectangle that composition
    is EXACTLY the rectangle grown by 2·distance per extent, which is the
    closed form used here. Two distance formulas:
      - 'reference': perimeter × unclip_ratio × 0.5 — the reference's literal
        code (ref :230). At any realistic map size this inflates boxes past
        the whole image (the reference never ran; SURVEY.md §0), so it is
        kept only for parity inspection.
      - 'db' (default): area × unclip_ratio / perimeter — the DB paper's
        published formula, sane at every scale.
  * rescale by 1/resize_ratio + clip to the original image (ref :247-249)
  * post-clip min-size check on edge norms (F4, ref :251-253)
  * W1 TL,TR,BR,BL ordering, int32 (ref :258-266)

`local_db` is the dispatch media engine built on this path; recognition
reuses the quad warp/decode machinery (axis-aligned boxes ⇒ the warp
degenerates to crop+resize, exactly as in the reference).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.operators.media_kernels import (
    DET_DB_BOX_THRESH,
    DET_DB_THRESH,
    DET_MIN_BOX_SIZE,
    axis_extreme_points,
    min_area_box,
)
from ocr_spark.operators.quad_geometry import order_quad

def _overlap_pairs(rows: np.ndarray, s: np.ndarray, t: np.ndarray):
    """(a, b) index pairs of runs in ADJACENT rows whose column intervals
    overlap with ±1 slack (8-connectivity). Vectorized: within a row, runs
    are disjoint and sorted, so both s and t are strictly increasing — the
    runs in row r-1 matching run a form a CONTIGUOUS range found by two
    searchsorteds (first b with t_b >= s_a-1, last b with s_b <= t_a+1).
    One numpy pass per populated row instead of the former
    O(runs_r × runs_{r-1}) nested Python loop (the per-image hotspot at the
    reference's real 736×736 map size, local_ocr_engine.py:38-40)."""
    n = len(rows)
    # row boundaries over the globally (row, col)-sorted run list
    row_starts = np.searchsorted(rows, rows, side="left")
    prev_starts = np.searchsorted(rows, rows - 1, side="left")
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    i = 0
    while i < n:
        j = int(np.searchsorted(rows, rows[i], side="right"))
        plo, phi = int(prev_starts[i]), int(row_starts[i])
        if phi > plo and rows[plo] == rows[i] - 1:
            sa, ta = s[i:j], t[i:j]
            first = plo + np.searchsorted(t[plo:phi], sa - 1, side="left")
            last = plo + np.searchsorted(s[plo:phi], ta + 1, side="right") - 1
            counts = np.maximum(last - first + 1, 0)
            tot = int(counts.sum())
            if tot:
                a_idx = np.repeat(np.arange(i, j), counts)
                offs = np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
                b_parts.append(np.repeat(first, counts) + offs)
                a_parts.append(a_idx)
        i = j
    if not a_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def connected_components(binary: np.ndarray) -> list[np.ndarray]:
    """8-connected components of a boolean map, ordered by first pixel in
    row-major scan order (the order findContours(RETR_LIST) discovers outer
    contours). Each entry is an (N,2) array of (y,x) pixel coords.

    Row-run union-find: horizontal runs are extracted in one vectorized
    pass; adjacent-row overlap pairs come from vectorized searchsorted
    interval matching (_overlap_pairs); the Python union-find loop touches
    only the MATCHED pairs — O(matches·α) — and the pixel expansion is one
    global numpy pass grouped by component label."""
    h, w = binary.shape
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = binary
    d = np.diff(padded, axis=1)
    starts = np.argwhere(d == 1)  # (row, col) in row-major scan order
    if not len(starts):
        return []
    ends = np.argwhere(d == -1)[:, 1]  # exclusive end col, aligned with starts
    rows = starts[:, 0]
    s = starts[:, 1]
    t = ends - 1  # inclusive end col
    n = len(rows)

    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    a_idx, b_idx = _overlap_pairs(rows, s, t)
    for a, b in zip(a_idx.tolist(), b_idx.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)

    # one pixel-expansion pass: component order = root order (root == min run
    # index == scan order of the component's first pixel); within a
    # component, runs keep scan order because the sort below is stable
    lengths = (t - s + 1).astype(np.int64)
    tot_pix = int(lengths.sum())
    run_of_pix = np.repeat(np.arange(n), lengths)
    col = (
        np.arange(tot_pix)
        - np.repeat(np.cumsum(lengths) - lengths, lengths)
        + np.repeat(s, lengths)
    )
    pix = np.column_stack([rows[run_of_pix], col])
    order = np.argsort(roots[run_of_pix], kind="stable")
    sorted_roots = roots[run_of_pix][order]
    bounds = np.flatnonzero(np.diff(sorted_roots)) + 1
    return np.split(pix[order], bounds)


def unclip_distance(eu: float, ev: float, unclip_ratio: float, mode: str) -> float:
    """Offset distance for the unclip expansion (see module docstring)."""
    perimeter = 2.0 * (eu + ev)
    if perimeter <= 0:
        return 0.0
    if mode == "reference":
        return perimeter * unclip_ratio * 0.5  # ref :230, literally
    if mode == "db":
        return (eu * ev) * unclip_ratio / perimeter  # DB paper formula
    raise ValueError(f"unknown unclip mode {mode!r}")


def db_postprocess(
    seg_map: np.ndarray,
    resize_ratio: float,
    original_shape: tuple[int, int],
    db_thresh: float = DET_DB_THRESH,
    box_thresh: float = DET_DB_BOX_THRESH,
    unclip_ratio: float = 1.5,
    max_candidates: int = 1000,
    min_box_size: int = DET_MIN_BOX_SIZE,
    unclip_mode: str = "db",
) -> list[np.ndarray]:
    """Full K8 chain over a probability map. Returns a list of (4,2) int32
    quads ordered TL,TR,BR,BL in original-image coordinates."""
    original_h, original_w = original_shape
    binary = seg_map > db_thresh
    boxes: list[np.ndarray] = []
    for comp in connected_components(binary)[:max_candidates]:
        if len(comp) < 3:  # ref :209
            continue
        # hull candidates: per-row extremes only (shared reduction), then
        # swap (y,x) -> (x,y) like cv2 contours
        pts = axis_extreme_points(comp)[:, ::-1].astype(np.float64)
        center, u, v, eu, ev = min_area_box(pts)
        score = float(seg_map[comp[:, 0], comp[:, 1]].mean())  # filled mask
        if score < box_thresh:  # F3
            continue
        d = unclip_distance(eu, ev, unclip_ratio, unclip_mode)
        geu, gev = eu + 2.0 * d, ev + 2.0 * d
        corners = np.array(
            [
                center - u * geu / 2 - v * gev / 2,
                center + u * geu / 2 - v * gev / 2,
                center + u * geu / 2 + v * gev / 2,
                center - u * geu / 2 + v * gev / 2,
            ]
        )
        scaled = corners / resize_ratio  # ref :247
        scaled[:, 0] = np.clip(scaled[:, 0], 0, original_w - 1)  # ref :248
        scaled[:, 1] = np.clip(scaled[:, 1], 0, original_h - 1)
        rw = float(np.linalg.norm(scaled[0] - scaled[1]))  # ref :251-253
        rh = float(np.linalg.norm(scaled[1] - scaled[2]))
        if min(rw, rh) < min_box_size:
            continue
        boxes.append(order_quad(scaled).astype(np.int32))  # W1, ref :258-266
    return boxes


def db_detect_quads(gray: np.ndarray, det_target: int = 48, **kw) -> np.ndarray:
    """K6 preprocess → fake detection map → db_postprocess. Returns (N,4,2)
    float quads in original-image coordinates (ordered)."""
    from ocr_spark.operators.media_kernels import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        detection_preprocess,
    )

    tensor, ratio = detection_preprocess(gray, det_target, det_target)
    seg = (
        tensor[0].astype(np.float64) * IMAGENET_STD[:, None, None]
        + IMAGENET_MEAN[:, None, None]
    ).mean(axis=0)
    boxes = db_postprocess(np.clip(seg, 0.0, 1.0), ratio, gray.shape, **kw)
    if not boxes:
        return np.zeros((0, 4, 2))
    return np.stack(boxes).astype(np.float64)


def recognize_db_image(gray: np.ndarray) -> tuple[str, float]:
    """Scalar DB-path recognizer: db quads → F6 area filter → shared
    warp/decode + K12/A1/A2 assembly (quad_geometry.decode_quad_crops /
    assemble_parts)."""
    from ocr_spark.operators.quad_geometry import (
        assemble_parts,
        decode_quad_crops,
        quad_areas,
        target_crop_dims,
    )

    quads = db_detect_quads(gray)
    if not len(quads):
        return "", 0.0
    # F6 (ref local_ocr_engine.py:294-296): the reference's recognition
    # preprocess drops boxes with contourArea < min_box_size² before warping;
    # heavily clipped rotated DB boxes can pass the F4 edge-norm check yet
    # have sub-threshold area — same filter as recognize_quads_image.
    quads = quads[quad_areas(quads) >= DET_MIN_BOX_SIZE * DET_MIN_BOX_SIZE]
    if not len(quads):
        return "", 0.0
    widths = target_crop_dims(quads)
    return assemble_parts(decode_quad_crops(gray, quads, widths))


def recognize_db_batch(grays: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Batch twin of recognize_db_image with the geometry stages (F6 areas,
    K9 dims) vectorized across every quad in the batch — same structure as
    quad_geometry.recognize_quad_batch; detection and warp+decode stay
    per-image (the maps/crops are image-local). Same (texts, confs)
    contract as the other media engines."""
    from ocr_spark.operators.quad_geometry import (
        assemble_parts,
        decode_quad_crops,
        quad_areas,
        target_crop_dims,
    )

    n_img = len(grays)
    all_quads: list[np.ndarray] = []
    quad_img: list[int] = []
    for i in range(n_img):
        q = db_detect_quads(grays[i])
        if len(q):
            all_quads.append(q)
            quad_img.extend([i] * len(q))
    texts = [""] * n_img
    confs = np.zeros(n_img, dtype=np.float64)
    if not all_quads:
        return texts, confs
    quads = np.concatenate(all_quads)
    img_of = np.asarray(quad_img, dtype=np.int64)
    keep = quad_areas(quads) >= DET_MIN_BOX_SIZE * DET_MIN_BOX_SIZE  # F6
    quads, img_of = quads[keep], img_of[keep]
    if not len(quads):
        return texts, confs
    widths = target_crop_dims(quads)  # K9, vectorized
    for i in np.unique(img_of):
        sel = img_of == i
        texts[i], confs[i] = assemble_parts(
            decode_quad_crops(grays[i], quads[sel], widths[sel])
        )
    return texts, confs
