"""K8 DB-postprocess tests: connected components, mask scoring, unclip
(both formulas), rescale/clip, caps, min-size, W1 ordering, and the
local_db media engine end to end.

Reference anchors: ocr_components/local_ocr_engine.py:193-268."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.db_detect import (
    connected_components,
    db_detect_quads,
    db_postprocess,
    min_area_box,
    recognize_db_batch,
    recognize_db_image,
    unclip_distance,
)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_components_basic_and_diagonal():
    b = np.zeros((8, 8), dtype=bool)
    b[1:3, 1:4] = True  # blob A
    b[5, 5] = True  # blob B seed
    b[6, 6] = True  # diagonal → same blob (8-connectivity)
    b[0, 7] = True  # isolated single pixel
    comps = connected_components(b)
    sizes = sorted(len(c) for c in comps)
    assert sizes == [1, 2, 6]
    # scan order: first pixel of first comp is the earliest in row-major scan
    firsts = [tuple(c[np.lexsort((c[:, 1], c[:, 0]))][0]) for c in comps]
    assert firsts[0] == (0, 7)  # row 0 comes first


def test_components_cover_exactly():
    rng = np.random.default_rng(9)
    b = rng.random((20, 20)) > 0.6
    comps = connected_components(b)
    got = np.zeros_like(b)
    total = 0
    for c in comps:
        got[c[:, 0], c[:, 1]] = True
        total += len(c)
    assert (got == b).all()
    assert total == int(b.sum())  # no pixel in two components


def _bfs_components(b: np.ndarray) -> list[set]:
    """Slow 8-connectivity reference (per-pixel BFS), scan-ordered seeds."""
    seen = np.zeros_like(b, dtype=bool)
    comps = []
    h, w = b.shape
    for r0 in range(h):
        for c0 in range(w):
            if b[r0, c0] and not seen[r0, c0]:
                stack, comp = [(r0, c0)], set()
                seen[r0, c0] = True
                while stack:
                    r, c = stack.pop()
                    comp.add((r, c))
                    for dr in (-1, 0, 1):
                        for dc in (-1, 0, 1):
                            rr, cc = r + dr, c + dc
                            if 0 <= rr < h and 0 <= cc < w and b[rr, cc] and not seen[rr, cc]:
                                seen[rr, cc] = True
                                stack.append((rr, cc))
                comps.append(comp)
    return comps


@pytest.mark.parametrize("seed,shape,density", [
    (0, (40, 40), 0.35), (1, (40, 40), 0.55), (2, (64, 48), 0.5),
    (3, (96, 96), 0.45), (4, (30, 200), 0.5), (5, (7, 7), 0.9),
])
def test_components_match_bfs_reference(seed, shape, density):
    """The vectorized searchsorted run-merge must produce exactly the BFS
    component partition, in the same first-pixel scan order."""
    rng = np.random.default_rng(seed)
    b = rng.random(shape) < density
    got = connected_components(b)
    want = _bfs_components(b)
    assert len(got) == len(want)
    for g, wset in zip(got, want):
        assert {(int(r), int(c)) for r, c in g} == wset


def test_components_wide_run_fanout():
    """One wide run over many narrow runs (and vice versa) — the contiguous
    searchsorted range must capture every overlap, not just one."""
    b = np.zeros((3, 30), dtype=bool)
    b[0, ::2] = True  # 15 single-pixel runs
    b[1, :] = True  # one wide run touching all of them
    b[2, 1::3] = True
    comps = connected_components(b)
    assert len(comps) == 1
    assert len(comps[0]) == int(b.sum())


# ---------------------------------------------------------------------------
# min_area_box / unclip
# ---------------------------------------------------------------------------


def test_min_area_box_rect():
    pts = np.array([[0.0, 0], [9, 0], [9, 3], [0, 3]])
    center, u, v, eu, ev = min_area_box(pts)
    np.testing.assert_allclose(center, [4.5, 1.5], atol=1e-9)
    assert sorted([round(eu, 6), round(ev, 6)]) == [3.0, 9.0]
    assert abs(u @ v) < 1e-12


def test_unclip_formulas():
    # 10×4 box: perimeter 28, area 40
    assert unclip_distance(10, 4, 1.5, "reference") == pytest.approx(21.0)
    assert unclip_distance(10, 4, 1.5, "db") == pytest.approx(40 * 1.5 / 28)
    assert unclip_distance(0, 0, 1.5, "db") == 0.0
    with pytest.raises(ValueError):
        unclip_distance(1, 1, 1.5, "nope")


# ---------------------------------------------------------------------------
# db_postprocess semantics
# ---------------------------------------------------------------------------


def _seg_with_bands():
    """48×48 map: a strong band (rows 8-13), a weak band under the score
    threshold (rows 24-27), a 2-px speck (dropped: <3 px)."""
    seg = np.zeros((48, 48))
    seg[8:14, 2:46] = 0.9
    seg[24:28, 2:46] = 0.4  # above det_db_thresh but mean < 0.6 → F3 drop
    seg[40, 0] = 0.95
    seg[40, 1] = 0.95  # 2-px component → dropped
    return seg


def test_db_postprocess_filters_and_geometry():
    seg = _seg_with_bands()
    boxes = db_postprocess(seg, resize_ratio=1.5, original_shape=(32, 32))
    assert len(boxes) == 1  # weak band F3-dropped, speck size-dropped
    q = boxes[0]
    assert q.dtype == np.int32 and q.shape == (4, 2)
    # W1 order: TL has min x+y, BR max
    s = q.sum(axis=1)
    assert s[0] == s.min() and s[2] == s.max()
    # rescale: det row 8 / 1.5 ≈ 5.3 minus unclip growth; all inside image
    assert q[:, 0].min() >= 0 and q[:, 0].max() <= 31
    assert q[:, 1].min() >= 0 and q[:, 1].max() <= 31
    # the unclip grew the band: height > raw 6/1.5 = 4 rows
    assert (q[3, 1] - q[0, 1]) > 4


def test_db_postprocess_reference_unclip_explodes():
    seg = _seg_with_bands()
    ref_boxes = db_postprocess(
        seg, 1.5, (32, 32), unclip_mode="reference"
    )
    db_boxes = db_postprocess(seg, 1.5, (32, 32), unclip_mode="db")
    # the reference formula inflates past the whole image → clip makes the
    # box image-wide; the db formula keeps it local
    rq, dq = ref_boxes[0], db_boxes[0]
    assert rq[:, 1].min() == 0 and rq[:, 1].max() == 31
    assert dq[:, 1].max() - dq[:, 1].min() < 15


def test_db_postprocess_candidate_cap():
    seg = np.zeros((48, 48))
    for i in range(6):
        seg[i * 8 : i * 8 + 3, 4:44] = 0.9
    assert len(db_postprocess(seg, 1.0, (48, 48))) == 6
    assert len(db_postprocess(seg, 1.0, (48, 48), max_candidates=2)) == 2


# ---------------------------------------------------------------------------
# full path + engine
# ---------------------------------------------------------------------------


def test_db_detect_and_recognize_deterministic():
    from ocr_spark.sources.media import synth_media_batch

    grays = synth_media_batch([f"db-{i}" for i in range(12)])
    found = 0
    for g in grays:
        q1, q2 = db_detect_quads(g), db_detect_quads(g.copy())
        np.testing.assert_array_equal(q1, q2)
        found += len(q1) > 0
    assert found > 6  # most synthetic scans have detectable bands

    texts_b, confs_b = recognize_db_batch(grays)
    for i, g in enumerate(grays):
        t, c = recognize_db_image(g)
        assert texts_b[i] == t and confs_b[i] == c
    assert any(texts_b)


def test_db_engine_e2e(spark):
    from ocr_spark.fixtures import generate_docs
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    docs = spark.createDataFrame(generate_docs(24), DOC_SCHEMA)
    out = extract_documents(docs, media_engine="local_db")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 24
    rows2 = {
        r.doc_id: r
        for r in extract_documents(docs, media_engine="local_db").collect()
    }
    assert rows == rows2
