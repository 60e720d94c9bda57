"""K15 + W3 — PDF page-block segmentation + recursive XY-cut reading order.

North-star operator (BASELINE.json). Reference anchor: FR6 layout spec
("output should preserve reading order", >95% block accuracy —
ref OCR-X_Requirements_Specification.md:66-79); no code exists in the
reference, so the recursive XY-cut below is this engine's spec, locked by
golden fixtures and implemented independently in tests/reference_impl_pdf.py.

Input payload (fixtures): JSON ``{page_w, page_h, blocks:[{x,y,w,h,text}]}``
with blocks in arbitrary (shuffled) order.

Spec
----
XY-cut(region):
  1. If the region's blocks can be separated by a horizontal gap (an
     y-interval of width >= 1px covered by no block), split at ALL such gaps
     and recurse on the sub-regions top-to-bottom.
  2. Else, if separable by a vertical gap, split and recurse left-to-right.
  3. Else (no cut), emit blocks ordered by (y, x, text).
Reading order = depth-first emission; output text = block texts joined '\n'.
All geometry is vectorized numpy per document (no per-block Python beyond the
recursion frame).
"""

from __future__ import annotations

import json

import numpy as np

MIN_GAP = 1.0


def _gaps(lo: np.ndarray, hi: np.ndarray) -> list[float]:
    """Cut coordinates: midpoints of maximal empty intervals between
    [lo,hi) spans (vectorized sweep over sorted interval endpoints)."""
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order], hi[order]
    run_hi = np.maximum.accumulate(hi_s)
    cuts = []
    for i in range(1, len(lo_s)):
        if lo_s[i] - run_hi[i - 1] >= MIN_GAP:
            cuts.append(float((lo_s[i] + run_hi[i - 1]) / 2.0))
    return cuts


def xy_cut_order(x: np.ndarray, y: np.ndarray, w: np.ndarray, h: np.ndarray) -> list[int]:
    """Return block indices in reading order (spec above)."""
    n = len(x)
    x2, y2 = x + w, y + h
    out: list[int] = []

    def rec(idx: np.ndarray) -> None:
        if idx.size == 0:
            return
        if idx.size == 1:
            out.append(int(idx[0]))
            return
        # 1. horizontal cut (split on y gaps)
        cuts = _gaps(y[idx], y2[idx])
        if cuts:
            edges = [-np.inf, *cuts, np.inf]
            for a, b in zip(edges[:-1], edges[1:]):
                rec(idx[(y[idx] > a) & (y[idx] < b)])
            return
        # 2. vertical cut (split on x gaps)
        cuts = _gaps(x[idx], x2[idx])
        if cuts:
            edges = [-np.inf, *cuts, np.inf]
            for a, b in zip(edges[:-1], edges[1:]):
                rec(idx[(x[idx] > a) & (x[idx] < b)])
            return
        # 3. leaf: (y, x) order
        order = np.lexsort((x[idx], y[idx]))
        out.extend(int(i) for i in idx[order])

    rec(np.arange(n))
    return out


def extract_pdf_text(payload: str) -> str:
    """Per-document K15/W3: parse layout JSON → XY-cut → join texts."""
    try:
        page = json.loads(payload or "{}")
        blocks = page.get("blocks", [])
    except (json.JSONDecodeError, AttributeError):
        return ""
    if not blocks:
        return ""
    x = np.array([float(b["x"]) for b in blocks])
    y = np.array([float(b["y"]) for b in blocks])
    w = np.array([float(b["w"]) for b in blocks])
    h = np.array([float(b["h"]) for b in blocks])
    order = xy_cut_order(x, y, w, h)
    return "\n".join(str(blocks[i].get("text", "")) for i in order)


def extract_pdf_batch(payloads: list[str]) -> list[str]:
    """Batch API used by the dispatch mapInPandas stage."""
    return [extract_pdf_text(p) for p in payloads]
