"""Independent (test-side) implementations of the heavy-kind specs:
T8 HTML boilerplate strip, K15/W3 PDF XY-cut, and the fake OCR media chain.

Written deliberately in a different style from the engine (plain dict/loop
Python, no vectorization) so e2e tests compare two independently-coded
implementations of the same written spec (SURVEY.md §5.2).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import numpy as np

# --------------------------- HTML (T8 spec) --------------------------------

_BLOCK = {
    "p", "div", "article", "section", "li", "td", "th", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "body", "ul", "ol", "table", "tr",
    "nav", "header", "footer", "aside", "main", "figcaption",
}
_BOILER = {"nav", "header", "footer", "aside"}
_IGNORE = {"script", "style", "head", "title", "noscript"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_VOID = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


class _P(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.open_tags = []
        self.open_blocks = []
        self.blocks = []

    def _new_block(self, tag):
        self.blocks.append(
            {
                "tag": tag,
                "boiler": tag in _BOILER or any(t in _BOILER for t in self.open_tags[:-1]),
                "runs": [],
                "link_runs": [],
            }
        )
        self.open_blocks.append(len(self.blocks) - 1)

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            return
        self.open_tags.append(tag)
        if tag in _BLOCK:
            self._new_block(tag)

    def handle_endtag(self, tag):
        if tag in _VOID or tag not in self.open_tags:
            return
        while self.open_tags:
            t = self.open_tags.pop()
            if t in _BLOCK and self.open_blocks:
                self.open_blocks.pop()
            if t == tag:
                break

    def handle_data(self, data):
        if any(t in _IGNORE for t in self.open_tags):
            return
        run = " ".join(data.split())
        if not run:
            return
        if not self.open_blocks:
            self.open_tags.append("body")  # implicit body block
            self.open_tags.pop()
            self._new_block("body")
        b = self.blocks[self.open_blocks[-1]]
        b["runs"].append(run)
        if "a" in self.open_tags:
            b["link_runs"].append(run)


def html_extract(html: str) -> str:
    p = _P()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    kept = []
    for b in p.blocks:
        text = " ".join(b["runs"])
        if not text:
            continue
        link_len = sum(len(r) for r in b["link_runs"]) + max(0, len(b["link_runs"]) - 1)
        link_len = min(link_len, len(text)) if b["link_runs"] else 0
        n_words = len(text.split())
        ld = link_len / max(len(text), 1)
        keep = (not b["boiler"]) and (
            (ld <= 1.0 / 3.0 and n_words >= 4)
            or (b["tag"] in _HEADINGS and n_words >= 1 and ld == 0.0)
        )
        if keep:
            kept.append(text)
    return "\n".join(kept)


# --------------------------- PDF (K15/W3 spec) ------------------------------


def _axis_cuts(intervals):
    ivs = sorted(intervals)
    cuts = []
    run_end = ivs[0][1]
    for lo, hi in ivs[1:]:
        if lo - run_end >= 1.0:
            cuts.append((run_end + lo) / 2.0)
        run_end = max(run_end, hi)
    return cuts


def _xy(blocks):
    if len(blocks) <= 1:
        return list(blocks)
    cuts = _axis_cuts([(b["y"], b["y"] + b["h"]) for b in blocks])
    if cuts:
        groups = []
        edges = [float("-inf")] + cuts + [float("inf")]
        for a, bnd in zip(edges[:-1], edges[1:]):
            g = [b for b in blocks if a < b["y"] < bnd]
            groups.append(g)
        out = []
        for g in groups:
            out.extend(_xy(g))
        return out
    cuts = _axis_cuts([(b["x"], b["x"] + b["w"]) for b in blocks])
    if cuts:
        out = []
        edges = [float("-inf")] + cuts + [float("inf")]
        for a, bnd in zip(edges[:-1], edges[1:]):
            out.extend(_xy([b for b in blocks if a < b["x"] < bnd]))
        return out
    return sorted(blocks, key=lambda b: (b["y"], b["x"]))


def pdf_extract(payload: str) -> str:
    try:
        page = json.loads(payload or "{}")
    except json.JSONDecodeError:
        return ""
    blocks = page.get("blocks", [])
    if not blocks:
        return ""
    return "\n".join(str(b.get("text", "")) for b in _xy(blocks))


# ----------------------- media fake-OCR chain (spec) -------------------------

_CHARSET = list("abcdefghijklmnopqrstuvwxyz ")


def media_recognize(payload: bytes) -> tuple[str, float]:
    """Independent restatement of the fake-engine spec in
    operators/media_kernels.recognize_image."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size < 32 * 32:
        raise ValueError("short payload")
    gray = arr[: 32 * 32].reshape(32, 32).astype(np.float64)

    seg = gray / 255.0
    fg = (seg > 0.3).mean(axis=1) > 0.5
    # contiguous fg row runs
    boxes = []
    y = 0
    while y < 32 and len(boxes) < 4:
        if not fg[y]:
            y += 1
            continue
        y0 = y
        while y < 32 and fg[y]:
            y += 1
        band = seg[y0:y]
        m = band[band > 0.3]
        score = m.mean() if m.size else 0.0
        if score < 0.6:
            continue
        if min(32, y - y0) < 3:
            continue
        boxes.append((y0, y))
    if not boxes:
        return "", 0.0

    parts = []
    for y0, y1 in boxes:
        crop = gray[y0:y1]
        # block-mean resize to (8, 28)
        T_, C_ = 8, len(_CHARSET) + 1
        h = y1 - y0
        ys = [int(i * h / T_) for i in range(T_ + 1)]
        xs = [int(j * 32 / C_) for j in range(C_ + 1)]
        logits = np.zeros((T_, C_))
        for i in range(T_):
            r0, r1 = ys[i], max(ys[i + 1], ys[i] + 1)
            for j in range(C_):
                c0, c1 = xs[j], max(xs[j + 1], xs[j] + 1)
                logits[i, j] = crop[r0:r1, c0:c1].mean()
        logits = (logits - 128.0) / 16.0
        # CTC greedy decode
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        path = probs.argmax(axis=1)
        chars, confs, last = [], [], -1
        for t, ci in enumerate(path):
            if ci == len(_CHARSET):
                last = -1
                continue
            if ci == last:
                continue
            chars.append(_CHARSET[ci])
            confs.append(probs[t, ci])
            last = int(ci)
        text = "".join(chars)
        conf = float(np.mean(confs)) if confs else 0.0
        mean_i = int(gray[y0:y1].mean())
        if mean_i % 13 == 0:
            text, conf = "Error: Rec Inference Failed", 0.0
        elif mean_i % 17 == 0:
            text, conf = "REC_FAIL", 0.0
        parts.append((text, conf))

    total, n, texts = 0.0, 0, []
    for text, conf in parts:
        if text.startswith("Error:") or text == "REC_FAIL":
            conf = 0.0
        else:
            texts.append(text)
        if conf > 0.0:
            total += conf
            n += 1
    return "\n".join(texts), (total / n) if n else 0.0
