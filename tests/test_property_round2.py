"""Property-based tests for the round-2 kernels: PNG encode, quad geometry,
the MinHash family, and PII scrubbing idempotence. Pure-numpy/python
properties — no Spark session needed, so hypothesis can run many examples
cheaply."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# K13: PNG encode — every encode is a spec-valid, lossless container
# ---------------------------------------------------------------------------


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    from ocr_spark.operators.cloud_engine import png_encode

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    data = png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    (ihdr_len,) = struct.unpack(">I", data[8:12])
    iw, ih = struct.unpack(">II", data[16:24])
    assert (iw, ih) == (w, h)
    # IDAT payload decompresses to exact filter-0 scanlines
    pos, raw = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(data[pos + 8 : pos + 8 + length])
        pos += 12 + length
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(rows[:, 1:], img)


# ---------------------------------------------------------------------------
# W1 ordering invariants
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(0, 2**31 - 1),
    roll=st.integers(0, 3),
)
@settings(max_examples=60, deadline=None)
def test_order_quads_permutation_invariant(seed, roll):
    """Ordering is a selection from the input points (no new points), is
    invariant to corner rolls, and idempotent."""
    from ocr_spark.operators.quad_geometry import order_quads

    pts = np.random.default_rng(seed).uniform(0, 100, (1, 4, 2))
    base = order_quads(pts)
    rolled = order_quads(np.roll(pts, roll, axis=1))
    np.testing.assert_array_equal(base, rolled)
    np.testing.assert_array_equal(order_quads(base), base)
    # every output corner is one of the input corners
    for c in base[0]:
        assert any((c == p).all() for p in pts[0])


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_quad_area_invariant_under_ordering(seed):
    """For CONVEX quads the shoelace area is ordering-independent once W1
    normalizes the traversal; generate convex quads via rotated rectangles."""
    from ocr_spark.operators.quad_geometry import order_quads, quad_areas

    rng = np.random.default_rng(seed)
    w, h = rng.uniform(1, 20, 2)
    theta = rng.uniform(-np.pi / 5, np.pi / 5)
    c, s = np.cos(theta), np.sin(theta)
    base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]])
    quad = (base @ np.array([[c, s], [-s, c]]) + 50.0)[None]
    want = 4 * w * h
    for roll in range(4):
        rolled = np.roll(quad, roll, axis=1)
        got = quad_areas(order_quads(rolled))[0]
        np.testing.assert_allclose(got, want, rtol=1e-9)


# ---------------------------------------------------------------------------
# min-area rectangle: optimality + containment over random clouds
# ---------------------------------------------------------------------------


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(3, 40))
@settings(max_examples=40, deadline=None)
def test_min_area_box_contains_all_points(seed, n):
    from ocr_spark.operators.media_kernels import min_area_box

    pts = np.random.default_rng(seed).uniform(-50, 50, (n, 2))
    center, u, v, eu, ev = min_area_box(pts)
    rel = pts - center
    pu = rel @ u
    pv = rel @ v
    assert (np.abs(pu) <= eu / 2 + 1e-9).all()
    assert (np.abs(pv) <= ev / 2 + 1e-9).all()
    assert abs(u @ v) < 1e-12 and abs(np.linalg.norm(u) - 1) < 1e-12


# ---------------------------------------------------------------------------
# MinHash KM family: exchangeable, deterministic, identical docs agree
# ---------------------------------------------------------------------------


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_km_family_python_twin(seed):
    """The 2-base KM construction is order-independent (min over a set) and
    identical inputs give identical signatures — checked on a pure-python
    twin of the Spark expressions."""
    import hashlib

    mask30 = (1 << 30) - 1

    def h60(sx: str) -> int:
        return int(hashlib.md5(sx.encode()).hexdigest()[:15], 16)

    def member(sh: int, i: int) -> int:
        h1 = h60(f"{sh}:A") & mask30
        h2 = h60(f"{sh}:B") & mask30
        return (h1 + i * h2) & mask30

    rng = np.random.default_rng(seed)
    shingles = [int(x) for x in rng.integers(0, 1 << 60, 12)]
    sig_fwd = [min(member(sh, i) for sh in shingles) for i in range(8)]
    sig_rev = [min(member(sh, i) for sh in reversed(shingles)) for i in range(8)]
    assert sig_fwd == sig_rev
    assert all(0 <= m <= mask30 for m in sig_fwd)
    # members for different i genuinely differ (no collapsed permutations)
    vals = {tuple(member(sh, i) for sh in shingles) for i in range(8)}
    assert len(vals) == 8


# ---------------------------------------------------------------------------
# PII scrub: placeholders are fixed points (idempotence on scrubbed text)
# ---------------------------------------------------------------------------


def test_pii_scrub_idempotent_on_python_twin():
    import re

    from ocr_spark.operators.text_analysis import PII_RULES

    samples = [
        "a@b.co and 10.1.2.3 and +123 456-7890 mixed",
        "<EMAIL> already scrubbed <IP> <PHONE>",
        "edge a@b.cde f@g.hi 255.255.255.255",
    ]
    for s in samples:
        once = s
        for pat, rep in PII_RULES:
            once = re.sub(pat, rep, once)
        twice = once
        for pat, rep in PII_RULES:
            twice = re.sub(pat, rep, twice)
        assert once == twice
        assert "@" not in once or "<EMAIL>" in once
