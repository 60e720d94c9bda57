"""Cloud-OCR engine analogue: K13 PNG encode, K14 nested-response flatten,
A3 first-page confidence (ref ocr_components/google_ocr_engine.py).

The reference's cloud path PNG-encodes the image (ref :77-87), calls the
Vision API, and flattens the nested pages→blocks→paragraphs→words→symbols
response into (full_text, segments, overall_confidence) (ref :149-211) with
these load-bearing semantics, all mirrored here exactly:

  * overall confidence = pages[0].confidence — the FIRST page's value, not a
    mean (ref :149-150, A3);
  * word text = ''.join(symbol.text) (ref :160);
  * words without bounding-box vertices are skipped (ref :162-164);
  * F11 bbox: normalized vertices ×(img_w,img_h) → axis-aligned
    [max(0,int(x1)), max(0,int(y1)), min(img_w,int(x2)), min(img_h,int(y2))]
    (ref :184-205 — int() truncation THEN clamp, x2/y2 clamped to the full
    width/height, not width-1);
  * full_text is the annotation's own text — it INCLUDES vertex-less words
    that never become segments (ref :145 vs :162).

No cloud SDK exists in the sandbox, so the API call is a deterministic fake
(`fake_cloud_response`) keyed on the PNG bytes; the encode (a real,
spec-conformant PNG writer — stdlib zlib, no imaging libs) and the flatten
are the real operators. The per-image Python loop is deliberate: the cloud
path models a 1-5 s/page remote API (BASELINE.md), so per-image orchestration
cost is noise; the batch math stays numpy.

Spark-side, `flatten_response_df` is the same K14 traversal as native
DataFrame expressions — a posexplode chain (generate-only: no shuffle, no
UDF), so at 100 TB the flatten is pure whole-stage-codegen over the nested
columns and Catalyst prunes unused response fields from the scan.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

LETTERS = "abcdefghijklmnopqrstuvwxyz"

# ---------------------------------------------------------------------------
# K13: PNG encode (ref google_ocr_engine.py:77-87 — cv2.imencode('.png'))
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(
    img: np.ndarray,
    interlace: bool = False,
    bit_depth: int = 8,
    palette: np.ndarray | None = None,
) -> bytes:
    """Spec-conformant PNG: grayscale (2-D) at depths 1/2/4/8/16, RGB
    (H,W,3) at depths 8/16, or indexed (2-D + `palette` (n,3)) at depths
    1/2/4/8. Filter 0 scanlines, one zlib IDAT, deterministic (fixed
    compression level). interlace=True writes Adam7 (7 reduced images in
    pass order). Sub-8-bit images take RAW d-bit sample values (0..2^d-1
    gray levels or palette indices); 16-bit replicates each 8-bit sample
    (v*257), so decode's high-byte reduction round-trips exactly."""
    if img.dtype != np.uint8:
        raise ValueError(f"png_encode expects uint8, got {img.dtype}")
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette PNG expects (H,W) index array")
        if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] == 0:
            raise ValueError("palette must be (n,3) uint8")
        if bit_depth not in (1, 2, 4, 8):
            raise ValueError(f"palette PNG bit_depth {bit_depth} invalid")
        if int(img.max(initial=0)) >= min(palette.shape[0], 1 << bit_depth):
            raise ValueError("palette index out of range for depth/palette")
        color_type, ch = 3, 1
    elif img.ndim == 2:
        color_type, ch = 0, 1
        if bit_depth not in (1, 2, 4, 8, 16):
            raise ValueError(f"gray PNG bit_depth {bit_depth} invalid")
        if bit_depth < 8 and int(img.max(initial=0)) >= (1 << bit_depth):
            raise ValueError("sub-8-bit gray expects raw d-bit sample values")
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        if bit_depth not in (8, 16):
            raise ValueError(f"RGB PNG bit_depth {bit_depth} invalid")
    else:
        raise ValueError(f"png_encode expects (H,W) or (H,W,3), got {img.shape}")
    h, w = img.shape[0], img.shape[1]
    px = img.reshape(h, w, ch)

    def scan(sub: np.ndarray) -> bytes:
        """(ph, pw, ch) samples → filter-0 scanlines (packed + row-padded)."""
        ph, pw = sub.shape[0], sub.shape[1]
        flat = sub.reshape(ph, pw * ch)
        if bit_depth == 8:
            body = flat
        elif bit_depth == 16:
            wide = flat.astype(np.uint16) * 257
            body = (
                np.stack([(wide >> 8) & 0xFF, wide & 0xFF], axis=-1)
                .reshape(ph, pw * ch * 2)
                .astype(np.uint8)
            )
        else:  # pack d-bit fields MSB-first; packbits zero-pads each row
            shifts = np.arange(bit_depth - 1, -1, -1)
            bits = ((flat[:, :, None] >> shifts) & 1).astype(np.uint8)
            body = np.packbits(bits.reshape(ph, -1), axis=1)
        return np.concatenate(
            [np.zeros((ph, 1), dtype=np.uint8), body], axis=1
        ).tobytes()

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size:
                parts.append(scan(sub))
        scanlines = b"".join(parts)
    else:
        scanlines = scan(px)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, int(bool(interlace))
    )
    plte = _chunk(b"PLTE", palette.tobytes()) if palette is not None else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + plte
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec order
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_inflate(idat_parts: list[bytes], expected: int) -> bytes:
    """Inflate the joined IDAT stream to exactly `expected` bytes.
    Decompression is bounded by the IHDR-derived size, so a crafted
    zlib-bomb IDAT cannot balloon past the declared image."""
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat_parts), expected)
    if len(raw) != expected:
        raise ValueError("corrupt PNG: wrong decompressed length")
    if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
        raise ValueError("corrupt PNG: stream longer than the declared image")
    return raw


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Unfilter `height` scanlines of `stride` bytes — the core shared by
    the non-interlaced path and each Adam7 reduced image. `bpp` is the
    PNG filter distance in BYTES (max(1, bits_per_pixel // 8)); `stride`
    is always a multiple of it (bpp > 1 only at depth 8/16 where
    stride = width * bpp). Returns (height, stride) uint8."""
    n_px = stride // bpp  # filter units per scanline
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        line = raw[y, 1:].astype(np.int64)
        ft = filters[y]
        up = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + up) & 0xFF
        elif ft == 1:  # Sub: per-lane prefix sum (mod 256 distributes)
            lanes = line.reshape(n_px, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(stride)
        elif ft in (3, 4):  # Average / Paeth: left-to-right, per-pixel step
            cur = np.empty(stride, dtype=np.int64)
            up_px = up.reshape(n_px, bpp)
            line_px = line.reshape(n_px, bpp)
            cur_px = cur.reshape(n_px, bpp)
            prev = np.zeros(bpp, dtype=np.int64)  # a: left pixel
            prev_up = np.zeros(bpp, dtype=np.int64)  # c: upper-left pixel
            for x in range(n_px):
                b = up_px[x]
                if ft == 3:
                    pred = (prev + b) >> 1
                else:
                    p = prev + b - prev_up
                    pa = np.abs(p - prev)
                    pb = np.abs(p - b)
                    pc = np.abs(p - prev_up)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), prev, np.where(pb <= pc, b, prev_up)
                    )
                prev = (line_px[x] + pred) & 0xFF
                cur_px[x] = prev
                prev_up = b
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
    return out


def _png_samples(
    rows: np.ndarray, width: int, channels: int, bit_depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes (h, stride) → per-pixel samples
    (h, width*channels) uint8. Depth < 8 unpacks MSB-first bit fields
    (values NOT yet scaled — palette indices must stay raw); depth 16
    keeps the high byte (the PNG-recommended 16→8 reduction)."""
    h = rows.shape[0]
    n = width * channels
    if bit_depth == 8:
        return rows[:, :n]
    if bit_depth == 16:
        return rows.reshape(h, n, 2)[:, :, 0].copy()
    bits = np.unpackbits(rows, axis=1)[:, : n * bit_depth]
    weights = 1 << np.arange(bit_depth - 1, -1, -1)
    return (
        bits.reshape(h, n, bit_depth).astype(np.uint16) @ weights
    ).astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Corrupt-input contract wrapper: malformed PNGs raise ValueError
    only (zlib/struct/slice errors from corrupt chunk soup are converted
    so per-asset envelopes and ValueError-filtering callers hold)."""
    import zlib

    try:
        return _png_decode_inner(data)
    except (zlib.error, struct.error, IndexError, MemoryError, OverflowError) as e:
        raise ValueError(f"corrupt PNG: {type(e).__name__}: {e}") from None


def _png_decode_inner(data: bytes) -> np.ndarray:
    """Real PNG decoder (stdlib zlib): grayscale / RGB / gray+alpha / RGBA
    at depths 8 and 16, palette (PLTE) at depths 1/2/4/8, grayscale at
    depths 1/2/4 (round 5: the indexed + bilevel web-image formats),
    non-interlaced AND Adam7-interlaced, all five scanline filter types.
    Returns (H,W) or (H,W,C) uint8 — 16-bit samples keep the high byte,
    sub-8-bit grayscale is scaled to full range (0..2^d-1 → 0..255).
    Alpha is dropped (the kernels are opaque-image ops), so tRNS is
    intentionally ignored too.

    Unfiltering is vectorized where the filter's data dependence allows:
    None/Up are whole-row ops, Sub is a per-channel-lane cumulative sum
    (mod-256 distributes over the prefix sum), Average/Paeth are inherently
    left-to-right but iterate per PIXEL with channel-vectorized math.

    This is a genuine codec, not a stub — with it the binaryFile sidecar
    path decodes actual .png payloads end to end (S1, ref
    ocr_workflow_orchestrator.py:153-178 loads real image files)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat_parts: list[bytes] = []
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError("corrupt PNG: bad PLTE length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    valid_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        color_type, (8, 16)
    )
    if bit_depth not in valid_depths or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG: color_type={color_type} bit_depth={bit_depth} "
            f"interlace={interlace}"
        )
    if color_type == 3 and palette is None:
        raise ValueError("corrupt PNG: palette image missing PLTE")
    # filter distance in bytes; scanline stride in bytes (spec: packed bits,
    # rows padded to a byte boundary)
    bpp = max(1, channels * bit_depth // 8)

    def _stride(w: int) -> int:
        return (w * channels * bit_depth + 7) // 8

    if interlace == 0:
        stride = _stride(width)
        expected = height * (stride + 1)
        raw = _png_inflate(idat_parts, expected)
        rows = _png_unfilter(raw, height, stride, bpp)
        img = _png_samples(rows, width, channels, bit_depth).reshape(
            height, width, channels
        )
    else:
        # Adam7: the stream is 7 consecutive reduced images, each with its
        # own filtered scanlines; decode each pass with the same unfilter
        # core and scatter into the full image on the pass grid
        passes = [
            (x0, y0, dx, dy, (width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        ]
        expected = sum(
            ph * (_stride(pw) + 1) for *_x, pw, ph in passes if pw and ph
        )
        raw = _png_inflate(idat_parts, expected)
        img = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in passes:
            if not pw or not ph:
                continue
            size = ph * (_stride(pw) + 1)
            sub = _png_unfilter(raw[pos : pos + size], ph, _stride(pw), bpp)
            img[y0::dy, x0::dx] = _png_samples(
                sub, pw, channels, bit_depth
            ).reshape(ph, pw, channels)
            pos += size
    if color_type == 3:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("corrupt PNG: palette index out of range")
        return palette[idx]
    if color_type == 0 and bit_depth < 8:
        # scale 0..2^d-1 to full 8-bit range (255/(2^d-1) is an integer)
        return (img[:, :, 0] * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if channels == 1:
        return img[:, :, 0].copy()
    if channels == 2:  # gray + alpha → gray
        return img[:, :, 0].copy()
    if channels == 4:  # RGBA → RGB
        return img[:, :, :3].copy()
    return img


# ---------------------------------------------------------------------------
# Deterministic fake cloud API (sandbox stand-in for the Vision call)
# ---------------------------------------------------------------------------

_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_M64 = (1 << 64) - 1


def fake_cloud_response(gray: np.ndarray) -> dict:
    """Deterministic nested response for a grayscale image: one page whose
    blocks are the image's bright text bands (the same structure the local
    detector sees), words/confidences drawn from an LCG seeded by the PNG
    bytes. Some words carry no vertices — exercising the reference's
    skip-word path (ref :162-164) — yet still appear in full_text."""
    png = png_encode(gray)
    seed = int.from_bytes(hashlib.sha256(png).digest()[:8], "big")
    h, w = gray.shape
    bright = (gray.mean(axis=1) >= 100.0).astype(np.int8)
    edges = np.flatnonzero(np.diff(np.concatenate(([0], bright, [0]))))
    # plain-python ints: the response dict feeds json-ish consumers
    # (createDataFrame in tests) that reject numpy scalars
    runs = edges.reshape(-1, 2).tolist()  # (start_row, stop_row) per band

    page_conf = round((seed % 1000) / 1000.0, 3)
    rng = seed
    blocks = []
    for bi, (r0, r1) in enumerate(runs):
        n_words = 2 + ((seed >> (7 * (bi % 8))) % 3)
        words = []
        for wi in range(n_words):
            rng = (rng * _LCG_A + _LCG_C) & _M64
            ln = 2 + ((rng >> 5) % 5)
            txt = "".join(LETTERS[(rng >> (3 * (j + 1))) % 26] for j in range(ln))
            conf = round(((rng >> 17) % 100) / 100.0, 2)
            if rng % 7 == 0:
                verts = []  # vertex-less word: skipped by the flatten
            else:
                verts = [
                    {"x": wi / n_words, "y": r0 / h},
                    {"x": (wi + 1) / n_words, "y": r0 / h},
                    {"x": (wi + 1) / n_words, "y": r1 / h},
                    {"x": wi / n_words, "y": r1 / h},
                ]
            words.append(
                {
                    "symbols": [{"text": c} for c in txt],
                    "vertices": verts,
                    "confidence": conf,
                }
            )
        blocks.append({"paragraphs": [{"words": words}]})
    full_text = "\n".join(
        " ".join(
            "".join(s["text"] for s in wd["symbols"])
            for wd in blk["paragraphs"][0]["words"]
        )
        for blk in blocks
    )
    return {"text": full_text, "pages": [{"confidence": page_conf, "blocks": blocks}]}


# ---------------------------------------------------------------------------
# K14: response flatten (ref google_ocr_engine.py:149-211)
# ---------------------------------------------------------------------------


def flatten_response(
    resp: dict, img_w: int, img_h: int
) -> tuple[str, list[dict], float]:
    """Reference traversal, exactly: returns (full_text, segments, overall).

    overall = pages[0].confidence (A3, ref :149-150); segments carry F11
    bboxes [x1,y1,x2,y2] with int-truncate-then-clamp (ref :196-201)."""
    full_text = resp.get("text") or ""
    pages = resp.get("pages") or []
    overall = float(pages[0].get("confidence") or 0.0) if pages else 0.0
    segments: list[dict] = []
    for page in pages:
        for block in page.get("blocks") or []:
            for para in block.get("paragraphs") or []:
                for word in para.get("words") or []:
                    word_text = "".join(
                        s["text"] for s in (word.get("symbols") or [])
                    )
                    verts = word.get("vertices") or []
                    if not verts:
                        continue  # ref :162-164
                    xs = [v["x"] * img_w for v in verts]
                    ys = [v["y"] * img_h for v in verts]
                    bbox = [
                        max(0, int(min(xs))),
                        max(0, int(min(ys))),
                        min(img_w, int(max(xs))),
                        min(img_h, int(max(ys))),
                    ]
                    segments.append(
                        {
                            "text": word_text,
                            "bounding_box": bbox,
                            "confidence": float(word.get("confidence") or 0.0),
                        }
                    )
    return full_text, segments, overall


def recognize_cloud_batch(grays: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Cloud-engine twin of media_kernels.recognize_gray_batch: per image,
    PNG-encode (K13) → (fake) API → flatten (K14). Returns (texts, confs)
    where text is the annotation full_text and conf the A3 first-page value."""
    texts: list[str] = []
    confs = np.zeros(len(grays), dtype=np.float64)
    for i, g in enumerate(grays):
        resp = fake_cloud_response(g)
        full_text, _segments, overall = flatten_response(
            resp, g.shape[1], g.shape[0]
        )
        texts.append(full_text)
        confs[i] = overall
    return texts, confs


# ---------------------------------------------------------------------------
# Spark-native K14: posexplode chain over a nested response column
# ---------------------------------------------------------------------------


def flatten_response_df(df, img_w: float, img_h: float, resp_col: str = "response"):
    """K14 as native DataFrame expressions over
    response: struct<text, pages: array<struct<confidence,
        blocks: array<struct<paragraphs: array<struct<words: array<struct<
            symbols: array<struct<text>>, vertices: array<struct<x,y>>,
            confidence>>>>>>>>>.

    One row per word WITH vertices: positional indexes (page, block, para,
    word), word_text = join(symbol texts), F11 denorm+clip bbox (int-cast
    truncation — the reference's int() — then clamp), word confidence,
    and overall_conf = pages[0].confidence (A3). Generate-only plan: four
    posexplodes, zero shuffles, fully codegen'd; Catalyst prunes any response
    field not referenced here from the scan.
    """
    from pyspark.sql import functions as F

    keep = [c for c in df.columns if c != resp_col]
    overall = F.element_at(F.col(f"{resp_col}.pages"), 1)["confidence"].alias(
        "overall_conf"
    )
    pg = df.select(
        *keep, overall, F.posexplode(f"{resp_col}.pages").alias("page", "_pg")
    )
    bl = pg.select(
        *keep, "overall_conf", "page", F.posexplode("_pg.blocks").alias("block", "_bl")
    )
    pr = bl.select(
        *keep,
        "overall_conf",
        "page",
        "block",
        F.posexplode("_bl.paragraphs").alias("para", "_pr"),
    )
    wd = pr.select(
        *keep,
        "overall_conf",
        "page",
        "block",
        "para",
        F.posexplode("_pr.words").alias("word", "_wd"),
    ).where(F.size("_wd.vertices") > 0)

    xs = F.transform("_wd.vertices", lambda v: v["x"] * F.lit(float(img_w)))
    ys = F.transform("_wd.vertices", lambda v: v["y"] * F.lit(float(img_h)))
    return wd.select(
        *keep,
        F.col("page").cast("int").alias("page"),
        F.col("block").cast("int").alias("block"),
        F.col("para").cast("int").alias("para"),
        F.col("word").cast("int").alias("word"),
        F.array_join(F.transform("_wd.symbols", lambda s: s["text"]), "").alias(
            "word_text"
        ),
        # cast-to-int truncates toward zero (Java semantics) — exactly the
        # reference's Python int(); floor() would diverge on negative
        # fractional maxima (floor(-0.5) = -1 vs int(-0.5) = 0)
        F.greatest(F.lit(0), F.array_min(xs).cast("int")).alias("x1"),
        F.greatest(F.lit(0), F.array_min(ys).cast("int")).alias("y1"),
        F.least(F.lit(int(img_w)), F.array_max(xs).cast("int")).alias("x2"),
        F.least(F.lit(int(img_h)), F.array_max(ys).cast("int")).alias("y2"),
        F.col("_wd.confidence").cast("double").alias("word_conf"),
        F.col("overall_conf").cast("double").alias("overall_conf"),
    )
