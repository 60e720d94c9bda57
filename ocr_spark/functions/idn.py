"""Internationalized-domain-name (IDN) host canonicalization.

Closes the documented gap in `functions/url.py`: `url_normalize` is pure
column expressions, so a Unicode host ("Bücher.example") and its punycode
spelling ("xn--bcher-kva.example") used to canonicalize to DIFFERENT
strings and byte-identical pages escaped URL-level dedup. This module adds
the missing mapping as a from-scratch RFC 3492 punycode codec plus the
IDNA label walk, exposed two ways:

  * pure-Python kernels — `punycode_encode/decode`, `idn_host_ascii`,
    `idn_host_unicode` — spec implementations, golden-tested against the
    RFC 3492 §7.1 sample vectors and cross-checked against the stdlib
    `punycode`/`idna` codecs as independent oracles;
  * a Spark surface — `idn_normalize(col)` / `url_normalize_idn(col)` /
    `normalize_urls_idn(df)` — a VECTORIZED pandas UDF applied SPARSELY:
    a non-ASCII rlike gate routes only rows that can actually carry a
    non-ASCII host into the Arrow batch (everything else reaches the UDF
    as null and falls through `coalesce` untouched), so a 99.9%-ASCII
    crawl pays ~zero Python cost and the common path stays whole-stage
    codegen. No oracle twin: punycode is not expressible in DuckDB SQL —
    this is a pytest-golden kernel like the streaming operators
    (SURVEY §5.2), while the `url_normalize` driver row keeps its exact
    column-expression twin.

Label mapping is casefold + NFC (the UTS-46 main map for the characters a
crawl actually sees); the full IDNA2008 bidi/contextual-rule tables are
out of scope and documented so. The contract stays garbage-tolerant:
any label the codec cannot handle passes through lowercased, never raises
— same policy as every URL operator here. Canonical output is the ASCII
(punycode) form, which is also what the Public Suffix List uses, so
`registrable_domain` groups IDN hosts correctly downstream.

Reference parity: beyond-reference scope (the reference ingests local
files only, ref ocr_workflow_orchestrator.py:153-178); public specs
RFC 3492 (punycode), RFC 5890/UTS-46 (IDNA mapping, subsetted as above).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RFC 3492 §5 parameter values
_BASE = 36
_TMIN = 1
_TMAX = 26
_SKEW = 38
_DAMP = 700
_INITIAL_BIAS = 72
_INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    """RFC 3492 §6.1 bias adaptation."""
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit_char(d: int) -> str:
    # 0..25 -> 'a'..'z', 26..35 -> '0'..'9' (lowercase: host canonical form)
    return chr(d + 97) if d < 26 else chr(d - 26 + 48)


def _digit_val(ch: str) -> int:
    o = ord(ch)
    if 48 <= o <= 57:  # '0'-'9' -> 26..35
        return o - 22
    if 65 <= o <= 90:  # 'A'-'Z'
        return o - 65
    if 97 <= o <= 122:  # 'a'-'z'
        return o - 97
    raise ValueError(f"invalid punycode digit {ch!r}")


def punycode_encode(text: str) -> str:
    """RFC 3492 §6.3 encoding (bare punycode, no 'xn--' prefix)."""
    cps = [ord(c) for c in text]
    out = [c for c in text if ord(c) < 128]
    b = h = len(out)
    if b:
        out.append("-")
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    while h < len(cps):
        m = min(cp for cp in cps if cp >= n)
        delta += (m - n) * (h + 1)
        n = m
        for cp in cps:
            if cp < n:
                delta += 1
            elif cp == n:
                q, k = delta, _BASE
                while True:
                    t = (
                        _TMIN
                        if k <= bias
                        else (_TMAX if k >= bias + _TMAX else k - bias)
                    )
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(text: str) -> str:
    """RFC 3492 §6.2 decoding (bare punycode, no 'xn--' prefix)."""
    delim = text.rfind("-")
    if delim > 0:
        out = list(text[:delim])
        if any(ord(c) >= 128 for c in out):
            raise ValueError("non-basic code point in basic portion")
        pos = delim + 1
    else:
        out = []
        pos = delim + 1  # 0 when no delimiter, 1 when text starts with '-'
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    while pos < len(text):
        oldi, w, k = i, 1, _BASE
        while True:
            if pos >= len(text):
                raise ValueError("truncated variable-length integer")
            d = _digit_val(text[pos])
            pos += 1
            i += d * w
            t = _TMIN if k <= bias else (_TMAX if k >= bias + _TMAX else k - bias)
            if d < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(out) + 1, oldi == 0)
        n += i // (len(out) + 1)
        i %= len(out) + 1
        if n < 128:
            raise ValueError("decoded a basic code point")
        out.insert(i, chr(n))
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# IDNA label walk
# ---------------------------------------------------------------------------

_ACE_PREFIX = "xn--"


def _map_label(label: str) -> str:
    """UTS-46-style main mapping, subsetted: casefold then NFC. (Full
    deviation/contextual tables are out of scope; documented above.)"""
    return unicodedata.normalize("NFC", label.casefold())


def idn_host_ascii(host: str | None) -> str | None:
    """Canonical ASCII (punycode) form of a host. Per label: ASCII labels
    lowercase (an existing 'xn--' label is validated by decoding — if it
    doesn't parse it still passes through lowercased); non-ASCII labels map
    (casefold+NFC) then encode as 'xn--' + punycode. Never raises; null in
    -> null out."""
    if host is None:
        return None
    out: list[str] = []
    for label in host.split("."):
        if all(ord(c) < 128 for c in label):
            out.append(label.lower())
            continue
        try:
            mapped = _map_label(label)
            if all(ord(c) < 128 for c in mapped):
                # casefolding alone reached ASCII (e.g. fullwidth digits
                # don't, but 'K' Kelvin sign does)
                out.append(mapped)
            else:
                out.append(_ACE_PREFIX + punycode_encode(mapped))
        except Exception:
            out.append(label.lower())
    return ".".join(out)


def idn_host_unicode(host: str | None) -> str | None:
    """Display form: decode 'xn--' labels back to Unicode; labels that
    fail to decode pass through lowercased. Never raises."""
    if host is None:
        return None
    out: list[str] = []
    for label in host.split("."):
        low = label.lower()
        if low.startswith(_ACE_PREFIX):
            try:
                out.append(punycode_decode(low[len(_ACE_PREFIX):]))
                continue
            except Exception:
                pass
        out.append(low)
    return ".".join(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

# authority = [userinfo@]host[:port]; url_normalize has already stripped
# userinfo, but parse defensively anyway
_AUTH_RE = re.compile(r"^([^:/?#]*://)(?:([^/?#@]*)@)?([^/?#:]*)(.*)$", re.S)


def _idn_fix_url(url: str) -> str:
    m = _AUTH_RE.match(url)
    if not m:
        return url
    scheme, userinfo, host, rest = m.groups()
    fixed = idn_host_ascii(host)
    ui = f"{userinfo}@" if userinfo is not None else ""
    return f"{scheme}{ui}{fixed}{rest}"


@F.pandas_udf(T.StringType())
def _idn_udf(urls: pd.Series) -> pd.Series:
    # Arrow-vectorized; nulls (the ASCII-host fast path) stay null
    return urls.map(lambda u: None if u is None else _idn_fix_url(u))


def idn_normalize(col: Column) -> Column:
    """Punycode the host of an (already url_normalize'd) URL column.
    Sparse-UDF pattern: only rows whose host carries non-ASCII enter the
    Arrow batch as non-null; everything else short-circuits through
    coalesce so the common crawl path stays whole-stage codegen.

    Apply this to a MATERIALIZED attribute (a column read from storage or
    already projected), not to a large expression tree: the gate and the
    fallback each reference `col`, so a heavy expression would be
    re-evaluated.  For raw URLs use `url_normalize_idn` /
    `normalize_urls_idn`, which are shaped so the url_normalize tree is
    evaluated ~once per row."""
    from ocr_spark.functions.url import url_host

    needs = url_host(col).rlike(r"[^\x00-\x7f]")
    return F.coalesce(_idn_udf(F.when(needs, col)), col)


def url_normalize_idn(col: Column) -> Column:
    """`url_normalize` + IDN host canonicalization — the full crawl-dedup
    canonical form ('http://BÜCHER.example/a' ≡
    'http://xn--bcher-kva.example/a').

    Plan shape (measured, 200k URLs / local[32], warm): the sparse gate
    tests the RAW column for any non-ASCII byte — sound because
    url_normalize maps pure-ASCII input to pure-ASCII output, so an
    ASCII spelling cannot hide a non-ASCII host (non-ASCII confined to
    the path routes a row through the UDF needlessly but harmlessly).
    With the gate on the raw attribute, the heavy url_normalize tree is
    evaluated lazily inside the CASE WHEN (gated rows only, inside the
    ArrowEvalPython argument projection) plus once in the coalesce
    fallback — ~1.0 evaluations/row on an ASCII-dominant corpus: 7.1 s
    vs 12.8 s for gating on url_host(normalized) (which evaluates the
    tree twice for every row).  Do NOT stage the normalized URL as an
    intermediate attribute feeding the UDF: that lands the heavy
    projection in a dedicated Project below the ArrowEvalPython node,
    outside whole-stage codegen, and measured 43-110 s on the same
    input."""
    from ocr_spark.functions.url import url_normalize

    needs = col.rlike(r"[^\x00-\x7f]")
    norm = url_normalize(col)
    return F.coalesce(_idn_udf(F.when(needs, norm)), norm)


def normalize_urls_idn(docs, url_col: str = "url", out_col: str | None = None):
    """DataFrame surface over `url_normalize_idn` (same plan shape — see
    its docstring for the measured layout): rewrites `url_col` in place
    or into `out_col`, preserving all other columns."""
    out_col = out_col or url_col
    return docs.withColumn(out_col, url_normalize_idn(F.col(url_col)))
