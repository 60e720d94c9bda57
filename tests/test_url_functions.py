"""URL canonicalization + registrable-domain operators (functions/url.py)
against a pure-Python urllib reference over the contractual normalization."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.url import registrable_domain, url_normalize

CASES = [
    "HTTP://WWW.Example.COM:80/Path/To?utm_source=x&id=5&ref=abc#frag",
    "https://example.co.uk:443/",
    "https://user:pw@Sub.Site.ORG:8443/a//b?z=1&utm_campaign=q",
    "http://example.com",
    "http://localhost:3000/api?fbclid=XYZ",
    "ftp://files.example.net/pub",
    "https://a.b.c.d.co.jp/deep?gclid=1&keep=2&utm_x=y",
    "http://example.com/?",
    "http://example.com:8080?x=1",
]

_TRACKING = ("fbclid", "gclid", "msclkid", "ref")


def ref_normalize(u: str) -> str:
    s = urlsplit(u)
    scheme = s.scheme.lower()
    host = (s.hostname or "").lower()
    port = ""
    if s.port is not None and not (
        (scheme == "http" and s.port == 80) or (scheme == "https" and s.port == 443)
    ):
        port = f":{s.port}"
    path = s.path or "/"
    params = [
        p
        for p in s.query.split("&")
        if p and not (p.split("=")[0].startswith("utm_") or p.split("=")[0] in _TRACKING)
    ]
    q = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port}{path}{q}"


def test_url_normalize_matches_urllib_reference(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], "i long, url string")
    got = [
        r.n
        for r in df.select("i", url_normalize(F.col("url")).alias("n"))
        .orderBy("i")
        .collect()
    ]
    assert got == [ref_normalize(u) for u in CASES]


def test_url_normalize_null_and_garbage(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "not a url at all"), (2, "")], "i long, url string"
    )
    got = [
        r.n
        for r in df.select("i", url_normalize(F.col("url")).alias("n"))
        .orderBy("i")
        .collect()
    ]
    assert got[0] is None
    assert got[1] is not None and got[2] is not None  # garbage-tolerant, no raise


@pytest.mark.parametrize(
    "url,want",
    [
        ("https://www.example.co.uk/x", "example.co.uk"),
        ("https://a.b.c.d.co.jp/x", "d.co.jp"),
        ("http://example.com/x", "example.com"),
        ("http://deep.sub.example.org/x", "example.org"),
        ("http://localhost/x", "localhost"),
    ],
)
def test_registrable_domain(spark, url, want):
    df = spark.createDataFrame([(url,)], "url string")
    assert df.select(registrable_domain(F.col("url")).alias("d")).collect()[0].d == want


def test_blocklist_filter_df_and_list_agree(spark):
    from ocr_spark.functions.url import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://spam.example.com/a"),
            (2, "https://www.GOOD.org/b"),
            (3, "http://sub.spam.example.com:8080/c?x=1"),
            (4, "https://keep.co.uk/d"),
        ],
        "doc_id long, url string",
    )
    bdf = spark.createDataFrame([("example.com",)], "domain string")
    via_df = {r.doc_id for r in blocklist_filter(docs, bdf).collect()}
    via_list = {r.doc_id for r in blocklist_filter(docs, ["example.com"]).collect()}
    assert via_df == via_list == {2, 4}
    # empty list is a no-op, schema untouched
    assert blocklist_filter(docs, []).columns == docs.columns
    assert blocklist_filter(docs, []).count() == 4


def test_url_normalize_idempotent(spark):
    """Normalizing an already-normalized URL is a fixpoint — the property
    that makes the canonical form usable as a dedup key."""
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], "i long, url string")
    once = df.select("i", url_normalize(F.col("url")).alias("url"))
    twice = once.select("i", url_normalize(F.col("url")).alias("url"))
    assert (
        once.orderBy("i").collect() == twice.orderBy("i").collect()
    )


def test_url_normalize_drops_valueless_tracking_params(spark):
    """'?fbclid' (bare, no '=') and '?fbclid=1' must canonicalize to the
    SAME key or identical pages escape URL dedup."""
    df = spark.createDataFrame(
        [(0, "https://x.com/p?fbclid"), (1, "https://x.com/p?fbclid=1"),
         (2, "https://x.com/p?utm_source&keep=2")],
        "i long, url string",
    )
    got = [r.n for r in df.select("i", url_normalize(F.col("url")).alias("n"))
           .orderBy("i").collect()]
    assert got[0] == got[1] == "https://x.com/p"
    assert got[2] == "https://x.com/p?keep=2"


def test_blocklist_filter_keeps_null_urls(spark):
    """NULL url -> NULL domain: kept by BOTH the list and DataFrame paths
    (it cannot match a blocklist entry)."""
    from ocr_spark.functions.url import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "https://spam.example.com/a"), (2, None)], "doc_id long, url string"
    )
    bdf = spark.createDataFrame([("example.com",)], "domain string")
    assert {r.doc_id for r in blocklist_filter(docs, ["example.com"]).collect()} == {2}
    assert {r.doc_id for r in blocklist_filter(docs, bdf).collect()} == {2}


# ---------------------------------------------------------------------------
# round 5: PSL-based registrable_domain + percent-encoding normalization
# ---------------------------------------------------------------------------


def ref_psl_registrable(host: str) -> str:
    """Independent pure-Python PSL algorithm (publicsuffix.org spec) over
    the same snapshot: collect all matching rules (wildcard * matches one
    label; exceptions win outright), pick the longest, suffix+1 labels."""
    from ocr_spark.functions.url import load_psl

    psl = load_psl()
    labels = host.lower().split(".")
    n = len(labels)

    def tail(k):
        return ".".join(labels[n - k:])

    suffix_len = None
    for k, excs in psl["exc"].items():
        if n >= k and tail(k) in excs:
            suffix_len = k - 1
            break
    if suffix_len is None:
        best = 1  # the implicit '*' default rule
        for k, rules in psl["exact"].items():
            if n >= k and tail(k) in rules:
                best = max(best, k)
        for b, bases in psl["wild"].items():
            if n >= b + 1 and tail(b) in bases:
                best = max(best, b + 1)
        suffix_len = best
    if n >= suffix_len + 1:
        return ".".join(labels[n - suffix_len - 1:])
    return ".".join(labels)


PSL_HOSTS = [
    "www.example.co.uk", "sub.host.co.kr", "mysite.github.io",
    "foo.ck", "www.ck", "sub.www.ck", "a.b.foo.ck", "ck",
    "city.kawasaki.jp", "sub.city.kawasaki.jp", "other.kawasaki.jp",
    "deep.other.kawasaki.jp", "kawasaki.jp", "example.co.jp",
    "bucket.s3.amazonaws.com", "s3.amazonaws.com", "amazonaws.com",
    "blog.blogspot.com", "x.com.co", "plain.example.com", "localhost",
    "a.b.c.d.gov.uk", "web.app", "my.web.app",
]


def test_psl_spark_vs_reference_vs_duckdb(spark):
    """Spark expression ≡ pure-Python PSL spec ≡ DuckDB twin on wildcard,
    exception, private-domain, multi-level and degenerate hosts."""
    import duckdb
    import pandas as pd

    from ocr_spark.functions.url import registrable_domain_sql

    urls = [f"http://{h}/x" for h in PSL_HOSTS]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(urls)), "url": urls}))
    duck = dict(
        con.execute(
            f"SELECT i, {registrable_domain_sql('url')} FROM t"
        ).fetchall()
    )
    for i, h in enumerate(PSL_HOSTS):
        want = ref_psl_registrable(h)
        assert got[i] == want, (h, got[i], want)
        assert duck[i] == want, (h, duck[i], want)


@pytest.mark.parametrize(
    "url,want",
    [
        # unreserved escapes decode (any hex case); reserved stay, uppercased
        ("http://t.com/%7Efoo%2fbar", "http://t.com/~foo%2Fbar"),
        ("http://t.com/a?x=%41%42c", "http://t.com/a?x=ABc"),
        ("http://t.com/%2d%2E%5f%7e", "http://t.com/-._~"),
        ("http://t.com/100%a1end", "http://t.com/100%A1end"),
        # BOTH hex digits lowercase letters with the second alphabetically
        # before the first — the class the interleaved rule order missed
        # (%db -> %Db): first-digit rules must all run before second-digit
        ("http://t.com/%db%ca", "http://t.com/%DB%CA"),
        ("http://t.com/%ea%b0%80", "http://t.com/%EA%B0%80"),
        ("http://t.com/%EA%B0%80", "http://t.com/%EA%B0%80"),
        # malformed escapes pass through untouched
        ("http://t.com/%zz%4", "http://t.com/%zz%4"),
        # equivalent spellings collapse to ONE canonical form
        ("http://t.com/%61bc", "http://t.com/abc"),
        ("http://t.com/abc", "http://t.com/abc"),
    ],
)
def test_pct_normalization(spark, url, want):
    import duckdb

    from ocr_spark.functions.url import url_normalize_sql

    df = spark.createDataFrame([(url,)], "url string")
    assert df.select(url_normalize(F.col("url")).alias("n")).collect()[0].n == want
    lit = "'" + url.replace("'", "''") + "'"
    got = duckdb.connect().execute(
        f"SELECT {url_normalize_sql(lit)}"
    ).fetchone()[0]
    assert got == want


class TestResolveUrl:
    """RFC 3986 §5.4 reference-resolution examples — normal (§5.4.1) and
    abnormal (§5.4.2) — plus agreement with urllib.parse.urljoin."""

    BASE = "http://a/b/c/d;p?q"
    VECTORS = {
        "g:h": "g:h", "g": "http://a/b/c/g", "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/", "/g": "http://a/g", "//g": "http://g",
        "?y": "http://a/b/c/d;p?y", "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q#s", "g#s": "http://a/b/c/g#s",
        "g?y#s": "http://a/b/c/g?y#s", ";x": "http://a/b/c/;x",
        "g;x": "http://a/b/c/g;x", "g;x?y#s": "http://a/b/c/g;x?y#s",
        "": "http://a/b/c/d;p?q", ".": "http://a/b/c/", "./": "http://a/b/c/",
        "..": "http://a/b/", "../": "http://a/b/", "../g": "http://a/b/g",
        "../..": "http://a/", "../../": "http://a/", "../../g": "http://a/g",
        "../../../g": "http://a/g", "../../../../g": "http://a/g",
        "/./g": "http://a/g", "/../g": "http://a/g", "g.": "http://a/b/c/g.",
        ".g": "http://a/b/c/.g", "g..": "http://a/b/c/g..",
        "..g": "http://a/b/c/..g", "./../g": "http://a/b/g",
        "./g/.": "http://a/b/c/g/", "g/./h": "http://a/b/c/g/h",
        "g/../h": "http://a/b/c/h", "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y", "g?y/./x": "http://a/b/c/g?y/./x",
        "g?y/../x": "http://a/b/c/g?y/../x", "g#s/./x": "http://a/b/c/g#s/./x",
        "g#s/../x": "http://a/b/c/g#s/../x",
    }

    def test_rfc_vector_table(self):
        from ocr_spark.functions.url import resolve_url

        for ref, want in self.VECTORS.items():
            assert resolve_url(self.BASE, ref) == want, ref

    def test_agrees_with_urljoin(self):
        from urllib.parse import urljoin

        from ocr_spark.functions.url import resolve_url

        for ref in self.VECTORS:
            assert resolve_url(self.BASE, ref) == urljoin(self.BASE, ref), ref

    def test_empty_fragment_preserved(self):
        from ocr_spark.functions.url import resolve_url

        assert resolve_url(self.BASE, "g#") == "http://a/b/c/g#"


class TestResolveUrlProperty:
    def test_empty_query_divergence_is_rfc_correct(self):
        """Known urllib divergence the fuzzer found: for ref '?' RFC 3986
        §5.3 recomposition KEEPS the empty query ('if defined(T.query),
        append "?" + query'); urljoin drops it. resolve_url follows the
        RFC."""
        from urllib.parse import urljoin

        from ocr_spark.functions.url import resolve_url

        base = "http://a/b/c/d;p?q"
        assert resolve_url(base, "?") == "http://a/b/c/d;p?"
        # the quirk, pinned: urllib treats the empty query as absent and
        # falls back to the BASE query (pre-RFC-3986 inheritance)
        assert urljoin(base, "?") == "http://a/b/c/d;p?q"
        # and urllib COLLAPSES internal empty path segments, which RFC
        # 3986 (and WHATWG URL) preserve — they are not dot segments
        assert resolve_url(base, "g//h") == "http://a/b/c/g//h"
        assert urljoin(base, "g//h") == "http://a/b/c/g/h"

    def test_fuzz_agrees_with_urljoin(self):
        """Property: resolve_url == urllib.parse.urljoin over generated
        refs (path/query/fragment/dot-segment soup on an http base).
        Empty query/fragment refs are excluded — urllib drops a lone
        '?' or '#' where RFC 3986 recomposition keeps it (pinned above)."""
        from urllib.parse import urljoin

        from hypothesis import given, settings, strategies as st

        # "" excluded: urllib collapses internal empty segments (pinned above)
        seg = st.sampled_from(["g", "h", ".", "..", "a;x=1", "g.", ".g"])
        ref_st = st.builds(
            lambda segs, lead, q, f: (
                ("/" if lead else "") + "/".join(segs)
                + ("?" + q if q is not None else "")
                + ("#" + f if f is not None else "")
            ),
            st.lists(seg, min_size=0, max_size=5),
            st.booleans(),
            st.one_of(st.none(), st.sampled_from(["y", "a=b&c=d"])),
            st.one_of(st.none(), st.sampled_from(["s"])),
        )

        @settings(max_examples=300, deadline=None)
        @given(ref=ref_st)
        def run(ref):
            from ocr_spark.functions.url import resolve_url

            base = "http://a/b/c/d;p?q"
            assert resolve_url(base, ref) == urljoin(base, ref), ref

        run()
