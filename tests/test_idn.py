"""IDN host canonicalization: RFC 3492 punycode codec + IDNA label walk +
the sparse-UDF Spark surface (ocr_spark/functions/idn.py).

Golden sources: the RFC 3492 §7.1 sample vectors (hand-pinned literals)
plus the stdlib `punycode` / `idna` codecs as INDEPENDENT oracles for
roundtrip/property sweeps — our codec is a from-scratch spec
implementation, so agreement is evidence, not tautology."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.idn import (
    idn_host_ascii,
    idn_host_unicode,
    idn_normalize,
    normalize_urls_idn,
    punycode_decode,
    punycode_encode,
    url_normalize_idn,
)
from ocr_spark.functions.url import url_normalize

# RFC 3492 §7.1 (A), (B), (D), (L): Arabic, Chinese-simplified, Czech
# (mixed-case basic code points preserved), Japanese-with-basic-infix
RFC_VECTORS = [
    (
        "".join(
            map(
                chr,
                [0x644, 0x64A, 0x647, 0x645, 0x627, 0x628, 0x62A, 0x643,
                 0x644, 0x645, 0x648, 0x634, 0x639, 0x631, 0x628, 0x64A,
                 0x61F],
            )
        ),
        "egbpdaj6bu4bxfgehfvwxn",
    ),
    (
        "".join(
            map(
                chr,
                [0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4,
                 0x4E2D, 0x6587],
            )
        ),
        "ihqwcrb4cv8a8dqg056pqjye",
    ),
    ("Pročprostěnemluvíčesky", "Proprostnemluvesky-uyb24dma41a"),
    ("3年B組金八先生", "3B-ww4c5e180e575a65lsy2b"),
]


class TestPunycodeCodec:
    @pytest.mark.parametrize("text,expected", RFC_VECTORS)
    def test_rfc3492_encode(self, text, expected):
        assert punycode_encode(text) == expected

    @pytest.mark.parametrize("text,expected", RFC_VECTORS)
    def test_rfc3492_decode(self, text, expected):
        assert punycode_decode(expected) == text

    def test_all_basic_appends_delimiter_rule(self):
        # all-ASCII input: RFC output is the input plus trailing '-'
        assert punycode_encode("abc") == "abc-"
        assert punycode_decode("abc-") == "abc"

    def test_empty(self):
        assert punycode_encode("") == ""
        assert punycode_decode("") == ""

    def test_leading_delimiter_only(self):
        # '-' at position 0 is NOT a basic/encoded delimiter per the spec
        s = punycode_encode("ü")  # 'tda'
        assert s == "tda"
        assert punycode_decode(s) == "ü"

    def test_matches_stdlib_on_random_labels(self):
        rng = random.Random(42)
        pools = [
            (0x61, 0x7A),      # a-z
            (0x30, 0x39),      # 0-9
            (0xE0, 0x17F),     # latin-1/ext
            (0x390, 0x3C9),    # greek
            (0x430, 0x44F),    # cyrillic
            (0x4E00, 0x4E80),  # cjk
        ]
        for _ in range(300):
            n = rng.randint(1, 24)
            label = "".join(
                chr(rng.randint(*pools[rng.randrange(len(pools))]))
                for _ in range(n)
            )
            ours = punycode_encode(label)
            stdlib = label.encode("punycode").decode("ascii")
            assert ours == stdlib, label
            assert punycode_decode(ours) == label

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            punycode_decode("!!!")  # invalid digit
        with pytest.raises(ValueError):
            # digit 35 >= threshold t=1 demands a continuation digit that
            # never arrives -> truncated variable-length integer
            punycode_decode("9")


class TestHostWalk:
    @pytest.mark.parametrize(
        "host,expected",
        [
            ("Bücher.example", "xn--bcher-kva.example"),
            ("日本語.jp", "xn--wgv71a119e.jp"),
            ("WWW.EXAMPLE.COM", "www.example.com"),
            # already-encoded label: lowercase passthrough (validated)
            ("XN--BCHER-KVA.example", "xn--bcher-kva.example"),
            # Kelvin sign casefolds into ASCII 'k'
            ("Kelvin.org", "kelvin.org"),
            ("", ""),
        ],
    )
    def test_ascii_form(self, host, expected):
        assert idn_host_ascii(host) == expected

    def test_matches_stdlib_idna(self):
        for host in [
            "bücher.example",
            "日本語.jp",
            "café.fr",
            "почта.рф",
        ]:
            ours = idn_host_ascii(host)
            theirs = host.encode("idna").decode("ascii")
            assert ours == theirs, host

    def test_unicode_form_roundtrip(self):
        a = idn_host_ascii("Bücher.example")
        assert idn_host_unicode(a) == "bücher.example"
        # undecodable xn-- label passes through lowercased
        assert idn_host_unicode("xn--!!!.example") == "xn--!!!.example"

    def test_garbage_tolerant(self):
        assert idn_host_ascii(None) is None
        assert idn_host_unicode(None) is None
        # label that maps to empty / weird stays lowercased, never raises
        assert idn_host_ascii("a..b") == "a..b"
        assert isinstance(idn_host_ascii("ex‍ample.com"), str)


class TestSparkSurface:
    def test_sparse_udf_and_equivalence(self, spark):
        rows = [
            ("http://BÜCHER.example/a?utm_source=x&q=1",),
            ("http://xn--bcher-kva.example/a?q=1",),
            ("HTTPS://WWW.Example.COM:443/p",),
            (None,),
            ("not a url",),
        ]
        df = spark.createDataFrame(rows, ["url"]).withColumn(
            "canon", url_normalize_idn(F.col("url"))
        )
        got = {r["url"]: r["canon"] for r in df.collect()}
        # unicode spelling and punycode spelling collapse to ONE canonical
        assert (
            got["http://BÜCHER.example/a?utm_source=x&q=1"]
            == got["http://xn--bcher-kva.example/a?q=1"]
            == "http://xn--bcher-kva.example/a?q=1"
        )
        assert got["HTTPS://WWW.Example.COM:443/p"] == "https://www.example.com/p"
        assert got[None] is None

    def test_ascii_rows_identical_to_url_normalize(self, spark):
        rows = [(f"http://host{i}.example/p{i}?utm_source=z&k={i}",) for i in range(50)]
        df = spark.createDataFrame(rows, ["url"]).select(
            url_normalize(F.col("url")).alias("base"),
            url_normalize_idn(F.col("url")).alias("idn"),
        )
        bad = df.filter(F.col("base") != F.col("idn")).count()
        assert bad == 0

    def test_idn_normalize_post_normalize_composes(self, spark):
        df = spark.createDataFrame(
            [("http://日本語.jp/x",)], ["url"]
        ).select(idn_normalize(url_normalize(F.col("url"))).alias("c"))
        assert df.first()["c"] == "http://xn--wgv71a119e.jp/x"

    def test_df_surface_matches_column_form(self, spark):
        # normalize_urls_idn (staged: url_normalize computed ONCE) must be
        # value-identical to the convenience Column composition
        rows = [
            ("http://BÜCHER.example/a?utm_source=x&q=1", 1),
            ("http://xn--bcher-kva.example/a?q=1", 2),
            ("HTTPS://WWW.Example.COM:443/p", 3),
            ("http://ascii.example/p?q=%C3%BC", 4),  # pure-ASCII spelling:
            (None, 5),  # skips the UDF gate entirely in both forms
            ("not a url", 6),
        ]
        df = spark.createDataFrame(rows, ["url", "doc_id"])
        staged = {
            r["doc_id"]: r["url"]
            for r in normalize_urls_idn(df, "url").collect()
        }
        column = {
            r["doc_id"]: r["canon"]
            for r in df.select(
                "doc_id", url_normalize_idn(F.col("url")).alias("canon")
            ).collect()
        }
        assert staged == column
        assert staged[1] == staged[2] == "http://xn--bcher-kva.example/a?q=1"

    def test_df_surface_out_col_and_passthrough(self, spark):
        df = spark.createDataFrame(
            [("http://日本語.jp/x", "keep-me")], ["url", "other"]
        )
        out = normalize_urls_idn(df, "url", out_col="canon").first()
        assert out["url"] == "http://日本語.jp/x"  # source untouched
        assert out["canon"] == "http://xn--wgv71a119e.jp/x"
        assert out["other"] == "keep-me"
        assert "__url_norm" not in normalize_urls_idn(df, "url").columns
