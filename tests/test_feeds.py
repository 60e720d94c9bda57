"""RSS 2.0 / Atom feed extraction goldens + the Spark explode surface."""

from __future__ import annotations

import gzip

from ocr_spark.operators.feeds import feed_extract, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/">
<channel><title>Blog</title>
<item>
  <title>First &amp; foremost</title>
  <link>https://e.com/a</link>
  <guid>tag:e.com,1</guid>
  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
  <content:encoded><![CDATA[<p>Full <b>body</b></p>]]></content:encoded>
  <description>short</description>
</item>
<item>
  <title>No guid</title>
  <link>https://e.com/b</link>
  <description>Summary only &lt;kept&gt;</description>
</item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Feed</title>
<entry>
  <id>urn:uuid:1</id>
  <title>Atom one</title>
  <link rel="self" href="https://e.com/self"/>
  <link rel="alternate" href="https://e.com/one"/>
  <published>2024-02-02T00:00:00Z</published>
  <content type="html">&lt;p&gt;hi&lt;/p&gt;</content>
</entry>
<entry>
  <id>urn:uuid:2</id>
  <title>Atom two</title>
  <link href="https://e.com/two"/>
  <updated>2024-03-03T00:00:00Z</updated>
  <summary>sum</summary>
</entry>
</feed>"""


class TestParseFeed:
    def test_rss(self):
        got = parse_feed(RSS)
        assert len(got) == 2
        a, b = got
        assert a["kind"] == "rss"
        assert a["title"] == "First & foremost"
        assert a["entry_id"] == "tag:e.com,1"
        assert a["link"] == "https://e.com/a"
        assert a["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
        # content:encoded (full body) preferred over description
        assert a["text"] == "<p>Full <b>body</b></p>"
        assert b["entry_id"] == "https://e.com/b"  # guid fallback -> link
        assert b["text"] == "Summary only <kept>"

    def test_atom(self):
        got = parse_feed(ATOM)
        assert len(got) == 2
        a, b = got
        assert a["kind"] == "atom"
        assert a["link"] == "https://e.com/one"  # rel=alternate wins
        assert a["published"] == "2024-02-02T00:00:00Z"
        assert a["text"] == "<p>hi</p>"
        assert b["link"] == "https://e.com/two"  # bare href accepted
        assert b["published"] == "2024-03-03T00:00:00Z"  # updated fallback
        assert b["text"] == "sum"

    def test_gzip_and_garbage(self):
        assert len(parse_feed(gzip.compress(RSS.encode()))) == 2
        for junk in [None, b"", "not xml", "<rss><item></item></rss>",
                     b"\x1f\x8bnot really gzip"]:
            assert isinstance(parse_feed(junk), list)

    def test_spark_explode(self, spark):
        df = spark.createDataFrame(
            [
                ("https://e.com/rss.xml", RSS.encode()),
                ("https://e.com/atom.xml", ATOM.encode()),
                ("https://e.com/empty.xml", None),
            ],
            "url string, content binary",
        )
        out = feed_extract(df)
        rows = out.collect()
        assert len(rows) == 4
        kinds = sorted(r["kind"] for r in rows)
        assert kinds == ["atom", "atom", "rss", "rss"]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestEntityDecoding:
    """The shared crawl-XML entity decoder (robots._xml_unescape, imported
    here): named entities, numeric charrefs, no double-decode."""

    def test_numeric_charrefs(self):
        from ocr_spark.operators.robots import _xml_unescape

        assert _xml_unescape("a&#39;b &#x27;c") == "a'b 'c"
        assert _xml_unescape("caf&#233; &#x10348;") == "café \U00010348"

    def test_no_double_decode(self):
        from ocr_spark.operators.robots import _xml_unescape

        # '&amp;lt;' is the AUTHOR writing a literal '&lt;'
        assert _xml_unescape("&amp;lt; &amp;#39;") == "&lt; &#39;"

    def test_invalid_refs_kept_raw(self):
        from ocr_spark.operators.robots import _xml_unescape

        assert _xml_unescape("&#0; &#xD800; &#1114112; &bogus;") == (
            "&#0; &#xD800; &#1114112; &bogus;"
        )
