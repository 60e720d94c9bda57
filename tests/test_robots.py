"""robots.txt (RFC 9309) kernel + Spark surface goldens.

Longest-match cases follow the publicly documented interpretation table
(RFC 9309 §2.2.2 + the search-engine documentation the RFC defers to)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.robots import (
    RobotsMatcher,
    parse_robots,
    robots_allowed,
    robots_annotate,
    robots_filter,
)


def _m(txt: str, agent: str = "bot") -> RobotsMatcher:
    return RobotsMatcher(parse_robots(txt), agent)


class TestParse:
    def test_groups_and_shared_heads(self):
        rf = parse_robots(
            "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
            "User-agent: c\nAllow: /y\n"
        )
        assert len(rf.groups) == 2
        assert rf.groups[0].agents == ["a", "b"]
        assert rf.groups[0].rules == [(False, "/x")]
        assert rf.groups[1].agents == ["c"]
        assert rf.groups[1].rules == [(True, "/y")]

    def test_rules_before_any_group_ignored(self):
        rf = parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")
        assert len(rf.groups) == 1
        assert rf.groups[0].rules == [(False, "/y")]

    def test_comments_case_whitespace(self):
        rf = parse_robots(
            "  UsEr-AgEnT :  Bot  # the crawler\nDisAllow: /x # no\n"
        )
        assert rf.groups[0].agents == ["bot"]
        assert rf.groups[0].rules == [(False, "/x")]

    def test_empty_disallow_dropped(self):
        rf = parse_robots("User-agent: *\nDisallow:\n")
        assert rf.groups[0].rules == []

    def test_sitemap_and_crawl_delay(self):
        rf = parse_robots(
            "Sitemap: https://e.com/s1.xml\nUser-agent: *\n"
            "Crawl-delay: 2.5\nDisallow: /x\nSitemap: https://e.com/s2.xml\n"
        )
        assert rf.sitemaps == ["https://e.com/s1.xml", "https://e.com/s2.xml"]
        assert rf.groups[0].crawl_delay == 2.5

    def test_new_group_after_rules(self):
        rf = parse_robots(
            "User-agent: a\nDisallow: /x\nUser-agent: a\nAllow: /y\n"
        )
        assert len(rf.groups) == 2

    def test_garbage_never_raises(self):
        for junk in [None, "", "\x00\xff binary", ":::", "no colons here"]:
            assert parse_robots(junk).groups == []


class TestLongestMatch:
    # (robots body for 'user-agent: *', path, expected_allowed)
    CASES = [
        ("Allow: /p\nDisallow: /", "/page", True),
        ("Allow: /folder\nDisallow: /folder", "/folder/page", True),
        ("Allow: /page\nDisallow: /*.htm", "/page.htm", False),
        ("Allow: /$\nDisallow: /", "/", True),
        ("Allow: /$\nDisallow: /", "/page.htm", False),
        ("Disallow: /*.php$", "/index.php", False),
        ("Disallow: /*.php$", "/index.php5", True),
        ("Disallow: /*.php$", "/index.php?q=1", True),
        ("Disallow: /fish*.php", "/fishheads/catfish.php?parameters", False),
        ("Disallow: /", "/anything", False),
        ("", "/anything", True),
    ]

    @pytest.mark.parametrize("body,path,expect", CASES)
    def test_documented_cases(self, body, path, expect):
        txt = "User-agent: *\n" + body
        assert robots_allowed(txt, "bot", path) is expect

    def test_no_rules_allows(self):
        assert robots_allowed(None, "bot", "/a") is True
        assert robots_allowed("User-agent: *\n", "bot", "/a") is True

    def test_empty_path_treated_as_root(self):
        assert robots_allowed("User-agent: *\nDisallow: /", "bot", "") is False


class TestGroupSelection:
    TXT = (
        "User-agent: googlebot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )

    def test_specific_group_hides_star(self):
        m = _m(self.TXT, "GoogleBot")
        assert m.allowed("/a") is False
        assert m.allowed("/b") is True  # '*' group NOT merged per RFC

    def test_star_fallback(self):
        m = _m(self.TXT, "otherbot")
        assert m.allowed("/a") is True
        assert m.allowed("/b") is False

    def test_multiple_specific_groups_merge(self):
        txt = (
            "User-agent: bot\nDisallow: /a\n\n"
            "User-agent: bot\nDisallow: /b\n"
        )
        m = _m(txt)
        assert m.allowed("/a") is False and m.allowed("/b") is False

    def test_crawl_delay_selected_per_agent(self):
        txt = (
            "User-agent: bot\nCrawl-delay: 1\nDisallow: /a\n\n"
            "User-agent: *\nCrawl-delay: 9\n"
        )
        assert _m(txt, "bot").crawl_delay == 1.0
        assert _m(txt, "zzz").crawl_delay == 9.0


class TestSparkSurface:
    ROBOTS = [
        ("strict.example", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
        ("closed.example", "User-agent: *\nDisallow: /\n"),
        ("agent.example", "User-agent: ocr-spark\nDisallow: /x\nUser-agent: *\nDisallow: /\n"),
    ]
    DOCS = [
        (1, "http://strict.example/public/a"),
        (2, "http://strict.example/private/a"),
        (3, "http://strict.example/private/ok/a"),
        (4, "http://closed.example/anything"),
        (5, "http://open.example/no/robots/row"),
        (6, "http://agent.example/x/1"),
        (7, "http://agent.example/y/1"),
        (8, "not a url"),
    ]

    def _frames(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "url"])
        robots = spark.createDataFrame(self.ROBOTS, ["host", "robots_txt"])
        return docs, robots

    def test_annotate_and_filter(self, spark):
        docs, robots = self._frames(spark)
        ann = robots_annotate(docs, robots, agent="ocr-spark")
        got = {r["doc_id"]: r["robots_allowed"] for r in ann.collect()}
        assert got == {
            1: True,   # not under /private
            2: False,  # /private
            3: True,   # longest-match allow /private/ok
            4: False,  # disallow all
            5: True,   # no robots row -> allowed
            6: False,  # specific-agent group blocks /x
            7: True,   # '*' group (disallow /) hidden by specific group
            8: True,   # unparseable URL -> allowed
        }
        kept = sorted(
            r["doc_id"] for r in robots_filter(docs, robots, agent="ocr-spark").collect()
        )
        assert kept == [1, 3, 5, 7, 8]

    def test_plan_broadcasts_robots(self, spark):
        docs, robots = self._frames(spark)
        plan = robots_annotate(docs, robots)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_query_string_participates(self, spark):
        docs = spark.createDataFrame(
            [(1, "http://q.example/p?download=1"), (2, "http://q.example/p?view=1")],
            ["doc_id", "url"],
        )
        robots = spark.createDataFrame(
            [("q.example", "User-agent: *\nDisallow: /*download\n")],
            ["host", "robots_txt"],
        )
        got = {r["doc_id"]: r["robots_allowed"] for r in robots_annotate(docs, robots).collect()}
        assert got == {1: False, 2: True}


class TestSitemap:
    XML = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://e.com/a</loc><lastmod>2024-01-02</lastmod></url>\n"
        "<url><loc> https://e.com/b?x=1&amp;y=2 </loc></url>\n"
        "</urlset>"
    )
    INDEX = (
        "<sitemapindex>"
        "<sitemap><loc>https://e.com/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://e.com/s2.xml</loc>"
        "<lastmod>2023-12-31</lastmod></sitemap>"
        "</sitemapindex>"
    )

    def test_urlset(self):
        from ocr_spark.operators.robots import parse_sitemap

        got = parse_sitemap(self.XML)
        assert got == [
            {"loc": "https://e.com/a", "lastmod": "2024-01-02", "kind": "url"},
            {"loc": "https://e.com/b?x=1&y=2", "lastmod": None, "kind": "url"},
        ]

    def test_index_and_gzip_and_text(self):
        import gzip

        from ocr_spark.operators.robots import parse_sitemap

        idx = parse_sitemap(self.INDEX)
        assert [e["kind"] for e in idx] == ["sitemap", "sitemap"]
        assert idx[1]["lastmod"] == "2023-12-31"
        gz = parse_sitemap(gzip.compress(self.XML.encode()))
        assert len(gz) == 2 and gz[0]["loc"] == "https://e.com/a"
        txt = parse_sitemap("https://e.com/1\n# note\nhttps://e.com/2\n")
        assert [e["loc"] for e in txt] == ["https://e.com/1", "https://e.com/2"]

    def test_garbage_never_raises(self):
        from ocr_spark.operators.robots import parse_sitemap

        for junk in [None, b"", "<urlset><url></url>", b"\x1f\x8bnotgzip", "hi"]:
            assert isinstance(parse_sitemap(junk), list)

    def test_spark_explode(self, spark):
        from ocr_spark.operators.robots import sitemap_extract

        df = spark.createDataFrame(
            [
                ("https://e.com/sitemap.xml", self.XML.encode()),
                ("https://e.com/idx.xml", self.INDEX.encode()),
                ("https://e.com/empty.xml", None),
            ],
            "url string, content binary",
        )
        rows = sitemap_extract(df).collect()
        assert len(rows) == 4
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source_url"], []).append(r["kind"])
        assert sorted(by_src["https://e.com/sitemap.xml"]) == ["url", "url"]
        assert sorted(by_src["https://e.com/idx.xml"]) == ["sitemap", "sitemap"]
        plan = sitemap_extract(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # one mapInPandas stage, no shuffle
