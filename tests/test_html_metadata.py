"""Crawl-hygiene HTML metadata: robots directives, canonical URL, lang,
title (html_extract.html_metadata / html_metadata_df).

Robots semantics per the public Robots Meta Tag documentation:
comma-separated, case-insensitive tokens on name="robots" (or bot-specific
names); `none` == noindex + nofollow. A corpus build drops noindex'd pages
and collapses canonical-URL duplicates before any content dedup."""

import pytest

from ocr_spark.operators.html_extract import html_metadata, html_metadata_df


class TestRobots:
    def test_noindex_case_and_spacing(self):
        m = html_metadata('<meta name="ROBOTS" content=" NOINDEX , nofollow ">')
        assert m["noindex"] and m["nofollow"]

    def test_none_implies_both(self):
        m = html_metadata("<meta name=robots content=none>")
        assert m["noindex"] and m["nofollow"]

    def test_index_follow_is_clean(self):
        m = html_metadata('<meta name="robots" content="index, follow">')
        assert not m["noindex"] and not m["nofollow"]

    def test_other_bots_directives_ignored(self):
        # a directive addressed to someone else's crawler is NOT a
        # page-wide opt-out for this pipeline
        assert not html_metadata('<meta name="googlebot" content="noindex">')[
            "noindex"
        ]
        assert not html_metadata('<meta name="bingbot" content="nofollow">')[
            "nofollow"
        ]

    def test_own_agent_name_counts(self):
        m = html_metadata(
            '<meta name="ocr-spark" content="noindex">'
            '<meta name="googlebot" content="nofollow">',
            agent="ocr-spark",
        )
        assert m["noindex"] and not m["nofollow"]

    def test_generic_robots_overridden_only_for_named_bot(self):
        # per-spec: generic says index, googlebot says noindex — this
        # (non-Google) pipeline follows the generic directive
        m = html_metadata(
            '<meta name="robots" content="index">'
            '<meta name="googlebot" content="noindex">'
        )
        assert not m["noindex"]

    def test_unrelated_meta_ignored(self):
        m = html_metadata('<meta name="description" content="noindex sale!">')
        assert not m["noindex"]

    def test_multiple_metas_union(self):
        m = html_metadata(
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">'
        )
        assert m["noindex"] and m["nofollow"]


class TestCanonicalLangTitle:
    DOC = (
        '<html lang="EN-us"><head><title> My  Page\nTitle </title>'
        '<link rel="canonical" href="https://ex.com/a">'
        '<link rel="canonical" href="https://ex.com/SECOND">'
        '<base href="https://ex.com/">'
        "</head><body><p>hi</p></body></html>"
    )

    def test_first_canonical_wins(self):
        assert html_metadata(self.DOC)["canonical_url"] == "https://ex.com/a"

    def test_rel_is_token_matched(self):
        # rel="stylesheet canonical" carries the canonical token;
        # rel="canonicalish" does not
        assert (
            html_metadata('<link rel="alternate canonical" href="/x">')[
                "canonical_url"
            ]
            == "/x"
        )
        assert (
            html_metadata('<link rel="canonicalish" href="/x">')["canonical_url"]
            is None
        )

    def test_lang_lowercased(self):
        assert html_metadata(self.DOC)["lang"] == "en-us"

    def test_title_whitespace_canonicalized(self):
        assert html_metadata(self.DOC)["title"] == "My Page Title"

    def test_base_href(self):
        assert html_metadata(self.DOC)["base_href"] == "https://ex.com/"

    def test_missing_everything(self):
        m = html_metadata("<p>no meta at all")
        assert m == {
            "noindex": False,
            "nofollow": False,
            "canonical_url": None,
            "base_href": None,
            "lang": None,
            "title": None,
        }

    def test_malformed_never_raises(self):
        for doc in ["", None, "<<<>><meta", "<title>open forever", "\x00\xff"]:
            html_metadata(doc)  # must not raise


class TestSparkSurface:
    def test_metadata_df(self, spark):
        docs = spark.createDataFrame(
            [
                ("d1", '<html lang="de"><head><meta name="robots" '
                       'content="noindex"><title>Eins</title></head></html>'),
                ("d2", '<link rel="canonical" href="https://c.example/x">'
                       "<p>body</p>"),
                ("d3", None),
            ],
            "doc_id string, text string",
        )
        out = {r.doc_id: r for r in html_metadata_df(docs).collect()}
        assert out["d1"].noindex and out["d1"].lang == "de"
        assert out["d1"].title == "Eins"
        assert out["d2"].canonical_url == "https://c.example/x"
        assert not out["d2"].noindex
        assert not out["d3"].noindex and out["d3"].title is None

    def test_no_shuffle_in_plan(self, spark):
        docs = spark.createDataFrame(
            [("d1", "<p>x</p>")], "doc_id string, text string"
        )
        plan = html_metadata_df(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestCanonicalResolution:
    def test_base_href_chain(self):
        d = '<base href="/sub/"><link rel="canonical" href="page?x=1">'
        m = html_metadata(d, "https://ex.com/a/b")
        assert m["canonical_url"] == "https://ex.com/sub/page?x=1"

    def test_doc_url_alone(self):
        m = html_metadata('<link rel="canonical" href="../c">',
                          "https://ex.com/a/b")
        assert m["canonical_url"] == "https://ex.com/c"

    def test_no_base_keeps_relative(self):
        m = html_metadata('<link rel="canonical" href="../c">')
        assert m["canonical_url"] == "../c"

    def test_absolute_canonical_untouched(self):
        m = html_metadata(
            '<link rel="canonical" href="https://other.example/z">',
            "https://ex.com/a",
        )
        assert m["canonical_url"] == "https://other.example/z"
