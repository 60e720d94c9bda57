"""Outlink extraction, domain link graph, integer PageRank
(ocr_spark/operators/links.py)."""

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.links import (
    domain_centrality,
    domain_centrality_ref,
    domain_link_graph,
    domain_link_graph_sql,
    html_links,
    html_links_df,
    MICRO,
)


class TestHtmlLinks:
    def test_basic_and_anchor_flatten(self):
        html = (
            '<p>See <a href="https://a.example/x">the <b>full</b>\n  report</a>'
            ' and <a href="/rel">relative</a>.</p>'
        )
        out = html_links(html, "https://site.example/dir/page.html")
        assert out == [
            {
                "href": "https://a.example/x",
                "anchor": "the full report",
                "nofollow": False,
            },
            {
                "href": "https://site.example/rel",
                "anchor": "relative",
                "nofollow": False,
            },
        ]

    def test_base_href_chain(self):
        # <base> wins over doc_url; relative base resolves against doc_url
        html = '<base href="sub/"><a href="p.html">x</a>'
        out = html_links(html, "https://s.example/a/b.html")
        assert out[0]["href"] == "https://s.example/a/sub/p.html"

    def test_skip_non_navigational(self):
        html = (
            '<a href="javascript:void(0)">j</a><a href="mailto:a@b">m</a>'
            '<a href="#frag">f</a><a href="tel:+1">t</a>'
            '<a href="data:text/plain,x">d</a><a href="https://ok.example/">ok</a>'
        )
        out = html_links(html, "https://s.example/")
        assert [o["href"] for o in out] == ["https://ok.example/"]

    def test_fragment_stripped_and_nofollow(self):
        html = '<a rel="ugc nofollow" href="https://x.example/p#sec">x</a>'
        out = html_links(html, None)
        assert out == [
            {"href": "https://x.example/p", "anchor": "x", "nofollow": True}
        ]

    def test_unclosed_anchor_and_script_inside(self):
        html = (
            '<a href="https://a.example/1">one<script>var x="no";</script>'
            '<a href="https://a.example/2">two</a>'
        )
        out = html_links(html, None)
        assert [(o["href"], o["anchor"]) for o in out] == [
            ("https://a.example/1", "one"),
            ("https://a.example/2", "two"),
        ]

    def test_no_base_relative_passthrough_and_malformed(self):
        assert html_links('<a href="x/y.html">r</a>', None)[0]["href"] == "x/y.html"
        assert html_links(None, None) == []
        assert html_links("<<<<a href=", "https://s.example/") == []


class TestLinksDf:
    def test_explode_and_plan(self, spark):
        rows = [
            (
                "d1",
                "https://s.example/a/",
                '<a href="p.html">one</a><a rel="nofollow" href="https://t.example/">two</a>',
            ),
            ("d2", "https://u.example/", "<p>no links</p>"),
            ("d3", None, '<a href="https://v.example/z">abs</a>'),
        ]
        docs = spark.createDataFrame(rows, "doc_id string, url string, html string")
        out = html_links_df(docs)
        got = {(r.doc_id, r.href, r.anchor, r.nofollow) for r in out.collect()}
        assert got == {
            ("d1", "https://s.example/a/p.html", "one", False),
            ("d1", "https://t.example/", "two", True),
            ("d3", "https://v.example/z", "abs", False),
        }
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # one mapInPandas stage


class TestDomainGraph:
    def _links_rows(self):
        return [
            ("d1", "https://a.example/p1", "https://sub.b.example/x", "t", False),
            ("d1", "https://a.example/p1", "https://b.example/y", "t", False),
            ("d2", "https://a.example/p2", "https://c.github.io/z", "t", False),
            ("d2", "https://a.example/p2", "https://a.example/self", "t", False),
            ("d3", "https://news.co.kr/p", "https://a.example/", "t", False),
            ("d3", "https://news.co.kr/p", "https://nf.example/", "t", True),
            ("d4", None, "https://a.example/", "t", False),  # no src host
            ("d5", "https://a.example/p3", "rel/only.html", "t", False),
        ]

    def test_graph_and_twin(self, spark, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = self._links_rows()
        p = str(tmp_path / "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "src_url": [r[1] for r in rows],
                    "href": [r[2] for r in rows],
                    "anchor": [r[3] for r in rows],
                    "nofollow": [r[4] for r in rows],
                }
            ),
            p,
        )
        links = spark.read.parquet(p)
        got = sorted(
            (r.src_domain, r.dst_domain, r.n_links)
            for r in domain_link_graph(links).collect()
        )
        # PSL grouping: sub.b.example + b.example collapse; c.github.io is
        # its own registrable domain; news.co.kr keeps its 3-label etld+1;
        # self-link and nofollow and hostless rows dropped
        assert got == [
            ("a.example", "b.example", 2),
            ("a.example", "c.github.io", 1),
            ("news.co.kr", "a.example", 1),
        ]
        con = duckdb.connect()
        orc = sorted(
            tuple(r)
            for r in con.execute(
                domain_link_graph_sql(f"SELECT * FROM read_parquet('{p}')")
            ).fetchall()
        )
        assert got == orc


class TestCentrality:
    def _random_edges(self, seed=4, n_dom=40, n_edges=160):
        rng = random.Random(seed)
        doms = [f"d{i}.example" for i in range(n_dom)]
        seen = {}
        for _ in range(n_edges):
            s, d = rng.sample(doms, 2)
            seen[(s, d)] = seen.get((s, d), 0) + rng.randrange(1, 5)
        return [(s, d, w) for (s, d), w in sorted(seen.items())]

    def test_matches_pure_python_exactly(self, spark):
        edges = self._random_edges()
        df = spark.createDataFrame(
            edges, "src_domain string, dst_domain string, n_links long"
        )
        got = {
            r.domain: r.rank_micro for r in domain_centrality(df, iters=6).collect()
        }
        ref = domain_centrality_ref(edges, iters=6)
        assert got == ref

    def test_unweighted_matches(self, spark):
        edges = self._random_edges(seed=9, n_dom=15, n_edges=60)
        df = spark.createDataFrame(
            edges, "src_domain string, dst_domain string, n_links long"
        )
        got = {
            r.domain: r.rank_micro
            for r in domain_centrality(df, iters=4, weighted=False).collect()
        }
        assert got == domain_centrality_ref(edges, iters=4, weighted=False)

    def test_star_graph_hub_wins(self, spark):
        # every leaf links to the hub; the hub links back to ALL leaves, so
        # its mass splits 10 ways while it receives 10 whole contributions
        edges = [(f"leaf{i}.example", "hub.example", 1) for i in range(10)]
        edges += [("hub.example", f"leaf{i}.example", 1) for i in range(10)]
        df = spark.createDataFrame(
            edges, "src_domain string, dst_domain string, n_links long"
        )
        ranks = {
            r.domain: r.rank_micro for r in domain_centrality(df, iters=8).collect()
        }
        assert ranks == domain_centrality_ref(edges, iters=8)
        leaf = ranks["leaf0.example"]
        assert all(ranks[f"leaf{i}.example"] == leaf for i in range(10))
        assert ranks["hub.example"] > 4 * MICRO > leaf  # hub concentrates mass

    def test_deterministic_across_runs(self, spark):
        edges = self._random_edges(seed=11)
        df = spark.createDataFrame(
            edges, "src_domain string, dst_domain string, n_links long"
        ).repartition(7)
        a = {r.domain: r.rank_micro for r in domain_centrality(df, iters=5).collect()}
        b = {
            r.domain: r.rank_micro
            for r in domain_centrality(df.repartition(3), iters=5).collect()
        }
        assert a == b
