"""Crawl-frontier composition (ocr_spark/operators/frontier.py): DuckDB
twin parity across parameter combos, bloom-path bit-identity, robots gate,
plan audit."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.frontier import crawl_frontier, crawl_frontier_sql


def _links_rows():
    # hrefs deliberately include: duplicate spellings that canonicalize
    # together (%7E vs ~, tracking params, default port), nofollow, null
    # nofollow, mailto leftovers, relative leftovers, a blocked domain,
    # a seen url, and a robots-disallowed path
    return [
        ("d1", "https://a.example/", "https://t.example/%7Euser?utm_source=x", "tilde", False),
        ("d2", "https://a.example/", "https://t.example:443/~user", "tilde2", None),
        ("d3", "https://a.example/", "https://t.example/other", "o", False),
        ("d4", "https://a.example/", "https://t.example/other", "a", False),
        ("d5", "https://a.example/", "https://blocked.example/x", "b", False),
        ("d6", "https://a.example/", "https://seen.example/page", "s", False),
        ("d7", "https://a.example/", "https://nf.example/", "n", True),
        ("d8", "https://a.example/", "mailto:a@b.example", "m", False),
        ("d9", "https://a.example/", "rel/only.html", "r", False),
        ("d10", "https://a.example/", "https://robots.example/private/p", "p", False),
        ("d11", "https://a.example/", "https://robots.example/public/q", "q", False),
        ("d12", "https://a.example/", "https://many.example/p1", "x", False),
        ("d13", "https://a.example/", "https://many.example/p2", "x", False),
        ("d14", "https://a.example/", "https://many.example/p2", "x", False),
        ("d15", "https://a.example/", "https://many.example/p3", "x", False),
    ]


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("frontier")
    rows = _links_rows()
    links_p = str(d / "links.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "src_url": [r[1] for r in rows],
                "href": [r[2] for r in rows],
                "anchor": [r[3] for r in rows],
                "nofollow": pa.array([r[4] for r in rows], type=pa.bool_()),
            }
        ),
        links_p,
    )
    seen_p = str(d / "seen.parquet")
    pq.write_table(pa.table({"url": ["https://seen.example/page"]}), seen_p)
    blocked_p = str(d / "blocked.parquet")
    pq.write_table(pa.table({"domain": ["blocked.example"]}), blocked_p)
    return {"links": links_p, "seen": seen_p, "blocked": blocked_p}


def _spark_frontier(spark, fixture, **kw):
    links = spark.read.parquet(fixture["links"])
    return sorted(
        (r.url, r.domain, r.n_refs, r.sample_anchor)
        for r in crawl_frontier(links, **kw).collect()
    )


def _duck_frontier(fixture, seen=False, blocked=False, cap=None):
    import duckdb

    con = duckdb.connect()
    sql = crawl_frontier_sql(
        f"SELECT * FROM read_parquet('{fixture['links']}')",
        seen_src=f"SELECT * FROM read_parquet('{fixture['seen']}')" if seen else None,
        blocked_src=(
            f"SELECT * FROM read_parquet('{fixture['blocked']}')" if blocked else None
        ),
        per_domain_cap=cap,
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


class TestTwinParity:
    def test_bare(self, spark, fixture):
        got = _spark_frontier(spark, fixture)
        assert got == _duck_frontier(fixture)
        urls = [g[0] for g in got]
        # the two tilde spellings + tracking param collapsed to ONE url
        assert urls.count("https://t.example/~user") == 1
        tilde = next(g for g in got if g[0] == "https://t.example/~user")
        assert tilde[2] == 2  # n_refs counted both spellings
        other = next(g for g in got if g[0] == "https://t.example/other")
        assert other[3] == "a"  # min anchor, deterministic
        assert not any(u.startswith("mailto") for u in urls)
        assert not any(u == "rel/only.html" for u in urls)
        assert not any("nf.example" in u for u in urls)  # nofollow dropped

    def test_seen_and_blocked(self, spark, fixture):
        seen = spark.read.parquet(fixture["seen"])
        blocked = spark.read.parquet(fixture["blocked"])
        got = _spark_frontier(
            spark, fixture, seen_urls=seen, blocked_domains=blocked
        )
        assert got == _duck_frontier(fixture, seen=True, blocked=True)
        urls = [g[0] for g in got]
        assert "https://seen.example/page" not in urls
        assert not any("blocked.example" in u for u in urls)

    def test_per_domain_cap(self, spark, fixture):
        got = _spark_frontier(spark, fixture, per_domain_cap=2)
        assert got == _duck_frontier(fixture, cap=2)
        many = [g for g in got if g[1] == "many.example"]
        assert len(many) == 2
        # highest n_refs first, then url: p2 (2 refs) and p1 (tie by url)
        assert {g[0] for g in many} == {
            "https://many.example/p2",
            "https://many.example/p1",
        }
        with pytest.raises(ValueError, match=">= 1"):
            _spark_frontier(spark, fixture, per_domain_cap=0)


class TestBloomPath:
    def test_bit_identical_to_exact(self, spark, fixture):
        from ocr_spark.operators.dedup import bloom_build
        from ocr_spark.operators.text_analysis import h60

        seen = spark.read.parquet(fixture["seen"])
        bloom = bloom_build(
            seen.select(h60(F.col("url")).alias("sh")), n_items=16
        )
        exact = _spark_frontier(spark, fixture, seen_urls=seen)
        via_bloom = _spark_frontier(
            spark, fixture, seen_urls=seen, seen_bloom=bloom
        )
        assert via_bloom == exact

    def test_bloom_without_seen_raises(self, spark, fixture):
        with pytest.raises(ValueError, match="not a replacement"):
            _spark_frontier(spark, fixture, seen_bloom=(b"\0" * 128, 1024, 8))


class TestRobotsGate:
    def test_disallowed_paths_dropped(self, spark, fixture):
        robots = spark.createDataFrame(
            [
                (
                    "robots.example",
                    "User-agent: *\nDisallow: /private/\nAllow: /public/\n",
                )
            ],
            "host string, robots_txt string",
        )
        got = _spark_frontier(spark, fixture, robots=robots)
        urls = [g[0] for g in got]
        assert "https://robots.example/public/q" in urls
        assert "https://robots.example/private/p" not in urls


class TestPlan:
    def test_shuffle_budget(self, spark, fixture):
        links = spark.read.parquet(fixture["links"])
        out = crawl_frontier(
            links,
            seen_urls=spark.read.parquet(fixture["seen"]),
            blocked_domains=spark.read.parquet(fixture["blocked"]),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        shuffles = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln and "Broadcast" not in ln
        ]
        # ONE shuffle: the url groupBy. Seen/blocked ride broadcast joins.
        assert len(shuffles) <= 1, "\n".join(shuffles)
