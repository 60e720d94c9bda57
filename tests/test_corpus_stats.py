"""Corpus summary report (ocr_spark/operators/corpus_stats.py): exact
DuckDB twin parity, approx-mode error bounds, degenerate inputs."""

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.corpus_stats import (
    corpus_stats,
    corpus_stats_sql,
    lang_histogram,
    lang_histogram_sql,
)


def _rows(n=300, seed=5):
    rng = random.Random(seed)
    langs = ["en", "de", "fr", None]
    rows = []
    for i in range(n):
        lang = langs[i % 4]
        if i % 29 == 0:
            text = None
        elif i % 31 == 0:
            text = "   "
        else:
            text = " ".join(
                f"w{rng.randrange(100)}" for _ in range(rng.randrange(1, 40))
            )
        url = f"https://site{i % 17}.example/p{i}" if i % 5 else None
        rows.append((i, text, lang, url))
    return rows


@pytest.fixture(scope="module")
def corpus_pq(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _rows()
    p = str(tmp_path_factory.mktemp("cstats") / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "url": [r[3] for r in rows],
            }
        ),
        p,
    )
    return p


class TestCorpusStats:
    def test_twin_parity(self, spark, corpus_pq):
        import duckdb

        docs = spark.read.parquet(corpus_pq)
        got = corpus_stats(docs, url_col="url").collect()[0].asDict()
        con = duckdb.connect()
        cur = con.execute(
            corpus_stats_sql(
                f"SELECT * FROM read_parquet('{corpus_pq}')", url_col="url"
            )
        )
        cols = [d[0] for d in cur.description]
        orc = dict(zip(cols, cur.fetchone()))
        assert got == orc
        assert got["n_docs"] == 300
        assert got["n_null_text"] > 0 and got["n_empty_text"] > 0
        assert got["n_langs"] == 3  # count(DISTINCT) skips the null lang

    def test_twin_parity_no_url(self, spark, corpus_pq):
        import duckdb

        docs = spark.read.parquet(corpus_pq)
        got = corpus_stats(docs).collect()[0].asDict()
        assert "n_domains" not in got
        con = duckdb.connect()
        cur = con.execute(
            corpus_stats_sql(f"SELECT * FROM read_parquet('{corpus_pq}')")
        )
        cols = [d[0] for d in cur.description]
        assert got == dict(zip(cols, cur.fetchone()))

    def test_approx_within_bounds(self, spark, corpus_pq):
        docs = spark.read.parquet(corpus_pq)
        exact = corpus_stats(docs, url_col="url").collect()[0].asDict()
        approx = corpus_stats(docs, url_col="url", approx=True).collect()[0].asDict()
        assert set(exact) == set(approx)  # same report schema either way
        # exact aggregates are identical in both modes
        for k in ("n_docs", "n_null_text", "n_empty_text", "total_chars",
                  "total_tokens", "mean_doc_utokens"):
            assert exact[k] == approx[k], k
        # HLL++ relative error ~2.3% default (rsd 0.05 bound here);
        # GK percentile within 0.01% rank error — at 300 rows = exact rank
        for k in ("n_langs", "n_domains"):
            assert abs(approx[k] - exact[k]) <= max(1, int(0.05 * exact[k])), k
        for k in ("p50_doc_tokens", "p90_doc_tokens"):
            assert abs(approx[k] - exact[k]) <= 2, k

    def test_empty_corpus(self, spark, corpus_pq):
        import duckdb

        docs = spark.createDataFrame([], "doc_id bigint, text string, lang string")
        row = corpus_stats(docs).collect()[0].asDict()
        assert row["n_docs"] == 0
        assert row["total_tokens"] == 0
        assert row["mean_doc_utokens"] is None
        assert row["p50_doc_tokens"] is None  # percentile of nothing
        con = duckdb.connect()
        cur = con.execute(
            corpus_stats_sql(
                f"SELECT * FROM read_parquet('{corpus_pq}') WHERE FALSE"
            )
        )
        cols = [d[0] for d in cur.description]
        assert row == dict(zip(cols, cur.fetchone()))


class TestLangHistogram:
    def test_twin_parity_and_null_lang_row(self, spark, corpus_pq):
        import duckdb

        docs = spark.read.parquet(corpus_pq)
        got = sorted(
            (
                (r.lang, r.n_docs, r.n_tokens, r.share_ppm)
                for r in lang_histogram(docs).collect()
            ),
            key=lambda t: (t[0] is None, t[0] or ""),
        )
        con = duckdb.connect()
        orc = sorted(
            (tuple(r) for r in con.execute(
                lang_histogram_sql(f"SELECT * FROM read_parquet('{corpus_pq}')")
            ).fetchall()),
            key=lambda t: (t[0] is None, t[0] or ""),
        )
        assert got == orc
        assert any(r[0] is None for r in got)  # null lang kept as a row
        assert sum(r[1] for r in got) == 300
        # shares sum to ~1e6 (integer floor loses at most n_langs ppm)
        total_ppm = sum(r[3] for r in got)
        assert 1_000_000 - len(got) <= total_ppm <= 1_000_000

    def test_plan_single_pass(self, spark, corpus_pq):
        docs = spark.read.parquet(corpus_pq)
        plan = (
            lang_histogram(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the denominator rides a broadcast, not a second aggregation of
        # the corpus: exactly one non-broadcast Exchange (the lang groupBy)
        import re

        shuffles = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln and "Broadcast" not in ln
        ]
        assert len(shuffles) <= 2  # lang agg + single-partition total agg


class TestDomainCuration:
    """domain_quality_stats + derive_blocklist: the quality→URL-hygiene loop."""

    def _docs(self):
        rows = []
        # good.example: 30 docs, scores 600k..629k (all above threshold)
        for i in range(30):
            rows.append((i, f"https://good.example/p{i}", 600_000 + i * 1000))
        # junk.example: 25 docs, 90% bad
        for i in range(25):
            s = 100_000 if i < 23 else 700_000
            rows.append((100 + i, f"https://junk.example/p{i}", s))
        # tiny.example: 3 docs all bad — below the evidence floor
        for i in range(3):
            rows.append((200 + i, f"https://tiny.example/p{i}", 50_000))
        # null url and null score rows must be excluded
        rows.append((300, None, 10_000))
        rows.append((301, "https://good.example/x", None))
        return rows

    def test_stats_twin_and_blocklist(self, spark, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_spark.operators.corpus_stats import (
            derive_blocklist,
            derive_blocklist_sql,
            domain_quality_stats,
            domain_quality_stats_sql,
        )

        rows = self._docs()
        p = str(tmp_path / "scored.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "url": [r[1] for r in rows],
                    "score": pa.array([r[2] for r in rows], type=pa.int64()),
                }
            ),
            p,
        )
        docs = spark.read.parquet(p)
        stats = domain_quality_stats(docs, "score")
        got = sorted(
            (r.domain, r.n_docs, r.mean_score_micro, r.bad_ppm)
            for r in stats.collect()
        )
        con = duckdb.connect()
        sql = domain_quality_stats_sql(
            f"SELECT * FROM read_parquet('{p}')", "score"
        )
        orc = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == orc
        by_dom = {g[0]: g for g in got}
        assert by_dom["good.example"][3] == 0  # bad_ppm
        assert by_dom["junk.example"][1] == 25
        assert by_dom["junk.example"][3] == 920_000  # 23/25 in ppm
        assert "300" not in by_dom  # null url excluded
        assert by_dom["good.example"][1] == 30  # null-score doc excluded

        blocked = {r.domain for r in derive_blocklist(stats).collect()}
        assert blocked == {"junk.example"}  # tiny.example lacks evidence
        orc_blocked = {
            r[0]
            for r in con.execute(
                derive_blocklist_sql(f"({sql})")
            ).fetchall()
        }
        assert orc_blocked == blocked

    def test_feeds_blocklist_filter(self, spark, tmp_path):
        """The derived list plugs straight into blocklist_filter."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_spark.functions.url import blocklist_filter
        from ocr_spark.operators.corpus_stats import (
            derive_blocklist,
            domain_quality_stats,
        )

        rows = self._docs()
        p = str(tmp_path / "scored2.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "url": [r[1] for r in rows],
                    "score": pa.array([r[2] for r in rows], type=pa.int64()),
                }
            ),
            p,
        )
        docs = spark.read.parquet(p)
        blocked = derive_blocklist(domain_quality_stats(docs, "score"))
        kept = blocklist_filter(docs, blocked)
        urls = [r.url for r in kept.collect() if r.url]
        assert not any("junk.example" in u for u in urls)
        assert any("good.example" in u for u in urls)
        assert any("tiny.example" in u for u in urls)  # evidence floor
        # null-url doc kept (blocklist_filter's null contract)
        assert kept.where(F.col("url").isNull()).count() == 1
