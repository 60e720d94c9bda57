"""Trigram Stupid-Backoff perplexity (ocr_spark/operators/ngram_lm.py)
against a pure-Python reference, plus DuckDB twin parity and the
pretrained-LM path."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.ngram_lm import (
    ngram_perplexity,
    ngram_perplexity_sql,
    train_ngram_lm,
)

# ---------------------------------------------------------------------------
# pure-Python reference (independent implementation of the same spec)
# ---------------------------------------------------------------------------


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z']+", (text or "").lower())


def ref_perplexity(
    docs: list[tuple[int, str]],
    top_unigrams: int = 50_000,
    top_bigrams: int = 500_000,
    top_trigrams: int = 500_000,
    min_count: int = 2,
) -> dict[int, tuple[int, int, float]]:
    toked = {did: _toks(t) for did, t in docs}
    uni_all = Counter(w for ts in toked.values() for w in ts)
    t_total, v_size = sum(uni_all.values()), len(uni_all)
    bi_all = Counter(
        (ts[i - 1], ts[i])
        for ts in toked.values()
        for i in range(1, len(ts))
    )
    tri_all = Counter(
        (ts[i - 2], ts[i - 1], ts[i])
        for ts in toked.values()
        for i in range(2, len(ts))
    )

    def prune(cnt: Counter, k: int, mc: int) -> dict:
        items = [(g, c) for g, c in cnt.items() if c >= mc]
        items.sort(key=lambda gc: (-gc[1], gc[0]))
        return dict(items[:k])

    uni = prune(uni_all, top_unigrams, 1)
    bi = prune(bi_all, top_bigrams, min_count)
    tri = prune(tri_all, top_trigrams, min_count)

    def uni_s(w: str) -> float:
        return (uni.get(w, 0) + 1) / (t_total + v_size)

    out = {}
    for did, ts in toked.items():
        if not ts:
            continue
        lps = []
        for i, w in enumerate(ts):
            if i >= 2:
                t3, b_ctx = (ts[i - 2], ts[i - 1], w), (ts[i - 2], ts[i - 1])
                b2 = (ts[i - 1], w)
                if t3 in tri and b_ctx in bi:
                    s = tri[t3] / bi[b_ctx]
                elif b2 in bi and ts[i - 1] in uni:
                    s = 0.4 * (bi[b2] / uni[ts[i - 1]])
                else:
                    s = 0.16 * uni_s(w)
            elif i == 1:
                b2 = (ts[0], w)
                if b2 in bi and ts[0] in uni:
                    s = bi[b2] / uni[ts[0]]
                else:
                    s = 0.4 * uni_s(w)
            else:
                s = uni_s(w)
            lps.append(math.floor(math.log(s) * 1_000_000.0))
        out[did] = (len(lps), sum(lps), sum(lps) / len(lps))
    return out


CORPUS = [
    (0, "the cat sat on the mat and the cat sat on the hat"),
    (1, "the cat sat on the mat again and again"),
    (2, "a completely different document about spark engines"),
    (3, "the dog RAN over the mat, the dog ran over the cat!"),
    (4, ""),
    (5, None),
    (6, "zzz"),
]


def _collect(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["sum_lp_micronat"],
            r["avg_lp_micronat"],
        )
        for r in df.collect()
    }


class TestAgainstReference:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = _collect(ngram_perplexity(df, min_count=2))
        want = ref_perplexity(CORPUS, min_count=2)
        assert got == want
        assert 4 not in got and 5 not in got  # zero-token docs emit no row

    def test_min_count_1_keeps_singletons(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = _collect(ngram_perplexity(df, min_count=1))
        want = ref_perplexity(CORPUS, min_count=1)
        assert got == want
        # with every trigram in the model, repeated text scores higher
        # (less surprising) than under the pruned model
        pruned = ref_perplexity(CORPUS, min_count=2)
        assert got[1][2] > pruned[1][2]

    def test_tight_caps_exercise_topk_pruning(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        kw = dict(top_unigrams=5, top_bigrams=4, top_trigrams=3, min_count=1)
        got = _collect(ngram_perplexity(df, **kw))
        assert got == ref_perplexity(CORPUS, **kw)

    def test_repetitive_text_scores_above_oov_text(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = _collect(ngram_perplexity(df, min_count=2))
        # doc 1 is in-model repeated text; doc 6 is a single OOV-ish token
        assert got[1][2] > got[6][2]


class TestPretrainedPath:
    def test_explicit_lm_equals_self_trained(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        lm = train_ngram_lm(df, min_count=2)
        a = _collect(ngram_perplexity(df, lm=lm))
        b = _collect(ngram_perplexity(df, min_count=2))
        assert a == b

    def test_persist_roundtrip_releases_cache(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        lm = train_ngram_lm(df, min_count=2).persist()
        got = _collect(ngram_perplexity(df, lm=lm))
        assert got == ref_perplexity(CORPUS, min_count=2)
        lm.unpersist()
        assert jsc.getPersistentRDDs().size() <= before

    def test_score_unseen_corpus_under_trained_lm(self, spark):
        train = spark.createDataFrame(CORPUS, "doc_id long, text string")
        lm = train_ngram_lm(train, min_count=2)
        held = [(10, "the cat sat on the mat"), (11, "qqq www eee")]
        got = _collect(
            ngram_perplexity(
                spark.createDataFrame(held, "doc_id long, text string"),
                lm=lm,
            )
        )
        assert set(got) == {10, 11}
        assert got[10][2] > got[11][2]  # in-domain text is less surprising


class TestDuckDBTwin:
    def test_twin_parity_on_parquet(self, spark, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [d[0] for d in CORPUS],
                    "text": [d[1] for d in CORPUS],
                }
            ),
            p,
        )
        kw = dict(top_unigrams=10, top_bigrams=8, top_trigrams=8, min_count=2)
        got = _collect(ngram_perplexity(spark.read.parquet(p), **kw))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
        )
        sql = ngram_perplexity_sql("SELECT doc_id, text FROM documents", **kw)
        orc = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
        assert got == orc


class TestPerplexitySplit:
    """CCNet head/middle/tail split: per-stratum literal thresholds, exact
    twin parity, conservative 'tail' default for unknown/null strata."""

    @staticmethod
    def _scored(spark):
        rows = [
            (i, "en", float(-1000 - 100 * i)) for i in range(9)
        ] + [
            (100 + i, "fr", float(-5000 - 10 * i)) for i in range(6)
        ] + [
            (900, None, -1234.0),          # null stratum
            (901, "zz", -1.0),             # stratum absent from thresholds
        ]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, avg_lp_micronat double"
        )

    def test_split_and_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from ocr_spark.operators.ngram_lm import (
            perplexity_split,
            perplexity_split_sql,
            perplexity_split_thresholds,
        )

        scored = self._scored(spark)
        th = perplexity_split_thresholds(
            scored.where(F.col("lang").isin("en", "fr"))
        )
        assert set(th) == {"en", "fr"}
        out = perplexity_split(scored, th)
        got = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}

        con = duckdb.connect()
        con.register("scored", scored.toPandas())
        duck = {
            r[0]: r[-1]
            for r in con.execute(
                perplexity_split_sql("SELECT * FROM scored", th)
            ).fetchall()
        }
        assert got == duck
        # head has the HIGHEST scores (lowest perplexity)
        assert got[0] == "head" and got[8] == "tail"
        # unknown / null strata bucket conservatively
        assert got[900] == "tail" and got[901] == "tail"
        # each known stratum has all three buckets
        for lang, lo, hi in (("en", 0, 9), ("fr", 100, 106)):
            bs = {got[i] for i in got if lo <= i < hi}
            assert bs == {"head", "middle", "tail"}, (lang, bs)

    def test_quantile_validation(self, spark):
        from ocr_spark.operators.ngram_lm import perplexity_split_thresholds

        with pytest.raises(ValueError):
            perplexity_split_thresholds(
                self._scored(spark), quantiles=(0.7, 0.3)
            )

    def test_null_stratum_dropped_from_thresholds(self, spark):
        from ocr_spark.operators.ngram_lm import perplexity_split_thresholds

        th = perplexity_split_thresholds(self._scored(spark))
        assert None not in th and set(th) == {"en", "fr", "zz"}


class TestPerplexitySplitDegenerate:
    """The second review pass's findings: empty/quoted/all-null-stratum
    threshold edges must behave identically across engines, not crash."""

    def test_empty_thresholds_all_tail_both_engines(self, spark):
        import duckdb

        from ocr_spark.operators.ngram_lm import (
            perplexity_split,
            perplexity_split_sql,
        )

        scored = spark.createDataFrame(
            [(1, "en", -5.0)], "doc_id long, lang string, avg_lp_micronat double"
        )
        out = perplexity_split(scored, {}).collect()
        assert out[0]["ppl_bucket"] == "tail"
        con = duckdb.connect()
        con.register("scored", scored.toPandas())
        r = con.execute(
            perplexity_split_sql("SELECT * FROM scored", {})
        ).fetchone()
        assert r[-1] == "tail"

    def test_all_null_score_stratum_dropped(self, spark):
        from ocr_spark.operators.ngram_lm import perplexity_split_thresholds

        scored = spark.createDataFrame(
            [(1, "en", -5.0), (2, "en", -6.0), (3, "xx", None)],
            "doc_id long, lang string, avg_lp_micronat double",
        )
        th = perplexity_split_thresholds(scored)
        assert set(th) == {"en"}

    def test_quoted_stratum_twin_parses(self, spark):
        import duckdb

        from ocr_spark.operators.ngram_lm import (
            perplexity_split,
            perplexity_split_sql,
        )

        th = {"x'y": (-5.0, -10.0)}
        scored = spark.createDataFrame(
            [(1, "x'y", -3.0), (2, "x'y", -20.0)],
            "doc_id long, lang string, avg_lp_micronat double",
        )
        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_split(scored, th).collect()
        }
        con = duckdb.connect()
        con.register("scored", scored.toPandas())
        duck = dict(
            (r[0], r[-1])
            for r in con.execute(
                perplexity_split_sql("SELECT * FROM scored", th)
            ).fetchall()
        )
        assert got == duck == {1: "head", 2: "tail"}
