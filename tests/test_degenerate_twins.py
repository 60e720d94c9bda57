"""Twin-parity regressions on degenerate inputs — the divergences found by
the round-5 adversarial-corpus sweep (scripts/make_degenerate_corpus.py +
scripts/check_oracles.py, all 50 pairs green on it). Each test pins one
fixed divergence at unit scale so it can't quietly come back:

  * quality_repetition: NULL text must yield NULL dup_line_char_frac on
    BOTH engines (the twin's empty-text coalesce once manufactured 0.0)
  * line_dedup over synthesized lines: wordless docs must keep text ''
    on both engines (DuckDB's array_to_string([]) is NULL, Spark's
    array_join([]) is '')
  * cosine family: a zero-norm vector scores EXACTLY 0.0 on both engines
    (was ±inf in the numpy golden, ANSI DIVIDE_BY_ZERO in Spark, NULL in
    DuckDB — three different behaviors for one input)
  * temperature_targets: a None stratum key (GROUP BY over null lang) is
    dropped, not a TypeError
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


class TestQualityRepetitionNullText:
    def test_null_text_null_fractions_both_engines(self, spark):
        from ocr_spark.operators.text_analysis import (
            quality_repetition_select,
            quality_repetition_sql,
        )

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "a\nb\na\nb")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in quality_repetition_select(df, F.col("text")).collect()
        }
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame({"doc_id": [1, 2, 3], "text": [None, "", "a\nb\na\nb"]}),
        )
        duck = {
            r[0]: dict(zip([d[0] for d in cur.description], r))
            for cur in [con.execute(quality_repetition_sql("text"))]
            for r in cur.fetchall()
        }
        for i in (1, 2, 3):
            for c in ("dup_line_frac", "dup_line_char_frac",
                      "top_bigram_char_frac", "char_run_rep"):
                s, d = got[i][c], duck[i][c]
                assert (s is None) == (d is None), (i, c, s, d)
                if s is not None:
                    assert s == pytest.approx(d, abs=1e-12), (i, c, s, d)
        # the specific round-5 finding: NULL text -> NULL, empty -> 0.0
        assert got[1]["dup_line_char_frac"] is None
        assert got[2]["dup_line_char_frac"] == 0.0


class TestLinedDocsWordless:
    def test_wordless_docs_keep_empty_text_both_engines(self, spark):
        import __spark_entry__ as E

        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": [1, 2, 3, 4],
                 "text": ["", "   ", None, "a b c d e"]}
            ),
        )
        duck = dict(
            (r[0], r[1]) for r in con.execute(E._lined_docs_sql()).fetchall()
        )
        # Spark's array_join on empty/null-element arrays yields '' — the
        # twin must too (not NULL)
        assert duck[1] == "" and duck[2] == "" and duck[3] == ""
        assert duck[4] == "a b\nc d\ne"


class TestZeroNormCosine:
    def test_zero_vector_scores_zero_spark(self, spark):
        from ocr_spark.operators.similarity import cosine

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, v array<double>"
        )
        q = F.array(F.lit(1.0), F.lit(0.0))
        got = {
            r["vec_id"]: r["c"]
            for r in df.select(
                "vec_id", F.round(cosine(F.col("v"), q), 6).alias("c")
            ).collect()
        }
        assert got[1] == 0.0 and got[2] == 1.0

    def test_zero_vector_scores_zero_duckdb(self):
        from ocr_spark.operators.similarity import _sql_cos

        got = duckdb.connect().execute(
            f"SELECT round({_sql_cos('[0.0, 0.0]::DOUBLE[]', '[1.0, 0.0]::DOUBLE[]')}, 6)"
        ).fetchone()[0]
        assert got == 0.0

    def test_zero_vector_scores_zero_numpy_golden(self):
        import numpy as np

        from ocr_spark.operators.similarity import (
            ivfpq_scores_np,
            pq_train_residual,
        )

        rng = np.random.default_rng(3)
        X = rng.standard_normal((32, 16))
        X[5] = 0.0  # the zero vector
        centroids = X[:4].copy()
        books = pq_train_residual(X, centroids, m_sub=4, n_codes=4, iters=3, seed=1)
        ids = np.arange(32, dtype=np.int64)
        gid, gs = ivfpq_scores_np(
            ids, X, X[1], centroids, books, probe=[1, 2, 3, 4]
        )
        assert np.isfinite(gs).all()
        assert gs[list(gid).index(5)] == 0.0


class TestTemperatureTargetsNullStratum:
    def test_none_key_dropped(self):
        from ocr_spark.operators.corpus_clean import temperature_targets

        t = temperature_targets(
            {"en": 70, None: 20, "fr": 10}, total_target=50, temperature=0.7
        )
        assert None not in t and set(t) == {"en", "fr"}


class TestZeroNormCentroid:
    def test_coarse_cos_zero_centroid_matches_spark_convention(self):
        import numpy as np

        from ocr_spark.operators.similarity import _coarse_cos

        X = np.array([[1.0, 0.0], [0.5, 0.5]])
        C = np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]])
        cos = _coarse_cos(X, C)
        assert np.isfinite(cos).all()
        # the zero centroid scores 0.0 for everyone (never NaN-wins argmax)
        assert (cos[:, 1] == 0.0).all()
        assert cos.argmax(1).tolist() == [0, 0]
