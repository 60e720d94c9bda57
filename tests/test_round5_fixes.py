"""Regression tests for the round-5 ADVICE fixes:
- rule_filter twins agree on wordless docs (empty/whitespace-only/null)
- dup_span_removal honors a non-default text_col end-to-end (incl. the
  corpus_pipeline patch join contract)
- blocklist_filter_sql keeps the corpus when the blocklist contains NULL
- temperature_sample tolerates NULL strata (excluded, never sampled)
- phash64 returns a signed 64-bit int in pure Python (numpy>=2.0 raises
  OverflowError on out-of-range uint64->int64 conversion)
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F


class TestRuleFilterWordlessTwinParity:
    CASES = ["", "   ", "\n\n\t ", None, "one two"]

    def test_reasons_identical_both_engines(self, spark):
        from ocr_spark.operators.text_analysis import (
            rule_filter_select,
            rule_filter_sql,
        )

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["keep"], list(r["reasons"]))
            for r in rule_filter_select(docs, F.col("text")).collect()
        }
        import pandas as pd

        con = duckdb.connect()
        src = pd.DataFrame(
            {"doc_id": range(len(self.CASES)), "text": self.CASES}
        )
        con.register("src", src)
        con.execute("CREATE TABLE documents AS SELECT * FROM src")
        oracle = {
            r[0]: (r[1], list(r[2]))
            for r in con.execute(rule_filter_sql()).fetchall()
        }
        assert got == oracle
        # the wordless docs must fire mean_word_len in BOTH engines
        for i, t in enumerate(self.CASES):
            if not (t or "").split():
                assert "mean_word_len" in got[i][1], (i, got[i])


class TestDupSpanRemovalTextCol:
    def test_non_default_text_col(self, spark):
        from ocr_spark.operators.corpus_clean import dup_span_removal

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "a b c d e f x y")],
            "doc_id long, body string",
        )
        out = dup_span_removal(docs, n=6, min_count=2, text_col="body")
        assert "body" in out.columns and "text" not in out.columns
        rows = {r["doc_id"]: r["body"] for r in out.collect()}
        # the shared 6-gram 'a b c d e f' is removed from both docs
        assert rows[1] == "g h" and rows[2] == "x y"

    def test_pipeline_patch_join_with_text_col(self, spark):
        from ocr_spark.operators.corpus import corpus_pipeline

        docs = spark.createDataFrame(
            [
                (
                    i,
                    "the quick brown fox and the lazy dog have words to be "
                    "sentences. Good one. Third sentence here. "
                    + ("shared run of six tokens exactly here " * 2 if i < 2 else f"uniq{i} ")
                    + "tail of normal prose that keeps quality fine.",
                )
                for i in range(4)
            ],
            "doc_id long, body string",
        )
        out = corpus_pipeline(
            docs,
            min_quality=0.0,
            dup_span_n=6,
            text_col="body",
        )
        assert "body" in out.columns
        assert out.count() > 0


class TestBlocklistSqlNullEntry:
    def test_null_in_blocklist_keeps_corpus(self):
        from ocr_spark.functions.url import blocklist_filter_sql

        con = duckdb.connect()
        src = (
            "SELECT * FROM (VALUES (1, 'http://keep.com/a'), "
            "(2, 'http://spam.com/b'), (3, NULL)) AS t(doc_id, url)"
        )
        blocked = "SELECT * FROM (VALUES ('spam.com'), (NULL)) AS b(domain)"
        rows = con.execute(blocklist_filter_sql(src, blocked)).fetchall()
        kept = {r[0] for r in rows}
        # NULL blocklist entry must not nuke the corpus; NULL url is kept
        assert kept == {1, 3}


class TestTemperatureSampleNullStratum:
    def test_null_stratum_excluded_not_crashing(self, spark):
        from ocr_spark.operators.corpus_clean import temperature_sample

        docs = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else None) for i in range(40)],
            "doc_id long, lang string",
        )
        out = temperature_sample(docs, total_target=10, temperature=0.7)
        rows = out.collect()
        assert all(r["stratum"] == "en" for r in rows)


class TestQueryBoardCap:
    def test_at_most_50_queries_each_with_an_oracle_twin(self):
        """The driver records only the FIRST 50 registered queries() in
        CORRECTNESS_r{N}.json (r4 silently lost 23 of 73). The board must
        stay at the cap — adding a query means merging or retiring another
        — and every entry needs its oracle twin."""
        import __spark_entry__ as E

        qs = E.queries()
        assert len(qs) <= 50
        oracles = E.oracle_sql()
        assert [k for k in qs if k not in oracles] == []
        assert [k for k in oracles if k not in qs] == []


class TestPhash64PurePython:
    def test_high_bit_hash_is_signed_python_int(self):
        from ocr_spark.operators.multimodal import phash64

        rng = np.random.RandomState(7)
        seen_negative = False
        for _ in range(20):
            img = rng.randint(0, 256, size=(64, 64)).astype(np.float64)
            h = phash64(img)
            assert isinstance(h, int)
            assert -(1 << 63) <= h < (1 << 63)
            seen_negative |= h < 0
        assert seen_negative  # bit 63 set on ~half of hashes
