"""Code-corpus quality filters: per-rule goldens, exact DuckDB twin parity
(including the degenerate docs every past twin divergence lived in), and
the codegen plan shape."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ocr_spark.operators.code_quality import code_filter_select, code_filter_sql

DOCS = [
    ("ok", "def f(x):\n    return x + 1\n\n# a comment\nprint(f(2))"),
    ("minified", "var a=1;" * 200),  # one 1600-char line
    ("wide", "\n".join("x = 1  # " + "p" * 120 for _ in range(10))),  # mean>100
    ("binaryish", "!!! ??? ***\n((()))\n[[[]]]"),  # alnum < 0.25
    ("blob", "data = '" + "A" * 1500 + "'"),  # base64-ish run
    ("hexblob", "s = '" + "\\xab" * 200 + "'"),  # \xHH escapes
    ("stub", "# This file is auto-generated. DO NOT EDIT.\ncode = 1"),
    ("deep_marker", ("\n" * 10) + "# auto-generated\ncode = 1"),  # past head
    ("empty", ""),
    ("null", None),
    ("ws", "   \n  \t "),
    ("crlf", "line one is fine\r\nline two also ok\r\n"),
]


def _spark_rows(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id string, text string")
    return {
        r["doc_id"]: r
        for r in code_filter_select(sdf, F.col("text")).collect()
    }


class TestRules:
    def test_reason_routing(self, spark):
        got = _spark_rows(spark)
        assert got["ok"]["keep"] is True and got["ok"]["reasons"] == []
        assert got["minified"]["reasons"] == ["long_lines", "mean_line_len"]
        assert got["wide"]["reasons"] == ["mean_line_len"]
        assert got["binaryish"]["reasons"] == ["alnum_ratio"]
        assert got["blob"]["reasons"] == ["long_lines", "mean_line_len", "encoded_data"]
        assert "encoded_data" in got["hexblob"]["reasons"]
        assert got["stub"]["reasons"] == ["autogen"]
        # marker outside the first 5 lines does NOT fire
        assert got["deep_marker"]["keep"] is True
        for d in ("empty", "null", "ws"):
            assert got[d]["reasons"][0] == "empty"
            # whitespace-only must not ALSO fire alnum_ratio
            assert "alnum_ratio" not in got[d]["reasons"]
        assert got["crlf"]["keep"] is True

    def test_crlf_measures_like_unix(self, spark):
        sdf = spark.createDataFrame(
            [("u", "ab\ncd"), ("w", "ab\r\ncd")], ["doc_id", "text"]
        )
        rows = {
            r["doc_id"]: r
            for r in code_filter_select(sdf, F.col("text")).collect()
        }
        assert (
            rows["u"]["mean_line_len_micro"]
            == rows["w"]["mean_line_len_micro"]
        )
        assert rows["u"]["max_line_len"] == rows["w"]["max_line_len"] == 2

    def test_metrics_values(self, spark):
        got = _spark_rows(spark)
        assert got["ok"]["n_lines"] == 5
        assert got["minified"]["max_line_len"] == 1600
        assert got["empty"]["n_lines"] == 1
        assert got["empty"]["mean_line_len_micro"] == 0


class TestTwin:
    def test_spark_equals_duckdb(self, spark):
        got = {
            k: (
                v["n_lines"],
                v["max_line_len"],
                v["mean_line_len_micro"],
                v["alnum_ppm"],
                v["keep"],
                tuple(v["reasons"]),
            )
            for k, v in _spark_rows(spark).items()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        duck = {
            r[0]: (r[1], r[2], r[3], r[4], r[5], tuple(r[6]))
            for r in con.execute(code_filter_sql()).fetchall()
        }
        assert got == duck

    def test_param_override_twin_parity(self, spark):
        params = {"max_line_len": 10, "autogen_head_lines": 2}
        sdf = spark.createDataFrame(DOCS, "doc_id string, text string")
        got = {
            r["doc_id"]: tuple(r["reasons"])
            for r in code_filter_select(
                sdf, F.col("text"), params=params
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        duck = {
            r[0]: tuple(r[6])
            for r in con.execute(code_filter_sql(params=params)).fetchall()
        }
        assert got == duck
        assert "long_lines" in got["ok"]  # tightened param actually bites


class TestPlan:
    def test_single_codegen_projection_no_shuffle(self, spark):
        sdf = spark.createDataFrame(DOCS[:2], "doc_id string, text string")
        plan = (
            code_filter_select(sdf, F.col("text"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestComposition:
    def test_rule_filter_report_composes(self, spark):
        # code_filter_select emits the rule_filter (keep, reasons) shape,
        # so the existing per-rule audit report works unchanged
        from ocr_spark.operators.text_analysis import rule_filter_report

        sdf = spark.createDataFrame(DOCS, "doc_id string, text string")
        rep = {
            r["reason"]: r["n_docs"]
            for r in rule_filter_report(
                code_filter_select(sdf, F.col("text"))
            ).collect()
        }
        assert rep["__kept__"] == 3  # ok, deep_marker, crlf
        assert rep["__dropped__"] == len(DOCS) - rep["__kept__"]
        assert rep["encoded_data"] == 2
