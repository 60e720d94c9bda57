"""Unicode hygiene: control/zero-width strip (exact DuckDB twin) +
NFC/NFKC normalization (sparse UDF, cross-checked against DuckDB's
independent nfc_normalize)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.text import (
    clean_control_chars,
    clean_control_chars_sql,
    unicode_clean,
    unicode_normalize,
)

DIRTY = [
    "plain ascii stays",
    "tab\tand\nnewline kept",
    "carriage\rreturn kept",
    "null\x00 bell\x07 del\x7f stripped",
    "c1 \x85controls\x9f stripped",
    "zero\u200bwidth\u200c chars\u200d gone\u2060",
    "\ufeffBOM and soft\u00adhyphen gone",
    "caf\u00e9 composed",
    "cafe\u0301 decomposed",
    "\uff28\uff45\uff4c\uff4cfullwidth",
    "\ufb01 ligature",
    None,
    "",
]


class TestControlStrip:
    def test_goldens(self, spark):
        df = spark.createDataFrame(
            [(t,) for t in DIRTY], ["text"]
        ).select(clean_control_chars(F.col("text")).alias("c"))
        got = [r["c"] for r in df.collect()]
        assert got[0] == "plain ascii stays"
        assert got[1] == "tab\tand\nnewline kept"
        assert got[2] == "carriage\rreturn kept"
        assert got[3] == "null bell del stripped"
        assert got[4] == "c1 controls stripped"
        assert got[5] == "zerowidth chars gone"
        assert got[6] == "BOM and softhyphen gone"
        assert got[11] is None

    def test_duckdb_twin_identical(self, spark):
        sdf = spark.createDataFrame(
            [(t,) for t in DIRTY if t is not None], ["text"]
        )
        spark_out = [
            r["c"]
            for r in sdf.select(
                clean_control_chars(F.col("text")).alias("c")
            ).collect()
        ]
        con = duckdb.connect()
        duck_out = [
            con.execute(
                f"SELECT {clean_control_chars_sql('?')}", [t]
            ).fetchone()[0]
            for t in DIRTY
            if t is not None
        ]
        assert spark_out == duck_out


class TestUnicodeNormalize:
    def test_nfc_goldens(self, spark):
        df = spark.createDataFrame(
            [("caf\u00e9",), ("cafe\u0301",), ("ascii",), (None,)], ["text"]
        ).select(unicode_normalize(F.col("text"), "NFC").alias("c"))
        got = [r["c"] for r in df.collect()]
        assert got[0] == got[1] == "caf\u00e9"
        assert got[2] == "ascii"
        assert got[3] is None

    def test_nfkc_compatibility_folds(self, spark):
        df = spark.createDataFrame(
            [("\uff28\uff49 \ufb01ne",)], ["text"]
        ).select(unicode_normalize(F.col("text"), "NFKC").alias("c"))
        assert df.first()["c"] == "Hi fine"

    def test_matches_duckdb_nfc(self, spark):
        texts = [t for t in DIRTY if t]
        sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
        spark_out = [
            r["c"]
            for r in sdf.select(
                unicode_normalize(F.col("text"), "NFC").alias("c")
            ).collect()
        ]
        con = duckdb.connect()
        duck_out = [
            con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
            for t in texts
        ]
        assert spark_out == duck_out

    def test_bad_form_raises(self):
        with pytest.raises(ValueError):
            unicode_normalize(F.col("x"), "NFX")

    def test_full_clean_composition(self, spark):
        raw = "﻿café​ test\x00"
        df = spark.createDataFrame([(raw,)], ["text"]).select(
            unicode_clean(F.col("text")).alias("c")
        )
        assert df.first()["c"] == "caf\u00e9 test"

    def test_ascii_sparse_path_identity(self, spark):
        rows = [(f"doc {i} plain ascii",) for i in range(40)]
        df = spark.createDataFrame(rows, ["text"]).select(
            F.col("text"),
            unicode_normalize(F.col("text")).alias("n"),
        )
        assert df.filter(F.col("text") != F.col("n")).count() == 0

    def test_python_reference_agreement(self):
        # the UDF body IS unicodedata.normalize; pin the library behavior
        # the tests above rely on
        assert unicodedata.normalize("NFC", "cafe\u0301") == "caf\u00e9"
        assert unicodedata.normalize("NFKC", "\ufb01") == "fi"
