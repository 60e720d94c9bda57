"""Model-based quality classifier: held-out separation, exact DuckDB twin
parity (including the negative-logit floor-division corner), broadcast
plan shape, and zero-token semantics."""

from __future__ import annotations

import importlib.util
import os
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.text_analysis import (
    load_quality_lr,
    quality_classifier,
    quality_classifier_sql,
)

_GEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "gen_quality_weights.py",
)


def _gen_module():
    spec = importlib.util.spec_from_file_location("gen_quality_weights", _GEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestFixture:
    def test_fixture_shape(self):
        dim, bias, rows = load_quality_lr()
        assert dim == 1024
        assert isinstance(bias, int)
        assert 1 <= len(rows) <= dim
        assert all(isinstance(b, int) and isinstance(w, int) for b, w in rows)


class TestHeldOutSeparation:
    def test_accuracy_on_unseen_docs(self, spark):
        # Held out at the DOCUMENT level: a hashed-unigram model is
        # lexicon-bound by construction (an unseen vocabulary hashes to
        # untrained buckets), so the valid generalization test is fresh
        # documents over the in-domain lexicon — the same protocol a real
        # corpus-quality classifier is evaluated under.
        gen = _gen_module()
        vocab = gen.content_vocab(random.Random(gen.SEED))
        rng = random.Random(9999)  # NOT the training doc seed
        rows = [(f"p{i}", gen.positive_doc(rng, vocab), 1) for i in range(150)] + [
            (f"n{i}", gen.negative_doc(rng, vocab), 0) for i in range(150)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: r["quality_keep"]
            for r in quality_classifier(docs).collect()
        }
        acc = sum(
            1 for i, _, lab in rows if got[i] == bool(lab)
        ) / len(rows)
        assert acc >= 0.9, f"held-out accuracy {acc}"


class TestTwinParity:
    DOCS = [
        ("a", "The cat sat on the mat and it was good."),
        ("b", "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz"),
        ("c", "8241% 99$ 12# 444 09321 555# 1$"),
        ("d", ""),
        ("e", None),
        ("f", "!!! ??? ..."),
        ("g", "one token"),
    ]

    def test_spark_equals_duckdb(self, spark):
        sdf = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        spark_rows = {
            r["doc_id"]: (
                r["n_clf_tokens"],
                r["mean_logit_micro"],
                r["quality_keep"],
            )
            for r in quality_classifier(sdf).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", self.DOCS
        )
        duck_rows = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(quality_classifier_sql()).fetchall()
        }
        assert spark_rows == duck_rows

    def test_negative_mean_logit_floor_parity(self, spark):
        # junk text drives the logit negative; the floor-vs-truncate
        # divergence lives exactly here
        sdf = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        neg = [
            r
            for r in quality_classifier(sdf).collect()
            if r["mean_logit_micro"] is not None and r["mean_logit_micro"] < 0
        ]
        assert neg, "expected at least one negative mean logit in the fixture"


class TestSemantics:
    def test_zero_token_docs_dropped_not_kept(self, spark):
        sdf = spark.createDataFrame(
            [("d", ""), ("e", None), ("f", "!!!")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r for r in quality_classifier(sdf).collect()}
        for k in "def":
            assert got[k]["n_clf_tokens"] == 0
            assert got[k]["mean_logit_micro"] is None
            assert got[k]["quality_keep"] is False

    def test_plan_broadcasts_weights(self, spark):
        sdf = spark.createDataFrame([("a", "hello world")], ["doc_id", "text"])
        plan = (
            quality_classifier(sdf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
