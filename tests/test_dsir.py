"""DSIR importance resampling: pure-Python reference equality, exact DuckDB
twin parity (fit, weights, composed resample) incl. degenerate docs, Gumbel
determinism/re-draw, enrichment property, and the u→1.0 clamp."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from ocr_spark.operators.dsir import (
    _H60_RANGE,
    _lr_micro,
    dsir_fit,
    dsir_fit_sql,
    dsir_resample,
    dsir_resample_sql,
    dsir_weights,
    dsir_weights_sql,
)

TARGET = [
    ("t1", "the quick brown fox jumps over the lazy dog"),
    ("t2", "a quick brown fox and a lazy dog met in the park"),
    ("t3", "brown foxes are quick and dogs are lazy"),
]
RAW = [
    ("r1", "the quick brown fox likes the lazy dog"),  # target-like
    ("r2", "quick brown dogs jump over lazy foxes"),  # target-like
    ("r3", "buy cheap pills online casino bonus click here now"),  # junk
    ("r4", "winner winner free free free prize prize claim claim"),  # junk
    ("r5", ""),  # gram-less
    ("r6", None),  # gram-less
    ("r7", "!!! ??? ..."),  # gram-less
    ("r8", "solo"),  # one unigram, zero bigrams
    ("r9", "it's odd-ball text; quick brown Fox!"),  # punctuation splits
]
DIM = 512


def _py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_tokens(t: str | None) -> list[str]:
    import re

    if t is None:
        return []
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_grams(t: str | None) -> list[str]:
    w = _py_tokens(t)
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _py_fit(target, raw, dim):
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, t in target:
        for g in _py_grams(t):
            b = _py_h32(g) % dim
            tc[b] = tc.get(b, 0) + 1
    for _, t in raw:
        for g in _py_grams(t):
            b = _py_h32(g) % dim
            rc[b] = rc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    return {
        "dim": dim,
        "t_total": T,
        "r_total": R,
        "lr0_micro": _lr_micro(0, T, 0, R, dim),
        "buckets": sorted(
            (b, _lr_micro(tc.get(b, 0), T, rc.get(b, 0), R, dim))
            for b in set(tc) | set(rc)
        ),
    }


def _py_weights(docs, model):
    out = {}
    lut = dict(model["buckets"])
    for i, t in docs:
        gs = _py_grams(t)
        if not gs:
            out[i] = (0, None, None)
            continue
        s = sum(lut.get(_py_h32(g) % model["dim"], model["lr0_micro"]) for g in gs)
        out[i] = (len(gs), s, math.floor(s / len(gs)))
    return out


def _duck(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    return con


@pytest.fixture(scope="module")
def model(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, "doc_id string, text string")
    return dsir_fit(t, r, dim=DIM)


class TestFit:
    def test_fit_equals_python_reference(self, spark, model):
        assert model == _py_fit(TARGET, RAW, DIM)

    def test_fit_equals_duckdb_twin(self, model):
        con = _duck(TARGET + RAW)
        con.execute(
            "CREATE TABLE raw AS SELECT * FROM documents WHERE doc_id LIKE 'r%'"
        )
        con.execute(
            "CREATE TABLE tgt AS SELECT * FROM documents WHERE doc_id LIKE 't%'"
        )
        rows = con.execute(
            dsir_fit_sql("SELECT text FROM tgt", "SELECT text FROM raw", dim=DIM)
        ).fetchall()
        assert [(b, w) for b, w in rows] == model["buckets"]

    def test_lr_micro_separates_laplace_edges(self):
        # unseen-in-raw target bucket is positive, raw-only is negative,
        # absent-everywhere is the lr0 default and finite
        assert _lr_micro(5, 100, 0, 100, DIM) > 0
        assert _lr_micro(0, 100, 5, 100, DIM) < 0
        assert isinstance(_lr_micro(0, 100, 0, 100, DIM), int)


class TestWeights:
    def test_spark_equals_python_reference(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["lr_micro"], r["avg_lr_micro"])
            for r in dsir_weights(docs, model).collect()
        }
        assert got == _py_weights(RAW, model)

    def test_spark_equals_duckdb_twin(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["lr_micro"], r["avg_lr_micro"])
            for r in dsir_weights(docs, model).collect()
        }
        con = _duck(RAW)
        duck = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(dsir_weights_sql(model)).fetchall()
        }
        assert got == duck

    def test_gramless_docs_carry_null_scores(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = {r["doc_id"]: r for r in dsir_weights(docs, model).collect()}
        for d in ("r5", "r6", "r7"):
            assert got[d]["n_grams"] == 0
            assert got[d]["lr_micro"] is None
            assert got[d]["avg_lr_micro"] is None
        assert got["r8"]["n_grams"] == 1  # unigram only, no bigram

    def test_target_like_beats_junk(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = {
            r["doc_id"]: r["avg_lr_micro"]
            for r in dsir_weights(docs, model).collect()
        }
        assert min(got["r1"], got["r2"]) > max(got["r3"], got["r4"])


class TestResample:
    def test_composed_twin_parity(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = [
            (r["doc_id"], r["gumbel_key"])
            for r in dsir_resample(
                dsir_weights(docs, model), k=4, seed="s1"
            ).collect()
        ]
        con = _duck(RAW)
        duck = [
            (r[0], r[-1])
            for r in con.execute(
                dsir_resample_sql(model, k=4, seed="s1")
            ).fetchall()
        ]
        assert got == duck

    def test_deterministic_and_redrawable(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        wt = dsir_weights(docs, model)
        a = [r["doc_id"] for r in dsir_resample(wt, k=3, seed="s1").collect()]
        b = [r["doc_id"] for r in dsir_resample(wt, k=3, seed="s1").collect()]
        assert a == b
        seeds = {
            s: tuple(
                r["doc_id"] for r in dsir_resample(wt, k=3, seed=s).collect()
            )
            for s in ("s1", "s2", "s3", "s4")
        }
        assert len(set(seeds.values())) > 1  # some seed re-draws the set

    def test_gramless_never_selected_even_at_full_k(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        picked = {
            r["doc_id"]
            for r in dsir_resample(
                dsir_weights(docs, model), k=len(RAW), seed="s1"
            ).collect()
        }
        assert picked == {"r1", "r2", "r3", "r4", "r8", "r9"}

    def test_quote_in_seed_is_escaped(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        got = [
            r["doc_id"]
            for r in dsir_resample(
                dsir_weights(docs, model), k=2, seed="o'hara"
            ).collect()
        ]
        con = _duck(RAW)
        duck = [
            r[0]
            for r in con.execute(
                dsir_resample_sql(model, k=2, seed="o'hara")
            ).fetchall()
        ]
        assert got == duck

    def test_u_clamp_keeps_gumbel_finite(self):
        # the top of the h60 range rounds u to 1.0 in double; the clamp
        # must keep -ln(-ln(u)) finite in both engines
        u_raw = (float(int(_H60_RANGE) - 1) + 1.0) / (_H60_RANGE + 1.0)
        assert u_raw == 1.0  # the hazard is real
        u = min(u_raw, 1.0 - 2.0**-53)
        g = -math.log(-math.log(u))
        assert math.isfinite(g)
        # the decimal literal 0.99...9 would round to 1.0 through DuckDB's
        # DECIMAL(17,16)→DOUBLE cast; the twin's arithmetic form must not
        r = duckdb.sql(
            "SELECT floor(-ln(-ln(least(1.0::DOUBLE,"
            " 1.0::DOUBLE - pow(2.0::DOUBLE, -53)))) * 1000000.0)::BIGINT"
        ).fetchone()[0]
        assert r == math.floor(g * 1_000_000.0)


class TestEnrichment:
    def test_resampled_set_is_target_enriched(self, spark):
        # 60 target-like + 140 junk docs; DSIR top-50 should be mostly
        # target-like (closed-form check on planted structure)
        tgt_words = "alpha beta gamma delta epsilon zeta eta theta".split()
        junk_words = "spam casino pills winner free claim bonus click".split()
        import random

        rng = random.Random(42)

        def doc(words, n=12):
            return " ".join(rng.choice(words) for _ in range(n))

        target = [(f"t{i}", doc(tgt_words)) for i in range(40)]
        raw = [(f"g{i}", doc(tgt_words)) for i in range(60)] + [
            (f"j{i}", doc(junk_words)) for i in range(140)
        ]
        t = spark.createDataFrame(target, ["doc_id", "text"])
        r = spark.createDataFrame(raw, ["doc_id", "text"])
        m = dsir_fit(t, r, dim=DIM)
        picked = [
            row["doc_id"]
            for row in dsir_resample(
                dsir_weights(r, m), k=50, seed="mix"
            ).collect()
        ]
        n_good = sum(1 for d in picked if d.startswith("g"))
        assert n_good >= 45, f"only {n_good}/50 target-like docs selected"


class TestPlanShape:
    def test_weights_broadcast_and_resample_topk(self, spark, model):
        docs = spark.createDataFrame(RAW, "doc_id string, text string")
        wt = dsir_weights(docs, model)
        plan = wt._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the ≤dim-row lr table
        assert "SortMergeJoin" not in plan  # the corpus never big-joins
        top = dsir_resample(wt, k=3)
        tplan = top._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in tplan  # k-heap, not a full sort
