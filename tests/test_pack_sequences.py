"""pack_sequences: sharded greedy context-window packing.

Property suite (no SQL twin — greedy reset-scan isn't window-expressible):
exhaustiveness, token-budget respect, dense in-bucket sequence ids,
determinism, and the load-bearing one for a resumable 10^12-doc job —
layout independence (same output under different shuffle-partition
settings, because shard assignment is a pure function of doc_id)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.corpus_clean import pack_sequences, pack_stats

MAX = 50


def _docs(spark, n=200):
    # deterministic pseudo-random token counts 1..40 plus some oversize
    rows = [
        (f"d{i:04d}", "w " * (1 + (i * 7919) % 40))
        for i in range(n)
    ] + [(f"big{j}", "w " * (MAX + 10 + j)) for j in range(3)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def packed(spark):
    return pack_sequences(
        _docs(spark), max_tokens=MAX, n_buckets=8
    ).cache()


class TestPacking:
    def test_every_doc_exactly_once(self, spark, packed):
        n_in = _docs(spark).count()
        assert packed.count() == n_in
        assert packed.select("doc_id").distinct().count() == n_in

    def test_budget_respected_except_oversize_singletons(self, packed):
        per_seq = packed.groupBy("seq_id").agg(
            F.sum("n_tokens").alias("tot"),
            F.count("*").alias("n"),
            F.max(F.col("oversize").cast("int")).alias("over"),
        )
        # non-oversize sequences fit the budget
        assert per_seq.filter((F.col("over") == 0) & (F.col("tot") > MAX)).count() == 0
        # oversize docs are singletons
        assert per_seq.filter((F.col("over") == 1) & (F.col("n") > 1)).count() == 0

    def test_seq_ids_dense_and_positions_contiguous(self, packed):
        rows = packed.collect()
        by_bucket: dict[int, set[int]] = {}
        by_seq: dict[str, list[int]] = {}
        for r in rows:
            b, k = r["seq_id"].split("-")
            assert int(b) == r["bucket"]
            by_bucket.setdefault(r["bucket"], set()).add(int(k))
            by_seq.setdefault(r["seq_id"], []).append(r["seq_pos"])
        for ks in by_bucket.values():
            assert ks == set(range(len(ks)))  # dense from 0
        for poss in by_seq.values():
            assert sorted(poss) == list(range(len(poss)))

    def test_greedy_fill_in_id_order(self, packed):
        # within a bucket, doc order (by id) maps to nondecreasing seq k
        rows = sorted(
            packed.collect(), key=lambda r: (r["bucket"], r["doc_id"])
        )
        last = {}
        for r in rows:
            k = int(r["seq_id"].split("-")[1])
            assert k >= last.get(r["bucket"], 0)
            last[r["bucket"]] = k

    def test_layout_independent(self, spark, packed):
        before = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            again = pack_sequences(_docs(spark), max_tokens=MAX, n_buckets=8)
            diff = packed.exceptAll(again).count() + again.exceptAll(packed).count()
            assert diff == 0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", before)

    def test_stats_row(self, packed):
        row = pack_stats(packed, MAX).first()
        assert row["n_docs"] == packed.count()
        assert row["n_oversize"] == 3
        assert 0.5 < row["mean_fill"] <= 1.0

    def test_tokens_col_passthrough_and_null_floor(self, spark):
        docs = spark.createDataFrame(
            [("a", 7), ("b", None), ("c", 0)], ["doc_id", "bpe"]
        )
        out = pack_sequences(
            docs, max_tokens=10, n_buckets=1, tokens_col="bpe"
        ).collect()
        toks = {r["doc_id"]: r["n_tokens"] for r in out}
        assert toks == {"a": 7, "b": 1, "c": 1}

    def test_bad_budget_raises(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(_docs(spark), max_tokens=0)


def test_id_dtype_preserved(spark):
    """bigint doc_id must come back bigint — a hardcoded string schema
    silently retyped the join key (round-5 review finding)."""
    from ocr_spark.operators.corpus_clean import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f")], "doc_id long, text string"
    )
    packed = pack_sequences(docs, max_tokens=4)
    assert dict(packed.dtypes)["doc_id"] == "bigint"
    # and the natural next step — joining back on the id — works typed
    assert docs.join(packed, "doc_id").count() == 3


class TestMaterializeSequences:
    def _frames(self, spark):
        from ocr_spark.operators.corpus_clean import pack_sequences

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma"), (3, None), (4, "delta eps zeta")],
            "doc_id long, text string",
        )
        return docs, pack_sequences(docs, max_tokens=4, n_buckets=2)

    def test_twin_parity_and_order(self, spark):
        import duckdb

        from ocr_spark.operators.corpus_clean import (
            materialize_sequences,
            materialize_sequences_sql,
        )

        docs, packed = self._frames(spark)
        got = {
            r["seq_id"]: (r["text"], r["n_docs"], r["n_tokens"])
            for r in materialize_sequences(docs, packed).collect()
        }
        con = duckdb.connect()
        con.register("d", docs.toPandas())
        con.register("p", packed.toPandas())
        duck = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                materialize_sequences_sql("SELECT * FROM d", "SELECT * FROM p")
            ).fetchall()
        }
        assert got == duck
        # every doc's text appears exactly once across sequences
        all_text = "".join(t for t, _, _ in got.values())
        for w in ("alpha beta", "gamma", "delta eps zeta"):
            assert w in all_text
        # members join in seq_pos order with the separator
        multi = [t for t, nd, _ in got.values() if nd > 1]
        for t in multi:
            assert "<|endofdoc|>" in t

    def test_null_text_keeps_slot(self, spark):
        from ocr_spark.operators.corpus_clean import materialize_sequences

        docs, packed = self._frames(spark)
        out = materialize_sequences(docs, packed)
        # doc 3 (null text, floored to 1 token) still occupies a slot
        assert out.agg(F.sum("n_docs")).first()[0] == 4

    def test_token_totals_conserved(self, spark):
        from ocr_spark.operators.corpus_clean import materialize_sequences

        docs, packed = self._frames(spark)
        out = materialize_sequences(docs, packed)
        assert (
            out.agg(F.sum("n_tokens")).first()[0]
            == packed.agg(F.sum("n_tokens")).first()[0]
        )
