"""Repeat-factor upsampling, deterministic shuffle order, approx-quantile
split thresholds (session-3 additions to corpus_clean.py / ngram_lm.py)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.corpus_clean import (
    repeat_factors,
    shuffle_key,
    shuffle_key_sql,
    upsample_corpus,
    upsample_corpus_sql,
)


def _docs_rows(n=400, seed=3):
    rng = random.Random(seed)
    langs = ["en"] * 70 + ["de"] * 20 + ["sw"] * 9 + ["yo"]
    return [
        (i, f"doc {i} words", rng.choice(langs)) for i in range(n)
    ]


@pytest.fixture(scope="module")
def docs_pq(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _docs_rows()
    p = str(tmp_path_factory.mktemp("upsample") / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        ),
        p,
    )
    return p


class TestRepeatFactors:
    def test_t1_is_uniform_and_t0_equalizes(self):
        counts = {"en": 800, "de": 150, "sw": 50}
        f1 = repeat_factors(counts, 2000, 1.0)
        # T=1: every stratum gets the same rate (2000/1000 = 2.0)
        assert set(f1.values()) == {2_000_000}
        f0 = repeat_factors(counts, 900, 0.0)
        # T=0: equal share per stratum → per-doc factor ∝ 1/count
        assert f0["sw"] == 16 * f0["en"]  # 800/50
        assert f0["sw"] > 1_000_000 > f0["en"]  # sw upsampled, en down

    def test_null_stratum_dropped_and_guards(self):
        f = repeat_factors({"en": 10, None: 5}, 100, 0.7)
        assert set(f) == {"en"}
        with pytest.raises(ValueError, match="positive"):
            repeat_factors({"en": 10}, 0, 0.7)
        with pytest.raises(ValueError, match=">= 0"):
            repeat_factors({"en": 10}, 5, -1)
        with pytest.raises(ValueError, match="2\\^53"):
            repeat_factors({"en": 1}, 1 << 55, 1.0)


class TestUpsampleCorpus:
    def test_twin_parity(self, spark, docs_pq):
        import duckdb

        docs = spark.read.parquet(docs_pq)
        cnt = {
            r[0]: int(r[1]) for r in docs.groupBy("lang").count().collect()
        }
        factors = repeat_factors(cnt, 1200, 0.5)
        got = sorted(
            (r.doc_id, r.stratum, r.copy)
            for r in upsample_corpus(docs, 1200, 0.5, factors=factors).collect()
        )
        con = duckdb.connect()
        orc = sorted(
            tuple(r)
            for r in con.execute(
                upsample_corpus_sql(
                    f"SELECT * FROM read_parquet('{docs_pq}')", factors
                )
            ).fetchall()
        )
        assert got == orc
        # expected volume within Bernoulli noise of the target
        assert abs(len(got) - 1200) < 120

    def test_copy_semantics(self, spark, docs_pq):
        docs = spark.read.parquet(docs_pq)
        out = upsample_corpus(docs, 1200, 0.5).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.copy)
        for copies in by_doc.values():
            assert sorted(copies) == list(range(len(copies)))  # dense 0..k-1
        # low-resource stratum really upsampled: yo docs (count≈4) get >1 copy
        langs = {r[2] for r in _docs_rows()}
        assert langs == {"en", "de", "sw", "yo"}
        yo_ids = [r[0] for r in _docs_rows() if r[2] == "yo"]
        yo_copies = [len(by_doc.get(i, [])) for i in yo_ids]
        assert max(yo_copies, default=0) >= 2

    def test_deterministic_and_empty_factors(self, spark, docs_pq):
        docs = spark.read.parquet(docs_pq)
        a = sorted(
            (r.doc_id, r.copy)
            for r in upsample_corpus(docs, 800, 0.7).collect()
        )
        b = sorted(
            (r.doc_id, r.copy)
            for r in upsample_corpus(docs.repartition(7), 800, 0.7).collect()
        )
        assert a == b
        empty = upsample_corpus(docs, 800, 0.7, factors={})
        assert empty.count() == 0
        assert [f.name for f in empty.schema.fields] == [
            "doc_id",
            "stratum",
            "copy",
        ]


class TestShuffleKey:
    def test_twin_and_interleaving(self, spark, docs_pq):
        import duckdb

        docs = spark.read.parquet(docs_pq)
        got = [
            r.doc_id
            for r in docs.select("doc_id", shuffle_key("ep1").alias("sk"))
            .orderBy("sk", "doc_id")
            .collect()
        ]
        con = duckdb.connect()
        orc = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM read_parquet('{docs_pq}') "
                f"ORDER BY {shuffle_key_sql('ep1')}, doc_id"
            ).fetchall()
        ]
        assert got == orc
        assert got != sorted(got)  # actually shuffled
        # different epoch seed → different order
        got2 = [
            r.doc_id
            for r in docs.select("doc_id", shuffle_key("ep2").alias("sk"))
            .orderBy("sk", "doc_id")
            .collect()
        ]
        assert got != got2

    def test_copy_col_separates_duplicates(self, spark):
        rows = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
        df = spark.createDataFrame(rows, "doc_id bigint, copy bigint")
        order = [
            (r.doc_id, r.copy)
            for r in df.select(
                "doc_id", "copy", shuffle_key("s", copy_col="copy").alias("sk")
            )
            .orderBy("sk")
            .collect()
        ]
        # the three copies of doc 1 must not be adjacent as a block
        pos = [i for i, (d, _) in enumerate(order) if d == 1]
        assert pos != [pos[0], pos[0] + 1, pos[0] + 2]


class TestApproxThresholds:
    def test_approx_close_to_exact(self, spark):
        from ocr_spark.operators.ngram_lm import (
            perplexity_split,
            perplexity_split_thresholds,
        )

        rng = random.Random(17)
        rows = [
            (i, "en" if i % 3 else "de", int(rng.gauss(0, 200_000)))
            for i in range(3000)
        ]
        scored = spark.createDataFrame(
            rows, "doc_id bigint, lang string, avg_lp_micronat long"
        )
        exact = perplexity_split_thresholds(scored)
        approx = perplexity_split_thresholds(scored, approx_accuracy=10_000)
        assert set(exact) == set(approx) == {"en", "de"}
        # bucket drift bound: re-bucket with both threshold sets; the docs
        # that change bucket are within the sketch's rank-error budget
        b_ex = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_split(scored, exact).collect()
        }
        b_ap = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_split(scored, approx).collect()
        }
        drift = sum(1 for k in b_ex if b_ex[k] != b_ap[k])
        assert drift <= math.ceil(len(b_ex) * 0.01)
        # guard
        with pytest.raises(ValueError, match=">= 1"):
            perplexity_split_thresholds(scored, approx_accuracy=0)


class TestDegenerateTwins:
    """The ADVICE-class inputs: null ids, null strata, quoted strata."""

    def test_null_id_and_null_stratum_twin(self, spark, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / "degen.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, None, 3, 4], type=pa.int64()),
                    "text": ["a", "b", "c", None],
                    "lang": ["en", "en", None, "o'brien"],
                }
            ),
            p,
        )
        docs = spark.read.parquet(p)
        factors = {"en": 2_500_000, "o'brien": 1_200_000}
        got = sorted(
            (r.doc_id, r.stratum, r.copy)
            for r in upsample_corpus(docs, 10, factors=factors).collect()
        )
        con = duckdb.connect()
        orc = sorted(
            tuple(r)
            for r in con.execute(
                upsample_corpus_sql(
                    f"SELECT * FROM read_parquet('{p}')", factors
                )
            ).fetchall()
        )
        assert got == orc
        ids = {g[0] for g in got}
        assert None not in ids  # null-id docs emit nothing in BOTH engines
        assert 3 not in ids  # null stratum → 0 copies
        assert 1 in ids and got[0][2] == 0  # en doc got its floor copies

    def test_null_id_shuffle_key_twin(self, spark, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        p = str(tmp_path / "degen2.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array([2, None, 9, 4], type=pa.int64())}), p
        )
        docs = spark.read.parquet(p)
        got = [
            r.doc_id
            for r in docs.select("doc_id", shuffle_key("e").alias("sk"))
            .orderBy("sk", F.col("doc_id").asc_nulls_first())
            .collect()
        ]
        con = duckdb.connect()
        orc = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM read_parquet('{p}') "
                f"ORDER BY {shuffle_key_sql('e')}, doc_id ASC NULLS FIRST"
            ).fetchall()
        ]
        assert got == orc  # non-null keys → engines agree on the order
