"""ANN recall harness (similarity.ann_recall): recall@k of the lsh/ivf
approximate paths vs exact cosine, emitted as a DataFrame so recall
regressions become a correctness row (VERDICT r3 next-round #9)."""

import numpy as np
import pytest

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def probes(emb):
    rows = emb.orderBy("vec_id").limit(3).collect()
    return [[round(float(x), 6) for x in r["embedding"]] for r in rows]


@pytest.fixture(scope="module")
def centroids(emb):
    rows = emb.orderBy("vec_id").limit(8).collect()
    return np.round(
        np.array([r["embedding"] for r in rows], dtype=np.float64), 6
    )


class TestAnnRecall:
    def test_shape_and_bounds(self, emb, probes, centroids):
        from ocr_spark.operators.similarity import ann_recall

        rows = ann_recall(emb, probes, centroids=centroids, k=5).collect()
        assert len(rows) == 2 * len(probes)  # (lsh, ivf) × queries
        for r in rows:
            assert r["method"] in ("lsh", "ivf")
            assert 0.0 <= r["recall_at_k"] <= 1.0
            assert r["n_hits"] == round(r["recall_at_k"] * 5)

    def test_self_hit_floor(self, emb, probes, centroids):
        """Probes are corpus members: the query's own vector is exact top-1,
        shares its own LSH bucket, and lands in its own IVF probe list — so
        every (method, query) cell has n_hits >= 1."""
        from ocr_spark.operators.similarity import ann_recall

        rows = ann_recall(emb, probes, centroids=centroids, k=5).collect()
        assert all(r["n_hits"] >= 1 for r in rows)

    def test_lsh_only_without_centroids(self, emb, probes):
        from ocr_spark.operators.similarity import ann_recall

        rows = ann_recall(emb, probes, k=5).collect()
        assert {r["method"] for r in rows} == {"lsh"}

    def test_empty_probe_set_rejected(self, emb):
        from ocr_spark.operators.similarity import ann_recall

        with pytest.raises(ValueError, match="query_vecs"):
            ann_recall(emb, [])

    def test_sql_twin_matches(self, emb, probes, centroids, tmp_path):
        import duckdb

        from ocr_spark.operators.similarity import ann_recall, ann_recall_sql

        got = {
            (r["method"], r["query_id"]): (r["n_hits"], r["recall_at_k"])
            for r in ann_recall(emb, probes, centroids=centroids, k=5).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{EMB}')"
        )
        want = {
            (m, q): (n, rec)
            for m, q, n, rec in con.execute(
                ann_recall_sql(probes, centroids=centroids, k=5)
            ).fetchall()
        }
        assert got == want
