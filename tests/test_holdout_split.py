"""Leakage-safe holdout split (corpus_clean.holdout_split) + DuckDB twin."""

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.corpus_clean import holdout_split, holdout_split_sql
from ocr_spark.operators.dedup import dedup_clusters


def _rows(n=600, seed=5):
    rng = random.Random(seed)
    rows = [(f"d{i:04d}", f"text of document {i} " * 3) for i in range(n)]
    # near-dup pairs: every 10th doc has a twin (and a few chains)
    pairs = [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(0, n - 1, 10)]
    pairs += [(f"d{i + 1:04d}", f"d{i + 2:04d}") for i in range(0, n - 2, 50)]
    rng.shuffle(pairs)
    return rows, pairs


@pytest.fixture(scope="module")
def frames(spark):
    rows, pairs = _rows()
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string")
    clusters = dedup_clusters(pdf)
    return docs, clusters, rows, pairs


class TestHoldoutSplit:
    def test_no_clique_straddles_the_split(self, spark, frames):
        docs, clusters, _, pairs = frames
        out = holdout_split(docs, clusters, eval_ppm=200_000)
        side = {r["doc_id"]: r["split"] for r in out.collect()}
        for a, b in pairs:
            assert side[a] == side[b], (a, b)  # the leakage property

    def test_docid_keyed_split_WOULD_leak(self, spark, frames):
        # the control: routing by doc_id (clusters=None) does split pairs —
        # proving the operator exists for a reason
        docs, _, _, pairs = frames
        out = holdout_split(docs, None, eval_ppm=200_000)
        side = {r["doc_id"]: r["split"] for r in out.collect()}
        assert any(side[a] != side[b] for a, b in pairs)

    def test_eval_share_tracks_ppm(self, spark, frames):
        docs, clusters, rows, _ = frames
        out = holdout_split(docs, clusters, eval_ppm=250_000).collect()
        share = sum(r["split"] == "eval" for r in out) / len(rows)
        assert 0.15 < share < 0.35

    def test_deterministic_under_repartition(self, spark, frames):
        docs, clusters, _, _ = frames
        a = sorted(
            (r["doc_id"], r["split"])
            for r in holdout_split(docs.repartition(1), clusters).collect()
        )
        b = sorted(
            (r["doc_id"], r["split"])
            for r in holdout_split(
                docs.repartition(17).sort(F.desc("doc_id")), clusters
            ).collect()
        )
        assert a == b

    def test_ppm_bounds(self, spark, frames):
        docs, clusters, rows, _ = frames
        assert (
            holdout_split(docs, clusters, eval_ppm=0)
            .where(F.col("split") == "eval")
            .count()
            == 0
        )
        assert (
            holdout_split(docs, clusters, eval_ppm=1_000_000)
            .where(F.col("split") == "train")
            .count()
            == 0
        )
        with pytest.raises(ValueError):
            holdout_split(docs, clusters, eval_ppm=-1)
        with pytest.raises(ValueError):
            holdout_split_sql("SELECT 1", eval_ppm=2_000_000)


class TestHoldoutSplitTwin:
    def _twin(self, spark, tmp_path, docs_rows, cluster_rows, **kw):
        import duckdb

        docs = spark.createDataFrame(docs_rows, "doc_id string, text string")
        docs.toPandas().to_parquet(str(tmp_path / "docs.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/docs.parquet'"
        )
        if cluster_rows is not None:
            clusters = spark.createDataFrame(cluster_rows, "id string, rep string")
            clusters.toPandas().to_parquet(str(tmp_path / "cl.parquet"))
            cl_sql = f"SELECT * FROM '{tmp_path}/cl.parquet'"
        else:
            clusters, cl_sql = None, None
        nn = lambda t: tuple("" if x is None else x for x in t)
        got = sorted(
            (
                (r["doc_id"], r["split_key"], r["split"])
                for r in holdout_split(docs, clusters, **kw).collect()
            ),
            key=nn,
        )
        want = sorted(
            (
                (r[0], r[1], r[2])
                for r in con.execute(
                    holdout_split_sql(
                        "SELECT * FROM documents",
                        cl_sql,
                        cols="d.doc_id",
                        **kw,
                    )
                ).fetchall()
            ),
            key=nn,
        )
        assert got == want

    def test_parity_with_clusters(self, spark, tmp_path):
        rows, pairs = _rows(n=200)
        cl = [(a, min(a, b)) for a, b in pairs] + [
            (b, min(a, b)) for a, b in pairs
        ]
        self._twin(spark, tmp_path, rows, cl, eval_ppm=300_000, salt="tw'1")

    def test_parity_without_clusters(self, spark, tmp_path):
        rows, _ = _rows(n=150)
        self._twin(spark, tmp_path, rows, None, eval_ppm=42_000)

    def test_parity_null_id_and_null_rep(self, spark, tmp_path):
        rows = [("a", "t"), (None, "u"), ("b", "v"), ("c", "w")]
        cl = [("b", None), ("c", "a")]  # a null rep must coalesce to the id
        self._twin(spark, tmp_path, rows, cl, eval_ppm=500_000)
