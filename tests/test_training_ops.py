"""Tests for the training-data pipeline operators: dedup family, similarity
search, text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

DOC_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
    (3, "completely different text about spark catalyst optimizer and shuffles"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (5, "El veloz zorro marrón salta sobre el perro perezoso junto al río"),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOC_ROWS, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    return df


def test_exact_dedup(spark, docs):
    from ocr_spark.operators.dedup import exact_dedup

    kept = exact_dedup(docs).select("doc_id").orderBy("doc_id").collect()
    ids = [r.doc_id for r in kept]
    assert 1 in ids and 4 not in ids  # doc 4 is an exact dup of doc 1
    assert set(ids) == {1, 2, 3, 5}


def test_jaccard_pairs_finds_near_dup(spark, docs):
    from ocr_spark.operators.dedup import jaccard_pairs

    pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs or (1, 4) in pairs
    assert pairs[(1, 4)] == 1.0  # exact dup → jaccard 1
    assert not any({a, b} == {1, 3} for a, b in pairs)


def test_minhash_lsh_finds_near_dup(spark, docs):
    from ocr_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert not any({a, b} == {1, 5} for a, b in pairs)


def test_simhash_near_pairs_matches_bruteforce(spark, docs):
    from ocr_spark.operators.dedup import simhash, simhash_near_pairs

    sig = {r.id: r.simhash for r in simhash(docs).collect()}
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 6
    }
    import pytest as _pytest

    # max_hamming=6 → 8-9-bit chunk keys: correct but scale-weak, and the
    # operator must SAY so (the guard added for the 100 TB parameterization)
    with _pytest.warns(RuntimeWarning, match="chunk keys"):
        pairs = simhash_near_pairs(docs, max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got == brute  # pigeonhole chunk join is lossless
    assert (1, 4) in got and got[(1, 4)] == 0


def test_dedup_clusters_small_graph(spark):
    from ocr_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
    )
    stats = {}
    got = {
        r.id: r.rep
        for r in dedup_clusters(pairs, stats=stats, algorithm="label").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
    assert stats["converged"] and stats["rounds"] >= 1


def test_dedup_clusters_long_chain_converges(spark):
    """A 12-node chain needs multiple propagation rounds — exercises the
    fixpoint loop, the localCheckpoint lineage truncation, and convergence
    detection beyond round 1."""
    from ocr_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(1, 12)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    stats = {}
    got = {
        r.id: r.rep
        for r in dedup_clusters(pairs, stats=stats, algorithm="label").collect()
    }
    assert got == {i: 1 for i in range(1, 13)}
    assert stats["converged"] and stats["rounds"] >= 3


def test_dedup_clusters_nonconvergence_warns(spark):
    from ocr_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(1, 12)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="no fixpoint"):
        labels = dedup_clusters(pairs, max_rounds=1, algorithm="label")
        labels.collect()


def _uf_reference(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Independent union-find oracle: id -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


class TestClustersStar:
    """algorithm='star' (large-star/small-star) must be label-identical to
    the propagation path, with rounds ~ log(n) instead of diameter."""

    def test_star_small_graph(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
        )
        stats = {}
        got = {
            r.id: r.rep
            for r in dedup_clusters(pairs, stats=stats, algorithm="star").collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
        assert stats["converged"] and stats["algorithm"] == "star"

    def test_star_matches_label_and_unionfind_on_random_graphs(self, spark):
        import random

        from ocr_spark.operators.dedup import dedup_clusters

        rng = random.Random(7)
        for trial in range(3):
            n = 60 + trial * 40
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
            want = _uf_reference(edges)
            star = {
                r.id: r.rep
                for r in dedup_clusters(pairs, algorithm="star").collect()
            }
            label = {
                r.id: r.rep for r in dedup_clusters(pairs).collect()
            }
            assert star == want == label

    def test_star_chain_converges_in_log_rounds(self, spark):
        """A 64-node chain (diameter 63): label propagation needs 63 rounds;
        star must finish in ~log2(64)+slack."""
        from ocr_spark.operators.dedup import dedup_clusters

        chain = [(i, i + 1) for i in range(64)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        stats = {}
        got = {
            r.id: r.rep
            for r in dedup_clusters(
                pairs, stats=stats, algorithm="star", max_rounds=12
            ).collect()
        }
        assert got == {i: 0 for i in range(65)}
        assert stats["converged"] and stats["rounds"] <= 12

    def test_star_nonconvergence_warns(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        chain = [(i, i + 1) for i in range(32)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        with pytest.warns(RuntimeWarning, match="still changing"):
            dedup_clusters(pairs, algorithm="star", max_rounds=1).collect()

    def test_bad_algorithm_rejected(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError, match="algorithm"):
            dedup_clusters(pairs, algorithm="bogus")

    def test_near_dedup_star_passthrough(self, spark):
        from ocr_spark.operators.dedup import near_dedup

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "the quick brown fox jumps over the lazy dog today"),
                (3, "entirely different content about query optimizers"),
            ],
            "doc_id long, text string",
        )
        stats = {}
        kept = {
            r.doc_id
            for r in near_dedup(
                df, method="simhash", cluster_algorithm="star",
                stats=stats, max_hamming=3,
            ).collect()
        }
        assert kept == {1, 3}
        assert stats["algorithm"] == "star"


class TestClustersAuto:
    """algorithm='auto' resolves small pair sets with a driver union-find
    (zero iterative jobs) and falls back to the distributed loop above the
    pair budget — identical labels everywhere."""

    def test_auto_small_uses_driver(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
        )
        stats = {}
        got = {r.id: r.rep for r in dedup_clusters(pairs, stats=stats).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
        assert stats["algorithm"] == "driver" and stats["rounds"] == 0
        assert stats["converged"]

    def test_auto_over_budget_falls_back_to_label(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        stats = {}
        got = {
            r.id: r.rep
            for r in dedup_clusters(
                pairs, stats=stats, driver_max_pairs=1
            ).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}
        assert stats["algorithm"] == "label"

    def test_driver_matches_distributed_on_random_graphs(self, spark):
        import random

        from ocr_spark.operators.dedup import dedup_clusters

        rng = random.Random(23)
        edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(50)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        want = _uf_reference(edges)
        auto = {r.id: r.rep for r in dedup_clusters(pairs).collect()}
        assert auto == want

    def test_empty_pairs(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert dedup_clusters(pairs).count() == 0

    def test_null_id_pair_dropped_not_hung(self, spark):
        """A null id in a pair must not reach the driver union-find: pandas
        would coerce the column to float64 and a NaN key spins find()
        forever (NaN != NaN). Nulls never equi-join in the distributed
        paths either, so dropping the pair is the consistent semantic."""
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (None, 3)], "id_a long, id_b long"
        )
        got = {r.id: r.rep for r in dedup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1}

    def test_string_ids_supported(self, spark):
        from ocr_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [("urlB", "urlA"), ("urlB", "urlC"), ("urlX", "urlY")],
            "id_a string, id_b string",
        )
        stats = {}
        got = {r.id: r.rep for r in dedup_clusters(pairs, stats=stats).collect()}
        assert got == {
            "urlA": "urlA", "urlB": "urlA", "urlC": "urlA",
            "urlX": "urlX", "urlY": "urlX",
        }
        assert stats["algorithm"] == "driver"


class TestCorpusPipeline:
    def test_stage_composition(self, spark):
        """Quality filter drops the junk doc; dedup drops the twin;
        decontamination drops the eval-overlapping doc; PII scrub rewrites
        the survivor's email."""
        from ocr_spark.operators.corpus import corpus_pipeline

        good = (
            "the quick brown fox jumps over the lazy dog and then walks "
            "away into the quiet evening with a friend from the village"
        )
        docs = spark.createDataFrame(
            [
                (1, good + " contact me at sam@example.com for details"),
                (2, good + " contact me at sam@example.com for details"),
                (3, "@@##$$ 0101 ++ ~~ !! ?? ## @@ 77 ** (( ))"),
                (4, "benchmark answer alpha beta gamma delta epsilon zeta "
                    "eta theta iota kappa question forty two exactly"),
                (5, "a completely unrelated clean document about compilers "
                    "and the structure of intermediate representations"),
            ],
            "doc_id long, text string",
        )
        eval_docs = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
            "doc_id long, text string",
        )
        out = corpus_pipeline(
            docs, eval_docs, min_quality=0.4, dedup_method="simhash",
            contamination_n=8, max_hamming=3,
        )
        rows = {r.doc_id: r.text for r in out.collect()}
        assert set(rows) == {1, 5}
        assert "sam@example.com" not in rows[1] and "<EMAIL>" in rows[1]

    def test_quality_v2_catches_repetitive_spam(self, spark):
        """A doc whose every line repeats passes the v1 ratio blend but
        fails the v2 Gopher-style composite (duplicate-line penalty)."""
        from ocr_spark.operators.corpus import corpus_pipeline

        spam_line = "the best offer for the best price in the town today"
        docs = spark.createDataFrame(
            [
                (1, "\n".join([spam_line] * 12)),
                (2, "a normal paragraph about the design of compilers and "
                    "the structure of their intermediate representations"),
            ],
            "doc_id long, text string",
        )
        # measured: spam v1=0.868 v2=0.735, normal v1=0.873 v2=0.912 —
        # 0.8 sits between the v2 scores but below both v1 scores
        v1 = {r.doc_id for r in corpus_pipeline(
            docs, None, min_quality=0.8, quality="v1", scrub=False
        ).collect()}
        v2 = {r.doc_id for r in corpus_pipeline(
            docs, None, min_quality=0.8, quality="v2", scrub=False
        ).collect()}
        assert 1 in v1          # ratio heuristics alone are fooled
        assert v2 == {2}        # repetition signals reject the spam
        with pytest.raises(ValueError, match="quality"):
            corpus_pipeline(docs, None, quality="v3")

    def test_no_eval_no_scrub_passthrough(self, spark):
        from ocr_spark.operators.corpus import corpus_pipeline

        docs = spark.createDataFrame(
            [(1, "mail me at a@b.co about the quick brown fox and the dog")],
            "doc_id long, text string",
        )
        out = corpus_pipeline(docs, None, min_quality=0.0, scrub=False)
        assert out.collect()[0].text.startswith("mail me at a@b.co")

    def test_embedding_method_requires_frame(self, spark):
        from ocr_spark.operators.dedup import near_dedup

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="embeddings"):
            near_dedup(docs, method="embedding")

    def test_embedding_method_drops_cosine_twins(self, spark):
        from ocr_spark.operators.dedup import near_dedup
        from ocr_spark.operators.similarity import EMB_DIM

        v = [1.0] + [0.0] * (EMB_DIM - 1)
        w = [0.0, 1.0] + [0.0] * (EMB_DIM - 2)
        emb = spark.createDataFrame(
            [(1, v), (2, v), (3, w)], "vec_id long, embedding array<float>"
        )
        docs = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        kept = {
            r.doc_id
            for r in near_dedup(
                docs, method="embedding", embeddings=emb,
                threshold=0.95, n_planes=4,
            ).collect()
        }
        assert kept == {1, 3}


def test_near_dedup_keeps_representatives(spark, docs):
    """End-to-end keep/drop: docs 1/2/4 are one near-dup cluster (doc 1 =
    min-id representative survives); docs 3 and 5 are singletons and pass
    through untouched."""
    from ocr_spark.operators.dedup import near_dedup

    # max_hamming=6 is deliberately scale-weak for this tiny fixture — the
    # warning is the operator doing its job, so assert it instead of leaking
    with pytest.warns(RuntimeWarning, match="chunk keys"):
        kept = {
            r.doc_id
            for r in near_dedup(docs, method="simhash", max_hamming=6).collect()
        }
    assert 1 in kept and 3 in kept and 5 in kept
    assert 4 not in kept  # exact dup of 1 (hamming 0)
    # jaccard method agrees on the exact dup
    kept_j = {r.doc_id for r in near_dedup(docs, method="jaccard", threshold=0.9).collect()}
    assert 4 not in kept_j and 1 in kept_j and {3, 5} <= kept_j
    # exact method short-circuits to fingerprint dedup
    kept_e = {r.doc_id for r in near_dedup(docs, method="exact").select("doc_id").collect()}
    assert kept_e == {1, 2, 3, 5}
    with pytest.raises(ValueError, match="unknown near-dedup method"):
        near_dedup(docs, method="nope")


def test_cosine_topk_matches_numpy(spark):
    from ocr_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    q = vecs[7].astype(float).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = [r.vec_id for r in cosine_topk(df, q, k=5).collect()]
    sims = vecs.astype(np.float64) @ np.array(q)
    sims = sims / (np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q))
    expected = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
    assert got[0] == 7  # self is most similar
    assert got == [int(x) for x in expected]


def test_lsh_topk_returns_bucket_subset_exact_scores(spark):
    from ocr_spark.operators.similarity import cosine_topk, lsh_topk

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((200, 64))
    q = vecs[11].tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    approx = {r.vec_id: r.cos_sim for r in lsh_topk(df, q, k=10).collect()}
    exact = {r.vec_id: r.cos_sim for r in cosine_topk(df, q, k=200).collect()}
    assert 11 in approx  # query's own vector shares its bucket
    for vid, s in approx.items():
        assert exact[vid] == pytest.approx(s, abs=2e-6)  # scores are exact cosines


def test_text_analysis_edges(spark):
    from ocr_spark.operators import text_analysis as TA

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "der die und das ist nicht mit haus")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TA.ws_token_count(F.col("text")).alias("ws"),
            TA.bpe_token_count(F.col("text")).alias("bpe"),
            TA.lang_id(F.col("text")).alias("lang"),
            TA.quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1].ws == 0 and rows[2].ws == 0 and rows[3].ws == 1
    assert rows[4].lang == "de"
    assert rows[3].lang == "und"
    assert 0.0 <= rows[4].q <= 1.0


def test_parquet_rowcount_footer_only(spark, tmp_path):
    """Plane derivation reads parquet footers, not the data (no extra scan
    job); filtered frames and non-parquet sources fall back cleanly."""
    from ocr_spark.operators.similarity import (
        derived_n_planes,
        embedding_near_dups,
        parquet_rowcount,
    )

    p = str(tmp_path / "emb.parquet")
    src = spark.range(300).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i), 100) AS double) / 50.0 - 1.0) AS embedding",
    )
    src.write.parquet(p)
    emb = spark.read.parquet(p)
    assert parquet_rowcount(emb) == 300
    assert parquet_rowcount(spark.range(3)) is None  # not file-backed
    # auto-derived (footer) equals explicitly-passed plane count
    auto = embedding_near_dups(emb, threshold=0.5).collect()
    explicit = embedding_near_dups(
        emb, threshold=0.5, n_planes=derived_n_planes(300)
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))


def test_repetition_signals_goldens(spark):
    """Hand-computed goldens for the Gopher/C4 repetition signals, through
    both the scalar functions and the staged frame (values must agree)."""
    from ocr_spark.operators import text_analysis as TA

    txt = "ab ab\nxx\nxx\nxx\nzz"  # 5 lines: 'ab ab','xx','xx','xx','zz'
    df = spark.createDataFrame([(1, txt), (2, ""), (3, "aaaa")], "doc_id long, text string")
    scal = df.select(
        "doc_id",
        TA.dup_line_fraction(F.col("text")).alias("dlf"),
        TA.dup_line_char_fraction(F.col("text")).alias("dlcf"),
        TA.top_ngram_char_fraction(F.col("text"), 2).alias("tbf"),
        TA.char_run_repetition(F.col("text")).alias("crr"),
    )
    rows = {r.doc_id: r for r in scal.collect()}
    # 5 lines, 3 distinct → 2/5 duplicated occurrences beyond first
    assert rows[1].dlf == pytest.approx(2 / 5)
    # duplicated-line chars: 'xx' ×3 → 6 of 13 total line chars
    assert rows[1].dlcf == pytest.approx(6 / 13)
    # top bigram 'xx xx' count 2, len 5; text len 17 → 10/17
    assert rows[1].tbf == pytest.approx(10 / 17)
    # adjacent repeats in 'ab ab\nxx\nxx\nxx\nzz': xx,xx,xx,zz → 4 of 16
    assert rows[1].crr == pytest.approx(4 / 16)
    assert (rows[2].dlf, rows[2].dlcf, rows[2].tbf, rows[2].crr) == (0, 0, 0, 0)
    assert rows[3].crr == pytest.approx(1.0)  # 'aaaa' → 3/3

    staged = {
        r.doc_id: r
        for r in TA.quality_repetition_select(df, F.col("text")).collect()
    }
    for i in (1, 2, 3):
        assert staged[i].dup_line_frac == rows[i].dlf
        assert staged[i].dup_line_char_frac == rows[i].dlcf
        assert staged[i].top_bigram_char_frac == rows[i].tbf
        assert staged[i].char_run_rep == rows[i].crr
        # blended composite reproduced from the parts
        q = df.where(F.col("doc_id") == i).select(
            TA.quality_score(F.col("text")).alias("q")
        ).collect()[0].q
        want = q * 0.6 + (1 - rows[i].dlf) * 0.15 + (1 - rows[i].tbf) * 0.15 + (1 - rows[i].crr) * 0.1
        assert staged[i].quality_v2 == pytest.approx(want)


def test_multimodal_plumbing(spark):
    from ocr_spark.fixtures import generate_docs
    from ocr_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        frame_sample,
        image_features,
        media_assets_df,
    )
    from ocr_spark.schema import DOC_SCHEMA

    docs = spark.createDataFrame(generate_docs(30), DOC_SCHEMA)
    assets = media_assets_df(docs)
    a = assets.collect()
    assert len(a) > 5
    assert all(r.content is not None and r.meta.n_bytes == 1024 for r in a)

    feats = image_features(assets).collect()
    assert len(feats) == len(a)
    ok = [f for f in feats if f.error is None]
    assert len(ok) == len(feats)
    assert all(f.width == 32 and f.height == 32 and f.n_bands >= 0 for f in ok)
    assert all(0.0 <= f.mean_intensity <= 255.0 for f in ok)

    # frame_sample now REALLY decodes: GIF payloads → per-frame rows;
    # non-GIF payloads → per-asset error envelope, never an exception
    from ocr_spark.operators.multimodal import video_assets_df
    from ocr_spark.sources.media import synth_gif_bytes

    from ocr_spark.operators.image_codecs import gif_decode_frames

    vids = video_assets_df(assets.limit(3).select("media_ref"))
    frames = frame_sample(vids, every_n=2).collect()
    assert frames and all(r.error is None for r in frames)
    for ref in {r.media_ref for r in frames}:
        n = len(gif_decode_frames(synth_gif_bytes(ref)))
        got = sorted(r.frame_idx for r in frames if r.media_ref == ref)
        assert got == list(range(0, n, 2))
        assert all(r.n_frames == n for r in frames if r.media_ref == ref)
    bad = frame_sample(assets.limit(2)).collect()  # raw payloads: not GIFs
    assert all(r.error is not None and r.frame_idx is None for r in bad)

    # corrupt inputs error cleanly (never hang); mp3 stays unimplemented
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_image(b"\x00" * 2048, codec="jpeg")
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00", codec="mp3")
    with pytest.raises(Exception):  # corrupt WAV → decode error, not a hang
        decode_audio(b"\x00\x01\x02")


def test_shingle_freq_cap_drops_viral_shingles(spark):
    from ocr_spark.operators.dedup import jaccard_pairs

    # every doc shares one viral phrase; cap=3 drops its shingles so the
    # unrelated docs don't pair up
    rows = [(i, f"common viral phrase here plus unique token{i} tail{i} end{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = jaccard_pairs(df, threshold=0.3, shingle_freq_cap=3).collect()
    assert pairs == []


def test_resize_images(spark):
    """Multimodal resize: block-mean downsample of assets to 8x8 uint8,
    matching the scalar kernel per asset."""
    import numpy as np

    from ocr_spark.fixtures import generate_docs
    from ocr_spark.operators.media_kernels import block_mean_resize, bytes_to_image
    from ocr_spark.operators.multimodal import media_assets_df, resize_images
    from ocr_spark.schema import DOC_SCHEMA
    from ocr_spark.sources.media import synth_media_bytes

    docs = spark.createDataFrame(generate_docs(40), DOC_SCHEMA)
    assets = media_assets_df(docs)
    out = {r.media_ref: r for r in resize_images(assets, 8, 8).collect()}
    assert out, "corpus should reference media assets"
    for ref, r in list(out.items())[:10]:
        assert r.error is None
        assert (r.height, r.width) == (8, 8)
        img = bytes_to_image(synth_media_bytes(ref))
        want = np.clip(np.rint(block_mean_resize(img, 8, 8)), 0, 255).astype(np.uint8)
        assert r.content == want.tobytes()


def test_pii_scrub_patterns(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.text_analysis import pii_scrub

    rows = [
        ("mail me at jane.doe+x@sub.example.org today", "mail me at <EMAIL> today"),
        ("server 192.168.10.255 up", "server <IP> up"),
        ("call +001 555-123 4567 now", "call +001 <PHONE> now"),
        ("no pii here", "no pii here"),
        ("two addresses a@b.io c@d.co", "two addresses <EMAIL> <EMAIL>"),
        # version strings must NOT be eaten by the IP rule (\b guards: the
        # word char before '1' blocks the boundary)
        ("release v1.2.3.4 shipped", "release v1.2.3.4 shipped"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r.s for r in df.select(pii_scrub(F.col("text")).alias("s")).collect()]
    assert got == [w for _, w in rows]


def test_contamination_finds_planted_overlap(spark):
    from ocr_spark.operators.dedup import contamination

    shared = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {shared} and some trailing content here"),
            (2, "completely unrelated text with different words entirely"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, f"benchmark prompt {shared} answer choices follow")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in contamination(corpus, eval_docs, n=8).collect()}
    assert set(got) == {1}
    # the shared 10-word run yields 3 distinct 8-grams
    assert got[1].n_shared_shingles == 3
    assert got[1].n_eval_docs == 1


def test_ngram_topk_counts_occurrences(spark):
    from ocr_spark.operators.dedup import ngram_topk

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "a b c"),
        ],
        "doc_id long, text string",
    )
    got = [(r.gram, r.n) for r in ngram_topk(docs, n=2, k=3).collect()]
    # "a b": 3 (doc1) + 1 (doc2) = 4 occurrences; "b a": 2; "b c": 1
    assert got == [("a b", 4), ("b a", 2), ("b c", 1)]


def test_embedding_near_dups_multi_table_recall(spark):
    """Multi-table LSH: T independent plane sets strictly widen the candidate
    set (union of collisions), so at a low similarity threshold the pair set
    is a superset of single-table and recall vs brute force increases."""
    import numpy as np

    from ocr_spark.operators.similarity import cosine, embedding_near_dups

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((300, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    thr = 0.15
    one = {(r.id_a, r.id_b) for r in
           embedding_near_dups(df, threshold=thr, n_planes=6, n_tables=1).collect()}
    three = {(r.id_a, r.id_b) for r in
             embedding_near_dups(df, threshold=thr, n_planes=6, n_tables=3).collect()}
    assert one <= three
    assert len(three) > len(one)
    # every reported pair is a true positive (exact cosine verified)
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for a, b in list(three)[:50]:
        cos = v[a] @ v[b] / (norms[a] * norms[b])
        assert round(cos, 6) >= thr


def _wav_bytes(freq=440.0, sr=8000, secs=0.25, channels=1):
    import io
    import wave

    import numpy as np

    t = np.arange(int(sr * secs)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    if channels == 2:
        x = np.column_stack([x, x // 2]).ravel().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_wav_decode_real_codec():
    import numpy as np

    from ocr_spark.operators.multimodal import decode_audio

    samples, sr = decode_audio(_wav_bytes())
    assert sr == 8000 and samples.shape == (2000, 1)
    assert samples.dtype == np.int16
    # 440 Hz sine for 0.25 s = 110 cycles → ~220 zero crossings (2/cycle)
    x = samples[:, 0].astype(float)
    zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
    assert 210 <= zc <= 230
    st2, _ = decode_audio(_wav_bytes(channels=2))
    assert st2.shape == (2000, 2)


def test_audio_features_pipeline(spark):
    import numpy as np

    from ocr_spark.operators.multimodal import ASSET_SCHEMA, audio_features

    rows = [
        ("wav://a", "audio", bytearray(_wav_bytes(freq=440.0)), {"width": None, "height": None, "n_bytes": 0, "codec": "wav"}),
        ("wav://b", "audio", bytearray(_wav_bytes(freq=880.0)), {"width": None, "height": None, "n_bytes": 0, "codec": "wav"}),
        ("wav://bad", "audio", bytearray(b"nope"), {"width": None, "height": None, "n_bytes": 0, "codec": "wav"}),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r.media_ref: r for r in audio_features(assets).collect()}
    a, b, bad = got["wav://a"], got["wav://b"], got["wav://bad"]
    assert a.error is None and b.error is None
    assert a.sample_rate == 8000 and a.n_channels == 1
    assert a.duration_sec == pytest.approx(0.25)
    assert a.rms == pytest.approx(20000 / 32768 / np.sqrt(2), rel=1e-2)
    # doubled frequency → roughly doubled zero-cross rate
    assert b.zero_cross_rate == pytest.approx(2 * a.zero_cross_rate, rel=0.05)
    assert bad.error is not None


# ---------------------------------------------------------------------------
# Bloom-prefilter decontamination
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fpp(spark):
    from ocr_spark.operators.dedup import bloom_build, bloom_prefilter

    rs = np.random.RandomState(7)
    members = [int(x) for x in rs.randint(0, 2**60, 4000)]
    sh = spark.createDataFrame([(x,) for x in members], "sh long")
    bloom = bloom_build(sh, n_items=len(members))
    # no false negatives, ever
    assert bloom_prefilter(sh, bloom).count() == len(members)
    # false-positive rate near theory: m/n≈13 bits/key, k=8 → ~0.2%
    probe = spark.createDataFrame(
        [(int(x),) for x in np.random.RandomState(8).randint(0, 2**60, 20000)],
        "sh long",
    )
    fpp = bloom_prefilter(probe, bloom).count() / 20000
    assert fpp < 0.01, fpp


def test_contamination_bloom_identical_to_exact(spark):
    """Bloom is a prefilter + exact verify: output must be bit-identical to
    `contamination` on the same split, false positives notwithstanding."""
    from ocr_spark.operators.dedup import contamination, contamination_bloom

    rs = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(40)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6 words → 3 shared 4-grams

    def mk(i):
        body = " ".join(rs.choice(vocab, 30))
        return f"{body} {shared}" if i % 5 == 0 else body

    rows = [(i, mk(i)) for i in range(1, 120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.where(F.col("doc_id") % 9 != 0)
    ev = df.where(F.col("doc_id") % 9 == 0)
    exact = {tuple(r) for r in contamination(corpus, ev, n=4).collect()}
    bloom = {tuple(r) for r in contamination_bloom(corpus, ev, n=4).collect()}
    assert exact and bloom == exact


def test_contamination_bloom_empty_eval(spark):
    from ocr_spark.operators.dedup import contamination_bloom

    corpus = spark.createDataFrame(
        [(1, "some corpus words here repeated words here")], "doc_id long, text string"
    )
    ev = corpus.where(F.lit(False))
    assert contamination_bloom(corpus, ev, n=2).count() == 0


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_corpus(spark):
    rs = np.random.RandomState(3)
    base = rs.randn(8, 32)  # 8 latent clusters
    X = np.repeat(base, 25, axis=0) + 0.05 * rs.randn(200, 32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    return df, X


def test_pq_codes_exact_on_codewords(pq_corpus):
    """A vector equal to one codeword per subspace encodes to exactly those
    codes (zero quantization error)."""
    from ocr_spark.operators.similarity import pq_codes, pq_train

    _, X = pq_corpus
    books = pq_train(X, m_sub=4, n_codes=8)
    probe = np.concatenate([books[m][3] for m in range(4)])[None, :]
    assert (pq_codes(probe, books) == 3).all()


def test_ivfpq_topk_recall_and_determinism(spark):
    """Recall is only meaningful when the true neighbors are separable: 10
    planted near-duplicates of the query against 190 random vectors (cos
    ~0.99 vs ~0.2) — PQ quantization error is far below that gap, so the
    approximate top-10 must recover most of the planted set."""
    from ocr_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
        pq_train_residual,
    )

    rs = np.random.RandomState(5)
    q = rs.randn(32)
    planted = q[None, :] + 0.08 * rs.randn(10, 32)
    X = np.vstack([rs.randn(190, 32), planted])  # planted ids 190..199
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    centroids = np.vstack([q, rs.randn(7, 32)]).round(6)
    books = pq_train_residual(X, centroids, m_sub=4, n_codes=32)
    qv = [float(v) for v in q.round(6)]
    got = [(r.vec_id, r.pq_score) for r in
           ivfpq_topk(df, qv, centroids, books, k=10, nprobe=8).collect()]
    again = [(r.vec_id, r.pq_score) for r in
             ivfpq_topk(df, qv, centroids, books, k=10, nprobe=8).collect()]
    assert got == again  # deterministic
    exact = {r.vec_id for r in cosine_topk(df, qv, k=10).collect()}
    recall = len(exact & {i for i, _ in got}) / 10
    assert recall >= 0.8, recall


def test_ivfpq_probe_pruning(spark, pq_corpus):
    """nprobe=1 must only return vectors coarse-assigned to the query's own
    list — the work-pruning contract."""
    from ocr_spark.operators.similarity import (
        ivf_assign,
        ivfpq_topk,
        pq_train_residual,
    )

    df, X = pq_corpus
    centroids = X[::25].round(6)
    books = pq_train_residual(X, centroids, m_sub=4, n_codes=8)
    qv = [float(v) for v in X[7].round(6)]
    got = {r.vec_id for r in ivfpq_topk(df, qv, centroids, books, k=50, nprobe=1).collect()}
    from pyspark.sql import functions as SF
    lists = {
        r.vec_id: r.lst
        for r in df.select(
            "vec_id",
            ivf_assign(SF.col("embedding").cast("array<double>"), centroids).alias("lst"),
        ).collect()
    }
    target = {lists[i] for i in got}
    assert len(target) == 1


# ---------------------------------------------------------------------------
# image perceptual hash (pHash) near-dup family
# ---------------------------------------------------------------------------


def test_phash_separates_groups_and_survives_noise():
    from ocr_spark.operators.media_kernels import bytes_to_image
    from ocr_spark.operators.multimodal import phash64
    from ocr_spark.sources.media import synth_similar_image_bytes

    h = {
        i: phash64(bytes_to_image(synth_similar_image_bytes(f"img://{i}")))
        for i in range(16)
    }

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    within = [
        ham(h[i], h[j])
        for g in range(4)
        for i in range(g * 4, g * 4 + 4)
        for j in range(i + 1, g * 4 + 4)
    ]
    cross = [ham(h[i], h[j]) for i in range(4) for j in range(4, 16)]
    assert max(within) <= 8 and min(cross) >= 16


def test_image_phash_error_envelope(spark):
    from ocr_spark.operators.multimodal import image_phash

    assets = spark.createDataFrame(
        [
            ("img://ok", "image", bytes(1024), {"codec": "synthetic"}),
            ("img://bad", "image", b"\x01\x02", {"codec": "synthetic"}),
        ],
        "media_ref string, media_type string, content binary, meta map<string,string>",
    )
    got = {r.media_ref: r for r in image_phash(assets).collect()}
    assert got["img://ok"].error is None and got["img://ok"].phash is not None
    assert got["img://bad"].phash is None and got["img://bad"].error


def test_image_near_dups_pigeonhole_matches_bruteforce(spark):
    from ocr_spark.operators.dedup import simhash_near_pairs
    from ocr_spark.operators.media_kernels import bytes_to_image
    from ocr_spark.operators.multimodal import image_phash, phash64, similar_image_assets_df
    from ocr_spark.sources.media import synth_similar_image_bytes

    refs = spark.createDataFrame(
        [(f"img://{i}",) for i in range(24)], "media_ref string"
    )
    sig = image_phash(similar_image_assets_df(refs)).select(
        F.col("media_ref").alias("id"), F.col("phash").alias("simhash")
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(None, sig=sig, bits=64, max_hamming=4).collect()
    }
    h = {
        f"img://{i}": phash64(bytes_to_image(synth_similar_image_bytes(f"img://{i}")))
        for i in range(24)
    }
    brute = {
        (a, b): bin((h[a] ^ h[b]) & (2**64 - 1)).count("1")
        for a in h
        for b in h
        if a < b and bin((h[a] ^ h[b]) & (2**64 - 1)).count("1") <= 4
    }
    assert got == brute and brute  # lossless AND non-empty (groups planted)
    assert all(a.split("//")[1] != b.split("//")[1] for a, b in got)


def test_image_phash_real_codec_payload(spark):
    """pHash through the REAL codec dispatch: the same image as raw
    synthetic bytes and as an encoded PNG must hash identically (decode is
    sniffed from magic bytes)."""
    from ocr_spark.operators.cloud_engine import png_encode
    from ocr_spark.operators.multimodal import image_phash
    from ocr_spark.sources.media import synth_media_bytes

    raw = synth_media_bytes("img://real-codec-probe")
    import numpy as np

    gray = np.frombuffer(raw, dtype=np.uint8).reshape(32, 32)
    png = png_encode(gray)
    assets = spark.createDataFrame(
        [
            ("raw", "image", raw, {"codec": "synthetic"}),
            ("png", "image", png, {"codec": "auto"}),
        ],
        "media_ref string, media_type string, content binary, meta map<string,string>",
    )
    got = {r.media_ref: r.phash for r in image_phash(assets).collect()}
    assert got["raw"] == got["png"] and got["raw"] is not None


# ---------------------------------------------------------------------------
# web-junk signals (round-5 s10)
# ---------------------------------------------------------------------------


class TestJunkFlags:
    TEXTS = [
        (0, "Lorem Ipsum dolor sit amet"),
        (1, "Please enable JavaScript to view this site. We use cookies."),
        (2, "Subscribe to continue reading this article"),
        (3, "This page is Under Construction — coming SOON"),
        (4, "perfectly normal text about chemistry"),
        (5, None),
        (6, ""),
    ]

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd
        from pyspark.sql import functions as F

        from ocr_spark.operators.text_analysis import junk_flags, junk_flags_sql

        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        got = {
            r.doc_id: (tuple(r.flags) if r.flags is not None else None)
            for r in df.select(
                "doc_id", junk_flags(F.col("text")).alias("flags")
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame({"doc_id": [x[0] for x in self.TEXTS],
                               "text": [x[1] for x in self.TEXTS]})
        )
        orc = {
            r[0]: (tuple(r[1]) if r[1] is not None else None)
            for r in con.execute(
                f"SELECT doc_id, {junk_flags_sql('text')} FROM t"
            ).fetchall()
        }
        assert got == orc
        assert got[0] == ("lorem_ipsum",)
        assert got[1] == ("javascript_wall", "cookie_notice")
        assert got[4] == ()

    def test_null_semantics(self, spark):
        from pyspark.sql import functions as F

        from ocr_spark.operators.text_analysis import junk_flags

        df = spark.createDataFrame([(5, None)], "doc_id long, text string")
        row = df.select(junk_flags(F.col("text")).alias("f")).first()
        # null text -> all branch whens null -> filtered to empty array
        assert row.f == []


class TestCompressionRatio:
    def test_golden_vs_direct_zlib(self, spark):
        import zlib

        from ocr_spark.operators.text_analysis import compression_ratio_df

        texts = [
            (0, "abc " * 500),                     # highly compressible
            (1, "The quick brown fox. " * 3),
            (2, "x9$k#pQ!fZ@w%vR^mT&yU*ba_c-d=e"),  # junk-ish
            (3, None),
            (4, ""),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r.doc_id: r for r in compression_ratio_df(df).collect()}
        for did, t in texts:
            if not t:
                assert got[did].ratio_ppm is None
                assert got[did].n_bytes is None
                continue
            raw = t.encode("utf-8")
            comp = zlib.compress(raw, 6)
            assert got[did].n_bytes == len(raw)
            assert got[did].n_compressed == len(comp)
            assert got[did].ratio_ppm == len(comp) * 1_000_000 // len(raw)
        # template text compresses far better than junk
        assert got[0].ratio_ppm < got[2].ratio_ppm

    def test_plan_shuffle_free(self, spark):
        from ocr_spark.operators.text_analysis import compression_ratio_df

        df = spark.createDataFrame([(0, "hi")], "doc_id long, text string")
        plan = (
            compression_ratio_df(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestTermBlocklist:
    """C4-style banned-term filter — regex + token paths, exact twins."""

    TEXTS = [
        (0, "a perfectly clean page about chemistry"),
        (1, "this page mentions gambling once"),
        (2, "GAMBLING in caps and casino bonus too"),
        (3, "nongambling compound words must NOT match"),
        (4, "casino bonus is a phrase term"),       # phrase match
        (5, "casino alone is not blocked"),
        (6, None),
        (7, ""),
        (8, "prefix overlap: gamble vs gambling vs gambl"),
    ]
    TERMS = ["gambling", "casino bonus", "gamble"]

    def _frames(self, spark):
        import duckdb
        import pandas as pd

        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        con = duckdb.connect()
        con.register(
            "t",
            pd.DataFrame(
                {"doc_id": [x[0] for x in self.TEXTS],
                 "text": [x[1] for x in self.TEXTS]}
            ),
        )
        return df, con

    def test_regex_twin_parity(self, spark):
        from ocr_spark.operators.text_analysis import (
            term_blocklist_df,
            term_blocklist_sql,
        )

        df, con = self._frames(spark)
        got = {
            r.doc_id: (r.blocked, r.matched_term)
            for r in term_blocklist_df(df, self.TERMS).collect()
        }
        orc = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                term_blocklist_sql(self.TERMS, table="t")
            ).fetchall()
        }
        assert got == orc
        assert got[0] == (False, None)
        assert got[1] == (True, "gambling")
        assert got[2] == (True, "gambling")           # lower() both sides
        assert got[3] == (False, None)                # \b guards compounds
        assert got[4] == (True, "casino bonus")       # phrase
        assert got[5] == (False, None)
        assert got[6] == (False, None)                # null text kept
        assert got[7] == (False, None)
        # leftmost-longest agreement: 'gamble' appears before 'gambling'
        assert got[8] == (True, "gamble")

    def test_filter_twin_parity(self, spark):
        from ocr_spark.operators.text_analysis import (
            term_blocklist_filter,
            term_blocklist_filter_sql,
        )

        df, con = self._frames(spark)
        kept = sorted(
            r.doc_id for r in term_blocklist_filter(df, self.TERMS).collect()
        )
        orc = sorted(
            r[0]
            for r in con.execute(
                term_blocklist_filter_sql(self.TERMS, table="t")
            ).fetchall()
        )
        assert kept == orc == [0, 3, 5, 6, 7]

    def test_token_twin_parity(self, spark):
        from ocr_spark.operators.text_analysis import (
            term_blocklist_token_df,
            term_blocklist_token_sql,
        )

        df, con = self._frames(spark)
        terms = ["gambling", "gamble"]  # token path: single words only
        got = {
            r.doc_id: r.blocked
            for r in term_blocklist_token_df(df, terms).collect()
        }
        orc = {
            r[0]: r[1]
            for r in con.execute(
                term_blocklist_token_sql(terms, table="t")
            ).fetchall()
        }
        assert got == orc
        assert got[1] and got[2] and got[8]
        assert not got[0] and not got[3] and not got[6] and not got[7]

    def test_term_validation(self):
        import pytest as _pt

        from ocr_spark.operators.text_analysis import (
            _blocklist_pattern,
            term_blocklist_token_sql,
        )

        with _pt.raises(ValueError, match="empty"):
            _blocklist_pattern([])
        with _pt.raises(ValueError, match="lowercase"):
            _blocklist_pattern(["Upper"])
        with _pt.raises(ValueError, match="lowercase"):
            _blocklist_pattern(["regex.meta*"])
        with _pt.raises(ValueError, match="single-word"):
            from ocr_spark.operators.text_analysis import (
                term_blocklist_token_df,
            )
            # validation fires before any Spark work → df can be None
            term_blocklist_token_df(None, ["two words"])

    def test_plan_is_codegen_no_shuffle(self, spark):
        from ocr_spark.operators.text_analysis import term_blocklist_df

        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        plan = term_blocklist_df(df, self.TERMS)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
