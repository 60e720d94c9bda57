"""Merges-table BPE token counting (functions/bpe.py): trainer determinism,
encode-formulation equivalence (min-rank loop == apply-merges-in-order), the
in-repo fixture's reproducibility, and the Spark operator contract."""

import random
import string

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.bpe import (
    MERGES_PATH,
    bpe_encode_len,
    bpe_train,
    load_merges,
    token_counts_bpe,
)


def _ref_len(word, merges):
    """Textbook formulation: each merge applied in training order, one
    left-to-right pass (the oracle's independent reference)."""
    parts = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return len(parts)


class TestTrainer:
    def test_deterministic(self):
        corpus = ["the cat sat on the mat", "the bat and the rat"]
        assert bpe_train(corpus, 20) == bpe_train(corpus, 20)

    def test_learns_frequent_pairs_first(self):
        merges = bpe_train(["ababab ababab abab"], 3)
        assert merges[0] == ("a", "b")

    def test_stops_when_exhausted(self):
        # single repeated word: merges stop once the word is one symbol
        merges = bpe_train(["aa aa aa"], 10)
        assert merges == [("a", "a")]

    def test_fixture_reproducible(self):
        """ocr_spark/resources/bpe_merges.txt == retraining on the seed
        (catches fixture drift without regenerating)."""
        from scripts.gen_bpe_merges import SEED_TEXT

        assert load_merges(MERGES_PATH) == bpe_train([SEED_TEXT], 256)


class TestEncodeEquivalence:
    def test_min_rank_equals_training_order(self):
        """Property: the engine's min-rank loop and the oracle's
        apply-in-order pass agree on random words (merging a pair can only
        create higher-rank pairs, so the orders coincide)."""
        merges = load_merges(MERGES_PATH)
        ranks = {p: i for i, p in enumerate(merges)}
        rng = random.Random(42)
        for _ in range(300):
            w = "".join(
                rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 12))
            )
            assert bpe_encode_len(w, ranks) == _ref_len(w, merges), w

    def test_overlapping_occurrences_left_to_right(self):
        ranks = {("a", "a"): 0}
        assert bpe_encode_len("aaa", ranks) == 2  # [aa, a]
        assert bpe_encode_len("aaaa", ranks) == 2  # [aa, aa]

    def test_memo_hits(self):
        ranks = {("a", "b"): 0}
        memo = {}
        assert bpe_encode_len("ab", ranks, memo) == 1
        memo["ab"] = 99  # poison: a second call must come from the memo
        assert bpe_encode_len("ab", ranks, memo) == 99


class TestOperator:
    def test_counts_and_null_empty(self, spark):
        df = spark.createDataFrame(
            [(1, "the document"), (2, ""), (3, None), (4, "zzqx!")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["n_tokens_bpe"]
            for r in token_counts_bpe(df).collect()
        }
        merges = load_merges(MERGES_PATH)
        ranks = {p: i for i, p in enumerate(merges)}
        assert rows[1] == bpe_encode_len("the", ranks) + bpe_encode_len(
            "document", ranks
        )
        assert rows[2] == 0 and rows[3] == 0
        # '!' is its own pre-token
        assert rows[4] == bpe_encode_len("zzqx", ranks) + 1

    def test_fewer_tokens_than_chars_on_real_text(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = (
            token_counts_bpe(docs)
            .join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
            .where(F.col("n") > 0)
        )
        bad = out.where(F.col("n_tokens_bpe") > F.col("n")).count()
        assert bad == 0
        # and the merges actually bite: tokens << chars on average
        agg = out.agg(
            F.sum("n_tokens_bpe").alias("t"), F.sum("n").alias("c")
        ).first()
        assert agg["t"] < 0.6 * agg["c"]


class TestDistributedTraining:
    """bpe_train_df: the distributed word-count front end must reproduce
    the pure-Python trainer exactly, and the train->count->pack chain must
    run end-to-end from a documents frame alone."""

    TEXTS = [
        "low lower lowest low low",
        "new newer newest new",
        "widest wide wider new low",
        "the the the them theme",
    ]

    def test_equals_pure_python_trainer(self, spark):
        from ocr_spark.functions.bpe import bpe_train, bpe_train_df

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string"
        )
        assert bpe_train_df(docs, n_merges=40) == bpe_train(self.TEXTS, 40)

    def test_top_words_cap_deterministic(self, spark):
        from ocr_spark.functions.bpe import corpus_word_counts

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string"
        )
        full = corpus_word_counts(docs)
        capped = corpus_word_counts(docs, top_words=3)
        want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert sorted(capped.items(), key=lambda kv: (-kv[1], kv[0])) == want

    def test_degenerate_docs_tolerated(self, spark):
        from ocr_spark.functions.bpe import bpe_train_df

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   "), (4, "ab ab ab")],
            "doc_id long, text string",
        )
        merges = bpe_train_df(docs, n_merges=4)
        assert merges[0] == ("a", "b")

    def test_train_count_pack_chain(self, spark):
        from ocr_spark.functions.bpe import bpe_train_df, token_counts_bpe
        from ocr_spark.operators.corpus_clean import pack_sequences

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string"
        )
        merges = bpe_train_df(docs, n_merges=30)
        counted = token_counts_bpe(docs, merges=merges)
        joined = docs.join(counted, "doc_id")
        packed = pack_sequences(joined, max_tokens=8, tokens_col="n_tokens_bpe")
        assert packed.count() == 4
        assert packed.where(F.col("n_tokens") <= 0).count() == 0


class TestIncrementalTrainerEquality:
    """bpe_train_from_counts uses incremental pair maintenance; it must
    equal the naive full-recount reference EXACTLY, including tie-breaks."""

    def test_randomized_equality(self):
        import random

        from ocr_spark.functions.bpe import (
            _bpe_train_naive,
            bpe_train_from_counts,
        )

        rng = random.Random(41)
        for trial in range(30):
            words = {
                "".join(
                    rng.choice("abcde") for _ in range(rng.randint(1, 10))
                ): rng.randint(1, 50)
                for _ in range(rng.randint(1, 60))
            }
            n = rng.randint(1, 40)
            assert bpe_train_from_counts(words, n) == _bpe_train_naive(
                words, n
            ), (trial, words, n)

    def test_repeat_symbol_words(self):
        from ocr_spark.functions.bpe import (
            _bpe_train_naive,
            bpe_train_from_counts,
        )

        # overlapping-pair stress: runs of one symbol
        words = {"aaaa": 5, "aaab": 3, "abab": 2, "bbbb": 4, "ab": 9}
        for n in (1, 2, 3, 8, 32):
            assert bpe_train_from_counts(words, n) == _bpe_train_naive(words, n)

    def test_exhaustion_stops_early(self):
        from ocr_spark.functions.bpe import bpe_train_from_counts

        merges = bpe_train_from_counts({"ab": 1}, n_merges=100)
        assert merges == [("a", "b")]

    def test_hypothesis_equality(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ocr_spark.functions.bpe import (
            _bpe_train_naive,
            bpe_train_from_counts,
        )

        words_st = st.dictionaries(
            st.text(alphabet="abcxyz", min_size=1, max_size=12),
            st.integers(min_value=1, max_value=99),
            min_size=0,
            max_size=40,
        )

        @settings(max_examples=200, deadline=None)
        @given(words=words_st, n=st.integers(min_value=0, max_value=48))
        def run(words, n):
            assert bpe_train_from_counts(words, n) == _bpe_train_naive(words, n)

        run()
