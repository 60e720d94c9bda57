"""Interleaved multimodal materialization: sentinel/ref alignment
invariants, offset ordering, truncation alignment, reference≡grouped
bit-identity, repartition determinism, budget accounting, and the
composed interleave_training surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.bpe import PAD_ID, SEP_ID, bpe_vocab
from ocr_spark.operators.interleaved import (
    MEDIA_ID,
    encode_interleaved,
    interleave_training,
    interleaved_sequences,
    interleaved_sequences_grouped,
)
from ocr_spark.schema import DOC_SCHEMA

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
VOCAB = bpe_vocab(MERGES)


def span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


DOCS = [
    # text, image, text — the canonical interleaved page
    (
        "d1",
        [
            span("text", "hello", None, 0),
            span("media", None, "img://1", 10),
            span("text", "hello hello", None, 20),
        ],
    ),
    # media-only doc
    ("d2", [span("media", None, "img://2", 0), span("media", None, "img://3", 5)]),
    # text-only doc
    ("d3", [span("text", "hello", None, 0)]),
    # out-of-order offsets must sort; span with neither text nor ref skipped
    (
        "d4",
        [
            span("text", "hello", None, 50),
            span("media", None, "img://4", 5),
            span("text", None, None, 7),
        ],
    ),
    # empty spans
    ("d5", []),
    # OCR span carrying BOTH text and media_ref: the ref wins (spec)
    ("d6", [span("ocr", "hello", "img://6", 0)]),
]


@pytest.fixture(scope="module")
def enc(spark):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    return encode_interleaved(docs, merges=MERGES).persist()


HELLO = VOCAB["hello"]


class TestEncode:
    def test_canonical_interleaving(self, enc):
        got = {r["doc_id"]: r for r in enc.collect()}
        # the engine's pretokenizer drops whitespace (token_counts_bpe
        # convention), so "hello hello" is two word tokens
        assert got["d1"]["input_ids"] == [
            HELLO, MEDIA_ID, HELLO, HELLO, SEP_ID,
        ]
        assert got["d1"]["media_refs"] == ["img://1"]
        assert got["d1"]["n_media"] == 1

    def test_media_only_and_text_only(self, enc):
        got = {r["doc_id"]: r for r in enc.collect()}
        assert got["d2"]["input_ids"] == [MEDIA_ID, MEDIA_ID, SEP_ID]
        assert got["d2"]["media_refs"] == ["img://2", "img://3"]
        assert got["d3"]["input_ids"] == [HELLO, SEP_ID]
        assert got["d3"]["media_refs"] == []

    def test_offset_order_and_empty_spans(self, enc):
        got = {r["doc_id"]: r for r in enc.collect()}
        # media at offset 5 precedes text at offset 50; the (None, None)
        # span contributes nothing
        assert got["d4"]["input_ids"] == [MEDIA_ID, HELLO, SEP_ID]
        assert got["d5"]["input_ids"] == [SEP_ID]
        assert got["d5"]["media_refs"] == []

    def test_ref_wins_over_text_on_one_span(self, enc):
        got = {r["doc_id"]: r for r in enc.collect()}
        assert got["d6"]["input_ids"] == [MEDIA_ID, SEP_ID]
        assert got["d6"]["media_refs"] == ["img://6"]

    def test_alignment_invariant(self, enc):
        for r in enc.collect():
            assert r["input_ids"].count(MEDIA_ID) == len(r["media_refs"])
            assert r["n_media"] == len(r["media_refs"])

    def test_no_sep_mode(self, spark):
        docs = spark.createDataFrame(DOCS[:1], DOC_SCHEMA)
        r = encode_interleaved(docs, merges=MERGES, sep=False).first()
        assert r["input_ids"][-1] != SEP_ID

    def test_nonnegative_media_id_rejected(self, spark):
        docs = spark.createDataFrame(DOCS[:1], DOC_SCHEMA)
        with pytest.raises(ValueError, match="media_id must be negative"):
            encode_interleaved(docs, merges=MERGES, media_id=3)


def _pack(enc, max_tokens, n_buckets=4):
    from ocr_spark.operators.corpus_clean import pack_sequences

    counts = enc.select("doc_id", F.size("input_ids").alias("_n"))
    return pack_sequences(
        counts, max_tokens=max_tokens, n_buckets=n_buckets, tokens_col="_n"
    )


def _norm(rows):
    return sorted(
        (
            r["seq_id"],
            tuple(r["input_ids"]),
            tuple(r["media_refs"]),
            tuple(r["media_positions"]),
            r["n_docs"],
            r["n_tokens"],
            r["n_media_total"],
            r["truncated"],
        )
        for r in rows
    )


class TestFill:
    def test_reference_equals_grouped(self, enc):
        packed = _pack(enc, max_tokens=8)
        a = _norm(interleaved_sequences(enc, packed, 8).collect())
        b = _norm(interleaved_sequences_grouped(enc, packed, 8, n_buckets=4).collect())
        assert a == b and a

    def test_sequences_exact_length_and_positions(self, enc):
        packed = _pack(enc, max_tokens=8)
        for r in interleaved_sequences_grouped(
            enc, packed, 8, n_buckets=4
        ).collect():
            assert len(r["input_ids"]) == 8
            for p, ref in zip(r["media_positions"], r["media_refs"]):
                assert r["input_ids"][p] == MEDIA_ID
                assert ref.startswith("img://")
            assert r["input_ids"].count(MEDIA_ID) == len(r["media_refs"])

    def test_truncation_cuts_refs_with_their_sentinels(self, spark):
        # one oversize doc: text, media, text, media — budget 3 keeps only
        # the FIRST sentinel, so exactly one ref must survive
        docs = spark.createDataFrame(
            [
                (
                    "big",
                    [
                        span("text", "hello", None, 0),
                        span("media", None, "img://a", 1),
                        span("text", "hello hello", None, 2),
                        span("media", None, "img://b", 3),
                    ],
                )
            ],
            DOC_SCHEMA,
        )
        enc = encode_interleaved(docs, merges=MERGES)
        packed = _pack(enc, max_tokens=3, n_buckets=2)
        for fill in (
            lambda: interleaved_sequences(enc, packed, 3),
            lambda: interleaved_sequences_grouped(enc, packed, 3, n_buckets=2),
        ):
            r = fill().first()
            assert r["truncated"] is True
            assert r["input_ids"] == [HELLO, MEDIA_ID, HELLO]
            assert r["media_refs"] == ["img://a"]
            assert r["media_positions"] == [1]
            assert r["n_media_total"] == 2

    def test_repartition_determinism(self, enc):
        packed = _pack(enc, max_tokens=8)
        a = _norm(
            interleaved_sequences_grouped(
                enc.repartition(7), packed, 8, n_buckets=4
            ).collect()
        )
        b = _norm(
            interleaved_sequences_grouped(
                enc.repartition(1), packed.repartition(3), 8, n_buckets=4
            ).collect()
        )
        assert a == b

    def test_bucket_mismatch_raises(self, enc):
        packed = _pack(enc, max_tokens=8, n_buckets=4)
        with pytest.raises(Exception, match="n_buckets"):
            interleaved_sequences_grouped(
                enc, packed, 8, n_buckets=8
            ).collect()


class TestComposed:
    def test_interleave_training_accounting(self, spark):
        docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
        stats: dict = {}
        seqs = interleave_training(
            docs, merges=MERGES, max_tokens=8, n_buckets=4, stats=stats
        )
        rows = seqs.collect()
        # every doc lands in exactly one sequence; token+media totals conserve
        assert sum(r["n_docs"] for r in rows) == len(DOCS)
        total_refs = sum(r["n_media_total"] for r in rows)
        assert total_refs == 5  # img://1,2,3,4,6
        assert all(len(r["input_ids"]) == 8 for r in rows)
        # nothing truncated at this budget → every sentinel kept
        assert sum(len(r["media_refs"]) for r in rows) == total_refs
        from ocr_spark.operators.corpus import unpersist_stages

        unpersist_stages(stats)
