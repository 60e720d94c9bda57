"""Structured Streaming ingestion: the streaming path must produce exactly
the batch extractor's output (span-sequence equality), track consumed files
across restarts (resume), and keep epoch output idempotent."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.fixtures import generate_docs, generate_docs_chunk
from ocr_spark.pipeline import extract_documents
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.streaming import read_stream_output, streaming_extract

RULES = [["hte", "the"], ["wrold", "world"]]
CMP = ["doc_id", "spans", "extractor", "error", "error_source"]


def _drain(q):
    q.awaitTermination(180)
    assert not q.isActive


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def test_streaming_matches_batch_and_resumes(spark, dirs):
    docs1 = generate_docs(30)
    spark.createDataFrame(docs1, DOC_SCHEMA).write.mode("append").parquet(dirs["in"])

    _drain(
        streaming_extract(
            spark, dirs["in"], dirs["out"], dirs["ckpt"], rules=RULES
        )
    )
    got1 = read_stream_output(spark, dirs["out"])
    want1 = extract_documents(
        spark.createDataFrame(docs1, DOC_SCHEMA), rules=RULES
    )
    assert got1.count() == 30
    assert got1.select(CMP).exceptAll(want1.select(CMP)).count() == 0
    assert want1.select(CMP).exceptAll(got1.select(CMP)).count() == 0

    # second run with the SAME checkpoint: only the newly arrived files are
    # processed (file-source resume), and the totals line up
    docs2 = generate_docs_chunk(100, 20)
    spark.createDataFrame(docs2, DOC_SCHEMA).write.mode("append").parquet(dirs["in"])
    _drain(
        streaming_extract(
            spark, dirs["in"], dirs["out"], dirs["ckpt"], rules=RULES
        )
    )
    got2 = read_stream_output(spark, dirs["out"])
    assert got2.count() == 50
    ids = {r.doc_id for r in got2.select("doc_id").collect()}
    assert ids == {d["doc_id"] for d in docs1} | {d["doc_id"] for d in docs2}

    # idempotence artifact: one epoch subdirectory per committed micro-batch
    epochs = sorted(glob.glob(os.path.join(dirs["out"], "epoch=*")))
    assert len(epochs) >= 2

    # a third run with nothing new commits no new rows
    _drain(
        streaming_extract(
            spark, dirs["in"], dirs["out"], dirs["ckpt"], rules=RULES
        )
    )
    assert read_stream_output(spark, dirs["out"]).count() == 50


def test_streaming_dedup_state_survives_restart(spark, dirs):
    """The stateful operator: same-batch twins collapse to the min-id row;
    a later run with the SAME checkpoint drops re-arrivals against the
    state store (dedup memory survives the restart)."""
    from ocr_spark.streaming import streaming_dedup

    batch1 = [
        (1, "the quick brown fox"),
        (3, "the quick brown fox"),   # same-batch twin of 1
        (2, "a different document"),
    ]
    spark.createDataFrame(batch1, "doc_id long, text string").write.mode(
        "append"
    ).parquet(dirs["in"])
    _drain(streaming_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"]))
    out1 = {r.doc_id for r in spark.read.parquet(dirs["out"]).collect()}
    assert out1 == {1, 2}

    batch2 = [
        (10, "the quick brown fox"),  # re-arrival: state must drop it
        (11, "an entirely new document"),
    ]
    spark.createDataFrame(batch2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(dirs["in"])
    _drain(streaming_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"]))
    out2 = {r.doc_id for r in spark.read.parquet(dirs["out"]).collect()}
    assert out2 == {1, 2, 11}


def test_streaming_dedup_null_id_and_text_survive(spark, dirs):
    """Poison rows (null doc_id, null text) must not crash the query: a
    null id loses to any real id in its fingerprint group; all-null groups
    emit one row; null texts collapse to one (null fp group) like batch
    exact_dedup."""
    from ocr_spark.streaming import streaming_dedup

    rows = [
        (None, "the quick brown fox"),
        (5, "the quick brown fox"),    # real id must win over the null id
        (None, None),
        (7, None),                     # null-text twin: one of the two survives
        (9, "unique survivor"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "append"
    ).parquet(dirs["in"])
    _drain(streaming_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"]))
    out = spark.read.parquet(dirs["out"])
    got = {r.doc_id for r in out.collect()}
    # real ids beat the null twin in BOTH duplicate groups; no null escapes
    assert got == {5, 7, 9}


def test_streaming_backpressure_bounds_epochs(spark, dirs):
    """maxFilesPerTrigger=1 over two input files → two epochs, same union."""
    for start in (0, 40):
        spark.createDataFrame(
            generate_docs_chunk(start, 10), DOC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(dirs["in"])
    _drain(
        streaming_extract(
            spark, dirs["in"], dirs["out"], dirs["ckpt"],
            max_files_per_trigger=1,
        )
    )
    out = read_stream_output(spark, dirs["out"])
    assert out.count() == 20
    epochs = glob.glob(os.path.join(dirs["out"], "epoch=*"))
    assert len(epochs) >= 2
    assert out.where(F.col("error").isNotNull()).count() == 0
