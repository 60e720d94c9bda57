"""JSONL ingestion source (sources/jsonl.py): roundtrip fidelity + per-line
error envelopes."""

from __future__ import annotations

from ocr_spark.sources.jsonl import jsonl_docs, write_jsonl_fixture


def test_jsonl_roundtrip_and_error_envelope(spark, tmp_path):
    rows = [
        (1, 'plain text'),
        (2, 'quotes " and \\ backslash and\nnewline and unicode é中'),
        (37, 'this line will be written malformed'),
        (4, ''),
    ]
    d = str(tmp_path / "shards")
    write_jsonl_fixture(rows, d, n_shards=2)
    got = {r.doc_id: r for r in jsonl_docs(spark, d).collect()}
    # well-formed lines roundtrip exactly, error null
    assert got[1].text == "plain text" and got[1].error is None
    assert got[2].text == rows[1][1] and got[2].error is None
    assert got[4].text == "" and got[4].error is None
    # the malformed line survives as an envelope row, not a task failure
    bad = [r for r in jsonl_docs(spark, d).collect() if r.doc_id is None]
    assert len(bad) == 1
    assert bad[0].text is None and bad[0].error.startswith('{"doc_id": 37')


def test_jsonl_all_corrupt_still_reads(spark, tmp_path):
    d = str(tmp_path / "allbad")
    write_jsonl_fixture([(0, "x"), (37, "y")], d, n_shards=1)  # both %37==0
    out = jsonl_docs(spark, d).collect()
    assert len(out) == 2 and all(r.error for r in out)
