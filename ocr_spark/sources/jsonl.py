"""JSONL corpus ingestion — the de-facto training-data interchange format
(one JSON document per line, gzip-splittable at the file level).

Reference anchor: the reference ingests local files one at a time
(ocr_workflow_orchestrator.py:153-178); a corpus build consumes JSONL
shards. Spark-first: the native json reader with an EXPLICIT schema (never
schema inference — at 100 TB inference is a full extra pass over every
byte), PERMISSIVE mode and columnNameOfCorruptRecord so malformed lines
become per-row error envelopes instead of killing the read — the same
degrade-per-doc contract as the extraction pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_FIELDS = "doc_id long, text string"


def jsonl_docs(
    spark: SparkSession,
    path: str,
    fields: str = DOC_FIELDS,
) -> DataFrame:
    """Read JSONL shards into (fields..., error). A malformed line yields a
    row with every field null and `error` = the raw line (PERMISSIVE +
    corrupt-record column); well-formed lines have error = null. The
    explicit schema keeps the scan a single pass and lets Catalyst prune
    columns into the reader."""
    corrupt = "_corrupt"
    df = (
        spark.read.schema(f"{fields}, {corrupt} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    keep = [c for c in df.columns if c != corrupt]
    return df.select(*keep, F.col(corrupt).alias("error"))


def write_jsonl_fixture(
    rows: list[tuple[int, str]],
    out_dir: str,
    n_shards: int = 4,
    corrupt_mod: int = 37,
) -> None:
    """Deterministic JSONL shard set: docs round-robin across n_shards;
    every doc_id % corrupt_mod == 0 line is written MALFORMED (truncated
    JSON) so the error-envelope path is load-bearing. json.dumps escaping
    matches Spark's parser, so text roundtrips exactly."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards = [open(os.path.join(out_dir, f"part-{i:04d}.jsonl"), "w") for i in range(n_shards)]
    try:
        for idx, (doc_id, text) in enumerate(rows):
            if doc_id % corrupt_mod == 0:
                line = f'{{"doc_id": {doc_id}, "text": BROKEN'
            else:
                line = json.dumps(
                    {"doc_id": doc_id, "text": text}, ensure_ascii=False
                )
            shards[idx % n_shards].write(line + "\n")
    finally:
        for f in shards:
            f.close()
