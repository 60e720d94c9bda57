"""Structured Streaming ingestion: continuous extraction over an arriving
document directory.

The reference is a batch desktop system — request/response per document
(ocr_workflow_orchestrator.py:252-319), no streaming operator exists
(SURVEY §2.9); this module is the Spark-native widening a production corpus
build needs. New interleaved-span parquet files land in a directory; each
micro-batch runs the UNCHANGED batch extractor via foreachBatch, so the plan
per micro-batch is byte-identical to the audited batch plan (salted
repartition, codegen'd span normalization, one Arrow stage). The parquet
file source + checkpointLocation give exactly-once FILE tracking with resume
across restarts: a restarted query never re-reads a file a committed epoch
consumed.

Delivery semantics: foreachBatch is at-least-once (a crash between the sink
write and the epoch commit replays the epoch). The sink therefore writes
each epoch to its own `epoch=N` subdirectory with mode=overwrite — a
replayed epoch overwrites its own partial output, composing at-least-once
replay into exactly-once on disk. `read_stream_output` reads the union.

Scale shape: identical to batch — the streaming layer adds file listing and
offset tracking only; no extra shuffle, no driver-side rows. Backpressure
via maxFilesPerTrigger bounds per-epoch memory at any corpus arrival rate.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    rules: Sequence[tuple[str, str]] = (),
    media_resolver: str = "synthetic",
    media_engine: str = "local",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str = "10 seconds",
    **extract_kw,
) -> StreamingQuery:
    """Start the streaming extraction query and return its handle.

    available_now=True (default) drains everything pending then stops — the
    batch-backfill / test mode; False runs continuously with
    `processing_time` micro-batch cadence. `extract_kw` forwards to
    pipeline.extract_documents (salt_partitions, span_chunk_threshold, ...).
    """
    from ocr_spark.pipeline import extract_documents
    from ocr_spark.schema import DOC_SCHEMA

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract_documents(
            batch_df,
            rules=rules,
            media_resolver=media_resolver,
            media_engine=media_engine,
            **extract_kw,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={epoch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("ocr_spark_streaming_extract")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    processing_time: str = "10 seconds",
) -> StreamingQuery:
    """Stateful streaming exact-dedup: emit each document the FIRST time its
    canonical fingerprint is seen across the whole stream; all later
    arrivals (and same-batch twins) are dropped. The custom stateful
    operator the batch `exact_dedup` cannot express — state (one seen-flag
    per fingerprint) lives in Spark's state store, keyed by the md5
    fingerprint, survives restarts via the checkpoint, and is maintained by
    `applyInPandasWithState` (Arrow-batched; grouping shuffles ONLY the
    fingerprint-keyed rows of each micro-batch, never the corpus).

    Within a micro-batch the min-id row of each new fingerprint wins
    (deterministic); across batches the earlier batch wins (stream
    semantics). At cluster scale the state store is RocksDB-backed and
    partitioned with the shuffle — per-key state is 1 byte of payload, so
    10^12 fingerprints shard across executors; no timeout is set because
    dedup state is by definition forever.

    Output goes through the parquet FILE SINK (its _spark_metadata commit
    log gives exactly-once on disk); read results back with
    spark.read.parquet(output_dir), not read_stream_output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ocr_spark.operators.text_analysis import fingerprint

    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("fp", fingerprint(F.col(text_col)))
    )
    def _first_seen(key, pdf_iter, state):
        if state.exists:
            # fingerprint already emitted in an earlier micro-batch: the
            # whole group is duplicates (no state write — NoTimeout entries
            # never expire, so re-putting an identical flag is pure
            # state-store write amplification)
            return iter(())
        # min-id row wins; a null id (float64 NaN in pandas) loses to any
        # real id, and an all-null group emits its first row — a null id
        # must never crash the query (a poison row that raised here would
        # be retried on every restart, wedging the stream forever)
        best = None  # 1-row DataFrame slice (dtypes preserved)
        best_id = None  # None = null id
        for pdf in pdf_iter:
            s = pdf[id_col]
            if s.notna().any():
                i = s.idxmin()
                cid = s.loc[i]
            else:
                i, cid = pdf.index[0], None
            if best is None or (
                cid is not None and (best_id is None or cid < best_id)
            ):
                best, best_id = pdf.loc[[i]], cid
        state.update((True,))
        if best is None:
            return iter(())
        # fp was only the grouping key — don't ship it back over Arrow
        return iter((best.drop(columns=["fp"]),))

    deduped = stream.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("ocr_spark_streaming_dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    """The union of all committed epochs, OUTPUT_SCHEMA-shaped (the epoch
    partition column is dropped — it is a delivery artifact, not data)."""
    return (
        spark.read.option("basePath", output_dir)
        .parquet(os.path.join(output_dir, "epoch=*"))
        .drop("epoch")
    )
