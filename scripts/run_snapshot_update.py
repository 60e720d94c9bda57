"""Snapshot-update job entrypoint for spark-submit — the recurring-crawl
counterpart of run_extract_job.py: ingest one new document batch, clean it,
dedup it against the persisted corpus index WITHOUT rescanning the corpus,
append the survivors to the corpus store and their artifacts to the index,
and publish the run's stats line.

Local sandbox example (same packaging as a cluster run):

    cd /root/repo && zip -qr /tmp/ocr_spark.zip ocr_spark
    # first snapshot: bootstrap corpus + index from the batch alone
    spark-submit --py-files /tmp/ocr_spark.zip scripts/run_snapshot_update.py \
        --batch /root/testdata/sf0.001/documents.parquet \
        --corpus /tmp/corpus_store --index /tmp/corpus_index --bootstrap
    # every later snapshot: incremental against the index
    spark-submit --py-files /tmp/ocr_spark.zip scripts/run_snapshot_update.py \
        --batch <new month's parquet> \
        --corpus /tmp/corpus_store --index /tmp/corpus_index

On a real cluster the same command drops local[*] (session.get_spark honors
the submitted master) and the corpus/index roots are object-store paths; the
index stays O(bands·16 + k·8) bytes per kept doc, and every index-side join
broadcasts the batch (the corpus is scanned, never shuffled — see
ocr_spark/operators/dedup_index.py).

Ordering contract (documented in dedup_index): the kept batch is WRITTEN to
the corpus store BEFORE the index append, so the lazy keep/drop plan is
never re-executed against the index it read (read-after-append hazard).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", required=True, help="new snapshot's documents parquet")
    ap.add_argument("--corpus", required=True, help="kept-docs store root (parquet)")
    ap.add_argument("--index", required=True, help="dedup index root")
    ap.add_argument("--bootstrap", action="store_true",
                    help="first snapshot: one-shot near_dedup, then create the index")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--quality-min", type=float, default=None,
                    help="optional quality_score floor applied before dedup")
    ap.add_argument("--index-buckets", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.session import get_spark
    from ocr_spark.operators.dedup import near_dedup
    from ocr_spark.operators.dedup_index import (
        incremental_dedup,
        read_dedup_index,
        update_dedup_index,
        write_dedup_index,
    )

    spark = get_spark("snapshot_update")
    batch = spark.read.parquet(args.batch)
    n_in = batch.count()

    if args.quality_min is not None:
        from ocr_spark.operators.text_analysis import quality_score

        batch = batch.where(
            quality_score(F.col(args.text_col)) >= F.lit(args.quality_min)
        )

    t0 = time.time()
    stats: dict = {}
    if args.bootstrap:
        if os.path.exists(os.path.join(args.index, "_index_meta.json")):
            print(
                f"refusing --bootstrap: index already exists at {args.index}",
                file=sys.stderr,
            )
            sys.exit(2)
        if os.path.isdir(args.corpus) and os.listdir(args.corpus):
            print(
                f"refusing --bootstrap: corpus store at {args.corpus} is not "
                "empty (bootstrapping over existing data would desync it "
                "from the fresh index)",
                file=sys.stderr,
            )
            sys.exit(2)
        kept = near_dedup(
            batch,
            method="minhash",
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
        )
        mode = "overwrite"
    else:
        idx = read_dedup_index(spark, args.index)
        kept = incremental_dedup(
            batch,
            idx,
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
            stats=stats,
        )
        mode = "append"

    # 1. persist the kept batch to the corpus store FIRST (ordering
    #    contract), 2. re-read the written files (a concrete, index-free
    #    plan), 3. append the index rows from that re-read.
    kept.write.mode("append").parquet(args.corpus)
    written = spark.read.parquet(args.corpus)
    if args.bootstrap:
        kept_ids = kept.select(args.id_col)
        new_rows = written.join(kept_ids, args.id_col, "left_semi")
        write_dedup_index(
            new_rows,
            args.index,
            n_buckets=args.index_buckets,
            id_col=args.id_col,
            text_col=args.text_col,
            mode=mode,
        )
        n_kept = new_rows.count()
    else:
        # only this run's rows go to the index: semi-join on the batch ids
        batch_ids = batch.select(args.id_col)
        new_rows = written.join(F.broadcast(batch_ids), args.id_col, "left_semi")
        update_dedup_index(
            new_rows, args.index, id_col=args.id_col, text_col=args.text_col
        )
        n_kept = new_rows.count()

    line = {
        "job": "snapshot_update",
        "bootstrap": bool(args.bootstrap),
        "n_batch_in": n_in,
        "n_kept": n_kept,
        "sec": round(time.time() - t0, 3),
        **{k: v for k, v in stats.items()},
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
