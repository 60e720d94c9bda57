"""Cluster-resolution scale bench: dedup_clusters (pairs → keep/drop labels)
over 1M-doc-scale candidate-pair graphs.

The pair graph is synthesized natively (spark.range arithmetic, zero Python)
with the shape real near-dup output has: a minority of docs sit in small
duplicate groups; the rest never appear in any pair (and correctly never
enter the cluster stage — only the near-dup SUBGRAPH is processed).

Configs:
  * groups of 4, chain-wired  (diameter 3  — typical LSH cluster)
  * groups of 16, chain+skip  (diameter ~8 — stress the fixpoint loop)

Usage: python scripts/bench_clusters.py [--n 1000000] [--dup-frac 0.2]
Appends JSON lines to BENCH/cluster_history.jsonl and prints them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def chain_pairs(spark, n_dup: int, group: int):
    """(id_a, id_b) chains inside consecutive groups of `group` ids."""
    return (
        spark.range(n_dup - 1)
        .where((F.col("id") + 1) % group != 0)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def skip_pairs(spark, n_dup: int, group: int, skip: int):
    """Extra (i, i+skip) edges within each group (densifies, cuts diameter)."""
    return (
        spark.range(n_dup - skip)
        .where((F.col("id") % group) < (F.col("id") + skip) % group)
        .select(F.col("id").alias("id_a"), (F.col("id") + skip).alias("id_b"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from ocr_spark.operators.dedup import dedup_clusters
    from ocr_spark.session import get_spark

    spark = get_spark("bench_clusters", cpus=args.cpus)
    n_dup = int(args.n * args.dup_frac)
    results = []
    configs = (
        ("groups4_chain", 4, False, ("label",), 30),
        ("groups16_chain_skip", 16, True, ("label",), 30),
        # adversarial diameter: 64-long chains — label propagation needs 63
        # rounds (capped here to keep the bench bounded); star needs ~log2
        ("groups64_chain", 64, False, ("star", "label"), 16),
    )
    for name, group, with_skip, algorithms, max_rounds in configs:
        pairs = chain_pairs(spark, n_dup, group)
        if with_skip:
            pairs = pairs.unionByName(skip_pairs(spark, n_dup, group, 2))
        pairs = pairs.persist()
        n_pairs = pairs.count()
        expected_clusters = n_dup // group
        for algorithm in algorithms:
            stats: dict = {}
            t0 = time.perf_counter()
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                labels = dedup_clusters(
                    pairs, stats=stats, algorithm=algorithm, max_rounds=max_rounds
                )
                agg = labels.agg(
                    F.count("*").alias("n_nodes"),
                    F.countDistinct("rep").alias("n_clusters"),
                    F.sum((F.col("id") != F.col("rep")).cast("long")).alias("n_dropped"),
                ).collect()[0]
            wall = round(time.perf_counter() - t0, 2)
            rec = {
                "op": "dedup_clusters",
                "config": name,
                "algorithm": algorithm,
                "n_docs_corpus": args.n,
                "n_pairs": n_pairs,
                "n_nodes": int(agg["n_nodes"]),
                "n_clusters": int(agg["n_clusters"]),
                "n_dropped": int(agg["n_dropped"]),
                "rounds": stats.get("rounds"),
                "converged": stats.get("converged"),
                "wall_sec": wall,
            }
            if rec["converged"]:
                assert rec["n_clusters"] == expected_clusters, (rec, expected_clusters)
                assert rec["n_dropped"] == n_dup - expected_clusters
            results.append(rec)
        pairs.unpersist()

    hist = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "cluster_history.jsonl",
    )
    ts = int(time.time())
    with open(hist, "a") as f:
        for r in results:
            f.write(json.dumps({**r, "ts": ts, "cpus": args.cpus}) + "\n")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
