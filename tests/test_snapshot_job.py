"""Snapshot-update job (scripts/run_snapshot_update.py): bootstrap →
incremental flow, final corpus/index consistency, bootstrap refusals.
(The spark-submit packaging itself is exercised manually per SURVEY §11.5 —
here the job's main() runs in-process against the shared session.)"""

import importlib.util
import json
import os
import sys

import pytest

from ocr_spark.operators.dedup import near_dedup
from tests.test_dedup_index import _mk_snapshots, SCHEMA


def _run_job(argv, capsys):
    spec = importlib.util.spec_from_file_location(
        "run_snapshot_update",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "run_snapshot_update.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["run_snapshot_update.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def snap_parquets(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("snapjob")
    docs, b1, b2 = _mk_snapshots()
    paths = {}
    for name, ids in [("b1", b1), ("b2", b2)]:
        p = str(d / f"{name}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": [docs[i] for i in ids],
                }
            ),
            p,
        )
        paths[name] = p
    return {"docs": docs, "b1": b1, "b2": b2, "paths": paths, "dir": str(d)}


def test_bootstrap_then_incremental(spark, snap_parquets, capsys):
    d = snap_parquets["dir"]
    corpus, index = os.path.join(d, "corpus"), os.path.join(d, "idx")
    r1 = _run_job(
        ["--batch", snap_parquets["paths"]["b1"], "--corpus", corpus,
         "--index", index, "--bootstrap"],
        capsys,
    )
    assert r1["bootstrap"] is True and r1["n_batch_in"] == 26
    r2 = _run_job(
        ["--batch", snap_parquets["paths"]["b2"], "--corpus", corpus,
         "--index", index],
        capsys,
    )
    assert r2["bootstrap"] is False
    assert r2["exact_dropped"] >= 2 and r2["near_dropped_corpus"] > 0

    # final corpus == one-shot dedup over the full union (the equivalence
    # the incremental contract guarantees for id-ordered snapshots)
    docs = snap_parquets["docs"]
    union = spark.createDataFrame(
        [(i, docs[i]) for i in sorted(docs)], SCHEMA
    )
    oneshot = {
        r["doc_id"]
        for r in near_dedup(union, method="minhash", threshold=0.7).collect()
    }
    stored = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert stored == oneshot
    # index rows cover exactly the stored docs
    from ocr_spark.operators.dedup_index import read_dedup_index

    idx = read_dedup_index(spark, index)
    assert {r.doc_id for r in idx.exact.collect()} == stored
    assert {r.doc_id for r in idx.sigs.collect()} == stored


def test_bootstrap_refusals(spark, snap_parquets, capsys):
    d = snap_parquets["dir"]
    corpus, index = os.path.join(d, "corpus"), os.path.join(d, "idx")
    with pytest.raises(SystemExit) as e:
        _run_job(
            ["--batch", snap_parquets["paths"]["b1"], "--corpus", corpus,
             "--index", index, "--bootstrap"],
            capsys,
        )
    assert e.value.code == 2
    # fresh index path but dirty corpus → also refused
    with pytest.raises(SystemExit) as e2:
        _run_job(
            ["--batch", snap_parquets["paths"]["b1"], "--corpus", corpus,
             "--index", os.path.join(d, "idx_fresh"), "--bootstrap"],
            capsys,
        )
    assert e2.value.code == 2
