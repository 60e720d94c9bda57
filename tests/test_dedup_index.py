"""Cross-snapshot incremental dedup (ocr_spark/operators/dedup_index.py).

The hard invariant: with batch ids sorting after corpus ids and no bridge
components, `incremental_dedup(batch, index(kept(b1)))` keeps exactly the
batch docs that one-shot `near_dedup(b1 ∪ batch)` keeps — the one-shot
operator is itself driver-oracle-green, so equivalence to it IS the
correctness argument. The bridge-component divergence (a new doc linking
two already-kept corpus docs) is a documented contract, pinned here too.
"""

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import minhash_lsh_pairs, near_dedup
from ocr_spark.operators.dedup_index import (
    incremental_dedup,
    read_dedup_index,
    update_dedup_index,
    write_dedup_index,
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu amber birch cedar dune ember fjord grove"
).split()

SCHEMA = "doc_id bigint, text string"


def _mk_snapshots():
    """Two id-ordered snapshots (b1 ids < b2 ids) with near-dup clusters
    that span the snapshot boundary, exact dups both across and within b2,
    and unique filler. Variants differ from the base by one word out of 30,
    so cluster members are mutually ~0.9-similar (near-cliques — no bridge
    components by construction)."""
    rng = random.Random(20260819)
    docs: dict[int, str] = {}
    next_id = 0

    def add(text):
        nonlocal next_id
        docs[next_id] = text
        next_id += 1
        return next_id - 1

    cluster_texts = []
    for _ in range(8):
        base = [rng.choice(WORDS) for _ in range(30)]
        variants = [" ".join(base)]
        for _ in range(3):
            v = list(base)
            v[rng.randrange(30)] = rng.choice(WORDS)
            variants.append(" ".join(v))
        cluster_texts.append(variants)

    # batch 1: first two variants of each cluster + filler
    for variants in cluster_texts:
        for t in variants[:2]:
            add(t)
    for _ in range(10):
        add(" ".join(rng.choice(WORDS) for _ in range(18)))
    b1_ids = set(docs)

    # batch 2: remaining variants, an exact copy of a b1 doc, exact dups
    # within b2, filler
    for variants in cluster_texts:
        for t in variants[2:]:
            add(t)
    add(docs[0])  # exact cross-snapshot dup
    t = " ".join(rng.choice(WORDS) for _ in range(20))
    add(t)
    add(t)  # exact within-batch dup
    for _ in range(10):
        add(" ".join(rng.choice(WORDS) for _ in range(18)))
    b2_ids = set(docs) - b1_ids
    return docs, sorted(b1_ids), sorted(b2_ids)


@pytest.fixture(scope="module")
def snap(spark, tmp_path_factory):
    docs, b1, b2 = _mk_snapshots()
    df = lambda ids: spark.createDataFrame(  # noqa: E731
        [(i, docs[i]) for i in ids], SCHEMA
    )
    path = str(tmp_path_factory.mktemp("dedup_index") / "idx")
    kept1 = near_dedup(df(b1), method="minhash", threshold=0.7)
    write_dedup_index(kept1, path, n_buckets=4)
    return {
        "docs": docs,
        "b1": b1,
        "b2": b2,
        "df": df,
        "path": path,
        "kept1": {r["doc_id"] for r in kept1.collect()},
    }


def test_incremental_matches_oneshot(spark, snap):
    idx = read_dedup_index(spark, snap["path"])
    stats = {}
    kept2 = {
        r["doc_id"]
        for r in incremental_dedup(
            snap["df"](snap["b2"]), idx, threshold=0.7, stats=stats
        ).collect()
    }
    oneshot = {
        r["doc_id"]
        for r in near_dedup(
            snap["df"](snap["b1"] + snap["b2"]), method="minhash", threshold=0.7
        ).collect()
    }
    # one-shot never drops a b1 doc that batch-1 near-dedup kept (ids are
    # ordered and clusters are near-cliques → no bridge retractions here)
    assert oneshot & set(snap["b1"]) == snap["kept1"]
    assert kept2 == oneshot & set(snap["b2"])
    assert stats["kept"] == len(kept2)
    assert stats["n_batch"] == len(snap["b2"])
    assert stats["exact_dropped"] >= 2  # cross-snapshot copy + in-batch dup
    assert stats["near_dropped_corpus"] > 0  # cross-snapshot near-dups
    assert stats["exact_dropped"] + stats["near_dropped_corpus"] + stats[
        "near_dropped_batch"
    ] + stats["kept"] == stats["n_batch"]


def test_iterated_append_matches_priority(spark, snap):
    """Three-way split replayed through update_dedup_index: iterating
    batch-by-batch with index appends equals the two-batch run on the same
    prefix ordering."""
    docs, b2 = snap["docs"], snap["b2"]
    mid = b2[len(b2) // 2]
    b2a = [i for i in b2 if i <= mid]
    b2b = [i for i in b2 if i > mid]
    path = snap["path"] + "_iter"
    kept1 = near_dedup(snap["df"](snap["b1"]), method="minhash", threshold=0.7)
    write_dedup_index(kept1, path, n_buckets=4)

    idx = read_dedup_index(spark, path)
    kept_a = incremental_dedup(snap["df"](b2a), idx, threshold=0.7)
    # materialize BEFORE appending — kept_a's lazy plan reads the same
    # index the append writes to (the update_dedup_index docstring's
    # read-after-append hazard; re-collecting after the append would let
    # each kept doc find its own appended fingerprint and drop itself)
    kept_a_ids = {r["doc_id"] for r in kept_a.collect()}
    update_dedup_index(kept_a, path)
    idx2 = read_dedup_index(spark, path)
    kept_b = incremental_dedup(snap["df"](b2b), idx2, threshold=0.7)

    got = kept_a_ids | {r["doc_id"] for r in kept_b.collect()}
    oneshot = {
        r["doc_id"]
        for r in near_dedup(
            snap["df"](snap["b1"] + b2), method="minhash", threshold=0.7
        ).collect()
    }
    assert got == oneshot & set(b2)


def test_exact_priority_and_within_batch(spark, snap):
    """The exact copy of a corpus doc is dropped; of the two identical
    in-batch docs only the min id survives the exact stage."""
    idx = read_dedup_index(spark, snap["path"])
    kept2 = {
        r["doc_id"]
        for r in incremental_dedup(
            snap["df"](snap["b2"]), idx, threshold=0.7
        ).collect()
    }
    docs, b2 = snap["docs"], snap["b2"]
    copy_id = next(i for i in b2 if docs[i] == docs[0])
    twins = sorted(
        i for i in b2 if sum(docs[j] == docs[i] for j in b2) == 2
    )
    assert copy_id not in kept2
    assert twins[0] in kept2 and twins[1] not in kept2


def test_bridge_component_contract(spark, tmp_path):
    """A (corpus) and C (corpus) are < threshold-similar; batch doc B is a
    superset-blend similar to BOTH. Contract: B is dropped, A and C are both
    retained (append-only — no retraction), even though one-shot dedup over
    {A, B, C} would keep only A."""
    rng = random.Random(25)  # seed picked by a pure-python replica of the
    # deterministic md5 minhash family: estimates est(A,B)=0.703,
    # est(C,B)=0.688, est(A,C)=0.469 at k=64 — threshold 0.58 has ≥0.10
    # margin on both sides, and both B pairs land a band hit at bands=16
    s = [rng.choice(WORDS) for _ in range(40)]
    x = [rng.choice(WORDS) for _ in range(12)]
    y = [rng.choice(WORDS) for _ in range(12)]
    a_text = " ".join(s + x)
    c_text = " ".join(s + y)
    b_text = " ".join(s)
    corpus = spark.createDataFrame([(0, a_text), (1, c_text)], SCHEMA)
    batch = spark.createDataFrame([(10, b_text)], SCHEMA)
    threshold, k, bands = 0.58, 64, 16

    # precondition: the deterministic minhash family sees B~A and B~C but
    # not A~C at this threshold (J(A,B)=J(C,B)≈0.76, J(A,C)≈0.64 in
    # shingle space; est_jaccard is deterministic given the texts)
    all3 = spark.createDataFrame(
        [(0, a_text), (1, c_text), (10, b_text)], SCHEMA
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            all3, threshold=threshold, k=k, bands=bands
        ).collect()
    }
    assert (0, 10) in pairs and (1, 10) in pairs and (0, 1) not in pairs

    path = str(tmp_path / "idx")
    kept_corpus = near_dedup(
        corpus, method="minhash", threshold=threshold, k=k, bands=bands
    )
    assert kept_corpus.count() == 2  # A and C both kept
    write_dedup_index(kept_corpus, path, k=k, bands=bands, n_buckets=2)
    idx = read_dedup_index(spark, path)
    kept = incremental_dedup(batch, idx, threshold=threshold)
    assert kept.count() == 0  # B joins a corpus-tainted cluster → dropped
    # one-shot over the union WOULD retract C — the documented divergence
    oneshot = {
        r["doc_id"]
        for r in near_dedup(
            all3, method="minhash", threshold=threshold, k=k, bands=bands
        ).collect()
    }
    assert oneshot == {0}


def test_append_meta_mismatch_raises(spark, snap, tmp_path):
    path = str(tmp_path / "idx")
    kept1 = near_dedup(snap["df"](snap["b1"]), method="minhash", threshold=0.7)
    write_dedup_index(kept1, path, n_buckets=4)
    with pytest.raises(ValueError, match="would corrupt"):
        write_dedup_index(kept1, path, k=16, n_buckets=4, mode="append")


def test_index_side_never_shuffles(spark, snap):
    """Every join against the persisted index tables is a BroadcastHashJoin
    (or BroadcastNestedLoop never appears); no Exchange sits between an
    index parquet scan and its join — the 10^12-row side is scanned, not
    shuffled."""
    idx = read_dedup_index(spark, snap["path"])
    kept = incremental_dedup(snap["df"](snap["b2"]), idx, threshold=0.7)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def depth(line: str) -> int:
        import re

        m = re.match(r"^[\s:+\-]*", line)
        return m.end()

    def parents_until_join(i: int) -> list[str]:
        """Ancestor chain of plan node i, up to (and excluding) the nearest
        enclosing Join."""
        d = depth(lines[i])
        chain = []
        for j in range(i - 1, -1, -1):
            dj = depth(lines[j])
            if dj < d:
                if "Join" in lines[j]:
                    return chain
                chain.append(lines[j])
                d = dj
        return chain

    scans = [
        i
        for i, ln in enumerate(lines)
        if "Scan parquet" in ln and snap["path"] in ln
    ]
    assert len(scans) >= 3  # exact, bands, sigs all consulted
    for i in scans:
        between = [
            ln
            for ln in parents_until_join(i)
            if "Exchange" in ln and "Broadcast" not in ln
        ]
        assert not between, (
            "index scan shuffled before its join:\n" + "\n".join(between)
        )


def test_unique_only_batch_passthrough(spark, snap):
    """A batch with no dups at all passes through untouched (and the empty
    candidate frames don't break clustering)."""
    rng = random.Random(99)
    rows = [
        (1000 + i, " ".join(rng.choice(WORDS) for _ in range(25)))
        for i in range(5)
    ]
    batch = spark.createDataFrame(rows, SCHEMA)
    idx = read_dedup_index(spark, snap["path"])
    kept = incremental_dedup(batch, idx, threshold=0.7)
    assert {r["doc_id"] for r in kept.collect()} == {r[0] for r in rows}


def test_null_text_cross_snapshot(spark, tmp_path):
    """Null-text docs fingerprint to NULL; exact_dedup groups them as ONE
    duplicate class (SQL null grouping), so incremental must too: a corpus
    holding a null-text doc absorbs every later null-text batch doc, and a
    null-free corpus keeps exactly the min-id batch null."""
    corpus = spark.createDataFrame([(0, "real text here"), (1, None)], SCHEMA)
    batch = spark.createDataFrame(
        [(10, None), (11, None), (12, "unique words entirely")], SCHEMA
    )
    path = str(tmp_path / "idx")
    write_dedup_index(corpus, path, n_buckets=2)
    idx = read_dedup_index(spark, path)
    kept = {r["doc_id"] for r in incremental_dedup(batch, idx).collect()}
    assert kept == {12}  # both batch nulls fell to the corpus null

    # null-free corpus: the batch nulls collapse within the batch only
    corpus2 = spark.createDataFrame([(0, "real text here")], SCHEMA)
    path2 = str(tmp_path / "idx2")
    write_dedup_index(corpus2, path2, n_buckets=2)
    idx2 = read_dedup_index(spark, path2)
    kept2 = {r["doc_id"] for r in incremental_dedup(batch, idx2).collect()}
    assert kept2 == {10, 12}  # min-id null survives
