"""Deterministic synthetic interleaved-spans corpus (FIXTURES.md §1).

Seeded generation (numpy default_rng, no wall clock) of the north-rule input
table. Text payloads exercise every golden behavior of the reference
postprocessor (CRLF/CR mixes, tab runs, newline runs, leading/trailing
whitespace, hyphen-at-line-break words, rule-trigger tokens), plus the
reference's own inline golden strings verbatim
(ref ocr_components/postprocessing_module.py:170,197 and
ocr_workflow_orchestrator.py:406).

~5% of docs are "media-heavy" skew docs with 256-1024 media spans, which is
what the salted repartition in the pipeline exists to defeat.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# Deterministic text templates. {h} marks a hyphen-linebreak site (T7).
_TEXT_TEMPLATES = [
    "  Hello \t World!  \n\n\nThis is a   test. \r\nNew line.\rAnother.  ",
    "  Ths is hte wrold ( example !. ).  \n\nExtra   spaces.  ",
    "Text from DummyLocalEngine for Orchestratr, a dumy engine.",
    "plain paragraph {i} with no  anomalies beyond double space",
    "leading\ttab and trailing space {i} ",
    "\r\ncarriage {i} return\rmix\r\n\r\nlines",
    "hyphen exam-\nple broken wor-\nds in doc {i}",
    "many\n\n\n\nblank\n\n\nlines {i}",
    "   \n\t\n   ",
    "Line1\n  Line2  \nLine3 of {i}",
    "token hte appears {i} times alongside wrold",
    "A sentence spanning doc {i}.\nSecond line.\tTabbed end\t",
    "unicode café naïve {i} résumé with spaces  and tab\t.",
    "numbers 12-\n34 must NOT join but alpha ab-\ncd must in {i}",
]

_HTML_TEMPLATES = [
    # nav/header/footer boilerplate around a main content div (FIXTURES.md §1)
    (
        "<html><head><title>Doc {i}</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/x'>Products</a> <a href='/y'>About</a></nav>"
        "<div id='main'><h1>Article {i}</h1>"
        "<p>This is the principal article body of document {i}. It carries several "
        "sentences of real content so the text density is high and link density low. "
        "Main content should always survive extraction.</p>"
        "<p>A second paragraph keeps the content block dominant in document {i}.</p></div>"
        "<footer><a href='/tos'>Terms</a> <a href='/priv'>Privacy</a> copyright</footer>"
        "</body></html>"
    ),
    (
        "<html><body>"
        "<div class='menu'><a href='/a'>a</a><a href='/b'>b</a><a href='/c'>c</a>"
        "<a href='/d'>d</a><a href='/e'>e</a></div>"
        "<article><p>Short real text {i} of the page.</p>"
        "<p>It has enough words to count as content for extraction purposes {i}.</p>"
        "</article>"
        "<div class='related'><a href='/r1'>rel one</a> <a href='/r2'>rel two</a></div>"
        "</body></html>"
    ),
    (
        "<html><body><header><a href='/login'>Login</a><a href='/join'>Join</a></header>"
        "<section><p>Body paragraph alpha {i} containing a meaningful amount of prose "
        "with an inline <a href='/ref'>reference link</a> inside real text.</p></section>"
        "<aside><a href='/ad1'>ad</a><a href='/ad2'>ad</a><a href='/ad3'>ad</a></aside>"
        "</body></html>"
    ),
]

_WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta page "
    "block column reading order text line word glyph"
).split()


def _pdf_payload(rng: np.random.Generator, i: int) -> str:
    """Synthetic page layout: JSON list of blocks (bbox + text), 1-2 columns.

    Blocks are emitted in a SHUFFLED order; XY-cut must recover reading order.
    """
    import json

    two_col = bool(rng.integers(0, 2))
    blocks = []
    n_rows = int(rng.integers(2, 5))
    page_w, page_h = 612, 792
    y = 50
    bid = 0
    for r in range(n_rows):
        h = int(rng.integers(40, 90))
        if two_col:
            for cx in (40, 320):
                blocks.append(
                    {
                        "x": cx,
                        "y": y,
                        "w": 250,
                        "h": h,
                        "text": f"{_WORDS[(i + bid) % len(_WORDS)]} block {bid} doc {i}",
                    }
                )
                bid += 1
        else:
            blocks.append(
                {
                    "x": 60,
                    "y": y,
                    "w": 490,
                    "h": h,
                    "text": f"{_WORDS[(i + bid) % len(_WORDS)]} block {bid} doc {i}",
                }
            )
            bid += 1
        y += h + 20
    order = rng.permutation(len(blocks)).tolist()
    return json.dumps(
        {"page_w": page_w, "page_h": page_h, "blocks": [blocks[j] for j in order]},
        sort_keys=True,
    )


def media_ref_for(doc_id: str, k: int) -> str:
    return f"media://{doc_id}/{k:04d}"


from ocr_spark.sources.media import synth_media_bytes  # noqa: F401  (re-export)


def generate_docs(n_docs: int, seed: int = SEED) -> list[dict]:
    """Generate n_docs interleaved documents as python dicts (deterministic).

    Doc i is seeded by (seed, i), so the corpus is a stable prefix: the first
    k docs are identical at every scale (lets tests and bench share goldens).
    """
    return generate_docs_chunk(0, n_docs, seed)


def _arrow_table(docs: list[dict]) -> pa.Table:
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], pa.list_(span_type)),
        }
    )


def write_docs_parquet(path: str, n_docs: int, seed: int = SEED, row_group_docs: int = 250) -> str:
    """Write the synthetic corpus as parquet (Iceberg-layout stand-in).

    Bounded memory: generate + write in chunks so bench-scale corpora don't
    materialize fully on the driver. Row groups are kept small (250 docs) so
    Spark's byte-ranged split planning can parallelize the scan even for a
    single small file — a 2000-doc row group capped scan parallelism at ~10
    tasks and serialized the shuffle-write side of the salted repartition.
    """
    writer = None
    try:
        for start in range(0, n_docs, row_group_docs):
            cnt = min(row_group_docs, n_docs - start)
            # chunk determinism: one rng seeded per chunk index keeps chunks
            # independent of total size
            docs = generate_docs_chunk(start, cnt, seed)
            tbl = _arrow_table(docs)
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    return path


def generate_docs_chunk(start: int, count: int, seed: int = SEED) -> list[dict]:
    """Deterministic chunk: doc i is generated from rng seeded by (seed, i)."""
    docs = []
    ss = np.random.SeedSequence(seed)
    for i in range(start, start + count):
        rng = np.random.default_rng(np.random.SeedSequence(entropy=ss.entropy, spawn_key=(i,)))
        docs.extend(_one_doc(rng, i))
    return docs


def _one_doc(rng: np.random.Generator, i: int) -> list[dict]:
    doc_id = f"doc-{i:08d}"
    heavy = rng.random() < 0.05
    if heavy:
        n_spans = int(rng.integers(256, 1025))
    else:
        n_spans = min(64, 1 + int(rng.geometric(1 / 8.0)))
    spans = []
    media_k = 0
    for off in range(n_spans):
        if heavy and off >= 4:
            kind = "media"
        else:
            kind = ["text", "text", "text", "html", "pdf", "ocr", "media"][
                int(rng.integers(0, 7))
            ]
        text = None
        media_ref = None
        if kind == "text":
            tpl = _TEXT_TEMPLATES[int(rng.integers(0, len(_TEXT_TEMPLATES)))]
            text = tpl.replace("{i}", str(i))
        elif kind == "html":
            tpl = _HTML_TEMPLATES[int(rng.integers(0, len(_HTML_TEMPLATES)))]
            text = tpl.replace("{i}", str(i))
        elif kind == "pdf":
            text = _pdf_payload(rng, i)
        else:
            media_ref = media_ref_for(doc_id, media_k)
            media_k += 1
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
    return [{"doc_id": doc_id, "spans": spans}]
