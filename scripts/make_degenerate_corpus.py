"""Synthesize an ADVERSARIAL corpus for twin-parity checking.

The sf0.01 driver corpus is benign: every document has words, a language,
a non-null id. The twin divergences the advisor keeps finding (rule_filter
on wordless docs, temperature_sample on null strata, blocklist NOT IN on
null domains) all live exactly in the inputs that corpus never exercises.
This script builds a corpus OF those inputs — empty/null/whitespace-only
text, control and zero-width junk, NFD spellings, mojibake, CRLF,
repeated-token spam, null lang/source/id, zero and null embedding vectors
— appended to the real sf0.001 rows so every query still has signal, and
writes it in the standard table layout. Then:

    python scripts/make_degenerate_corpus.py [dst_dir]
    python scripts/check_oracles.py [dst_dir]

runs ALL 50 query/oracle pairs over it: every pair must still hash-match.
This is the degenerate-input analog of the driver's correctness gate
(verify skill step 3 covers the extraction pipeline; this covers the
whole query board).
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# (text, lang, source) triples; None stays None. Ids are assigned past the
# source corpus's max so nothing collides.
ADVERSARIAL_DOCS: list[tuple[str | None, str | None, str | None]] = [
    ("", "en", "web"),                          # empty text
    ("   \n\t  \r\n ", "en", "web"),            # whitespace-only
    (None, "en", "web"),                        # null text
    ("a", "en", "web"),                         # single char
    ("!!! ??? *** --- ///", "en", "web"),       # symbols, zero words
    ("​zero‍width\x07bell\x00nul", "en", "web"),  # control/ZW junk
    ("cafÃ© naÃ¯ve", "fr", "web"),       # cp1252 mojibake
    ("line one\r\nline two\r\rline three", "en", "web"),     # CR/CRLF mix
    ("spam " * 200, "en", "web"),               # Gopher repetition extreme
    ("word " * 5000, "en", "web"),              # very long doc
    ("éclair déjà vu", "fr", "web"),       # NFD spellings
    ("hy-\nphen-\nated long-\nword", "en", "pdf"),           # hyphen repair
    ("<html><head><title>T</title></head><body><p>hello</p>"
     "<div class=nav><a href=/x>nav nav nav</a></div></body></html>",
     "en", "web"),                               # html-ish payload
    ("ordinary words here", None, "web"),        # null lang (null stratum)
    ("more ordinary words", "en", None),          # null source
    ("'''' '' '", "en", "web"),                  # apostrophes only (token re)
    ("éöü 中文 рус", "zh", "web"),
    (". . . . . . . .", "en", "web"),            # dots (mean_word_len edge)
    ("😀🎉 astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𐍈", "en", "web"),     # astral-plane code points
    ("مرحبا بالعالم hello שלום", "ar", "web"),   # RTL + mixed direction
    ("́̈ lone combining marks", "en", "web"),
    ("x" * 4000, "en", "web"),                   # one huge token
    ("same line\nsame line\nsame line", "en", "web"),  # self-boilerplate
]

# No NULL doc_id row here: the query board's SYNTHETIC-PAYLOAD harness
# derives html/pdf/url payloads from doc_id arithmetic on both engines, so
# a null id crashes the harness, not the product. Null-id semantics are
# covered where they're product behavior: the dedup edge-set tests
# (r4 ADVICE #3) and the null-stratum sampling guard (r4 ADVICE #4).


def main(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src_p = os.path.join(SRC, f"{t}.parquet")
        if t not in ("documents", "embeddings"):
            shutil.copyfile(src_p, os.path.join(dst, f"{t}.parquet"))
            continue

        orig = pq.read_table(src_p)
        if t == "documents":
            base = max(x for x in orig.column("doc_id").to_pylist()) + 1
            ids = [base + i for i in range(len(ADVERSARIAL_DOCS))]
            texts = [d[0] for d in ADVERSARIAL_DOCS]
            langs = [d[1] for d in ADVERSARIAL_DOCS]
            sources = [d[2] for d in ADVERSARIAL_DOCS]
            extra = pa.table(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": langs,
                    "source": sources,
                    "n_chars": [len(x) if x is not None else None for x in texts],
                },
                schema=orig.schema,
            )
        else:
            # no NULL embeddings/ids: the ANN operators' contract is
            # non-null vectors (failed encodes are filtered at ingestion —
            # the error-envelope stage); the adversarial edges here are the
            # zero vector (norm 0: divide-by-zero paths in cosine) and an
            # exact duplicate (ties in top-k ordering)
            vecs = orig.column("embedding").to_pylist()
            dim = len(next(v for v in vecs if v))
            vbase = max(x for x in orig.column("vec_id").to_pylist()) + 1
            extra = pa.table(
                {
                    "vec_id": [vbase, vbase + 1],
                    "embedding": [[0.0] * dim, vecs[0]],
                    "label": [None, orig.column("label")[0].as_py()],
                },
                schema=orig.schema,
            )
        pq.write_table(
            pa.concat_tables([orig, extra]), os.path.join(dst, f"{t}.parquet")
        )
    print(f"degenerate corpus written to {dst}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_corpus")
