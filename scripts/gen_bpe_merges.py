"""Regenerate the in-repo BPE merges fixture
(ocr_spark/resources/bpe_merges.txt) from the embedded seed text below.
Deterministic: same seed text + tie-break rule -> byte-identical fixture.

Usage: python scripts/gen_bpe_merges.py [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.functions.bpe import MERGES_PATH, bpe_train, save_merges

# Original seed prose (written for this fixture): ordinary English with the
# engine's own domain vocabulary, enough to learn common stems and suffixes.
SEED_TEXT = """
The extraction engine reads every document from the distributed store and
turns the raw bytes into clean text. Each page is scanned, the scanner finds
the regions that contain printed words, and the recognizer converts those
regions into characters with a confidence score. Pages that fail are marked
with an error and kept, because a record of the failure is more useful than
a silent hole in the corpus.

Training a language model starts with counting tokens. A tokenizer splits
the text into small pieces, and the number of pieces decides how much the
document costs to train on. Short documents with simple words produce few
tokens; long technical documents with rare terms produce many. Counting
these tokens early lets the pipeline budget the corpus before any expensive
processing happens.

Duplicate documents waste that budget. The deduplication stage fingerprints
every document, groups the fingerprints into buckets, and compares only the
documents that share a bucket. Near duplicates are clustered together and a
single representative of each cluster is kept. The remaining documents are
scored for quality, scrubbed of personal information, and written to the
output table partitioned for the next reader.

The same words appear again and again in real text: the, and, that, with,
from, have, this, were, which, there. Common endings repeat as well:
running, scanning, counting, processing, documents, clusters, pipelines,
partitions, representatives. A byte pair encoder learns these repetitions
and stores them as merge rules, so frequent words collapse into one or two
tokens while rare words fall back to smaller pieces.
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    merges = bpe_train([SEED_TEXT], n_merges=n)
    save_merges(merges)
    print(f"wrote {len(merges)} merges to {MERGES_PATH}")


if __name__ == "__main__":
    main()
