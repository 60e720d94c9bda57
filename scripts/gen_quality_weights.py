"""Train the hashed-unigram logistic quality classifier offline and emit
the committed weight fixture `ocr_spark/resources/quality_lr.tsv`.

This is the model-based complement to the heuristic quality filters
(quality_score / rule_filter): real corpus builds layer a LEARNED quality
classifier (fastText-style linear model over hashed token features) on top
of the hand rules. The model here is deliberately tiny and fully
deterministic so the fixture is reproducible from this script alone:

  * features: unigram tokens ([a-z0-9]+ on lowercased text) hashed with
    the SAME cross-engine md5 hash (h32 % DIM) the Spark/DuckDB operators
    use, MEAN-pooled per document;
  * training data: synthesized here, seeded — positives are sentence-
    structured pseudo-English (Zipf-weighted content vocabulary over real
    English function words), negatives are the four archetypes quality
    classifiers exist to kill: character soup, single-token repetition,
    digit/symbol noise, and keyword-stuffing lists;
  * model: L2-regularized logistic regression, full-batch gradient
    descent in numpy, fixed iteration count — no randomness beyond the
    fixed seed;
  * export: integer MICRO-LOGIT weights (w * 1e6 rounded) so Spark and
    DuckDB aggregate exact integers and the decision threshold is
    engine-independent (same policy as unigram_logprob).

Run: python scripts/gen_quality_weights.py   (rewrites the fixture)
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np

DIM = 1024
SEED = 7
N_POS = 3000
N_NEG = 3000
ITERS = 600
LR = 0.5
L2 = 1e-4

FUNCTION_WORDS = (
    "the of and to a in is was for on that with as it by at from this be "
    "are or an has had not have but they which one you were all we can her "
    "his there been if more when will would who so no out up into than its "
    "then two may only over also your any these most us"
).split()

_SYL_A = "b c d f g l m n p r s t v w".split()
_SYL_B = "a e i o u ai ea ou".split()
_SYL_C = ["", "n", "r", "st", "ck", "l"]


def h32(token: str) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16)


def content_vocab(rng: random.Random, n: int = 1500) -> list[str]:
    vocab = set()
    while len(vocab) < n:
        w = "".join(
            rng.choice(_SYL_A) + rng.choice(_SYL_B) + rng.choice(_SYL_C)
            for _ in range(rng.randint(1, 3))
        )
        if 3 <= len(w) <= 12:
            vocab.add(w)
    return sorted(vocab)


def positive_doc(rng: random.Random, vocab: list[str]) -> str:
    # Zipf-ish content sampling + function-word scaffolding per sentence
    sents = []
    for _ in range(rng.randint(3, 8)):
        n = rng.randint(8, 20)
        words = []
        for _ in range(n):
            if rng.random() < 0.45:
                words.append(rng.choice(FUNCTION_WORDS))
            else:
                # discrete Zipf over the vocab
                r = min(int(rng.paretovariate(1.2)), len(vocab)) - 1
                words.append(vocab[r])
        words[0] = words[0].capitalize()
        sents.append(" ".join(words) + rng.choice([".", ".", ".", "?", "!"]))
    return " ".join(sents)


def negative_doc(rng: random.Random, vocab: list[str]) -> str:
    kind = rng.randrange(4)
    if kind == 0:  # character soup
        return " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(rng.randint(2, 14)))
            for _ in range(rng.randint(10, 60))
        )
    if kind == 1:  # single-token repetition
        w = rng.choice(vocab)
        return " ".join([w] * rng.randint(15, 80))
    if kind == 2:  # digit/symbol noise
        return " ".join(
            str(rng.randint(0, 10**6)) + rng.choice(["", "%", "$", "#"])
            for _ in range(rng.randint(10, 50))
        )
    # keyword stuffing: content words only, no function scaffolding
    pool = rng.sample(vocab, 12)
    return " ".join(rng.choice(pool) for _ in range(rng.randint(20, 80)))


def featurize(text: str) -> np.ndarray:
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    x = np.zeros(DIM)
    if not toks:
        return x
    for t in toks:
        x[h32(t) % DIM] += 1.0
    return x / len(toks)


def main() -> None:
    rng = random.Random(SEED)
    vocab = content_vocab(rng)
    docs = [(positive_doc(rng, vocab), 1) for _ in range(N_POS)] + [
        (negative_doc(rng, vocab), 0) for _ in range(N_NEG)
    ]
    X = np.stack([featurize(t) for t, _ in docs])
    y = np.array([lab for _, lab in docs], dtype=float)

    w = np.zeros(DIM)
    b = 0.0
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g / len(y) + L2 * w)
        b -= LR * g.mean()
    acc = ((X @ w + b > 0) == (y > 0.5)).mean()
    print(f"train accuracy: {acc:.4f}")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ocr_spark",
        "resources",
        "quality_lr.tsv",
    )
    with open(out, "w", encoding="utf-8") as f:
        f.write("# hashed-unigram logistic quality weights — generated by "
                "scripts/gen_quality_weights.py\n")
        f.write(f"#dim\t{DIM}\n")
        f.write(f"#bias\t{round(b * 1_000_000)}\n")
        n = 0
        for i, wi in enumerate(w):
            micro = round(wi * 1_000_000)
            if micro != 0:
                f.write(f"{i}\t{micro}\n")
                n += 1
    print(f"wrote {n} non-zero weights to {out}")


if __name__ == "__main__":
    main()
