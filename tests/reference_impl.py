"""Pure-Python executable stand-in for the reference semantics (SURVEY.md §5.2).

The reference repo does not run as committed (syntax errors — SURVEY.md §0), so
this module re-derives its behaviors directly from the code logic and serves as
the golden generator for tests. It is intentionally simple, readable,
row-at-a-time Python — a *separate* implementation from the Spark engine so
tests compare two independently-written codepaths.

Sources:
  clean_whitespace   ref ocr_components/postprocessing_module.py:45-82
  apply_rules        ref ocr_components/postprocessing_module.py:84-107
  process_output     ref ocr_components/postprocessing_module.py:109-158
  ctc_decode         ref ocr_components/local_ocr_engine.py:344-379
  assemble_result    ref ocr_components/local_ocr_engine.py:443-464
"""

from __future__ import annotations

import re

import numpy as np


def clean_whitespace(text: str) -> str:
    if not isinstance(text, str):
        return text
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = t.strip()
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r"\n{2,}", "\n", t)
    return t


def apply_rules(text: str, rules) -> str:
    if not isinstance(text, str):
        return text
    for find, repl in rules:
        text = text.replace(find, repl)
    return text


def validate_rules(raw_rules):
    valid = []
    if not isinstance(raw_rules, list):
        return valid
    for rule in raw_rules:
        if isinstance(rule, (list, tuple)) and len(rule) == 2 and all(isinstance(x, str) for x in rule):
            valid.append((rule[0], rule[1]))
    return valid


def process_output(text: str, rules=()) -> str:
    """Whitespace cleaning FIRST, custom rules SECOND (ref :130-146)."""
    return apply_rules(clean_whitespace(text), validate_rules(list(rules)))


def repair_hyphenation(text: str) -> str:
    """North-star T7: letter '-\\n' letter -> joined word."""
    return re.sub(r"([^\W\d_])-\n([^\W\d_])", r"\1\2", text)


def extract_text(text: str, rules=()) -> str:
    """Full text-kind pipeline: T1 -> T7 -> T2/T3/T4 -> T5."""
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = repair_hyphenation(t)
    t = t.strip()
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r"\n{2,}", "\n", t)
    return apply_rules(t, validate_rules(list(rules)))


def ctc_decode(logits: np.ndarray, charset: list[str]) -> list[tuple[str, float]]:
    """Greedy CTC decode with confidence (ref local_ocr_engine.py:344-379).

    logits: (batch, time, n_chars) where blank index == len(charset).
    Softmax per step; argmax path; drop blanks (blank resets the repeat run);
    collapse consecutive repeats; confidence = mean of kept per-char probs,
    0.0 if nothing kept.
    """
    blank = len(charset)
    exp = np.exp(logits - np.max(logits, axis=2, keepdims=True))
    probs = exp / np.sum(exp, axis=2, keepdims=True)
    out = []
    for i in range(probs.shape[0]):
        seq = probs[i]
        idxs = np.argmax(seq, axis=1)
        chars, confs = [], []
        last = -1
        for t, ci in enumerate(idxs):
            if ci == blank:
                last = -1
                continue
            if ci == last:
                continue
            if ci < len(charset):
                chars.append(charset[ci])
                confs.append(seq[t, ci])
            last = ci
        out.append(("".join(chars), float(np.mean(confs)) if confs else 0.0))
    return out


def assemble_result(parts_with_conf: list[tuple[str, float]]) -> tuple[str, float]:
    """A1 + A2 (ref local_ocr_engine.py:443-464).

    Error-text conf is zeroed (:448); full text joins non-error parts with
    '\\n' (:463); overall confidence = mean of conf>0 segments, else 0.0.
    """
    total, n = 0.0, 0
    texts = []
    for text, conf in parts_with_conf:
        if text.startswith("Error:") or text == "REC_FAIL":
            conf = 0.0
        else:
            texts.append(text)
        if conf > 0.0:
            total += conf
            n += 1
    return "\n".join(texts), (total / n) if n else 0.0
