"""Text analysis for large-scale training-data pipelines (task directive):
language-ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting. All native Catalyst expressions (codegen, no UDFs),
each with a DuckDB-SQL twin for the correctness oracle.

The shared cross-engine hash primitive is h32(x) = int(md5(x)[0:8], 16) —
identical in Spark (conv) and DuckDB ('0x'||…::BIGINT), used by dedup and
fingerprinting so oracles can verify hash-dependent operators exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared deterministic 32-bit hash (cross-engine)
# ---------------------------------------------------------------------------


def h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def h60(col: Column) -> Column:
    """60-bit cross-engine hash (15 md5 hex chars — fits a signed BIGINT).
    Used where 32 bits would collide at corpus scale (shingle keys)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# token counting: whitespace tokens + a BPE-ish word/punct regex
# ---------------------------------------------------------------------------

_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: Column) -> Column:
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def ws_token_count_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE length(regexp_split_to_array(trim({expr}), '\\s+')) END::BIGINT"
    )


def bpe_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_PATTERN), 0)).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    return f"length(regexp_extract_all({expr}, '{_BPE_PATTERN}'))::BIGINT"


# ---------------------------------------------------------------------------
# quality scoring: alpha ratio, punctuation ratio, stopword ratio, mean word
# length — a deterministic blend in [0,1] (doc-quality heuristics in the
# Gopher/C4 tradition, re-derived as pure SQL expressions)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
_PUNCT = r"[.,;:!?'\"()\[\]{}-]"


def _count_re(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("double")


def quality_score(col: Column) -> Column:
    lower = F.lower(col)
    n_chars = F.greatest(F.length(col).cast("double"), F.lit(1.0))
    n_alpha = _count_re(col, r"[A-Za-z]")
    n_punct = _count_re(col, _PUNCT)
    n_words = ws_token_count(col).cast("double")
    stop_pat = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = _count_re(lower, stop_pat)
    alpha_ratio = n_alpha / n_chars
    punct_ratio = F.least(n_punct / F.greatest(n_words, F.lit(1.0)), F.lit(1.0))
    stop_ratio = F.least(n_stop / F.greatest(n_words, F.lit(1.0)), F.lit(0.5)) * 2.0
    score = alpha_ratio * 0.5 + stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.2
    return F.round(score, 6)


def quality_score_sql(expr: str) -> str:
    stop_pat = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    punct_sql = _PUNCT.replace("'", "''")
    n_chars = f"greatest(length({expr})::DOUBLE, 1.0)"
    n_alpha = f"length(regexp_extract_all({expr}, '[A-Za-z]'))::DOUBLE"
    n_punct = f"length(regexp_extract_all({expr}, '{punct_sql}'))::DOUBLE"
    n_words = f"({ws_token_count_sql(expr)})::DOUBLE"
    n_stop = f"length(regexp_extract_all(lower({expr}), '{stop_pat}'))::DOUBLE"
    alpha_ratio = f"({n_alpha} / {n_chars})"
    punct_ratio = f"least({n_punct} / greatest({n_words}, 1.0), 1.0)"
    stop_ratio = f"(least({n_stop} / greatest({n_words}, 1.0), 0.5) * 2.0)"
    return (
        f"round({alpha_ratio} * 0.5 + {stop_ratio} * 0.3 "
        f"+ (1.0 - {punct_ratio}) * 0.2, 6)"
    )


# ---------------------------------------------------------------------------
# language ID: per-language stopword-hit counts, argmax with deterministic
# tie-break (en > de > fr > es lexicographic on count desc, lang asc), 'und'
# when nothing matches
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "que", "dans"),
    "es": ("el", "los", "las", "es", "que", "por", "con"),
}


def _lang_count(col: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 0)).cast("long")


def lang_id(col: Column) -> Column:
    counts = {lang: _lang_count(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*counts.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: lang asc
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def lang_id_sql(expr: str) -> str:
    def cnt(lang):
        pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        return f"length(regexp_extract_all(lower({expr}), '{pat}'))::BIGINT"

    counts = {lang: cnt(lang) for lang in LANG_MARKERS}
    best = "greatest(" + ", ".join(counts.values()) + ")"
    whens = " ".join(
        f"WHEN {counts[lang]} = {best} THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


# ---------------------------------------------------------------------------
# document fingerprint: md5 of casefolded alphanumeric-normalized text
# (rolling-hash-class canonical fingerprint; exact-dup key)
# ---------------------------------------------------------------------------


def fingerprint(col: Column) -> Column:
    return F.md5(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# PII scrubbing: ordered regex replacements with placeholders (training-data
# hygiene pass; patterns restricted to the RE2 ∩ Java-regex common subset so
# the DuckDB twin is exact)
# ---------------------------------------------------------------------------

# (pattern, replacement) in application order — later rules see earlier output
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d{3}[- ]\d{3,4}[- ]\d{4}", "<PHONE>"),
]


def pii_scrub(col: Column, rules: list[tuple[str, str]] | None = None) -> Column:
    """Replace PII-shaped substrings with typed placeholders. Pure
    regexp_replace chain — whole-stage codegen, no UDF."""
    out = col
    for pat, rep in rules or PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_scrub_sql(expr: str, rules: list[tuple[str, str]] | None = None) -> str:
    out = expr
    for pat, rep in rules or PII_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return out
