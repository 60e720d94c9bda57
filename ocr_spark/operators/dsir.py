"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv 2302.03169, public method).

Select raw-corpus documents whose hashed-n-gram distribution looks like a
TARGET corpus (the "make my crawl look like Wikipedia+books" selector every
modern pretraining build runs): fit bucketed unigram+bigram bag-of-words
models on a target sample and on the raw corpus, score each raw doc with the
per-bucket log-probability-ratio sum, then resample with the Gumbel top-k
trick so the kept set is a DRAW from the importance-weighted distribution —
the paper's key point is that a hard top-score cut collapses onto
near-duplicates of the target, while Gumbel noise preserves diversity.

Reference-parity anchor: the reference engine has no data-selection stage
(its per-image quality gates are the closest analog,
`ocr_components/local_ocr_engine.py:181-191` score filtering); this operator
is part of the large-scale-training-data extension the task brief mandates.

Engine conventions (shared with quality_classifier / ngram_perplexity):

* tokenizer — ``[a-z0-9]+`` runs of lowercased text (``_clf_tokens``);
  grams = unigrams + space-joined bigrams, hashed with the cross-engine
  ``h32`` (md5 prefix) into ``dim`` buckets.
* every transcendental is quantized to INTEGER MICRO-NATS via
  ``floor(ln(x) * 1e6)`` before any aggregation, so partial-sum order can
  never perturb a result and the DuckDB twin is exact, not approximate.
* randomness is the deterministic ``h60`` hash of (id, seed) — reproducible
  under any partitioning, re-drawable by changing the seed.

Scale shape (the 100 TB story):

* ``dsir_fit`` — ONE explode + map-side-combined groupBy per corpus, keyed
  by the ``dim``-bounded bucket id; the result is ≤ ``dim`` rows by
  construction, collected driver-side like every other model artifact
  (quality_lr, lang profiles, BPE merges).
* ``dsir_weights`` — explode + ONE broadcast equi-join against the ≤dim-row
  log-ratio table + one partial-agg shuffle keyed by doc id. The corpus
  never joins anything non-broadcast and never shuffles whole.
* ``dsir_resample`` — global top-k = ``orderBy(...).limit(k)`` which Spark
  plans as TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows), NOT a full sort.

Length bias: the paper scores fixed-size CHUNKS; the raw log-ratio sum
grows with doc length. ``dsir_weights`` therefore also emits
``avg_lr_micro`` (floored per-gram mean); pass ``score_col="avg_lr_micro"``
to ``dsir_resample`` for unchunked corpora, or feed ``chunk_docs`` output.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.text_analysis import _clf_tokens, h32, h32_sql, h60_sql
from ocr_spark.operators.corpus_clean import _sql_str

__all__ = [
    "dsir_fit",
    "dsir_fit_sql",
    "dsir_weights",
    "dsir_weights_sql",
    "dsir_resample",
    "dsir_resample_sql",
]


# ---------------------------------------------------------------------------
# gram extraction — unigrams + bigrams, shared verbatim by both engines
# ---------------------------------------------------------------------------


def _dsir_grams(col: Column) -> Column:
    """array<string> of unigrams + space-joined bigrams of the clf tokens."""
    w = _clf_tokens(col)
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(w, bigrams)


def _dsir_grams_sql(expr: str) -> str:
    """DuckDB twin of _dsir_grams (1-indexed lists, range end-exclusive)."""
    ws = (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )
    return (
        f"list_concat({ws}, list_transform("
        f"range(1, greatest(len({ws}) - 1, 0) + 1),"
        f" i -> {ws}[i] || ' ' || {ws}[i + 1]))"
    )


# ---------------------------------------------------------------------------
# fit — per-bucket smoothed log-ratio table
# ---------------------------------------------------------------------------


def _lr_micro(tc: int, t_tot: int, rc: int, r_tot: int, dim: int) -> int:
    """floor(1e6 * (ln((tc+1)/(t_tot+dim)) - ln((rc+1)/(r_tot+dim)))).

    Laplace(1) smoothing on BOTH sides so unseen buckets are finite; the
    two ln() calls are kept separate (not folded into one ratio) because
    that is the exact expression the SQL twin evaluates — IEEE doubles
    agree only if the operation sequence does.
    """
    return math.floor(
        (
            math.log((tc + 1) / (t_tot + dim))
            - math.log((rc + 1) / (r_tot + dim))
        )
        * 1_000_000.0
    )


def _bucket_counts(docs: DataFrame, text_col: str, dim: int) -> dict[int, int]:
    rows = (
        docs.select(F.explode(_dsir_grams(F.col(text_col))).alias("_g"))
        .select(F.pmod(h32(F.col("_g")), F.lit(dim)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    )
    return {r["bucket"]: r["c"] for r in rows}


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    dim: int = 8192,
    text_col: str = "text",
) -> dict:
    """Fit the hashed-n-gram importance model.

    Returns ``{"dim": dim, "t_total": T, "r_total": R,
    "buckets": [(bucket, lr_micro), ...]}`` — only buckets observed in
    EITHER corpus are materialized; absent buckets share one closed-form
    default ``lr0_micro = _lr_micro(0, T, 0, R, dim)`` (both counts 0),
    carried in the dict so scoring needs no dense table.

    Two explode+groupBy passes (one per corpus), each reducing to ≤ dim
    rows before the driver ever sees data — the model-artifact pattern.
    """
    tcounts = _bucket_counts(target, text_col, dim)
    rcounts = _bucket_counts(raw, text_col, dim)
    t_tot = sum(tcounts.values())
    r_tot = sum(rcounts.values())
    buckets = sorted(
        (b, _lr_micro(tcounts.get(b, 0), t_tot, rcounts.get(b, 0), r_tot, dim))
        for b in set(tcounts) | set(rcounts)
    )
    return {
        "dim": dim,
        "t_total": t_tot,
        "r_total": r_tot,
        "lr0_micro": _lr_micro(0, t_tot, 0, r_tot, dim),
        "buckets": buckets,
    }


def dsir_fit_sql(
    target_src: str = "SELECT text FROM documents WHERE source = 'web'",
    raw_src: str = "SELECT text FROM documents",
    dim: int = 8192,
) -> str:
    """DuckDB twin of dsir_fit: returns (bucket, lr_micro) rows over the
    same hashing, smoothing, quantization, and operation sequence."""
    tg = _dsir_grams_sql("text")
    return f"""
WITH tb AS (SELECT {h32_sql('g')} % {dim} AS bucket
            FROM (SELECT unnest({tg}) AS g FROM ({target_src}))),
rb AS (SELECT {h32_sql('g')} % {dim} AS bucket
       FROM (SELECT unnest({_dsir_grams_sql('text')}) AS g FROM ({raw_src}))),
tc AS (SELECT bucket, count(*)::BIGINT AS c FROM tb GROUP BY bucket),
rc AS (SELECT bucket, count(*)::BIGINT AS c FROM rb GROUP BY bucket),
tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS t_total,
               (SELECT coalesce(sum(c), 0) FROM rc) AS r_total)
SELECT bucket,
       floor((ln((coalesce(tc.c, 0) + 1)::DOUBLE / (tot.t_total + {dim}))
            - ln((coalesce(rc.c, 0) + 1)::DOUBLE / (tot.r_total + {dim})))
             * 1000000.0)::BIGINT AS lr_micro
FROM tc FULL JOIN rc USING (bucket) CROSS JOIN tot
ORDER BY bucket
""".strip()


# ---------------------------------------------------------------------------
# per-doc importance weights
# ---------------------------------------------------------------------------


def dsir_weights(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_grams, lr_micro, avg_lr_micro): per-doc log importance
    weight in micro-nats — the sum over the doc's hashed grams of the
    model's per-bucket log ratio (absent buckets score lr0_micro).

    Gram-less docs (empty/null/symbol-only text) carry NO evidence either
    way: n_grams = 0 and both scores NULL — dsir_resample never selects
    them (documented; matches the quality_classifier zero-token rule)."""
    spark = docs.sparkSession
    dim = model["dim"]
    lr0 = model["lr0_micro"]
    wtab = spark.createDataFrame(
        model["buckets"] or [(-1, 0)], "bucket long, lr_micro long"
    )
    e = docs.select(
        F.col(id_col), F.explode(_dsir_grams(F.col(text_col))).alias("_g")
    ).select(id_col, F.pmod(h32(F.col("_g")), F.lit(dim)).alias("bucket"))
    g = (
        e.join(F.broadcast(wtab), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("lr_micro"), F.lit(lr0)))
            .cast("long")
            .alias("lr_micro"),
        )
        .select(
            id_col,
            "n_grams",
            "lr_micro",
            F.floor(F.col("lr_micro") / F.col("n_grams"))
            .cast("long")
            .alias("avg_lr_micro"),
        )
    )
    # re-attach gram-less docs via filter + UNION, not a corpus-wide join
    # (the quality_classifier pattern — a left join back to docs is a full
    # SortMergeJoin shuffle at scale)
    empties = docs.where(
        F.coalesce(F.size(_clf_tokens(F.col(text_col))), F.lit(0)) <= 0
    ).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_grams"),
        F.lit(None).cast("long").alias("lr_micro"),
        F.lit(None).cast("long").alias("avg_lr_micro"),
    )
    return g.unionByName(empties)


def _model_values(model: dict) -> str:
    rows = model["buckets"]
    if not rows:
        return "(-1, 0)"
    return ", ".join(f"({b}, {w})" for b, w in rows)


def dsir_weights_sql(
    model: dict,
    src: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of dsir_weights over `src`, consuming the SAME fitted
    model as a VALUES table."""
    dim = model["dim"]
    lr0 = model["lr0_micro"]
    return f"""
WITH src AS ({src}),
gr AS (SELECT {id_col}, unnest({_dsir_grams_sql('text')}) AS g FROM src),
bk AS (SELECT {id_col}, {h32_sql('g')} % {dim} AS bucket FROM gr),
w AS (SELECT * FROM (VALUES {_model_values(model)}) AS t(bucket, lr_micro)),
sc AS (SELECT {id_col}, count(*)::BIGINT AS n_grams,
              sum(coalesce(w.lr_micro, {lr0}))::BIGINT AS lr_micro
       FROM bk LEFT JOIN w USING (bucket) GROUP BY {id_col})
SELECT src.{id_col},
       coalesce(sc.n_grams, 0) AS n_grams,
       sc.lr_micro,
       floor(sc.lr_micro / sc.n_grams)::BIGINT AS avg_lr_micro
FROM src LEFT JOIN sc USING ({id_col})
""".strip()


# ---------------------------------------------------------------------------
# Gumbel top-k resampling
# ---------------------------------------------------------------------------

_H60_RANGE = float(1 << 60)


def _gumbel_micro(id_col: str, seed: str) -> Column:
    """floor(1e6 * -ln(-ln(u))), u = (h60(id:seed)+1) / (2^60+1) ∈ (0,1).

    Deterministic per (id, seed): the exact-reproducibility convention
    every sampler in this engine follows (h32 Bernoulli in
    stratified_sample, shuffle_key's h60 order key)."""
    from ocr_spark.operators.text_analysis import h60

    u = (
        h60(F.concat(F.col(id_col), F.lit(":" + seed))).cast("double")
        + F.lit(1.0)
    ) / F.lit(_H60_RANGE + 1.0)
    # the top ~128 hash values round u to exactly 1.0 in double, where the
    # Gumbel is +inf (DuckDB's floor(inf)::BIGINT raises; Spark saturates —
    # a cross-engine divergence at ~1e-16/doc, i.e. EXPECTED at 10^12 docs).
    # Clamp to the largest double < 1 in BOTH engines.
    u = F.least(u, F.lit(1.0 - 2.0**-53))
    return F.floor(-F.log(-F.log(u)) * F.lit(1_000_000.0)).cast("long")


def dsir_resample(
    weighted: DataFrame,
    k: int,
    seed: str = "dsir",
    id_col: str = "doc_id",
    score_col: str = "lr_micro",
) -> DataFrame:
    """Top-k of score + Gumbel(0,1) micro-noise — a deterministic,
    re-drawable sample from the importance-weighted distribution
    (Gumbel top-k trick; equals hard top-k as weights dominate and uniform
    sampling as they flatten). NULL-score (gram-less) docs are never
    selected. Ties (same perturbed key) break on id ascending.

    Plan: one codegen'd projection + TakeOrderedAndProject(k) — no full
    sort, no shuffle of the corpus."""
    key = (F.col(score_col) + _gumbel_micro(id_col, seed)).alias("gumbel_key")
    return (
        weighted.where(F.col(score_col).isNotNull())
        .select("*", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )


def dsir_resample_sql(
    model: dict,
    k: int,
    seed: str = "dsir",
    src: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    score_col: str = "lr_micro",
) -> str:
    """DuckDB twin of dsir_weights → dsir_resample composed."""
    hid = f"{id_col} || '{_sql_str(':' + seed)}'"
    # NOT the literal 0.9999999999999999: DuckDB parses that as
    # DECIMAL(17,16) whose DOUBLE cast rounds to 1.0 (the int64 mantissa
    # 9999999999999999 > 2^53). The arithmetic form is exact in both engines.
    u = (
        f"least((({h60_sql(hid)})::DOUBLE + 1.0) / {_H60_RANGE + 1.0:.1f},"
        f" 1.0::DOUBLE - pow(2.0::DOUBLE, -53))"
    )
    return f"""
WITH wt AS ({dsir_weights_sql(model, src=src, id_col=id_col)})
SELECT *, ({score_col} + floor(-ln(-ln({u})) * 1000000.0)::BIGINT)
           AS gumbel_key
FROM wt WHERE {score_col} IS NOT NULL
ORDER BY gumbel_key DESC, {id_col} LIMIT {k}
""".strip()
