"""Corpus summary report — the single-page statistics block every corpus
release publishes (dataset cards, C4/Gopher/RefinedWeb-style tables):
volume, token totals, language mix, domain diversity, doc-length
distribution.

Two operators, each ONE aggregation pass over the corpus:

  * `corpus_stats` — one summary row. Exact mode has a DuckDB twin
    (oracle-checkable); `approx=True` swaps the two scale-hostile
    aggregates for their sketch forms — approx_count_distinct (HyperLogLog++,
    fixed-size mergeable state vs an exact distinct's full shuffle of the
    key set) and percentile_approx (Greenwald-Khanna) — the 10^12-doc path,
    tested within the sketches' published error bounds against exact.
  * `lang_histogram` — per-language doc/token counts with integer-ppm
    shares (exact twin; shares use int64 `div` so both engines agree
    bit-for-bit, the repo's float policy).

Scale shape: both are single groupBy/agg passes with map-side partial
aggregation; `corpus_stats` aggregates to ONE row (no shuffle pressure at
any scale), `lang_histogram` shuffles only the ~hundreds-row language key.
The total-docs denominator rides a broadcast 1-row crossJoin (the
rule_filter_report pattern), never a second corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_spark.operators.corpus_clean import ws_tokens, ws_tokens_sql
from ocr_spark.functions.url import registrable_domain, registrable_domain_sql


def _ntok(text_col: str):
    """Per-doc whitespace token count; NULL text → NULL (excluded from
    sums/percentiles in both engines — DuckDB's len(NULL) is NULL). The
    explicit isNotNull guard pins that invariant independent of ANSI mode:
    with spark.sql.ansi.enabled=false, size(NULL) is -1 (legacy
    sizeOfNull) and would silently skew totals while the twin returned
    NULLs."""
    return F.when(
        F.col(text_col).isNotNull(), F.size(ws_tokens(F.col(text_col)))
    ).cast("long")


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    url_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row: n_docs, n_null_text, n_empty_text, total_chars,
    total_tokens, mean_doc_tokens (micro-token integer), p50/p90 doc
    tokens, n_langs, and (when url_col given) n_domains.

    Exact mode is the oracle/test path; approx=True is the corpus-scale
    path (HLL distinct, GK percentiles) with identical column names so a
    report pipeline can flip the flag without downstream changes."""
    base = docs.select(
        F.col(text_col).alias("__t"),
        F.col(lang_col).alias("__l"),
        _ntok(text_col).alias("__nt"),
        *(
            [registrable_domain(F.col(url_col)).alias("__d")]
            if url_col
            else []
        ),
    )
    if approx:
        distinct_l = F.approx_count_distinct("__l")
        p50 = F.percentile_approx("__nt", F.lit(0.5), F.lit(10_000))
        p90 = F.percentile_approx("__nt", F.lit(0.9), F.lit(10_000))
    else:
        distinct_l = F.count_distinct("__l")
        p50 = F.percentile("__nt", F.lit(0.5)).cast("long")
        p90 = F.percentile("__nt", F.lit(0.9)).cast("long")
    # empty-corpus contract (pinned in BOTH engines): counts/sums are 0,
    # mean and percentiles are NULL (no docs to average) — coalesce the
    # sums and guard the zero-division, or DuckDB would return NULL sums
    # and raise on `// 0` while Spark nulls silently
    zsum = lambda c, name: F.coalesce(F.sum(c), F.lit(0)).alias(name)  # noqa: E731
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        zsum(F.col("__t").isNull().cast("long"), "n_null_text"),
        zsum(
            (F.col("__t").isNotNull() & (F.length(F.trim("__t")) == 0)).cast(
                "long"
            ),
            "n_empty_text",
        ),
        zsum(F.coalesce(F.length("__t"), F.lit(0)), "total_chars"),
        zsum(F.col("__nt"), "total_tokens"),
        F.expr(
            "CASE WHEN count(1) = 0 THEN NULL"
            " ELSE sum(__nt) * 1000000 div count(1) END"
        ).alias("mean_doc_utokens"),
        p50.cast("long").alias("p50_doc_tokens"),
        p90.cast("long").alias("p90_doc_tokens"),
        distinct_l.cast("long").alias("n_langs"),
    ]
    if url_col:
        aggs.append(
            (
                F.approx_count_distinct("__d")
                if approx
                else F.count_distinct("__d")
            )
            .cast("long")
            .alias("n_domains")
        )
    return base.agg(*aggs)


def corpus_stats_sql(
    src: str,
    text_col: str = "text",
    lang_col: str = "lang",
    url_col: str | None = None,
) -> str:
    """DuckDB twin of exact-mode corpus_stats. DuckDB's continuous
    quantile matches Spark's F.percentile (linear interpolation), and the
    long-cast truncation is applied identically."""
    nt = f"len({ws_tokens_sql(text_col)})"
    return f"""
WITH b AS (SELECT {text_col} AS t, {lang_col} AS l, {nt}::BIGINT AS ntok
                  {"," + registrable_domain_sql(url_col) + " AS d" if url_col else ""}
           FROM ({src}))
SELECT count(*)::BIGINT AS n_docs,
       coalesce(sum((t IS NULL)::BIGINT), 0)::BIGINT AS n_null_text,
       coalesce(sum((t IS NOT NULL AND length(trim(t)) = 0)::BIGINT), 0)::BIGINT AS n_empty_text,
       coalesce(sum(coalesce(length(t), 0)), 0)::BIGINT AS total_chars,
       coalesce(sum(ntok), 0)::BIGINT AS total_tokens,
       (CASE WHEN count(*) = 0 THEN NULL
             ELSE sum(ntok) * 1000000 // count(*) END)::BIGINT AS mean_doc_utokens,
       trunc(quantile_cont(ntok, 0.5))::BIGINT AS p50_doc_tokens,
       trunc(quantile_cont(ntok, 0.9))::BIGINT AS p90_doc_tokens,
       count(DISTINCT l)::BIGINT AS n_langs
       {", count(DISTINCT d)::BIGINT AS n_domains" if url_col else ""}
FROM b
"""


def lang_histogram(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """(lang, n_docs, n_tokens, share_ppm) — null langs kept as their own
    row (a real crawl signal, not noise). share_ppm = docs-share in
    integer parts-per-million (int64 div, twin-exact)."""
    per = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_ntok(text_col)).alias("n_tokens"),
    )
    # the denominator is a whole-frame window over the TINY per-language
    # frame (hundreds of rows → one single-partition exchange of that
    # frame), not a second corpus aggregation: a separate per.agg branch
    # would be column-pruned into a DIFFERENT aggregate and re-scan the
    # corpus (no exchange reuse) — caught by the plan test
    return per.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("n_docs * 1000000 div (sum(n_docs) OVER ())").alias(
            "share_ppm"
        ),
    )


def lang_histogram_sql(
    src: str, text_col: str = "text", lang_col: str = "lang"
) -> str:
    nt = f"len({ws_tokens_sql(text_col)})"
    return f"""
WITH b AS (SELECT {lang_col} AS lang, {nt}::BIGINT AS ntok FROM ({src})),
per AS (SELECT lang, count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS n_tokens
        FROM b GROUP BY lang),
tot AS (SELECT count(*)::BIGINT AS total FROM b)
SELECT lang, n_docs, n_tokens, (n_docs * 1000000 // total)::BIGINT AS share_ppm
FROM per, tot
"""


# ---------------------------------------------------------------------------
# domain-level quality curation: aggregate per-doc quality signals to the
# registrable domain and DERIVE a blocklist from them — the closed loop
# between the quality layer (text_analysis) and the URL hygiene layer
# (functions/url.blocklist_filter). Real corpus builds maintain their
# blocklists this way: a domain whose pages are overwhelmingly junk is
# cheaper to drop at the URL stage (before fetch/decode) than per-page.
# ---------------------------------------------------------------------------


def domain_quality_stats(
    docs: DataFrame,
    score_col: str,
    url_col: str = "url",
    keep_threshold_micro: int = 450_000,
) -> DataFrame:
    """(domain, n_docs, mean_score_micro, bad_ppm): per-registrable-domain
    aggregation of an integer-micro quality score (quality_score·1e6,
    quality_classifier logits, or ngram_perplexity micro-nats — any
    HIGHER-IS-BETTER integer column). `bad_ppm` = fraction of the domain's
    docs scoring BELOW keep_threshold_micro, in integer ppm (int64 div —
    twin-exact). Docs with a NULL url/domain or NULL score are excluded
    (they carry no domain evidence).

    ONE groupBy shuffle on the domain key; integer sums keep the mean
    deterministic (sum first, ONE division at the end — the repo's float
    policy)."""
    dom = registrable_domain(F.col(url_col))
    base = docs.select(
        dom.alias("domain"), F.col(score_col).cast("long").alias("__s")
    ).where(F.col("domain").isNotNull() & F.col("__s").isNotNull())
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(__s) div count(1)").alias("mean_score_micro"),
        F.expr(
            f"sum(CASE WHEN __s < {int(keep_threshold_micro)} THEN 1 ELSE 0 END)"
            " * 1000000 div count(1)"
        ).alias("bad_ppm"),
    )


def domain_quality_stats_sql(
    src: str,
    score_expr: str,
    url_expr: str = "url",
    keep_threshold_micro: int = 450_000,
) -> str:
    dom = registrable_domain_sql(url_expr)
    return f"""
WITH b AS (SELECT {dom} AS domain, ({score_expr})::BIGINT AS s FROM ({src}))
SELECT domain, count(*)::BIGINT AS n_docs,
       (sum(s) // count(*))::BIGINT AS mean_score_micro,
       (sum(CASE WHEN s < {int(keep_threshold_micro)} THEN 1 ELSE 0 END)
        * 1000000 // count(*))::BIGINT AS bad_ppm
FROM b WHERE domain IS NOT NULL AND s IS NOT NULL
GROUP BY domain
"""


def derive_blocklist(
    stats: DataFrame,
    min_docs: int = 20,
    max_bad_ppm: int = 800_000,
) -> DataFrame:
    """One `domain` column: domains with enough evidence (>= min_docs) whose
    bad-doc fraction exceeds max_bad_ppm — feed straight into
    blocklist_filter / crawl_frontier(blocked_domains=). The evidence floor
    keeps a domain with 2 junk pages from being banned forever; thresholds
    are policy, reported not hidden (pair with the stats frame in review
    tooling)."""
    return stats.where(
        (F.col("n_docs") >= F.lit(int(min_docs)))
        & (F.col("bad_ppm") > F.lit(int(max_bad_ppm)))
    ).select("domain")


def derive_blocklist_sql(
    stats_src: str, min_docs: int = 20, max_bad_ppm: int = 800_000
) -> str:
    return (
        f"SELECT domain FROM ({stats_src}) "
        f"WHERE n_docs >= {int(min_docs)} AND bad_ppm > {int(max_bad_ppm)}"
    )
