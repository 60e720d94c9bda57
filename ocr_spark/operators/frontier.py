"""Crawl-frontier construction — the composition that turns extracted
outlinks into the next fetch list, tying the crawl family together
(links.py → functions/url.py → robots.py → dedup-style seen filtering).

`crawl_frontier(links, seen_urls, blocked_domains, robots, per_domain_cap)`
produces (url, domain, n_refs, sample_anchor), ranked per domain by
inlink count — the classic frontier prioritization signal (more distinct
references ⇒ fetch earlier), capped per domain for politeness/yield.

Plan shape, in order (PLANS-style audit in tests):
  1. canonicalize hrefs (url_normalize — pure Column exprs at the scan;
     nofollow links and non-http(s) schemes dropped),
  2. ONE groupBy shuffle on the canonical URL (n_refs, min anchor — min,
     not first, so the aggregate is deterministic under any partitioning),
  3. seen-set drop: left_anti on the URL — AQE broadcasts when the seen
     frame is small; at 10^10+ seen URLs, pass `seen_bloom` (built by
     dedup.bloom_build over h60(url)) to prefilter with a fixed-size
     broadcast bitmap and keep the exact anti-join for the survivors only
     (bit-identical output, the decon_bloom pattern),
  4. blocked-domain drop: broadcast left_anti on the PSL registrable
     domain (the blocklist_filter convention),
  5. optional robots gate (robots.py — broadcast per-host join + Arrow
     matcher; no SQL twin by nature, so the oracle twin covers the
     robots=None path and robots behavior is pinned by test_robots.py),
  6. optional per-domain cap: ONE window over the domain key ordered by
     (n_refs DESC, url) — the only stage that re-shuffles, on the domain
     key, and only when capping is requested.

Everything before the window is twin-checked against DuckDB
(crawl_frontier_sql) including the URL canonicalization, the dedup
aggregation, both anti-joins, and the cap window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def crawl_frontier(
    links: DataFrame,
    seen_urls: DataFrame | None = None,
    blocked_domains: DataFrame | None = None,
    robots: DataFrame | None = None,
    per_domain_cap: int | None = None,
    agent: str = "ocr-spark",
    seen_bloom: tuple | None = None,
) -> DataFrame:
    """links: (doc_id, src_url, href, anchor, nofollow) — html_links_df
    output. seen_urls: one `url` column of already-fetched CANONICAL urls
    (normalize with the same url_normalize before persisting them).
    blocked_domains: one `domain` column of PSL registrable domains.
    Returns (url, domain, n_refs, sample_anchor)."""
    from ocr_spark.functions.url import (
        registrable_domain,
        url_host,
        url_normalize,
        url_scheme,
    )
    from ocr_spark.operators.dedup import bloom_prefilter

    if seen_bloom is not None and seen_urls is None:
        raise ValueError(
            "seen_bloom is a prefilter over seen_urls, not a replacement: "
            "bloom false-positives would drop NEW urls without the exact "
            "anti-join — pass seen_urls too"
        )
    cand = links
    if "nofollow" in cand.columns:
        cand = cand.where(~F.coalesce(F.col("nofollow"), F.lit(False)))
    cand = cand.select(
        url_normalize(F.col("href")).alias("url"),
        F.coalesce(F.col("anchor"), F.lit("")).alias("__anchor"),
    ).where(
        F.col("url").isNotNull()
        & url_scheme(F.col("url")).isin("http", "https")
        & (url_host(F.col("url")) != "")
    )
    agg = cand.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.min("__anchor").alias("sample_anchor"),
    )
    if seen_bloom is not None and seen_urls is not None:
        from ocr_spark.operators.text_analysis import h60

        # split on the fixed-size broadcast bitmap: bloom-NEGATIVE rows are
        # definitely unseen (no false negatives) and skip the join; only
        # the bloom-positive sliver pays the exact anti-join — output is
        # bit-identical to the plain anti-join (asserted in tests).
        # Reviewed trade-off: the two complementary prefilter branches each
        # run the k vectorized bitmap gathers (the agg EXCHANGE below them
        # is reused, only the map-side bloom stage duplicates). The
        # alternatives are worse at the scale this path exists for:
        # persisting agg caches ~10^9 aggregated URL rows for one reuse,
        # and a conditional NULL join key (null out definitely-unseen keys
        # so they skip the probe) funnels the dominant unseen mass into the
        # single null hash partition of the shuffle join.
        h = agg.withColumn("__uh", h60(F.col("url")))
        fresh = bloom_prefilter(h, seen_bloom, col="__uh", negate=True)
        maybe = bloom_prefilter(h, seen_bloom, col="__uh")
        checked = maybe.join(seen_urls.select(F.col("url")), "url", "left_anti")
        agg = fresh.unionByName(checked).drop("__uh")
    elif seen_urls is not None:
        agg = agg.join(
            seen_urls.select(F.col("url")), "url", "left_anti"
        )
    out = agg.withColumn("domain", registrable_domain(F.col("url")))
    if blocked_domains is not None:
        out = out.join(
            F.broadcast(blocked_domains.select(F.col("domain"))),
            "domain",
            "left_anti",
        )
    if robots is not None:
        from ocr_spark.operators.robots import robots_filter

        out = robots_filter(out, robots, agent=agent, url_col="url")
    if per_domain_cap is not None:
        if per_domain_cap < 1:
            raise ValueError(f"per_domain_cap must be >= 1, got {per_domain_cap}")
        w = Window.partitionBy("domain").orderBy(
            F.col("n_refs").desc(), F.col("url")
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= per_domain_cap)
            .drop("__rn")
        )
    return out.select("url", "domain", "n_refs", "sample_anchor")


def crawl_frontier_sql(
    links_src: str,
    seen_src: str | None = None,
    blocked_src: str | None = None,
    per_domain_cap: int | None = None,
) -> str:
    """DuckDB twin of the robots=None path (same normalization regexes,
    same PSL plan, same anti-join null conventions — ANTI JOIN, not
    NOT IN, per the blocklist_filter_sql lesson)."""
    from ocr_spark.functions.url import (
        registrable_domain_sql,
        url_host_sql,
        url_normalize_sql,
        url_scheme_sql,
    )

    seen_clause = (
        f"ANTI JOIN ({seen_src}) s USING (url)" if seen_src else ""
    )
    blocked_clause = (
        f"ANTI JOIN ({blocked_src}) b USING (domain)" if blocked_src else ""
    )
    cap_select = (
        f"SELECT url, domain, n_refs, sample_anchor FROM (SELECT *, "
        f"row_number() OVER (PARTITION BY domain ORDER BY n_refs DESC, url) AS rn "
        f"FROM capped) WHERE rn <= {int(per_domain_cap)}"
        if per_domain_cap is not None
        else "SELECT url, domain, n_refs, sample_anchor FROM capped"
    )
    return f"""
WITH cand AS (
  SELECT {url_normalize_sql('href')} AS url,
         coalesce(anchor, '') AS anch
  FROM ({links_src})
  WHERE NOT coalesce(nofollow, FALSE)
), ok AS (
  SELECT * FROM cand
  WHERE url IS NOT NULL
    AND {url_scheme_sql('url')} IN ('http', 'https')
    AND {url_host_sql('url')} <> ''
), agg AS (
  SELECT url, count(*)::BIGINT AS n_refs, min(anch) AS sample_anchor
  FROM ok GROUP BY url
), unseen AS (
  SELECT agg.* FROM agg {seen_clause}
), dom AS (
  SELECT *, {registrable_domain_sql('url')} AS domain FROM unseen
), capped AS (
  SELECT url, domain, n_refs, sample_anchor FROM dom {blocked_clause}
)
{cap_select}
"""
