"""URL canonicalization + registrable-domain operators for web-corpus
builds (task directive, beyond-reference scope — the reference ingests
local files only, ref ocr_workflow_orchestrator.py:153-178; a 100 TB crawl
corpus is keyed by URL and needs these before any dedup/stats).

All pure Column expressions (whole-stage codegen, no UDFs), built on one
RFC 3986 appendix-B regex so Spark and the DuckDB oracle parse identically
— deliberately NOT java.net.URI / parse_url, whose engine-specific edge
cases have no DuckDB twin.

Normalization contract (the common crawl-dedup canonical form):
  * scheme and host lowercased; userinfo stripped
  * default ports stripped (http:80, https:443); other ports kept
  * empty path -> '/'
  * tracking params dropped (utm_*, fbclid, gclid, msclkid, ref); other
    params kept in original order; '?' omitted when none survive
  * fragment dropped

registrable_domain is a HEURISTIC eTLD+1 (last two labels, or last three
when the trailing pair is a known two-level public suffix) — the full
public-suffix list is a data file, not an algorithm change; swap
_TWO_LEVEL_SUFFIXES for it in production.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC 3986 appendix B. Group indexes: 2=scheme, 4=authority, 5=path,
# 7=query, 9=fragment. Works in both Java regex (Spark) and RE2 (DuckDB).
_URI_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"

# (=|$) so VALUELESS tracking params ('?fbclid', '&utm_source') are also
# dropped — otherwise '?fbclid' and '?fbclid=1' canonicalize differently
# and identical pages escape URL dedup
_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"

_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "com.sg", "com.tr", "co.za", "com.ar",
)


def _part(col: Column, group: int) -> Column:
    return F.regexp_extract(col, _URI_RE, group)


def url_scheme(col: Column) -> Column:
    return F.lower(_part(col, 2))


def url_host(col: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    host_port = F.element_at(F.split(_part(col, 4), "@"), -1)
    return F.lower(F.regexp_replace(host_port, r":[0-9]*$", ""))


def url_port(col: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    host_port = F.element_at(F.split(_part(col, 4), "@"), -1)
    return F.regexp_extract(host_port, r":([0-9]+)$", 1)


def url_path(col: Column) -> Column:
    return _part(col, 5)


def url_query(col: Column) -> Column:
    return _part(col, 7)


def _kept_params(col: Column) -> Column:
    q = url_query(col)
    return F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~(p.rlike(_TRACKING_RE)),
    )


def url_normalize(col: Column) -> Column:
    """Canonical URL string per the module contract. Null in -> null out;
    a scheme-less or host-less string normalizes from whatever parts the
    RFC grammar finds (garbage-tolerant, never raises)."""
    scheme = url_scheme(col)
    host = url_host(col)
    port = url_port(col)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    path = url_path(col)
    params = _kept_params(col)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def registrable_domain(col: Column) -> Column:
    """Heuristic eTLD+1 of a URL column (see module docstring)."""
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    two_level = F.array(*[F.lit(s) for s in _TWO_LEVEL_SUFFIXES])
    return F.when(
        (n >= 3) & F.array_contains(two_level, last2),
        F.concat_ws(".", F.element_at(labels, -3), last2),
    ).otherwise(F.when(n >= 2, last2).otherwise(url_host(col)))


# ---------------------------------------------------------------------------
# DuckDB twins (same regexes; RE2)
# ---------------------------------------------------------------------------


def _part_sql(expr: str, group: int) -> str:
    return f"regexp_extract({expr}, '{_URI_RE}', {group})"


def url_scheme_sql(expr: str) -> str:
    return f"lower({_part_sql(expr, 2)})"


def _host_port_sql(expr: str) -> str:
    return f"string_split({_part_sql(expr, 4)}, '@')[-1]"


def url_host_sql(expr: str) -> str:
    return f"lower(regexp_replace({_host_port_sql(expr)}, ':[0-9]*$', ''))"


def url_port_sql(expr: str) -> str:
    return f"regexp_extract({_host_port_sql(expr)}, ':([0-9]+)$', 1)"


def url_path_sql(expr: str) -> str:
    return _part_sql(expr, 5)


def url_query_sql(expr: str) -> str:
    return _part_sql(expr, 7)


def _kept_params_sql(expr: str) -> str:
    return (
        f"list_filter(string_split({url_query_sql(expr)}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))"
    )


def url_normalize_sql(expr: str) -> str:
    scheme = url_scheme_sql(expr)
    host = url_host_sql(expr)
    port = url_port_sql(expr)
    path = url_path_sql(expr)
    params = _kept_params_sql(expr)
    return f"""
CASE WHEN {expr} IS NULL THEN NULL ELSE
  {scheme} || '://' || {host}
  || CASE WHEN {port} <> ''
           AND NOT ({scheme} = 'http' AND {port} = '80')
           AND NOT ({scheme} = 'https' AND {port} = '443')
      THEN ':' || {port} ELSE '' END
  || CASE WHEN {path} = '' THEN '/' ELSE {path} END
  || CASE WHEN len({params}) > 0
      THEN '?' || array_to_string({params}, '&') ELSE '' END
END""".strip()


def registrable_domain_sql(expr: str) -> str:
    host = url_host_sql(expr)
    suffixes = ", ".join(f"'{s}'" for s in _TWO_LEVEL_SUFFIXES)
    return f"""
CASE WHEN {expr} IS NULL THEN NULL ELSE (
  WITH x AS (SELECT string_split({host}, '.') AS ls)
  SELECT CASE
    WHEN len(ls) >= 3 AND (ls[-2] || '.' || ls[-1]) IN ({suffixes})
      THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
    WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
    ELSE {host} END FROM x)
END""".strip()


def blocklist_filter(docs, blocked, url_col: str = "url"):
    """Drop docs whose registrable domain is blocklisted — the standard
    crawl-hygiene pass (spam/adult/SEO domain lists).

    `blocked` is either a one-column DataFrame of domains (broadcast
    left_anti — the list never exceeds broadcast size in practice; millions
    of rows is still MBs) or a Python list (in-row literal array test, zero
    joins). The corpus never shuffles either way.

    Null-URL contract: a doc whose url (hence domain) is NULL is KEPT by
    every path — it cannot match a blocklist entry. (The naive
    ~array_contains(...) evaluates NULL and silently dropped such rows,
    diverging from the left_anti path and the DuckDB twin.)"""
    dom = registrable_domain(F.col(url_col))
    if isinstance(blocked, (list, tuple)):
        if not blocked:
            return docs
        arr = F.array(*[F.lit(str(d)) for d in blocked])
        return docs.where(
            ~F.coalesce(F.array_contains(arr, dom), F.lit(False))
        )
    bcol = blocked.columns[0]
    b = blocked.select(F.col(bcol).alias("_blocked_domain")).distinct()
    return (
        docs.withColumn("_dom", dom)
        .join(
            F.broadcast(b),
            F.col("_dom") == F.col("_blocked_domain"),
            "left_anti",
        )
        .drop("_dom")
    )


def blocklist_filter_sql(src: str, blocked_sql: str, url_expr: str = "url") -> str:
    """DuckDB twin: `blocked_sql` yields one domain column. NULL domains
    are kept (same contract as blocklist_filter). NULLs are stripped from
    the blocklist side too — a single NULL in a NOT IN list makes the
    predicate NULL for every non-matching row (whole corpus dropped),
    whereas the Spark left_anti join simply never matches on NULL."""
    dom = registrable_domain_sql(url_expr)
    return (
        f"SELECT * FROM ({src}) "
        f"WHERE ({dom}) IS NULL OR ({dom}) NOT IN "
        f"(SELECT d FROM ({blocked_sql}) AS _b(d) WHERE d IS NOT NULL)"
    )
