"""robots.txt (RFC 9309) parsing and allow/deny evaluation — the crawl
PERMISSION layer of corpus hygiene — plus sitemaps.org sitemap parsing
(the DISCOVERY companion; bottom section).

`html_metadata` already honors in-page opt-outs (meta robots noindex /
nofollow); this module adds the origin-level one: a corpus build MUST be
able to drop documents whose URL the publisher's robots.txt disallows for
the crawler that fetched them. At 100 TB that check runs as a per-host
BROADCAST join (one robots.txt row per host — millions of hosts vs
billions of documents) followed by one Arrow-vectorized evaluation stage
with a per-executor parse cache, so each distinct robots.txt is parsed
once per executor, not once per document.

Spec coverage (RFC 9309 + the documented Google interpretation for the
corners the RFC leaves open):
  * groups: consecutive `user-agent:` lines share the rule block that
    follows; rules before any user-agent line are ignored; directive
    names and agent tokens match case-insensitively
  * group selection: ALL groups whose agent token equals the crawler's
    product token are merged; the `*` groups apply ONLY when no specific
    group matched (RFC 9309 §2.2.1)
  * rule matching: `*` matches any octet sequence, `$` anchors the
    pattern end (literal elsewhere); the matching rule with the LONGEST
    pattern wins; allow wins length ties; no matching rule -> allowed;
    empty patterns match nothing
  * extras collected, not enforced: `sitemap:` URLs and `crawl-delay:`
  * garbage tolerance: unknown directives, malformed lines, absent or
    null robots.txt all fall through to "allowed" — same policy as every
    URL operator here

No oracle twin: longest-match wildcard evaluation is not expressible in
DuckDB SQL — pytest-golden kernel (SURVEY §5.2) over the RFC/Google
documented examples, like streaming and the IDN codec.

Reference parity: beyond-reference scope (the reference ingests local
files, ref ocr_workflow_orchestrator.py:153-178); public specs RFC 9309
and the publicly documented longest-match semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DIRECTIVE_RE = re.compile(r"^\s*([A-Za-z][A-Za-z0-9-]*)\s*:\s*(.*?)\s*$")


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)  # lowercased tokens
    rules: list[tuple[bool, str]] = field(default_factory=list)  # (is_allow, pattern)
    crawl_delay: float | None = None


@dataclass
class RobotsFile:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)


def parse_robots(txt: str | None) -> RobotsFile:
    """Line-oriented RFC 9309 parse. Never raises."""
    out = RobotsFile()
    if not txt:
        return out
    cur: RobotsGroup | None = None
    # a run of user-agent lines keeps extending the SAME group head until
    # the first rule line closes it
    head_open = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0]
        m = _DIRECTIVE_RE.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            token = val.split()[0].lower() if val.split() else ""
            if not token:
                continue
            if cur is None or not head_open:
                cur = RobotsGroup()
                out.groups.append(cur)
                head_open = True
            cur.agents.append(token)
        elif key in ("allow", "disallow"):
            if cur is None:
                continue  # rules before any user-agent line: ignored
            head_open = False
            # empty pattern matches nothing ("Disallow:" == allow all)
            if val:
                cur.rules.append((key == "allow", val))
        elif key == "crawl-delay":
            if cur is not None:
                head_open = False
                try:
                    cur.crawl_delay = float(val)
                except ValueError:
                    pass
        elif key == "sitemap":
            if val:
                out.sitemaps.append(val)
        else:
            # unknown directive: closes a user-agent head run, else ignored
            if cur is not None:
                head_open = False
    return out


def _pattern_regex(pattern: str) -> re.Pattern:
    """Compile one rule pattern: '*' -> '.*', trailing '$' anchors, every
    other character literal. Matches are PREFIX matches (unanchored end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    if anchored:
        rx += "$"
    return re.compile(rx)


class RobotsMatcher:
    """Rules compiled for ONE crawler token against one robots.txt."""

    def __init__(self, robots: RobotsFile, agent: str):
        agent = agent.lower()
        specific = [g for g in robots.groups if agent in g.agents]
        chosen = specific or [g for g in robots.groups if "*" in g.agents]
        self.rules: list[tuple[bool, int, re.Pattern]] = [
            (is_allow, len(pat), _pattern_regex(pat))
            for g in chosen
            for (is_allow, pat) in g.rules
        ]
        delays = [g.crawl_delay for g in chosen if g.crawl_delay is not None]
        self.crawl_delay: float | None = min(delays) if delays else None

    def allowed(self, path: str) -> bool:
        """Longest-match decision; allow wins ties; no match -> allowed."""
        if not path:
            path = "/"
        best_len = -1
        best_allow = True
        for is_allow, plen, rx in self.rules:
            if rx.match(path) and (
                plen > best_len or (plen == best_len and is_allow)
            ):
                best_len = plen
                best_allow = is_allow
        return best_allow


def robots_allowed(txt: str | None, agent: str, path: str) -> bool:
    """One-shot convenience: parse + match (tests / driver-side use)."""
    return RobotsMatcher(parse_robots(txt), agent).allowed(path)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _make_allowed_udf(agent: str):
    """Vectorized (txt, path) -> allowed with a per-executor matcher cache:
    each DISTINCT robots.txt parses/compiles once per Python worker, so the
    per-document cost is one regex walk, not a parse."""

    # closure-level, NOT inside the UDF body: the dict must survive across
    # Arrow batches within a Python worker so each distinct robots.txt
    # parses once per executor process, not once per batch. Keyed by the
    # FULL text, not hash(txt): dict lookup hashes-then-compares anyway,
    # and a bare-hash key would silently evaluate one host's documents
    # under another host's rules on a 64-bit collision
    cache: dict[str, RobotsMatcher] = {}

    @F.pandas_udf(T.BooleanType())
    def _udf(txts: pd.Series, paths: pd.Series) -> pd.Series:
        def one(txt, path):
            if txt is None:
                return True  # no robots.txt for this host: allowed
            m = cache.get(txt)
            if m is None:
                m = RobotsMatcher(parse_robots(txt), agent)
                cache[txt] = m
            return m.allowed(path if path else "/")

        return pd.Series(
            [one(t, p) for t, p in zip(txts, paths)], dtype="boolean"
        )

    return _udf


def robots_annotate(
    docs: DataFrame,
    robots: DataFrame,
    agent: str = "ocr-spark",
    url_col: str = "url",
) -> DataFrame:
    """Add a `robots_allowed` boolean per document.

    `robots` carries one row per host: (host:string, robots_txt:string) —
    the shape a fetch layer materializes. Scale plan: broadcast the robots
    table (hosts << documents), ONE left join + ONE Arrow stage; the corpus
    side never shuffles. Docs whose host has no robots row, or whose URL
    doesn't parse, are allowed (a missing robots.txt permits crawling)."""
    from ocr_spark.functions.url import url_host, url_path, url_query

    u = F.col(url_col)
    path_q = F.concat(
        url_path(u),
        F.when(url_query(u) != "", F.concat(F.lit("?"), url_query(u))).otherwise(
            F.lit("")
        ),
    )
    joined = docs.withColumn("__host", url_host(u)).join(
        F.broadcast(robots.select(F.lower("host").alias("__host"), "robots_txt")),
        on="__host",
        how="left",
    )
    allowed = _make_allowed_udf(agent)(F.col("robots_txt"), path_q)
    return joined.withColumn("robots_allowed", allowed).drop(
        "__host", "robots_txt"
    )


def robots_filter(
    docs: DataFrame,
    robots: DataFrame,
    agent: str = "ocr-spark",
    url_col: str = "url",
) -> DataFrame:
    """Keep only documents robots.txt allows for `agent` (the corpus-build
    permission gate, applied BEFORE content processing so disallowed pages
    never cost a decode)."""
    return (
        robots_annotate(docs, robots, agent, url_col)
        .filter(F.col("robots_allowed"))
        .drop("robots_allowed")
    )


# ---------------------------------------------------------------------------
# sitemap parsing (sitemaps.org protocol) — the discovery companion to
# robots.txt (whose `sitemap:` lines this module already collects).
# Real-crawl sitemaps are frequently malformed XML, so parsing is
# regex-tolerant (never raises, same policy as html_extract) and handles
# all three shapes: <urlset> leaf sitemaps, <sitemapindex> pointers, and
# plain-text one-URL-per-line files; gzip members are unwrapped. The
# Spark surface is ONE mapInPandas explode over (source_url, content) —
# no shuffle; a fetch loop alternates sitemap_extract over the emitted
# kind='sitemap' rows until no pointers remain.
# ---------------------------------------------------------------------------

_LOC_BLOCK_RE = re.compile(
    r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S | re.I
)
_LOC_RE = re.compile(r"<loc\b[^>]*>\s*(.*?)\s*</loc>", re.S | re.I)
_LASTMOD_RE = re.compile(r"<lastmod\b[^>]*>\s*(.*?)\s*</lastmod>", re.S | re.I)
# one shared entity decoder for every crawl-XML surface (sitemaps here,
# feeds.py imports it): named XML entities + numeric character references,
# decoded in a SINGLE regex pass so '&amp;lt;' yields the literal '&lt;'
# instead of double-decoding (sequential .replace chains get that wrong
# for numeric refs)
_XML_NAMED = {"lt": "<", "gt": ">", "quot": '"', "apos": "'", "amp": "&"}
_XML_ENT_RE = re.compile(r"&(lt|gt|quot|apos|amp|#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6});")


def _xml_unescape(s: str) -> str:
    def one(m: re.Match) -> str:
        t = m.group(1)
        named = _XML_NAMED.get(t)
        if named is not None:
            return named
        cp = int(t[2:], 16) if t[1] in "xX" else int(t[1:])
        if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
            return m.group(0)  # invalid code point: keep the raw reference
        return chr(cp)

    return _XML_ENT_RE.sub(one, s)


def parse_sitemap(content: bytes | str | None) -> list[dict]:
    """[{'loc', 'lastmod', 'kind'}] — kind is 'url' (leaf entry) or
    'sitemap' (index pointer). Accepts XML bytes/str, gzip'd XML, or a
    plain-text URL list. Never raises; unparseable input yields []."""
    if content is None:
        return []
    if isinstance(content, bytes):
        if content[:2] == b"\x1f\x8b":
            import gzip

            try:
                content = gzip.decompress(content)
            except Exception:
                return []
        try:
            content = content.decode("utf-8", errors="replace")
        except Exception:
            return []
    out: list[dict] = []
    if "<" in content and _LOC_RE.search(content):
        for m in _LOC_BLOCK_RE.finditer(content):
            kind, body = m.group(1).lower(), m.group(2)
            loc = _LOC_RE.search(body)
            if not loc:
                continue
            lm = _LASTMOD_RE.search(body)
            out.append(
                {
                    "loc": _xml_unescape(loc.group(1)),
                    "lastmod": _xml_unescape(lm.group(1)) if lm else None,
                    "kind": kind,
                }
            )
        return out
    # plain-text sitemap: one absolute URL per line
    for line in content.splitlines():
        line = line.strip()
        if line.startswith(("http://", "https://")):
            out.append({"loc": line, "lastmod": None, "kind": "url"})
    return out


_SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def sitemap_extract(
    sitemaps: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
) -> DataFrame:
    """Explode fetched sitemap payloads (url_col, content_col: binary or
    string) into (source_url, loc, lastmod, kind) rows. One mapInPandas
    stage, no shuffle."""
    from typing import Iterator

    cols = sitemaps.select(
        F.col(url_col).alias("source_url"), F.col(content_col).alias("content")
    )

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for src, content in zip(pdf["source_url"], pdf["content"]):
                for e in parse_sitemap(content):
                    rows.append((src, e["loc"], e["lastmod"], e["kind"]))
            yield pd.DataFrame(
                rows, columns=["source_url", "loc", "lastmod", "kind"]
            )

    return cols.mapInPandas(gen, _SITEMAP_SCHEMA)
