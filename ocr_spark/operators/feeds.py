"""RSS 2.0 / Atom feed extraction — the third crawl discovery/content
format next to robots.txt and sitemaps (operators/robots.py).

Feeds are a first-class corpus source: they carry full article content
(RSS <content:encoded>, Atom <content>) or summaries, with stable ids and
timestamps — exactly the (doc_id, text, url, published) shape the
hygiene pipeline ingests. Real-world feed XML is as malformed as sitemap
XML, so parsing is regex-tolerant (never raises) with CDATA unwrapping
and entity unescaping; HTML payloads inside entries are handed to the
EXISTING boilerplate stripper downstream, not re-implemented here.

Spark surface: `feed_extract` = ONE mapInPandas explode over fetched
(url, content) rows, no shuffle — the same contract as sitemap_extract.

Reference parity: beyond-reference scope (the reference ingests local
files, ref ocr_workflow_orchestrator.py:153-178); public formats RSS 2.0
(rssboard.org) and Atom (RFC 4287).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.operators.robots import _xml_unescape as _unescape

_ITEM_RE = re.compile(r"<(item|entry)\b[^>]*>(.*?)</\1>", re.S | re.I)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _tag(body: str, *names: str) -> str | None:
    """First matching simple element's inner text (CDATA unwrapped,
    entities unescaped), trying `names` in priority order."""
    for name in names:
        m = re.search(
            rf"<{name}\b[^>]*>(.*?)</{name}>", body, re.S | re.I
        )
        if m:
            inner = m.group(1)
            cd = _CDATA_RE.search(inner)
            if cd:
                return cd.group(1).strip()
            return _unescape(inner.strip())
    return None


def _atom_link(body: str) -> str | None:
    """Atom entries carry <link href="..."/>; prefer rel="alternate"
    (or no rel), fall back to the first link."""
    links = re.findall(r"<link\b([^>]*?)/?>", body, re.I)
    first = None
    for attrs in links:
        hm = re.search(r"""href\s*=\s*["']([^"']*)["']""", attrs, re.I)
        if not hm:
            continue
        href = _unescape(hm.group(1))
        if first is None:
            first = href
        rm = re.search(r"""rel\s*=\s*["']([^"']*)["']""", attrs, re.I)
        if rm is None or rm.group(1).lower() == "alternate":
            return href
    return first


def parse_feed(content: bytes | str | None) -> list[dict]:
    """[{'entry_id','title','link','published','text','kind'}] — kind is
    'rss' or 'atom' per entry. Accepts XML bytes/str or gzip'd bytes.
    Never raises; unparseable input yields []."""
    if content is None:
        return []
    if isinstance(content, bytes):
        if content[:2] == b"\x1f\x8b":
            import gzip

            try:
                content = gzip.decompress(content)
            except Exception:
                return []
        content = content.decode("utf-8", errors="replace")
    out: list[dict] = []
    for m in _ITEM_RE.finditer(content):
        kind = "rss" if m.group(1).lower() == "item" else "atom"
        body = m.group(2)
        if kind == "rss":
            link = _tag(body, "link")
            published = _tag(body, "pubDate", "dc:date")
            text = _tag(body, "content:encoded", "description")
            entry_id = _tag(body, "guid") or link
        else:
            link = _atom_link(body)
            published = _tag(body, "published", "updated")
            text = _tag(body, "content", "summary")
            entry_id = _tag(body, "id") or link
        title = _tag(body, "title")
        if not (entry_id or link or title):
            continue  # unidentifiable fragment
        out.append(
            {
                "entry_id": entry_id,
                "title": title,
                "link": link,
                "published": published,
                "text": text,
                "kind": kind,
            }
        )
    return out


_FEED_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType()),
        T.StructField("entry_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("published", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def feed_extract(
    feeds: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
) -> DataFrame:
    """Explode fetched feed payloads into one row per entry. One
    mapInPandas stage, no shuffle; entry text (often HTML) feeds the
    existing boilerplate stripper downstream."""
    cols = feeds.select(
        F.col(url_col).alias("source_url"), F.col(content_col).alias("content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, content in zip(pdf["source_url"], pdf["content"]):
                for e in parse_feed(content):
                    rows.append(
                        (
                            src,
                            e["entry_id"],
                            e["title"],
                            e["link"],
                            e["published"],
                            e["text"],
                            e["kind"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_url", "entry_id", "title", "link",
                    "published", "text", "kind",
                ],
            )

    return cols.mapInPandas(gen, _FEED_SCHEMA)
