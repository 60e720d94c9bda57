"""Structure-preserving HTML → Markdown extraction.

The T8 extractor (html_extract.py) emits flat main-content TEXT — the
boilerplate-stripping signal path. Modern LLM corpus builds additionally
keep the document's STRUCTURE (headings, lists, code blocks, tables,
links), because markdownified web text is what the trainer actually
consumes; flattening a code block or a table into prose destroys exactly
the tokens that make the page worth keeping. This module renders the same
forgiving stdlib-HTMLParser parse into GitHub-flavored Markdown.

Reference-parity anchor: hOCR/HTML handling is a declared roadmap surface
in the reference (OCR-X_Evolution_Roadmap.md:59-60) with no implementation;
like T8, the precise rendering rule below is THIS engine's spec, locked by
golden fixtures (tests/test_html_markdown.py).

Rendering spec
--------------
1. Parse with a forgiving event parser into a lightweight node tree;
   HTML5-ish auto-closes for the tags real crawls abuse: an open <p>
   closes at the next block tag, <li> closes a previous sibling <li>,
   <td>/<th>/<tr> close their previous siblings. Unmatched end tags are
   ignored. ``<script>/<style>/<head>/<title>/<noscript>`` subtrees are
   dropped; with ``boilerplate="strip"`` (default) so are
   ``<nav>/<header>/<footer>/<aside>`` — the T8 boilerplate set.
2. Blocks: h1..h6 → ``#``·n; p/div/section/article/main/figcaption →
   paragraphs; ul/ol → ``-`` / ``k.`` items (2-space nesting, <ol start>
   honored); blockquote → ``> `` prefixed, nestable; pre → fenced code
   block with ORIGINAL whitespace (fence grown past any backtick run
   inside; info string from the first <code class="language-x"|"lang-x">);
   table → pipe table (first row is the header row, GitHub requires one;
   cells squeezed, ``|`` escaped, rows padded to the widest); hr → ``---``.
   Blocks join with one blank line.
3. Inline: whitespace squeezed per block; <strong>/<b> → ``**``,
   <em>/<i> → ``*`` (edge whitespace moved OUTSIDE the markers),
   <code> → backtick span (delimiter grown past inner backtick runs),
   <a href> → ``[text](url)`` with the href resolved through the
   browser-order base chain (doc URL → <base href>), fragment-only and
   javascript:-class links keep their text only, <img> → ``![alt](src)``,
   <br> → line break within the block. Text is emitted VERBATIM otherwise — no
   markdown-escaping of content characters (the corpus-build convention:
   escaping inflates tokens; goldens pin the choice).
4. Malformed input degrades, never raises; the renderer returns whatever
   was accumulated (the flatten_dom contract).

Scale shape: ``html_markdown_df`` is ONE Arrow-batched mapInPandas stage —
no shuffle, no join; the frame keeps its scan partitioning (the
html_metadata_df contract). Binary/JS-heavy pathology is bounded by the
parser being a single O(doc) pass.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["html_to_markdown", "html_markdown_df"]

_IGNORE_TAGS = {"script", "style", "head", "title", "noscript"}
_BOILER_TAGS = {"nav", "header", "footer", "aside"}
_VOID_TAGS = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}
# block-level tags that force an open <p> (or <li> text run) to close
_P_CLOSERS = {
    "p", "div", "ul", "ol", "li", "table", "blockquote", "pre", "section",
    "article", "main", "figure", "figcaption", "h1", "h2", "h3", "h4",
    "h5", "h6", "hr", "dl", "dt", "dd",
}
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_SKIP_SCHEMES = {"javascript", "mailto", "tel", "data", "about"}


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # _Node | str


class _TreeParser(HTMLParser):
    """Forgiving tree builder with the auto-close rules crawls need."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack: list[_Node] = [self.root]
        self.ignore_depth = 0
        self.base_href: str | None = None

    def _open(self, node: _Node) -> None:
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def _close_through(self, tags: set[str], stop: set[str]) -> None:
        """Pop an open element in `tags`, if one sits above any `stop`."""
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t in stop:
                return
            if t in tags:
                del self.stack[i:]
                return

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "base" and self.base_href is None and a.get("href"):
            self.base_href = a["href"].strip()
        if self.ignore_depth:
            if tag in _IGNORE_TAGS and tag not in _VOID_TAGS:
                self.ignore_depth += 1
            return
        if tag in _IGNORE_TAGS:
            self.ignore_depth += 1
            return
        if tag in _VOID_TAGS:
            self.stack[-1].children.append(_Node(tag, a))
            return
        if tag in _P_CLOSERS:
            self._close_through({"p"}, stop=set())
        if tag == "li":
            self._close_through({"li"}, stop={"ul", "ol"})
        elif tag in ("td", "th"):
            self._close_through({"td", "th"}, stop={"tr", "table"})
        elif tag == "tr":
            self._close_through({"td", "th"}, stop={"tr", "table"})
            self._close_through({"tr"}, stop={"table", "thead", "tbody", "tfoot"})
        elif tag in ("dt", "dd"):
            self._close_through({"dt", "dd"}, stop={"dl"})
        self._open(_Node(tag, a))

    def handle_endtag(self, tag):
        if tag in _IGNORE_TAGS:
            if self.ignore_depth:
                self.ignore_depth -= 1
            return
        if self.ignore_depth or tag in _VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (forgiving)

    def handle_data(self, data):
        if self.ignore_depth or not data:
            return
        self.stack[-1].children.append(data)


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

_BR = "\x00BR\x00"


def _squeeze_par(raw: str) -> str:
    s = re.sub(r"\s+", " ", raw).strip()
    s = re.sub(rf" ?{_BR} ?", "\n", s)
    return s.strip("\n")


def _raw_text(node) -> str:
    if isinstance(node, str):
        return node
    if node.tag == "br":
        return "\n"
    return "".join(_raw_text(c) for c in node.children)


def _code_span(core: str) -> str:
    runs = re.findall(r"`+", core)
    n = max((len(r) for r in runs), default=0) + 1
    d = "`" * max(1, n)
    pad = " " if core.startswith("`") or core.endswith("`") else ""
    return f"{d}{pad}{core}{pad}{d}"


def _fence(body: str, info: str) -> str:
    runs = re.findall(r"`+", body)
    n = max((len(r) for r in runs), default=0) + 1
    f = "`" * max(3, n)
    return f"{f}{info}\n{body.rstrip(chr(10))}\n{f}"


class _Renderer:
    def __init__(self, base: str | None, strip_boiler: bool):
        self.base = base
        self.strip_boiler = strip_boiler

    # -- inline ------------------------------------------------------------

    def _resolve(self, href: str) -> str | None:
        href = (href or "").strip()
        if not href or href.startswith("#"):
            return None
        head = href.split("/", 1)[0]
        scheme = head.split(":", 1)[0].lower() if ":" in head else None
        if scheme in _SKIP_SCHEMES:
            return None
        if self.base:
            from ocr_spark.functions.url import resolve_url

            return resolve_url(self.base, href)
        return href

    def _wrap(self, node, marker: str) -> str:
        s = self.inline(node.children)
        core = re.sub(r"\s+", " ", s).strip()
        if not core:
            return s
        lead = " " if s[:1].isspace() else ""
        trail = " " if s[-1:].isspace() else ""
        return f"{lead}{marker}{core}{marker}{trail}"

    def inline(self, children) -> str:
        parts: list[str] = []
        for ch in children:
            if isinstance(ch, str):
                parts.append(ch)
                continue
            t = ch.tag
            if t in ("strong", "b"):
                parts.append(self._wrap(ch, "**"))
            elif t in ("em", "i"):
                parts.append(self._wrap(ch, "*"))
            elif t == "code":
                core = re.sub(r"\s+", " ", _raw_text(ch)).strip()
                if core:
                    parts.append(_code_span(core))
            elif t == "a":
                inner = re.sub(r"\s+", " ", self.inline(ch.children)).strip()
                url = self._resolve(ch.attrs.get("href", ""))
                if inner and url:
                    parts.append(f"[{inner}]({url})")
                elif inner:
                    parts.append(inner)
            elif t == "img":
                src = self._resolve(ch.attrs.get("src", ""))
                alt = re.sub(r"\s+", " ", ch.attrs.get("alt") or "").strip()
                if src:
                    parts.append(f"![{alt}]({src})")
                elif alt:
                    parts.append(alt)
            elif t == "br":
                parts.append(_BR)
            elif self._skip(ch):
                continue
            else:
                parts.append(self.inline(ch.children))
        return "".join(parts)

    # -- blocks ------------------------------------------------------------

    def _skip(self, node) -> bool:
        return self.strip_boiler and node.tag in _BOILER_TAGS

    def blocks(self, children) -> list[str]:
        """Render a child list → list of markdown blocks; runs of inline
        content between block elements become implicit paragraphs."""
        out: list[str] = []
        run: list = []

        def flush():
            if run:
                p = _squeeze_par(self.inline(run))
                if p:
                    out.append(p)
                run.clear()

        for ch in children:
            if isinstance(ch, str) or ch.tag in (
                "strong", "b", "em", "i", "code", "a", "img", "br", "span",
            ):
                run.append(ch)
                continue
            if self._skip(ch) or ch.tag in ("input", "meta", "link", "base"):
                continue
            flush()
            out.extend(self.block(ch))
        flush()
        return out

    def block(self, node) -> list[str]:
        t = node.tag
        if t in _HEADINGS:
            core = _squeeze_par(self.inline(node.children)).replace("\n", " ")
            return [f"{'#' * _HEADINGS[t]} {core}"] if core else []
        if t == "pre":
            body = _raw_text(node)
            if not body.strip():
                return []
            info = ""
            for c in node.children:
                if not isinstance(c, str) and c.tag == "code":
                    for cls in (c.attrs.get("class") or "").split():
                        m = re.match(r"(?:language-|lang-)(.+)", cls)
                        if m:
                            info = m.group(1)
                            break
                    break
            # strip the leading newline <pre>\n... carries by convention
            return [_fence(body.lstrip(chr(10)), info)]
        if t in ("ul", "ol"):
            items = self._list_items(node, depth=0)
            return ["\n".join(items)] if items else []
        if t == "blockquote":
            inner = self.blocks(node.children)
            if not inner:
                return []
            q = "\n\n".join(inner)
            return ["\n".join("> " + ln if ln else ">" for ln in q.split("\n"))]
        if t == "table":
            tb = self._table(node)
            return [tb] if tb else []
        if t == "hr":
            return ["---"]
        if t in ("dt", "dd"):
            core = _squeeze_par(self.inline(node.children))
            return [core] if core else []
        # p, div, section, article, main, figure, figcaption, unknown
        # blocks: paragraph-ish container — blocks() folds pure-inline
        # content into one implicit paragraph and recurses on the rest
        return self.blocks(node.children)

    def _list_items(self, node, depth: int) -> list[str]:
        ordered = node.tag == "ol"
        try:
            k = int(node.attrs.get("start", "1"))
        except (TypeError, ValueError):
            k = 1
        pad = "  " * depth
        lines: list[str] = []
        for ch in node.children:
            if isinstance(ch, str) or ch.tag != "li":
                continue
            marker = f"{k}." if ordered else "-"
            k += 1
            # split the item into its own inline text + nested lists
            inline_kids = [
                c
                for c in ch.children
                if isinstance(c, str) or c.tag not in ("ul", "ol")
            ]
            sub = [
                c
                for c in ch.children
                if not isinstance(c, str) and c.tag in ("ul", "ol")
            ]
            body_blocks = self.blocks(inline_kids)
            head = body_blocks[0] if body_blocks else ""
            head = head.replace("\n", " ")
            lines.append(f"{pad}{marker} {head}".rstrip())
            indent = pad + "  "
            for extra in body_blocks[1:]:
                lines.extend(
                    indent + ln if ln else "" for ln in extra.split("\n")
                )
            for s in sub:
                lines.extend(self._list_items(s, depth + 1))
        return lines

    def _table(self, node) -> str:
        rows: list[list[str]] = []

        def collect(n):
            for c in n.children:
                if isinstance(c, str):
                    continue
                if c.tag == "tr":
                    cells = []
                    for cell in c.children:
                        if isinstance(cell, str) or cell.tag not in ("td", "th"):
                            continue
                        s = _squeeze_par(self.inline(cell.children))
                        cells.append(s.replace("\n", " ").replace("|", "\\|"))
                    rows.append(cells)
                elif c.tag in ("thead", "tbody", "tfoot"):
                    collect(c)

        collect(node)
        rows = [r for r in rows if r]
        if not rows:
            return ""
        w = max(len(r) for r in rows)
        rows = [r + [""] * (w - len(r)) for r in rows]
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("|" + " --- |" * w)
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)


def html_to_markdown(
    html: str,
    doc_url: str | None = None,
    boilerplate: str = "strip",
) -> str:
    """One document → GitHub-flavored Markdown (see module spec).

    boilerplate="strip" drops nav/header/footer/aside subtrees (the T8
    set); "keep" renders everything. Malformed HTML degrades, never
    raises."""
    p = _TreeParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    base = doc_url
    if p.base_href:
        if doc_url:
            from ocr_spark.functions.url import resolve_url

            base = resolve_url(doc_url, p.base_href)
        else:
            base = p.base_href
    r = _Renderer(base, strip_boiler=(boilerplate == "strip"))
    try:
        return "\n\n".join(r.blocks(p.root.children))
    except Exception:
        return ""


MARKDOWN_SCHEMA_FIELDS = [
    T.StructField("markdown", T.StringType()),
    T.StructField("n_chars", T.IntegerType()),
    T.StructField("n_blocks", T.IntegerType()),
]


def html_markdown_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "text",
    url_col: str | None = None,
    boilerplate: str = "strip",
) -> DataFrame:
    """(id, markdown, n_chars, n_blocks) per document — ONE Arrow-batched
    mapInPandas stage, no shuffle (the html_metadata_df contract)."""
    import pandas as pd

    schema = T.StructType([docs.schema[id_col]] + MARKDOWN_SCHEMA_FIELDS)

    def gen(batches):
        for pdf in batches:
            urls = (
                [u if isinstance(u, str) else None for u in pdf[url_col]]
                if url_col
                else [None] * len(pdf)
            )
            mds = [
                html_to_markdown(h, u, boilerplate=boilerplate)
                for h, u in zip(pdf[html_col].fillna(""), urls)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "markdown": mds,
                    "n_chars": [len(m) for m in mds],
                    "n_blocks": [
                        len([b for b in m.split("\n\n") if b]) for m in mds
                    ],
                }
            )

    cols = [id_col, html_col] + ([url_col] if url_col else [])
    return docs.select(*cols).mapInPandas(gen, schema=schema)
