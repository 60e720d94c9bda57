"""HTML → Markdown renderer: per-construct goldens, auto-close and
malformed-input tolerance, base-chain URL resolution, boilerplate modes,
never-raises fuzz, and the Exchange-free Spark surface."""

from __future__ import annotations

import random

import pytest

from ocr_spark.operators.html_markdown import html_markdown_df, html_to_markdown as md


class TestBlocks:
    def test_headings_all_levels(self):
        html = "".join(f"<h{i}>T{i}</h{i}>" for i in range(1, 7))
        assert md(html) == "\n\n".join(f"{'#' * i} T{i}" for i in range(1, 7))

    def test_paragraphs_and_emphasis(self):
        got = md("<p>Hello <b>bold</b> and <i>it</i>.</p><p>Two</p>")
        assert got == "Hello **bold** and *it*.\n\nTwo"

    def test_emphasis_edge_whitespace_moves_outside_markers(self):
        assert md("<p>a<b> b c </b>d</p>") == "a **b c** d"

    def test_unclosed_li_and_nesting(self):
        got = md("<ul><li>a<li>b<ul><li>c</li></ul><li>d</ul>")
        assert got == "- a\n- b\n  - c\n- d"

    def test_ordered_list_honors_start(self):
        assert md("<ol start='3'><li>x</li><li>y</li></ol>") == "3. x\n4. y"

    def test_pre_preserves_whitespace_and_infostring(self):
        got = md(
            "<pre><code class='language-py'>def f():\n    return 1\n</code></pre>"
        )
        assert got == "```py\ndef f():\n    return 1\n```"

    def test_fence_grows_past_inner_backticks(self):
        got = md("<pre>a\n```\nb</pre>")
        assert got.startswith("````\n") and got.endswith("\n````")

    def test_table_header_padding_and_pipe_escape(self):
        got = md(
            "<table><tr><th>A</th><th>B|C</th></tr><tr><td>1</td></tr></table>"
        )
        assert got == "| A | B\\|C |\n| --- | --- |\n| 1 |  |"

    def test_table_via_thead_tbody(self):
        got = md(
            "<table><thead><tr><th>h</th></tr></thead>"
            "<tbody><tr><td>v</td></tr></tbody></table>"
        )
        assert got == "| h |\n| --- |\n| v |"

    def test_blockquote_nested_paragraphs(self):
        assert md("<blockquote><p>q1</p><p>q2</p></blockquote>") == (
            "> q1\n>\n> q2"
        )

    def test_hr_and_br(self):
        assert md("<p>a</p><hr><p>b<br>c</p>") == "a\n\n---\n\nb\nc"

    def test_implicit_paragraphs_between_blocks(self):
        got = md("text outside <b>any</b> block<div>then a div</div>tail")
        assert got == "text outside **any** block\n\nthen a div\n\ntail"


class TestInline:
    def test_inline_code_grows_delimiter(self):
        assert md("<p>code <code>a `tick`</code> end</p>") == (
            "code `` a `tick` `` end"
        )

    def test_links_resolve_through_base_chain(self):
        got = md(
            '<base href="https://ex.com/a/">'
            '<p><a href="b.html">link</a> <img src="i.png" alt="pic"></p>'
        )
        assert got == (
            "[link](https://ex.com/a/b.html) ![pic](https://ex.com/a/i.png)"
        )

    def test_doc_url_then_base_href_browser_order(self):
        got = md(
            '<base href="/root/"><p><a href="x">t</a></p>',
            doc_url="https://h.org/d/page.html",
        )
        assert got == "[t](https://h.org/root/x)"

    def test_skip_schemes_and_fragments_keep_text(self):
        got = md(
            "<p><a href='javascript:x()'>t</a> <a href='#f'>frag</a>"
            " <a href='/r'>rel</a></p>"
        )
        assert got == "t frag [rel](/r)"

    def test_empty_anchor_vanishes(self):
        assert md("<p>a <a href='/x'></a>b</p>") == "a b"


class TestHygiene:
    def test_script_style_head_dropped(self):
        assert md("<script>var x=1;</script><p>keep</p><style>.a{}</style>") == "keep"

    def test_boilerplate_strip_vs_keep(self):
        html = "<nav>menu</nav><p>body</p><footer>foot</footer>"
        assert md(html) == "body"
        assert md(html, boilerplate="keep") == "menu\n\nbody\n\nfoot"

    def test_malformed_never_raises(self):
        for h in ("<div><<<>>bad", "<p><b>unclosed", "</p></div>", "", None):
            md(h)  # must not raise

    def test_fuzz_never_raises(self):
        rng = random.Random(7)
        alphabet = "<>/ab \"'=&#;\n\x00`|*"
        for _ in range(300):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
            assert isinstance(md(s), str)

    def test_nested_identical_ignore_tags(self):
        assert md("<noscript>a<noscript>b</noscript>c</noscript><p>k</p>") == "k"


class TestSparkSurface:
    @pytest.fixture(scope="class")
    def out(self, spark):
        docs = spark.createDataFrame(
            [
                ("d1", "<h1>T</h1><p>body <b>x</b></p>", "https://a.com/p"),
                ("d2", None, None),
                ("d3", "<ul><li>i</li></ul>", None),
            ],
            ["doc_id", "text", "url"],
        )
        return html_markdown_df(docs, url_col="url")

    def test_rows_and_values(self, out):
        got = {r["doc_id"]: r for r in out.collect()}
        assert got["d1"]["markdown"] == "# T\n\nbody **x**"
        assert got["d1"]["n_blocks"] == 2
        assert got["d2"]["markdown"] == ""
        assert got["d2"]["n_chars"] == 0
        assert got["d3"]["markdown"] == "- i"

    def test_plan_is_exchange_free(self, out):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
