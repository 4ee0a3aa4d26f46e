"""HTML→Markdown extraction engine: feature conformance + golden round trip.

Feature cases mirror the reference's html_filter semantics
(/root/reference/src/jimmy/md_lib/html_filter.py doctests — see each
case's comment) re-expressed against this engine's from-scratch writer.
"""

import pytest

from jimmy_ray.data import synth
from jimmy_ray.html.extract import extract_title, html_to_markdown


def wrap(body: str) -> str:
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


CASES = [
    # headings + remove_bold_header (html_filter.py:397)
    ("<h1>Hello</h1>", "# Hello"),
    ("<h2><b>Bold head</b></h2>", "## Bold head"),
    ("<h3><strong>X</strong> y</h3>", "### X y"),
    # inline formatting (convert.py:44-69 pandoc profile)
    ("<p><b>b</b> <i>i</i> <code>c</code></p>", "**b** *i* `c`"),
    ("<p><strong>b</strong> and <em>i</em></p>", "**b** and *i*"),
    # highlighting -> ==mark== (html_filter.py:66, pandoc +mark)
    ("<p><mark>hl</mark></p>", "==hl=="),
    # strikethrough (html_filter.py:470)
    ("<p><s>gone</s> <del>also</del></p>", "~~gone~~ ~~also~~"),
    # underline -> ++..++ (html_filter.py:676-707)
    ("<p><u>under</u> <ins>ins</ins></p>", "++under++ ++ins++"),
    # links (md_lib/links.py:16-27)
    ('<p><a href="u">text</a></p>', "[text](u)"),
    ('<p><a href="u" title="T">text</a></p>', '[text](u "T")'),
    ("<p><a>no href</a></p>", "no href"),
    ('<p><img src="i.png" alt="alt"/></p>', "![alt](i.png)"),
    ('<p><img src="i.png"/></p>', "![](i.png)"),
    # iframes_to_links (html_filter.py:72): text defaults to src
    ('<iframe src="https://kicker.de"></iframe>',
     "[https://kicker.de](https://kicker.de)"),
    ('<iframe src="https://kicker.de">link</iframe>', "[link](https://kicker.de)"),
    ("<iframe></iframe>", ""),
    # lists
    ("<ul><li>a</li><li>b</li></ul>", "- a\n- b"),
    ("<ol><li>a</li><li>b</li></ol>", "1. a\n2. b"),
    ("<ul><li>a<ul><li>sub</li></ul></li></ul>", "- a\n  - sub"),
    # task lists (pandoc +task_lists)
    ('<ul><li><input type="checkbox" checked/>x</li>'
     '<li><input type="checkbox"/>y</li></ul>',
     "- [x] x\n- [ ] y"),
    # div_checklists (html_filter.py:48)
    ('<div class="checklist"><div><input type="checkbox" checked/>done</div>'
     '<div><input type="checkbox"/>todo</div></div>',
     "- [x] done\n- [ ] todo"),
    # pipe tables (html_filter.py:568 streamline_tables; simple path)
    ("<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>",
     "| a | b |\n| --- | --- |\n| 1 | 2 |"),
    # streamline_tables normalization (html_filter.py:568-673) — complex
    # tables are rewritten into pipe tables, never punted to [TABLE]:
    # rowspan in first row -> headerless table, covered cells padded empty
    ('<table><tr><td rowspan="2">a</td><td>b</td></tr><tr><td>c</td></tr></table>',
     "|  |  |\n| --- | --- |\n| a | b |\n|  | c |"),
    # list in cell -> <br>-prefixed items (simplify_list, html_filter.py:575)
    ("<table><tr><td><ul><li>x</li></ul></td></tr></table>",
     "| <br>- x |\n| --- |"),
    # colspan expansion: content top-left, empty padding
    ('<table><tr><th>a</th><th colspan="2">b</th></tr>'
     "<tr><td>1</td><td>2</td><td>3</td></tr></table>",
     "| a | b |  |\n| --- | --- | --- |\n| 1 | 2 | 3 |"),
    # block content in cells flattened with <br>
    ("<table><tr><th>h</th></tr><tr><td><p>one</p><p>two</p></td></tr></table>",
     "| h |\n| --- |\n| one<br>two |"),
    # nested list in cell: nbsp-indented (simplify_list level handling)
    ("<table><tr><th>h</th></tr>"
     "<tr><td><ul><li>a<ul><li>b</li></ul></li></ul></td></tr></table>",
     "| h |\n| --- |\n| <br>- a<br>    - b |"),
    # hidden cells removed (html_filter.py:595-600) + ragged row padded
    ('<table><tr><td>a</td><td hidden>x</td><td>b</td></tr>'
     "<tr><td>c</td></tr></table>",
     "| a | b |\n| --- | --- |\n| c |  |"),
    # headers in cells -> bold (html_filter.py:664-666)
    ("<table><tr><th>h</th></tr><tr><td><h3>T</h3></td></tr></table>",
     "| h |\n| --- |\n| **T** |"),
    # blockquote in cell -> inline quote (html_filter.py:668-670)
    ("<table><tr><th>h</th></tr><tr><td><blockquote>q</blockquote></td></tr></table>",
     '| h |\n| --- |\n| "q" |'),
    # caption precedes the table (md_lib/tables.py:36)
    ("<table><caption>Cap</caption><tr><th>a</th></tr><tr><td>1</td></tr></table>",
     "Cap\n\n| a |\n| --- |\n| 1 |"),
    # nested table flattened into the cell (html_filter.py:590-592)
    ("<table><tr><th>h</th></tr><tr><td>x<table><tr><td>p</td><td>q</td></tr>"
     "</table></td></tr></table>",
     "| h |\n| --- |\n| x<br>p  q |"),
    # pre in cell -> inline code (html_filter.py:602-608)
    ("<table><tr><th>h</th></tr><tr><td><pre>co de</pre></td></tr></table>",
     "| h |\n| --- |\n| `co de` |"),
    # br in cell kept as literal <br> (convert.py:113 TEMPORARYNEWLINE)
    ("<table><tr><th>h</th></tr><tr><td>a<br>b</td></tr></table>",
     "| h |\n| --- |\n| a<br>b |"),
    # merge_single_element_lists (html_filter.py:197-214)
    ("<ul><li>a</li></ul><ul><li>b</li></ul>", "- a\n- b"),
    ("<ul><li>a</li></ul><ol><li>b</li></ol>", "- a\n\n1. b"),  # kinds differ
    # remove_duplicated_links (html_filter.py:413-425)
    ('<p><a href="i.png"><img src="i.png"/></a></p>', "![](i.png)"),
    ('<p><a href="u">x<a href="u">y</a></a></p>', "[xy](u)"),
    # multiline_markup (html_filter.py:216-228)
    ("<p><b>a<br>b</b></p>", "**a**\n**b**"),
    ("<h2>a<br>b</h2>", "## ab"),
    # unwrap_inline_whitespace (html_filter.py:711-746)
    ("<p><b>foo </b>bar</p>", "**foo** bar"),
    # remove_empty_markup preserves the space (html_filter.py:428-454)
    ("<p>a<b> </b>b</p>", "a b"),
    # blockquote / pre / hr
    ("<blockquote><p>q</p></blockquote>", "> q"),
    ("<pre>code  here\n  indented</pre>", "```\ncode  here\n  indented\n```"),
    ("<hr/>", "---"),
    # whitespace collapsing (unwrap_inline_whitespace analogue)
    ("<p>a\n   b</p>", "a b"),
    ("<p> <b> x </b> </p>", "**x**"),
    # empty markup dropped (remove_empty_markup:428)
    ("<p><b></b>x</p>", "x"),
    ("<p></p><p>x</p>", "x"),
    # entity unescaping
    ("<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    # blocks joined by blank line
    ("<p>one</p><p>two</p>", "one\n\ntwo"),
    # spans unwrap
    ('<p><span style="x">s</span>pan</p>', "span"),
    # misnested tolerance
    ("<p><b>x</p>", "**x**"),
    # merge_consecutive_formatting (html_filter.py:142)
    ("<p><b>a</b><b>b</b></p>", "**ab**"),
    ("<p><strong>a</strong><b>b</b></p>", "**ab**"),
    ("<p><em>a</em><i>b</i> <b>c</b></p>", "*ab* **c**"),
    ("<p><b>a</b> <b>b</b></p>", "**a** **b**"),  # separated: no merge
    # link_internal_headings (html_filter.py:101): anchors get slugged
    ('<p><a href="#My Heading!">go</a></p>', "[go](#my-heading)"),
    ('<p><a href="https://x.io#Frag Y">go</a></p>', "[go](https://x.io#Frag Y)"),
]


@pytest.mark.parametrize("body,expected", CASES, ids=range(len(CASES)))
def test_feature(body, expected):
    assert html_to_markdown(wrap(body)) == expected


def test_title_extraction():
    assert extract_title(wrap("<p>x</p>")) == "t"
    assert extract_title("<html><body><p>x</p></body></html>") == ""


def test_golden_roundtrip_all_variants():
    """extract(render(doc)) == golden — the byte-identity invariant."""
    texts = [
        "plain words only",
        "with & ampersand <angle> 'quote'",
        "",
        "unicode grüße 你好 привет",
        "multi  space   runs",
    ]
    for doc_id in (0, 1, 7, 101, 9999, 123456):
        for v in range(synth.N_VARIANTS):
            for text in texts:
                title = synth.page_title(doc_id, synth.page_key(doc_id, v))
                html = synth.render_html(doc_id, v, text, title)
                got = html_to_markdown(html)
                want = synth.golden_markdown(
                    doc_id, v, " ".join(text.split()) if "  " in text else text
                )
                assert got == want, (doc_id, v, text)


def test_hostile_titles_roundtrip():
    for title in synth.HOSTILE_TITLES:
        html = synth.render_html(3, 0, "x", title)
        assert extract_title(html) == " ".join(title.split())


def test_replace_special_characters_registry_filter():
    """Escaped markup in text is re-parsed when the registry filter is
    applied (replace_special_characters, html_filter.py:457-467) — not in
    the default chain, mirroring convert.py custom_filter usage."""
    from jimmy_ray.html import extract as hx

    root = hx.parse_dom(wrap("<p>&lt;b&gt;x&lt;/b&gt;</p><pre>&lt;kept&gt;</pre>"))
    hx.replace_special_characters(root.children)
    body = hx._find(root, "body")
    out: list[str] = []
    hx._render_blocks(body.children, out)
    assert "\n\n".join(out) == "**x**\n\n```\n<kept>\n```"


def test_default_chain_skips_special_characters():
    assert html_to_markdown(wrap("<p>&lt;b&gt;x&lt;/b&gt;</p>")) == "<b>x</b>"


def test_fast_parse_differential_vs_htmlparser():
    """The regex fast-path tokenizer must build the identical tree to the
    html.parser fallback on every fixture page and feature case (adjacent
    text nodes normalized; '#tags' inventory excluded)."""
    from jimmy_ray.html import extract as hx

    def slow_parse(html):
        b = hx._TreeBuilder()
        b.feed(html)
        return b.root

    def norm(children):
        out = []
        for c in children:
            if isinstance(c, str) and out and isinstance(out[-1], str):
                out[-1] += c
            else:
                out.append(c)
        return out

    def tree_eq(a, b):
        if isinstance(a, str) or isinstance(b, str):
            return a == b
        attrs_a = {k: v for k, v in a.attrs.items() if k != "#tags"}
        attrs_b = {k: v for k, v in b.attrs.items() if k != "#tags"}
        if a.tag != b.tag or attrs_a != attrs_b:
            return False
        ca, cb = norm(a.children), norm(b.children)
        return len(ca) == len(cb) and all(
            tree_eq(x, y) for x, y in zip(ca, cb)
        )

    docs = []
    for doc_id in (0, 1, 7, 101):
        for v in range(synth.N_VARIANTS):
            docs.append(synth.render_html(
                doc_id, v, "text with & <angle> 'q' grüße",
                synth.page_title(doc_id, synth.page_key(doc_id, v))))
    docs += [wrap(body).encode() for body, _ in CASES]
    docs.append(synth.render_table_html(42).encode())
    for d in docs:
        h = d.decode()
        fast = hx._fast_parse(h)
        assert fast is not None, h[:120]
        assert tree_eq(fast, slow_parse(h)), h[:200]


def test_fast_parse_fallback_triggers():
    from jimmy_ray.html import extract as hx

    assert hx._fast_parse("<script>var x=1;</script>") is None
    assert hx._fast_parse("<p>a < b</p>") is None
    assert hx._fast_parse("<![CDATA[x]]><p>y</p>") is None
    # fallback still extracts correctly
    assert html_to_markdown("<html><body><p>a &lt; b</p></body></html>") == "a < b"


def test_pathological_nesting_dead_letters_not_crashes():
    """§2.9 fault isolation: a 5000-deep div nest overflows the renderer's
    recursion and must dead-letter that row, leaving neighbors intact
    (mirrors @catch_all_exceptions, common.py:66-82)."""
    import pyarrow as pa

    from jimmy_ray.stages.extract import extract_markdown_batch

    deep = ("<div>" * 5000) + "x" + ("</div>" * 5000)
    batch = pa.table({
        "url": pa.array(["u1", "u2"]),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "lang": pa.array(["en", "en"]),
        "html": pa.array([deep.encode(), b"<p>fine</p>"], pa.binary()),
    })
    out = extract_markdown_batch(batch)
    errs = out["error"].to_pylist()
    assert errs[0] is not None and "RecursionError" in errs[0]
    assert errs[1] is None
    assert out["text"].to_pylist()[1] == "fine"
