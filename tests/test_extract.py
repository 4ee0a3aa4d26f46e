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
    # complex table -> [TABLE] (convert.py:109-111)
    ('<table><tr><td rowspan="2">a</td><td>b</td></tr><tr><td>c</td></tr></table>',
     "[TABLE]"),
    ("<table><tr><td><ul><li>x</li></ul></td></tr></table>", "[TABLE]"),
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
