"""CherryTree rich_text conformance (M11; doctest corpus ported from
formats/cherrytree.py:36-282)."""

import doctest

import jimmy_ray.md.cherrytree as ct
from jimmy_ray.md.cherrytree import node_to_markdown


def test_doctests():
    result = doctest.testmod(ct, verbose=False)
    assert result.attempted > 0 and result.failed == 0


def wrap(spans: str) -> str:
    return f"<node>{spans}</node>"


def test_formatting_attributes():
    cases = [
        ('<rich_text weight="heavy">bold</rich_text>', "**bold**"),
        ('<rich_text style="italic">it</rich_text>', "*it*"),
        ('<rich_text strikethrough="true">s</rich_text>', "~~s~~"),
        ('<rich_text underline="single">u</rich_text>', "++u++"),
        ('<rich_text scale="sup">x</rich_text>', "^x^"),
        ('<rich_text scale="sub">x</rich_text>', "~x~"),
        ('<rich_text family="monospace">c</rich_text>', "`c`"),
        ('<rich_text scale="h2">Head</rich_text>', "## Head"),
    ]
    for xml, want in cases:
        got, _links = node_to_markdown(wrap(xml))
        assert got == want, xml


def test_whitespace_preserved_outside_markers():
    got, _ = node_to_markdown(wrap('<rich_text weight="heavy"> b </rich_text>'))
    assert got == " **b** "


def test_links():
    got, links = node_to_markdown(
        wrap('<rich_text link="webs https://x.io">site</rich_text>')
    )
    assert got == "[site](https://x.io)" and links == []
    got, links = node_to_markdown(
        wrap('<rich_text link="webs https://x.io">https://x.io</rich_text>')
    )
    assert got == "<https://x.io>"
    got, links = node_to_markdown(
        wrap('<rich_text link="node 36">target</rich_text>')
    )
    assert got == "[target](36)"
    assert links == [("36", "target")]


def test_mixed_spans_and_lists():
    xml = wrap(
        '<rich_text scale="h1">Title</rich_text>'
        "<rich_text>\n☐ todo\n☑ done\n</rich_text>"
    )
    got, _ = node_to_markdown(xml)
    assert got == "# Title\n- [ ] todo\n- [x] done\n"


def test_multiline_monospace_becomes_code_block():
    got, _ = node_to_markdown(
        wrap('<rich_text family="monospace">a\nb</rich_text>')
    )
    assert got == "\n```\na\nb\n```\n"
