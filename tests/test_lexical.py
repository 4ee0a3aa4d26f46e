"""Lexical/Super JSON walker conformance (M10)."""

import json

from jimmy_ray.md.lexical import super_to_markdown


def doc(children):
    return {"root": {"type": "root", "children": children}}


def txt(text, fmt=0):
    return {"type": "text", "text": text, "format": fmt}


def test_paragraph_and_heading():
    d = doc([
        {"type": "heading", "tag": "h2", "children": [txt("Title")]},
        {"type": "paragraph", "children": [txt("hello "), txt("world", 1)]},
    ])
    assert super_to_markdown(d) == "## Title\n\nhello **world**"


def test_format_bitmask():
    cases = [
        (1, "**x**"), (2, "*x*"), (4, "~~x~~"), (8, "++x++"),
        (16, "`x`"), (128, "==x=="), (64, "^x^"), (32, "~x~"),
        (3, "***x***"),  # bold+italic
    ]
    for fmt, want in cases:
        d = doc([{"type": "paragraph", "children": [txt("x", fmt)]}])
        assert super_to_markdown(d) == want, fmt


def test_lists():
    d = doc([{
        "type": "list", "listType": "check",
        "children": [
            {"type": "listitem", "checked": True, "children": [txt("done")]},
            {"type": "listitem", "checked": False, "children": [txt("todo")]},
        ],
    }])
    assert super_to_markdown(d) == "- [x] done\n- [ ] todo"
    d = doc([{
        "type": "list", "listType": "number",
        "children": [
            {"type": "listitem", "children": [txt("one")]},
            {"type": "listitem", "children": [txt("two")]},
        ],
    }])
    assert super_to_markdown(d) == "1. one\n2. two"


def test_nested_list():
    d = doc([{
        "type": "list", "listType": "bullet",
        "children": [
            {"type": "listitem", "children": [
                txt("a"),
                {"type": "list", "listType": "bullet", "children": [
                    {"type": "listitem", "children": [txt("sub")]},
                ]},
            ]},
        ],
    }])
    assert super_to_markdown(d) == "- a\n    - sub"


def test_quote_and_rule():
    d = doc([
        {"type": "quote", "children": [
            {"type": "paragraph", "children": [txt("quoted")]},
        ]},
        {"type": "horizontalrule"},
    ])
    assert super_to_markdown(d) == "> quoted\n\n---"


def test_links():
    d = doc([{"type": "paragraph", "children": [
        {"type": "link", "url": "https://x.io", "children": [txt("site")]},
        txt(" and "),
        {"type": "autolink", "url": "https://y.io",
         "children": [txt("https://y.io")]},
    ]}])
    assert super_to_markdown(d) == "[site](https://x.io) and <https://y.io>"


def test_code_block():
    d = doc([{"type": "code", "language": "py",
              "children": [txt("print(1)")]}])
    assert super_to_markdown(d) == "```py\nprint(1)\n```"


def test_table():
    d = doc([{
        "type": "table", "children": [
            {"type": "tablerow", "children": [
                {"type": "tablecell", "headerState": 1, "children": [txt("a")]},
                {"type": "tablecell", "headerState": 1, "children": [txt("b")]},
            ]},
            {"type": "tablerow", "children": [
                {"type": "tablecell", "headerState": 0, "children": [txt("1")]},
                {"type": "tablecell", "headerState": 0, "children": [txt("2")]},
            ]},
        ],
    }])
    assert super_to_markdown(d) == "| a | b |\n| --- | --- |\n| 1 | 2 |"


def test_collapsible():
    d = doc([{
        "type": "collapsible-container", "children": [
            {"type": "collapsible-title", "children": [txt("Spoiler")]},
            {"type": "collapsible-content", "children": [
                {"type": "paragraph", "children": [txt("hidden")]},
            ]},
        ],
    }])
    assert super_to_markdown(d) == "**Spoiler**\n\nhidden"


def test_json_string_input():
    d = json.dumps(doc([{"type": "paragraph", "children": [txt("s")]}]))
    assert super_to_markdown(d) == "s"
