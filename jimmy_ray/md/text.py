"""Markdown text scalars (SURVEY.md §2.2 M15-M17).

Behavioral ports of the reference's text helpers — semantics taken from
the doctest spec at /root/reference/src/jimmy/md_lib/text.py (M15
split_title_from_body :28-52, M16 to_markdown_header_id :55-102, M17
split_leading_trailing_whitespace :4-25); implementation written fresh.
All are pure str->str, used inside map_batches bodies and mirrored in
oracle SQL where queries need them.
"""

from __future__ import annotations


def split_leading_trailing_whitespace(value: str) -> tuple[str, str, str]:
    """
    >>> split_leading_trailing_whitespace("")
    ('', '', '')
    >>> split_leading_trailing_whitespace("foo")
    ('', 'foo', '')
    >>> split_leading_trailing_whitespace("  foo")
    ('  ', 'foo', '')
    >>> split_leading_trailing_whitespace("foo ")
    ('', 'foo', ' ')
    >>> split_leading_trailing_whitespace(" foo bar ")
    (' ', 'foo bar', ' ')
    """
    stripped = value.strip()
    if not stripped:
        return ("", "", "") if not value else (value, "", "")
    start = value.index(stripped[0]) if stripped else 0
    start = len(value) - len(value.lstrip())
    end = len(value.rstrip())
    return value[:start], value[start:end], value[end:]


def split_title_from_body(markdown: str, h1: bool = True) -> tuple[str, str]:
    r"""Split a leading title line from the body.

    >>> split_title_from_body("# heading\n\n b")
    ('heading', 'b')
    >>> split_title_from_body("heading\n\n b")
    ('', 'heading\n\n b')
    >>> split_title_from_body("heading\n\n b", h1=False)
    ('heading', 'b')
    >>> split_title_from_body("heading\nb", h1=False)
    ('heading', 'b')
    """
    if markdown.startswith("# ") or not h1:
        if "\n" in markdown:
            title, body = markdown.split("\n", 1)
            return title.lstrip("# "), body.lstrip()
        return markdown, ""  # single line: kept verbatim (reference edge)
    return "", markdown


def to_markdown_header_id(text: str) -> str:
    """Pandoc auto_identifiers-style header slug.

    >>> to_markdown_header_id("Heading identifiers in HTML")
    'heading-identifiers-in-html'
    >>> to_markdown_header_id("*Dogs*?--in *my* house?")
    'dogs--in-my-house'
    >>> to_markdown_header_id("[HTML], [S5], or [RTF]?")
    'html-s5-or-rtf'
    >>> to_markdown_header_id("3. Applications")
    '3-applications'
    >>> to_markdown_header_id("")
    ''
    >>> to_markdown_header_id(" ")
    'section'
    """
    if not text:
        return text
    text = " ".join(text.split())
    text = "".join(c for c in text if c.isalnum() or c in (" ", "_", "-"))
    text = text.replace(" ", "-").lower()
    # drop everything before the first alphanumeric character
    out = []
    started = False
    for c in text:
        if started or c.isalnum():
            started = True
            out.append(c)
    result = "".join(out)
    return result or "section"
