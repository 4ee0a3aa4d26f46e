r"""Markdown link model + extraction (SURVEY.md §2.2 M12/M13, M22).

Behavioral port of /root/reference/src/jimmy/md_lib/links.py — the
reference drives the python-markdown treeprocessor (links.py:167-324);
that library is unavailable here, so extraction is a hand-rolled scanner:
code spans/blocks are masked first (links inside code are not links,
links.py:238-243 doctests), wikilinks and standard links are then parsed
with escape- and paren-balancing rules (the ``![abc](image (1).png)``
case).  ``remove_void_links`` ports writer.py:112-136.
"""

from __future__ import annotations

import dataclasses
import re

WEB_SCHEMES = ("http", "https", "ftp")

_CODE_BLOCK_RE = re.compile(r"```.*?```", re.S)
_CODE_SPAN_RE = re.compile(r"`[^`\n]*`")
_WIKILINK_RE = re.compile(r"(!)?\[\[(.+?)(?:\|(.+?))?\]\]")
VOID_LINK_REGEX = re.compile(r"(?<!!)\[\s*\]\(.*?\)")


@dataclasses.dataclass
class MarkdownLink:
    text: str = ""
    url: str = ""
    title: str = ""
    fragment: str = ""
    is_image: bool = False
    is_wikilink: bool = False
    is_embedded: bool = False

    @property
    def is_web_link(self) -> bool:
        return any(self.url.startswith(f"{s}://") for s in WEB_SCHEMES)

    @property
    def is_mail_link(self) -> bool:
        return self.url.startswith("mailto:")

    def __str__(self) -> str:
        if self.is_wikilink:
            return make_wikilink(self.text, self.url, self.is_embedded, self.fragment)
        return make_link(self.text, self.url, self.fragment, self.is_image, self.title)

    def reformat(self) -> str:
        """Normalize: bare text, autolink for self-describing web links."""
        if not self.url:
            return f"<{self.text}>"
        if self.is_web_link and self.text == self.url:
            return f"<{self.url}>"
        return make_link(self.text, self.url, self.fragment, self.is_image, self.title)


def make_link(text: str, url: str, fragment: str = "", is_image: bool = False,
              title: str = "") -> str:
    """
    >>> make_link("t", "u")
    '[t](u)'
    >>> make_link("t", "u", fragment="f", title="T")
    '[t](u#f "T")'
    >>> make_link("t", "<a b>", fragment="f")
    '[t](<a b#f>)'
    >>> make_link("i", "x.png", is_image=True)
    '![i](x.png)'
    """
    title = f' "{title}"' if title else ""
    fragment = "#" + fragment if fragment else ""
    if url.startswith("<") and url.endswith(">"):
        complete = f"{url[:-1]}{fragment}{url[-1:]}"
    else:
        complete = f"{url}{fragment}"
    return f"{'!' * is_image}[{text}]({complete}{title})"


def make_wikilink(text: str, url: str, is_embedded: bool = False,
                  fragment: str = "") -> str:
    """
    >>> make_wikilink("", "page")
    '[[page]]'
    >>> make_wikilink("txt", "page", fragment="f")
    '[[page#f|txt]]'
    >>> make_wikilink("", "img.png", is_embedded=True)
    '![[img.png]]'
    """
    text = text if text.strip() == "" else f"|{text}"
    fragment = "#" + fragment if fragment else ""
    return f"{'!' * is_embedded}[[{url}{fragment}{text}]]"


def split_url_fragment(url: str) -> tuple[str, str]:
    """
    >>> split_url_fragment("a#b")
    ('a', 'b')
    >>> split_url_fragment("a")
    ('a', '')
    """
    parts = url.split("#", 1)
    return (parts[0], parts[1]) if len(parts) == 2 else (parts[0], "")


def _mask_code(text: str) -> str:
    """Replace code regions with same-length filler so indices survive."""
    def blank(m: re.Match) -> str:
        return "\x00" * len(m.group(0))

    return _CODE_SPAN_RE.sub(blank, _CODE_BLOCK_RE.sub(blank, text))


def _parse_wikilinks(masked: str) -> list[tuple[int, int, MarkdownLink]]:
    out = []
    for m in _WIKILINK_RE.finditer(masked):
        embedded, url, description = m.groups()
        # exclude extra-bracket patterns like [[[link]]] (links.py:130-140)
        if (
            url.startswith("[")
            or (not description and url.endswith("]"))
            or (description and description.endswith("]"))
        ):
            continue
        url, fragment = split_url_fragment(url)
        text = description if description is not None and description.strip() else ""
        out.append(
            (m.start(), m.end(),
             MarkdownLink(text, url, "", fragment, is_wikilink=True,
                          is_embedded=bool(embedded)))
        )
    return out


def _find_balanced(s: str, start: int, open_c: str, close_c: str) -> int:
    """Index just past the matching close char; -1 if unbalanced.
    Honors backslash escapes."""
    depth = 0
    i = start
    while i < len(s):
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def _parse_standard_links(masked: str, taken: list[tuple[int, int]]):
    out = []
    i = 0
    n = len(masked)
    while i < n:
        c = masked[i]
        if c == "\\":
            i += 2
            continue
        if c != "[":
            i += 1
            continue
        # inside an already-claimed wikilink?
        if any(a <= i < b for a, b in taken):
            i += 1
            continue
        is_image = i > 0 and masked[i - 1] == "!"
        end_text = _find_balanced(masked, i, "[", "]")
        if end_text == -1 or end_text >= n or masked[end_text] != "(":
            i += 1
            continue
        end_url = _find_balanced(masked, end_text, "(", ")")
        if end_url == -1:
            i += 1
            continue
        text = masked[i + 1 : end_text - 1]
        inner = masked[end_text + 1 : end_url - 1]
        # optional title: url "title"
        title = ""
        tm = re.match(r'^(.*?)\s+"(.*)"$', inner, re.S)
        if tm:
            inner, title = tm.group(1), tm.group(2)
        if inner.startswith("<") and inner.endswith(">"):
            inner = inner[1:-1]
        url, fragment = split_url_fragment(inner)
        start = i - 1 if is_image else i
        out.append(
            (start, end_url,
             MarkdownLink(text, url, title, fragment, is_image=is_image))
        )
        i = end_url
    return out


def get_markdown_links(text: str) -> list[MarkdownLink]:
    r"""Extract images, links and wikilinks (code regions excluded).

    >>> get_markdown_links('```\n[link](:/custom)\n```')
    []
    >>> get_markdown_links('`[link](:/custom)`')
    []
    >>> [str(l) for l in get_markdown_links('[link](url#fragment)')]
    ['[link](url#fragment)']
    >>> [str(l) for l in get_markdown_links('![abc](image (1).png)')]
    ['![abc](image (1).png)']
    >>> [str(l) for l in get_markdown_links('[link](internal "Example Title")')]
    ['[link](internal "Example Title")']
    >>> [(l.url, l.fragment) for l in get_markdown_links('[link](#internal)')]
    [('', 'internal')]
    >>> [str(l) for l in get_markdown_links('[[url#fragment|tit le]]')]
    ['[[url#fragment|tit le]]']
    >>> get_markdown_links('[[[link]]]')
    []
    >>> [l.is_embedded for l in get_markdown_links('![[link]]')]
    [True]
    """
    masked = _mask_code(text)
    wiki = _parse_wikilinks(masked)
    taken = [(a, b) for a, b, _ in wiki]
    std = _parse_standard_links(masked, taken)
    images = [l for _, _, l in std if l.is_image]
    links = [l for _, _, l in std if not l.is_image]
    wikilinks = [l for _, _, l in wiki]
    return images + links + wikilinks


def remove_void_links(body: str) -> str:
    """
    >>> remove_void_links("![](image.png)")
    '![](image.png)'
    >>> remove_void_links("[abc](def)")
    '[abc](def)'
    >>> remove_void_links("[]()")
    ''
    >>> remove_void_links("[ \t ](abc)")
    ''
    """
    return VOID_LINK_REGEX.sub("", body)
