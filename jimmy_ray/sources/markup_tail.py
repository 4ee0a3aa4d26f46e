"""Pandoc long-tail, continued: Creole, Vimwiki, DocBook → Markdown.

The reference routes every pandoc-supported extension through its
default converter (/root/reference/src/jimmy/converter.py:239-387);
pandoc is absent from this environment, so — like
sources/lightmarkup.py and sources/texmarkup.py before — the published
grammars get honest native subset converters:

- Creole 1.0 (the wiki-interchange spec): ``=``-run headings with
  optional trailing ``=``-runs, ``**bold**`` / ``//italic//`` (the
  ``//`` rule skips ``://`` inside URLs), ``*``/``#`` list runs
  (list-start parse wins over bold at line start, per spec), ``[[url|
  label]]`` links, ``{{url|alt}}`` images, ``{{{...}}}`` nowiki both
  inline and as fenced blocks, ``\\\\`` forced line break, ``----`` rule.
- Vimwiki (the plugin's published syntax): ``=``-wrapped headings,
  4-space list indent steps with ``-``/``*`` bullets and ``1.``/``#``
  ordered markers, ``*bold*`` / ``_italic_``, ``[[target|desc]]``
  links, ``{{{lang ... }}}`` preformatted blocks with language tag.
- DocBook (4/5 XML): article/section/title nesting → heading levels,
  para, emphasis (role="bold" vs plain), itemizedlist/orderedlist/
  listitem nesting, link (xlink:href) and db4 ulink (url=),
  programlisting → fenced code.

Fixture writers render the golden templates the SQL mirrors derive
from (the enex.py recipe via fixturetpl); writer-unreachable branches
(ulink, bare [[link]], inline nowiki, deep list nesting) are unit
cases in tests/test_markup_tail.py.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# --- Creole -------------------------------------------------------------------

_CR_HEAD_RE = re.compile(r"^(=+)\s*(.*?)\s*=*\s*$")
_CR_LIST_RE = re.compile(r"^([*#]+)\s+(.*)$")
_CR_ITALIC_RE = re.compile(r"(?<!:)//(.+?)(?<!:)//")
_CR_LINK_RE = re.compile(r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]")
_CR_IMG_RE = re.compile(r"\{\{([^}|]+)(?:\|([^}]*))?\}\}")
_CR_NOWIKI_RE = re.compile(r"\{\{\{(.+?)\}\}\}")


def _creole_inline(line: str) -> str:
    # nowiki spans are opaque: mask, transform, restore as `code`
    masks: list[str] = []

    def mask(m):
        masks.append(m.group(1))
        return f"\x00{len(masks) - 1}\x00"

    line = _CR_NOWIKI_RE.sub(mask, line)
    line = _CR_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _CR_IMG_RE.sub(
        lambda m: f"![{m.group(2) or ''}]({m.group(1)})", line)
    line = _CR_ITALIC_RE.sub(r"*\1*", line)       # **bold** is already md
    line = line.replace("\\\\", "<br>")
    for i, code in enumerate(masks):
        line = line.replace(f"\x00{i}\x00", f"`{code}`")
    return line


def creole_to_md(text: str) -> str:
    out: list[str] = []
    in_pre = False
    for line in text.splitlines():
        if line.rstrip() == "{{{":
            out.append("```")
            in_pre = True
            continue
        if in_pre:
            if line.rstrip() == "}}}":
                out.append("```")
                in_pre = False
            else:
                out.append(line)
            continue
        if re.fullmatch(r"-{4,}\s*", line):
            out.append("---")
            continue
        m = _CR_HEAD_RE.match(line)
        if m and m.group(2):
            out.append("#" * len(m.group(1)) + " "
                       + _creole_inline(m.group(2)))
            continue
        m = _CR_LIST_RE.match(line)   # list parse wins over ** bold
        if m:
            marks = m.group(1)
            bullet = "1. " if marks[-1] == "#" else "- "
            out.append("  " * (len(marks) - 1) + bullet
                       + _creole_inline(m.group(2)))
            continue
        out.append(_creole_inline(line))
    return "\n".join(out)


# --- Vimwiki ------------------------------------------------------------------

_VW_HEAD_RE = re.compile(r"^\s*(=+)\s*(.*?)\s*\1\s*$")
_VW_ULIST_RE = re.compile(r"^(\s*)([-*])\s+(.*)$")
_VW_OLIST_RE = re.compile(r"^(\s*)(?:\d+[.)]|#)\s+(.*)$")
_VW_BOLD_RE = re.compile(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])")
_VW_ITALIC_RE = re.compile(r"(?<![\w_])_([^_\n]+)_(?![\w_])")
_VW_LINK_RE = re.compile(r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]")
_VW_PRE_RE = re.compile(r"^\s*\{\{\{\s*(\S*)\s*$")


def _vimwiki_inline(line: str) -> str:
    line = _VW_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _VW_BOLD_RE.sub(r"**\1**", line)
    line = _VW_ITALIC_RE.sub(r"*\1*", line)
    return line


def vimwiki_to_md(text: str) -> str:
    out: list[str] = []
    in_pre = False
    for line in text.splitlines():
        if in_pre:
            if line.strip() == "}}}":
                out.append("```")
                in_pre = False
            else:
                out.append(line)
            continue
        m = _VW_PRE_RE.match(line)
        if m:
            out.append("```" + m.group(1))
            in_pre = True
            continue
        m = _VW_HEAD_RE.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " "
                       + _vimwiki_inline(m.group(2)))
            continue
        m = _VW_ULIST_RE.match(line)
        if m:
            out.append("  " * (len(m.group(1)) // 4) + "- "
                       + _vimwiki_inline(m.group(3)))
            continue
        m = _VW_OLIST_RE.match(line)
        if m:
            out.append("  " * (len(m.group(1)) // 4) + "1. "
                       + _vimwiki_inline(m.group(2)))
            continue
        out.append(_vimwiki_inline(line))
    return "\n".join(out)


# --- DocBook ------------------------------------------------------------------

_XLINK_HREF = "{http://www.w3.org/1999/xlink}href"


def _db_tag(el: ET.Element) -> str:
    return el.tag.rpartition("}")[2]


def _db_inline(el: ET.Element) -> str:
    parts: list[str] = [el.text or ""]
    for child in el:
        tag = _db_tag(child)
        inner = _db_inline(child)
        if tag == "emphasis":
            mark = "**" if child.get("role") == "bold" else "*"
            parts.append(f"{mark}{inner}{mark}")
        elif tag == "link":
            href = child.get(_XLINK_HREF) or child.get("linkend") or ""
            parts.append(f"[{inner}]({href})")
        elif tag == "ulink":                       # DocBook 4
            parts.append(f"[{inner}]({child.get('url', '')})")
        else:
            parts.append(inner)
        parts.append(child.tail or "")
    return "".join(parts)


def _db_blocks(el: ET.Element, level: int, out: list[str]) -> None:
    for child in el:
        tag = _db_tag(child)
        if tag == "title":
            out.append("#" * level + " " + _db_inline(child))
        elif tag == "para":
            out.append(_db_inline(child))
        elif tag in ("section", "sect1", "sect2", "chapter"):
            _db_blocks(child, level + 1, out)
        elif tag in ("itemizedlist", "orderedlist"):
            out.append("\n".join(_db_list(child, 0)))
        elif tag == "programlisting":
            out.append("```\n" + (child.text or "") + "\n```")


def _db_list(el: ET.Element, depth: int) -> list[str]:
    bullet = "1. " if _db_tag(el) == "orderedlist" else "- "
    lines: list[str] = []
    for item in el:
        if _db_tag(item) != "listitem":
            continue
        for part in item:
            tag = _db_tag(part)
            if tag == "para":
                lines.append("  " * depth + bullet + _db_inline(part))
            elif tag in ("itemizedlist", "orderedlist"):
                lines.extend(_db_list(part, depth + 1))
    return lines


def docbook_to_md(payload: bytes) -> str:
    """DocBook article → Markdown blocks joined by blank lines."""
    root = ET.fromstring(payload)
    out: list[str] = []
    # explicit None check: Element truth-testing is deprecated, and a found
    # childless <title> is falsy
    title = root.find("title")
    if title is None:
        title = next((c for c in root if _db_tag(c) == "title"), None)
    if title is not None:
        out.append("# " + _db_inline(title))
    for child in root:
        if _db_tag(child) == "title":
            continue
        _db_blocks_one(child, out)
    return "\n\n".join(out)


def _db_blocks_one(el: ET.Element, out: list[str]) -> None:
    tag = _db_tag(el)
    if tag in ("section", "sect1", "chapter"):
        _db_blocks(el, 2, out)
    elif tag == "para":
        out.append(_db_inline(el))
    elif tag in ("itemizedlist", "orderedlist"):
        out.append("\n".join(_db_list(el, 0)))
    elif tag == "programlisting":
        out.append("```\n" + (el.text or "") + "\n```")


# --- fixtures + golden templates ----------------------------------------------

CREOLE_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "intro {text} with **bold** and *italic*\n"
    "- item A\n"
    "  1. sub {id}\n"
    "go [site {id}](https://example.com/d/{id}) and "
    "![pic {id}](img{id}.png)\n"
    "broken<br>line and `no //markup// {id}`\n"
    "---\n"
    "```\n"
    "pre //stays// {id}\n"
    "```"
)


def synth_creole(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"= Doc {i} =\n"
        f"intro {text} with **bold** and //italic//\n"
        "* item A\n"
        f"*# sub {i}\n"
        f"go [[https://example.com/d/{i}|site {i}]] and "
        f"{{{{img{i}.png|pic {i}}}}}\n"
        f"broken\\\\line and {{{{{{no //markup// {i}}}}}}}\n"
        "----\n"
        "{{{\n"
        f"pre //stays// {i}\n"
        "}}}"
    )


VIMWIKI_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "## Part {id}\n"
    "intro {text} with **bold** and *italic*\n"
    "- item A\n"
    "  - nested {id}\n"
    "1. first\n"
    "see [site {id}](https://example.com/d/{id})\n"
    "```python\n"
    "code *stays* {id}\n"
    "```"
)


def synth_vimwiki(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"= Doc {i} =\n"
        f"== Part {i} ==\n"
        f"intro {text} with *bold* and _italic_\n"
        "- item A\n"
        f"    - nested {i}\n"
        "1. first\n"
        f"see [[https://example.com/d/{i}|site {i}]]\n"
        "{{{python\n"
        f"code *stays* {i}\n"
        "}}}"
    )


DOCBOOK_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "\n"
    "## Part {id}\n"
    "\n"
    "intro {text} with **bold** and *italic*\n"
    "\n"
    "- item A\n"
    "  1. sub {id}\n"
    "\n"
    "see [site {id}](https://example.com/d/{id})\n"
    "\n"
    "```\n"
    "code <x> {id}\n"
    "```"
)


def synth_docbook(doc_id: int, text: str) -> bytes:
    i = doc_id
    t = (text.replace("&", "&amp;").replace("<", "&lt;"))
    return (
        '<article xmlns="http://docbook.org/ns/docbook" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" version="5.0">'
        f"<title>Doc {i}</title>"
        "<section>"
        f"<title>Part {i}</title>"
        f'<para>intro {t} with <emphasis role="bold">bold</emphasis>'
        " and <emphasis>italic</emphasis></para>"
        "<itemizedlist><listitem><para>item A</para>"
        "<orderedlist><listitem>"
        f"<para>sub {i}</para>"
        "</listitem></orderedlist></listitem></itemizedlist>"
        f'<para>see <link xlink:href="https://example.com/d/{i}">'
        f"site {i}</link></para>"
        f"<programlisting>code &lt;x&gt; {i}</programlisting>"
        "</section></article>"
    ).encode("utf-8")


# --- pipeline surface ----------------------------------------------------------

from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

creole_extract = extract_query(synth_creole, creole_to_md, batch_size=512)
vimwiki_extract = extract_query(synth_vimwiki, vimwiki_to_md, batch_size=512)
docbook_extract = extract_query(synth_docbook, docbook_to_md, batch_size=512)


def sql_creole_extract() -> str:
    return sql_golden_query(CREOLE_GOLDEN_TEMPLATE)


def sql_vimwiki_extract() -> str:
    return sql_golden_query(VIMWIKI_GOLDEN_TEMPLATE)


def sql_docbook_extract() -> str:
    return sql_golden_query(DOCBOOK_GOLDEN_TEMPLATE)
