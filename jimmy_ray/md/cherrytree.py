r"""CherryTree rich_text → Markdown (SURVEY.md §2.2 M11).

Behavioral port of /root/reference/src/jimmy/formats/cherrytree.py:36-282:
CTD XML nodes carry ``<rich_text>`` spans whose attributes encode
formatting (weight=heavy → bold, style=italic, strikethrough=true,
underline=single → ++..++, scale=sup/sub/h1-h6, family=monospace →
code, link="webs url"/"node id"), plus unicode bullet/checkbox list
markers fixed up to Markdown list syntax.  Formatting wraps the
whitespace-stripped core (split_leading_trailing_whitespace semantics).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from jimmy_ray.md.links import make_link
from jimmy_ray.md.text import split_leading_trailing_whitespace

LIST_RE = re.compile(r"^([ \t]*)(\d+)?([•◇▪▸→⇒☐☑☒)>-])", re.MULTILINE)
_HRULE = "~" * 33


def _list_sub(m: re.Match) -> str:
    spaces, number, bullet = m.groups()
    if bullet == "☐":
        return spaces + "- [ ]"
    if bullet in ("☑", "☒"):
        return spaces + "- [x]"
    if bullet in ("•", "◇", "▪", "▸", "→", "⇒"):
        return spaces + "-"
    if bullet in (")", "-", ">"):
        if number is None:
            return spaces + bullet
        return spaces + number + "."
    if number is None:
        return spaces + bullet
    return spaces + number + bullet


def fix_inline_formatting(md_content: str) -> str:
    r"""
    >>> fix_inline_formatting("☐ unchecked")
    '- [ ] unchecked'
    >>> fix_inline_formatting("☐ unchecked\n    ☒ nested checked")
    '- [ ] unchecked\n    - [x] nested checked'
    >>> fix_inline_formatting("dsa-dsa")
    'dsa-dsa'
    >>> fix_inline_formatting("1) item\n    12- item\n\t145> item")
    '1. item\n    12. item\n\t145. item'
    """
    md_content = md_content.replace(_HRULE, "---")
    return LIST_RE.sub(_list_sub, md_content)


def convert_rich_text(elem: ET.Element, heading_on_line: bool = False
                      ) -> tuple[str, list[tuple[str, str]], bool]:
    """One span -> (markdown, [(original_id, text) node links], heading flag)."""
    text = elem.text
    if text is None:
        return "", [], False
    if not text.strip():
        return text, [], False
    note_links: list[tuple[str, str]] = []
    leading, core, trailing = split_leading_trailing_whitespace(text)
    for attrib, value in elem.attrib.items():
        if attrib == "family" and value == "monospace":
            core = f"\n```\n{core}\n```\n" if "\n" in core else f"`{core}`"
        elif attrib == "link":
            if value.startswith("webs "):
                url = value[5:]
                core = f"<{core}>" if text == url else make_link(core, url)
            elif value.startswith("node "):
                url = value[5:]
                link_text = core
                core = make_link(link_text, url)
                note_links.append((url.split(" ", 1)[0], link_text))
            else:
                core = make_link(core, value)
        elif attrib == "scale":
            if value == "sup":
                core = f"^{core}^"
            elif value == "sub":
                core = f"~{core}~"
            elif value in ("h1", "h2", "h3", "h4", "h5", "h6"):
                if not heading_on_line:
                    leading = "#" * int(value[-1]) + " " + leading
                heading_on_line = True
        elif attrib == "strikethrough" and value == "true":
            core = f"~~{core}~~"
        elif attrib == "style" and value == "italic":
            core = f"*{core}*"
        elif attrib == "underline" and value == "single":
            core = f"++{core}++"
        elif attrib == "weight" and value == "heavy":
            core = f"**{core}**"
    md = leading + core + trailing
    if not md:
        md = text
    md = fix_inline_formatting(md)
    return md, note_links, heading_on_line and "\n" not in md


def node_to_markdown(node_xml: bytes | str) -> tuple[str, list[tuple[str, str]]]:
    """One CTD <node> -> (markdown body, node links)."""
    if isinstance(node_xml, bytes):
        node_xml = node_xml.decode("utf-8")
    root = ET.fromstring(node_xml)
    parts: list[str] = []
    links: list[tuple[str, str]] = []
    heading_on_line = False
    for elem in root.iter("rich_text"):
        md, span_links, heading_on_line = convert_rich_text(elem, heading_on_line)
        parts.append(md)
        links.extend(span_links)
    return "".join(parts), links
