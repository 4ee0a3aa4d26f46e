"""Lexical ("Super" note) JSON → Markdown walker (SURVEY.md §2.2 M10).

Behavioral port of the reference's recursive block walker
(/root/reference/src/jimmy/formats/standard_notes.py:58-204): a Lexical
document is a JSON tree of typed blocks; the walker renders root /
paragraph / heading / quote / list (bullet, number, check) / code /
link / table / text-with-format-bitmask nodes to Markdown.  Implemented
fresh as a pure recursive renderer (blocks → string list → joined),
rather than the reference's mutable accumulator.

Format bitmask (the public Lexical text-format flags):
1 bold, 2 italic, 4 strikethrough, 8 underline, 16 code, 64 superscript,
32 subscript, 128 highlight.
"""

from __future__ import annotations

import json

FORMAT_BOLD = 1
FORMAT_ITALIC = 2
FORMAT_STRIKETHROUGH = 4
FORMAT_UNDERLINE = 8
FORMAT_CODE = 16
FORMAT_SUBSCRIPT = 32
FORMAT_SUPERSCRIPT = 64
FORMAT_HIGHLIGHT = 128


def _format_text(text: str, fmt: int) -> str:
    if not text:
        return text
    if fmt & FORMAT_CODE:
        text = f"`{text}`"
    if fmt & FORMAT_BOLD:
        text = f"**{text}**"
    if fmt & FORMAT_ITALIC:
        text = f"*{text}*"
    if fmt & FORMAT_STRIKETHROUGH:
        text = f"~~{text}~~"
    if fmt & FORMAT_UNDERLINE:
        text = f"++{text}++"
    if fmt & FORMAT_HIGHLIGHT:
        text = f"=={text}=="
    if fmt & FORMAT_SUPERSCRIPT:
        text = f"^{text}^"
    if fmt & FORMAT_SUBSCRIPT:
        text = f"~{text}~"
    return text


def _inline(block: dict) -> str:
    btype = block.get("type", "")
    if btype in ("text", "code-highlight"):
        return _format_text(block.get("text", ""), int(block.get("format", 0) or 0))
    if btype in ("link", "autolink"):
        children = block.get("children", [])
        text = "".join(_inline(c) for c in children)
        url = block.get("url", "")
        if not url:
            return f"<{text}>"
        if text == url and "://" in url:
            return f"<{url}>"
        return f"[{text}]({url})"
    if btype == "linebreak":
        return "\n"
    return "".join(_inline(c) for c in block.get("children", []))


def _render_list(block: dict) -> str:
    list_type = block.get("listType", "bullet")
    lines = []
    for i, item in enumerate(block.get("children", []), start=1):
        if list_type == "number":
            bullet = f"{i}. "
        elif list_type == "check":
            bullet = "- [x] " if item.get("checked", False) else "- [ ] "
        else:
            bullet = "- "
        nested = [c for c in item.get("children", [])
                  if isinstance(c, dict) and c.get("type") == "list"]
        inline_children = [c for c in item.get("children", []) if c not in nested]
        lines.append(bullet + "".join(_inline(c) for c in inline_children))
        for sub in nested:
            sub_md = _render_list(sub)
            lines.extend("    " + line for line in sub_md.split("\n"))
    return "\n".join(lines)


def _render_table(block: dict) -> str:
    header: list[str] = []
    rows: list[list[str]] = []
    for row in block.get("children", []):
        cells = []
        is_header = False
        for cell in row.get("children", []):
            if int(cell.get("headerState", 0) or 0) == 1 and not header:
                is_header = True
            cells.append(" ".join(_inline(cell).split()))
        if is_header and not header:
            header = cells
        else:
            rows.append(cells)
    if not header and rows:
        header = rows.pop(0)
    width = max([len(header)] + [len(r) for r in rows]) if (header or rows) else 0
    if width == 0:
        return ""
    def fmt(cells: list[str]) -> str:
        return "| " + " | ".join(cells + [""] * (width - len(cells))) + " |"
    lines = [fmt(header), "| " + " | ".join(["---"] * width) + " |"]
    lines.extend(fmt(r) for r in rows)
    return "\n".join(lines)


def _render_block(block: dict, quote_level: int = 0) -> list[str]:
    btype = block.get("type", "")
    prefix = "> " * quote_level
    if btype in ("root", "collapsible-content"):
        out: list[str] = []
        for child in block.get("children", []):
            out.extend(_render_block(child, quote_level))
        return out
    if btype == "paragraph":
        text = "".join(_inline(c) for c in block.get("children", []))
        if not text:
            return []
        return ["\n".join(prefix + line for line in text.split("\n"))]
    if btype == "heading":
        level = int(str(block.get("tag", "h1"))[-1])
        text = "".join(_inline(c) for c in block.get("children", []))
        return [prefix + "#" * level + " " + text]
    if btype == "quote":
        out = []
        for child in block.get("children", []):
            out.extend(_render_block(child, quote_level + 1))
        return out
    if btype == "list":
        md = _render_list(block)
        if not md:
            return []
        return ["\n".join(prefix + line for line in md.split("\n"))]
    if btype == "code":
        lang = block.get("language", "") or ""
        body = "".join(_inline(c) for c in block.get("children", []))
        return [f"```{lang}\n{body}\n```"]
    if btype == "horizontalrule":
        return [prefix + "---"]
    if btype == "table":
        return [_render_table(block)]
    if btype == "collapsible-container":
        out = []
        for child in block.get("children", []):
            if child.get("type") == "collapsible-title":
                text = "".join(_inline(c) for c in child.get("children", []))
                out.append(f"**{text}**")
            else:
                out.extend(_render_block(child, quote_level))
        return out
    # unknown block: render children (tolerant, like the debug-log path)
    out = []
    for child in block.get("children", []):
        out.extend(_render_block(child, quote_level))
    if not out:
        text = _inline(block)
        if text:
            out.append(prefix + text)
    return out


def super_to_markdown(super_json: str | dict) -> str:
    """Convert a Lexical/Super JSON document to Markdown."""
    doc = json.loads(super_json) if isinstance(super_json, str) else super_json
    blocks = _render_block(doc.get("root", doc))
    return "\n\n".join(b for b in blocks if b.strip())
