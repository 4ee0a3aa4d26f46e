"""From-scratch HTML → Markdown extraction engine (stdlib only).

Re-expresses the reference's single path of truth ``markup → filtered HTML
→ Markdown`` (/root/reference/src/jimmy/md_lib/convert.py:73-114 and the
filter suite /root/reference/src/jimmy/md_lib/html_filter.py) as one
deterministic pure function ``html_bytes -> markdown str``.  Neither
BeautifulSoup, python-markdown nor pandoc exist in this environment, so
the DOM build and the Markdown writer are implemented here directly on
``html.parser.HTMLParser``.

Output dialect matches the reference's pandoc profile
(``markdown_strict`` + mark/strikeout/task_lists/pipe_tables,
/root/reference/src/jimmy/md_lib/convert.py:44-69) for the constructs the
suite covers:

- headings ``#``..``######`` with bold-in-header removed
  (``remove_bold_header``, html_filter.py:397)
- ``**bold**``, ``*italic*``, ``==mark==`` (``highlighting:66``),
  ``~~strike~~`` (``strikethrough:470``), ``++underline++``
  (``underline:676-707``), `` `code` ``
- div-class-checklist → task list ``- [x]`` (``div_checklists:48``)
- iframes → links, text defaults to src (``iframes_to_links:72``)
- simple tables → pipe tables; complex (rowspan/colspan/block content)
  → literal ``[TABLE]`` (``streamline_tables:568`` +
  convert.py:109-111 warning path)
- links/images ``[text](url "title")`` / ``![alt](src)``
  (md_lib/links.py:16-27)

The function is stateless and per-document — exactly a ``map_batches``
body (SURVEY.md §2.2 M1-M3); batch drivers live in
jimmy_ray.stages.extract.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")


def _slugify(fragment: str) -> str:
    from jimmy_ray.md.text import to_markdown_header_id

    return to_markdown_header_id(fragment)

_VOID_TAGS = frozenset(
    {"img", "input", "br", "hr", "meta", "link", "area", "base", "col", "embed",
     "source", "track", "wbr"}
)
_BLOCK_TAGS = frozenset(
    {"p", "div", "ul", "ol", "li", "table", "tr", "td", "th", "thead", "tbody",
     "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "hr", "iframe",
     "html", "head", "body", "title", "section", "article"}
)
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_INLINE_MARKERS = {
    "b": "**", "strong": "**",
    "i": "*", "em": "*",
    "mark": "==",
    "s": "~~", "del": "~~", "strike": "~~",
    "u": "++", "ins": "++",
    "code": "`",
}


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (tolerant of misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html: bytes | str) -> _Node:
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    return builder.root


def _find(node: _Node, tag: str) -> _Node | None:
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == tag:
                return child
            found = _find(child, tag)
            if found is not None:
                return found
    return None


def _collapse_ws(text: str) -> str:
    return _WS_RE.sub(" ", text)


def _is_checkbox(node) -> bool:
    return (
        isinstance(node, _Node)
        and node.tag == "input"
        and node.attrs.get("type", "").lower() == "checkbox"
    )


def _checkbox_md(node: _Node) -> str:
    return "[x]" if "checked" in node.attrs else "[ ]"


def _merge_consecutive(children: list) -> list:
    """Merge directly adjacent same-marker inline nodes
    (merge_consecutive_formatting, html_filter.py:142): <b>a</b><b>b</b>
    must render **ab**, not the broken **a****b**."""
    out: list = []
    for child in children:
        if (
            out
            and isinstance(child, _Node)
            and isinstance(out[-1], _Node)
            and child.tag in _INLINE_MARKERS
            and _INLINE_MARKERS.get(out[-1].tag) == _INLINE_MARKERS[child.tag]
        ):
            out[-1] = _merged_node(out[-1], child)
        else:
            out.append(child)
    return out


def _merged_node(a: "_Node", b: "_Node") -> "_Node":
    node = _Node(a.tag, a.attrs)
    node.children = list(a.children) + list(b.children)
    return node


def _render_inline(children: list, strip_bold: bool = False) -> str:
    """Render inline content; collapses whitespace runs (HTML semantics)."""
    parts: list[str] = []
    children = _merge_consecutive(children)
    for child in children:
        if isinstance(child, str):
            parts.append(_collapse_ws(child))
            continue
        tag = child.tag
        if tag in ("b", "strong") and strip_bold:
            parts.append(_render_inline(child.children, strip_bold))
        elif tag in _INLINE_MARKERS:
            inner = _render_inline(child.children, strip_bold)
            marker = _INLINE_MARKERS[tag]
            parts.append(f"{marker}{inner}{marker}" if inner.strip() else inner)
        elif tag == "a":
            text = _render_inline(child.children, strip_bold)
            href = child.attrs.get("href", "")
            title = child.attrs.get("title", "")
            if not href:
                parts.append(text)
            else:
                if href.startswith("#"):
                    # internal heading anchor -> header-id slug
                    # (link_internal_headings, html_filter.py:101)
                    href = "#" + _slugify(href[1:])
                title_md = f' "{title}"' if title else ""
                parts.append(f"[{text}]({href}{title_md})")
        elif tag == "img":
            alt = child.attrs.get("alt", "")
            src = child.attrs.get("src", "")
            title = child.attrs.get("title", "")
            title_md = f' "{title}"' if title else ""
            parts.append(f"![{alt}]({src}{title_md})")
        elif tag == "iframe":
            src = child.attrs.get("src", "")
            if src:
                text = _render_inline(child.children) or child.attrs.get("title", "") or src
                if not text.strip():
                    text = src
                parts.append(f"[{text}]({src})")
        elif tag == "br":
            parts.append("\n")
        elif _is_checkbox(child):
            parts.append(_checkbox_md(child) + " ")
        else:  # span & unknown inline tags: unwrap
            parts.append(_render_inline(child.children, strip_bold))
    out = "".join(parts)
    # collapse cross-node double spaces introduced by whitespace text nodes
    while "  " in out:
        out = out.replace("  ", " ")
    return out.strip()


def _is_block(node) -> bool:
    return isinstance(node, _Node) and node.tag in _BLOCK_TAGS


def _render_list(node: _Node, depth: int) -> str:
    ordered = node.tag == "ol"
    lines: list[str] = []
    index = 1
    for child in node.children:
        if not isinstance(child, _Node) or child.tag != "li":
            continue
        bullet = f"{index}. " if ordered else "- "
        index += 1
        # checkbox task item?
        inline_children = list(child.children)
        prefix = ""
        for sub in inline_children:
            if _is_checkbox(sub):
                prefix = _checkbox_md(sub) + " "
                inline_children = [c for c in inline_children if not _is_checkbox(c)]
                break
        nested = [c for c in inline_children if _is_block(c) and c.tag in ("ul", "ol")]
        inline_children = [c for c in inline_children if c not in nested]
        text = _render_inline(inline_children)
        lines.append("  " * depth + bullet + prefix + text)
        for sub in nested:
            lines.append(_render_list(sub, depth + 1))
    return "\n".join(lines)


def _table_cells(node: _Node) -> list[list[_Node]]:
    rows: list[list[_Node]] = []

    def walk(n: _Node):
        for child in n.children:
            if not isinstance(child, _Node):
                continue
            if child.tag == "tr":
                cells = [c for c in child.children
                         if isinstance(c, _Node) and c.tag in ("td", "th")]
                if cells:
                    rows.append(cells)
            elif child.tag in ("thead", "tbody", "tfoot"):
                walk(child)

    walk(node)
    return rows


def _render_table(node: _Node) -> str:
    rows = _table_cells(node)
    if not rows:
        return ""
    for cells in rows:
        for cell in cells:
            if "rowspan" in cell.attrs or "colspan" in cell.attrs:
                return "[TABLE]"
            if any(_is_block(c) for c in cell.children):
                return "[TABLE]"
    width = max(len(cells) for cells in rows)
    if any(len(cells) != width for cells in rows):
        return "[TABLE]"
    lines = []
    for i, cells in enumerate(rows):
        rendered = [_render_inline(c.children) for c in cells]
        lines.append("| " + " | ".join(rendered) + " |")
        if i == 0:
            lines.append("| " + " | ".join(["---"] * width) + " |")
    return "\n".join(lines)


def _checklist_div_to_list(node: _Node) -> _Node:
    """div.checklist → ul, inner divs → li (div_checklists semantics)."""
    ul = _Node("ul", {})
    for child in node.children:
        if isinstance(child, _Node) and child.tag == "div":
            li = _Node("li", {})
            li.children = child.children
            ul.children.append(li)
        else:
            ul.children.append(child)
    return ul


def _render_blocks(children: list, out: list[str]) -> None:
    inline_run: list = []

    def flush():
        if inline_run:
            text = _render_inline(inline_run)
            if text:
                out.append(text)
            inline_run.clear()

    for child in children:
        if isinstance(child, str):
            if child.strip():
                inline_run.append(child)
            continue
        tag = child.tag
        if not _is_block(child):
            inline_run.append(child)
            continue
        flush()
        if tag in _HEADINGS:
            text = _render_inline(child.children, strip_bold=True)
            out.append("#" * _HEADINGS[tag] + " " + text)
        elif tag == "p":
            text = _render_inline(child.children)
            if text:
                out.append(text)
        elif tag in ("ul", "ol"):
            md = _render_list(child, 0)
            if md:
                out.append(md)
        elif tag == "div":
            classes = child.attrs.get("class", "").split()
            if "checklist" in classes:
                out.append(_render_list(_checklist_div_to_list(child), 0))
            else:
                _render_blocks(child.children, out)
        elif tag == "table":
            md = _render_table(child)
            if md:
                out.append(md)
        elif tag == "blockquote":
            sub: list[str] = []
            _render_blocks(child.children, sub)
            body = "\n\n".join(sub)
            out.append("\n".join("> " + line for line in body.split("\n")))
        elif tag == "pre":
            code = _text_content(child)
            out.append(f"```\n{code.rstrip()}\n```")
        elif tag == "hr":
            out.append("---")
        elif tag == "iframe":
            text = _render_inline([child])
            if text:
                out.append(text)
        elif tag in ("html", "body", "section", "article"):
            _render_blocks(child.children, out)
        elif tag in ("head", "title"):
            continue
        else:
            _render_blocks(child.children, out)
    flush()


def _text_content(node: _Node) -> str:
    parts = []
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
        else:
            parts.append(_text_content(child))
    return "".join(parts)


def html_to_markdown(html: bytes | str) -> str:
    """The extraction pure function: full HTML document → Markdown."""
    return html_to_markdown_and_title(html)[0]


def extract_title(html: bytes | str) -> str:
    return html_to_markdown_and_title(html)[1]


def html_to_markdown_and_title(html: bytes | str) -> tuple[str, str]:
    """Single-parse extraction: one parse_dom serves both renders (DOM parse
    dominated the flagship stage when run twice per document)."""
    root = parse_dom(html)
    body = _find(root, "body") or root
    out: list[str] = []
    _render_blocks(body.children, out)
    title = _find(root, "title")
    title_text = _text_content(title).strip() if title is not None else ""
    return "\n\n".join(out).strip(), title_text
