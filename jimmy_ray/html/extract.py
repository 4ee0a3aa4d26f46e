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
- tables → pipe tables with full ``streamline_tables:568-673``
  normalization (rowspan/colspan expansion, hidden cells, block content
  flattened with ``<br>``, lists-in-cells, captions — no ``[TABLE]`` punt)
- links/images ``[text](url "title")`` / ``![alt](src)``
  (md_lib/links.py:16-27)

The function is stateless and per-document — exactly a ``map_batches``
body (SURVEY.md §2.2 M1-M3); batch drivers live in
jimmy_ray.stages.extract.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")
_MULTISPACE_RE = re.compile(r"  +")


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
        self.tags_seen: set[str] = set()

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.tags_seen.add(tag)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.tags_seen.add(tag)
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


# --- fast tokenizer --------------------------------------------------------
# One C-regex sweep replaces html.parser's char-by-char goahead loop (the
# per-document parse dominated extraction wall time).  Any construct the
# sweep can't prove it handled identically (raw-text elements, stray '<'
# in text, CDATA) falls back to html.parser, so behavior is bit-identical
# by construction; a differential test asserts it on every fixture page.

_TOKEN_RE = re.compile(
    r"<([a-zA-Z][-\w.:]*)"             # start tag     -> group 1
    r"((?:\s+[^\s=/>]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"  # attrs -> 2
    r"\s*(/?)>"                        # self-closing  -> group 3
    r"|</([a-zA-Z][-\w.:]*)\s*>"       # end tag       -> group 4
    r"|<!--.*?-->"                     # comments
    r"|<!\[CDATA\[.*?\]\]>"            # CDATA (fallback trigger below)
    r"|<![^>]*>"                       # doctype / declarations
    r"|<\?[^>]*>",                     # processing instructions
    re.S,
)
_ATTR_RE = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_RAWTEXT_RE = re.compile(r"<(script|style|textarea)\b", re.I)


def _fast_parse(html: str) -> _Node | None:
    """Regex-sweep DOM build; None = punt to html.parser."""
    if _RAWTEXT_RE.search(html) or "<![CDATA[" in html:
        return None
    root = _Node("#root", {})
    stack = [root]
    tags_seen: set[str] = set()
    pos = 0
    for m in _TOKEN_RE.finditer(html):
        start = m.start()
        if start > pos:
            text = html[pos:start]
            if "<" in text:
                return None  # stray '<' — html.parser has subtler rules
            if text:
                stack[-1].children.append(
                    unescape(text) if "&" in text else text
                )
        pos = m.end()
        start_tag, raw_attrs, selfclose, end_tag = m.groups()
        if start_tag is not None:
            tag = start_tag.lower()
            tags_seen.add(tag)
            attrs: dict[str, str] = {}
            if raw_attrs:
                for am in _ATTR_RE.finditer(raw_attrs):
                    name, v1, v2, v3 = am.groups()
                    value = v1 if v1 is not None else (
                        v2 if v2 is not None else v3
                    )
                    # bare attributes stay None, matching html.parser
                    if value is not None and "&" in value:
                        value = unescape(value)
                    attrs[name.lower()] = value
            node = _Node(tag, attrs)
            stack[-1].children.append(node)
            if not selfclose and tag not in _VOID_TAGS:
                stack.append(node)
        elif end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
    if pos < len(html):
        tail = html[pos:]
        if "<" in tail:
            return None
        if tail:
            stack[-1].children.append(unescape(tail) if "&" in tail else tail)
    root.attrs["#tags"] = tags_seen
    return root


def parse_dom(html: bytes | str) -> _Node:
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    root = _fast_parse(html)
    if root is not None:
        return root
    builder = _TreeBuilder()
    builder.feed(html)
    # tag inventory rides on the root so the filter chain can skip whole
    # passes for documents that lack a filter's trigger tags
    builder.root.attrs["#tags"] = builder.tags_seen
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


# --- DOM tree filters (generic suite, html_filter.py behavior ports) -------

# /root/reference/src/jimmy/md_lib/html_filter.py:123-139
_INLINE_FMT_TAGS = frozenset({
    "b", "cite", "code", "del", "em", "i", "ins", "mark", "s", "strike",
    "strong", "sub", "sup", "tt", "u",
})


def _count_li(node: _Node) -> int:
    n = 0
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == "li":
                n += 1
            n += _count_li(child)
    return n


def _merge_single_element_lists(children: list) -> None:
    """Append one-item ul/ol to a directly preceding list of the same kind
    (merge_single_element_lists, html_filter.py:197-214)."""
    out: list = []
    for child in children:
        if isinstance(child, _Node):
            _merge_single_element_lists(child.children)
            if child.tag in ("ul", "ol") and _count_li(child) == 1:
                for prev in reversed(out):
                    if isinstance(prev, str):
                        if prev.strip():
                            break
                        continue
                    if prev.tag == child.tag:
                        prev.children.extend(child.children)
                        child = None
                    break
                if child is None:
                    continue
        out.append(child)
    children[:] = out


def _remove_duplicated_links(children: list) -> None:
    """Unwrap <a href=X><img src=X></a> and nested same-href anchors
    (remove_duplicated_links, html_filter.py:413-425)."""
    out: list = []
    for child in children:
        if isinstance(child, _Node):
            _remove_duplicated_links(child.children)
            if child.tag == "a":
                href = child.attrs.get("href", "")
                if href and any(
                    isinstance(c, _Node) and c.tag == "img"
                    and c.attrs.get("src", "") == href
                    for c in child.children
                ):
                    out.extend(child.children)
                    continue
                if href:
                    _unwrap_nested_anchor(child, href)
        out.append(child)
    children[:] = out


def _unwrap_nested_anchor(node: _Node, href: str) -> None:
    out: list = []
    for child in node.children:
        if isinstance(child, _Node):
            _unwrap_nested_anchor(child, href)
            if child.tag == "a" and child.attrs.get("href", "") == href:
                out.extend(child.children)
                continue
        out.append(child)
    node.children[:] = out


def _multiline_markup(children: list) -> None:
    """br/p inside inline formatting splits the formatting per segment;
    br inside headings is dropped (multiline_markup,
    html_filter.py:216-228)."""
    out: list = []
    for child in children:
        if isinstance(child, _Node):
            _multiline_markup(child.children)
            if child.tag in _HEADINGS:
                child.children = [
                    c for c in child.children
                    if not (isinstance(c, _Node) and c.tag == "br")
                ]
            elif child.tag in _INLINE_FMT_TAGS and any(
                isinstance(c, _Node) and c.tag in ("br", "p")
                for c in child.children
            ):
                for sub in child.children:
                    if isinstance(sub, _Node) and sub.tag in ("br", "p"):
                        out.append(sub)
                    else:
                        wrap = _Node(child.tag, dict(child.attrs))
                        wrap.children = [sub]
                        out.append(wrap)
                continue
        out.append(child)
    children[:] = out


def _unwrap_inline_whitespace(children: list) -> None:
    """Move leading/trailing spaces out of single-text inline markup so
    ``<b>foo </b>bar`` renders **foo** bar (unwrap_inline_whitespace,
    html_filter.py:711-746)."""
    out: list = []
    for child in children:
        if isinstance(child, _Node):
            _unwrap_inline_whitespace(child.children)
            if (
                child.tag in _INLINE_FMT_TAGS
                and len(child.children) == 1
                and isinstance(child.children[0], str)
            ):
                s = child.children[0]
                if "\n" not in s and s != s.strip():
                    lead = s[: len(s) - len(s.lstrip())]
                    trail = s[len(s.rstrip()):]
                    child.children[0] = s.strip()
                    if lead:
                        out.append(lead)
                    out.append(child)
                    if trail:
                        out.append(trail)
                    continue
        out.append(child)
    children[:] = out


def _remove_empty_markup(children: list) -> None:
    """Unwrap inline formatting with empty/whitespace-only content
    (remove_empty_markup, html_filter.py:428-454)."""
    out: list = []
    for child in children:
        if isinstance(child, _Node):
            _remove_empty_markup(child.children)
            if child.tag in _INLINE_FMT_TAGS:
                cs = child.children
                if not cs:
                    continue
                if (
                    len(cs) == 1 and isinstance(cs[0], str)
                    and "\n" not in cs[0] and not cs[0].strip()
                ):
                    out.append(cs[0])
                    continue
        out.append(child)
    children[:] = out


_CODE_LIKE = frozenset({"annotation", "code", "kbd", "samp", "pre", "var"})


def replace_special_characters(children: list, in_code: bool = False) -> None:
    """Re-parse text nodes that still contain markup after entity decoding
    (replace_special_characters, html_filter.py:457-467).  Not in the
    default chain — a registry filter, like the reference (convert.py:73
    applies it only as a custom_filter)."""
    out: list = []
    for child in children:
        if isinstance(child, str):
            if not in_code and "<" in child and ">" in child:
                out.extend(parse_dom(child).children)
                continue
        else:
            replace_special_characters(
                child.children, in_code or child.tag in _CODE_LIKE
            )
        out.append(child)
    children[:] = out


def apply_default_filters(root: _Node) -> None:
    """The generic tree-filter chain, in the reference's order
    (convert.py:80-96; render-level filters — checklists, highlighting,
    iframes, internal-heading slugs, merge-consecutive, bold-header,
    tables, underline/strikethrough — run inside the Markdown writer).

    Each pass is gated on the parse-time tag inventory: a document with no
    <a> never pays the remove_duplicated_links walk, etc. (most pages
    trigger at most one or two passes)."""
    tags = root.attrs.get("#tags")
    has_fmt = tags is None or bool(tags & _INLINE_FMT_TAGS)
    if tags is None or "ul" in tags or "ol" in tags:
        _merge_single_element_lists(root.children)
    if tags is None or "a" in tags:
        _remove_duplicated_links(root.children)
    if has_fmt and (tags is None or "br" in tags or "p" in tags) or (
        tags is not None and "br" in tags and tags & _HEADINGS.keys()
    ):
        _multiline_markup(root.children)
    if has_fmt:
        _unwrap_inline_whitespace(root.children)
        _remove_empty_markup(root.children)


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
    # collapse cross-node space runs introduced by whitespace text nodes
    if "  " in out:
        out = _MULTISPACE_RE.sub(" ", out)
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


def _table_rows(node: _Node) -> list[_Node]:
    """tr elements of this table (through thead/tbody/tfoot, not into
    nested tables)."""
    trs: list[_Node] = []

    def walk(n: _Node):
        for child in n.children:
            if not isinstance(child, _Node):
                continue
            if child.tag == "tr":
                trs.append(child)
            elif child.tag in ("thead", "tbody", "tfoot"):
                walk(child)

    walk(node)
    return trs


def _span(cell: _Node, attr: str) -> int:
    try:
        return max(1, int(cell.attrs.get(attr, "1") or 1))
    except ValueError:
        return 1


_NBSP = " "


def _render_cell_list(node: _Node, level: int) -> str:
    """List inside a table cell: every item becomes <br> + nbsp-indent +
    bullet + text (streamline_tables simplify_list,
    /root/reference/src/jimmy/md_lib/html_filter.py:575-586)."""
    ordered = node.tag == "ol"
    parts: list[str] = []
    index = 1
    for child in node.children:
        if not isinstance(child, _Node) or child.tag != "li":
            continue
        bullet = f"{index}. " if ordered else "- "
        index += 1
        nested = [c for c in child.children
                  if _is_block(c) and c.tag in ("ul", "ol")]
        inline = [c for c in child.children if c not in nested]
        parts.append("<br>" + _NBSP * 4 * level + bullet
                     + _render_inline(inline).replace("\n", "<br>"))
        for sub in nested:
            parts.append(_render_cell_list(sub, level + 1))
    return "".join(parts)


def _join_cell_parts(parts: list[str]) -> str:
    """Join cell block fragments with <br>; fragments that already start
    with <br> (lists) concatenate directly."""
    out = ""
    for p in parts:
        if not p:
            continue
        if not out or p.startswith("<br>"):
            out += p
        else:
            out += "<br>" + p
    return out


def _render_cell(cell: _Node) -> str:
    """Cell content flattened to one pipe-safe line: blocks joined with
    literal <br>, headers → bold, blockquote → inline quote, pre/div/span
    unwrapped, lists → <br>-prefixed items, nested tables → rows joined
    with <br> (behavior port of streamline_tables,
    /root/reference/src/jimmy/md_lib/html_filter.py:568-673, plus the
    pandoc pipe-writer flattening the reference relies on)."""
    parts: list[str] = []
    inline_run: list = []

    def flush():
        if inline_run:
            text = _render_inline(inline_run).replace("\n", "<br>")
            if text:
                parts.append(text)
            inline_run.clear()

    def walk(children: list):
        for child in children:
            if isinstance(child, str):
                if child.strip():
                    inline_run.append(child)
                continue
            tag = child.tag
            if tag in ("div", "section", "article"):
                walk(child.children)  # unwrap (html_filter.py:604-608)
            elif tag == "p":
                flush()
                inline_run.extend(child.children)
                flush()
            elif tag in _HEADINGS:
                flush()
                inner = _render_inline(child.children, strip_bold=True)
                if inner:
                    parts.append(f"**{inner}**")  # html_filter.py:664-666
            elif tag in ("ul", "ol"):
                flush()
                md = _render_cell_list(child, 0)
                if md:
                    parts.append(md)
            elif tag == "blockquote":
                flush()
                inner = _render_cell(child)
                if inner:
                    parts.append(f'"{inner}"')  # q-ified (html_filter.py:668-670)
            elif tag == "pre":
                flush()
                code = _text_content(child).strip()
                if code:
                    parts.append("`" + code.replace("\n", " ") + "`")
            elif tag == "table":
                flush()
                grid, _ = _table_grid(child)
                rows_md = ["  ".join(t for t, _ in row).strip() for row in grid]
                parts.append("<br>".join(r for r in rows_md if r))
            elif _is_block(child):
                flush()
                walk(child.children)
            else:
                inline_run.append(child)
        flush()

    walk(cell.children)
    return _join_cell_parts(parts)


def _table_grid(node: _Node) -> tuple[list[list[tuple[str, bool]]], bool]:
    """Expand the table into a dense (text, is_header) grid: hidden cells
    dropped, colspan/rowspan expanded with empty padding (content in the
    top-left position), ragged rows padded."""
    trs = _table_rows(node)
    grid: list[list[tuple[str, bool]]] = []
    pending: dict[int, int] = {}  # col -> rows still covered by a rowspan
    first_row_has_rowspan = False
    for r, tr in enumerate(trs):
        cells = [c for c in tr.children
                 if isinstance(c, _Node) and c.tag in ("td", "th")
                 and "hidden" not in c.attrs]
        row: list[tuple[str, bool]] = []
        col = 0
        for cell in cells:
            while pending.get(col, 0) > 0:
                pending[col] -= 1
                row.append(("", False))
                col += 1
            colspan = _span(cell, "colspan")
            rowspan = _span(cell, "rowspan")
            if r == 0 and rowspan > 1:
                first_row_has_rowspan = True
            is_th = cell.tag == "th"
            row.append((_render_cell(cell), is_th))
            if rowspan > 1:
                pending[col] = pending.get(col, 0) + rowspan - 1
            col += 1
            for _ in range(colspan - 1):
                if rowspan > 1:
                    pending[col] = pending.get(col, 0) + rowspan - 1
                row.append(("", is_th))
                col += 1
        while pending.get(col, 0) > 0:
            pending[col] -= 1
            row.append(("", False))
            col += 1
        if row:
            grid.append(row)
    if grid:
        width = max(len(row) for row in grid)
        for row in grid:
            row.extend([("", False)] * (width - len(row)))
    return grid, first_row_has_rowspan


def _render_table(node: _Node) -> str:
    """Normalized pipe table (no [TABLE] punt): any rowspan/colspan/
    block-content/ragged table is rewritten, mirroring streamline_tables
    + the pandoc pipe writer.  First row becomes the header (td promoted
    to th, html_filter.py:653-661) unless it spans rows, in which case
    the table is headerless (empty header row)."""
    grid, first_row_has_rowspan = _table_grid(node)
    if not grid:
        return ""
    width = len(grid[0])
    caption = ""
    cap = _find(node, "caption")
    if cap is not None:
        caption_text = _render_inline(cap.children).replace("\n", " ").strip()
        if caption_text:
            caption = caption_text + "\n\n"
    if first_row_has_rowspan:
        header = [""] * width
        data = grid
    else:
        header = [t for t, _ in grid[0]]
        data = grid[1:]
    lines = ["| " + " | ".join(header) + " |",
             "| " + " | ".join(["---"] * width) + " |"]
    for row in data:
        lines.append("| " + " | ".join(t for t, _ in row) + " |")
    return caption + "\n".join(lines)


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


def html_to_markdown_filtered(
    html: bytes | str, filter_names: list[str] | None = None
) -> str:
    """Extraction with app-specific pre-filters (the reference's
    custom_filter hook, convert.py:73-78): registry filters run on the
    parsed tree before the default chain."""
    root = parse_dom(html)
    if filter_names:
        from jimmy_ray.html.appfilters import FILTER_REGISTRY

        for name in filter_names:
            FILTER_REGISTRY[name](root)
    apply_default_filters(root)
    body = _find(root, "body") or root
    out: list[str] = []
    _render_blocks(body.children, out)
    return "\n\n".join(out).strip()


def html_to_markdown_and_title(html: bytes | str) -> tuple[str, str]:
    """Single-parse extraction: one parse_dom serves both renders (DOM parse
    dominated the flagship stage when run twice per document)."""
    root = parse_dom(html)
    apply_default_filters(root)
    body = _find(root, "body") or root
    out: list[str] = []
    _render_blocks(body.children, out)
    title = _find(root, "title")
    title_text = _text_content(title).strip() if title is not None else ""
    return "\n\n".join(out).strip(), title_text
