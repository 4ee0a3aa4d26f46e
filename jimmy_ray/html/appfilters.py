"""App-specific DOM filter hooks (the reference's custom_filter tier).

Behavior ports of /root/reference/src/jimmy/md_lib/html_filter.py's
per-app soup filters, re-expressed over this engine's _Node tree and
exposed through ``FILTER_REGISTRY`` (the reference passes them per-format
via ``markup_to_markdown(custom_filter=[...])``, convert.py:73-78):

- nimbus_add_mark (:231-246): nn-marker class / highlight attrs → mark
- nimbus_add_note_links (:249-266): span.mention-link →
  ``<a href="nimbusnote://<quoted name>">``
- notion_streamline_lists (:386-395): ul.to-do-list item divs →
  checkbox inputs
- synology_fix_checklists (:490-550): flat checkbox divs →
  nested task lists (level = padding-left / 30px)
- synology_fix_img_src (:553-562): transparent-gif imgs take src from ref
- upnote_add_highlight (:766-770): shine-highlight* class → mark
- upnote_streamline_checklists (:773-787): li[data-checked] → checklist
"""

from __future__ import annotations

from urllib.parse import quote

from jimmy_ray.html.extract import _Node

_HIGHLIGHT_ATTRS = (
    "data-highlight", "data-block-background", "data-comment-color",
    "data-palette-bg-rgb",
)


def _classes(node: _Node) -> list[str]:
    return node.attrs.get("class", "").split()


def _styles(node: _Node) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in node.attrs.get("style", "").split(";"):
        if ":" in item:
            k, _, v = item.partition(":")
            out[k.strip()] = v.strip()
    return out


def _wrap_content(node: _Node, tag: str) -> None:
    inner = _Node(tag, {})
    inner.children = node.children
    node.children = [inner]


def _walk(children: list, fn) -> None:
    """Depth-first: fn may rewrite each child list in place."""
    fn(children)
    for child in children:
        if isinstance(child, _Node):
            _walk(child.children, fn)


# --- nimbus ----------------------------------------------------------------

def nimbus_add_mark(root: _Node) -> None:
    def visit(children: list) -> None:
        for child in children:
            if not isinstance(child, _Node):
                continue
            if "nn-marker" in _classes(child):
                _wrap_content(child, "mark")
                continue
            for attr in _HIGHLIGHT_ATTRS:
                value = child.attrs.get(attr)
                if value is not None and value not in ("transparent", "white"):
                    _wrap_content(child, "mark")
                    break

    _walk(root.children, visit)


def nimbus_add_note_links(root: _Node) -> None:
    def visit(children: list) -> None:
        for i, child in enumerate(children):
            if (
                isinstance(child, _Node)
                and child.tag == "span"
                and "mention-link" in _classes(child)
            ):
                name = child.attrs.get("data-mention-name", "") or "".join(
                    c for c in child.children if isinstance(c, str)
                )
                if not name:
                    continue
                link = _Node("a", {"href": f"nimbusnote://{quote(name)}"})
                link.children = [name]
                children[i] = link

    _walk(root.children, visit)


def _find_all(node: _Node, tag: str, out: list | None = None) -> list:
    """Document-order descendants with the given tag."""
    if out is None:
        out = []
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == tag:
                out.append(child)
            _find_all(child, tag, out)
    return out


def nimbus_streamline_lists(root: _Node) -> None:
    """html_filter.py:268-344: nimbus exports every list as a flat ul; the
    real type (bullet/number/checkbox) and nesting (indent-X / level-X)
    live in class attrs.  Rebuild nested typed lists; single checkbox
    spans in tables become literal markers."""

    def indent_of(item: _Node) -> int:
        for cls in _classes(item):
            for prefix in ("indent-", "level-"):
                if cls.startswith(prefix):
                    try:
                        return int(cls[len(prefix):])
                    except ValueError:
                        pass
        return 0

    def type_of(item: _Node, parent_classes: list[str]) -> tuple[str, str]:
        classes = _classes(item)
        if "outline-list-item" in classes or "list-item-bullet" in classes:
            item_type = "bullet"
        elif "list-item-number" in classes:
            item_type = "number"
        elif ("list-item-checkbox" in classes
              or "nn-checkbox-list" in parent_classes
              or "checklist" in parent_classes):
            item_type = "checkbox"
        else:
            item_type = "bullet"
        return {"checkbox": "ul", "bullet": "ul", "number": "ol"}[item_type], item_type

    for list_ in _find_all(root, "ul"):
        items = [c for c in list_.children
                 if isinstance(c, _Node) and c.tag == "li"]
        if not items:
            continue
        parent_classes = _classes(list_)
        list_.children = []
        stack = [list_]  # stack[level] = list node at that depth
        current_indent = 0
        for item in items:
            list_type, item_type = type_of(item, parent_classes)
            if item_type == "checkbox":
                box = _Node("input", {"type": "checkbox"})
                if (item.attrs.get("data-checked", "false") == "true"
                        or "nn-checked" in _classes(item)):
                    box.attrs["checked"] = ""
                item.children.insert(0, box)
            indent = indent_of(item)
            if indent == 0:
                list_.tag = list_type
                if item_type == "checkbox" and "checklist" not in _classes(list_):
                    list_.attrs["class"] = "checklist"
            if indent > current_indent:
                # one nested list per item regardless of the indent jump
                # (html_filter.py:318-323 appends a single new child list)
                deeper = _Node(list_type, {})
                host = stack[-1].children[-1] if stack[-1].children else None
                if isinstance(host, _Node) and host.tag == "li":
                    host.children.append(deeper)
                else:
                    stack[-1].children.append(deeper)
                stack.append(deeper)
            elif indent < current_indent:
                # walk up (current - indent) parent lists, exactly like
                # the reference (:329-333) — indent VALUES can skip
                # levels, so they are not stack indices
                for _ in range(current_indent - indent):
                    if len(stack) > 1:
                        stack.pop()
            current_indent = indent
            item.attrs = {}
            stack[-1].children.append(item)

    # single checkboxes inside tables render as literal markers
    def visit(children: list) -> None:
        for child in children:
            if (isinstance(child, _Node) and child.tag == "span"
                    and "checkbox-component" in _classes(child)):
                mark = "[x]" if "checked" in _classes(child) else "[ ]"
                child.children = [mark]
                child.attrs = {}

    _walk(root.children, visit)


def nimbus_streamline_tables(root: _Node) -> None:
    """html_filter.py:347-374: drop footers, the A/B/... header row and
    the two index columns of new-style nimbus tables (old-style tables
    fail the sanity checks and pass through untouched)."""
    for table in _find_all(root, "table"):
        for tfoot in _find_all(table, "tfoot"):
            tfoot.children = []
            tfoot.tag = "x-removed"
        rows = _find_all(table, "tr")

        def cell_text(node: _Node) -> str:
            parts: list[str] = []

            def rec(n):
                for c in n.children:
                    if isinstance(c, str):
                        parts.append(c)
                    else:
                        rec(c)

            rec(node)
            return "".join(parts).strip()

        ok = True
        for row_index, row in enumerate(rows):
            cells = [c for c in row.children
                     if isinstance(c, _Node) and c.tag == "td"]
            for col_index, col in enumerate(cells):
                text = cell_text(col)
                if row_index == 0 and text and not text.isalpha():
                    ok = False
                if col_index in (0, 1) and row_index > 0 and text \
                        and not text.isdigit():
                    ok = False
        if not ok:
            continue
        for row_index, row in enumerate(rows):
            if row_index == 0:
                row.children = []
                row.tag = "x-removed"
                continue
            kept = []
            td_seen = 0
            for c in row.children:
                if isinstance(c, _Node) and c.tag == "td":
                    if td_seen >= 2:
                        kept.append(c)
                    td_seen += 1
                else:
                    kept.append(c)
            row.children = kept


def nimbus_strip_images(root: _Node) -> None:
    """html_filter.py:377-383: drop inline SVG icons and file-size spans."""

    def visit(children: list) -> None:
        children[:] = [
            c for c in children
            if not (isinstance(c, _Node) and (
                c.tag == "svg"
                or (c.tag == "span" and "file-size" in _classes(c))
            ))
        ]

    _walk(root.children, visit)


# --- notion ----------------------------------------------------------------

def notion_streamline_lists(root: _Node) -> None:
    def visit(children: list) -> None:
        for child in children:
            if not (isinstance(child, _Node) and child.tag == "ul"
                    and "to-do-list" in _classes(child)):
                continue
            for item in child.children:
                if not (isinstance(item, _Node) and item.tag == "li"):
                    continue
                for sub in item.children:
                    if isinstance(sub, _Node) and sub.tag == "div":
                        sub.tag = "input"
                        checked = "checkbox-on" in _classes(sub)
                        sub.attrs = {"type": "checkbox"}
                        if checked:
                            sub.attrs["checked"] = ""
                        break

    _walk(root.children, visit)


# --- synology note station -------------------------------------------------

def _is_syno_checkbox_div(node) -> bool:
    if not (isinstance(node, _Node) and node.tag == "div"):
        return False
    inputs = [
        c for c in node.children
        if isinstance(c, _Node) and c.tag == "input"
        and "syno-notestation-editor-checkbox" in _classes(c)
    ]
    return len(inputs) == 1


def synology_fix_checklists(root: _Node) -> None:
    """Consecutive flat checkbox divs → one (nested) task list; level from
    padding-left in 30px steps."""

    def visit(children: list) -> None:
        out: list = []
        run: list[tuple[int, _Node]] = []  # (level, li)

        def flush() -> None:
            if not run:
                return
            top = _Node("ul", {})
            stack = [top]  # stack[level] = ul at that depth
            for level, li in run:
                while len(stack) <= level:
                    deeper = _Node("ul", {})
                    host = stack[-1].children[-1] if stack[-1].children else None
                    if isinstance(host, _Node) and host.tag == "li":
                        host.children.append(deeper)
                    else:
                        stack[-1].children.append(deeper)
                    stack.append(deeper)
                del stack[level + 1 :]
                stack[level].children.append(li)
            out.append(top)
            run.clear()

        for child in children:
            if _is_syno_checkbox_div(child):
                level = 0
                pad = _styles(child).get("padding-left", "0")
                digits = "".join(ch for ch in pad if ch.isdigit())
                if digits:
                    level = int(digits) // 30
                box = next(
                    c for c in child.children
                    if isinstance(c, _Node) and c.tag == "input"
                )
                checked = (
                    "syno-notestation-editor-checkbox-checked" in _classes(box)
                )
                box.attrs = {"type": "checkbox"}
                if checked:
                    box.attrs["checked"] = ""
                li = _Node("li", {})
                li.children = [box] + [
                    c for c in child.children if c is not box
                ]
                run.append((level, li))
            else:
                flush()
                out.append(child)
        flush()
        children[:] = out

    _walk(root.children, visit)


def synology_fix_img_src(root: _Node) -> None:
    def visit(children: list) -> None:
        for child in children:
            if (
                isinstance(child, _Node)
                and child.tag == "img"
                and "syno-notestation-image-object" in _classes(child)
                and child.attrs.get("src")
                == "webman/3rdparty/NoteStation/images/transparent.gif"
                and (ref := child.attrs.get("ref")) is not None
            ):
                child.attrs["src"] = ref

    _walk(root.children, visit)


# --- upnote ----------------------------------------------------------------

def upnote_add_highlight(root: _Node) -> None:
    def visit(children: list) -> None:
        for child in children:
            if isinstance(child, _Node) and any(
                c.startswith("shine-highlight") for c in _classes(child)
            ):
                child.tag = "mark"

    _walk(root.children, visit)


def upnote_streamline_checklists(root: _Node) -> None:
    def visit(children: list) -> None:
        for child in children:
            if not (isinstance(child, _Node) and child.tag == "ul"):
                continue
            has_checked = False
            for item in child.children:
                if not (isinstance(item, _Node) and item.tag == "li"
                        and "data-checked" in item.attrs):
                    continue
                has_checked = True
                box = _Node("input", {"type": "checkbox"})
                if item.attrs.pop("data-checked", "false") == "true":
                    box.attrs["checked"] = ""
                # unwrap div/pre/span wrappers inside the item
                flat: list = []
                for sub in item.children:
                    if isinstance(sub, _Node) and sub.tag in ("div", "pre", "span"):
                        flat.extend(sub.children)
                    else:
                        flat.append(sub)
                item.children = [box] + flat
            if has_checked:
                child.attrs["class"] = "checklist"

    _walk(root.children, visit)


FILTER_REGISTRY = {
    "nimbus_add_mark": nimbus_add_mark,
    "nimbus_add_note_links": nimbus_add_note_links,
    "nimbus_streamline_lists": nimbus_streamline_lists,
    "nimbus_streamline_tables": nimbus_streamline_tables,
    "nimbus_strip_images": nimbus_strip_images,
    "notion_streamline_lists": notion_streamline_lists,
    "synology_fix_checklists": synology_fix_checklists,
    "synology_fix_img_src": synology_fix_img_src,
    "upnote_add_highlight": upnote_add_highlight,
    "upnote_streamline_checklists": upnote_streamline_checklists,
}
