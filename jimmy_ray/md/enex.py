"""Evernote ENEX note content (``en-note`` XML) → Markdown (M4 proper).

Behavior port of the reference's event-driven converter
(/root/reference/src/jimmy/md_lib/evernote.py:52-491) implemented as
dispatch-table handlers over ``xml.etree.ElementTree.XMLParser`` events:

- level-scoped formatting stack (bold/italic/code/strike/underline/
  codeblock opened by tags *or* inline styles, auto-closed when the
  element that opened them ends, empty pairs dropped)
- newline bookkeeping (blocks guarantee blank lines without stacking)
- link accumulation (``<url>`` for self-titled links, bare text when the
  href is missing/#, heading markers hoisted around links)
- ``en-media`` → image link on the resource hash + collected hash list
- ``en-todo`` / ``--en-checked`` task-list checkboxes, 4-space nested
  list indentation
- tables buffered row/cell-wise and emitted as a pipe table
  (md_lib/tables.py:17-36 shape); header = ``th`` rows.  (The reference's
  ``match`` arm order makes ``</th>`` drop its cell text — evernote.py:362
  shadows :367 — this port keeps th content and marks the row as header.)
- inline ``en-crypt`` payloads: AES-128 decrypt (jimmy_ray.scalars.crypto)
  then recursive parse of the plaintext XML; undecryptable payloads pass
  through as raw text
- style handling: ``-en-codeblock``, ``-evernote-highlight`` → bold,
  ``--en-id`` → ``tasklist://`` marker, ``font-family: monospace`` →
  code, ``font-style: italic``, ``font-weight`` ≥ 700/bold, ``size`` > 3
  → bold
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from jimmy_ray.md.links import make_link

_IGNORED_DATA = frozenset({
    "Content not supported",
    "This block is a placeholder for Tasks, which has been officially "
    "released on the newest version of Evernote and is no longer supported "
    "on this version. Deleting or moving this block may cause unexpected "
    "behavior in newer versions of Evernote.",
})

_MARKERS = {
    "bold": "**",
    "italic": "*",
    "code": "`",
    "strikethrough": "~~",
    "underline": "++",
    "codeblock": "```",
}

_TAG_FORMAT = {
    "b": "bold", "strong": "bold",
    "em": "italic", "i": "italic", "cite": "italic",
    "code": "code",
    "s": "strikethrough",
    "u": "underline",
}

_HEADING_TAGS = {f"h{i}": i for i in range(1, 8)}


class EnexMarkdownBuilder:
    """XMLParser target: feed start/end/data events, read ``result()``."""

    def __init__(self, password: str | None = None):
        self.password = password
        self.depth = 0
        self.out: list[str] = []
        self.fmt: dict[str, int] = {}  # formatting name -> opening depth
        self.lists: list[str] = []
        self.link: dict | None = None
        self.resource_hash: str | None = None
        self.crypt: dict | None = None
        self.quote_level = 0
        self.hashes: list[str] = []
        self._header_rows: list[list[str]] = []
        self._data_rows: list[list[str]] = []
        self._row: list[str] = []
        self._row_is_header = False
        self._cell: list[str] = []
        self.in_table = False

    # --- buffer helpers ----------------------------------------------------

    def _sink(self) -> list[str]:
        """Active output buffer: the cell buffer while inside a table, so
        formatting markers / links / media emitted within ``td``/``th``
        land in the pipe-table cell instead of leaking outside it."""
        return self._cell if self.in_table else self.out

    def _nl(self, count: int) -> None:
        """Guarantee `count` trailing newline entries (never stacking)."""
        if self.in_table:
            return  # newlines would break the pipe-table cell
        if not self.out:
            return
        have = 0
        while have < count and have < len(self.out) and self.out[-1 - have] == "\n":
            have += 1
        self.out.extend(["\n"] * (count - have))

    def _open_fmt(self, name: str) -> None:
        if name in self.fmt:
            return
        self._sink().append(_MARKERS[name])
        self.fmt[name] = self.depth

    # --- element handlers --------------------------------------------------

    def start(self, tag: str, attrib: dict) -> None:
        self.depth += 1
        if tag == "a":
            self.link = {"href": attrib.get("href")}
            for k in ("title", "name", "alt"):
                if attrib.get(k) is not None:
                    self.link["alt"] = attrib[k]
                    break
        elif tag in _TAG_FORMAT:
            self._open_fmt(_TAG_FORMAT[tag])
        elif tag == "br":
            self._nl(1)
        elif tag == "blockquote":
            self.quote_level += 1
        elif tag == "en-crypt":
            self.crypt = {"cipher": attrib.get("cipher"),
                          "length": attrib.get("length")}
        elif tag == "en-media":
            self.resource_hash = attrib.get("hash", "")
        elif tag in _HEADING_TAGS:
            marker = "#" * _HEADING_TAGS[tag] + " "
            if self.link is not None:
                self.link["prepend"] = marker
                self.link["append"] = "\n\n"
            else:
                self._nl(2)
                self._sink().append(marker)
        elif tag == "hr":
            self._nl(2)
            self._sink().append("---")
            self._nl(2)
        elif tag == "img":
            src = attrib.get("src")
            if src is not None:
                self._sink().append(make_link(
                    attrib.get("title", attrib.get("alt", "")), src,
                    is_image=True,
                ))
        elif tag == "p":
            self._nl(2)
        elif tag == "table":
            self._nl(2)
            self.in_table = True
        elif tag == "en-todo":
            checked = attrib.get("checked") in (True, "true")
            if self.lists and self.lists[-1] == "ul":
                self._sink().append("[x] " if checked else "[ ] ")
            else:
                self._nl(2)
                self._sink().append("- [x] " if checked else "- [ ] ")
        elif tag in ("ol", "ul"):
            self._nl(2)
            self.lists.append(tag)
        elif tag == "li":
            style = attrib.get("style", "")
            if "--en-checked:true" in style:
                bullet = "- [x] "
            elif "--en-checked:false" in style:
                bullet = "- [ ] "
            else:
                bullet = "1. " if self.lists and self.lists[-1] == "ol" else "- "
            self._sink().append(" " * 4 * (max(len(self.lists), 1) - 1) + bullet)
        elif tag == "th":
            self._row_is_header = True
        self._apply_attr_formatting(attrib)

    def _apply_attr_formatting(self, attrib: dict) -> None:
        style = attrib.get("style")
        if style:
            for item in style.split(";"):
                if ":" not in item:
                    continue
                prop, _, value = item.partition(":")
                prop, value = prop.strip(), value.strip()
                if prop in ("-en-codeblock", "--en-codeblock"):
                    if value == "true":
                        self._nl(2)
                        self._sink().append("```")
                        self._nl(1)
                        self.fmt.setdefault("codeblock", self.depth)
                elif prop == "-evernote-highlight":
                    if value == "true":
                        self._open_fmt("bold")
                elif prop == "--en-id":
                    self._sink().append(f"tasklist://{value}")
                elif prop == "font-family":
                    if value == "monospace":
                        self._open_fmt("code")
                elif prop == "font-style":
                    if value == "italic":
                        self._open_fmt("italic")
                elif prop == "font-weight":
                    if value in ("bold", "bolder") or (
                        value.isdigit() and int(value) >= 700
                    ):
                        self._open_fmt("bold")
                    elif value == "italic":
                        self._open_fmt("italic")
        size = attrib.get("size")
        if size is not None:
            try:
                if int(size) > 3:
                    self._open_fmt("bold")
            except ValueError:
                pass

    def end(self, tag: str) -> None:
        trailing = 0
        if tag == "a":
            self._emit_link()
        elif tag in ("br", "div"):
            trailing = 1
        elif tag == "blockquote":
            self.quote_level -= 1
        elif tag == "en-crypt":
            self.crypt = None
        elif tag == "en-media":
            if self.resource_hash is not None:
                alt = (self.link or {}).get("alt", "")
                self._sink().append(
                    make_link(alt, self.resource_hash, is_image=True))
                self.hashes.append(self.resource_hash)
            self.resource_hash = None
            self.link = None
        elif tag in _HEADING_TAGS or tag == "hr":
            trailing = 2
        elif tag == "img":
            trailing = 1
        elif tag == "p":
            self._nl(2)
        elif tag == "table":
            self.out.append(self._table_md())
            trailing = 1
            self.in_table = False
            self._header_rows, self._data_rows = [], []
        elif tag in ("td", "th", "col"):
            # close formatting scoped to this cell BEFORE flushing, so the
            # closing markers land inside the cell text
            self.depth -= 1
            self._close_scoped_formatting()
            self._row.append("".join(self._cell))
            self._cell = []
            return
        elif tag == "tr":
            if self._row_is_header:
                self._header_rows.append(self._row)
            else:
                self._data_rows.append(self._row)
            self._row = []
            self._row_is_header = False
        elif tag == "colgroup":
            self._row = []  # col elements carry layout only, no content
        elif tag == "li":
            trailing = 1  # bare <li>text</li> (real exports carry inner divs)
        elif tag in ("ol", "ul"):
            trailing = 2
            if self.lists:
                self.lists.pop()
        self.depth -= 1
        self._close_scoped_formatting()
        self._nl(trailing)

    def _close_scoped_formatting(self) -> None:
        sink = self._sink()
        for name, opened_at in list(self.fmt.items()):
            if self.depth >= opened_at:
                continue
            if name == "codeblock":
                self._nl(1)
            sink.append(_MARKERS[name])
            if name == "codeblock":
                self._nl(2)
            elif len(sink) >= 2 and sink[-2] == sink[-1]:
                del sink[-2:]  # nothing between open and close markers
            del self.fmt[name]

    def _emit_link(self) -> None:
        if self.link is None:
            return
        link = self.link
        self.link = None
        sink = self._sink()
        if prepend := link.get("prepend"):
            sink.append(prepend)
        title = link.get("title", link.get("alt"))
        url = link.get("href")
        if url is not None and url.strip() == "#":
            url = None
        if title is None and url is None:
            pass
        elif url is None:
            sink.append(title)
        elif title is None or title == url:
            sink.append(f"<{url}>")
        else:
            sink.append(make_link(title, url))
        if (append := link.get("append")) and not self.in_table:
            sink.append(append)

    def _table_md(self) -> str:
        rows_md = []
        for row in self._header_rows:
            rows_md.append("| " + " | ".join(row) + " |")
        if self._header_rows:
            sep = ["---"] * len(self._header_rows[0])
            rows_md.append("| " + " | ".join(sep) + " |")
        for row in self._data_rows:
            rows_md.append("| " + " | ".join(row) + " |")
        return "\n".join(rows_md)

    # --- character data ----------------------------------------------------

    def data(self, data: str) -> None:
        if data in _IGNORED_DATA:
            return
        sink = self._sink()
        if not data.strip() and (not sink or not sink[-1].strip()):
            return
        if (
            self.lists
            and sink
            and any(sink[-1].endswith(b)
                    for b in ("- [x] ", "- [ ] ", "- ", "1. "))
        ):
            data = data.lstrip()
        if self.crypt is not None:
            self._decrypt_inline(data)
            return
        if (
            not self.in_table
            and self.quote_level > 0
            and self.out
            and self.out[-len(self.fmt) - 1] == "\n"
        ):
            self.out.insert(-len(self.fmt) if self.fmt else len(self.out),
                            "> " * self.quote_level)
        if self.link is not None:
            self.link["title"] = self.link.get("title", "") + data
        elif self.resource_hash is not None:
            pass  # resource titles unsupported (evernote.py:488)
        else:
            sink.append(data)

    def _decrypt_inline(self, data: str) -> None:
        from jimmy_ray.scalars import crypto

        sink = self._sink()
        if (
            self.password is None
            or self.crypt.get("cipher") != "AES"
            or self.crypt.get("length") != "128"
        ):
            sink.extend([data, "\n"] if not self.in_table else [data])
            return
        try:
            plaintext = crypto.evernote_decrypt_b64(data, self.password)
        except Exception:  # noqa: BLE001 - wrong password / corrupt payload
            sink.extend([data, "\n"] if not self.in_table else [data])
            return
        inner_md, inner_hashes = enex_body_to_md(plaintext, self.password)
        sink.append(inner_md)
        self.hashes.extend(inner_hashes)

    def close(self) -> tuple[str, list[str]]:
        return self.result()

    def result(self) -> tuple[str, list[str]]:
        return "".join(self.out), self.hashes


def enex_body_to_md(
    xml_text: str, password: str | None = None
) -> tuple[str, list[str]]:
    """ENEX note content XML → (markdown, resource hashes)."""
    builder = EnexMarkdownBuilder(password)
    parser = ET.XMLParser(target=builder)
    parser.feed(xml_text)
    try:
        parser.close()
    except ET.ParseError:
        pass
    return builder.result()[0].strip(), builder.result()[1]
