"""Word-processor formats → Markdown, pure python (public specs).

The reference routes .docx/.odt/.rtf through pandoc
(/root/reference/src/jimmy/md_lib/convert.py:117-163, dispatch
converter.py:239-387) — pandoc is absent here, and these are the three
most common pandoc-backed export formats, so this module implements
honest real-subset readers directly from the published specs:

- DOCX (ECMA-376 OOXML): zip → ``word/document.xml`` + relationship
  targets; headings via ``w:pStyle Heading{n}``, bold/italic run
  properties, ``w:numPr``/``w:ilvl`` list nesting, ``w:hyperlink``
  with rels resolution, ``w:tbl`` pipe tables.
- ODT (OASIS OpenDocument): zip → ``content.xml``; ``text:h``
  outline levels, ``text:p``, nested ``text:list``, ``text:a`` links,
  ``text:span`` bold/italic resolved through ``office:automatic-styles``
  (``fo:font-weight``/``fo:font-style``), ``table:table`` pipe tables,
  ``text:s``/``text:line-break`` whitespace elements.
- RTF (public Microsoft spec): group/control-word tokenizer with
  ``\\'hh`` and ``\\uN`` escapes, destination skipping (fonttbl,
  colortbl, stylesheet, info, ``\\*``), ``\\par`` paragraphs and
  ``\\b``/``\\i`` toggles mapped to Markdown emphasis.

Every format pairs a fixture writer with the reader, rendering the
SAME golden markdown template the SQL mirrors are generated from, so
all three parse paths are oracle-checked end-to-end (enex.py recipe).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_STYLE = "urn:oasis:names:tc:opendocument:xmlns:style:1.0"
_FO = "urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0"
_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_XLINK = "http://www.w3.org/1999/xlink"


def _join_blocks(blocks: list[tuple[str, str]]) -> str:
    """Markdown block join: consecutive list items at single newlines,
    everything else at blank lines."""
    out: list[str] = []
    prev_kind = None
    for kind, text in blocks:
        if not text:
            continue
        if out:
            out.append("\n" if kind == "li" == prev_kind else "\n\n")
        out.append(text)
        prev_kind = kind
    return "".join(out)


def _emphasis(text: str, bold: bool, italic: bool) -> str:
    if not text:
        return text
    if bold and italic:
        return f"***{text}***"
    if bold:
        return f"**{text}**"
    if italic:
        return f"*{text}*"
    return text


def _pipe_table(rows: list[list[str]]) -> str:
    if not rows:
        return ""
    lines = ["| " + " | ".join(rows[0]) + " |",
             "| " + " | ".join("---" for _ in rows[0]) + " |"]
    lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(lines)


# --- DOCX (ECMA-376) --------------------------------------------------------

def _on(rpr: ET.Element | None, tag: str) -> bool:
    """ECMA-376 ST_OnOff toggle: element present = on, unless
    w:val says 0/false/off (the way Word cancels inherited styles)."""
    if rpr is None:
        return False
    el = rpr.find(f"{{{_W}}}{tag}")
    if el is None:
        return False
    return el.get(f"{{{_W}}}val", "1").lower() not in ("0", "false", "off",
                                                       "none")


def _docx_run_md(run: ET.Element) -> str:
    rpr = run.find(f"{{{_W}}}rPr")
    bold = _on(rpr, "b")
    italic = _on(rpr, "i")
    text = "".join(t.text or "" for t in run.findall(f"{{{_W}}}t"))
    text += "\n" * len(run.findall(f"{{{_W}}}br"))
    return _emphasis(text, bold, italic)


def _docx_para(p: ET.Element, rels: dict[str, str]) -> tuple[str, str]:
    """(block kind, markdown) for one w:p."""
    ppr = p.find(f"{{{_W}}}pPr")
    style = ""
    level = None
    if ppr is not None:
        st = ppr.find(f"{{{_W}}}pStyle")
        if st is not None:
            style = st.get(f"{{{_W}}}val", "")
        numpr = ppr.find(f"{{{_W}}}numPr")
        if numpr is not None:
            ilvl = numpr.find(f"{{{_W}}}ilvl")
            level = int(ilvl.get(f"{{{_W}}}val", "0")) if ilvl is not None else 0
    parts: list[str] = []
    for child in p:
        if child.tag == f"{{{_W}}}r":
            parts.append(_docx_run_md(child))
        elif child.tag == f"{{{_W}}}hyperlink":
            label = "".join(_docx_run_md(r)
                            for r in child.findall(f"{{{_W}}}r"))
            target = rels.get(child.get(f"{{{_R}}}id", ""), "")
            parts.append(f"[{label}]({target})")
    text = "".join(parts)
    m = re.fullmatch(r"Heading(\d)", style)
    if m:
        return "h", "#" * int(m.group(1)) + " " + text
    if level is not None:
        return "li", "  " * level + "- " + text
    return "p", text


def _docx_table(tbl: ET.Element, rels: dict[str, str]) -> str:
    rows = []
    for tr in tbl.findall(f"{{{_W}}}tr"):
        cells = []
        for tc in tr.findall(f"{{{_W}}}tc"):
            cells.append(" ".join(
                _docx_para(p, rels)[1]
                for p in tc.findall(f"{{{_W}}}p")).strip())
        rows.append(cells)
    return _pipe_table(rows)


def docx_to_markdown(payload: bytes) -> str:
    """ECMA-376 main document part → Markdown (the pandoc seam,
    convert.py:117-163, served natively)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        doc = ET.fromstring(zf.read("word/document.xml"))
        rels: dict[str, str] = {}
        try:
            rel_root = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
            for rel in rel_root.findall(f"{{{_PKG_REL}}}Relationship"):
                rels[rel.get("Id", "")] = rel.get("Target", "")
        except KeyError:
            pass
    body = doc.find(f"{{{_W}}}body")
    blocks: list[tuple[str, str]] = []
    for child in body if body is not None else []:
        if child.tag == f"{{{_W}}}p":
            blocks.append(_docx_para(child, rels))
        elif child.tag == f"{{{_W}}}tbl":
            blocks.append(("table", _docx_table(child, rels)))
    return _join_blocks(blocks)


# --- fixture writer + golden (shared across the three formats) --------------

GOLDEN_TEMPLATE = (
    "# Doc {id}\n\n"
    "intro {text} with **bold** and *italic* and ***both***\n\n"
    "- item A\n"
    "- item {id}\n"
    "  - nested\n\n"
    "[site {id}](https://example.com/d/{id})\n\n"
    "| k | v |\n"
    "| --- | --- |\n"
    "| id | {id} |"
)


def golden_markdown(doc_id: int, text: str) -> str:
    return GOLDEN_TEMPLATE.replace("{id}", str(doc_id)).replace(
        "{text}", text)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def synth_docx(doc_id: int, text: str) -> bytes:
    """A real .docx zip whose document renders GOLDEN_TEMPLATE."""
    i, t = doc_id, _xml_escape(text)

    def r(txt, pr=""):
        pr = f"<w:rPr>{pr}</w:rPr>" if pr else ""
        return (f'<w:r>{pr}<w:t xml:space="preserve">{txt}</w:t></w:r>')

    def li(level, txt):
        return (f'<w:p><w:pPr><w:numPr><w:ilvl w:val="{level}"/>'
                f'<w:numId w:val="1"/></w:numPr></w:pPr>{r(txt)}</w:p>')

    def tc(txt):
        return f"<w:tc><w:p>{r(txt)}</w:p></w:tc>"

    document = (
        f'<w:document xmlns:w="{_W}" xmlns:r="{_R}"><w:body>'
        f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        f"{r(f'Doc {i}')}</w:p>"
        f"<w:p>{r(f'intro {t} with ')}{r('bold', '<w:b/>')}"
        f"{r(' and ')}{r('italic', '<w:i/>')}{r(' and ')}"
        f"{r('both', '<w:b/><w:i/>')}</w:p>"
        f"{li(0, 'item A')}{li(0, f'item {i}')}{li(1, 'nested')}"
        f'<w:p><w:hyperlink r:id="rId1">{r(f"site {i}")}</w:hyperlink></w:p>'
        f"<w:tbl><w:tr>{tc('k')}{tc('v')}</w:tr>"
        f"<w:tr>{tc('id')}{tc(str(i))}</w:tr></w:tbl>"
        "</w:body></w:document>"
    )
    rels = (
        f'<Relationships xmlns="{_PKG_REL}">'
        f'<Relationship Id="rId1" Type="{_R}/hyperlink" '
        f'Target="https://example.com/d/{i}" TargetMode="External"/>'
        "</Relationships>"
    )
    content_types = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/></Types>'
    )
    pkg_rels = (
        f'<Relationships xmlns="{_PKG_REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>'
    )
    from jimmy_ray.sources.fixturetpl import zip_bytes

    return zip_bytes([
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", pkg_rels),
        ("word/document.xml",
         '<?xml version="1.0" encoding="UTF-8"?>' + document),
        ("word/_rels/document.xml.rels", rels),
    ])


# --- ODT (OASIS OpenDocument) ----------------------------------------------

def _odt_styles(root: ET.Element) -> dict[str, tuple[bool, bool]]:
    """style name → (bold, italic) from office:automatic-styles."""
    out: dict[str, tuple[bool, bool]] = {}
    auto = root.find(f"{{{_OFFICE}}}automatic-styles")
    for st in auto.findall(f"{{{_STYLE}}}style") if auto is not None else []:
        props = st.find(f"{{{_STYLE}}}text-properties")
        if props is None:
            continue
        bold = props.get(f"{{{_FO}}}font-weight") == "bold"
        italic = props.get(f"{{{_FO}}}font-style") == "italic"
        out[st.get(f"{{{_STYLE}}}name", "")] = (bold, italic)
    return out


def _odt_inline(el: ET.Element,
                styles: dict[str, tuple[bool, bool]]) -> str:
    parts = [el.text or ""]
    for child in el:
        tag = child.tag
        if tag == f"{{{_TEXT}}}span":
            bold, italic = styles.get(
                child.get(f"{{{_TEXT}}}style-name", ""), (False, False))
            parts.append(_emphasis(_odt_inline(child, styles), bold, italic))
        elif tag == f"{{{_TEXT}}}a":
            href = child.get(f"{{{_XLINK}}}href", "")
            parts.append(f"[{_odt_inline(child, styles)}]({href})")
        elif tag == f"{{{_TEXT}}}s":
            parts.append(" " * int(child.get(f"{{{_TEXT}}}c", "1")))
        elif tag == f"{{{_TEXT}}}line-break":
            parts.append("\n")
        else:
            parts.append(_odt_inline(child, styles))
        parts.append(child.tail or "")
    return "".join(parts)


def _odt_list(el: ET.Element, styles: dict, level: int,
              blocks: list[tuple[str, str]]) -> None:
    for item in el.findall(f"{{{_TEXT}}}list-item"):
        for child in item:
            if child.tag == f"{{{_TEXT}}}p":
                blocks.append(("li", "  " * level + "- "
                               + _odt_inline(child, styles)))
            elif child.tag == f"{{{_TEXT}}}list":
                _odt_list(child, styles, level + 1, blocks)


def odt_to_markdown(payload: bytes) -> str:
    """OpenDocument content.xml → Markdown."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    styles = _odt_styles(root)
    body = root.find(f"{{{_OFFICE}}}body/{{{_OFFICE}}}text")
    blocks: list[tuple[str, str]] = []
    for child in body if body is not None else []:
        tag = child.tag
        if tag == f"{{{_TEXT}}}h":
            lvl = int(child.get(f"{{{_TEXT}}}outline-level", "1"))
            blocks.append(("h", "#" * lvl + " " + _odt_inline(child, styles)))
        elif tag == f"{{{_TEXT}}}p":
            blocks.append(("p", _odt_inline(child, styles)))
        elif tag == f"{{{_TEXT}}}list":
            _odt_list(child, styles, 0, blocks)
        elif tag == f"{{{_TABLE}}}table":
            rows = []
            for tr in child.findall(f"{{{_TABLE}}}table-row"):
                rows.append([
                    " ".join(_odt_inline(p, styles) for p in
                             tc.findall(f"{{{_TEXT}}}p")).strip()
                    for tc in tr.findall(f"{{{_TABLE}}}table-cell")])
            blocks.append(("table", _pipe_table(rows)))
    return _join_blocks(blocks)


def synth_odt(doc_id: int, text: str) -> bytes:
    """A real .odt zip whose content renders GOLDEN_TEMPLATE."""
    i, t = doc_id, _xml_escape(text)
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_OFFICE}" '
        f'xmlns:text="{_TEXT}" xmlns:style="{_STYLE}" xmlns:fo="{_FO}" '
        f'xmlns:table="{_TABLE}" xmlns:xlink="{_XLINK}">'
        "<office:automatic-styles>"
        '<style:style style:name="T1" style:family="text">'
        '<style:text-properties fo:font-weight="bold"/></style:style>'
        '<style:style style:name="T2" style:family="text">'
        '<style:text-properties fo:font-style="italic"/></style:style>'
        '<style:style style:name="T3" style:family="text">'
        '<style:text-properties fo:font-weight="bold" '
        'fo:font-style="italic"/></style:style>'
        "</office:automatic-styles>"
        "<office:body><office:text>"
        f'<text:h text:outline-level="1">Doc {i}</text:h>'
        f"<text:p>intro {t} with "
        '<text:span text:style-name="T1">bold</text:span> and '
        '<text:span text:style-name="T2">italic</text:span> and '
        '<text:span text:style-name="T3">both</text:span></text:p>'
        "<text:list><text:list-item><text:p>item A</text:p></text:list-item>"
        f"<text:list-item><text:p>item {i}</text:p>"
        "<text:list><text:list-item><text:p>nested</text:p>"
        "</text:list-item></text:list></text:list-item></text:list>"
        f'<text:p><text:a xlink:href="https://example.com/d/{i}">'
        f"site {i}</text:a></text:p>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>k</text:p></table:table-cell>"
        "<table:table-cell><text:p>v</text:p></table:table-cell>"
        "</table:table-row><table:table-row>"
        "<table:table-cell><text:p>id</text:p></table:table-cell>"
        f"<table:table-cell><text:p>{i}</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:text></office:body></office:document-content>"
    )
    from jimmy_ray.sources.fixturetpl import zip_bytes

    return zip_bytes([
        ("mimetype", "application/vnd.oasis.opendocument.text"),
        ("content.xml", content),
    ])


# --- RTF (public Microsoft spec) -------------------------------------------

_RTF_DESTINATIONS = {"fonttbl", "colortbl", "stylesheet", "info",
                     "generator", "pict", "themedata"}
_RTF_TOKEN_RE = re.compile(
    rb"\\([a-z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([\\{}~*-])|([{}])",
    re.S)


def rtf_to_markdown(payload: bytes) -> str:
    """RTF group/control tokenizer → paragraphs with **bold**/*italic*
    emphasis.  Destination groups (fonttbl, info, \\*-prefixed …) are
    skipped; \\'hh and \\uN escapes decode."""
    paras: list[str] = []
    cur: list[str] = []
    run: list[str] = []
    # group state stack: (bold, italic, skipping)
    state = [False, False, False]
    stack: list[list] = []
    uc_skip = 1

    def flush_run():
        if run:
            text = "".join(run)
            if text:
                cur.append(_emphasis(text, state[0], state[1]))
            run.clear()

    def flush_para():
        flush_run()
        text = "".join(cur).strip()
        if text:
            paras.append(text)
        cur.clear()

    pos = 0
    data = payload
    pending_skip_chars = 0
    while pos < len(data):
        m = _RTF_TOKEN_RE.match(data, pos)
        if m is None:
            ch = data[pos:pos + 1]
            pos += 1
            if ch in (b"\r", b"\n"):
                continue
            if pending_skip_chars:
                pending_skip_chars -= 1
                continue
            if not state[2]:
                run.append(ch.decode("latin-1"))
            continue
        pos = m.end()
        word, num, hexbyte, esc, brace = m.groups()
        if brace == b"{":
            flush_run()
            stack.append(list(state))
            continue
        if brace == b"}":
            flush_run()
            if stack:
                state[:] = stack.pop()
            continue
        if esc is not None:
            if esc == b"*":  # \* marks the group an ignorable destination
                state[2] = True
            elif not state[2]:
                run.append({b"\\": "\\", b"{": "{", b"}": "}",
                            b"~": "\u00a0", b"-": ""}[esc])
            continue
        if hexbyte is not None:
            if pending_skip_chars:
                pending_skip_chars -= 1
            elif not state[2]:
                run.append(bytes.fromhex(hexbyte.decode()).decode("latin-1"))
            continue
        w = word.decode()
        n = int(num) if num is not None else None
        if w in _RTF_DESTINATIONS:
            state[2] = True
        elif w == "par":
            if not state[2]:
                flush_para()
        elif w == "b":
            flush_run()
            state[0] = n != 0
        elif w == "i":
            flush_run()
            state[1] = n != 0
        elif w == "uc":
            uc_skip = n or 0
        elif w == "u":
            if not state[2]:
                run.append(chr(n & 0xFFFF if n >= 0 else n + 0x10000))
            pending_skip_chars = uc_skip
        # all other control words ignored (formatting we don't map)
    flush_para()
    return "\n\n".join(paras)


def synth_rtf(doc_id: int, text: str) -> bytes:
    r"""A real RTF file.  RTF has no native heading/list/table markup in
    the subset sense, so the golden here is the flat-paragraph mirror
    (headings and list markers arrive as literal text, as pandoc's RTF
    reader also degrades to)."""
    i = doc_id
    t = (text.replace("\\", "\\\\").replace("{", "\\{")
         .replace("}", "\\}"))
    return (
        r"{\rtf1\ansi\deff0"
        r"{\fonttbl{\f0 Times New Roman;}}"
        r"{\info{\title fixture}}"
        f"\\f0\\fs24 Doc {i}\\par "
        f"intro {t} with {{\\b bold}} and {{\\i italic}} and "
        "{\\b\\i both}\\par "
        f"item A\\par item {i}\\par "
        f"site {i}: https://example.com/d/{i}\\par"
        "}"
    ).encode("latin-1", errors="replace")


RTF_GOLDEN_TEMPLATE = (
    "Doc {id}\n\n"
    "intro {text} with **bold** and *italic* and ***both***\n\n"
    "item A\n\n"
    "item {id}\n\n"
    "site {id}: https://example.com/d/{id}"
)


# --- pipeline surface -------------------------------------------------------

from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

docx_extract = extract_query(synth_docx, docx_to_markdown)
odt_extract = extract_query(synth_odt, odt_to_markdown)
rtf_extract = extract_query(synth_rtf, rtf_to_markdown)


def sql_docx_extract() -> str:
    return sql_golden_query(GOLDEN_TEMPLATE)


def sql_odt_extract() -> str:
    return sql_golden_query(GOLDEN_TEMPLATE)


def sql_rtf_extract() -> str:
    return sql_golden_query(RTF_GOLDEN_TEMPLATE)
