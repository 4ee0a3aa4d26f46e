"""EPUB and OPML readers, pure python (public specs).

Two more formats the reference hands to pandoc's universal fallback
(/root/reference/src/jimmy/converter.py:341-352 last-resort dispatch;
converter.py:319-330 routes ``opml`` XML explicitly):

- EPUB (IDPF OCF + OPF): zip → ``META-INF/container.xml`` rootfile →
  package manifest + spine → XHTML chapters in spine order, each
  converted through the repo's single-source-of-truth HTML→Markdown
  path (jimmy_ray.html.extract) and joined at blank lines.
- OPML: the outline XML becomes a nested Markdown list (text
  attribute per node, 2-space indent per level) with the head title
  as heading.

Fixture writers render golden templates the SQL mirrors derive from
(enex.py recipe), so both container walks are oracle-checked.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_CNT = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF = "http://www.idpf.org/2007/opf"


def epub_to_markdown(payload: bytes) -> str:
    """OCF container walk → spine-ordered chapter markdown."""
    from jimmy_ray.html.extract import html_to_markdown

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
        rootfile = container.find(
            f"{{{_CNT}}}rootfiles/{{{_CNT}}}rootfile")
        opf_path = rootfile.get("full-path", "")
        opf = ET.fromstring(zf.read(opf_path))
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        hrefs = {item.get("id", ""): item.get("href", "")
                 for item in opf.findall(
                     f"{{{_OPF}}}manifest/{{{_OPF}}}item")}
        chapters = []
        for itemref in opf.findall(f"{{{_OPF}}}spine/{{{_OPF}}}itemref"):
            href = hrefs.get(itemref.get("idref", ""))
            if not href:
                continue
            chapters.append(html_to_markdown(zf.read(base + href)))
    return "\n\n".join(c for c in chapters if c)


def _opml_outline(node: ET.Element, level: int, out: list[str]) -> None:
    text = node.get("text", "")
    if text:
        out.append("  " * level + "- " + text)
    for child in node.findall("outline"):
        _opml_outline(child, level + 1, out)


def opml_to_markdown(payload: bytes) -> str:
    root = ET.fromstring(payload)
    title = root.findtext("head/title", "")
    out: list[str] = [f"# {title}", ""] if title else []
    body = root.find("body")
    for node in body.findall("outline") if body is not None else []:
        _opml_outline(node, 0, out)
    return "\n".join(out).strip()


# --- fixtures + goldens -----------------------------------------------------

EPUB_GOLDEN_TEMPLATE = (
    "# Chapter One\n\n"
    "intro {text}\n\n"
    "# Chapter Two\n\n"
    "closing words {id}"
)


def synth_epub(doc_id: int, text: str) -> bytes:
    i = doc_id
    t = text.replace("&", "&amp;").replace("<", "&lt;")
    ch = (
        '<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
        "<head><title>c</title></head><body>{body}</body></html>"
    )
    container = (
        f'<container xmlns="{_CNT}" version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    opf = (
        f'<package xmlns="{_OPF}" version="3.0"><manifest>'
        '<item id="c1" href="ch1.xhtml" '
        'media-type="application/xhtml+xml"/>'
        '<item id="c2" href="ch2.xhtml" '
        'media-type="application/xhtml+xml"/>'
        '</manifest><spine><itemref idref="c1"/><itemref idref="c2"/>'
        "</spine></package>"
    )
    from jimmy_ray.sources.fixturetpl import zip_bytes

    return zip_bytes([
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml", container),
        ("OEBPS/content.opf", opf),
        ("OEBPS/ch1.xhtml",
         ch.format(body=f"<h1>Chapter One</h1><p>intro {t}</p>")),
        ("OEBPS/ch2.xhtml",
         ch.format(body=f"<h1>Chapter Two</h1><p>closing words {i}</p>")),
    ])


OPML_GOLDEN_TEMPLATE = (
    "# Doc {id}\n\n"
    "- item A\n"
    "  - nested {id}\n"
    "- item B {text}"
)


def synth_opml(doc_id: int, text: str) -> bytes:
    i = doc_id
    t = text.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    return (
        '<opml version="2.0">'
        f"<head><title>Doc {i}</title></head><body>"
        f'<outline text="item A"><outline text="nested {i}"/></outline>'
        f'<outline text="item B {t}"/>'
        "</body></opml>"
    ).encode("utf-8")


# --- pipeline surface -------------------------------------------------------

from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

epub_extract = extract_query(synth_epub, epub_to_markdown)
opml_extract = extract_query(synth_opml, opml_to_markdown, batch_size=512)


def sql_epub_extract() -> str:
    return sql_golden_query(EPUB_GOLDEN_TEMPLATE)


def sql_opml_extract() -> str:
    return sql_golden_query(OPML_GOLDEN_TEMPLATE)
