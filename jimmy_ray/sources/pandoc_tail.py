"""Pandoc long-tail, final tier: Djot, Typst, EndNote XML → Markdown.

These are the last formats the reference reaches only through the pandoc
binary (/root/reference/src/jimmy/md_lib/convert.py:117-163 accepts any
pandoc reader name); pandoc is absent from this environment, so — like
sources/lightmarkup.py, texmarkup.py and markup_tail.py before — the
published grammars get honest native subset converters:

- Djot (djot.net syntax reference): ``_emphasis_`` → ``*em*`` and
  ``*strong*`` → ``**strong**`` (djot swaps Markdown's conventions),
  verbatim backtick spans kept opaque, ``{.attr #id}`` attribute blocks
  stripped, ``[span]{.cls}`` spans unwrapped, 4+ ``*``/``-`` thematic
  breaks → ``---``, ATX headings / fences / links pass through.
- Typst (typst.app markup reference): ``=``-run headings, ``*strong*``
  / ``_emph_`` (same swap as djot), ``#link("url")[label]`` and bare
  ``#link("url")``, ``#image("path")``, ``+``-item auto-numbered lists,
  full-line ``//`` comments dropped, backtick raw spans/blocks opaque.
- EndNote XML (the ``.xml`` library export): ``<records><record>`` with
  ``<titles><title>``, ``<contributors><authors><author>``,
  ``<dates><year>``, ``<periodical><full-title>``, ``<abstract>``,
  ``<urls><related-urls><url>`` — EndNote wraps every text node in
  ``<style>`` elements, so text is gathered with itertext().

Fixture writers render the golden templates the SQL mirrors derive from
(the fixturetpl recipe); writer-unreachable branches (attribute blocks,
label-less links, style-wrapped nodes, missing fields) are unit cases in
tests/test_pandoc_tail.py.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# --- Djot ---------------------------------------------------------------------

_DJ_VERBATIM_RE = re.compile(r"`+[^`]*`+")
_DJ_STRONG_RE = re.compile(r"\*([^*\n]+)\*")
_DJ_EMPH_RE = re.compile(r"_([^_\n]+)_")
_DJ_SPAN_RE = re.compile(r"\[([^\]]*)\]\{[.#%][^}]*\}")
_DJ_ATTR_RE = re.compile(r"\{[.#%][^}]*\}")
_DJ_BREAK_RE = re.compile(r"^(\*{4,}|-{4,})\s*$")


def _djot_inline(line: str) -> str:
    masks: list[str] = []

    def mask(m):
        masks.append(m.group(0))
        return f"\x00{len(masks) - 1}\x00"

    line = _DJ_VERBATIM_RE.sub(mask, line)
    line = _DJ_SPAN_RE.sub(r"\1", line)    # [span]{.cls} unwraps
    line = _DJ_STRONG_RE.sub(r"**\1**", line)
    line = _DJ_EMPH_RE.sub(r"*\1*", line)
    line = _DJ_ATTR_RE.sub("", line)       # bare attribute blocks drop
    for i, span in enumerate(masks):
        line = line.replace(f"\x00{i}\x00", span)
    return line


def djot_to_md(text: str) -> str:
    out: list[str] = []
    in_fence = False
    for line in text.split("\n"):
        if line.startswith("```"):
            in_fence = not in_fence
            out.append(line)
            continue
        if in_fence:
            out.append(line)
            continue
        if _DJ_BREAK_RE.match(line):
            out.append("---")
            continue
        out.append(_djot_inline(line))
    return "\n".join(out)


# --- Typst --------------------------------------------------------------------

_TY_HEAD_RE = re.compile(r"^(=+)\s+(.*)$")
_TY_LINK_RE = re.compile(r'#link\("([^"]+)"\)(?:\[([^\]]*)\])?')
_TY_IMAGE_RE = re.compile(r'#image\("([^"]+)"\)')
_TY_STRONG_RE = re.compile(r"\*([^*\n]+)\*")
_TY_EMPH_RE = re.compile(r"_([^_\n]+)_")
_TY_RAW_RE = re.compile(r"`+[^`]*`+")
_TY_COMMENT_RE = re.compile(r"^\s*//(?!:).*$")


def _typst_inline(line: str) -> str:
    masks: list[str] = []

    def mask(m):
        masks.append(m.group(0))
        return f"\x00{len(masks) - 1}\x00"

    line = _TY_RAW_RE.sub(mask, line)
    line = _TY_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _TY_IMAGE_RE.sub(r"![](\1)", line)
    line = _TY_STRONG_RE.sub(r"**\1**", line)
    line = _TY_EMPH_RE.sub(r"*\1*", line)
    for i, span in enumerate(masks):
        line = line.replace(f"\x00{i}\x00", span)
    return line


def typst_to_md(text: str) -> str:
    out: list[str] = []
    in_fence = False
    for line in text.split("\n"):
        if line.startswith("```"):
            in_fence = not in_fence
            out.append(line)
            continue
        if in_fence:
            out.append(line)
            continue
        if _TY_COMMENT_RE.match(line):
            continue
        if m := _TY_HEAD_RE.match(line):
            out.append("#" * len(m.group(1)) + " " + _typst_inline(m.group(2)))
            continue
        if line.startswith("+ "):
            out.append("1. " + _typst_inline(line[2:]))
            continue
        out.append(_typst_inline(line))
    return "\n".join(out)


# --- EndNote XML ----------------------------------------------------------------

def _en_text(el: ET.Element | None) -> str:
    """EndNote wraps text nodes in <style> children; gather them all."""
    if el is None:
        return ""
    return "".join(el.itertext()).strip()


def endnote_record_to_md(rec: ET.Element) -> str:
    title = _en_text(rec.find("./titles/title"))
    authors = [_en_text(a)
               for a in rec.findall("./contributors/authors/author")]
    year = _en_text(rec.find("./dates/year"))
    journal = _en_text(rec.find("./periodical/full-title"))
    abstract = _en_text(rec.find("./abstract"))
    url = _en_text(rec.find("./urls/related-urls/url"))
    out: list[str] = []
    if title:
        out.append(f"# {title}")
    if authors:
        out.append("*" + "; ".join(a for a in authors if a) + "*")
    cite = ". ".join(p for p in (journal, year) if p)
    if cite:
        out.append(cite + ".")
    if abstract:
        out.append(abstract)
    if url:
        out.append(f"<{url}>")
    return "\n\n".join(out)


def endnote_to_md(payload: bytes) -> str:
    """One EndNote library export → one Markdown document per record,
    separated by a thematic break (multi-record libraries are the real
    shape; the fixture emits one record per doc)."""
    root = ET.fromstring(payload)
    parts = [endnote_record_to_md(rec)
             for rec in root.findall("./records/record")]
    return "\n\n---\n\n".join(parts)


# --- fixtures + golden templates ------------------------------------------------

DJOT_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "\n"
    "intro {text} with **strong** and *emph* and marked\n"
    "\n"
    "- item A\n"
    "- see [site {id}](https://example.com/d/{id})\n"
    "\n"
    "---\n"
    "```\n"
    "raw _stays_ {id}\n"
    "```\n"
    "tail `verbatim *kept* {id}`"
)


def synth_djot(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"# Doc {i}\n"
        "\n"
        f"intro {text} with *strong* and _emph_ and [marked]{{.mark}}\n"
        "\n"
        "- item A\n"
        f"- see [site {i}](https://example.com/d/{i})\n"
        "\n"
        "****\n"
        "```\n"
        f"raw _stays_ {i}\n"
        "```\n"
        f"tail `verbatim *kept* {i}`"
    )


TYPST_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "## Part {id}\n"
    "intro {text} with **strong** and *emph*\n"
    "- item A\n"
    "1. first {id}\n"
    "see [site {id}](https://example.com/d/{id}) and "
    "![](fig{id}.png)\n"
    "```python\n"
    "raw _stays_ {id}\n"
    "```"
)


def synth_typst(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"= Doc {i}\n"
        f"== Part {i}\n"
        "// reviewer note: dropped on conversion\n"
        f"intro {text} with *strong* and _emph_\n"
        "- item A\n"
        f"+ first {i}\n"
        f'see #link("https://example.com/d/{i}")[site {i}] and '
        f'#image("fig{i}.png")\n'
        "```python\n"
        f"raw _stays_ {i}\n"
        "```"
    )


ENDNOTE_GOLDEN_TEMPLATE = (
    "# Study {id}\n"
    "\n"
    "*Doe, J.; Roe, R. {id}*\n"
    "\n"
    "Journal of Examples. 20{id2}.\n"
    "\n"
    "{text}\n"
    "\n"
    "<https://doi.example/10.{id}>"
)


def synth_endnote(doc_id: int, text: str) -> bytes:
    i = doc_id
    t = text.replace("&", "&amp;").replace("<", "&lt;")
    return (
        "<xml><records><record>"
        "<titles><title><style face=\"normal\">"
        f"Study {i}</style></title></titles>"
        "<contributors><authors>"
        "<author><style>Doe, J.</style></author>"
        f"<author><style>Roe, R. {i}</style></author>"
        "</authors></contributors>"
        "<periodical><full-title>Journal of Examples</full-title>"
        "</periodical>"
        f"<dates><year><style>20{i % 100:02d}</style></year></dates>"
        f"<abstract><style>{t}</style></abstract>"
        "<urls><related-urls><url>"
        f"https://doi.example/10.{i}</url></related-urls></urls>"
        "</record></records></xml>"
    ).encode("utf-8")


# --- pipeline surface ------------------------------------------------------------

from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

djot_extract = extract_query(synth_djot, djot_to_md, batch_size=512)
typst_extract = extract_query(synth_typst, typst_to_md, batch_size=512)
endnote_extract = extract_query(synth_endnote, endnote_to_md,
                                batch_size=512)


def sql_djot_extract() -> str:
    return sql_golden_query(DJOT_GOLDEN_TEMPLATE)


def sql_typst_extract() -> str:
    return sql_golden_query(TYPST_GOLDEN_TEMPLATE)


def sql_endnote_extract() -> str:
    # {id2} = zero-padded doc_id % 100 (the year field)
    tpl = ENDNOTE_GOLDEN_TEMPLATE.replace(
        "{id2}", "\x01ID2\x01")
    sql = sql_golden_query(tpl)
    return sql.replace(
        "\x01ID2\x01",
        "' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '")
