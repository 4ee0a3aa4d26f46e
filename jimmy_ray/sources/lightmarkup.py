"""Light-markup formats → Markdown: AsciiDoc, MediaWiki dumps, Fountain.

The reference hands these to pandoc in its default converter
(/root/reference/src/jimmy/converter.py:252-263 asciidoc,
converter.py:319-330 mediawiki XML dumps, converter.py:270-274
fountain's code-fence wrap).  Pandoc is absent, so the two markups get
honest native subset converters (both grammars are published):

- AsciiDoc: ``=``-run section titles, ``*``-run unordered /
  ``.``-run ordered list nesting, constrained ``*bold*`` /
  ``_italic_`` pairs, ``url[label]`` and ``link:url[label]`` macros,
  ``----`` literal blocks → fenced code.
- MediaWiki: ``==``-wrapped headings, ``'''''`` / ``'''`` / ``''``
  emphasis, ``*``/``#`` list nesting, ``[[page|label]]`` internal and
  ``[url label]`` external links; the dump reader walks the export
  XML's page/revision tree (one row per page).
- Fountain: wrapped verbatim in a ```` ```fountain ```` block,
  byte-for-byte the reference's behavior.

Fixture writers render the golden templates the SQL mirrors derive
from (enex.py recipe), so both conversion paths are oracle-checked.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pyarrow as pa

# --- AsciiDoc ---------------------------------------------------------------

_ADOC_HEAD_RE = re.compile(r"^(=+)\s+(.*)$")
_ADOC_ULIST_RE = re.compile(r"^(\*+)\s+(.*)$")
_ADOC_OLIST_RE = re.compile(r"^(\.+)\s+(.*)$")
_ADOC_BOLD_RE = re.compile(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])")
_ADOC_ITALIC_RE = re.compile(r"(?<![\w_])_([^_\n]+)_(?![\w_])")
_ADOC_LINK_RE = re.compile(r"(?:link:)?(https?://[^\s\[\]]+)\[([^\]]*)\]")


def _adoc_inline(line: str) -> str:
    line = _ADOC_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _ADOC_BOLD_RE.sub(r"**\1**", line)
    line = _ADOC_ITALIC_RE.sub(r"*\1*", line)
    return line


def asciidoc_to_md(text: str) -> str:
    """AsciiDoc subset → Markdown.  ``=``-runs map 1:1 to ``#``-runs
    (the doc title stays in the body, matching the reference's
    --shift-heading-level-by intent of keeping everything)."""
    out: list[str] = []
    in_literal = False
    for line in text.splitlines():
        if line.rstrip() == "----":
            out.append("```")
            in_literal = not in_literal
            continue
        if in_literal:
            out.append(line)
            continue
        m = _ADOC_HEAD_RE.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " " + _adoc_inline(m.group(2)))
            continue
        m = _ADOC_ULIST_RE.match(line)
        if m:
            out.append("  " * (len(m.group(1)) - 1) + "- "
                       + _adoc_inline(m.group(2)))
            continue
        m = _ADOC_OLIST_RE.match(line)
        if m:
            out.append("  " * (len(m.group(1)) - 1) + "1. "
                       + _adoc_inline(m.group(2)))
            continue
        out.append(_adoc_inline(line))
    return "\n".join(out)


# --- MediaWiki --------------------------------------------------------------

_MW_HEAD_RE = re.compile(r"^(=+)\s*(.*?)\s*\1$")
_MW_LIST_RE = re.compile(r"^([*#]+)\s*(.*)$")
_MW_BI_RE = re.compile(r"'''''(.+?)'''''")
_MW_BOLD_RE = re.compile(r"'''(.+?)'''")
_MW_ITALIC_RE = re.compile(r"''(.+?)''")
_MW_ILINK_RE = re.compile(r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]")
_MW_XLINK_RE = re.compile(r"\[(https?://[^\s\]]+)\s+([^\]]+)\]")


def _mw_inline(line: str) -> str:
    line = _MW_BI_RE.sub(r"***\1***", line)
    line = _MW_BOLD_RE.sub(r"**\1**", line)
    line = _MW_ITALIC_RE.sub(r"*\1*", line)
    line = _MW_ILINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _MW_XLINK_RE.sub(r"[\2](\1)", line)
    return line


def mediawiki_to_md(text: str) -> str:
    out: list[str] = []
    for line in text.splitlines():
        m = _MW_HEAD_RE.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " " + _mw_inline(m.group(2)))
            continue
        m = _MW_LIST_RE.match(line)
        if m:
            marks = m.group(1)
            bullet = "1. " if marks[-1] == "#" else "- "
            out.append("  " * (len(marks) - 1) + bullet
                       + _mw_inline(m.group(2)))
            continue
        out.append(_mw_inline(line))
    return "\n".join(out)


def parse_mediawiki_dump(payload: bytes) -> list[tuple[str, str]]:
    """(title, markdown) per page of a MediaWiki export dump (the XML
    shape converter.py:319-330 sniffs by root tag)."""
    root = ET.fromstring(payload)
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[:root.tag.index("}") + 1]
    rows = []
    for page in root.findall(f"{ns}page"):
        title = page.findtext(f"{ns}title", "")
        wikitext = page.findtext(f"{ns}revision/{ns}text", "")
        rows.append((title, mediawiki_to_md(wikitext)))
    return rows


# --- Fountain ---------------------------------------------------------------

def fountain_to_md(text: str) -> str:
    """converter.py:270-274: wrap verbatim in a fountain code fence."""
    return f"```fountain\n{text}\n```\n"


# --- fixtures + golden templates -------------------------------------------

ADOC_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "\n"
    "intro {text} with **bold** and *italic*\n"
    "\n"
    "- item A\n"
    "  - nested\n"
    "1. first\n"
    "  1. sub {id}\n"
    "\n"
    "see [site {id}](https://example.com/d/{id})\n"
    "\n"
    "```\n"
    "code *stays* {id}\n"
    "```"
)


def synth_asciidoc(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"= Doc {i}\n"
        "\n"
        f"intro {text} with *bold* and _italic_\n"
        "\n"
        "* item A\n"
        "** nested\n"
        ". first\n"
        f".. sub {i}\n"
        "\n"
        f"see https://example.com/d/{i}[site {i}]\n"
        "\n"
        "----\n"
        f"code *stays* {i}\n"
        "----"
    )


MW_GOLDEN_TEMPLATE = (
    "# Page {id}\n"
    "intro {text} with **bold** and *italic* and ***both***\n"
    "- item A\n"
    "  1. sub {id}\n"
    "[label {id}](Target Page)\n"
    "[ext {id}](https://example.com/w/{id})"
)


def synth_mediawiki_dump(doc_id: int, text: str) -> bytes:
    i = doc_id
    wikitext = (
        f"= Page {i} =\n"
        f"intro {text} with '''bold''' and ''italic'' and '''''both'''''\n"
        "* item A\n"
        f"*# sub {i}\n"
        f"[[Target Page|label {i}]]\n"
        f"[https://example.com/w/{i} ext {i}]"
    )
    return (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">'
        f"<page><title>Doc {i}</title><revision><text>"
        + (wikitext.replace("&", "&amp;").replace("<", "&lt;"))
        + "</text></revision></page></mediawiki>"
    ).encode("utf-8")


# --- pipeline surface -------------------------------------------------------

def asciidoc_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = [asciidoc_to_md(synth_asciidoc(d, t))
                 for d, t in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist())]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def mediawiki_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, texts = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for title, md in parse_mediawiki_dump(synth_mediawiki_dump(d, t)):
                ids.append(d)
                titles.append(title)
                texts.append(md)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_asciidoc_extract() -> str:
    from jimmy_ray.sources.fixturetpl import sql_golden_query

    return sql_golden_query(ADOC_GOLDEN_TEMPLATE)


def sql_mediawiki_extract() -> str:
    from jimmy_ray.sources.fixturetpl import sql_golden

    return ("SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title, "
            f"{sql_golden(MW_GOLDEN_TEMPLATE)} AS text FROM documents")


# --- DokuWiki ---------------------------------------------------------------

_DOKU_HEAD_RE = re.compile(r"^(={2,6})\s*(.*?)\s*\1$")
_DOKU_LIST_RE = re.compile(r"^((?:  )+)([*-])\s*(.*)$")
_DOKU_ITALIC_RE = re.compile(r"//([^/\n]+)//")
_DOKU_MONO_RE = re.compile(r"''([^'\n]+)''")
_DOKU_LINK_RE = re.compile(r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]")


def _doku_inline(line: str) -> str:
    line = _DOKU_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _DOKU_ITALIC_RE.sub(r"*\1*", line)          # **bold** already md
    line = _DOKU_MONO_RE.sub(r"`\1`", line)
    return line


def dokuwiki_to_md(text: str) -> str:
    """DokuWiki (public syntax page): ``======``-wrapped headings count
    DOWN (6 = h1 … 2 = h5), two-space list indents, ``//``/``''``
    emphasis, ``<code>`` blocks → fences."""
    out: list[str] = []
    in_code = False
    for line in text.splitlines():
        stripped = line.strip()
        if stripped == "<code>" or stripped.startswith("<code "):
            out.append("```")
            in_code = True
            continue
        if stripped == "</code>":
            out.append("```")
            in_code = False
            continue
        if in_code:
            out.append(line)
            continue
        m = _DOKU_HEAD_RE.match(stripped)
        if m:
            out.append("#" * (7 - len(m.group(1))) + " "
                       + _doku_inline(m.group(2)))
            continue
        m = _DOKU_LIST_RE.match(line)
        if m:
            depth = len(m.group(1)) // 2 - 1
            bullet = "1. " if m.group(2) == "-" else "- "
            out.append("  " * depth + bullet + _doku_inline(m.group(3)))
            continue
        out.append(_doku_inline(line))
    return "\n".join(out)


DOKU_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "## Part {id}\n"
    "intro {text} with **bold** and *italic* and `mono`\n"
    "- item A\n"
    "  - nested {id}\n"
    "1. first\n"
    "[site {id}](https://example.com/d/{id})\n"
    "```\n"
    "code //stays// {id}\n"
    "```"
)


def synth_dokuwiki(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"====== Doc {i} ======\n"
        f"===== Part {i} =====\n"
        f"intro {text} with **bold** and //italic// and ''mono''\n"
        "  * item A\n"
        f"    * nested {i}\n"
        "  - first\n"
        f"[[https://example.com/d/{i}|site {i}]]\n"
        "<code>\n"
        f"code //stays// {i}\n"
        "</code>"
    )


# --- Textile ----------------------------------------------------------------

_TXT_HEAD_RE = re.compile(r"^h([1-6])\.\s+(.*)$")
_TXT_BOLD_RE = re.compile(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])")
_TXT_ITALIC_RE = re.compile(r"(?<![\w_])_([^_\n]+)_(?![\w_])")
_TXT_CODE_RE = re.compile(r"@([^@\n]+)@")
_TXT_LINK_RE = re.compile(r'"([^"\n]+)":(https?://\S+?)(?=[\s.,;!?)]*(?:\s|$))')


def _textile_inline(line: str) -> str:
    line = _TXT_LINK_RE.sub(r"[\1](\2)", line)
    line = _TXT_BOLD_RE.sub(r"**\1**", line)
    line = _TXT_ITALIC_RE.sub(r"*\1*", line)
    line = _TXT_CODE_RE.sub(r"`\1`", line)
    return line


def textile_to_md(text: str) -> str:
    """Textile (public syntax): ``hN.`` headings, ``bq.`` quotes,
    ``*``/``#`` list runs, ``*b*``/``_i_``/``@code@`` emphasis,
    ``"label":url`` links."""
    out: list[str] = []
    for line in text.splitlines():
        m = _TXT_HEAD_RE.match(line)
        if m:
            out.append("#" * int(m.group(1)) + " "
                       + _textile_inline(m.group(2)))
            continue
        if line.startswith("bq. "):
            out.append("> " + _textile_inline(line[4:]))
            continue
        m = re.match(r"^([*#]+)\s+(.*)$", line)
        if m:
            marks = m.group(1)
            bullet = "1. " if marks[-1] == "#" else "- "
            out.append("  " * (len(marks) - 1) + bullet
                       + _textile_inline(m.group(2)))
            continue
        out.append(_textile_inline(line))
    return "\n".join(out)


TEXTILE_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "intro {text} with **bold** and *italic* and `mono`\n"
    "> quoted {id}\n"
    "- item A\n"
    "  1. sub {id}\n"
    "see [site {id}](https://example.com/d/{id}) now"
)


def synth_textile(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"h1. Doc {i}\n"
        f"intro {text} with *bold* and _italic_ and @mono@\n"
        f"bq. quoted {i}\n"
        "* item A\n"
        f"*# sub {i}\n"
        f'see "site {i}":https://example.com/d/{i} now'
    )


from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

dokuwiki_extract = extract_query(synth_dokuwiki, dokuwiki_to_md,
                                 batch_size=512)
textile_extract = extract_query(synth_textile, textile_to_md,
                                batch_size=512)


def sql_dokuwiki_extract() -> str:
    return sql_golden_query(DOKU_GOLDEN_TEMPLATE)


def sql_textile_extract() -> str:
    return sql_golden_query(TEXTILE_GOLDEN_TEMPLATE)
