r"""Org-mode, reStructuredText and LaTeX → Markdown (public grammars).

Three more formats the reference's default converter hands to pandoc's
last-resort branch (/root/reference/src/jimmy/converter.py:341-352 with
md_lib/convert.py:24-41's extension map: .org, .rst/.rest, .tex) —
served natively here:

- Org: ``*``-run headlines, ``#+BEGIN_SRC`` blocks → fences,
  ``*bold*`` / ``/italic/`` / ``=code=``/``~code~`` verbatim,
  ``[[url][label]]`` links, ``+``/``-`` list bullets.
- RST: section titles by underline adornment (first-seen adornment
  char ⇒ level, the documented RST convention), ``\`label <url>\`_``
  links, ````literal```` inline code, ``.. code-block::`` directives →
  fences, other directives dropped.
- LaTeX: document-body slice, ``\\section``-family headings,
  ``\\textbf``/``\\emph``/``\\textit``/``\\texttt`` emphasis,
  ``\\href``/``\\url`` links, nested itemize/enumerate environments,
  comment stripping and special-char unescaping; math stays inline.

Fixture writers render golden templates the SQL mirrors derive from
(enex.py recipe), so all three conversion paths are oracle-checked.
"""

from __future__ import annotations

import re

import pyarrow as pa

# --- Org-mode ---------------------------------------------------------------

_ORG_HEAD_RE = re.compile(r"^(\*+)\s+(.*)$")
_ORG_BOLD_RE = re.compile(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])")
_ORG_ITALIC_RE = re.compile(r"(?<![\w/])/([^/\n]+)/(?![\w/])")
_ORG_CODE_RE = re.compile(r"[=~]([^=~\n]+)[=~]")
_ORG_LINK_RE = re.compile(r"\[\[([^\]\[]+)\](?:\[([^\]\[]+)\])?\]")


def _org_inline(line: str) -> str:
    line = _ORG_LINK_RE.sub(
        lambda m: f"[{m.group(2) or m.group(1)}]({m.group(1)})", line)
    line = _ORG_BOLD_RE.sub(r"**\1**", line)
    line = _ORG_ITALIC_RE.sub(r"*\1*", line)
    line = _ORG_CODE_RE.sub(r"`\1`", line)
    return line


def org_to_md(text: str) -> str:
    out: list[str] = []
    in_src = False
    for line in text.splitlines():
        stripped = line.strip()
        up = stripped.upper()
        if up.startswith("#+BEGIN_SRC"):
            lang = stripped.split(maxsplit=1)[1] if " " in stripped else ""
            out.append("```" + lang)
            in_src = True
            continue
        if up.startswith("#+END_SRC"):
            out.append("```")
            in_src = False
            continue
        if in_src:
            out.append(line)
            continue
        if up.startswith("#+TITLE:"):
            out.append("# " + stripped.split(":", 1)[1].strip())
            continue
        if stripped.startswith("#+"):  # other in-buffer settings dropped
            continue
        m = _ORG_HEAD_RE.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " " + _org_inline(m.group(2)))
            continue
        m = re.match(r"^(\s*)\+\s+(.*)$", line)
        if m:
            out.append(m.group(1) + "- " + _org_inline(m.group(2)))
            continue
        out.append(_org_inline(line))
    return "\n".join(out)


# --- reStructuredText -------------------------------------------------------

_RST_ADORN_RE = re.compile(r"^([=\-~^\"'#*+`:._])\1*\s*$")
_RST_LINK_RE = re.compile(r"`([^`<>]+?)\s+<([^`<>]+)>`_+")
_RST_LITERAL_RE = re.compile(r"``([^`]+)``")


def _rst_inline(line: str) -> str:
    line = _RST_LINK_RE.sub(r"[\1](\2)", line)
    line = _RST_LITERAL_RE.sub(r"`\1`", line)
    return line


def rst_to_md(text: str) -> str:
    lines = text.splitlines()
    out: list[str] = []
    adorn_level: dict[str, int] = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        stripped = line.strip()
        # directive: code-block becomes a fence, others are dropped
        m = re.match(r"^\.\.\s+code-block::\s*(\S*)", stripped)
        if m:
            i += 1
            block: list[str] = []
            while i < len(lines) and (not lines[i].strip()
                                      or lines[i].startswith(("   ", "\t"))):
                if lines[i].strip() or block:
                    block.append(lines[i].strip())
                i += 1
            while block and not block[-1]:
                block.pop()
            out += ["```" + m.group(1), *block, "```"]
            continue
        if stripped.startswith(".. "):
            i += 1
            continue
        # section title: text + adornment underline of >= title length
        if (stripped and nxt and _RST_ADORN_RE.match(nxt)
                and len(nxt.rstrip()) >= len(stripped)):
            ch = nxt.strip()[0]
            level = adorn_level.setdefault(ch, len(adorn_level) + 1)
            out.append("#" * level + " " + _rst_inline(stripped))
            i += 2
            continue
        m = re.match(r"^(\s*)[*+]\s+(.*)$", line)
        if m:
            out.append(m.group(1) + "- " + _rst_inline(m.group(2)))
            i += 1
            continue
        out.append(_rst_inline(line))
        i += 1
    return "\n".join(out)


# --- LaTeX ------------------------------------------------------------------

_TEX_SECTIONS = (("subsubsection", 3), ("subsection", 2), ("section", 1))
_TEX_UNESCAPE = {r"\&": "&", r"\%": "%", r"\$": "$", r"\#": "#",
                 r"\_": "_", r"\{": "{", r"\}": "}", "~": " ",
                 r"\textbackslash{}": "\\"}


def latex_to_md(text: str) -> str:
    m = re.search(r"\\begin\{document\}(.*)\\end\{document\}", text, re.S)
    if m:
        text = m.group(1)
    text = re.sub(r"(?<!\\)%[^\n]*", "", text)          # comments
    for name, level in _TEX_SECTIONS:
        text = re.sub(r"\\%s\*?\{([^{}]*)\}" % name,
                      lambda m, lv=level: "#" * lv + " " + m.group(1), text)
    text = re.sub(r"\\textbf\{([^{}]*)\}", r"**\1**", text)
    text = re.sub(r"\\(?:emph|textit)\{([^{}]*)\}", r"*\1*", text)
    text = re.sub(r"\\texttt\{([^{}]*)\}", r"`\1`", text)
    text = re.sub(r"\\href\{([^{}]*)\}\{([^{}]*)\}", r"[\2](\1)", text)
    text = re.sub(r"\\url\{([^{}]*)\}", r"<\1>", text)

    out: list[str] = []
    stack: list[str] = []  # itemize | enumerate nesting
    for line in text.splitlines():
        stripped = line.strip()
        m = re.match(r"\\begin\{(itemize|enumerate)\}", stripped)
        if m:
            stack.append(m.group(1))
            continue
        if re.match(r"\\end\{(itemize|enumerate)\}", stripped):
            if stack:
                stack.pop()
            continue
        m = re.match(r"\\item\s+(.*)$", stripped)
        if m and stack:
            bullet = "1. " if stack[-1] == "enumerate" else "- "
            out.append("  " * (len(stack) - 1) + bullet + m.group(1))
            continue
        out.append(line)
    text = "\n".join(out)
    for src, dst in _TEX_UNESCAPE.items():
        text = text.replace(src, dst)
    text = "\n".join(l.rstrip() for l in text.splitlines())
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


# --- fixtures + goldens -----------------------------------------------------

ORG_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "## Section {id}\n"
    "intro {text} with **bold** and *italic* and `verb`\n"
    "- item A\n"
    "- item {id}\n"
    "see [site {id}](https://example.com/d/{id})\n"
    "```python\n"
    "x = {id}  # *not* emphasis\n"
    "```"
)


def synth_org(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        f"#+TITLE: Doc {i}\n"
        "#+AUTHOR: fixture\n"
        f"** Section {i}\n"
        f"intro {text} with *bold* and /italic/ and =verb=\n"
        "- item A\n"
        f"+ item {i}\n"
        f"see [[https://example.com/d/{i}][site {i}]]\n"
        "#+BEGIN_SRC python\n"
        f"x = {i}  # *not* emphasis\n"
        "#+END_SRC"
    )


RST_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "\n"
    "intro {text} with **bold** and `lit {id}`\n"
    "\n"
    "## Section {id}\n"
    "\n"
    "- item A\n"
    "- item [site {id}](https://example.com/d/{id})\n"
    "\n"
    "```python\n"
    "x = {id}\n"
    "```\n"
    "tail {id}"
)


def synth_rst(doc_id: int, text: str) -> str:
    i = doc_id
    title = f"Doc {i}"
    section = f"Section {i}"
    return (
        f"{title}\n{'=' * len(title)}\n"
        "\n"
        f"intro {text} with **bold** and ``lit {i}``\n"
        "\n"
        f"{section}\n{'-' * len(section)}\n"
        "\n"
        ".. image:: dropped.png\n"
        "- item A\n"
        f"- item `site {i} <https://example.com/d/{i}>`_\n"
        "\n"
        ".. code-block:: python\n"
        "\n"
        f"   x = {i}\n"
        "\n"
        f"tail {i}"
    )


TEX_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "intro {text} with **bold** and *ital* and `mono`\n"
    "## Section {id}\n"
    "- item A\n"
    "  1. sub {id}\n"
    "see [site {id}](https://example.com/d/{id}) & co, 100% of ${id}\n"
    "math $x^2$ stays"
)


def synth_latex(doc_id: int, text: str) -> str:
    i = doc_id
    return (
        "\\documentclass{article}\n"
        "\\begin{document}\n"
        f"\\section{{Doc {i}}}\n"
        f"intro {text} with \\textbf{{bold}} and \\emph{{ital}} "
        "and \\texttt{mono}\n"
        f"\\subsection{{Section {i}}}\n"
        "\\begin{itemize}\n"
        "\\item item A\n"
        "\\begin{enumerate}\n"
        f"\\item sub {i}\n"
        "\\end{enumerate}\n"
        "\\end{itemize}\n"
        f"see \\href{{https://example.com/d/{i}}}{{site {i}}} "
        f"\\& co, 100\\% of \\${i} % a comment\n"
        "math $x^2$ stays\n"
        "\\end{document}\n"
    )


# --- pipeline surface -------------------------------------------------------

from jimmy_ray.sources.fixturetpl import extract_query, sql_golden_query

org_extract = extract_query(synth_org, org_to_md, batch_size=512)
rst_extract = extract_query(synth_rst, rst_to_md, batch_size=512)
latex_extract = extract_query(synth_latex, latex_to_md, batch_size=512)


def sql_org_extract() -> str:
    return sql_golden_query(ORG_GOLDEN_TEMPLATE)


def sql_rst_extract() -> str:
    return sql_golden_query(RST_GOLDEN_TEMPLATE)


def sql_latex_extract() -> str:
    return sql_golden_query(TEX_GOLDEN_TEMPLATE)
