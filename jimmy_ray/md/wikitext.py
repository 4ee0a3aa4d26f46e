r"""Wiki-markup → Markdown converters (SURVEY.md §2.2 M5-M9).

Behavioral ports of the reference's grammar modules — semantics defined
by the doctest corpora at /root/reference/src/jimmy/md_lib/{tiddlywiki,
zim,zettelkasten,roam_research,colornote}.py (ported verbatim into
tests/test_wikitext.py) — implemented fresh as staged regex/line
pipelines rather than pyparsing transform grammars.  Each converter is a
pure ``str -> str`` and per-document, i.e. a map_batches body; compiled
patterns are module-level so each worker process compiles once
(SURVEY.md §2.3 ST2).
"""

from __future__ import annotations

import re

# --- shared protection machinery -------------------------------------------

_PLACEHOLDER = "\x00{}\x01"


class _Vault:
    """Protect spans from later passes; restore at the end."""

    def __init__(self) -> None:
        self.items: list[str] = []

    def put(self, text: str) -> str:
        self.items.append(text)
        return _PLACEHOLDER.format(len(self.items) - 1)

    def restore(self, text: str) -> str:
        for i in range(len(self.items) - 1, -1, -1):
            text = text.replace(_PLACEHOLDER.format(i), self.items[i])
        return text


# ===========================================================================
# ColorNote (md_lib/colornote.py)
# ===========================================================================

_COLORNOTE_RE = re.compile(r"^(\[[ V]\] )", re.MULTILINE)


def colornote_to_md(body: str) -> str:
    r"""
    >>> colornote_to_md("[V] A\n[V] B")
    '- [x] A\n- [x] B'
    >>> colornote_to_md("[ ] Item 1\n[ ] Item 2")
    '- [ ] Item 1\n- [ ] Item 2'
    """
    return _COLORNOTE_RE.sub(
        lambda m: "- [x] " if m.group(1) == "[V] " else "- [ ] ", body
    )


# ===========================================================================
# Zim Wiki (md_lib/zim.py)
# ===========================================================================

_ZIM_CODE_RE = re.compile(r"'''\n(.*?)\n'''", re.S)
_ZIM_MONO_RE = re.compile(r"''(.+?)''")
_ZIM_IMG_RE = re.compile(r"\{\{(.+?)\}\}")
_ZIM_LINK_RE = re.compile(r"\[\[(.+?)\]\]")
_ZIM_HEAD_RE = re.compile(r"^(={1,6}) (.*?) ={1,6}$", re.MULTILINE)
_ZIM_CHECK_RE = re.compile(r"^( *)\[([ <>*x])\] ", re.MULTILINE)
_ZIM_TAB_RE = re.compile(r"^(\t+)", re.MULTILINE)


def _zim_basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def zim_to_md(zim_text: str) -> str:
    vault = _Vault()
    text = _ZIM_CODE_RE.sub(lambda m: vault.put(f"```\n{m.group(1)}\n```"), zim_text)
    text = _ZIM_MONO_RE.sub(lambda m: vault.put(f"`{m.group(1)}`"), text)

    def image(m: re.Match) -> str:
        target = m.group(1).split("?", 1)[0]
        name = _zim_basename(target)
        url = target[2:] if target.startswith("./") else target
        return f"![{name}]({url})"

    text = _ZIM_IMG_RE.sub(image, text)

    def link(m: re.Match) -> str:
        inner = m.group(1)
        if "|" in inner:
            url, title = inner.split("|", 1)
        else:
            url, title = inner, inner
        if url.startswith("./"):
            url = url[2:]
        return f"[{title}]({url})"

    text = _ZIM_LINK_RE.sub(link, text)
    text = re.sub(r"\*\*(.+?)\*\*", lambda m: vault.put("**") + m.group(1) + vault.put("**"), text)
    text = re.sub(r"__(.+?)__", r"==\1==", text)
    text = re.sub(r"//(.+?)//", r"*\1*", text)
    text = re.sub(r"\^\{(.+?)\}", r"^\1^", text)
    text = re.sub(r"_\{(.+?)\}", r"~\1~", text)

    def heading(m: re.Match) -> str:
        level = 7 - len(m.group(1))
        return "#" * level + " " + m.group(2)

    text = _ZIM_HEAD_RE.sub(heading, text)
    text = _ZIM_TAB_RE.sub(lambda m: "    " * len(m.group(1)), text)

    def check(m: re.Match) -> str:
        mark = "x" if m.group(2) in ("x", "*") else " "
        return f"{m.group(1)}- [{mark}] "

    text = _ZIM_CHECK_RE.sub(check, text)
    return vault.restore(text)


def parse_zim_page(page_text: str) -> dict:
    """One Zim page file → note row (formats/zim.py:43-86 semantics):
    the ``Key: value`` header block before the first blank line carries
    Content-Type / Creation-Date (kept as ISO string), the body converts
    through zim_to_md, and @-word tags are collected from the RAW body
    (the reference scans pre-conversion text).  Files whose header block
    doesn't parse as metadata (txt attachments) return None-title rows
    with the whole text as body."""
    from jimmy_ray.md.tags import get_inline_tags

    created = ""
    try:
        metadata, _, body = page_text.split("\n\n", maxsplit=2)
    except ValueError:
        metadata, body = "", page_text
    for line in metadata.split("\n"):
        key, sep, value = line.partition(": ")
        if not sep:  # not a metadata block: a plain txt attachment
            body = page_text
            created = ""
            break
        if key == "Creation-Date":
            created = value
    return {
        "body": zim_to_md(body).strip(),
        "created": created,
        "tags": ",".join(get_inline_tags(body, ["@"])),
    }


# ===========================================================================
# Zettelkasten BBCode (md_lib/zettelkasten.py)
# ===========================================================================

_BB_TABLE_RE = re.compile(r"\[table\](.*?)\[/table\]", re.S)
_BB_CODE_RE = re.compile(r"\[code\](.*?)\[/code\]", re.S)
_BB_VANISH = ("al", "ar", "ce")


def _bb_table(m: re.Match) -> str:
    content = m.group(1)
    caption = ""
    cap_m = re.search(r"\[tc\](.*?)\[/tc\]", content)
    if cap_m:
        caption = cap_m.group(1)
        content = content.replace(cap_m.group(0), "", 1)
    rows = [r for r in content.split("[br]") if r != ""]
    lines = []
    for idx, row in enumerate(rows):
        if "^" in row:
            cells = row.split("^")
            lines.append("| " + " | ".join(cells) + " |")
            lines.append("| " + " | ".join(["---"] * len(cells)) + " |")
        else:
            cells = row.split("|")
            lines.append("| " + " | ".join(cells) + " |")
    out = "\n".join(lines)
    if caption:
        out = f"{caption}\n\n{out}"
    return out


def bbcode_to_md(bbcode: str) -> str:
    text = _BB_TABLE_RE.sub(_bb_table, bbcode)
    text = _BB_CODE_RE.sub(
        lambda m: "\n```\n" + m.group(1).replace("[br]", "\n") + "\n```", text
    )
    text = text.replace("[br]", "\n")
    # lists: [l] unordered / [n] ordered with [*]item[/*]
    for tag_name, marker in (("l", "* "), ("n", "1. ")):
        def list_block(m: re.Match, marker=marker) -> str:
            items = re.findall(r"\[\*\](.*?)\[/\*\]", m.group(1), re.S)
            return "".join(f"{marker}{item}\n" for item in items)

        text = re.sub(rf"\[{tag_name}\](.*?)\[/{tag_name}\]", list_block, text,
                      flags=re.S)
    text = re.sub(r"\[f\](.*?)\[/f\]", r"**\1**", text, flags=re.S)
    text = re.sub(r"\[d\](.*?)\[/d\]", r"~~\1~~", text, flags=re.S)
    text = re.sub(r"\[h(?: [^\]]*)?\](.*?)\[/h\]", r"==\1==", text, flags=re.S)
    for lvl in range(1, 7):
        text = re.sub(rf"\[h{lvl}\](.*?)\[/h{lvl}\]", "#" * lvl + r" \1", text,
                      flags=re.S)
    text = re.sub(r"\[q\](.*?)\[/q\]", r"> \1", text, flags=re.S)
    text = re.sub(r"\[img\](.*?)\[/img\]", r"![\1](\1)", text, flags=re.S)
    text = re.sub(r"\[z (\S+?)\](.*?)\[/z\]", r"[\2](note://\1)", text, flags=re.S)
    for tag_name in _BB_VANISH:
        text = re.sub(rf"\[{tag_name}\](.*?)\[/{tag_name}\]", r"\1", text, flags=re.S)
    return text


# ===========================================================================
# Roam Research (md_lib/roam_research.py)
# ===========================================================================

def _roam_tag_norm(name: str) -> str:
    return name.replace(" ", "-")


def roam_to_md(roam_text: str) -> str:
    text = roam_text.replace("{{[[TODO]]}}", "[ ]")
    text = text.replace("{{[[DONE]]}}", "[x]")
    text = text.replace("[[>]]", ">")
    text = re.sub(r"\{\{\[\[embed\]\]: \(\((\S+?)\)\)\}\}",
                  r"[\1](roam-block://\1)", text)
    text = re.sub(r"\{\{\[\[embed\]\]: \[\[(.+?)\]\]\}\}",
                  r"[\1](roam-page://\1)", text)
    text = re.sub(r"\{\{\[\[mentions\]\]: \[\[(.+?)\]\]\}\}",
                  r"[\1](roam-page://\1)", text)
    text = re.sub(r"\{\{\[\[pdf\]\]: (\S+?)\}\}", r"<\1>", text)
    # md links whose target is a block ref or page ref
    text = re.sub(r"\]\(\(\((\S+?)\)\)\)", r"](roam-block://\1)", text)
    text = re.sub(r"\]\(\[\[(.+?)\]\]\)", r"](roam-page://\1)", text)
    # tags with brackets
    text = re.sub(r"#\[\[(.+?)\]\]", lambda m: "#" + _roam_tag_norm(m.group(1)), text)
    # page links (not already consumed; leave {{[[fn]]}} internals alone)
    text = re.sub(r"(?<!\{)\[\[(.+?)\]\](?!\})", r"[\1](roam-page://\1)", text)
    text = re.sub(r"\^\^(.+?)\^\^", r"==\1==", text)
    text = re.sub(r"__(.+?)__", r"*\1*", text, flags=re.S)
    return text


# ===========================================================================
# TiddlyWiki wikitext (md_lib/tiddlywiki.py)
# ===========================================================================

_TW_CODE_RE = re.compile(r"`[^`\n]*`")
_TW_URL_RE = re.compile(r"\b(?:https?|ftp|file)://\S*")
_TW_IMG_RE = re.compile(r"\[img(?: [^\[\]]*?)?\[(.+?)\]\]")
_TW_EXT_RE = re.compile(r"\[ext\[(.+?)\]\]")
_TW_LINK_RE = re.compile(r"\[\[(.+?)\]\]")
_TW_HEAD_RE = re.compile(r"^(!{1,6}) (.*)$", re.MULTILINE)
_TW_LIST_RE = re.compile(r"^([*#]+)(>)? (.*)$", re.MULTILINE)


def _tw_wrap_url(url: str) -> str:
    return f"<{url}>" if (" " in url or "\\" in url) else url


def _tw_is_url(s: str) -> bool:
    return "://" in s or s.startswith(("mailto:", "#"))


def _tw_tables(lines: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if not line.startswith("|"):
            out.append(line)
            i += 1
            continue
        block: list[str] = []
        while i < n and lines[i].startswith("|"):
            block.append(lines[i])
            i += 1
        out.extend(_tw_render_table(block))
    return out


def _tw_render_table(block: list[str]) -> list[str]:
    header_rows: list[list[str]] = []
    body_rows: list[list[str]] = []
    footer_rows: list[list[str]] = []
    caption = ""
    implicit_header = True

    def cells_of(row: str) -> list[str]:
        parts = row.split("|")[1:-1]
        cleaned = []
        for cell in parts:
            c = cell
            if c.startswith(("^", ",")):
                c = c[1:]
            c = c.strip()
            if c in ("<", ">", "~"):
                c = ""
            elif c.startswith("!"):
                c = c[1:].strip()
            cleaned.append(c)
        return cleaned

    for raw in block:
        classifier = ""
        row = raw
        if not row.endswith("|") and row.rfind("|") >= 0:
            classifier = row[row.rfind("|") + 1 :].strip()
            row = row[: row.rfind("|") + 1]
        if classifier == "k":
            continue
        if classifier == "c":
            caption = row.strip("|").strip()
            continue
        if classifier == "h":
            header_rows.append(cells_of(row))
            implicit_header = False
        elif classifier == "f":
            footer_rows.append(cells_of(row))
        else:
            body_rows.append(cells_of(row))

    if implicit_header and body_rows:
        header_rows = [body_rows[0]]
        body_rows = body_rows[1:]

    width = max(len(r) for r in header_rows + body_rows + footer_rows)
    lines: list[str] = []
    if caption:
        lines.extend([caption, ""])

    def fmt(cells: list[str]) -> str:
        padded = cells + [""] * (width - len(cells))
        return "| " + " | ".join(padded) + " |"

    for r in header_rows:
        lines.append(fmt(r))
    # \x02SEP\x02 survives the later inline-dash pass; finalized at the end
    lines.append("| " + " | ".join(["\x02SEP\x02"] * width) + " |")
    for r in body_rows + footer_rows:
        lines.append(fmt(r))
    return lines


def _tw_blockquotes(lines: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        if lines[i].strip() == "<<<":
            j = i + 1
            body: list[str] = []
            attribution = ""
            closed = False
            while j < n:
                if lines[j].startswith("<<<"):
                    attribution = lines[j][3:].strip()
                    closed = True
                    break
                body.append(lines[j])
                j += 1
            if closed:
                out.append("")
                out.extend("> " + b for b in body)
                if attribution:
                    out.append(f"> *{attribution}*")
                i = j + 1
                continue
        out.append(lines[i])
        i += 1
    return out


def tiddlywiki_to_md(wikitext: str) -> str:
    vault = _Vault()
    text = _TW_CODE_RE.sub(lambda m: vault.put(m.group(0)), wikitext)

    def image(m: re.Match) -> str:
        inner = m.group(1)
        if "|" in inner:
            tooltip, target = inner.split("|", 1)
        else:
            tooltip, target = inner, inner
        return vault.put(f"![{tooltip}]({target})")

    text = _TW_IMG_RE.sub(image, text)

    def ext_link(m: re.Match) -> str:
        inner = m.group(1)
        if "|" in inner:
            label, target = inner.split("|", 1)
        else:
            label, target = inner, inner
        return vault.put(f"[{label}]({_tw_wrap_url(target)})")

    text = _TW_EXT_RE.sub(ext_link, text)

    def tid_link(m: re.Match) -> str:
        inner = m.group(1)
        if "|" in inner:
            label, target = inner.split("|", 1)
        else:
            label, target = inner, inner
        url = target if _tw_is_url(target) else f"tiddlywiki://{target}"
        return vault.put(f"[{label}]({url})")

    text = _TW_LINK_RE.sub(tid_link, text)
    text = _TW_URL_RE.sub(lambda m: vault.put(m.group(0)), text)

    # line-structured passes
    lines = text.split("\n")
    lines = _tw_blockquotes(lines)
    lines = _tw_tables(lines)
    # horizontal rules: whole line of 3+ dashes -> ---
    lines = ["---" if re.fullmatch(r"-{3,}", ln) else ln for ln in lines]
    text = "\n".join(lines)

    def listify(m: re.Match) -> str:
        prefix, quote, rest = m.group(1), m.group(2), m.group(3)
        if quote:
            return "    " * len(prefix) + "> " + rest
        indent = "    " * (len(prefix) - 1)
        marker = "* " if prefix[-1] == "*" else "1. "
        return indent + marker + rest

    text = _TW_LIST_RE.sub(listify, text)
    text = _TW_HEAD_RE.sub(lambda m: "#" * len(m.group(1)) + " " + m.group(2), text)

    # dashes (inline only; rules handled above)
    text = re.sub(r"(?<=\s)---(?=\s)", "—", text)
    text = re.sub(r"(?<=\s)--(?=\s)", "–", text)

    # inline formatting
    text = re.sub(r"''(.+?)''", r"**\1**", text, flags=re.S)
    text = re.sub(r"__(.+?)__", r"++\1++", text, flags=re.S)
    text = re.sub(r"\^\^(.+?)\^\^", r"^\1^", text, flags=re.S)
    text = re.sub(r",,(.+?),,", r"~\1~", text, flags=re.S)
    text = re.sub(r"@@(.+?)@@", r"==\1==", text, flags=re.S)
    text = re.sub(r"//(.+?)//", r"*\1*", text, flags=re.S)
    text = text.replace("\x02SEP\x02", "---")
    return vault.restore(text)


# --- TiddlyWiki export container (tiddlers .json) ----------------------------

def tw_split_tags(tag_string: str) -> list[str]:
    """Space-separated tags; multi-word tags in ``[[double brackets]]``
    (tiddlywiki.py:273-301 semantics).

    >>> tw_split_tags("tag1 tag2 [[tag with spaces]]")
    ['tag1', 'tag2', 'tag with spaces']
    >>> tw_split_tags("")
    []
    >>> tw_split_tags("alpha [[work notes")   # truncated/hand-edited
    ['alpha', 'work notes']
    >>> tw_split_tags("[[]] beta")            # empty bracket pair
    ['beta']
    """
    if not tag_string.strip():
        return []
    out: list[str] = []
    pending: str | None = None
    for part in tag_string.split(" "):
        if pending is not None:
            if part.endswith("]]"):
                tag = (pending + " " + part[:-2]).strip()
                if tag:
                    out.append(tag)
                pending = None
            else:
                pending += " " + part
        elif part.startswith("[["):
            if part.endswith("]]"):
                if len(part) > 4:
                    out.append(part[2:-2])
                # `[[]]` → empty pair, dropped
            else:
                pending = part[2:]
        elif part:
            out.append(part)
    if pending is not None and pending.strip():
        out.append(pending.strip())  # unterminated bracket: keep the tag
    return out


def tw_ts_ms(tiddly_time: str) -> int:
    """TiddlyWiki timestamp ``YYYYMMDDHHMMSSmmm`` (UTC) → epoch ms
    (tiddlywiki.py:268-270 parses the same format)."""
    import datetime as dt

    t = dt.datetime.strptime(tiddly_time, "%Y%m%d%H%M%S%f").replace(
        tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1000)


def parse_tiddlers_json(raw: str) -> list[dict]:
    """A TiddlyWiki export ``tiddlers.json`` → note rows.

    Reference semantics (tiddlywiki.py:420-489): skip tiddlers carrying a
    ``$:/tags/`` special tag, fence ``application/json`` payloads, convert
    wikitext bodies through the shared grammar, split bracketed tags,
    parse created/modified timestamps.  Image/base64 tiddlers are out of
    scope here (resource sink handles binaries)."""
    import json

    rows: list[dict] = []
    for tiddler in json.loads(raw):
        tags = tw_split_tags(tiddler.get("tags", ""))
        if any(t.startswith("$:/tags/") for t in tags):
            continue
        mime = tiddler.get("type", "")
        if mime == "application/json":
            body = "```\n" + tiddler.get("text", "") + "\n```"
        else:
            body = tiddlywiki_to_md(tiddler.get("text", ""))
        row = {
            "title": tiddler["title"],
            "body": body,
            "tags": ",".join(tags),
        }
        if "created" in tiddler:
            row["created_ms"] = tw_ts_ms(tiddler["created"])
        if "modified" in tiddler:
            row["updated_ms"] = tw_ts_ms(tiddler["modified"])
        rows.append(row)
    return rows
