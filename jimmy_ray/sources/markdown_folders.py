"""Folder-of-markdown readers with app semantics: Obsidian, QOwnNotes.

Round-2 verdict item #10 — the generic S11 walker covers these folders,
but the app-specific semantics were missing:

- Obsidian (/root/reference/src/jimmy/formats/obsidian.py:44-88):
  ``.obsidian`` folders skipped, nested folders become notebooks,
  markdown-suffix (and suffixless) links resolve to note links by
  unquoted stem with fragments preserved, other links resolve to
  resources by recursive filename probe (common.find_file_recursively,
  common.py:506-516), tags = inline ``#tags`` plus frontmatter ``tags``.
- QOwnNotes (formats/qownnotes.py:51-114): flat ``*.md`` glob,
  ``notes.sqlite`` tag DB (``appData`` version check, ``tag`` +
  ``noteTagLink`` joined on the note stem), the first three body lines
  (setext title block) dropped, ``<note.md>`` qownnote-style links plus
  regular markdown links.
"""

from __future__ import annotations

import os
import re
import sqlite3
from urllib.parse import unquote

import pyarrow as pa

from jimmy_ray.md.links import get_markdown_links
from jimmy_ray.md.tags import get_inline_tags

MARKDOWN_SUFFIXES = (".md", ".mdown", ".markdown")
MARKDOWN_LINK_SUFFIXES = MARKDOWN_SUFFIXES + ("",)

QOWNNOTE_LINK_RE = re.compile(r"<(.*?.md)>")
_FM_TAGS_RE = re.compile(r"^tags:\s*\[([^\]]*)\]\s*$", re.M)
# real Obsidian property serialization: a block list under ``tags:``
# (reference parses full YAML via python-frontmatter, obsidian.py:59-61);
# items may be indented OR flush-left — both are valid YAML and real
# exports contain both
_FM_TAGS_BLOCK_RE = re.compile(r"^tags:[ \t]*\n((?:[ \t]*-[^\n]*(?:\n|$))+)",
                               re.M)


def _suffix(url: str) -> str:
    name = url.rpartition("/")[2]
    dot = name.rfind(".")
    return name[dot:] if dot > 0 else ""


def _stem(url: str) -> str:
    name = unquote(url).rpartition("/")[2]
    dot = name.rfind(".")
    return name[:dot] if dot > 0 else name


def parse_frontmatter_tags(body: str) -> tuple[list[str], str]:
    """Minimal YAML-frontmatter subset: leading ``---`` block with an
    inline ``tags: [a, b]`` list (the obsidian default property shape)."""
    if not body.startswith("---\n"):
        return [], body
    end = body.find("\n---\n", 4)
    if end == -1:
        return [], body
    block, rest = body[4:end], body[end + len("\n---\n"):]
    m = _FM_TAGS_RE.search(block)
    if m:
        tags = [t.strip() for t in m.group(1).split(",") if t.strip()]
    else:
        mb = _FM_TAGS_BLOCK_RE.search(block)
        tags = [ln.strip().lstrip("-").strip().strip("'\"")
                for ln in mb.group(1).splitlines()
                if ln.strip()] if mb else []
    return tags, rest


# --- Obsidian ---------------------------------------------------------------

def synth_obsidian_vault(doc_id: int, text: str) -> dict[str, str]:
    nxt = doc_id + 1
    return {
        f"Note {doc_id}.md": (
            f"---\ntags: [fm{doc_id % 3}, vault]\n---\n"
            f"{text} #inline{doc_id % 2}\n"
            f"[next](Note%20{nxt}.md#Top)\n"
            f"![pic](pic{doc_id}.png)\n"
            f"[missing](gone{doc_id}.bin)\n"
        ),
        f"sub/Deep {doc_id}.md": f"deep body {doc_id} [up](Note%20{doc_id}.md)",
        f"sub/attachments/pic{doc_id}.png": "\x89PNG",
        ".obsidian/app.json": "{}",  # internal folder: skipped
        "readme.txt": "not markdown: skipped",
    }


def parse_obsidian(files: dict[str, str]) -> list[dict]:
    rows = []
    for path in sorted(files):
        parts = path.split("/")
        if parts[0] == ".obsidian":
            continue
        name = parts[-1]
        if _suffix(name).lower() not in MARKDOWN_SUFFIXES:
            continue
        body = files[path]
        note_links, resources = [], []
        for link in get_markdown_links(body):
            if link.is_web_link or link.is_mail_link:
                continue
            if _suffix(link.url) in MARKDOWN_LINK_SUFFIXES:
                note_links.append(_stem(link.url))
            else:
                # recursive filename probe (rglob semantics,
                # common.py:506-516): any member whose trailing path
                # components match the unquoted url — bare names AND
                # relative paths like attachments/file.pdf
                target = unquote(link.url)
                tparts = target.split("/")
                if any(p.split("/")[-len(tparts):] == tparts
                       for p in files):
                    resources.append(target)
        inline = get_inline_tags(body, ("#",))
        fm_tags, body = parse_frontmatter_tags(body)
        rows.append({
            "title": _stem(name),
            "notebook": "/".join(parts[:-1]),
            "body": body,
            "tags": ",".join(inline + fm_tags),
            "note_links": ",".join(note_links),
            "resources": ",".join(resources),
        })
    return rows


def obsidian_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "title", "notebook", "body", "tags",
            "note_links", "resources")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_obsidian(synth_obsidian_vault(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in cols if k != "doc_id"},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_obsidian_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10)"
    return f"""
SELECT doc_id,
  'Note ' || {i} AS title,
  '' AS notebook,
  text || ' #inline' || CAST(doc_id % 2 AS VARCHAR) || {nl}
    || '[next](Note%20' || CAST(doc_id + 1 AS VARCHAR) || '.md#Top)' || {nl}
    || '![pic](pic' || {i} || '.png)' || {nl}
    || '[missing](gone' || {i} || '.bin)' || {nl} AS body,
  'inline' || CAST(doc_id % 2 AS VARCHAR)
    || ',fm' || CAST(doc_id % 3 AS VARCHAR) || ',vault' AS tags,
  'Note ' || CAST(doc_id + 1 AS VARCHAR) AS note_links,
  'pic' || {i} || '.png' AS resources
FROM documents
UNION ALL
SELECT doc_id,
  'Deep ' || {i} AS title,
  'sub' AS notebook,
  'deep body ' || {i} || ' [up](Note%20' || {i} || '.md)' AS body,
  '' AS tags,
  'Note ' || {i} AS note_links,
  '' AS resources
FROM documents
ORDER BY doc_id, title
"""


# --- QOwnNotes --------------------------------------------------------------

def get_qownnote_links(body: str) -> list[str]:
    """qownnotes.py:16-27 (ported doctests in tests)."""
    return QOWNNOTE_LINK_RE.findall(body)


def _fixture_tag_db(sf_dir: str) -> str:
    """notes.sqlite fixture: appData version row, tag table, noteTagLink
    joined on the note stem (qownnotes.py:51-87).  Cached per content
    fingerprint like the anki fixture."""
    import pyarrow.parquet as pq

    from jimmy_ray.sources.fixturecache import cache_path

    db = cache_path(sf_dir, "jimmy_ray_qon", ".sqlite")
    if os.path.exists(db):
        return db
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    tmp = db + f".tmp.{os.getpid()}"
    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE appData (name TEXT, value TEXT)")
    con.execute("INSERT INTO appData VALUES ('database_version', '15')")
    con.execute("CREATE TABLE tag (id INTEGER, name TEXT, extra TEXT)")
    for k in range(4):
        con.execute("INSERT INTO tag VALUES (?, ?, '')",
                    (k + 1, f"qtag{k}"))
    con.execute("CREATE TABLE noteTagLink "
                "(id INTEGER, tag_id INTEGER, note_id TEXT)")
    for doc_id in ids:
        con.execute("INSERT INTO noteTagLink VALUES (?, ?, ?)",
                    (doc_id, doc_id % 4 + 1, f"QNote {doc_id}"))
    con.commit()
    con.close()
    os.replace(tmp, db)
    return db


def parse_qownnotes_tag_db(db_path: str) -> dict[str, list[str]]:
    con = sqlite3.connect(db_path)
    try:
        for name, value in con.execute("SELECT * FROM appData"):
            if name == "database_version" and value != "15":
                raise ValueError(f"untested DB version {value}")
        tag_names = {tid: tname for tid, tname, *_ in
                     con.execute("SELECT * FROM tag")}
        note_tag_map: dict[str, list[str]] = {}
        for _, tag_id, note_id, *_ in con.execute("SELECT * FROM noteTagLink"):
            note_tag_map.setdefault(note_id, []).append(tag_names[tag_id])
    finally:
        con.close()
    return note_tag_map


def qownnotes_note_row(stem: str, body: str,
                       note_tag_map: dict[str, list[str]]) -> dict:
    note_links, resources = [], []
    for link in get_markdown_links(body):
        if link.is_web_link or link.is_mail_link:
            continue
        if _suffix(link.url) in MARKDOWN_LINK_SUFFIXES:
            note_links.append(_stem(link.url))
        else:
            resources.append(link.url)
    for qlink in get_qownnote_links(body):
        note_links.append(_stem(qlink))
    return {
        "title": stem,
        "body": "\n".join(body.split("\n")[3:]),  # drop setext title block
        "tags": ",".join(note_tag_map.get(stem, [])),
        "note_links": ",".join(note_links),
        "resources": ",".join(resources),
    }


def synth_qownnote(doc_id: int, text: str) -> tuple[str, str]:
    stem = f"QNote {doc_id}"
    body = (
        f"{stem}\n{'=' * len(stem)}\n\n"
        f"{text}\n"
        f"[md link](QNote%20{doc_id + 1}.md) "
        f"[res](media/shot{doc_id}.png)\n"
        f"<QNote {doc_id + 2}.md>"
    )
    return stem, body


def qownnotes_extract(sf_dir: str):
    """Tag DB read once on the driver (small per-export metadata side,
    broadcast into the stage closure); note conversion runs distributed."""
    import ray.data as rd

    note_tag_map = parse_qownnotes_tag_db(_fixture_tag_db(sf_dir))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "title", "body", "tags", "note_links", "resources")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            stem, raw = synth_qownnote(doc_id, text)
            row = qownnotes_note_row(stem, raw, note_tag_map)
            cols["doc_id"].append(doc_id)
            for k, v in row.items():
                cols[k].append(v)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in cols if k != "doc_id"},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_qownnotes_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'QNote ' || {i} AS title,
  text || chr(10)
    || '[md link](QNote%20' || CAST(doc_id + 1 AS VARCHAR) || '.md) '
    || '[res](media/shot' || {i} || '.png)' || chr(10)
    || '<QNote ' || CAST(doc_id + 2 AS VARCHAR) || '.md>' AS body,
  'qtag' || CAST(doc_id % 4 AS VARCHAR) AS tags,
  'QNote ' || CAST(doc_id + 1 AS VARCHAR)
    || ',QNote ' || CAST(doc_id + 2 AS VARCHAR) AS note_links,
  'media/shot' || {i} || '.png' AS resources
FROM documents
"""
