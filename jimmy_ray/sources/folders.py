"""S8/S11 folder-and-container long tail: Dynalist, Zoho Notebook,
Google Docs takeout, Anytype (JSON subset).

Behavior ports:

- Dynalist (/root/reference/src/jimmy/formats/dynalist.py): zip of
  opml+txt, only ``.txt`` converts; inline tags with ``#`` AND ``@``
  prefixes; ``https://dynalist.io/d...`` links become note links only
  when ``<link text>.txt`` exists anywhere in the export (recursive file
  probe); folder nesting becomes notebooks.
- Zoho Notebook (formats/zoho_notebook.py): per-note ``.html`` whose
  ``<body>`` attributes carry JSON metadata (notecard, tags, notebook,
  reminders); ``index.html`` skipped, ``zohonotebook://`` links become
  note links, file-member links become resources.
- Google Docs takeout (formats/google_docs.py): the export nests under
  ``Takeout/Drive``; every file there walks through the default
  per-extension dispatch (html → markdown extraction).
- Anytype (formats/anytype.py delegates to the external
  anyblock-exporter; absent binary, like pandoc).  This reader
  implements the documented Any-Block JSON *subset* directly: one JSON
  per object, ``snapshot.data.details`` metadata + text blocks with
  style (headers, checkbox, marked, numbered, code) and mark ranges.
"""

from __future__ import annotations

import io
import json
import zipfile

import pyarrow as pa

from jimmy_ray.html.extract import html_to_markdown_filtered
from jimmy_ray.md.links import get_markdown_links
from jimmy_ray.md.tags import get_inline_tags


def _explode_rows(sf_dir: str, synth_fn, parse_fn, columns: tuple[str, ...],
                  batch_size: int = 256):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in ("doc_id", *columns)}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_fn(synth_fn(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in columns:
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string()) for k in columns},
        })

    return docs.map_batches(fn, batch_format="pyarrow",
                            batch_size=batch_size)


# --- Dynalist ---------------------------------------------------------------

def synth_dynalist_zip(doc_id: int, text: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            f"inbox {doc_id}.txt",
            f"{text} #dyn{doc_id % 3} @person{doc_id % 2}\n"
            f"[project {doc_id}](https://dynalist.io/d/abc{doc_id})\n"
            f"[gone note](https://dynalist.io/d/xyz{doc_id})",
        )
        zf.writestr(f"inbox {doc_id}.opml", "<opml/>")  # skipped
        zf.writestr(f"work/project {doc_id}.txt", f"project body {doc_id}")
        zf.writestr(f"work/project {doc_id}.opml", "<opml/>")
    return buf.getvalue()


def parse_dynalist(payload: bytes) -> list[dict]:
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        members = {n: zf.read(n).decode("utf-8") for n in zf.namelist()}
    txt_names = {n.rsplit("/", 1)[-1] for n in members}
    rows = []
    for name in sorted(members):
        if not name.lower().endswith(".txt"):
            continue
        folder, _, fname = name.rpartition("/")
        body = members[name]
        note_links = []
        for link in get_markdown_links(body):
            if link.url.startswith("https://dynalist.io/d"):
                if f"{link.text}.txt" in txt_names:  # recursive file probe
                    note_links.append(link.text)
        rows.append({
            "title": fname[: -len(".txt")],
            "notebook": folder,
            "body": body,
            "tags": ",".join(get_inline_tags(body, ("#", "@"))),
            "note_links": ",".join(note_links),
        })
    return rows


def dynalist_extract(sf_dir: str):
    return _explode_rows(sf_dir, synth_dynalist_zip, parse_dynalist,
                         ("title", "notebook", "body", "tags", "note_links"))


def sql_dynalist_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'inbox ' || {i} AS title,
  '' AS notebook,
  text || ' #dyn' || CAST(doc_id % 3 AS VARCHAR)
    || ' @person' || CAST(doc_id % 2 AS VARCHAR) || chr(10)
    || '[project ' || {i} || '](https://dynalist.io/d/abc' || {i} || ')'
    || chr(10)
    || '[gone note](https://dynalist.io/d/xyz' || {i} || ')' AS body,
  'dyn' || CAST(doc_id % 3 AS VARCHAR)
    || ',person' || CAST(doc_id % 2 AS VARCHAR) AS tags,
  'project ' || {i} AS note_links
FROM documents
UNION ALL
SELECT doc_id,
  'project ' || {i} AS title,
  'work' AS notebook,
  'project body ' || {i} AS body,
  '' AS tags,
  '' AS note_links
FROM documents
ORDER BY doc_id, title
"""


# --- Zoho Notebook ----------------------------------------------------------

def synth_zoho_files(doc_id: int, text: str) -> dict[str, str]:
    body_attrs = (
        "data-notecard='{}' data-tag='{}' data-notebook='{}' "
        "data-remainder='{}'"
    ).format(
        json.dumps({"name": f"Zoho {doc_id}",
                    "created_date": "2024-05-01T00:00:00",
                    "modified_date": "2024-05-02T00:00:00",
                    "color": f"#c{doc_id % 10}"}),
        json.dumps([f"zh{doc_id % 3}"]),
        json.dumps({"name": f"ZBook {doc_id % 4}",
                    "created_date": "2024-05-01T00:00:00",
                    "modified_date": "2024-05-01T00:00:00"}),
        json.dumps([{"ZReminderTime": "2024-06-01T08:00:00"}]),
    )
    html = (
        f"<html><body {body_attrs}>"
        f"<div>{text}</div>"
        f'<div><a href="zohonotebook://notes/zid{doc_id}">link</a></div>'
        f'<div><img src="res{doc_id}.png" /></div>'
        "</body></html>"
    )
    return {
        f"note{doc_id}.html": html,
        "index.html": "<html><body>index</body></html>",  # skipped
        f"res{doc_id}.png": "binary",
    }


def parse_zoho(files: dict[str, str]) -> list[dict]:
    import re

    rows = []
    for name in sorted(files):
        if not name.endswith(".html") or name == "index.html":
            continue
        html = files[name]
        body_m = re.search(r"<body([^>]*)>", html)
        metadata: dict = {}
        if body_m:
            for attr, value in re.findall(
                r"(data-[\w-]+)='([^']*)'", body_m.group(1)
            ):
                metadata[attr] = json.loads(value)
        notecard = metadata["data-notecard"]
        body = html_to_markdown_filtered(html, [])
        note_links, resources = [], []
        for link in get_markdown_links(body):
            if link.is_web_link or link.is_mail_link:
                continue
            if link.url.startswith("zohonotebook://"):
                note_links.append(link.url.rsplit("/", 1)[1])
            elif link.url in files:
                resources.append(link.url)
        rows.append({
            "note_id": name[: -len(".html")],
            "title": notecard["name"],
            "notebook": metadata["data-notebook"]["name"],
            "body": body,
            "tags": ",".join(metadata.get("data-tag", [])),
            "note_links": ",".join(note_links),
            "resources": ",".join(resources),
            "color": notecard.get("color", ""),
            "reminders": ",".join(r["ZReminderTime"]
                                  for r in metadata.get("data-remainder", [])),
        })
    return rows


def zoho_extract(sf_dir: str):
    return _explode_rows(sf_dir, synth_zoho_files, parse_zoho,
                         ("note_id", "title", "notebook", "body", "tags",
                          "note_links", "resources", "color", "reminders"))


def sql_zoho_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10) || chr(10)"
    return f"""
SELECT doc_id,
  'note' || {i} AS note_id,
  'Zoho ' || {i} AS title,
  'ZBook ' || CAST(doc_id % 4 AS VARCHAR) AS notebook,
  text || {nl} || '[link](zohonotebook://notes/zid' || {i} || ')'
    || {nl} || '![](res' || {i} || '.png)' AS body,
  'zh' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  'zid' || {i} AS note_links,
  'res' || {i} || '.png' AS resources,
  '#c' || CAST(doc_id % 10 AS VARCHAR) AS color,
  '2024-06-01T08:00:00' AS reminders
FROM documents
"""


# --- Google Docs takeout ----------------------------------------------------

def synth_takeout(doc_id: int, text: str) -> dict[str, str]:
    return {
        f"Takeout/Drive/Doc {doc_id}.html":
            f"<html><body><div>{text}</div>"
            f"<div>from gdocs {doc_id}</div></body></html>",
        f"Takeout/Drive/notes {doc_id}.md":
            f"# Notes {doc_id}\n\nplain markdown",
        "Takeout/archive_browser.html": "<html>skip: outside Drive</html>",
    }


def parse_takeout(files: dict[str, str]) -> list[dict]:
    rows = []
    for name in sorted(files):
        if not name.startswith("Takeout/Drive/"):
            continue  # google_docs.py:17-18 roots at Takeout/Drive
        member = name[len("Takeout/Drive/"):]
        stem, _, suffix = member.rpartition(".")
        if suffix == "html":
            text = html_to_markdown_filtered(files[name], [])
        else:  # default dispatch: markdown passes through
            text = files[name]
        rows.append({"member": member, "title": stem, "text": text})
    return rows


def google_docs_extract(sf_dir: str):
    return _explode_rows(sf_dir, synth_takeout, parse_takeout,
                         ("member", "title", "text"))


def sql_google_docs_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} || '.html' AS member,
  'Doc ' || {i} AS title,
  text || chr(10) || chr(10) || 'from gdocs ' || {i} AS text
FROM documents
UNION ALL
SELECT doc_id,
  'notes ' || {i} || '.md' AS member,
  'notes ' || {i} AS title,
  '# Notes ' || {i} || chr(10) || chr(10) || 'plain markdown' AS text
FROM documents
ORDER BY doc_id, member
"""


# --- Anytype (Any-Block JSON subset) ---------------------------------------

_ANYTYPE_HEADERS = {"Header1": "# ", "Header2": "## ", "Header3": "### "}


def anytype_block_to_md(block: dict) -> str:
    """One Any-Block text block → one markdown line (subset of the
    anyblock-exporter rendering the reference delegates to)."""
    t = block.get("text", {})
    text = t.get("text", "")
    for mark in t.get("marks", {}).get("marks", []):
        r = mark.get("range", {})
        frm, to = r.get("from", 0), r.get("to", len(text))
        seg = text[frm:to]
        wrap = {"Bold": "**", "Italic": "*", "Strikethrough": "~~",
                "Keyboard": "`"}.get(mark.get("type"))
        if wrap:
            text = text[:frm] + f"{wrap}{seg}{wrap}" + text[to:]
    style = t.get("style", "Paragraph")
    if style in _ANYTYPE_HEADERS:
        return _ANYTYPE_HEADERS[style] + text
    if style == "Checkbox":
        box = "[x]" if t.get("checked") else "[ ]"
        return f"- {box} {text}"
    if style == "Marked":
        return f"- {text}"
    if style == "Numbered":
        return f"1. {text}"
    if style == "Code":
        return f"```\n{text}\n```"
    return text


def synth_anytype(doc_id: int, text: str) -> str:
    return json.dumps({"sbType": "Page", "snapshot": {"data": {
        "details": {"name": f"Any {doc_id}",
                    "createdDate": 1_700_000_000 + doc_id},
        "blocks": [
            {"text": {"text": f"Intro {doc_id}", "style": "Header2"}},
            {"text": {"text": text, "style": "Paragraph"}},
            {"text": {"text": "bold word", "style": "Paragraph",
                      "marks": {"marks": [
                          {"type": "Bold", "range": {"from": 0, "to": 4}}]}}},
            {"text": {"text": "todo", "style": "Checkbox",
                      "checked": doc_id % 2 == 0}},
            {"text": {"text": "point", "style": "Marked"}},
            {"text": {"text": "code line", "style": "Code"}},
        ],
    }}})


def parse_anytype(raw: str) -> list[dict]:
    data = json.loads(raw)
    if data.get("sbType") != "Page":
        return []
    snap = data["snapshot"]["data"]
    body = "\n\n".join(
        anytype_block_to_md(b) for b in snap.get("blocks", [])
        if "text" in b
    )
    return [{"title": snap["details"].get("name", ""), "body": body}]


def anytype_extract(sf_dir: str):
    return _explode_rows(sf_dir, synth_anytype, parse_anytype,
                         ("title", "body"), batch_size=512)


def sql_anytype_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10) || chr(10)"
    return f"""
SELECT doc_id,
  'Any ' || {i} AS title,
  '## Intro ' || {i} || {nl} || text || {nl} || '**bold** word' || {nl}
    || '- ' || (CASE WHEN doc_id % 2 = 0 THEN '[x]' ELSE '[ ]' END)
    || ' todo' || {nl} || '- point' || {nl}
    || '```' || chr(10) || 'code line' || chr(10) || '```' AS body
FROM documents
"""
