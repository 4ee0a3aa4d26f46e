"""S8 long-tail JSON exports: Cacher, Clipto, Turtl, Reflect.

Behavior ports (one compact reader each, fixture + DuckDB mirror):

- Cacher (/root/reference/src/jimmy/formats/cacher.py): snippets are
  notebooks, files are notes, labels join per snippet guid; only
  ``filetype == "markdown"`` files convert, h1 title split.
- Clipto (formats/clipto.py): notes + ``filters`` tag table joined via
  ``tagIds``; untitled notes split the first line as title (h1=False).
- Turtl (formats/turtl.py): space/board two-level notebook lookup,
  per-type body assembly (password notes become credential bullets),
  trailing ``<url>``, base64 file attachments appended as links, image
  links → resources vs non-web links → note links.
- Reflect (formats/reflect.py): recursive ``document_json`` AST →
  markdown (headings, marks incl. highlight/underline, link mark applied
  last, backlinks, inline tags, list kinds, code blocks).
"""

from __future__ import annotations

import json

import pyarrow as pa

from jimmy_ray.md.links import get_markdown_links, make_link
from jimmy_ray.md.text import (
    split_leading_trailing_whitespace,
    split_title_from_body,
)

_IMAGE_SUFFIXES = (".png", ".jpg", ".jpeg", ".gif", ".bmp", ".webp")


def _explode(sf_dir: str, synth_fn, parse_fn, columns: tuple[str, ...],
             batch_size: int = 512):
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


# --- Cacher ----------------------------------------------------------------

def synth_cacher(doc_id: int, text: str) -> str:
    guid = f"sn-{doc_id}"
    return json.dumps({"personalLibrary": {
        "labels": [{
            "title": f"lab{doc_id % 3}", "guid": f"lb-{doc_id % 3}",
            "snippets": [{"guid": guid}],
        }],
        "snippets": [{
            "title": f"Snippet {doc_id}", "guid": guid,
            "files": [
                {"filetype": "markdown",
                 "filename": f"file{doc_id}.md",
                 "guid": f"f-{doc_id}-md",
                 "content": f"# File {doc_id}\n\n{text}",
                 "createdAt": "2024-02-01T00:00:00",
                 "updatedAt": "2024-02-02T00:00:00"},
                {"filetype": "plaintext",  # cacher.py:15-18 skip branch
                 "filename": f"file{doc_id}.txt",
                 "guid": f"f-{doc_id}-txt",
                 "content": "ignored",
                 "createdAt": "2024-02-01T00:00:00",
                 "updatedAt": "2024-02-01T00:00:00"},
            ],
        }],
    }})


def parse_cacher(raw: str) -> list[dict]:
    data = json.loads(raw)
    lib = data["personalLibrary"]
    tags_per_snippet: dict[str, list[str]] = {}
    for label in lib["labels"]:
        for assigned in label["snippets"]:
            tags_per_snippet.setdefault(assigned["guid"], []).append(
                label["title"])
    rows = []
    for snippet in lib["snippets"]:
        tags = tags_per_snippet.get(snippet["guid"], [])
        for file_ in snippet["files"]:
            if file_["filetype"] != "markdown":
                continue
            _, body = split_title_from_body(file_["content"])
            rows.append({
                "guid": file_["guid"],
                "title": file_["filename"].rsplit(".", 1)[0],
                "notebook": snippet["title"],
                "body": body,
                "tags": ",".join(tags),
                "created": file_["createdAt"],
            })
    return rows


def cacher_extract(sf_dir: str):
    return _explode(sf_dir, synth_cacher, parse_cacher,
                    ("guid", "title", "notebook", "body", "tags", "created"))


def sql_cacher_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'f-' || {i} || '-md' AS guid,
  'file' || {i} AS title,
  'Snippet ' || {i} AS notebook,
  text AS body,
  'lab' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  '2024-02-01T00:00:00' AS created
FROM documents
"""


# --- Clipto ----------------------------------------------------------------

def synth_clipto(doc_id: int, text: str) -> str:
    return json.dumps({
        "filters": [
            {"name": f"cl{doc_id % 3}", "uid": f"u{doc_id % 3}"},
            {"name": "other", "uid": "u-other"},
        ],
        "notes": [
            {"title": f"Titled {doc_id}", "text": text,
             "created": "2024-03-01T00:00:00",
             "updated": "2024-03-02T00:00:00",
             "tagIds": [f"u{doc_id % 3}"]},
            {"text": f"First line {doc_id}\n{text}",  # untitled branch
             "created": "2024-03-03T00:00:00",
             "updated": "2024-03-04T00:00:00"},
        ],
    })


def parse_clipto(raw: str) -> list[dict]:
    data = json.loads(raw)
    tag_table = [(f.get("name", ""), f.get("uid"))
                 for f in data.get("filters", [])]
    rows = []
    for note in data.get("notes", []):
        text = note.get("text", "")
        if (title := note.get("title")) is None:
            title, text = split_title_from_body(text, h1=False)
        tags = [name for name, uid in tag_table
                if uid in note.get("tagIds", [])]
        rows.append({
            "title": title,
            "body": text,
            "tags": ",".join(tags),
            "created": note["created"],
        })
    return rows


def clipto_extract(sf_dir: str):
    return _explode(sf_dir, synth_clipto, parse_clipto,
                    ("title", "body", "tags", "created"))


def sql_clipto_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, 'Titled ' || {i} AS title, text AS body,
  'cl' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  '2024-03-01T00:00:00' AS created
FROM documents
UNION ALL
SELECT doc_id, 'First line ' || {i} AS title, text AS body,
  '' AS tags, '2024-03-03T00:00:00' AS created
FROM documents
ORDER BY doc_id, created
"""


# --- Turtl -----------------------------------------------------------------

TURTL_EPOCH = 1_700_000_000


def synth_turtl(doc_id: int, text: str) -> str:
    space = f"sp-{doc_id % 2}"
    board = f"bd-{doc_id % 4}"
    notes = [{
        "id": f"n-{doc_id}-text", "type": "text",
        "title": f"Turtl {doc_id}", "text": text,
        "tags": [f"tt{doc_id % 3}"], "mod": TURTL_EPOCH + doc_id,
        "space_id": space, "board_id": board,
        "url": f"https://turtl.example/{doc_id}" if doc_id % 2 == 0 else "",
    }, {
        "id": f"n-{doc_id}-pass", "type": "password",
        "title": f"Login {doc_id}",
        "user_id": f"user{doc_id}", "password": f"pw{doc_id}",
        "text": "account notes "
                f"![shot](shot{doc_id}.png) [see](other{doc_id}.txt)",
        "tags": [], "mod": TURTL_EPOCH + doc_id,
        "space_id": space, "board_id": None, "url": "",
    }]
    files = [{"id": f"n-{doc_id}-text", "data": "QUJD"}]  # base64 "ABC"
    return json.dumps({
        "spaces": [{"id": space, "title": f"Space {doc_id % 2}"}],
        "boards": [{"id": board, "space_id": space,
                    "title": f"Board {doc_id % 4}"}],
        "files": files,
        "notes": [
            dict(n, file={"name": f"att{doc_id}.bin"})
            if n["id"] in {f["id"] for f in files} else n
            for n in notes
        ],
    })


def parse_turtl(raw: str) -> list[dict]:
    data = json.loads(raw)
    spaces = {s["id"]: s["title"] for s in data["spaces"]}
    boards = {b["id"]: (b["space_id"], b["title"]) for b in data["boards"]}
    file_map = {f["id"]: f["data"] for f in data["files"]}
    rows = []
    for note in data["notes"]:
        ntype = note["type"]
        if ntype in ("file", "image", "link", "text"):
            body = note["text"]
        elif ntype == "password":
            body = "\n".join([
                f"- Username: `{note['user_id']}`",
                f"- Password: `{note['password']}`",
                "",
                note["text"],
            ])
        else:
            body = ""
        if note.get("url"):
            body += f"\n\n<{note['url']}>"
        if note["id"] in file_map:
            name = note["file"]["name"]
            body += f"\n\n{make_link(name, name)}"

        resources, note_links = [], []
        for link in get_markdown_links(body):
            if link.is_web_link or link.is_mail_link:
                continue
            if link.url.lower().endswith(_IMAGE_SUFFIXES):
                resources.append(link.url)
            else:
                note_links.append(link.url.rsplit(".", 1)[0])

        board = boards.get(note["board_id"] or "")
        if note["board_id"] is None:
            notebook = spaces.get(note["space_id"], "")
        elif board is not None and board[0] == note["space_id"]:
            notebook = board[1]
        else:
            notebook = ""
        rows.append({
            "note_id": note["id"],
            "title": note["title"],
            "notebook": notebook,
            "body": body,
            "tags": ",".join(note["tags"]),
            "resources": ",".join(resources),
            "note_links": ",".join(note_links),
        })
    return rows


def turtl_extract(sf_dir: str):
    return _explode(sf_dir, synth_turtl, parse_turtl,
                    ("note_id", "title", "notebook", "body", "tags",
                     "resources", "note_links"))


def sql_turtl_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10)"
    return f"""
SELECT doc_id,
  'n-' || {i} || '-pass' AS note_id,
  'Login ' || {i} AS title,
  'Space ' || CAST(doc_id % 2 AS VARCHAR) AS notebook,
  '- Username: `user' || {i} || '`' || {nl}
    || '- Password: `pw' || {i} || '`' || {nl} || {nl}
    || 'account notes ![shot](shot' || {i} || '.png) [see](other' || {i}
    || '.txt)' AS body,
  '' AS tags,
  'shot' || {i} || '.png' AS resources,
  'other' || {i} AS note_links
FROM documents
UNION ALL
SELECT doc_id,
  'n-' || {i} || '-text' AS note_id,
  'Turtl ' || {i} AS title,
  'Board ' || CAST(doc_id % 4 AS VARCHAR) AS notebook,
  text
    || CASE WHEN doc_id % 2 = 0
       THEN {nl} || {nl} || '<https://turtl.example/' || {i} || '>'
       ELSE '' END
    || {nl} || {nl} || '[att' || {i} || '.bin](att' || {i} || '.bin)'
    AS body,
  'tt' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  '' AS resources,
  'att' || {i} AS note_links
FROM documents
ORDER BY doc_id, note_id
"""


# --- Reflect ---------------------------------------------------------------

def reflect_json_to_markdown(node: dict, note_md: list[str] | None = None,
                             tags: list[str] | None = None,
                             note_links: list[str] | None = None):
    """reflect.py:12-123 recursive AST walk (same traversal order: node
    first, then content children, codeBlock closes after children)."""
    if note_md is None:
        note_md = []
    if tags is None:
        tags = []
    if note_links is None:
        note_links = []
    ntype = node["type"]
    if ntype == "backlink":
        backlink_md = make_link(node["attrs"]["label"], node["attrs"]["id"])
        note_md.append(backlink_md)
        note_links.append(node["attrs"]["id"])
    elif ntype == "codeBlock":
        language = node["attrs"].get("language", "")
        note_md.append(f"\n\n```{language}\n")
    elif ntype in ("hardBreak", "paragraph"):
        if note_md and note_md[-1] in ["- ", "1. ", "- [ ] ", "- [x] "]:
            note_md.insert(-1, "\n\n")
        else:
            note_md.append("\n\n")
    elif ntype == "heading":
        if (level := node["attrs"]["level"]) > 1:
            note_md.append("\n\n")
        note_md.append("#" * level + " ")
    elif ntype == "file":
        note_md.append(make_link(node["attrs"]["fileName"],
                                 node["attrs"]["url"]))
    elif ntype == "image":
        note_md.append(make_link(node["attrs"]["alt"], node["attrs"]["src"],
                                 is_image=True,
                                 title=node["attrs"]["title"]))
    elif ntype == "list":
        kind = node["attrs"]["kind"]
        if kind == "bullet":
            note_md.append("- ")
        elif kind == "checklist":
            note_md.append("- [x] " if node["attrs"]["checked"] else "- [ ] ")
        elif kind == "ordered":
            note_md.append("1. ")
    elif ntype == "tag":
        label = node["attrs"]["label"]
        note_md.append(f"#{label}")
        tags.append(label)
    elif ntype == "text":
        lead, text_md, trail = split_leading_trailing_whitespace(node["text"])
        link = None
        for mark in node.get("marks", []):
            mtype = mark["type"]
            if mtype == "bold":
                text_md = f"**{text_md}**"
            elif mtype == "code":
                text_md = f"`{text_md}`"
            elif mtype == "italic":
                text_md = f"*{text_md}*"
            elif mtype == "link":
                link = mark
            elif mtype == "strike":
                text_md = f"~~{text_md}~~"
            elif mtype == "textHighlight":
                text_md = f"=={text_md}=="
            elif mtype == "underline":
                text_md = f"++{text_md}++"
        if link is not None:
            text_md = make_link(text_md, link["attrs"]["href"])
        note_md.append(lead + text_md + trail)

    for child in node.get("content", []):
        reflect_json_to_markdown(child, note_md, tags, note_links)
    if ntype == "codeBlock":
        note_md.append("\n```\n")
    return note_md, tags, note_links


def synth_reflect(doc_id: int, text: str) -> str:
    doc = {"type": "doc", "content": [
        {"type": "heading", "attrs": {"level": 2},
         "content": [{"type": "text", "text": f"Section {doc_id}"}]},
        {"type": "paragraph", "content": [
            {"type": "text", "text": text},
            {"type": "text", "text": " strong",
             "marks": [{"type": "bold"}]},
            {"type": "text", "text": " site", "marks": [
                {"type": "italic"},
                {"type": "link", "attrs": {"href": f"https://r.io/{doc_id}"}},
            ]},
        ]},
        {"type": "paragraph", "content": [
            {"type": "backlink",
             "attrs": {"label": f"Other {doc_id}", "id": f"rid{doc_id}"}},
            {"type": "text", "text": " and "},
            {"type": "tag",
             "attrs": {"label": f"rt{doc_id % 3}", "id": f"tid{doc_id}"}},
        ]},
        {"type": "list", "attrs": {"kind": "checklist",
                                   "checked": doc_id % 2 == 0},
         "content": [{"type": "text", "text": "task"}]},
        {"type": "paragraph", "content": [{"type": "text", "text": "after"}]},
        {"type": "codeBlock", "attrs": {"language": "py"},
         "content": [{"type": "text", "text": "x = 1"}]},
    ]}
    return json.dumps({
        "export_version": "1.0", "graph_version": 15,
        "notes": [{
            "id": f"r-{doc_id}", "subject": f"Reflect {doc_id}",
            "created_at": "2024-04-01T00:00:00",
            "updated_at": "2024-04-02T00:00:00",
            "document_json": json.dumps(doc),
        }],
    })


def parse_reflect(raw: str) -> list[dict]:
    rows = []
    for note in json.loads(raw).get("notes", []):
        body, tags, links = reflect_json_to_markdown(
            json.loads(note["document_json"]))
        rows.append({
            "note_id": note["id"],
            "title": note["subject"],
            "body": "".join(body),
            "tags": ",".join(tags),
            "note_links": ",".join(links),
        })
    return rows


def reflect_extract(sf_dir: str):
    return _explode(sf_dir, synth_reflect, parse_reflect,
                    ("note_id", "title", "body", "tags", "note_links"))


def sql_reflect_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10)"
    return f"""
SELECT doc_id,
  'r-' || {i} AS note_id,
  'Reflect ' || {i} AS title,
  {nl} || {nl} || '## Section ' || {i} || {nl} || {nl}
    || text || ' **strong**'
    || ' [*site*](https://r.io/' || {i} || ')' || {nl} || {nl}
    || '[Other ' || {i} || '](rid' || {i} || ') and #rt'
    || CAST(doc_id % 3 AS VARCHAR)
    || (CASE WHEN doc_id % 2 = 0 THEN '- [x] ' ELSE '- [ ] ' END)
    || 'task' || {nl} || {nl} || 'after' || {nl} || {nl}
    || '```py' || {nl} || 'x = 1' || {nl} || '```' || {nl} AS body,
  'rt' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  'rid' || {i} AS note_links
FROM documents
"""
