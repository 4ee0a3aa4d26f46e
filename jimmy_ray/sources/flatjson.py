"""Flat-JSON note exports: Simplenote, Drafts, jrnl (S8 long-tail close).

One compact behavior port per converter:

- Simplenote (/root/reference/src/jimmy/formats/simplenote.py:26-65):
  ``activeNotes`` array, first-line titles (``h1=False`` split),
  ``simplenote://`` body links become note links, markdown flag, trash
  skipped (trashedNotes ignored).
- Drafts (formats/drafts.py:61-83): first-line title, languageGrammar
  gate (non-Markdown/Plain Text handled as plain text), flat tag list.
- jrnl (formats/jrnl.py:11-29): ``date time title`` composite titles,
  ``@``-stripped tags, ``jrnl-starred`` pseudo-tag.
"""

from __future__ import annotations

import json

import pyarrow as pa

from jimmy_ray.md.links import get_markdown_links
from jimmy_ray.md.text import split_title_from_body


def _explode(sf_dir: str, synth_fn, parse_fn, columns: tuple[str, ...]):
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

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


# --- Simplenote ------------------------------------------------------------

def synth_simplenote(doc_id: int, text: str) -> str:
    return json.dumps({
        "activeNotes": [{
            "id": f"sn{doc_id}",
            "content": f"Doc {doc_id}\n{text} "
                       f"[prev](simplenote://note/sn{doc_id - 1})",
            "creationDate": "2024-01-01T00:00:00Z",
            "lastModified": "2024-01-02T00:00:00Z",
            "markdown": doc_id % 2 == 0,
        }],
        "trashedNotes": [{"id": "gone", "content": "trash\nx"}],
    })


def parse_simplenote(raw: str) -> list[dict]:
    data = json.loads(raw)
    out = []
    for note in data.get("activeNotes", []):
        title, body = split_title_from_body(note["content"], h1=False)
        internal = [
            lk.url.rsplit("/", 1)[1]
            for lk in get_markdown_links(body)
            if lk.url.startswith("simplenote://")
        ]
        out.append({
            "title": title.strip(),
            "body": body,
            "note_links": ",".join(internal),
            "created": note["creationDate"],
        })
    return out


def simplenote_extract(sf_dir: str):
    return _explode(sf_dir, synth_simplenote, parse_simplenote,
                    ("title", "body", "note_links", "created"))


def sql_simplenote_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, 'Doc ' || {i} AS title,
  text || ' [prev](simplenote://note/sn' || CAST(doc_id - 1 AS VARCHAR)
    || ')' AS body,
  'sn' || CAST(doc_id - 1 AS VARCHAR) AS note_links,
  '2024-01-01T00:00:00Z' AS created
FROM documents
"""


# --- Drafts ----------------------------------------------------------------

def synth_drafts(doc_id: int, text: str) -> str:
    return json.dumps([{
        "uuid": f"d{doc_id:04d}",
        "content": f"Doc {doc_id}\n{text}",
        "languageGrammar": "Markdown" if doc_id % 3 else "Taskpaper",
        "created_at": "2024-01-01T00:00:00Z",
        "modified_at": "2024-01-03T00:00:00Z",
        "tags": [f"dtag{doc_id % 4}"],
    }])


def parse_drafts(raw: str) -> list[dict]:
    out = []
    for draft in json.loads(raw):
        title, body = split_title_from_body(draft["content"], h1=False)
        grammar = draft["languageGrammar"]
        out.append({
            "title": title.strip(),
            "body": draft["content"],  # drafts keeps the full content
            "grammar": grammar if grammar in ("Markdown", "Plain Text")
            else "plain-text-fallback",
            "tags": ",".join(draft.get("tags", [])),
        })
    return out


def drafts_extract(sf_dir: str):
    return _explode(sf_dir, synth_drafts, parse_drafts,
                    ("title", "body", "grammar", "tags"))


def sql_drafts_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, 'Doc ' || {i} AS title,
  'Doc ' || {i} || chr(10) || text AS body,
  CASE WHEN doc_id % 3 = 0 THEN 'plain-text-fallback' ELSE 'Markdown' END
    AS grammar,
  'dtag' || CAST(doc_id % 4 AS VARCHAR) AS tags
FROM documents
"""


# --- jrnl ------------------------------------------------------------------

def synth_jrnl(doc_id: int, text: str) -> str:
    return json.dumps({"entries": [{
        "date": "2024-01-01",
        "time": f"{doc_id % 24:02d}:00",
        "title": f"Entry {doc_id}",
        "body": text,
        "tags": [f"@jt{doc_id % 3}"],
        "starred": doc_id % 5 == 0,
    }]})


def parse_jrnl(raw: str) -> list[dict]:
    out = []
    for entry in json.loads(raw)["entries"]:
        tags = [t.lstrip("@") for t in entry["tags"]]
        if entry["starred"]:
            tags.append("jrnl-starred")
        out.append({
            "title": f"{entry['date']} {entry['time']} {entry['title']}",
            "body": entry["body"],
            "tags": ",".join(tags),
        })
    return out


def jrnl_extract(sf_dir: str):
    return _explode(sf_dir, synth_jrnl, parse_jrnl,
                    ("title", "body", "tags"))


def sql_jrnl_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  '2024-01-01 ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
    || ':00 Entry ' || {i} AS title,
  text AS body,
  'jt' || CAST(doc_id % 3 AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN ',jrnl-starred' ELSE '' END) AS tags
FROM documents
"""
