"""UpNote backup reader: gzipped JSONL two-pass parse (S8).

The reference reads a ``.upnx`` backup — gzip of a ``version:2`` header
line plus one JSON record per line — in two passes: first collect
files (id ``__`` → ``.``), notebooks, note→notebook maps (``lists`` with
JSON-encoded id arrays, ``organizers``), tags; then emit notes resolved
against those maps (/root/reference/src/jimmy/formats/upnote.py:104-180).

Ray-shaped: each row carries one backup's gzip bytes; a map_batches body
does the real gzip decode + JSONL walk per backup (1:N explode).  The
fixture synthesizes one backup per document (both the ``organizers`` and
the ``lists`` mapping paths, alternating by parity) with a DuckDB SQL
mirror.
"""

from __future__ import annotations

import gzip
import json

import pyarrow as pa


def synth_upnx(doc_id: int, text: str) -> bytes:
    nb_id = f"nb{doc_id % 10}"
    note_id = f"n{doc_id}"
    lines = [
        "version:2",
        json.dumps({"type": "files", "data": {
            "id": f"f{doc_id}__png", "name": f"pic {doc_id}.png"}}),
        json.dumps({"type": "notebooks", "data": {
            "id": nb_id, "title": f"Book {doc_id % 10}", "parent": "",
            "createdAt": 0, "updatedAt": 0}}),
        json.dumps({"type": "notes", "data": {
            "id": note_id, "title": f"Doc {doc_id}", "text": text,
            "file": f"f{doc_id}__png"}}),
    ]
    if doc_id % 2 == 0:
        lines.append(json.dumps({"type": "organizers", "data": {
            "noteId": note_id, "notebookId": nb_id}}))
    else:
        lines.append(json.dumps({"type": "lists", "data": {
            "id": f"notebooks_{nb_id}",
            "content": json.dumps([note_id])}}))
    lines.append(json.dumps({"type": "filters", "data": {}}))  # skipped
    return gzip.compress("\n".join(lines).encode("utf-8"))


def parse_upnx(payload: bytes) -> list[dict]:
    """upnote.py:104-180 semantics on one backup."""
    lines = gzip.decompress(payload).decode("utf-8").split("\n")
    if lines[0] != "version:2":
        raise ValueError(f"unsupported version {lines[0]!r}")
    records = [json.loads(line) for line in lines[1:] if line]

    file_name: dict[str, str] = {}
    notebook_title: dict[str, str] = {}
    note_to_notebook: dict[str, str] = {}
    for rec in records:  # pass 1: maps
        data = rec["data"]
        if rec["type"] == "files":
            file_name[data["id"].replace("__", ".")] = data["name"]
        elif rec["type"] == "notebooks":
            notebook_title[data["id"]] = data["title"]
        elif rec["type"] == "lists":
            if (id_ := data["id"]).startswith("notebooks_"):
                nb = id_[len("notebooks_"):]
                for note_id in json.loads(data["content"]):
                    note_to_notebook[note_id] = nb
        elif rec["type"] == "organizers":
            note_to_notebook[data["noteId"]] = data["notebookId"]

    out: list[dict] = []
    for rec in records:  # pass 2: notes resolved against the maps
        if rec["type"] != "notes":
            continue
        data = rec["data"]
        nb_id = note_to_notebook.get(data["id"], "")
        file_ref = data.get("file", "").replace("__", ".")
        out.append({
            "title": data.get("title", ""),
            "body": data.get("text", ""),
            "notebook": notebook_title.get(nb_id, ""),
            "file_name": file_name.get(file_ref, ""),
        })
    return out


def upnote_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, notebooks, files = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_upnx(synth_upnx(doc_id, text)):
                ids.append(doc_id)
                titles.append(row["title"])
                bodies.append(row["body"])
                notebooks.append(row["notebook"])
                files.append(row["file_name"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "notebook": pa.array(notebooks, pa.string()),
            "file_name": pa.array(files, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_upnote_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} AS title,
  text AS body,
  'Book ' || CAST(doc_id % 10 AS VARCHAR) AS notebook,
  'pic ' || {i} || '.png' AS file_name
FROM documents
"""
