"""Joplin JEX reader: tar container with id-linked metadata items (S8/J2).

A JEX export is a tar of ``.md`` files, each ``text\\n\\nkey: value``
metadata block; ``type_`` selects note(1)/folder(2)/resource(4)/tag(5)/
note_tag(6).  The reference does three joins over the parsed items
(/root/reference/src/jimmy/formats/joplin.py:100-180): note → parent
folder by ``parent_id``, note ⋈ tags through the ``note_tag`` link
items, and body ``:/<32-hex>`` links classified into note links vs
resources.  This port walks each backup's tar in one map_batches body
and performs the id joins per backup (each fixture backup is
self-contained, mirroring a per-device export shard).
"""

from __future__ import annotations

import io
import tarfile

import pyarrow as pa

from jimmy_ray.md.links import get_markdown_links
from jimmy_ray.md.text import split_title_from_body


def _item(text: str, metadata: dict) -> bytes:
    meta = "\n".join(f"{k}: {v}" for k, v in metadata.items())
    return f"{text}\n\n{meta}".encode("utf-8")


def _hex32(n: int, salt: str = "") -> str:
    import hashlib

    return hashlib.md5(f"{salt}{n}".encode()).hexdigest()


def synth_jex(doc_id: int, text: str) -> bytes:
    note_id = _hex32(doc_id)
    folder_id = _hex32(doc_id % 10, "folder")
    tag_id = _hex32(doc_id % 3, "tag")
    body = f"Doc {doc_id}\n\n{text} see [ref](:/{_hex32(doc_id + 1)})"
    files = {
        f"{note_id}.md": _item(body, {
            "id": note_id, "parent_id": folder_id, "type_": 1,
            "created_time": "2024-01-01T00:00:00Z",
            "updated_time": "2024-01-01T01:00:00Z",
        }),
        f"{folder_id}.md": _item(f"Folder {doc_id % 10}", {
            "id": folder_id, "parent_id": "", "type_": 2,
        }),
        f"{tag_id}.md": _item(f"jtag{doc_id % 3}", {
            "id": tag_id, "type_": 5,
        }),
        f"{_hex32(doc_id, 'nt')}.md": _item("", {
            "id": _hex32(doc_id, "nt"), "note_id": note_id,
            "tag_id": tag_id, "type_": 6,
        }),
    }
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tar.addfile(info, io.BytesIO(files[name]))
    return buf.getvalue()


def _parse_item(raw: str) -> tuple[str, dict]:
    """joplin.py:103-116: text + 'key: value' metadata tail."""
    try:
        text, metadata_raw = raw.rsplit("\n\n", 1)
    except ValueError:
        text, metadata_raw = "", raw
    metadata: dict = {}
    for line in metadata_raw.split("\n"):
        if ": " in line:
            key, value = line.split(": ", 1)
            metadata[key] = value
    return text, metadata


def parse_jex(payload: bytes) -> list[dict]:
    """Item walk + the three id joins (joplin.py:100-180)."""
    notes = []
    folders: dict[str, str] = {}
    tags: dict[str, str] = {}
    note_tags: dict[str, list[str]] = {}
    with tarfile.open(fileobj=io.BytesIO(payload)) as tar:
        for member in sorted(tar.getmembers(), key=lambda m: m.name):
            if not member.name.endswith(".md"):
                continue
            text, meta = _parse_item(
                tar.extractfile(member).read().decode("utf-8")
            )
            type_ = int(meta["type_"])
            if type_ == 1:
                notes.append((text, meta))
            elif type_ == 2:
                folders[meta["id"]] = text.strip()
            elif type_ == 5:
                tags[meta["id"]] = text.strip()
            elif type_ == 6:
                note_tags.setdefault(meta["note_id"], []).append(meta["tag_id"])
    out: list[dict] = []
    for text, meta in notes:
        title, body = split_title_from_body(text, h1=False)
        links = [
            lk for lk in get_markdown_links(body)
            if not (lk.is_web_link or lk.is_mail_link)
        ]
        out.append({
            "title": title.strip(),
            "body": body.strip(),
            "notebook": folders.get(meta.get("parent_id", ""), ""),
            "tags": ",".join(sorted(
                tags[t] for t in note_tags.get(meta["id"], []) if t in tags
            )),
            "n_note_links": len(links),
        })
    return out


def joplin_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "doc_id": [], "title": [], "body": [], "notebook": [],
            "tags": [], "n_note_links": [],
        }
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_jex(synth_jex(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in ("title", "body", "notebook", "tags",
                          "n_note_links"):
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "title": pa.array(cols["title"], pa.string()),
            "body": pa.array(cols["body"], pa.string()),
            "notebook": pa.array(cols["notebook"], pa.string()),
            "tags": pa.array(cols["tags"], pa.string()),
            "n_note_links": pa.array(cols["n_note_links"], pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_joplin_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} AS title,
  text || ' see [ref](:/' || md5(CAST(doc_id + 1 AS VARCHAR)) || ')' AS body,
  'Folder ' || CAST(doc_id % 10 AS VARCHAR) AS notebook,
  'jtag' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  CAST(1 AS BIGINT) AS n_note_links
FROM documents
"""
