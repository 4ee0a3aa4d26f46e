"""ColorNote backup reader: encrypted length-prefixed chunk stream (S10).

The reference's most binary source (/root/reference/src/jimmy/formats/
colornote.py:56-163): a 28-byte plain metadata header, AES-CBC body with
the fixed salt ``ColorNote Fixed Salt`` and the md5 KDF, then — after
seeking to the first ``{"_id":`` — a walk of ``[4-byte BE length][json]``
chunks.  Per note: settings titles and empty notes are skipped, calendar
notes (folder_id 16) are re-titled from ``reminder_base``, checklist
bodies convert via ``colornote_to_md``, and folder_id/active_state/space
route to root/calendar/trash/archive.

This reader uses the repo's real AES (jimmy_ray.scalars.crypto) for both
the fixture encryption and the decode path, so the oracle proves header
framing + crypto + chunk walk + conversion end-to-end.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct

import pyarrow as pa

from jimmy_ray.md.wikitext import colornote_to_md
from jimmy_ray.scalars import crypto

FIXED_SALT = b"ColorNote Fixed Salt"
PASSWORD = "0000"  # the reference's default (colornote.py:128-129)
_ID_MARKER = b'{"_id":'
EPOCH_MS = 1_700_000_000_000


def _chunk(payload: dict) -> bytes:
    data = json.dumps(payload).encode("utf-8")
    return struct.pack(">L", len(data)) + data


def _note_json(doc_id: int, text: str) -> dict:
    return {
        "_id": doc_id,
        "title": f"Doc {doc_id}",
        "note": f"[V] done {doc_id}\n[ ] {text}",
        "created_date": EPOCH_MS + doc_id * 1000,
        "modified_date": EPOCH_MS + doc_id * 1000 + 500,
        "color_index": doc_id % 9,
        "folder_id": 16 if doc_id % 4 == 0 else 0,
        "active_state": 16 if doc_id % 10 == 1 else 0,
        "space": 16 if doc_id % 10 == 0 else 0,
        "reminder_base": EPOCH_MS + doc_id * 86_400_000,
    }


def synth_backup(doc_id: int, text: str) -> bytes:
    """One encrypted backup per document (pre-note junk + note chunk +
    skipped settings/empty chunks when applicable)."""
    chunks = [b"\x00" * 12, _chunk(_note_json(doc_id, text))]
    if doc_id % 5 == 0:
        chunks.append(_chunk({"_id": -1, "title": "syncable_settings",
                              "note": "{}", "folder_id": 0,
                              "active_state": 0, "space": 0}))
        chunks.append(_chunk({"_id": -2, "title": "", "note": "",
                              "folder_id": 0, "active_state": 0,
                              "space": 0}))
    plaintext = b"".join(chunks)
    header = b"NOTE\x00\x00\x00\x00" + struct.pack(
        ">LLQL", 1, 2, EPOCH_MS, 1
    )
    body = crypto.colornote_encrypt(FIXED_SALT, PASSWORD, plaintext)
    return header + body


def parse_backup(payload: bytes, password: str = PASSWORD) -> list[dict]:
    """colornote.py:126-163 semantics on one backup."""
    major, minor, _ts, _n = struct.unpack(">LLQL", payload[8:28])
    if (major, minor) != (1, 2):
        raise ValueError(f"unexpected backup version {major}.{minor}")
    plaintext = crypto.colornote_decrypt(FIXED_SALT, password, payload[28:])
    first = plaintext.find(_ID_MARKER)
    if first == -1:
        raise ValueError("no note chunk found")
    pos = first - 4
    out: list[dict] = []
    while pos + 4 <= len(plaintext):
        (length,) = struct.unpack(">L", plaintext[pos : pos + 4])
        note = json.loads(plaintext[pos + 4 : pos + 4 + length].decode())
        pos += 4 + length
        title = note["title"]
        if title in ("name_master_password", "syncable_settings"):
            continue
        if title == "" and note.get("note", "") == "":
            continue
        if note["folder_id"] == 16:
            title = _dt.datetime.fromtimestamp(
                note["reminder_base"] / 1000, _dt.timezone.utc
            ).strftime("%Y-%m-%d")
        # routing: folder_id, then active_state, then space — each match
        # overwrites the previous (colornote.py:103-124 sequence)
        notebook = "root"
        if note["folder_id"] == 16:
            notebook = "calendar"
        if note["active_state"] == 16:
            notebook = "trash"
        if note["space"] == 16:
            notebook = "archive"
        out.append({
            "title": title,
            "body": colornote_to_md(note["note"]),
            "notebook": notebook,
            "created_ms": note["created_date"],
        })
    return out


def colornote_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, notebooks, created = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_backup(synth_backup(doc_id, text)):
                ids.append(doc_id)
                titles.append(row["title"])
                bodies.append(row["body"])
                notebooks.append(row["notebook"])
                created.append(row["created_ms"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "notebook": pa.array(notebooks, pa.string()),
            "created_ms": pa.array(created, pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_colornote_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    from jimmy_ray.scalars.dates import sql_utc_strftime

    cal_title = sql_utc_strftime(
        f"({EPOCH_MS} + doc_id * 86400000) // 1000", "%Y-%m-%d")
    return f"""
SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN {cal_title} ELSE 'Doc ' || {i} END AS title,
  '- [x] done ' || {i} || chr(10) || '- [ ] ' || text AS body,
  CASE WHEN doc_id % 10 = 0 THEN 'archive'
       WHEN doc_id % 10 = 1 THEN 'trash'
       WHEN doc_id % 4 = 0 THEN 'calendar'
       ELSE 'root' END AS notebook,
  CAST({EPOCH_MS} + doc_id * 1000 AS BIGINT) AS created_ms
FROM documents
"""
