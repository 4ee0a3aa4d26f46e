"""Signal chat transcript reader (post-sigexport model shape).

Behavior port of /root/reference/src/jimmy/formats/signal.py:21-55.  The
reference drives ``sigexport`` to decrypt the SQLCipher message store —
that decrypt is the env-blocked boundary (no sigexport / SQLCipher in
this environment, like pandoc/one2html).  Everything downstream is real
conversion logic and is ported here over the decoded model shape:

- one note per chat, titled by contact name
- each message renders ``YYYY-MM-DD HH:MM:SS, **sender**:`` then the
  body; quoted messages emit prefix / quote / body as three blocks
- attachments append markdown links (image links by suffix)
- note ``created`` = first message date, ``updated`` = last

The fixture synthesizes decoded chats per document with a SQL mirror.
"""

from __future__ import annotations

import datetime as _dt
import json

import pyarrow as pa

from jimmy_ray.md.links import make_link

EPOCH_S = 1_700_000_000
_IMAGE_SUFFIXES = (".png", ".jpg", ".jpeg", ".gif", ".bmp", ".webp")


def _ts(seconds: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(seconds, _dt.timezone.utc)


def synth_signal_chats(doc_id: int, text: str) -> str:
    base = EPOCH_S + doc_id * 60
    return json.dumps({"chats": {
        f"Contact {doc_id % 7}": [
            {"date_s": base, "sender": "Me", "body": text,
             "quote": "", "attachments": []},
            {"date_s": base + 60, "sender": f"Contact {doc_id % 7}",
             "body": f"reply {doc_id}",
             "quote": f"  {text[:40]}  ", "attachments": []},
            {"date_s": base + 120, "sender": "Me", "body": "see files",
             "quote": "", "attachments": [
                 {"name": f"photo{doc_id}", "path": f"img{doc_id}.png"},
                 {"name": f"doc{doc_id}", "path": f"notes{doc_id}.txt"},
             ]},
        ],
    }})


def render_chat(messages: list[dict]) -> tuple[str, int, int]:
    """signal.py:25-52 → (body, created_s, updated_s)."""
    body: list[str] = []
    created = updated = None
    for message in messages:
        if created is None:
            created = message["date_s"]
        stamp = _ts(message["date_s"]).strftime("%Y-%m-%d %H:%M:%S")
        prefix = f"{stamp}, **{message['sender']}**:"
        if message.get("quote"):
            body.extend([prefix, message["quote"].strip(),
                         message["body"].strip()])
        else:
            body.append(f"{prefix} {message['body']}")
        for att in message.get("attachments", []):
            body.append(make_link(
                att["name"], att["path"],
                is_image=att["path"].lower().endswith(_IMAGE_SUFFIXES),
            ))
        updated = message["date_s"]
    return "\n\n".join(body), created, updated


def parse_signal(raw: str) -> list[dict]:
    rows = []
    for title, messages in json.loads(raw)["chats"].items():
        body, created, updated = render_chat(messages)
        rows.append({"title": title.strip(), "body": body,
                     "created_s": created, "updated_s": updated})
    return rows


def signal_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, created, updated = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_signal(synth_signal_chats(doc_id, text)):
                ids.append(doc_id)
                titles.append(row["title"])
                bodies.append(row["body"])
                created.append(row["created_s"])
                updated.append(row["updated_s"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "created_s": pa.array(created, pa.int64()),
            "updated_s": pa.array(updated, pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_signal_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    base = f"({EPOCH_S} + doc_id * 60)"
    nl = "chr(10) || chr(10)"

    from jimmy_ray.scalars.dates import sql_utc_strftime

    def stamp(expr: str) -> str:
        return sql_utc_strftime(expr, "%Y-%m-%d %H:%M:%S")

    return f"""
SELECT doc_id,
  'Contact ' || CAST(doc_id % 7 AS VARCHAR) AS title,
  {stamp(base)} || ', **Me**: ' || text || {nl}
    || {stamp(f"{base} + 60")} || ', **Contact '
    || CAST(doc_id % 7 AS VARCHAR) || '**:' || {nl}
    || trim(substr(text, 1, 40)) || {nl}
    || 'reply ' || {i} || {nl}
    || {stamp(f"{base} + 120")} || ', **Me**: see files' || {nl}
    || '![photo' || {i} || '](img' || {i} || '.png)' || {nl}
    || '[doc' || {i} || '](notes' || {i} || '.txt)' AS body,
  CAST({base} AS BIGINT) AS created_s,
  CAST({base} + 120 AS BIGINT) AS updated_s
FROM documents
"""
