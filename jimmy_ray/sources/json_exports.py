"""Format-shaped JSON export readers (SURVEY.md §2.1 S8 long tail).

Three named, oracle-checked explodes over synthesized export JSON, each a
behavior port of a reference converter:

- Google Keep (formats/google_keep.py:17-92): title/labels/pinned tags,
  textContent | listContent task lists, annotations section, archive/
  trash routing, usec timestamps.
- Telegram (formats/telegram.py:11-55): chat → one note, message lines
  ``ts, **from**: text``, file attachments as image links, service
  messages skipped, updated = last message time.
- Day One (formats/day_one.py:113-168): entry → note titled by creation
  date, backslash/zero-width-space scrubbing, tags + starred/pinned
  pseudo-tags, ISO timestamps.

Fixture JSON derives deterministically from ``documents`` and every
derived value has a DuckDB SQL mirror, so the driver oracle recomputes
golden rows independently.  Parsing is per-row json.loads inside
map_batches — the same flat-map shape as the reference's per-file loops,
but embarrassingly parallel across blocks.
"""

from __future__ import annotations

import datetime as _dt
import json

import pyarrow as pa

KEEP_EPOCH_US = 1_700_000_000_000_000
TG_EPOCH_S = 1_700_000_000
DAYONE_EPOCH_S = 1_700_000_000


def _utc(ts_s: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(ts_s, _dt.timezone.utc)


# --- Google Keep -----------------------------------------------------------

def synth_keep_json(doc_id: int, text: str) -> str:
    note: dict = {
        "title": f"Doc {doc_id}",
        "color": "RED" if doc_id % 2 else "DEFAULT",
        "labels": [{"name": f"l{doc_id % 5}"}, {"name": "common"}],
        "isPinned": doc_id % 3 == 0,
        "createdTimestampUsec": KEEP_EPOCH_US + doc_id * 1_000_000,
        "isArchived": doc_id % 10 == 0,
        "isTrashed": doc_id % 10 == 1,
    }
    if doc_id % 4 == 0:
        note["listContent"] = [
            {"text": f"task {doc_id} a", "isChecked": doc_id % 2 == 0},
            {"text": f"task {doc_id} b", "isChecked": False},
        ]
    else:
        note["textContent"] = text
    if doc_id % 5 == 0:
        note["annotations"] = [
            {"url": f"https://a.test/{doc_id}", "title": f"ann {doc_id}"}
        ]
    return json.dumps(note)


def parse_keep_note(raw: str) -> dict:
    """google_keep.py:17-92 semantics on one export JSON."""
    note = json.loads(raw)
    tags = [lb["name"] for lb in note.get("labels", []) if "name" in lb]
    if note.get("isPinned"):
        tags.append("google-keep-pinned")
    if "textContent" in note:
        body = note["textContent"]
    elif (items := note.get("listContent")) is not None:
        body = "\n".join(
            ("- [x] " if it["isChecked"] else "- [ ] ") + it["text"]
            for it in items
        )
    else:
        body = ""
    if (annotations := note.get("annotations")) is not None:
        lines = ["", "", "## Annotations", ""]
        lines += [f"- <{a['url']}>: {a['title']}" for a in annotations]
        lines.append("")
        body += "\n".join(lines)
    if note.get("isArchived"):
        notebook = "archive"
    elif note.get("isTrashed"):
        notebook = "trash"
    else:
        notebook = "root"
    created_us = note.get("createdTimestampUsec")
    return {
        "title": note.get("title", ""),
        "body": body,
        "tags": ",".join(tags),
        "notebook": notebook,
        "created_ms": None if created_us is None else created_us // 1000,
    }


def google_keep_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [
            parse_keep_note(synth_keep_json(i, t))
            for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "tags": pa.array([r["tags"] for r in rows], pa.string()),
            "notebook": pa.array([r["notebook"] for r in rows], pa.string()),
            "created_ms": pa.array([r["created_ms"] for r in rows], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_google_keep_extract() -> str:
    ann = (
        "chr(10) || chr(10) || '## Annotations' || chr(10) || chr(10) || "
        "'- <https://a.test/' || CAST(doc_id AS VARCHAR) || '>: ann ' || "
        "CAST(doc_id AS VARCHAR) || chr(10)"
    )
    tasks = (
        "(CASE WHEN doc_id % 2 = 0 THEN '- [x] ' ELSE '- [ ] ' END) || "
        "'task ' || CAST(doc_id AS VARCHAR) || ' a' || chr(10) || "
        "'- [ ] task ' || CAST(doc_id AS VARCHAR) || ' b'"
    )
    return f"""
SELECT doc_id,
  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
  (CASE WHEN doc_id % 4 = 0 THEN {tasks} ELSE text END)
    || (CASE WHEN doc_id % 5 = 0 THEN {ann} ELSE '' END) AS body,
  'l' || CAST(doc_id % 5 AS VARCHAR) || ',common'
    || (CASE WHEN doc_id % 3 = 0 THEN ',google-keep-pinned' ELSE '' END) AS tags,
  (CASE WHEN doc_id % 10 = 0 THEN 'archive'
        WHEN doc_id % 10 = 1 THEN 'trash' ELSE 'root' END) AS notebook,
  CAST({KEEP_EPOCH_US // 1000} + doc_id * 1000 AS BIGINT) AS created_ms
FROM documents
"""


# --- Telegram --------------------------------------------------------------

def synth_telegram_json(doc_id: int, text: str) -> str:
    messages: list[dict] = [
        {"type": "service", "action": "create_group",
         "date_unixtime": str(TG_EPOCH_S + doc_id * 60)}
    ]
    for j in range(1 + doc_id % 3):
        messages.append({
            "type": "message",
            "date_unixtime": str(TG_EPOCH_S + doc_id * 60 + j + 1),
            "from": f"user{j % 2}",
            "text": f"msg {doc_id} {j}: {text}",
        })
    if doc_id % 4 == 0:
        messages.append({
            "type": "message",
            "date_unixtime": str(TG_EPOCH_S + doc_id * 60 + 59),
            "from": "user0",
            "text": "",
            "file": f"files/f{doc_id}.jpg",
            "file_name": f"f{doc_id}.jpg",
        })
    return json.dumps({"name": f"Chat {doc_id}", "id": doc_id,
                       "messages": messages})


def parse_telegram_chat(raw: str) -> dict:
    """telegram.py:11-55 semantics on one chat JSON."""
    from jimmy_ray.md.links import make_link

    chat = json.loads(raw)
    lines: list[str] = []
    updated_s = None
    n = 0
    for message in chat["messages"]:
        if message["type"] != "message":
            continue
        n += 1
        content = message.get("text", "")
        if (file_ := message.get("file")) is not None:
            if content:
                content += "\n"
            content += make_link(message.get("file_name", ""), f"tg/{file_}",
                                 is_image=True)
        ts = int(message["date_unixtime"])
        updated_s = ts
        stamp = _utc(ts).strftime("%Y-%m-%d %H:%M:%S")
        lines.append(f"{stamp}, **{message['from']}**: {content}")
    return {
        "title": chat["name"],
        "body": "\n\n".join(lines),
        "updated_ms": None if updated_s is None else updated_s * 1000,
        "n_messages": n,
    }


def parse_telegram_export(raw: str) -> list[dict]:
    """A real ``result.json``: a complete DataExport carries a ``chats``
    key with a chat list, a single ChatExport is the chat itself
    (telegram.py:47-55)."""
    export = json.loads(raw)
    if (chats := export.get("chats")) is not None:
        return [parse_telegram_chat(json.dumps(c)) for c in chats["list"]]
    return [parse_telegram_chat(raw)]


def telegram_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [
            parse_telegram_chat(synth_telegram_json(i, t))
            for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "updated_ms": pa.array([r["updated_ms"] for r in rows], pa.int64()),
            "n_messages": pa.array([r["n_messages"] for r in rows], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_telegram_extract() -> str:
    from jimmy_ray.scalars.dates import sql_utc_strftime

    msg_stamp = sql_utc_strftime(f"{TG_EPOCH_S} + doc_id * 60 + j + 1",
                                 "%Y-%m-%d %H:%M:%S")
    file_stamp = sql_utc_strftime(f"{TG_EPOCH_S} + doc_id * 60 + 59",
                                  "%Y-%m-%d %H:%M:%S")
    line = (
        f"{msg_stamp} || ', **user' || "
        "CAST(j % 2 AS VARCHAR) || '**: msg ' || CAST(doc_id AS VARCHAR) || "
        "' ' || CAST(j AS VARCHAR) || ': ' || text"
    )
    file_line = (
        f"{file_stamp} || "
        "', **user0**: ![f' || CAST(doc_id AS VARCHAR) || '.jpg](tg/files/f' "
        "|| CAST(doc_id AS VARCHAR) || '.jpg)'"
    )
    return f"""
WITH msgs AS (
  SELECT doc_id, j, {line} AS line
  FROM documents, (VALUES (0), (1), (2)) AS t(j)
  WHERE j <= doc_id % 3
),
bodies AS (
  SELECT doc_id, string_agg(line, chr(10) || chr(10) ORDER BY j) AS chat_body,
         CAST(COUNT(*) AS BIGINT) AS n_chat
  FROM msgs GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
  'Chat ' || CAST(d.doc_id AS VARCHAR) AS title,
  b.chat_body || (CASE WHEN d.doc_id % 4 = 0
                       THEN chr(10) || chr(10) || {file_line} ELSE '' END) AS body,
  CAST((CASE WHEN d.doc_id % 4 = 0 THEN {TG_EPOCH_S} + d.doc_id * 60 + 59
        ELSE {TG_EPOCH_S} + d.doc_id * 60 + (d.doc_id % 3) + 1 END) * 1000
       AS BIGINT) AS updated_ms,
  CAST(b.n_chat + (CASE WHEN d.doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_messages
FROM documents d JOIN bodies b USING (doc_id)
"""


# --- Day One ---------------------------------------------------------------

def synth_dayone_entry(doc_id: int, text: str) -> str:
    created = _utc(DAYONE_EPOCH_S + doc_id * 86_400)
    modified = _utc(DAYONE_EPOCH_S + doc_id * 86_400 + 3600)
    entry = {
        "creationDate": created.strftime("%Y-%m-%dT%H:%M:%SZ"),
        "modifiedDate": modified.strftime("%Y-%m-%dT%H:%M:%SZ"),
        "uuid": f"{doc_id:032x}",
        "text": text + "\\zw\u200b",  # scrubbing branches (day_one.py:128-131)
        "tags": [f"t{doc_id % 3}"],
        "starred": doc_id % 5 == 0,
        "pinned": doc_id % 7 == 0,
    }
    return json.dumps(entry)


def parse_dayone_entry(raw: str, seen_titles: set[str] | None = None) -> dict:
    """day_one.py:113-168 semantics on one journal entry."""
    entry = json.loads(raw)
    created = _dt.datetime.strptime(
        entry["creationDate"], "%Y-%m-%dT%H:%M:%SZ"
    ).replace(tzinfo=_dt.timezone.utc)
    modified = _dt.datetime.strptime(
        entry["modifiedDate"], "%Y-%m-%dT%H:%M:%SZ"
    ).replace(tzinfo=_dt.timezone.utc)
    title = created.strftime("%Y-%m-%d")
    if seen_titles is not None:
        base = title
        idx = 1
        while title in seen_titles:
            title = f"{base}-{idx:04}"
            idx += 1
        seen_titles.add(title)
    body = entry.get("text", "").replace("\\", "").replace("\u200b", "")
    tags = [str(t) for t in entry.get("tags", [])]
    if entry.get("starred"):
        tags.append("day-one-starred")
    if entry.get("pinned"):
        tags.append("day-one-pinned")
    return {
        "title": title,
        "body": body,
        "tags": ",".join(tags),
        "created_ms": int(created.timestamp()) * 1000,
        "updated_ms": int(modified.timestamp()) * 1000,
    }


def dayone_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [
            parse_dayone_entry(synth_dayone_entry(i, t))
            for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "tags": pa.array([r["tags"] for r in rows], pa.string()),
            "created_ms": pa.array([r["created_ms"] for r in rows], pa.int64()),
            "updated_ms": pa.array([r["updated_ms"] for r in rows], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_dayone_extract() -> str:
    from jimmy_ray.scalars.dates import sql_utc_strftime

    created = f"({DAYONE_EPOCH_S} + doc_id * 86400)"
    return f"""
SELECT doc_id,
  {sql_utc_strftime(created, "%Y-%m-%d")} AS title,
  text || 'zw' AS body,
  't' || CAST(doc_id % 3 AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN ',day-one-starred' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ',day-one-pinned' ELSE '' END) AS tags,
  CAST({created} * 1000 AS BIGINT) AS created_ms,
  CAST(({created} + 3600) * 1000 AS BIGINT) AS updated_ms
FROM documents
"""
