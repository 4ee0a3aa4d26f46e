"""Signal chat transcript reader over a real SQLCipher message store.

Behavior port of /root/reference/src/jimmy/formats/signal.py:21-55.  The
reference drives ``sigexport`` to open Signal Desktop's SQLCipher
message database; since round 4 the store decrypt itself is REAL here —
``jimmy_ray.scalars.sqlcipher`` implements the published SQLCipher v4
page format (PBKDF2-HMAC-SHA512 → AES-256-CBC per page + per-page
HMAC), so the fixture is an actual encrypted SQLite database and the
pipeline runs decrypt → sqlite parse → chat render end-to-end.  The
remaining boundary is only sigexport's key retrieval from the OS
keyring/Signal config (environment-specific secrets, not a format).

Conversion semantics (signal.py:25-52):
- one note per chat, titled by contact name
- each message renders ``YYYY-MM-DD HH:MM:SS, **sender**:`` then the
  body; quoted messages emit prefix / quote / body as three blocks
- attachments append markdown links (image links by suffix)
- note ``created`` = first message date, ``updated`` = last

The fixture synthesizes per-document encrypted stores with a SQL
mirror (the rendered output is layout-independent, so the mirror is
unchanged by the encryption layer).
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


# --- encrypted store layer (real SQLCipher, scalars/sqlcipher.py) ----------

STORE_PASSWORD = "signal-store-key"
STORE_SALT = bytes.fromhex("aa1f0e4c52e60b1d3c5a49d7fb28c693")
_FIXTURE_KDF_ITER = 256  # v4 default is 256 000; fixtures keep KDF cheap


def _store_plain(doc_id: int, text: str) -> bytes:
    """The plaintext message store: one ``messages(chat TEXT, data
    TEXT)`` row per chat, data = the decoded message list JSON."""
    from jimmy_ray.scalars import sqlcipher

    chats = json.loads(synth_signal_chats(doc_id, text))["chats"]
    rows = [[name, json.dumps(messages)] for name, messages in chats.items()]
    return sqlcipher.build_minidb("messages", ["chat TEXT", "data TEXT"],
                                  rows)


def synth_signal_store(doc_id: int, text: str) -> bytes:
    """A SQLCipher-encrypted SQLite database shaped like a message
    store (one store key, the real Signal Desktop layout)."""
    from jimmy_ray.scalars import sqlcipher

    return sqlcipher.encrypt_database(_store_plain(doc_id, text),
                                      STORE_PASSWORD, STORE_SALT,
                                      kdf_iter=_FIXTURE_KDF_ITER)


def parse_signal_store(payload: bytes, password: str = STORE_PASSWORD,
                       kdf_iter: int = _FIXTURE_KDF_ITER) -> list[dict]:
    """Decrypt the SQLCipher store, read the messages table through
    stock sqlite3, render each chat (the sigexport → model step, minus
    the OS-keyring key retrieval)."""
    import sqlite3

    from jimmy_ray.scalars import sqlcipher

    plain = sqlcipher.decrypt_database(payload, password, kdf_iter)
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(plain)
        chats = con.execute(
            "SELECT chat, data FROM messages ORDER BY rowid").fetchall()
    finally:
        con.close()
    rows = []
    for title, data in chats:
        body, created, updated = render_chat(json.loads(data))
        rows.append({"title": title.strip(), "body": body,
                     "created_s": created, "updated_s": updated})
    return rows


def signal_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        from jimmy_ray.scalars import sqlcipher

        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        # encrypt the whole batch's stores in one vectorized AES pass
        # (CBC chains per page; pages across docs run in lockstep)
        stores = sqlcipher.encrypt_databases(
            [_store_plain(d, t) for d, t in zip(doc_ids, texts)],
            STORE_PASSWORD, STORE_SALT, kdf_iter=_FIXTURE_KDF_ITER)
        ids, titles, bodies, created, updated = [], [], [], [], []
        for doc_id, payload in zip(doc_ids, stores):
            for row in parse_signal_store(payload):
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
