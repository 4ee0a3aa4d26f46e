"""Anki collection reader: multi-table SQLite + field-separated notes (S7).

The reference opens ``collection.anki2``, reads models/decks JSON out of
the ``col`` row, builds the cards' note→deck map, then walks ``notes``
splitting the ``flds`` blob on ``\\x1f`` into model-named fields and
renders ``- name: value`` lines with an HTML-remnant cleanup
(/root/reference/src/jimmy/formats/anki.py:36-157).

Ray-shaped like the S7 pattern: the driver reads the (unshardable)
sqlite file into Arrow once; the per-note conversion — field split,
template naming, cleanup, tag split, deck join — runs distributed.  The
fixture derives from ``documents`` with a DuckDB SQL mirror and, since
round 4, ships as a real ``.apkg`` zip (collection.anki2 + ``media``
map) that the reader unpacks first, preferring ``collection.anki21``
like the reference (anki.py:108-112).
"""

from __future__ import annotations

import json
import os
import sqlite3

import pandas as pd
import pyarrow as pa

FIELD_SEP = "\x1f"
MODEL_ID = "1000"
FIELD_NAMES = ("Front", "Back")


def _fixture_db(sf_dir: str) -> str:
    import pyarrow.parquet as pq

    from jimmy_ray.sources.fixturecache import cache_path

    db = cache_path(sf_dir, "jimmy_ray_anki", ".anki2")
    if os.path.exists(db):
        return db
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tmp = db + f".tmp.{os.getpid()}"
    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE col (ver INTEGER, models TEXT, decks TEXT)")
    models = {MODEL_ID: {"flds": [{"name": n} for n in FIELD_NAMES]}}
    decks = {str(100 + d): {"name": f"deck {d}"} for d in range(5)}
    con.execute("INSERT INTO col VALUES (?, ?, ?)",
                (11, json.dumps(models), json.dumps(decks)))
    con.execute("CREATE TABLE cards (nid INTEGER, did INTEGER)")
    con.execute("CREATE TABLE notes (id INTEGER, guid TEXT, mid INTEGER, "
                "mod INTEGER, tags TEXT, flds TEXT)")
    for doc_id, text in zip(docs["doc_id"].to_pylist(),
                            docs["text"].to_pylist()):
        con.execute("INSERT INTO cards VALUES (?, ?)",
                    (doc_id, 100 + doc_id % 5))
        flds = FIELD_SEP.join([
            f"front {doc_id}<br>\n&nbsp;<div>x</div>",  # cleanup branches
            text,
        ])
        con.execute(
            "INSERT INTO notes VALUES (?, ?, ?, ?, ?, ?)",
            (doc_id, f"g{doc_id}", int(MODEL_ID), 0,
             f" t{doc_id % 3} shared ", flds),
        )
    con.commit()
    con.close()
    os.replace(tmp, db)
    return db


def _cleanup(body: str) -> str:
    """anki.py:141-147 HTML-remnant scrub."""
    return (
        body.replace("<br>\n", "\n").replace("&nbsp;", " ")
        .replace("<div>", "").replace("</div>", "")
    )


def _fixture_apkg(sf_dir: str) -> str:
    """Wrap the fixture collection in the real .apkg layout: a zip with
    collection.anki2 and the media-number map (anki.py:108-122's input
    shape)."""
    import zipfile

    from jimmy_ray.sources.fixturecache import cache_path

    apkg = cache_path(sf_dir, "jimmy_ray_anki", ".apkg")
    if os.path.exists(apkg):
        return apkg
    db = _fixture_db(sf_dir)
    tmp = apkg + f".tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w") as zf:
        zf.write(db, "collection.anki2")
        zf.writestr("media", json.dumps({}))
    os.replace(tmp, apkg)
    return apkg


def open_apkg_collection(apkg_path: str) -> str:
    """Extract the collection database from a .apkg zip to a scratch
    path, preferring collection.anki21 (anki.py:108-112)."""
    import tempfile
    import zipfile

    with zipfile.ZipFile(apkg_path) as zf:
        names = zf.namelist()
        for candidate in ("collection.anki21", "collection.anki2"):
            if candidate in names:
                fd, out = tempfile.mkstemp(suffix=".anki2",
                                           prefix="jimmy_ray_apkg_")
                with os.fdopen(fd, "wb") as fh:
                    fh.write(zf.read(candidate))
                return out
    raise ValueError("no collection database inside .apkg")


def _load_collection(db_path: str):
    """col/cards/notes walk shared by the Ray path and parse_apkg."""
    con = sqlite3.connect(db_path)
    try:
        ver, models_json, decks_json = con.execute(
            "SELECT ver, models, decks FROM col"
        ).fetchone()
        if ver != 11:
            raise ValueError(f"untested collection version {ver}")
        models = json.loads(models_json)
        decks = json.loads(decks_json)
        note_deck = dict(con.execute("SELECT nid, did FROM cards"))
        rows = con.execute(
            "SELECT id, mid, tags, flds FROM notes ORDER BY id"
        ).fetchall()
    finally:
        con.close()
    return models, decks, note_deck, rows


def convert_note(note_index: int, note_id: int, mid: str, tags: str,
                 flds: str, models: dict, decks: dict,
                 note_deck: dict) -> dict:
    """One note's conversion (anki.py:125-157 semantics)."""
    field_names = [f["name"] for f in models[mid]["flds"]]
    values = flds.split(FIELD_SEP)
    body = "\n".join(
        f"- {k}: {v}" for k, v in zip(field_names, values, strict=True))
    return {
        "doc_id": note_id,
        "title": f"note_{note_index:010}",
        "body": _cleanup(body),
        "deck": decks[str(note_deck[note_id])]["name"],
        "tags": ",".join(t for t in tags.strip().split(" ") if t),
    }


def parse_apkg(apkg_path: str) -> list[dict]:
    """Serial kernel over one real .apkg (tests / small containers)."""
    db = open_apkg_collection(apkg_path)
    try:
        models, decks, note_deck, rows = _load_collection(db)
    finally:
        os.unlink(db)
    return [
        convert_note(i, nid, str(mid), tags, flds, models, decks,
                     note_deck)
        for i, (nid, mid, tags, flds) in enumerate(rows)
    ]


def anki_extract(sf_dir: str):
    """.apkg container -> collection db -> distributed conversion."""
    import ray.data as rd

    db = open_apkg_collection(_fixture_apkg(sf_dir))
    try:
        models, decks, note_deck, rows = _load_collection(db)
    finally:
        os.unlink(db)  # the scratch copy extracted from the .apkg

    table = pa.table({
        "note_index": pa.array(range(len(rows)), pa.int64()),
        "note_id": pa.array([r[0] for r in rows], pa.int64()),
        "mid": pa.array([str(r[1]) for r in rows], pa.string()),
        "tags": pa.array([r[2] for r in rows], pa.string()),
        "flds": pa.array([r[3] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(table)

    def convert(batch: pd.DataFrame) -> pd.DataFrame:
        out = [
            convert_note(int(row["note_index"]), int(row["note_id"]),
                         row["mid"], row["tags"], row["flds"],
                         models, decks, note_deck)
            for _, row in batch.iterrows()
        ]
        return pd.DataFrame({
            "doc_id": pd.Series([r["doc_id"] for r in out], dtype="int64"),
            "title": [r["title"] for r in out],
            "body": [r["body"] for r in out],
            "deck": [r["deck"] for r in out],
            "tags": [r["tags"] for r in out],
        })

    return ds.map_batches(convert, batch_format="pandas", batch_size=512)


def sql_anki_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'note_' || lpad(CAST(row_number() OVER (ORDER BY doc_id) - 1 AS VARCHAR),
                  10, '0') AS title,
  '- Front: front ' || {i} || chr(10) || ' x' || chr(10)
    || '- Back: ' || text AS body,
  'deck ' || CAST(doc_id % 5 AS VARCHAR) AS deck,
  't' || CAST(doc_id % 3 AS VARCHAR) || ',shared' AS tags
FROM documents
"""
