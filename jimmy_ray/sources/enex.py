"""ENEX rich-content extraction as an oracle-checked pipeline (M4).

Synthesizes one Evernote-style ``en-note`` per document exercising the
full state machine (heading, formatting stack, task-list items, table,
link, en-media resource, inline AES en-crypt), runs it through
jimmy_ray.md.enex.EnexMarkdownBuilder, and mirrors the golden markdown in
DuckDB SQL — including the *decrypted* secret line, so the oracle proves
the AES path end-to-end (container handling: S6 in
jimmy_ray.sources.xmlnotes; state machine port of
/root/reference/src/jimmy/md_lib/evernote.py:52-491).
"""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa

from jimmy_ray.md.enex import enex_body_to_md
from jimmy_ray.scalars import crypto

PASSWORD = "fixture-password"

# Golden markdown template ({id} = doc_id, {md5} = md5(doc_id string));
# sql_enex_extract() is generated from the same string so the two sides
# cannot drift.
ENEX_GOLDEN_TEMPLATE = (
    "# Doc {id}\n\n"
    "intro {id} with **bold**\n\n"
    "- item A\n"
    "- [x] done {id}\n\n"
    "| k | v |\n"
    "| --- | --- |\n"
    "| id | {id} |\n\n"
    "[note {id}](https://e.test/{id})\n\n"
    "![]({md5})\n\n"
    "secret {id}"
)


def render_enex_note(doc_id: int) -> str:
    i = doc_id
    media_hash = hashlib.md5(str(i).encode()).hexdigest()
    payload = base64.b64encode(
        crypto.evernote_encrypt(PASSWORD, f"<div>secret {i}</div>".encode(), i)
    ).decode()
    return (
        "<en-note>"
        f"<h1>Doc {i}</h1>"
        f"<p>intro {i} with <b>bold</b></p>"
        f'<ul><li>item A</li><li style="--en-checked:true;">done {i}</li></ul>'
        "<table><tr><th>k</th><th>v</th></tr>"
        f"<tr><td>id</td><td>{i}</td></tr></table>"
        f'<p><a href="https://e.test/{i}">note {i}</a></p>'
        f'<p><en-media hash="{media_hash}" type="image/png"/></p>'
        f'<en-crypt cipher="AES" length="128">{payload}</en-crypt>'
        "</en-note>"
    )


def parse_enex_export(payload: bytes,
                      password: str | None = None) -> list[dict]:
    """Walk a real ``.enex`` export container (the reference's iterparse
    shape, evernote.py:194-215): one row per ``<note>`` with title, tags,
    created/updated stamps, the ``en-note`` CDATA converted to markdown
    via the state machine, the en-media hashes the body references, and
    the md5 of each declared ``<resource>`` payload (which en-media
    ``hash`` attributes point at, evernote.py:60-90)."""
    import io
    import xml.etree.ElementTree as ET

    rows: list[dict] = []
    for _event, elem in ET.iterparse(io.BytesIO(payload), events=("end",)):
        if elem.tag != "note":
            continue
        res_md5: list[str] = []
        res_names: list[str] = []
        for res in elem.findall("resource"):
            data_el = res.find("data")
            if data_el is not None and (data_el.text or "").strip():
                raw = base64.b64decode("".join(data_el.text.split()))
                res_md5.append(hashlib.md5(raw).hexdigest())
            res_names.append(
                res.findtext("resource-attributes/file-name", ""))
        # container whitespace may precede the CDATA's XML declaration
        body_md, used_hashes = enex_body_to_md(
            elem.findtext("content", "").strip(), password)
        rows.append({
            "title": elem.findtext("title", ""),
            "body": body_md,
            "tags": [t.text or "" for t in elem.findall("tag")],
            "created": elem.findtext("created", ""),
            "updated": elem.findtext("updated", ""),
            "media_hashes": used_hashes,
            "resource_md5": res_md5,
            "resource_names": res_names,
        })
        elem.clear()
    return rows


def enex_extract(sf_dir: str):
    """documents -> synthesized en-note XML -> Markdown + resource hashes."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts: list[str] = []
        n_resources: list[int] = []
        for i in ids:
            md, hashes = enex_body_to_md(render_enex_note(i), PASSWORD)
            texts.append(md)
            n_resources.append(len(hashes))
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(texts, pa.string()),
            "n_resources": pa.array(n_resources, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_enex_extract() -> str:
    golden = (
        "'"
        + ENEX_GOLDEN_TEMPLATE.replace("'", "''")
        .replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
        .replace("{md5}", "' || md5(CAST(doc_id AS VARCHAR)) || '")
        + "'"
    )
    return (
        f"SELECT doc_id, {golden} AS text, "
        "CAST(1 AS BIGINT) AS n_resources FROM documents"
    )
