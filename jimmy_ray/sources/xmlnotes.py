"""Streaming XML note-container explosion (SURVEY.md §2.1 S6/S9).

The reference parses Evernote ENEX containers note-at-a-time with
``ET.iterparse`` (/root/reference/src/jimmy/formats/evernote.py:194-215)
so one big export never materializes.  Ray-shaped: each row carries one
container's XML bytes; a flat-map batch body iterparses it and explodes
one output row per ``<note>`` (big single containers would use a custom
Datasource splitting on note boundaries — here containers are per-doc).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

import pyarrow as pa


def synth_xml_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, xml:binary) with 1 + doc_id%3 notes."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    xmls = []
    for doc_id, text in zip(ids, texts):
        n = 1 + doc_id % 3
        notes = "".join(
            f"<note><title>Doc {doc_id} part {j}</title>"
            f"<content>{text} part {j}</content>"
            f"<created>2024010{j % 9 + 1}T000000Z</created></note>"
            for j in range(n)
        )
        xmls.append(f"<notes>{notes}</notes>".encode("utf-8"))
    return pa.table({"doc_id": batch["doc_id"],
                     "xml": pa.array(xmls, pa.binary())})


def explode_xml_batch(batch: pa.Table) -> pa.Table:
    """iterparse each container, emit one row per note (1:N flat map)."""
    out_ids, out_titles, out_contents, out_created = [], [], [], []
    for doc_id, xml in zip(batch["doc_id"].to_pylist(), batch["xml"].to_pylist()):
        for _event, elem in ET.iterparse(io.BytesIO(xml)):
            if elem.tag != "note":
                continue
            out_ids.append(doc_id)
            out_titles.append(elem.findtext("title", ""))
            out_contents.append(elem.findtext("content", ""))
            out_created.append(elem.findtext("created", ""))
            elem.clear()  # streaming: free the consumed subtree
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "title": pa.array(out_titles, pa.string()),
            "content": pa.array(out_contents, pa.string()),
            "created": pa.array(out_created, pa.string()),
        }
    )


def xml_notes_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(synth_xml_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(explode_xml_batch, batch_format="pyarrow", batch_size=256)
    )


def sql_xml_notes_extract() -> str:
    return """
WITH parts(j) AS (VALUES (0), (1), (2))
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' part ' || CAST(j AS VARCHAR) AS title,
       text || ' part ' || CAST(j AS VARCHAR) AS content,
       '2024010' || CAST(j % 9 + 1 AS VARCHAR) || 'T000000Z' AS created
FROM documents, parts
WHERE j <= doc_id % 3
"""
