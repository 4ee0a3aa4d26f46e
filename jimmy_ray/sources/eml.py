"""EML / MIME parsing source (SURVEY.md §2.1 S5).

The reference walks MIME parts with the stdlib email package
(/root/reference/src/jimmy/md_lib/eml.py:50-115): headers become note
metadata, text parts become the body, binary parts become resources.
Here the same walk is a map_batches body over rows carrying raw RFC-822
bytes; the synthetic corpus is derived from `documents` so the oracle
can mirror it.
"""

from __future__ import annotations

import email
import email.policy

import pyarrow as pa


def synth_eml_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, raw:binary) RFC-822 messages."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    raws = []
    for doc_id, text in zip(ids, texts):
        msg = (
            f"From: sender{doc_id % 5}@example.com\r\n"
            f"To: dest@example.com\r\n"
            f"Subject: Doc {doc_id}\r\n"
            f"Date: Mon, 01 Jan 2024 00:00:00 +0000\r\n"
            f"X-Doc-Id: {doc_id}\r\n"
            f"Content-Type: text/plain; charset=utf-8\r\n"
            f"\r\n"
            f"{text}\r\n"
        )
        raws.append(msg.encode("utf-8"))
    return pa.table({"doc_id": batch["doc_id"],
                     "raw": pa.array(raws, pa.binary())})


def parse_eml_batch(batch: pa.Table) -> pa.Table:
    """MIME walk: (doc_id, raw) -> (doc_id, subject, sender, body,
    n_parts, x_doc_id).  Headers map to custom metadata (eml.py:90)."""
    ids = batch["doc_id"].to_pylist()
    raws = batch["raw"].to_pylist()
    subjects, senders, bodies, n_parts, xdoc = [], [], [], [], []
    for raw in raws:
        msg = email.message_from_bytes(raw, policy=email.policy.default)
        subjects.append(str(msg.get("Subject", "")))
        senders.append(str(msg.get("From", "")))
        xdoc.append(str(msg.get("X-Doc-Id", "")))
        parts = 0
        body = ""
        for part in msg.walk():
            if part.get_content_maintype() == "multipart":
                continue
            parts += 1
            if part.get_content_type() == "text/plain" and not body:
                body = part.get_content().rstrip("\r\n")
        bodies.append(body)
        n_parts.append(parts)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "subject": pa.array(subjects, pa.string()),
            "sender": pa.array(senders, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "n_parts": pa.array(n_parts, pa.int64()),
            "x_doc_id": pa.array(xdoc, pa.string()),
        }
    )


def eml_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(synth_eml_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(parse_eml_batch, batch_format="pyarrow", batch_size=512)
    )


def sql_eml_extract() -> str:
    return (
        "SELECT doc_id, "
        "'Doc ' || CAST(doc_id AS VARCHAR) AS subject, "
        "'sender' || CAST(doc_id % 5 AS VARCHAR) || '@example.com' AS sender, "
        "text AS body, "
        "CAST(1 AS BIGINT) AS n_parts, "
        "CAST(doc_id AS VARCHAR) AS x_doc_id "
        "FROM documents"
    )
