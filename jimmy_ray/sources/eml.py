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


# --- MHTML (.mht/.mhtml web archives) ----------------------------------------
# The reference routes mht/mhtml through the same eml walk
# (converter.py:265-267 → md_lib/eml.py:50-115): text/html parts convert
# to markdown, binary parts become resources keyed by Content-ID /
# Content-Location.  The fixture mirrors Chrome's "Save as MHTML" shape
# (Saved-by-Blink headers, multipart/related, quoted-printable root).

def synth_mhtml(doc_id: int, text: str) -> bytes:
    import quopri

    loc = f"https://pages.example.org/doc/{doc_id}"
    html = (f"<html><head><title>Doc {doc_id}</title></head><body>"
            f"<h1>Doc {doc_id}</h1><p>{_xml_escape(text)}</p>"
            f'<img src="{loc}/hero.png"></body></html>')
    qp = quopri.encodestring(html.encode("utf-8")).decode("ascii")
    b = f"----MultipartBoundary--{doc_id:08d}----"
    return (
        f"From: <Saved by Blink>\r\n"
        f"Snapshot-Content-Location: {loc}\r\n"
        f"Subject: Doc {doc_id}\r\n"
        f"Date: Mon, 1 Jan 2024 00:00:00 -0000\r\n"
        f"MIME-Version: 1.0\r\n"
        f'Content-Type: multipart/related; type="text/html"; '
        f'boundary="{b}"\r\n\r\n'
        f"--{b}\r\n"
        f"Content-Type: text/html\r\n"
        f"Content-ID: <frame-0@mhtml.blink>\r\n"
        f"Content-Transfer-Encoding: quoted-printable\r\n"
        f"Content-Location: {loc}\r\n\r\n"
        f"{qp}\r\n"
        f"--{b}\r\n"
        f"Content-Type: image/png\r\n"
        f"Content-Transfer-Encoding: base64\r\n"
        f"Content-Location: {loc}/hero.png\r\n\r\n"
        f"iVBORw0KGgoAAAANSUhEUg==\r\n"
        f"--{b}--\r\n"
    ).encode("utf-8")


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;")


def parse_mhtml(raw: bytes) -> dict:
    """One web archive → note row (eml.py:50-115 semantics: first
    text/html part is the page body, binary parts are resources)."""
    from jimmy_ray.html.extract import html_to_markdown

    msg = email.message_from_bytes(raw, policy=email.policy.default)
    body = ""
    resources: list[str] = []
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype.startswith("multipart/"):
            continue
        if ctype == "text/html" and not body:
            body = html_to_markdown(part.get_content())
        elif ctype in ("text/plain", "text/markdown") and not body:
            body = part.get_content().rstrip("\r\n")
        elif any(ctype.startswith(t) for t in
                 ("audio/", "image/", "application/", "text/")):
            # reference resource branch (eml.py:33): css and other
            # text/* subresources become resources too
            loc = part.get("Content-Location", "") or str(
                part.get("Content-ID", ""))
            resources.append(loc.rpartition("/")[2])
    return {
        "location": str(msg.get("Snapshot-Content-Location", "")),
        "title": str(msg.get("Subject", "")),
        "body": body,
        "n_resources": len(resources),
        "resources": ",".join(resources),
    }


def mhtml_extract(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [parse_mhtml(synth_mhtml(i, t))
                for i, t in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist())]
        return pa.table({
            "doc_id": batch["doc_id"],
            "location": pa.array([r["location"] for r in rows],
                                 pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "n_resources": pa.array([r["n_resources"] for r in rows],
                                    pa.int64()),
            "resources": pa.array([r["resources"] for r in rows],
                                  pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_mhtml_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'https://pages.example.org/doc/' || {i} AS location,
  'Doc ' || {i} AS title,
  '# Doc ' || {i} || chr(10) || chr(10) || text || chr(10) || chr(10)
    || '![](https://pages.example.org/doc/' || {i} || '/hero.png)' AS body,
  CAST(1 AS BIGINT) AS n_resources,
  'hero.png' AS resources
FROM documents
"""
